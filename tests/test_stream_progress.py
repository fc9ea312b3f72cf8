"""streaming/progress.py: the compute-vs-wait recorder bench.py drains
(VERDICT r7 #2; r8 review added the stream-segment wall so hybrid
queries' batch work cannot be reclassified as wait)."""

from __future__ import annotations

from datafusion_delta_sharing_spark.streaming import progress as P


class _FakeQuery:
    """Duck-type of StreamingQuery.recentProgress: a list of dict-like
    progress events (PySpark's StreamingQueryProgress subclasses dict)."""

    def __init__(self, durations_ms):
        self.recentProgress = [
            {"batchId": i, "durationMs": {"triggerExecution": ms}}
            for i, ms in enumerate(durations_ms)
        ]


def test_note_sums_trigger_execution_and_take_drains():
    P.RECORDED.pop("t1", None)
    P.note("t1", _FakeQuery([1500, 250, 250]), wall_s=3.456)
    P.note("t1", _FakeQuery([1000]))
    assert P.take("t1") == [
        {"compute": 2.0, "stream_wall": 3.456},
        {"compute": 1.0, "stream_wall": None},
    ]
    assert P.take("t1") == []  # drained


def test_note_tolerates_missing_duration_fields():
    P.RECORDED.pop("t2", None)

    class _Sparse:
        recentProgress = [
            {"batchId": 0},                        # no durationMs at all
            {"batchId": 1, "durationMs": {}},      # no triggerExecution
            {"batchId": 2, "durationMs": {"triggerExecution": None}},
            {"batchId": 3, "durationMs": {"triggerExecution": 500}},
        ]

    P.note("t2", _Sparse(), wall_s=1.0)
    assert P.take("t2") == [{"compute": 0.5, "stream_wall": 1.0}]


def test_take_unknown_tag_is_empty_not_keyerror():
    assert P.take("never_recorded") == []


def test_real_stream_records_under_its_registry_tag(spark, sf_dir):
    """End-to-end: a harness stream run leaves one drainable record
    under its registry query name, with compute <= stream segment wall
    <= total wall."""
    import time

    from datafusion_delta_sharing_spark.streaming.windows import (
        stream_session_counts)

    P.RECORDED.pop("stream_session", None)
    t0 = time.perf_counter()
    stream_session_counts(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    runs = P.take("stream_session")
    assert len(runs) == 1
    assert 0.0 < runs[0]["compute"] <= runs[0]["stream_wall"] <= wall
