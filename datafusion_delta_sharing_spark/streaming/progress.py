"""Per-stream compute-time accounting (VERDICT r7 #2).

Wall-clock time of a streaming query conflates two very different
quantities: COMPUTE (the micro-batch work Spark actually scheduled —
``durationMs.triggerExecution`` summed over the query's progress events)
and WAIT (trigger scheduling, source polling, query start/stop
lifecycle). On a loaded box the wait term dominates and is pure noise:
r7's ``stream_topk`` read 11.49 s under load vs 2.34 s quiet for
byte-identical code — a 5x artifact the CPU calibration probes cannot
normalize because no CPU was being spent.

Every streaming helper calls :func:`note` right before stopping its
query; ``bench.py`` drains the recorded compute seconds per registry
query and reports BOTH numbers (wall and compute) so a cross-round delta
on a streaming query can be read against the number that actually
reflects the plan.
"""

from __future__ import annotations

# tag -> one {"compute": s, "stream_wall": s} per completed run, in order
RECORDED: dict[str, list[dict]] = {}


def note(tag: str, query, wall_s: float | None = None,
         extra: dict | None = None) -> None:
    """Record the summed triggerExecution time of ``query`` under ``tag``
    (the registry query name), plus ``wall_s`` — the wall seconds of the
    STREAM SEGMENT alone (start → processAllAvailable), which the caller
    times. Call after processAllAvailable(), before stop() —
    recentProgress is retained on the query handle, capped by
    spark.sql.streaming.numRecentProgressUpdates (default 100, far above
    the handful of micro-batches any harness stream runs).

    The segment wall matters for HYBRID queries (a stream run followed
    by batch aggregates, e.g. stream_minhash_dedup's parity check):
    substituting compute for the query's TOTAL wall would silently
    reclassify the batch work as 'trigger wait' — only the stream
    segment may be swapped for its compute time (r8 review).

    ``extra`` (optional) carries helper-specific size counters into the
    bench artifact alongside the timing split — e.g. stream_upsert's
    per-run stamp-row / rewrite-bytes accounting (VERDICT r8 #3: a
    cross-round compute delta on that query must be readable against
    how much state each MERGE actually rewrote).
    """
    ms = 0
    for p in query.recentProgress:
        duration = p["durationMs"] if "durationMs" in p else {}
        ms += int(duration.get("triggerExecution", 0) or 0)
    rec = {"compute": round(ms / 1000.0, 3),
           "stream_wall": round(wall_s, 3) if wall_s is not None else None}
    if extra:
        rec.update(extra)
    RECORDED.setdefault(tag, []).append(rec)


def take(tag: str) -> list[dict]:
    """Drain and return the runs recorded under ``tag`` (empty list when
    ``tag`` never ran a stream — i.e. a batch query)."""
    return RECORDED.pop(tag, [])
