"""CDC application semantics (operators/cdc.py): last action per key
wins across multi-version histories."""

from datafusion_delta_sharing_spark.operators import cdc as CDC


def _feed(spark, rows):
    return spark.createDataFrame(
        rows, "k long, v string, _change_type string, _commit_version long")


def test_apply_changes_latest_action_wins(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string")
    changes = _feed(spark, [
        # k=1: updated twice — latest postimage wins
        (1, "a", "update_preimage", 2), (1, "a2", "update_postimage", 2),
        (1, "a2", "update_preimage", 3), (1, "a3", "update_postimage", 3),
        # k=2: deleted
        (2, "b", "delete", 2),
        # k=3: deleted then re-inserted
        (3, "c", "delete", 2), (3, "c2", "insert", 3),
        # k=5: brand new
        (5, "e", "insert", 3),
        # k=6: inserted then deleted — must NOT appear
        (6, "f", "insert", 2), (6, "f", "delete", 3),
    ])
    got = sorted((r.k, r.v) for r in
                 CDC.apply_changes(base, changes, ["k"]).collect())
    assert got == [(1, "a3"), (3, "c2"), (4, "d"), (5, "e")]


def test_apply_changes_empty_feed_is_identity(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    changes = _feed(spark, [])
    got = sorted((r.k, r.v) for r in
                 CDC.apply_changes(base, changes, ["k"]).collect())
    assert got == [(1, "a"), (2, "b")]
