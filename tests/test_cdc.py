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


def test_apply_changes_matches_replay_simulation(spark):
    """Property check: for randomized multi-version feeds, apply_changes
    equals a sequential per-version replay (deterministic seeds, no
    hypothesis fixture interplay with the session-scoped spark)."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        keys = list(range(8))
        base_rows = [(k, f"v{k}") for k in keys if rng.random() < 0.6]
        feed_rows = []
        state = dict(base_rows)
        for version in range(2, 2 + rng.randint(1, 4)):
            for k in rng.sample(keys, rng.randint(1, 5)):
                if k in state:
                    if rng.random() < 0.5:
                        feed_rows.append((k, state[k], "delete", version))
                        del state[k]
                    else:
                        new = f"v{k}.{version}"
                        feed_rows.append(
                            (k, state[k], "update_preimage", version))
                        feed_rows.append((k, new, "update_postimage", version))
                        state[k] = new
                elif rng.random() < 0.7:
                    new = f"n{k}.{version}"
                    feed_rows.append((k, new, "insert", version))
                    state[k] = new
        base = spark.createDataFrame(base_rows or [(99, "z")],
                                     "k long, v string")
        if not base_rows:
            state[99] = "z"
        changes = _feed(spark, feed_rows)
        got = sorted((r.k, r.v) for r in
                     CDC.apply_changes(base, changes, ["k"]).collect())
        assert got == sorted(state.items()), f"seed {seed}"


def test_apply_changes_tolerates_map_columns(spark):
    """r5 review fix: the deterministic tiebreaker must skip MAP-typed
    columns (xxhash64 refuses maps) instead of failing the whole apply
    at plan time for feeds that carry one."""
    from datafusion_delta_sharing_spark.operators.cdc import apply_changes

    base = spark.createDataFrame(
        [(1, {"a": "1"})], "id long, attrs map<string,string>")
    changes = spark.createDataFrame(
        [(1, {"a": "2"}, "update_postimage", 2),
         (3, {"b": "9"}, "insert", 2)],
        "id long, attrs map<string,string>, _change_type string, "
        "_commit_version long")
    rows = {r.id: dict(r.attrs) for r in
            apply_changes(base, changes, ["id"]).collect()}
    assert rows == {1: {"a": "2"}, 3: {"b": "9"}}
