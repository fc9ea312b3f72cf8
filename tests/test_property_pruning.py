"""Property-based tests (hypothesis): stats-based file pruning must be
*sound* — ``may_match`` may only return False when no row in the file can
satisfy the predicate. We generate random file contents + random predicate
trees, derive the stats the way Delta writers do (min/max/nullCount), and
check pruning decisions against brute-force row evaluation."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from datafusion_delta_sharing_spark.plans.predicates import Op, ValueType
from datafusion_delta_sharing_spark.plans.pruning import may_match

COLUMNS = ["a", "b"]


def evaluate(node: Op, row: dict) -> bool | None:
    """Three-valued (SQL-style) evaluation of a predicate tree on one row."""
    if node.op == "and":
        vals = [evaluate(c, row) for c in node.children]
        if any(v is False for v in vals):
            return False
        if any(v is None for v in vals):
            return None
        return True
    if node.op == "or":
        vals = [evaluate(c, row) for c in node.children]
        if any(v is True for v in vals):
            return True
        if any(v is None for v in vals):
            return None
        return False
    if node.op == "not":
        v = evaluate(node.children[0], row)
        return None if v is None else not v
    if node.op == "isNull":
        return row[node.children[0].name] is None
    left, right = node.children
    lv = row[left.name]
    rv = int(right.value)
    if lv is None:
        return None
    return {
        "equal": lv == rv,
        "lessThan": lv < rv,
        "lessThanOrEqual": lv <= rv,
        "greaterThan": lv > rv,
        "greaterThanOrEqual": lv >= rv,
    }[node.op]


def stats_for(rows: list[dict]) -> dict:
    stats: dict = {"numRecords": len(rows), "minValues": {},
                   "maxValues": {}, "nullCount": {}}
    for col in COLUMNS:
        values = [r[col] for r in rows if r[col] is not None]
        stats["nullCount"][col] = sum(1 for r in rows if r[col] is None)
        if values:
            stats["minValues"][col] = min(values)
            stats["maxValues"][col] = max(values)
    return stats


@st.composite
def predicates(draw, depth=0):
    kind = draw(st.sampled_from(
        ["cmp", "cmp", "cmp", "isNull", "not", "and", "or"]
        if depth < 3 else ["cmp", "isNull"]))
    col = draw(st.sampled_from(COLUMNS))
    col_op = Op.column(col, ValueType.LONG)
    if kind == "cmp":
        sym = draw(st.sampled_from(["equal", "lessThan", "lessThanOrEqual",
                                    "greaterThan", "greaterThanOrEqual"]))
        lit = Op.literal(draw(st.integers(-20, 20)), ValueType.LONG)
        return Op(sym, children=[col_op, lit])
    if kind == "isNull":
        return Op.is_null(col_op)
    if kind == "not":
        return Op.not_(draw(predicates(depth=depth + 1)))
    children = draw(st.lists(predicates(depth=depth + 1), min_size=2, max_size=3))
    return Op.and_(children) if kind == "and" else Op.or_(children)


rows_strategy = st.lists(
    st.fixed_dictionaries({
        "a": st.one_of(st.none(), st.integers(-20, 20)),
        "b": st.one_of(st.none(), st.integers(-20, 20)),
    }),
    min_size=1, max_size=8,
)


@settings(max_examples=300, deadline=None)
@given(rows=rows_strategy, pred=predicates())
def test_pruning_never_drops_matching_rows(rows, pred):
    stats = stats_for(rows)
    if not may_match(pred, stats):
        matching = [r for r in rows if evaluate(pred, r) is True]
        assert matching == [], (
            f"pruned a file with {len(matching)} matching rows; "
            f"pred={pred.to_json()} stats={stats}")


@settings(max_examples=100, deadline=None)
@given(pred=predicates())
def test_missing_stats_never_prune(pred):
    assert may_match(pred, None)
    assert may_match(pred, {})
    assert may_match(pred, {"numRecords": 5})


@settings(max_examples=100, deadline=None)
@given(pred=predicates())
def test_serialization_is_valid_json(pred):
    import json

    doc = json.loads(pred.to_json())
    assert doc["op"] == pred.op


def test_evaluator_sanity():
    p = Op.and_([
        Op("greaterThan", children=[Op.column("a", ValueType.LONG),
                                    Op.literal(5, ValueType.LONG)]),
        Op.not_(Op.is_null(Op.column("b", ValueType.LONG))),
    ])
    assert evaluate(p, {"a": 10, "b": 1}) is True
    assert evaluate(p, {"a": 10, "b": None}) is False
    assert evaluate(p, {"a": None, "b": 1}) is None


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


# -- timestamp timezone handling (ADVICE r1: naive-vs-offset comparisons) ----


def _ts_pred(op_name, value):
    col = Op.column("ts", ValueType.TIMESTAMP)
    lit = Op.literal(value, ValueType.TIMESTAMP)
    return getattr(Op, op_name)(col, lit)


def test_timestamp_offset_stats_normalized_to_utc():
    """File stats carry a +02:00 offset; an equivalent UTC literal must not
    prune the file (offset-aware values compare in UTC, not textually)."""
    stats = {"minValues": {"ts": "2021-04-28T10:00:00+02:00"},
             "maxValues": {"ts": "2021-04-28T12:00:00+02:00"}}
    # 10:00+02:00 == 08:00Z; a literal inside [08:00Z, 10:00Z] must match
    assert may_match(_ts_pred("equal", "2021-04-28T09:00:00Z"), stats)
    # and a literal before the UTC-normalized min CAN prune
    assert not may_match(_ts_pred("equal", "2021-04-28T07:00:00Z"), stats)
    # old naive-truncation bug would have compared 09:00 < 10:00 and pruned
    assert may_match(_ts_pred("greater_than_or_equal",
                              "2021-04-28T08:30:00Z"), stats)


def test_timestamp_mixed_timezoneness_never_prunes():
    """Naive stats vs offset literal (or vice versa) is ambiguous: must keep
    the file, never silently drop it."""
    naive_stats = {"minValues": {"ts": "2021-04-28T10:00:00"},
                   "maxValues": {"ts": "2021-04-28T12:00:00"}}
    assert may_match(_ts_pred("equal", "2021-04-28T00:00:00Z"), naive_stats)
    aware_stats = {"minValues": {"ts": "2021-04-28T10:00:00+00:00"},
                   "maxValues": {"ts": "2021-04-28T12:00:00+00:00"}}
    assert may_match(_ts_pred("equal", "2021-04-28T00:00:00"), aware_stats)


def test_timestamp_naive_both_sides_still_prunes():
    stats = {"minValues": {"ts": "2021-04-28T10:00:00"},
             "maxValues": {"ts": "2021-04-28T12:00:00"}}
    assert not may_match(_ts_pred("equal", "2021-04-27T09:00:00"), stats)
    assert may_match(_ts_pred("equal", "2021-04-28T11:00:00"), stats)
