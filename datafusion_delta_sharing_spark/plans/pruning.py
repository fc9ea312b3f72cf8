"""Client-side file pruning from Delta file statistics.

The reference parses each ``File.stats`` JSON (numRecords / minValues /
maxValues / nullCount) but never uses it (``/root/reference/src/client/
action.rs:180-183``; ``statistics()`` reports unknown at
``src/datasource/table.rs:215-217``). We go further: before handing the file
list to Spark, evaluate the pushed predicate against per-file min/max stats
and drop files that cannot contain matching rows. At 100 TB this is the
difference between listing 10⁶ files and scanning the 10³ that matter.

Semantics are strictly conservative: ``may_match`` returns False only when
the file *provably* contains no matching row. Unknown columns, missing
stats, unparseable values, and un-analyzable subtrees all return True.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from datafusion_delta_sharing_spark.plans.predicates import Op, ValueType


def _coerce(raw: Any, value_type: ValueType) -> Any:
    """Parse a stats/literal value into a comparable Python scalar."""
    if raw is None:
        return None
    if value_type in (ValueType.INT, ValueType.LONG):
        return int(raw)
    if value_type in (ValueType.FLOAT, ValueType.DOUBLE):
        return float(raw)
    if value_type == ValueType.BOOL:
        if isinstance(raw, bool):
            return raw
        text = str(raw).strip().lower()
        if text in ("true", "1"):
            return True
        if text in ("false", "0"):
            return False
        # anything else (Postgres-style 't', garbage) must RAISE like the
        # other types do — callers catch and keep the file. Silently
        # coercing to False pruned files whose every row matched
        raise ValueError(f"unparseable boolean stats value {raw!r}")
    if value_type == ValueType.DATE:
        if isinstance(raw, _dt.date):
            return raw
        return _dt.date.fromisoformat(str(raw)[:10])
    if value_type == ValueType.TIMESTAMP:
        if isinstance(raw, _dt.datetime):
            dt = raw
        else:
            from datafusion_delta_sharing_spark.rfc3339 import parse_rfc3339

            dt = parse_rfc3339(raw)
        # offset-aware values normalize to UTC; naive values stay naive.
        # Comparing aware vs naive raises TypeError, which the callers
        # catch and treat as "cannot analyze -> do not prune" — mismatched
        # timezone-ness must never silently drop a file.
        if dt.tzinfo is not None:
            dt = dt.astimezone(_dt.timezone.utc)
        return dt
    return str(raw)


def _column_and_literal(node: Op) -> tuple[str, Any, ValueType] | None:
    """For a binary comparison, extract (column_name, literal_value, type) if
    it has the canonical ``column <op> literal`` shape; None otherwise."""
    if len(node.children) != 2:
        return None
    left, right = node.children
    if left.op == "column" and right.op == "literal":
        try:
            return left.name, _coerce(right.value, right.value_type), right.value_type
        except (ValueError, TypeError):
            return None
    return None


def _stat(stats: dict, section: str, column: str, value_type: ValueType) -> Any:
    values = stats.get(section)
    if not isinstance(values, dict) or column not in values:
        return None
    try:
        return _coerce(values[column], value_type)
    except (ValueError, TypeError):
        return None


def may_match(node: Op | None, stats: dict | None) -> bool:
    """Could a file with these stats contain a row matching the predicate?"""
    if node is None or not stats:
        return True
    try:
        return _may_match(node, stats)
    except Exception:
        return True  # never prune on an analysis failure


def _may_match(node: Op, stats: dict) -> bool:
    if node.op == "and":
        return all(_may_match(c, stats) for c in node.children)
    if node.op == "or":
        # an empty disjunction is un-analyzable, not false: any([]) would
        # prune EVERY file, breaking the never-prune-on-doubt invariant
        if not node.children:
            return True
        return any(_may_match(c, stats) for c in node.children)
    if node.op == "isNull":
        child = node.children[0]
        if child.op == "column":
            null_count = _stat_raw_null_count(stats, child.name)
            if null_count == 0:
                return False
        return True
    if node.op == "not":
        inner = node.children[0]
        # Only analyze not(isNull(col)) == isNotNull; general negation of a
        # min/max verdict is unsound (may_match is one-sided).
        if inner.op == "isNull" and inner.children and inner.children[0].op == "column":
            col = inner.children[0].name
            null_count = _stat_raw_null_count(stats, col)
            num_records = stats.get("numRecords")
            if (null_count is not None and num_records is not None
                    and null_count >= num_records > 0):
                return False  # every row is NULL -> isNotNull matches nothing
        return True
    if node.op in ("equal", "lessThan", "lessThanOrEqual",
                   "greaterThan", "greaterThanOrEqual"):
        extracted = _column_and_literal(node)
        if extracted is None:
            return True
        column, literal, value_type = extracted
        lo = _stat(stats, "minValues", column, value_type)
        hi = _stat(stats, "maxValues", column, value_type)
        if node.op == "equal":
            if lo is not None and literal < lo:
                return False
            if hi is not None and literal > hi:
                return False
        elif node.op == "lessThan":
            if lo is not None and lo >= literal:
                return False
        elif node.op == "lessThanOrEqual":
            if lo is not None and lo > literal:
                return False
        elif node.op == "greaterThan":
            if hi is not None and hi <= literal:
                return False
        elif node.op == "greaterThanOrEqual":
            if hi is not None and hi < literal:
                return False
        return True
    return True  # unknown op: keep the file


def partition_value_stats(partition_values: dict | None) -> dict | None:
    """Exact synthetic stats from a file's partition values, for reuse of
    :func:`may_match` as a partition pruner: every row of the file shares
    each partition value, so min = max = value, and an empty string means
    the column is NULL on EVERY row (the protocol's empty→NULL rule) —
    expressed as nullCount == numRecords so the not(isNull) analysis can
    exclude the file. The synthetic numRecords is a marker for that
    ratio only; this dict must never feed :func:`prune_for_limit`.

    A compliant server already prunes on jsonPredicateHints, but the
    hints are advisory — a server that ignores them returns every file
    and, without this, the client fetches partitions the predicate can
    never match."""
    if not partition_values:
        return None
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    for col, raw in partition_values.items():
        if raw is None or raw == "":
            nulls[col] = 1
        else:
            mins[col] = raw
            maxs[col] = raw
            nulls[col] = 0
    return {"numRecords": 1, "minValues": mins, "maxValues": maxs,
            "nullCount": nulls}


def prune_for_limit(files: list, limit: int) -> list:
    """Keep a prefix of files whose stats-known record counts cover
    ``limit``. ONLY sound when no predicate of any kind applies (rows
    survive 1:1 into the limit). A file without numRecords makes the rest
    unprunable — return the original list unchanged.

    A deletion vector shrinks a file's LOGICAL row count below its
    physical numRecords: counting the physical number would under-deliver
    the limit, so the DV cardinality is subtracted (and a DV without a
    usable cardinality makes coverage unboundable, like missing stats)."""
    kept, covered = [], 0
    for f in files:
        kept.append(f)
        stats = f.parsed_stats()
        n = stats.get("numRecords") if stats else None
        if not isinstance(n, int):
            return files  # unknown count: cannot bound coverage
        dv = getattr(f, "deletion_vector", None)
        if dv is not None:
            card = dv.get("cardinality")
            if not isinstance(card, int):
                return files  # deleted count unknown: cannot bound
            n -= card
        covered += max(n, 0)
        if covered >= limit:
            return kept
    return kept


def _stat_raw_null_count(stats: dict, column: str) -> int | None:
    values = stats.get("nullCount")
    if isinstance(values, dict) and isinstance(values.get(column), int):
        return values[column]
    return None
