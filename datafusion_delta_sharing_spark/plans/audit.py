"""Physical-plan lint for 100 TB readiness.

``.explain()`` tells you what Catalyst chose; this module turns the
choices that stop scaling into structured, assertable findings so plan
regressions fail tests instead of surfacing as a dead cluster:

- ``cartesian`` / ``bnl_join``: CartesianProduct or BroadcastNestedLoop-
  Join — O(n*m) row comparisons; fine for a one-row scalar join, fatal
  when both sides are data-sized.
- ``row_udf``: BatchEvalPython — a row-at-a-time Python SCALAR UDF in
  the plan (pickle per row). The Arrow-batched tiers (ArrowEvalPython,
  FlatMapGroupsInPandas, MapInArrow/MapInPandas) are NOT flagged, and
  neither is BatchEvalPythonUDTF — table functions have no Arrow tier
  to prefer.
- ``global_sort``: a Sort with ``global=true`` over UNAGGREGATED data
  that is not served by a TakeOrderedAndProject / WindowGroupLimit — a
  full-data range-partitioned sort materialization. Sorting the output
  of an aggregation (result sets already reduced by grouping — the
  TPC-H ORDER BY shape) and top-k stay quiet.
- ``unpushed_filter``: a parquet scan with a ``cast(`` inside its
  ``DataFilters`` — the classic silent pushdown killer (comparing a
  column against a literal of the wrong type wraps the COLUMN in a
  cast, and a cast-wrapped predicate never reaches ``PushedFilters``).
  Genuinely unpushable expression predicates (``size(split(..))``-style
  explode guards) are NOT flagged — lint noise teaches people to
  blanket-allow.

``shuffles(df)`` reports the Exchange count as a plain number — not a
finding, but the thing to watch between revisions of the same query.

Usage: ``assert_scale_safe(df)`` in tests; ``audit(df)`` for the list.
Every harness headline query is linted in tests/test_plan_audit.py, so
"the plan you'd want" is pinned, not aspirational.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    code: str
    message: str


def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def shuffles(df: DataFrame) -> int:
    """Number of Exchange operators in the executed plan (AQE initial
    plan; runtime coalescing can only merge these, never add)."""
    return len(re.findall(r"\bExchange\b", _executed_plan(df)))


def _global_sorts_aggregate_reduced(plan: str) -> bool:
    """True iff every global Sort's input is aggregate-reduced: within the
    Sort's OWN subtree, an Aggregate appears in pre-order BEFORE any
    join/union. Two prior generations of this check were fooled:

    - matching an Aggregate anywhere after the Sort in the plan STRING let
      an aggregate in a SIBLING join branch (big_fact.join(dim.groupBy())
      .orderBy(...) with the Sort under the join) mask a full-data sort;
    - matching anywhere in the Sort's SUBTREE let an aggregate on a join's
      build side (Sort over big_fact.join(dim.groupBy(...))) count, even
      though the sort input is join-sized, not aggregate-sized.

    The tree string is pre-order (parent before children), so hitting an
    Aggregate before any Join/CartesianProduct/Union means the aggregate
    dominates the rest of the sort's input — its output IS what gets
    sorted. Hitting a join/union first means unaggregated branches feed
    the sort. (A union-of-aggregates false-positives; that shape belongs
    in the audit allow map.)

    Subtree walk over the tree-string: a child's operator name is
    indented deeper than its parent's; the subtree ends at the first line
    whose name position is <= the Sort's. WholeStageCodegen '*(n) '
    markers are stripped first so name positions reflect tree art only.
    """
    text = re.sub(r"\*\(\d+\) ", "", plan)
    lines = text.splitlines()
    for i, line in enumerate(lines):
        m = re.search(r"\bSort \[[^\]]*\], true", line)
        if not m:
            continue
        depth = line.index("Sort")
        reduced = False
        for child in lines[i + 1:]:
            name = re.search(r"[A-Za-z]", child)
            if name is None:
                continue
            if name.start() <= depth:
                break  # left the Sort's subtree
            if re.search(r"Join\b|CartesianProduct|\bUnion\b", child):
                break  # unaggregated branches feed the sort
            if "Aggregate" in child:
                reduced = True
                break
        if not reduced:
            return False
    return True


def audit(df: DataFrame, allow: set[str] | frozenset[str] = frozenset()
          ) -> list[Finding]:
    """Lint the physical plan; returns findings not named in ``allow``."""
    plan = _executed_plan(df)
    found: list[Finding] = []

    if "CartesianProduct" in plan:
        found.append(Finding(
            "cartesian",
            "CartesianProduct in plan: every row pair is materialized; "
            "replace with an equi-join on a derived key (bucket, grain, "
            "band) or broadcast a provably tiny side"))
    if "BroadcastNestedLoopJoin" in plan:
        found.append(Finding(
            "bnl_join",
            "BroadcastNestedLoopJoin in plan: non-equi join probes every "
            "broadcast row per input row; acceptable only for one-row "
            "scalar joins — allow explicitly if so"))
    if re.search(r"BatchEvalPython(?!UDTF)", plan):
        found.append(Finding(
            "row_udf",
            "row-at-a-time Python UDF (BatchEvalPython): 10-100x slower "
            "than Arrow-batched pandas_udf; rewrite with built-ins or "
            "a vectorized UDF tier"))
    if "TakeOrderedAndProject" not in plan and \
            not _global_sorts_aggregate_reduced(plan):
        found.append(Finding(
            "global_sort",
            "global Sort without a top-k operator over unaggregated "
            "input: full range-partitioned sort materialization; add a "
            "limit (TakeOrderedAndProject), sortWithinPartitions, or "
            "drop the ordering"))
    for m in re.finditer(
            r"DataFilters: \[(.*?)(?:\]|\.\.\.), Format:", plan):
        # a cast() DIRECTLY around a column attribute in a comparison
        # never reaches PushedFilters (pushed entries are plain
        # col-vs-literal); casts buried inside derived expressions
        # (md5(cast(..)) join keys etc.) are not comparisons and stay
        # quiet
        if re.search(r"\(cast\(\w+#\d+L? as \w+\) [<>=]", m.group(1)):
            found.append(Finding(
                "unpushed_filter",
                "parquet scan has a cast() inside DataFilters and empty "
                "PushedFilters: a type-mismatched literal comparison is "
                "blocking pushdown — fix the literal's type so the "
                "predicate reaches the parquet row-group stats"))
            break

    return [f for f in found if f.code not in allow]


def assert_scale_safe(df: DataFrame,
                      allow: set[str] | frozenset[str] = frozenset()
                      ) -> None:
    """Raise AssertionError listing every finding not in ``allow``."""
    found = audit(df, allow)
    if found:
        detail = "\n".join(f"  [{f.code}] {f.message}" for f in found)
        raise AssertionError(f"plan is not scale-safe:\n{detail}")
