"""Plan-lint (plans/audit.py): the headline queries must keep the plans
we audited for them — no cartesian products, no row-at-a-time Python
UDFs, no unbounded global sorts, no unpushed parquet filters. Synthetic
bad plans verify each detector actually fires."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.plans import audit as A

# The ENTIRE registry is linted (connector/stream/format queries excluded:
# they stage servers or return streaming frames). _ALLOWS documents every
# audited exception; anything else must lint clean, and an allow that
# stops being needed is itself a failure (stale pin).
_SKIP_PREFIXES = ("connector_", "stream_", "csv_", "json_", "orc_")

# bnl_join here = one-row scalar crossJoin (totals, thresholds, vocab
# size, recall bounds) — a broadcast of exactly one row, by construction
_ALLOWS: dict[str, frozenset] = {
    **{name: frozenset({"bnl_join"}) for name in (
        "winsorize", "contingency", "quantile_bin", "triangles",
        "triangles_degcut", "basket_rules", "rolling_wau",
        "quality_filter", "tfidf_top", "pmi_collocations",
        "distinctive_terms", "corpus_overlap",
        "unigram_logprob", "bigram_logprob", "heavy_hitters",
        "bm25_topk", "dsir_select", "sparse_cosine_topk", "hll_rollup",
        "approx_topk", "bm25_join_topk",
        # r8 session: global-mean scalar (target_encode), corpus-size
        # scalar + top_m×labels grid (mutual_info_terms) — one-row /
        # vocab-bounded broadcasts by construction
        "target_encode", "mutual_info_terms",
        # r8 session batch 17: total-N scalar for the count-min
        # overcount bound; full-series (n, S, Σx²) scalars for the ACF
        # denominators — one-row broadcasts by construction
        "count_min", "acf_lags",
        # r8 session batch 18: kcore's three one-row summary counts
        "kcore",
        # r9 session batch 21: kmv_overlap joins the one-row exact
        # corpus_overlap attestation to the one-row sketch estimate
        # (plus corpus_overlap's own scalar-count crossJoins)
        "kmv_overlap",
        # r10 continuation batch 23: naive_bayes_fit's one-row
        # (priors, token totals, vocab size) scalar frame crossJoins
        # the holdout scores — a broadcast of exactly one row
        "naive_bayes_fit")},
    # cusum's (n, Σx) and max-|nS| one-row scalar crossJoins (its
    # day-level global window sorts a localCheckpoint leaf the lint
    # already credits — no global_sort allow needed, verified)
    "cusum_changepoint": frozenset({"bnl_join"}),
    # bpe_merge_steps needs NO allow: its per-round 1-row argmax
    # crossJoins run eagerly inside localCheckpoints during build — the
    # returned merge table's plan reads materialized leaves only
    # intentional non-equi-join demonstrations (the operator IS the BNLJ)
    "cross_join": frozenset({"bnl_join"}),
    "join_theta": frozenset({"bnl_join"}),
    # scalar-subquery crossJoins in TPC-H adaptations
    "tpch_q22": frozenset({"bnl_join"}),
    "tpch_q11": frozenset({"bnl_join", "global_sort"}),
    # global_sort allows below: the r5 subtree-scoped lint stops crediting
    # an Aggregate that sits BELOW a join in the sort's input (a join of
    # anything with an unaggregated branch is join-sized). These three
    # sorts ARE aggregate-reduced in fact — the join partner is a one-row
    # scalar threshold (q11), a per-key aggregate against the small
    # supplier dim (q15), or a semi-join that only FILTERS the supplier
    # dim (q20) — cardinality knowledge the tree-text lint cannot have.
    "tpch_q15": frozenset({"global_sort"}),
    "tpch_q20": frozenset({"global_sort"}),
}


def test_registry_plans_are_scale_safe(spark, sf_dir):
    import __spark_entry__ as entry

    failures, stale_allows = [], []
    for name, fn in entry.queries().items():
        if name.startswith(_SKIP_PREFIXES):
            continue
        allow = _ALLOWS.get(name, frozenset())
        found = {f.code for f in A.audit(fn(spark, sf_dir))}
        if found - allow:
            failures.append((name, sorted(found - allow)))
        if allow - found:
            stale_allows.append((name, sorted(allow - found)))
    assert not failures, f"plans not scale-safe: {failures}"
    assert not stale_allows, f"stale allow entries: {stale_allows}"


def test_detects_cartesian(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    bad = docs.crossJoin(docs.select(F.col("doc_id").alias("d2")))
    codes = {f.code for f in A.audit(bad)}
    assert codes & {"cartesian", "bnl_join"}


def test_detects_row_udf(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    slow = F.udf(lambda s: (s or "").upper(), "string")
    assert "row_udf" in {f.code for f in A.audit(
        docs.select(slow("text")))}
    # the Arrow tier is NOT flagged
    fast = F.pandas_udf(lambda s: s.str.upper(), "string")
    assert "row_udf" not in {f.code for f in A.audit(
        docs.select(fast("text")))}


def test_detects_global_sort_but_not_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert "global_sort" in {f.code for f in A.audit(
        docs.orderBy("n_chars"))}
    assert "global_sort" not in {f.code for f in A.audit(
        docs.orderBy("n_chars").limit(5))}


def test_global_sort_check_is_subtree_scoped():
    """An Aggregate that appears AFTER the Sort in the plan string but in a
    SIBLING branch (outside the Sort's subtree) must not suppress the
    finding — the pre-fix check scanned the flat string, so any later
    aggregate masked a full-data sort. An Aggregate genuinely below the
    Sort still counts as aggregate-reduced input."""
    sibling = """\
SortMergeJoin [k#1], [k2#9], Inner
:- Sort [n_chars#3 ASC NULLS FIRST], true, 0
:  +- Exchange rangepartitioning(n_chars#3 ASC NULLS FIRST, 32)
:     +- FileScan parquet big[k#1,n_chars#3]
+- HashAggregate(keys=[k2#9], functions=[count(1)])
   +- Exchange hashpartitioning(k2#9, 32)
      +- FileScan parquet dim[k2#9]
"""
    assert not A._global_sorts_aggregate_reduced(sibling)
    reduced = """\
Sort [cnt#7L ASC NULLS FIRST], true, 0
+- Exchange rangepartitioning(cnt#7L ASC NULLS FIRST, 32)
   +- HashAggregate(keys=[lang#2], functions=[count(1)])
      +- Exchange hashpartitioning(lang#2, 32)
         +- FileScan parquet docs[lang#2]
"""
    assert A._global_sorts_aggregate_reduced(reduced)
    # an Aggregate on the BUILD side of a join INSIDE the Sort's subtree
    # must not count either: the sort input is join-sized. Pre-order hits
    # the join before the aggregate, so the sort is correctly flagged
    build_side = """\
Sort [x#3 ASC NULLS FIRST], true, 0
+- Exchange rangepartitioning(x#3 ASC NULLS FIRST, 32)
   +- BroadcastHashJoin [k#1], [k2#9], Inner, BuildRight
      :- FileScan parquet big_fact[k#1,x#3]
      +- BroadcastExchange HashedRelationBroadcastMode
         +- HashAggregate(keys=[k2#9], functions=[count(1)])
            +- FileScan parquet dim[k2#9]
"""
    assert not A._global_sorts_aggregate_reduced(build_side)


def test_detects_unpushed_filter(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # type-mismatched comparison wraps the COLUMN in a cast -> pushdown
    # silently lost -> flagged
    assert "unpushed_filter" in {f.code for f in A.audit(
        docs.filter(F.col("n_chars").cast("string") > "100"))}
    # a pushable comparison keeps PushedFilters non-empty -> quiet
    assert "unpushed_filter" not in {f.code for f in A.audit(
        docs.filter(F.col("n_chars") > 100))}
    # genuinely unpushable expression predicates are NOT this finding's
    # business (explode guards etc.)
    assert "unpushed_filter" not in {f.code for f in A.audit(
        docs.filter(F.length("text") % 7 == 3))}


def test_shuffle_count_and_assert_message(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("lang").count()
    assert A.shuffles(agg) >= 1
    assert A.shuffles(docs.select("doc_id")) == 0
    with pytest.raises(AssertionError, match="global_sort"):
        A.assert_scale_safe(docs.orderBy("n_chars"))
