"""Plan-lint (plans/audit.py): the headline queries must keep the plans
we audited for them — no cartesian products, no row-at-a-time Python
UDFs, no unbounded global sorts, no unpushed parquet filters. Synthetic
bad plans verify each detector actually fires."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.plans import audit as A

# headline queries linted clean; allow-sets mark the audited exceptions
# (bnl_join = one-row scalar crossJoin, by construction in those queries)
_LINTED = [
    ("flagship", frozenset()),
    ("scan_filter_project", frozenset()),
    ("join_inner", frozenset()),
    ("join_semi", frozenset()),
    ("tpch_q1", frozenset()),
    ("tpch_q3", frozenset()),
    ("tpch_q6", frozenset()),
    ("topk_per_group", frozenset()),
    ("dedup_exact", frozenset()),
    ("text_metrics", frozenset()),
    ("doc_fingerprint", frozenset()),
    ("heavy_hitters", frozenset()),
    ("freq_moments", frozenset()),
    # one-row vocab-size broadcast crossJoin (scalar):
    ("bigram_logprob", frozenset({"bnl_join"})),
    ("bloom_join", frozenset()),  # single-pass: broadcast-hash only
    # one-row aggregate crossJoins (scalar denominators / totals):
    ("tfidf_top", frozenset({"bnl_join"})),
    ("decontaminate", frozenset({"bnl_join"})),
]


@pytest.mark.parametrize("name,allow", _LINTED,
                         ids=[n for n, _ in _LINTED])
def test_headline_plans_are_scale_safe(spark, sf_dir, name, allow):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, sf_dir)
    A.assert_scale_safe(df, allow=allow)


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
