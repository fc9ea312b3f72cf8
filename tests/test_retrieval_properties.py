"""Hypothesis property tests for the retrieval operators: the DuckDB
oracle mirrors (which compare_oracle proves equal to the Spark plans at
three SFs) are themselves checked against independent pure-Python
reference implementations of the published formulas, on fuzzer-chosen
corpora. This closes the 'both engines share the same misspelled
formula' hole that engine-vs-engine comparison cannot see.

No Spark session — DuckDB + hashlib run hundreds of cases in seconds.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_delta_sharing_spark.operators.retrieval import (
    bm25_scores_sql, dsir_logratio_sql)

_WORDS = ["aa", "bb", "cc", "dd", "rare"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12)
_corpus = st.lists(_doc, min_size=1, max_size=15)


def _duck(pdf: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", pdf)
    return con.execute(sql).fetchdf()


# -- BM25 ---------------------------------------------------------------------

def _bm25_ref(docs: list[list[str]], terms: list[str],
              k1: float = 1.2, b: float = 0.75) -> dict[int, float]:
    """Independent BM25: Okapi positive-idf form, per-term contributions
    summed in term order (the operators' documented fixed order)."""
    lens = {i: len(d) for i, d in enumerate(docs) if d}
    n = len(lens)
    if not n:
        return {}
    avgdl = sum(lens.values()) / n
    df = {t: sum(1 for d in docs if t in d) for t in terms}
    out = {}
    for i, d in enumerate(docs):
        if not d or not any(t in d for t in terms):
            continue
        score = 0.0
        for t in terms:
            tf = d.count(t)
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(d) / avgdl))
        out[i] = round(score, 6)
    return out


@settings(max_examples=150, deadline=None)
@given(corpus=_corpus)
def test_bm25_oracle_matches_reference(corpus):
    pdf = pd.DataFrame({
        "doc_id": range(len(corpus)),
        "text": [" ".join(d) for d in corpus],
    })
    got = _duck(pdf, bm25_scores_sql("documents", "text", "doc_id",
                                     ["rare", "aa"]))
    ref = _bm25_ref(corpus, ["rare", "aa"])
    assert dict(zip(got["doc_id"], got["score"])) == \
        {k: v for k, v in ref.items()}
    # n_tokens / n_terms_hit metadata agree too
    for _, row in got.iterrows():
        d = corpus[int(row["doc_id"])]
        assert row["n_tokens"] == len(d)
        assert row["n_terms_hit"] == sum(1 for t in ("rare", "aa") if t in d)


# -- DSIR ---------------------------------------------------------------------

def _dsir_ref(docs: list[tuple[list[str], bool]], bucket_hex: int = 3,
              alpha: float = 1.0, salt: str = "dsir-v1") -> dict[int, float]:
    """Independent DSIR: hashed-bigram Laplace log-likelihood ratio."""
    n_buckets = 16 ** bucket_hex

    def buckets(words):
        grams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        return [hashlib.md5(f"{g}:{salt}".encode()).hexdigest()[:bucket_hex]
                for g in grams]

    c_tgt: dict[str, int] = {}
    c_raw: dict[str, int] = {}
    for words, is_tgt in docs:
        for bk in buckets(words):
            (c_tgt if is_tgt else c_raw)[bk] = \
                (c_tgt if is_tgt else c_raw).get(bk, 0) + 1
    t_tgt, t_raw = sum(c_tgt.values()), sum(c_raw.values())
    out = {}
    for i, (words, is_tgt) in enumerate(docs):
        if is_tgt:
            continue
        bks = buckets(words)
        if not bks:
            continue
        ratios = [
            math.log((c_tgt.get(bk, 0) + alpha) / (t_tgt + alpha * n_buckets))
            - math.log((c_raw.get(bk, 0) + alpha) / (t_raw + alpha * n_buckets))
            for bk in bks]
        out[i] = round(sum(ratios) / len(ratios), 6)
    return out


@settings(max_examples=150, deadline=None)
@given(corpus=st.lists(
    st.tuples(_doc, st.booleans()), min_size=1, max_size=15))
def test_dsir_oracle_matches_reference(corpus):
    pdf = pd.DataFrame({
        "doc_id": range(len(corpus)),
        "text": [" ".join(d) for d, _ in corpus],
        "source": ["tgt" if t else "pool" for _, t in corpus],
    })
    got = _duck(pdf, dsir_logratio_sql("documents", "text", "doc_id",
                                       "source = 'tgt'"))
    ref = _dsir_ref(corpus)
    assert dict(zip(got["doc_id"], got["logratio"])) == ref
    assert dict(zip(got["doc_id"], got["n_bigrams"])) == {
        i: len(d) - 1 for i, (d, t) in enumerate(corpus)
        if not t and len(d) >= 2}


@settings(max_examples=50, deadline=None)
@given(corpus=st.lists(
    st.tuples(_doc, st.booleans()), min_size=2, max_size=12),
    seed=st.integers(min_value=0, max_value=10))
def test_dsir_weights_invariant_to_doc_order(corpus, seed):
    """Importance weights are a pure function of corpus CONTENT — row
    order must not matter (the property that makes the top-N selection
    partitioning-safe)."""
    import random

    perm = list(range(len(corpus)))
    random.Random(seed).shuffle(perm)
    base = _dsir_ref(corpus)
    shuffled = _dsir_ref([corpus[p] for p in perm])
    remapped = {perm[j]: v for j, v in shuffled.items()}
    assert remapped == base


# -- BPE pair counts ----------------------------------------------------------

def _bpe_ref(docs: list[list[str]], top_k: int = 50):
    counts: dict[str, int] = {}
    freq: dict[str, int] = {}
    for d in docs:
        for w in d:
            freq[w] = freq.get(w, 0) + 1
    for w, n in freq.items():
        for i in range(len(w) - 1):
            counts[w[i:i + 2]] = counts.get(w[i:i + 2], 0) + n
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:top_k]


@settings(max_examples=150, deadline=None)
@given(corpus=_corpus)
def test_bpe_oracle_matches_reference(corpus):
    from datafusion_delta_sharing_spark.operators.tfidf import (
        bpe_pair_counts_sql)

    pdf = pd.DataFrame({"doc_id": range(len(corpus)),
                        "text": [" ".join(d) for d in corpus]})
    got = _duck(pdf, bpe_pair_counts_sql("documents", "text"))
    assert list(zip(got["pair"], got["pair_count"])) == _bpe_ref(corpus)


# -- sparse TF-IDF cosine -----------------------------------------------------

def _sparse_cosine_ref(docs: list[list[str]],
                       max_doc_frac=None, top_k: int = 100):
    n = len([d for d in docs])
    tf = [{t: d.count(t) for t in set(d)} for d in docs]
    df: dict[str, int] = {}
    for row in tf:
        for t in row:
            df[t] = df.get(t, 0) + 1
    w = [{t: c * (math.log((n + 1) / (df[t] + 1)) + 1)
          for t, c in row.items()} for row in tf]
    norms = [math.sqrt(sum(x * x for x in row.values())) for row in w]
    pairs = []
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            shared = set(w[a]) & set(w[b])
            if max_doc_frac is not None:
                shared = {t for t in shared if df[t] <= max_doc_frac * n}
            if not shared:
                continue
            dot = sum(w[a][t] * w[b][t] for t in sorted(shared))
            pairs.append((a, b, len(shared),
                          round(dot / (norms[a] * norms[b]), 6)))
    pairs.sort(key=lambda p: (-p[3], p[0], p[1]))
    return pairs[:top_k]


@settings(max_examples=100, deadline=None)
@given(corpus=st.lists(_doc, min_size=1, max_size=10))
def test_sparse_cosine_oracle_matches_reference(corpus):
    from datafusion_delta_sharing_spark.operators.retrieval import (
        sparse_cosine_pairs_sql)

    pdf = pd.DataFrame({"doc_id": range(len(corpus)),
                        "text": [" ".join(d) for d in corpus]})
    got = _duck(pdf, sparse_cosine_pairs_sql(
        "documents", "text", "doc_id", max_doc_frac=0.8))
    got_pairs = list(zip(got["doc_a"], got["doc_b"],
                         got["n_shared"], got["cosine"]))
    ref = _sparse_cosine_ref(corpus, max_doc_frac=0.8)
    # compare as (a, b) -> (n_shared, cosine) maps plus top-k rank ORDER:
    # float dots may differ in the last ulp between duckdb's and python's
    # summation, so compare cosines with a 1-ulp-of-rounding tolerance
    assert [(a, b, s) for a, b, s, _ in got_pairs] == \
        [(a, b, s) for a, b, s, _ in ref]
    for (_, _, _, cg), (_, _, _, cr) in zip(got_pairs, ref):
        assert abs(cg - cr) <= 1e-6
