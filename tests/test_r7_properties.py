"""Hypothesis property tests for the r7 operators: each DuckDB oracle
mirror (proven equal to the Spark plan by compare_oracle at three SFs)
is checked against an independent pure-Python reference implementation
on fuzzer-chosen inputs — closing the 'both engines share the same
misspelled formula' hole (the test_retrieval_properties pattern).

No Spark session — DuckDB + hashlib run hundreds of cases in seconds.
"""

from __future__ import annotations

import hashlib
import math
from collections import deque

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_delta_sharing_spark.operators.graph import (
    bfs_hop_counts_sql)
from datafusion_delta_sharing_spark.operators.intervals import (
    merge_intervals_sql)
from datafusion_delta_sharing_spark.operators.retrieval import (
    bm25_join_sql)
from datafusion_delta_sharing_spark.operators.tfidf import (
    bpe_apply_merges_sql, bpe_encode_lengths_sql, feature_hash_counts_sql)


def _duck(views: dict[str, pd.DataFrame], sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name, pdf in views.items():
        con.register(name, pdf)
    return con.execute(sql).fetchdf()


# -- interval merge -----------------------------------------------------------

_iv = st.tuples(st.integers(0, 50), st.integers(1, 20))
_iv_rows = st.lists(st.tuples(st.sampled_from(["u1", "u2"]), _iv),
                    min_size=1, max_size=25)


def _merge_ref(rows):
    by_key: dict[str, list[tuple[int, int]]] = {}
    for k, (s, d) in rows:
        by_key.setdefault(k, []).append((s, s + d))
    out = {}
    for k, ivs in by_key.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            # island rule: strictly-greater start opens a new island
            # (half-open adjacency merges)
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        out[k] = (len(ivs), len(islands),
                  sum(e - s for s, e in islands))
    return out


@settings(max_examples=200, deadline=None)
@given(rows=_iv_rows)
def test_merge_intervals_oracle_matches_reference(rows):
    pdf = pd.DataFrame({
        "k": [k for k, _ in rows],
        "s": [s for _, (s, _) in rows],
        "e": [s + d for _, (s, d) in rows],
    })
    got = _duck({"iv": pdf}, merge_intervals_sql("iv", "k", "s", "e"))
    ref = _merge_ref(rows)
    assert {r["k"]: (r["n_intervals"], r["n_islands"], r["covered_us"])
            for _, r in got.iterrows()} == ref


# -- BFS ----------------------------------------------------------------------

_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda t: t[0] < t[1]),
    min_size=0, max_size=20)
_seeds = st.lists(st.integers(0, 11), min_size=1, max_size=4)


def _bfs_ref(edges, seeds, max_hops):
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {v: 0 for v in set(seeds)}
    frontier = deque(dist)
    while frontier:
        v = frontier.popleft()
        if dist[v] == max_hops:
            continue
        for w in adj.get(v, ()):
            if w not in dist:
                dist[w] = dist[v] + 1
                frontier.append(w)
    counts: dict[int, int] = {}
    for h in dist.values():
        counts[h] = counts.get(h, 0) + 1
    return counts


@settings(max_examples=200, deadline=None)
@given(edges=_edges, seeds=_seeds, max_hops=st.integers(0, 4))
def test_bfs_oracle_matches_reference(edges, seeds, max_hops):
    e_pdf = pd.DataFrame(edges or [(0, 1)], columns=["a", "b"])
    if not edges:  # empty relation still needs the columns
        e_pdf = e_pdf.iloc[0:0]
    s_pdf = pd.DataFrame({"v": seeds})
    got = _duck({"e": e_pdf, "s": s_pdf}, bfs_hop_counts_sql(
        "SELECT a, b FROM e", "SELECT v FROM s", max_hops))
    ref = _bfs_ref(edges, seeds, max_hops)
    assert {int(r["hops"]): int(r["n_vertices"])
            for _, r in got.iterrows()} == ref


# -- BPE train + encode ---------------------------------------------------------

_word = st.text(alphabet="abc", min_size=1, max_size=6)
_bpe_corpus = st.lists(
    st.lists(_word, min_size=1, max_size=6), min_size=1, max_size=10)


def _bpe_ref(docs: list[list[str]], k: int):
    """Independent BPE: overlapping pair counts weighted by word freq,
    argmax (count desc, pair asc), leftmost-non-overlapping rewrite."""
    freq: dict[str, int] = {}
    for d in docs:
        for w in d:
            freq[w] = freq.get(w, 0) + 1
    vocab = {w: list(w) for w in freq}
    merges = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq[w]
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        merges.append((pair[0], pair[1], counts[pair]))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == pair):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@settings(max_examples=100, deadline=None)
@given(corpus=_bpe_corpus, k=st.integers(1, 4))
def test_bpe_oracles_match_reference(corpus, k):
    ref_merges, ref_vocab = _bpe_ref(corpus, k)
    if len(ref_merges) < k:
        return  # degenerate: vocabulary ran out of pairs mid-loop
    pdf = pd.DataFrame({
        "doc_id": range(len(corpus)),
        "text": [" ".join(d) for d in corpus],
    })
    got = _duck({"documents": pdf},
                bpe_apply_merges_sql("documents", "text", k=k))
    got_merges = [(r["left_sym"], r["right_sym"], r["pair_count"])
                  for _, r in got.sort_values("step").iterrows()]
    assert got_merges == ref_merges
    enc = _duck({"documents": pdf},
                bpe_encode_lengths_sql("documents", "text", "doc_id", k=k))
    ref_enc = {
        i: (len(d), sum(len(ref_vocab[w]) for w in d))
        for i, d in enumerate(corpus)}
    assert {int(r["doc_id"]): (int(r["n_words"]), int(r["n_tokens"]))
            for _, r in enc.iterrows()} == ref_enc


# -- BM25 posting join ----------------------------------------------------------

_WORDS = ["aa", "bb", "cc", "rare"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10)


def _bm25_join_ref(docs, queries, k1=1.2, b=0.75, frac=None):
    lens = {i: len(d) for i, d in enumerate(docs) if d}
    n = len(lens)
    if not n:
        return {}
    avgdl = sum(lens.values()) / n
    df = {t: sum(1 for d in docs if t in d)
          for t in {t for d in docs for t in d}}
    kept = {t for t, c in df.items()
            if frac is None or c <= n * frac}
    out = {}
    for qid, qwords in queries:
        for t in sorted(set(qwords) & kept):
            for i, d in enumerate(docs):
                tf = d.count(t)
                if not tf:
                    continue
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                c = idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(d) / avgdl))
                hits, sc = out.get((qid, i), (0, 0.0))
                out[(qid, i)] = (hits + 1, sc + c)
    return {k: (h, round(s, 6)) for k, (h, s) in out.items()}


@settings(max_examples=150, deadline=None)
@given(corpus=st.lists(_doc, min_size=1, max_size=12),
       queries=st.lists(_doc, min_size=1, max_size=4),
       use_cut=st.booleans())
def test_bm25_join_oracle_matches_reference(corpus, queries, use_cut):
    frac = 0.6 if use_cut else None
    d_pdf = pd.DataFrame({
        "doc_id": range(len(corpus)),
        "text": [" ".join(d) for d in corpus]})
    q_pdf = pd.DataFrame({
        "qid": range(len(queries)),
        "qtext": [" ".join(q) for q in queries]})
    got = _duck({"documents": d_pdf, "queries": q_pdf}, bm25_join_sql(
        "documents", "queries", "text", "doc_id", "qid", "qtext",
        max_doc_frac=frac))
    ref = _bm25_join_ref(corpus, list(enumerate(queries)), frac=frac)
    assert {(int(r["qid"]), int(r["doc_id"])):
            (int(r["n_terms_hit"]), r["score"])
            for _, r in got.iterrows()} == ref


# -- feature hashing -------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(corpus=st.lists(_doc, min_size=1, max_size=12),
       n_buckets=st.integers(1, 8))
def test_feature_hash_oracle_matches_reference(corpus, n_buckets):
    pdf = pd.DataFrame({
        "doc_id": range(len(corpus)),
        "text": [" ".join(d) for d in corpus]})
    got = _duck({"documents": pdf}, feature_hash_counts_sql(
        "documents", "text", "doc_id", n_buckets=n_buckets))
    ref: dict[tuple[int, int], int] = {}
    for i, d in enumerate(corpus):
        for t in d:
            bk = int(hashlib.md5(t.encode()).hexdigest()[:8],
                     16) % n_buckets
            ref[(i, bk)] = ref.get((i, bk), 0) + 1
    assert {(int(r["doc_id"]), int(r["bucket"])): int(r["n"])
            for _, r in got.iterrows()} == ref


# -- fetch-probe byte accounting ------------------------------------------------


def test_fetch_probe_range_arithmetic():
    """The SCALING fetch-path numbers come from this arithmetic: all
    three RFC-7233 single-range forms plus the no-Range fallback."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                           / "tools"))
    from fetch_probe import _served_bytes

    sizes = {"/f.parquet": 1000}

    def req(rng):
        return {"method": "GET", "path": "/f.parquet", "range": rng}

    # closed range: end - start + 1
    assert _served_bytes([req("bytes=10-19")], sizes)["bytes_served"] == 10
    # open-ended: size - start
    assert _served_bytes([req("bytes=900-")], sizes)["bytes_served"] == 100
    # suffix: min(N, size)
    assert _served_bytes([req("bytes=-64")], sizes)["bytes_served"] == 64
    assert _served_bytes([req("bytes=-9999")], sizes)["bytes_served"] == 1000
    # no Range header: whole file
    assert _served_bytes([req(None)], sizes)["bytes_served"] == 1000
    # non-parquet and non-GET rows are ignored
    other = [{"method": "GET", "path": "/query", "range": None},
             {"method": "POST", "path": "/f.parquet", "range": None}]
    out = _served_bytes(other, sizes)
    assert out == {"parquet_gets": 0, "bytes_served": 0}
