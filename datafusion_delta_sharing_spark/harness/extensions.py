"""Extension queries: the LLM-training-data-pipeline operators (driver brief
north star) over the documents/embeddings tables, plus Structured Streaming.

Oracle policy: exact dedup, n-gram Jaccard, text metrics, language ID,
fingerprints, vector math and streaming window counts are ANSI-expressible
and oracle-checked. MinHash-LSH / SimHash / LSH-ANN / IVF-ANN depend on
xxhash64 (absent in DuckDB) or have recall < 1, so their raw outputs have
no SQL mirror — instead each returns a recall-bound summary row
(operators/recall.py, VERDICT r3 #2): the approximate output is joined
against an exact baseline computed in the same Spark job, and the oracle
recomputes the baseline count in SQL and expects the recall verdict TRUE.
The bounds are empirical constants with slack, measured at sf0.01 AND
sf0.1 (recalls: minhash .935/.973, simhash planted .947/.967, multi-table
LSH ~1.0 on planted near-copies, IVF .467/.500 organic).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions import text as TX
from datafusion_delta_sharing_spark.functions.vector import (
    cosine_sql as _COSINE_SQL)
from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.operators import dedup as DD
from datafusion_delta_sharing_spark.operators import multimodal as MM
from datafusion_delta_sharing_spark.operators import similarity as SIM
from datafusion_delta_sharing_spark.operators.recall import (
    recall_summary, recall_summary_sql)
from datafusion_delta_sharing_spark.streaming.windows import (
    STREAM_DEDUP_ORACLE, STREAM_ENRICH_ORACLE, STREAM_JOIN_ORACLE,
    stream_dedup_keys, stream_hourly_counts, stream_static_enrich,
    stream_stream_join)

_JACCARD_DOCS = 150      # doc_id bound for the oracle-checked pairwise query
_NEARDUP_VECS = 200      # vec_id bound for exact pairwise cosine
_ANN_QUERIES = 5         # query vectors for top-k
_EMB_DIM = 64
_AUG_OFFSET = 1_000_000  # id offset for planted near-duplicate copies
_AUG_SUFFIX = " xq yq zq wq"  # 4 appended words -> Jaccard (w-4)/w vs original
_MAX_DOC_FREQ = 40       # posting-list cut for the dfcut demonstration

# recall-bound constants (operators/recall.py). Bounds are deliberately
# below the measured recalls (see module docstring) so single-pair ULP
# flips can never flip the verdict; a mis-wired band/bucket join drops
# recall far below any of them.
_MINHASH_BOUND = 0.85    # measured .935 (sf0.01) / .973 (sf0.1)
_SIMHASH_BOUND = 0.85    # planted-pair recall .947 / .967 at radius 10
_LSH_BOUND = 0.80        # ~1.0 on planted near-copies, 8 tables
_IVF_BOUND = 0.30        # .467 / .500 organic top-5, nprobe 4/16
_LSH_TABLES = 8          # OR-amplification width for the ANN check
_ANN_COPIES = 5          # planted near-copies per query vector


def _docs_with_near_copies(spark, sf_dir):
    """Planted near-duplicates (VERDICT r2 #3): every doc in the subset gets
    a copy with 4 extra words appended, so the pairwise dedup checks push
    >= subset-size true near-dup pairs through the math instead of the 0-1
    pairs the synthetic corpus happens to contain at sf0.01. The same
    derivation is mirrored in the DuckDB oracle (docs_aug CTE), so the
    checks stay hash-exact."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _JACCARD_DOCS).select("doc_id", "text")
    copies = docs.select(
        (F.col("doc_id") + F.lit(_AUG_OFFSET)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_AUG_SUFFIX)).alias("text"))
    return docs.unionByName(copies)


# -- dedup ----------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return DD.exact_dedup_stats(docs, "text", "doc_id")


def q_dedup_exact_subset(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars")
    return DD.exact_dedup(docs, ["lang", "source"])


def q_ngram_jaccard(spark, sf_dir):
    docs = _docs_with_near_copies(spark, sf_dir)
    return DD.ngram_jaccard_pairs(docs, "text", "doc_id", k=5, threshold=0.15)


def q_ngram_jaccard_prefix(spark, sf_dir):
    """PPJoin prefix filtering (lossless): identical output to
    ``ngram_jaccard`` — same threshold, SAME ORACLE — but the candidate
    self-join runs over rarest-first prefixes of each shingle set, the
    scale path when even the df-cut join is too hot. Hash-exact equality
    with the quadratic-candidate oracle IS the losslessness proof."""
    docs = _docs_with_near_copies(spark, sf_dir)
    return DD.ngram_jaccard_pairs_prefix(docs, "text", "doc_id", k=5,
                                         threshold=0.15)


def q_ngram_jaccard_dfcut(spark, sf_dir):
    """Jaccard with the posting-list df-cut engaged (VERDICT r2 #7): shingles
    shared by more than _MAX_DOC_FREQ docs are dropped before the self-join,
    bounding per-shingle fan-out to _MAX_DOC_FREQ² at any corpus size. The
    oracle emulates the cut with a count-over-window on the posting list."""
    docs = _docs_with_near_copies(spark, sf_dir)
    return DD.ngram_jaccard_pairs(docs, "text", "doc_id", k=5, threshold=0.15,
                                  max_doc_freq=_MAX_DOC_FREQ)


def q_dedup_components(spark, sf_dir):
    """Near-dup clustering: Jaccard candidate pairs -> connected components
    -> (id, component) labels; component = canonical survivor id. Oracle is
    a recursive-CTE transitive closure."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _JACCARD_DOCS)
    pairs = DD.ngram_jaccard_pairs(docs, "text", "doc_id", k=5, threshold=0.15)
    vertices = docs.select(F.col("doc_id").alias("id"))
    return DD.connected_components(vertices, pairs)


def q_dedup_minhash(spark, sf_dir):
    """MinHash-LSH recall summary (VERDICT r3 #2: the raw pairs are
    xxhash64-based and unmirrorable in DuckDB, so the query now returns a
    hash-checkable verdict instead of a rows-only dump). Exact baseline =
    the full n-gram Jaccard self-join over the same planted-near-copy
    corpus, computed in this job; the oracle recomputes its count with the
    same SQL as the ngram_jaccard oracle. The LSH verify step computes true
    Jaccard, so found ⊆ exact is a contract — n_false is checked too
    (expected 0). Wrong banding ⇒ recall below 0.85 ⇒ hash mismatch."""
    docs = _docs_with_near_copies(spark, sf_dir)
    exact = DD.ngram_jaccard_pairs(docs, "text", "doc_id",
                                   k=5, threshold=0.15)
    found = DD.minhash_lsh_pairs(docs, "text", "doc_id",
                                 num_hashes=16, bands=4, k=5, threshold=0.15)
    return recall_summary(exact, found, ["id_a", "id_b"], _MINHASH_BOUND,
                          check_precision=True)


def q_dedup_simhash(spark, sf_dir):
    """SimHash pigeonhole recall summary over the planted near-copies:
    every (doc, doc+4-words) pair is an expected near-duplicate; the
    summary asserts >= 85% of them land within Hamming radius 10 (measured
    .947/.967 at sf0.01/sf0.1). A broken bit-vote or chunk join collapses
    planted recall. The oracle recomputes the planted-pair count."""
    docs = _docs_with_near_copies(spark, sf_dir)
    planted = (load_table(spark, sf_dir, "documents")
               .filter(F.col("doc_id") < _JACCARD_DOCS)
               .select(F.col("doc_id").alias("id_a"),
                       (F.col("doc_id") + F.lit(_AUG_OFFSET)).alias("id_b")))
    found = DD.simhash_neardup_pairs(docs, "text", "doc_id", max_hamming=10)
    return recall_summary(planted, found, ["id_a", "id_b"], _SIMHASH_BOUND)


# -- similarity search ----------------------------------------------------


def q_embedding_neardup(spark, sf_dir):
    """Sign-bucketed near-dup pairs with planted duplicates: each vector
    gets an identical copy at vec_id + _AUG_OFFSET (cosine exactly 1.0,
    same bucket by construction), so the candidate join + cosine verify
    prove themselves on ~200 true pairs. VERDICT r3 #3: the named query
    now runs the bucketed equi-join plan (no BroadcastNestedLoopJoin —
    plan-asserted in tests/test_llm_ops.py); the O(n²) all-pairs form
    survives only as the spec/oracle baseline in tests."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _NEARDUP_VECS).select("vec_id", "embedding")
    copies = emb.select(
        (F.col("vec_id") + F.lit(_AUG_OFFSET)).alias("vec_id"), "embedding")
    return SIM.embedding_neardup_pairs_bucketed(
        emb.unionByName(copies), threshold=0.5)


def q_ann_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") <= _ANN_QUERIES)
    return SIM.brute_force_topk(emb, queries, k=5)


def _emb_with_planted_neighbors(spark, sf_dir):
    """Embeddings plus _ANN_COPIES deterministically perturbed copies of
    each query vector (component d scaled by 1 + 0.12·sin(d + c) — cosine
    ≈ 0.996 to the original, far above the organic top-5 range of
    0.26–0.42 on this corpus). LSH is a near-duplicate retriever: on
    near-random organic data its recall is structurally ~0 whatever the
    wiring (measured 0.03/0.0 pre-r4), so the recall check runs on the
    workload the operator exists for. The baseline stays honest: exact
    brute-force top-k over the SAME augmented corpus, same job.

    The copies come from ONE explode over the copy index, not a
    _ANN_COPIES-way union of per-copy frames: the union spelling made the
    driver build and analyze a separate transform branch per copy (~1.9 s
    of plan-construction wall time at any SF — measured r5; the values
    are hash-identical since the copy index enters the same expression as
    a double either way)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") <= _ANN_QUERIES)
    vec_type = dict(emb.dtypes)["embedding"]
    copies = (
        queries.select(
            "vec_id", "embedding",
            F.explode(F.sequence(F.lit(1), F.lit(_ANN_COPIES))).alias("c"))
        .select(
            (F.col("vec_id")
             + F.col("c").cast("long") * F.lit(_AUG_OFFSET)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (x.cast("double")
                              * (1.0 + 0.12 * F.sin(i.cast("double")
                                                    + F.col("c").cast("double"))))
            ).cast(vec_type).alias("embedding")))
    return emb.unionByName(copies), queries


def q_ann_lsh_topk(spark, sf_dir):
    """Multi-table LSH ANN recall summary (VERDICT r3 #2). Exact top-5 per
    query = the 5 planted near-copies (verified by in-job brute force, not
    assumed); the 8-table 8-plane LSH must recover >= 80% of them (any
    single mis-wired table/bucket join drops essentially all of them).
    The oracle recomputes n_exact as n_queries × k."""
    corpus, queries = _emb_with_planted_neighbors(spark, sf_dir)
    exact = SIM.brute_force_topk(corpus, queries, k=5)
    found = SIM.lsh_topk(corpus, queries, dim=_EMB_DIM, k=5, n_planes=8,
                         n_tables=_LSH_TABLES)
    return recall_summary(exact, found, ["query_id", "cand_id"], _LSH_BOUND)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN recall summary vs in-job brute force on the organic corpus
    (nprobe 4 of 16 cells ⇒ measured recall .467/.500; bound 0.30 leaves
    ~5-pair slack against centroid ULP drift while still failing instantly
    if assignment or probing is mis-wired)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") <= _ANN_QUERIES)
    exact = SIM.brute_force_topk(emb, queries, k=5)
    found = SIM.ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=4)
    return recall_summary(exact, found, ["query_id", "cand_id"], _IVF_BOUND)


# -- text analysis --------------------------------------------------------


def q_text_metrics(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.bpe_ish_token_count("text").alias("n_bpe_tokens"),
        TX.punct_ratio("text").alias("punct_ratio"),
        TX.stopword_ratio("text").alias("stopword_ratio"),
        TX.quality_score("text").alias("quality"),
    )


def q_lang_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang",
        TX.lang_id("text").alias("pred_lang"),
    )


def q_doc_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with_words = docs.select("doc_id", "text",
                             TX.words_of("text").alias("words"))
    return with_words.select(
        "doc_id",
        TX.doc_fingerprint("text", k=5, words="words").alias("fingerprint"),
    )


# -- multimodal -----------------------------------------------------------


def q_multimodal_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_binary_payload(docs, "doc_id", "text", "source")
    return (MM.extract_features(media)
            .select("media_id", "byte_len", "digest", "mime"))


# -- streaming ------------------------------------------------------------


def q_stream_hourly(spark, sf_dir):
    return stream_hourly_counts(spark, sf_dir)


def q_stream_join(spark, sf_dir):
    """Stream-stream interval join (clicks -> purchases within 30 min)."""
    return stream_stream_join(spark, sf_dir)


def q_stream_dedup(spark, sf_dir):
    """Streaming dedup via dropDuplicatesWithinWatermark (key set only)."""
    return stream_dedup_keys(spark, sf_dir)


def q_stream_enrich(spark, sf_dir):
    """Stream-static broadcast join: events enriched with the customer dim."""
    return stream_static_enrich(spark, sf_dir)


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_exact_subset": q_dedup_exact_subset,
    "ngram_jaccard": q_ngram_jaccard,
    "ngram_jaccard_prefix": q_ngram_jaccard_prefix,
    "ngram_jaccard_dfcut": q_ngram_jaccard_dfcut,
    "dedup_components": q_dedup_components,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "embedding_neardup": q_embedding_neardup,
    "ann_topk": q_ann_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "text_metrics": q_text_metrics,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_features": q_multimodal_features,
    "stream_hourly": q_stream_hourly,
    "stream_join": q_stream_join,
    "stream_dedup": q_stream_dedup,
    "stream_enrich": q_stream_enrich,
}

def _shingle_rows_sql(source_sql: str) -> str:
    """(doc_id, sh) rows, multiplicity kept — the one DuckDB spelling of
    operators/dedup.shingle_sets' k=5 derivation, shared by _posts_cte
    and extensions3._shingles_sql so the k arithmetic and tokenizer
    cannot drift between mirrors."""
    return f"""
        SELECT doc_id, sh FROM (
            SELECT doc_id,
                   CASE WHEN len(words) < 5 THEN [trim(text)]
                        ELSE list_transform(range(1, len(words) - 3),
                             i -> array_to_string(words[i:i+4], ' '))
                   END AS shs
            FROM (SELECT doc_id, text,
                         list_filter(regexp_split_to_array(trim(text), '{TX.WS_TOKEN_SPLIT}'), x -> x != '') AS words
                  FROM {source_sql})
        ), unnest(shs) AS t(sh)
    """


def _posts_cte(source_sql: str) -> str:
    """DuckDB posting-list CTE (id, shingle) over an arbitrary doc source —
    the SQL mirror of operators/dedup.shingle_sets."""
    return f"""
    posts AS (
        SELECT DISTINCT doc_id AS id, sh
        FROM ({_shingle_rows_sql(source_sql)})
    )
"""


_SHINGLE_POSTS = _posts_cte(f"documents WHERE doc_id < {_JACCARD_DOCS}")

# planted near-copies: the SQL mirror of _docs_with_near_copies
_DOCS_AUG = f"""
    docs_aug AS (
        SELECT doc_id, text FROM documents WHERE doc_id < {_JACCARD_DOCS}
        UNION ALL
        SELECT doc_id + {_AUG_OFFSET} AS doc_id,
               text || '{_AUG_SUFFIX}' AS text
        FROM documents WHERE doc_id < {_JACCARD_DOCS}
    )
"""

_JACCARD_TAIL = """
    sizes AS (SELECT id, count(*) AS sz FROM {posts} GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
        FROM {posts} a JOIN {posts} b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT id_a, id_b,
           round(n_inter / (sa.sz + sb.sz - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE round(n_inter / (sa.sz + sb.sz - n_inter), 6) >= 0.15
"""

ORACLES = {
    "dedup_exact": """
        SELECT md5(text) AS text_md5,
               CAST(min(doc_id) AS BIGINT) AS keep_id,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "dedup_exact_subset": """
        SELECT lang, source, doc_id, n_chars FROM (
            SELECT lang, source, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang, source
                                      ORDER BY doc_id, n_chars) AS rn
            FROM documents
        ) WHERE rn = 1
    """,
    "ngram_jaccard": f"""
        WITH {_DOCS_AUG}, {_posts_cte('docs_aug')},
        {_JACCARD_TAIL.format(posts='posts')}
    """,
    # prefix filtering is lossless, so the oracle is the SAME quadratic
    # formulation — hash equality proves no pair was filtered away
    "ngram_jaccard_prefix": f"""
        WITH {_DOCS_AUG}, {_posts_cte('docs_aug')},
        {_JACCARD_TAIL.format(posts='posts')}
    """,
    # recall summaries (VERDICT r3 #2): the oracle recomputes the exact
    # baseline count with real SQL and expects the Spark-side recall
    # verdict to hold; see operators/recall.py for the contract.
    "dedup_minhash": recall_summary_sql(
        f"""SELECT count(*) FROM (
            WITH {_DOCS_AUG}, {_posts_cte('docs_aug')},
            {_JACCARD_TAIL.format(posts='posts')}
        )""", _MINHASH_BOUND, check_precision=True),
    "dedup_simhash": recall_summary_sql(
        f"SELECT count(*) FROM documents WHERE doc_id < {_JACCARD_DOCS}",
        _SIMHASH_BOUND),
    "ann_lsh_topk": recall_summary_sql(
        f"SELECT count(*) * 5 FROM embeddings WHERE vec_id <= {_ANN_QUERIES}",
        _LSH_BOUND),
    "ann_ivf_topk": recall_summary_sql(
        f"SELECT count(*) * 5 FROM embeddings WHERE vec_id <= {_ANN_QUERIES}",
        _IVF_BOUND),
    "ngram_jaccard_dfcut": f"""
        WITH {_DOCS_AUG}, {_posts_cte('docs_aug')},
        cut AS (
            SELECT id, sh FROM (
                SELECT id, sh, count(*) OVER (PARTITION BY sh) AS df
                FROM posts
            ) WHERE df <= {_MAX_DOC_FREQ}
        ),
        {_JACCARD_TAIL.format(posts='cut')}
    """,
    "dedup_components": f"""
        WITH RECURSIVE {_SHINGLE_POSTS},
        sizes AS (SELECT id, count(*) AS sz FROM posts GROUP BY id),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
            FROM posts a JOIN posts b ON a.sh = b.sh AND a.id < b.id
            GROUP BY a.id, b.id
        ),
        pairs AS (
            SELECT id_a, id_b FROM inter
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE round(n_inter / (sa.sz + sb.sz - n_inter), 6) >= 0.15
        ),
        undirected AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION
            SELECT id_b AS u, id_a AS v FROM pairs
        ),
        reach(u, v) AS (
            SELECT u, v FROM undirected
            UNION
            SELECT r.u, e.v FROM reach r JOIN undirected e ON r.v = e.u
        )
        SELECT d.doc_id AS id,
               CAST(least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS BIGINT)
                   AS component
        FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
        WHERE d.doc_id < {_JACCARD_DOCS}
        GROUP BY d.doc_id
    """,
    # bucketed (VERDICT r3 #3): the oracle mirrors the sign bucket, so the
    # candidate equi-join semantics — not just the cosine — are checked
    "embedding_neardup": f"""
        WITH emb_aug AS (
            SELECT vec_id, embedding FROM embeddings
            WHERE vec_id < {_NEARDUP_VECS}
            UNION ALL
            SELECT vec_id + {_AUG_OFFSET} AS vec_id, embedding
            FROM embeddings WHERE vec_id < {_NEARDUP_VECS}
        ),
        src AS (
            SELECT vec_id, embedding,
                   {SIM.sign_bucket_sql('embedding', 8)} AS bucket
            FROM emb_aug
        )
        SELECT id_a, id_b, score FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round({_COSINE_SQL('a.embedding', 'b.embedding')}, 6)
                       AS score
            FROM src a JOIN src b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        ) WHERE score >= 0.5
    """,
    "ann_topk": f"""
        SELECT query_id, cand_id, score, rnk FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   round(
                     list_sum(list_transform(list_zip(q.embedding, c.embedding),
                              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(q.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(c.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     6) AS score,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(
                         list_sum(list_transform(list_zip(q.embedding, c.embedding),
                                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                         / (sqrt(list_sum(list_transform(q.embedding,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(c.embedding,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                         6) DESC, c.vec_id ASC) AS rnk
            FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
            WHERE q.vec_id <= {_ANN_QUERIES}
        ) WHERE rnk <= 5
    """,
    "text_metrics": f"""
        SELECT doc_id,
               {TX.token_count_sql('text')} AS n_tokens,
               {TX.bpe_ish_token_count_sql('text')} AS n_bpe_tokens,
               {TX.punct_ratio_sql('text')} AS punct_ratio,
               {TX.stopword_ratio_sql('text')} AS stopword_ratio,
               {TX.quality_score_sql('text')} AS quality
        FROM documents
    """,
    "lang_id": f"""
        SELECT doc_id, lang, {TX.lang_id_sql('text')} AS pred_lang
        FROM documents
    """,
    "doc_fingerprint": f"""
        SELECT doc_id, {TX.doc_fingerprint_sql('text', 5)} AS fingerprint
        FROM documents
    """,
    "multimodal_features": """
        SELECT CAST(doc_id AS BIGINT) AS media_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               md5(text) AS digest,
               'text/plain' AS mime
        FROM documents
    """,
    "stream_hourly": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "stream_join": STREAM_JOIN_ORACLE,
    "stream_dedup": STREAM_DEDUP_ORACLE,
    "stream_enrich": STREAM_ENRICH_ORACLE,
}
