"""Deterministic sampling operators for training-data curation.

Spark's ``df.sample`` is seed-dependent per-partition (repartitioning
changes the sample), which is unacceptable for reproducible corpus builds.
These operators derive inclusion from md5 of the row id instead — the same
content-hash trick as functions/splits.py — so results are identical across
engines, runs, partitionings, and cluster sizes, and every operator has an
exact DuckDB mirror.
"""

from __future__ import annotations

import math as _math
from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from datafusion_delta_sharing_spark.functions.splits import (
    _hex_threshold, _sql_salt)


def _hash_key(id_col: str, salt: str) -> F.Column:
    return F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))


def _hash_key_sql(id_col: str, salt: str) -> str:
    return f"md5(CAST({id_col} AS VARCHAR) || ':{_sql_salt(salt)}')"


def stratified_sample(df: DataFrame, stratum_col: str, id_col: str,
                      n_per_stratum: int, salt: str = "v1") -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by hash order — a deterministic stand-in for uniform
    sampling without replacement. Rows with a NULL id are EXCLUDED: a
    NULL id has no hash, the engines order NULLs at opposite ends by
    default, and several NULL-id rows would tie on both sort keys, so
    their membership could differ per engine and per run (same NULL-id
    policy as functions/splits).

    One shuffle on the stratum; the per-stratum rank is a WindowGroupLimit
    (top-n pushed below the sort), so no stratum is fully sorted when
    ``n_per_stratum`` is small.
    """
    w = (Window.partitionBy(stratum_col)
         .orderBy(_hash_key(id_col, salt), F.col(id_col)))
    return (df.filter(F.col(id_col).isNotNull())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_per_stratum)
            .drop("__rn"))


def stratified_sample_sql(source_sql: str, stratum_col: str, id_col: str,
                          n_per_stratum: int, salt: str = "v1",
                          columns: str = "*") -> str:
    """DuckDB mirror of :func:`stratified_sample` (the default ``columns``
    excludes the internal rn, matching the Spark side's dropped __rn)."""
    if columns == "*":
        columns = "* EXCLUDE (rn)"
    return f"""
        SELECT {columns} FROM (
            SELECT *, row_number() OVER (
                PARTITION BY {stratum_col}
                ORDER BY {_hash_key_sql(id_col, salt)}, {id_col}) AS rn
            FROM {source_sql} WHERE {id_col} IS NOT NULL
        ) WHERE rn <= {n_per_stratum}
    """


def _cum_counts(scored: DataFrame) -> DataFrame:
    """Distinct-score cumulative counts with the corpus total attached —
    the ONE spelling of the integer-exact quantile machinery behind
    quantile_threshold_flags / winsorize / quantile_bin (r5 review: three
    hand-synced copies invited drift). NULLS LAST is pinned on the
    cumulative ordering: Spark defaults nulls first, DuckDB last, so a
    single NULL score would shift every cumulative count — and therefore
    the thresholds — between engines."""
    counts = scored.groupBy("_score").agg(F.count(F.lit(1)).alias("_c"))
    cum_w = (Window.orderBy(F.asc_nulls_last("_score"))
             .rowsBetween(Window.unboundedPreceding, 0))
    return (counts.withColumn("_cum", F.sum("_c").over(cum_w))
            .crossJoin(F.broadcast(
                scored.agg(F.count(F.lit(1)).alias("_n")))))


def _thr_at(q: float) -> F.Column:
    """Smallest score whose cumulative count reaches ceil(q * n)."""
    return F.min(F.when(F.col("_cum") >= F.ceil(F.lit(q) * F.col("_n")),
                        F.col("_score")))


def _cum_cte_sql(source_sql: str, score_sql: str, id_col: str) -> str:
    """scored/cum CTE text shared by the three quantile mirrors (NULLS
    LAST matches _cum_counts' pinned ordering)."""
    return f"""scored AS (
            SELECT {id_col}, {score_sql} AS _score FROM {source_sql}
        ), cum AS (
            SELECT _score, sum(_c) OVER (
                ORDER BY _score NULLS LAST
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum
            FROM (SELECT _score, count(*) AS _c FROM scored GROUP BY _score)
        )"""


def _thr_at_sql(q: float) -> str:
    return (f"min(CASE WHEN _cum >= ceil(CAST({q} AS DOUBLE) * "
            f"(SELECT count(*) FROM scored)) THEN _score END)")


def quantile_threshold_flags(df: DataFrame, score: F.Column, id_col: str,
                             q: float = 0.25,
                             score_name: str = "score") -> DataFrame:
    """(id, score, kept) for every row: ``kept`` iff the row's score is at
    or above the corpus ``q``-quantile — the "drop the bottom quartile"
    corpus-pruning step, exact and deterministic.

    The threshold is the smallest score whose cumulative count reaches
    ``ceil(q * n)`` (discrete quantile, integer-exact — no float
    interpolation, so Spark and the oracle cannot disagree at the
    boundary). Scale shape: the corpus reduces to per-score counts
    (map-side combinable, one shuffle on the score); the cumulative sum
    runs over the *distinct-score* table (bounded by score granularity,
    tiny next to the corpus — the only single-partition step); the 1-row
    threshold is broadcast back. No global sort, no global window, no
    single-reducer pass over row-level data.

    Exact global percentiles via ``F.percentile`` (one reducer holds every
    value) or an un-partitioned ranking window (one partition holds every
    row) are the two standard scale-killers this avoids.
    """
    if not 0 <= q <= 1:
        raise ValueError(f"q must be in [0,1], got {q}")
    scored = df.select(F.col(id_col), score.alias("_score"))
    thr = _cum_counts(scored).agg(_thr_at(q).alias("_thr"))
    return (scored.crossJoin(F.broadcast(thr))
            .select(F.col(id_col),
                    F.col("_score").alias(score_name),
                    (F.col("_score") >= F.col("_thr")).alias("kept")))


def quantile_threshold_flags_sql(source_sql: str, score_sql: str,
                                 id_col: str, q: float = 0.25,
                                 score_name: str = "score") -> str:
    """DuckDB mirror of :func:`quantile_threshold_flags`."""
    return f"""
        WITH {_cum_cte_sql(source_sql, score_sql, id_col)},
        thr AS (SELECT {_thr_at_sql(q)} AS _thr FROM cum)
        SELECT s.{id_col}, s._score AS {score_name},
               s._score >= t._thr AS kept
        FROM scored s CROSS JOIN thr t
    """


def winsorize(df: DataFrame, score: F.Column, id_col: str,
              q_lo: float = 0.01, q_hi: float = 0.99,
              score_name: str = "score") -> DataFrame:
    """(id, score, clipped): clip outliers to the discrete q_lo/q_hi
    corpus quantiles — the standard pre-training feature/metric clipping
    step. Thresholds use the same integer-exact cumulative-count quantile
    as quantile_threshold_flags (no float interpolation, no global sort
    over row-level data); clipping selects existing values, so there is no
    arithmetic for engines to disagree on."""
    if not 0 <= q_lo <= q_hi <= 1:
        raise ValueError(f"need 0 <= q_lo <= q_hi <= 1, got {q_lo}, {q_hi}")
    scored = df.select(F.col(id_col), score.alias("_score"))
    thr = _cum_counts(scored).agg(_thr_at(q_lo).alias("_lo"),
                                  _thr_at(q_hi).alias("_hi"))
    return (scored.crossJoin(F.broadcast(thr))
            .select(F.col(id_col),
                    F.col("_score").alias(score_name),
                    F.least(F.greatest(F.col("_score"), F.col("_lo")),
                            F.col("_hi")).alias("clipped")))


def winsorize_sql(source_sql: str, score_sql: str, id_col: str,
                  q_lo: float = 0.01, q_hi: float = 0.99,
                  score_name: str = "score") -> str:
    """DuckDB mirror of :func:`winsorize`."""
    return f"""
        WITH {_cum_cte_sql(source_sql, score_sql, id_col)},
        thr AS (SELECT {_thr_at_sql(q_lo)} AS _lo,
                       {_thr_at_sql(q_hi)} AS _hi
                FROM cum)
        SELECT s.{id_col}, s._score AS {score_name},
               least(greatest(s._score, t._lo), t._hi) AS clipped
        FROM scored s CROSS JOIN thr t
    """


def quantile_bin(df: DataFrame, score: F.Column, id_col: str,
                 qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                 score_name: str = "score") -> DataFrame:
    """(id, score, bin): QuantileDiscretizer analogue — each row's bin is
    the number of discrete quantile thresholds strictly below its score
    (len(qs)+1 buckets; a row sitting exactly ON a threshold belongs to
    the LOWER bucket). Thresholds come from the same integer-exact
    cumulative-count quantile as winsorize/quantile_threshold_flags, so
    bucket edges cannot disagree between engines; the per-row assignment
    is a broadcast of len(qs) scalars."""
    scored = df.select(F.col(id_col), score.alias("_score"))
    thr = _cum_counts(scored).agg(*[
        _thr_at(q).alias(f"_t{i}") for i, q in enumerate(qs)])
    out = scored.crossJoin(F.broadcast(thr))
    bin_col = reduce(
        lambda acc, i: acc + F.when(F.col("_score") > F.col(f"_t{i}"), 1)
        .otherwise(0),
        range(len(qs)), F.lit(0))
    return out.select(F.col(id_col), F.col("_score").alias(score_name),
                      bin_col.cast("bigint").alias("bin"))


def quantile_bin_sql(source_sql: str, score_sql: str, id_col: str,
                     qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                     score_name: str = "score") -> str:
    """DuckDB mirror of :func:`quantile_bin`."""
    thr_cols = ", ".join(
        f"{_thr_at_sql(q)} AS _t{i}" for i, q in enumerate(qs))
    bin_expr = " + ".join(
        f"(CASE WHEN s._score > t._t{i} THEN 1 ELSE 0 END)"
        for i in range(len(qs)))
    return f"""
        WITH {_cum_cte_sql(source_sql, score_sql, id_col)},
        thr AS (SELECT {thr_cols} FROM cum)
        SELECT s.{id_col}, s._score AS {score_name},
               CAST({bin_expr} AS BIGINT) AS bin
        FROM scored s CROSS JOIN thr t
    """


def weighted_mixture(sources: dict[str, tuple[DataFrame, float]],
                     id_col: str, salt: str = "mix1") -> DataFrame:
    """Training-mixture composition: for each named source, keep a
    deterministic hash-fraction of its rows and tag them with the source
    name. ``sources`` maps name -> (DataFrame, keep_fraction in [0, 1]).

    The fraction filter is a narrow map over each input (no shuffle, no
    sort); the union is plan-level only. At 100 TB this is the right shape:
    down-sampling happens before anything wide.

    ``keep_fraction == 1.0`` keeps EVERY row (no filter): the hex
    threshold clamps to 'ffffffff', and a strict '<' against it would
    silently drop the ~2^-32 of rows whose hash prefix is exactly that —
    the leak functions/splits.py documents as real at corpus scale.
    """
    if not sources:
        raise ValueError("weighted_mixture needs at least one source")
    parts = []
    for name, (df, frac) in sorted(sources.items()):
        if not 0 <= frac <= 1:
            raise ValueError(f"fraction for {name!r} must be in [0,1], got {frac}")
        if frac < 1.0:
            df = df.filter(
                F.substring(_hash_key(id_col, salt + ":" + name), 1, 8)
                < _hex_threshold(frac))
        parts.append(df.withColumn("mix_source", F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def weighted_mixture_sql(sources: dict[str, tuple[str, float]],
                         id_col: str, salt: str = "mix1",
                         columns: str = "*") -> str:
    """DuckDB mirror of :func:`weighted_mixture`; ``sources`` maps name ->
    (source SQL, keep_fraction)."""
    if not sources:
        raise ValueError("weighted_mixture_sql needs at least one source")
    parts = []
    for name, (src, frac) in sorted(sources.items()):
        if not 0 <= frac <= 1:
            raise ValueError(f"fraction for {name!r} must be in [0,1], got {frac}")
        key = _hash_key_sql(id_col, salt + ":" + name)
        where = ("" if frac >= 1.0
                 else f" WHERE substr({key}, 1, 8) < '{_hex_threshold(frac)}'")
        parts.append(
            f"SELECT {columns}, '{_sql_salt(name)}' AS mix_source "
            f"FROM {src}{where}")
    return " UNION ALL ".join(parts)


def token_budget_select(df: DataFrame, group_col: str, id_col: str,
                        tokens_col: str, score_col: str,
                        budget: int) -> DataFrame:
    """Per-group token-budget selection: order each group's documents by
    ``score_col`` descending (ties by id), admit documents while the
    running token total stays within ``budget``. The standard "fill each
    source's quota with its best documents" step when composing a training
    mixture under a fixed total token count.

    Prefix semantics: a document is kept iff the running token total up to
    AND including it (over the full ordered group, kept or not) is <=
    budget — the maximal score-ordered prefix that fits. Not a knapsack:
    once the budget is crossed, later (smaller) documents stay excluded,
    which keeps the operator a pure window expression — deterministic,
    single-shuffle, engine-portable.

    One shuffle (window partition by group). Returns
    ``(id, group, n_tokens, cum_tokens, kept)`` for every input row.
    """
    w = (Window.partitionBy(group_col)
         .orderBy(F.desc(score_col), F.asc(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.select(
        F.col(id_col), F.col(group_col),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
        F.sum(F.col(tokens_col).cast("bigint")).over(w).alias("cum_tokens"))
        .withColumn("kept", F.col("cum_tokens") <= budget))


def token_budget_select_sql(source_sql: str, group_col: str, id_col: str,
                            tokens_col: str, score_sql: str,
                            budget: int) -> str:
    """DuckDB mirror of :func:`token_budget_select`; ``score_sql`` is the
    ordering expression over the source row."""
    return f"""
        SELECT {id_col}, {group_col},
               CAST({tokens_col} AS BIGINT) AS n_tokens,
               CAST(sum(CAST({tokens_col} AS BIGINT)) OVER (
                   PARTITION BY {group_col}
                   ORDER BY {score_sql} DESC, {id_col} ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens,
               (sum(CAST({tokens_col} AS BIGINT)) OVER (
                   PARTITION BY {group_col}
                   ORDER BY {score_sql} DESC, {id_col} ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   <= {budget}) AS kept
        FROM {source_sql}
    """


# -- deterministic weighted sampling without replacement ------------------------

_WS_HEX = 15  # 60-bit uniforms: conv()/CAST('0x..') stay inside int64


def weighted_sample(df: DataFrame, stratum_col: str, id_col: str,
                    weight_col: str, n_per_stratum: int,
                    salt: str = "ws1") -> DataFrame:
    """Deterministic weighted sampling without replacement, n per
    stratum: rows with zero/NULL weight are excluded; each remaining row
    draws the content-hash uniform ``u = md5_60bit(id:salt) / 2^60`` and
    the ``n`` rows with the SMALLEST ``u / w`` keys win.

    This is the division-keyed variant of the Efraimidis–Spirakis
    exponential race (their key is ``-ln(u)/w``; both make heavier rows
    win more often and are without-replacement by construction). The
    division form is chosen deliberately: ``/`` of exact integers is
    IEEE-exact-rounded and therefore bit-identical across engines, while
    ``ln`` carries no such guarantee — reproducibility of the SAMPLE SET
    across engines/runs/partitionings beats matching the textbook
    first-order inclusion probabilities.

    One shuffle on the stratum, one rank window per stratum. Returns
    (stratum, id, weight) — the key stays internal so the output
    contract has no floats at all.
    """
    w = Window.partitionBy(stratum_col).orderBy("__key", id_col)
    u = F.conv(F.substring(_hash_key(id_col, salt), 1, _WS_HEX),
               16, 10).cast("bigint")
    return (df.filter(F.col(weight_col).isNotNull()
                      & (F.col(weight_col) > 0))
            .withColumn("__key",
                        u.cast("double") / F.col(weight_col))
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n_per_stratum)
            .select(F.col(stratum_col), F.col(id_col),
                    F.col(weight_col)))


def weighted_sample_sql(source_sql: str, stratum_col: str, id_col: str,
                        weight_col: str, n_per_stratum: int,
                        salt: str = "ws1") -> str:
    """DuckDB mirror of :func:`weighted_sample`."""
    u = (f"CAST(CAST('0x' || substr({_hash_key_sql(id_col, salt)}, 1, "
         f"{_WS_HEX}) AS BIGINT) AS BIGINT)")
    return f"""
        SELECT {stratum_col}, {id_col}, {weight_col}
        FROM (
            SELECT {stratum_col}, {id_col}, {weight_col},
                   row_number() OVER (
                       PARTITION BY {stratum_col}
                       ORDER BY CAST({u} AS DOUBLE) / {weight_col},
                                {id_col}) AS r
            FROM ({source_sql})
            WHERE {weight_col} IS NOT NULL AND {weight_col} > 0
        ) WHERE r <= {n_per_stratum}
    """


# -- Poisson bootstrap confidence intervals ------------------------------------

# The distributed bootstrap (Chamandy, Muralidharan, Najmi & Naidu 2012,
# "Estimating uncertainty for massive data streams"): instead of
# resampling n rows WITH replacement (impossible to coordinate across
# partitions), each row enters replicate b with multiplicity
# w ~ Poisson(1) — for large n the replicate laws converge to the
# classical bootstrap, and each row's draws depend only on (row id, b),
# so the whole procedure is one scan, embarrassingly parallel, and
# deterministic. Draws are EXACT-INTEGER arithmetic end-to-end: each
# replicate's uniform is a 16-bit slice of md5(id:chunk:salt) — ONE
# md5 serves 8 draws (32 hex chars / 4), because hashing IS the
# operator's dominant cost (measured at sf0.1: 9.0 s for per-draw
# md5 vs 0.6 s for the whole explode+aggregate machinery — the
# 8-draws-per-hash layout cuts the hash budget 7.7x) — compared
# against precomputed integer thresholds floor(F(k) * 2^16) of the
# Poisson(1) CDF (truncated at w = 7; together with the 16-bit
# granularity the law deviates from Poisson(1) by ~1e-5 per cell — a
# DEFINED sampling law, the same on every engine), weighted sums are
# exact BIGINTs, each replicate mean is ONE double division of exact
# integers (IEEE-exact, bit-identical), and the CI bounds are ORDER
# STATISTICS of those bit-identical doubles with a (mean, b)
# tie-break. Zero order-dependent double sums anywhere — the
# conformal_interval_1f bit-exactness class.
_BOOT_B = 100          # replicates; ranks below assume this count
_BOOT_ALPHA = 0.05     # 95% percentile CI: ranks ceil(a/2*B), ceil((1-a/2)*B)
_BOOT_PER_HASH = 8     # 16-bit draws per md5 (32 hex chars / 4)
_BOOT_CHUNKS = -(-_BOOT_B // _BOOT_PER_HASH)   # ceil(B / 8)

_POIS_T = []
_acc, _term = 0.0, _math.exp(-1.0)
for _k in range(7):
    _acc += _term          # F(k) = e^-1 * sum_{j<=k} 1/j!
    _POIS_T.append(_math.floor(_acc * (1 << 16)))
    _term /= (_k + 1)
del _acc, _term, _k

_POIS_CASE = ("CASE " + " ".join(
    f"WHEN h < {t} THEN {k}" for k, t in enumerate(_POIS_T))
    + " ELSE 7 END")

# ONE core text, both engines, over {src} = the replicate-expanded
# (g, y, b, h) relation (the expansion and the hex->int conversion are
# the only per-engine spellings, the token_rows precedent). The input
# is scanned ONCE: every (group, b) replicate cell sees ALL the
# group's rows, so the full-sample n and sum(y) ride the SAME
# aggregate (max over b of per-cell count/sum — identical in every
# cell) instead of a second scan, and the final step is one GROUP BY,
# no join — a NULL group key therefore survives to the output instead
# of vanishing through an equi-join (r10-continuation review). A
# replicate that samples zero rows (all w = 0 — probability e^-n per
# group, toy-group territory) drops out of the rank; the CI ranks are
# computed FROM the surviving count nb, not hardcoded for B, via the
# conformal modulo spelling: rank*40 = ceil(nb/40)*40 for the 2.5th
# percentile and ceil(39*nb/40)*40 for the 97.5th (alpha = 0.05 ->
# fortieths, exactly), so small groups get valid rank-adjusted bounds
# and n_boot reports the survivor count.
_BOOT_CORE_SQL = (
    "WITH draws AS ("
    "  SELECT {g}, y, b, " + _POIS_CASE + " AS w FROM {src}), "
    "reps AS ("
    "  SELECT {g}, b, sum(w * y) AS swy, sum(w) AS sw, "
    "         count(*) AS nr, sum(y) AS sy "
    "  FROM draws GROUP BY {g}, b), "
    "means AS ("
    "  SELECT {g}, b, nr, sy, CAST(swy AS DOUBLE) / sw AS m, "
    "         row_number() OVER (PARTITION BY {g} "
    "             ORDER BY CAST(swy AS DOUBLE) / sw, b) AS rk, "
    "         count(*) OVER (PARTITION BY {g}) AS nb "
    "  FROM reps WHERE sw > 0) "
    "SELECT {g}, CAST(max(nr) AS BIGINT) AS n, "
    "       round(CAST(max(sy) AS DOUBLE) / max(nr), 6) AS mean, "
    "       round(max(CASE WHEN rk * 40 = "
    "             (nb + 39) - ((nb + 39) % 40) THEN m END), 6) "
    "           AS ci_lo, "
    "       round(max(CASE WHEN rk * 40 = "
    "             (39 * nb + 39) - ((39 * nb + 39) % 40) THEN m END), "
    "             6) AS ci_hi, "
    "       CAST(max(nb) AS BIGINT) AS n_boot "
    "FROM means GROUP BY {g}")


def _boot_ranks(b: int = _BOOT_B, alpha: float = _BOOT_ALPHA):
    """The percentile ranks the modulo spelling above computes for a
    survivor count of ``b`` — kept as the documented reference
    (ceil(alpha/2*b), ceil((1-alpha/2)*b)) and used by the tests."""
    lo = _math.ceil(alpha / 2.0 * b)
    hi = _math.ceil((1.0 - alpha / 2.0) * b)
    return lo, hi


def bootstrap_ci_mean(spark, xy: DataFrame, group_col: str, id_col: str,
                      salt: str = "boot1") -> DataFrame:
    """Per-group Poisson-bootstrap 95% percentile CI for the mean of an
    exact-integer column ``y`` over a (group, y, id) frame. Returns
    (group, n, mean, ci_lo, ci_hi, n_boot).

    Scale shape: the replicate expansion multiplies rows by B = 100,
    but partial (map-side) aggregation collapses each partition to
    #groups x B cells before the shuffle, so the exchanged state is
    metadata-sized; per-row cost is ceil(B/8) md5 calls (each hash
    feeds 8 draws — hashing dominates, see the header measurement) —
    linear, perfectly parallel, the honest price of a bootstrap. The
    rank window runs over <= B rows per group. Rows with NULL y are
    excluded up front (on both engines) — inside the sums they would
    inflate sum(w) but not sum(w*y) and silently deflate every mean.

    Fan-out parallelism: the B-fold expansion inherits the INPUT's
    split count, so a small input (one parquet file -> one split)
    would run the entire hash fan-out on a single task — measured at
    sf0.1: 4.9 s single-split vs 2.4 s for TEN TIMES the data in 32
    splits. When the input has fewer partitions than the cluster's
    default parallelism the frame is repartitioned first (the shuffled
    rows are the small pre-expansion input, never the fan-out); inputs
    that already carry enough splits — any real table scan at scale —
    skip the shuffle entirely."""
    g = group_col
    xy = xy.filter(F.col("y").isNotNull())
    target = spark.sparkContext.defaultParallelism
    if xy.rdd.getNumPartitions() < target:
        xy = xy.repartition(target)
    xy.createOrReplaceTempView("_boot_xy")
    expanded = (
        f"(SELECT {g}, y, chunk * {_BOOT_PER_HASH} + j AS b, "
        f" CAST(conv(substr(hx, j * 4 + 1, 4), 16, 10) AS BIGINT) AS h "
        f" FROM (SELECT {g}, y, chunk, "
        f"   md5(concat(CAST({id_col} AS STRING), ':', "
        f"     CAST(chunk AS STRING), ':{salt}')) AS hx "
        f"   FROM _boot_xy "
        f"   LATERAL VIEW explode(sequence(0, {_BOOT_CHUNKS - 1})) "
        f"     tc AS chunk) "
        f" LATERAL VIEW explode(sequence(0, {_BOOT_PER_HASH - 1})) "
        f"   tj AS j "
        f" WHERE chunk * {_BOOT_PER_HASH} + j < {_BOOT_B})")
    return spark.sql(_BOOT_CORE_SQL.format(g=g, src=expanded))


def bootstrap_ci_mean_sql(xy_sql: str, group_col: str, id_col: str,
                          salt: str = "boot1") -> str:
    """DuckDB mirror of :func:`bootstrap_ci_mean` — the IDENTICAL core
    text; only the replicate generator and the hex->int cast are
    engine-spelled (the kmv_sql convention)."""
    g = group_col
    filtered = f"(SELECT * FROM ({xy_sql}) WHERE y IS NOT NULL)"
    expanded = (
        f"(SELECT {g}, y, chunk * {_BOOT_PER_HASH} + tj.j AS b, "
        f" CAST(('0x' || substr(hx, tj.j * 4 + 1, 4)) AS BIGINT) AS h "
        f" FROM (SELECT {g}, y, tc.chunk, "
        f"   md5(CAST({id_col} AS VARCHAR) || ':' || "
        f"     CAST(tc.chunk AS VARCHAR) || ':{salt}') AS hx "
        f"   FROM {filtered} "
        f"   CROSS JOIN (SELECT unnest(generate_series(0, "
        f"     {_BOOT_CHUNKS - 1})) AS chunk) tc) "
        f" CROSS JOIN (SELECT unnest(generate_series(0, "
        f"   {_BOOT_PER_HASH - 1})) AS j) tj "
        f" WHERE chunk * {_BOOT_PER_HASH} + tj.j < {_BOOT_B})")
    return _BOOT_CORE_SQL.format(g=g, src=expanded)
