"""Extensions batch 17 (r8 session, r9 window slots — WINDOW_PLAN.json
r9_new): probabilistic record linkage, the count-min frequency sketch,
and time-series autocorrelation.

* ``fellegi_sunter`` — Fellegi–Sunter (1969) probabilistic match
  scoring (:func:`..operators.linkage.fs_decisions`) over phone-prefix
  blocked candidate pairs between the customer table and a
  deterministically perturbed successor seeded with impostor rows, so
  all three decisions (match / review / nonmatch) appear at every SF —
  the scoring half of the record-linkage workflow whose blocking half
  is ``sorted_neighborhood`` (r8).
* ``count_min`` — Cormode–Muthukrishnan count-min sketch point
  estimates (:func:`..operators.sketches.cm_probe`) with engine-exact
  integer attestations (never undercounts; overcount ≤ 3·N/w) — the
  frequency member of the mergeable-sketch family (HLL/bitmap/KMV
  distinct ✅, Misra-Gries / approx_top_k heavy hitters ✅).
* ``acf_lags`` — sample autocorrelation at lags 0..7
  (:func:`..operators.timeseries.acf`) of the weekly-modulated daily
  order count: the n²-scaled centered formula keeps every sum an exact
  integer, lag 0 self-attests at exactly 1.0, and the injected
  (1 + day%7) weekly pattern makes lag 7 visibly dominate lags 1..6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions.money import cents_sql
from datafusion_delta_sharing_spark.harness import (
    load_table, register_views)
from datafusion_delta_sharing_spark.operators import linkage as LK
from datafusion_delta_sharing_spark.operators import sketches as SK
from datafusion_delta_sharing_spark.operators import timeseries as TS

# -- Fellegi-Sunter record linkage ------------------------------------------------

# Snapshot B perturbs A field-by-field on coprime key mods (names ~17,
# balances +25 cents ~7, segments ~11, deletions ~19) and adds two
# impostor families sharing A's BLOCK key but not its identity: full
# impostors (~23: every field off -> nonmatch) and near impostors
# (~29: balance+segment+nation agree, name off -> the clerical-review
# band, the same agreement vector a name-perturbed true pair shows).
# Blocking: the testdata customer table carries no stable
# quasi-identifier (no phone/address/zip), so the demo blocks on a
# key-derived bucket (k % 1e5) — computationally the same bounded
# equi-join a zip/phone-prefix block gives (both impostor shifts are
# multiples of the modulus, so impostors land in their target's
# block); in a real deployment the block key is a quasi-identifier,
# e.g. the repo's sorted_neighborhood windows.
_FS_PAIRS_SQL = f"""
    WITH a AS (
        SELECT c_custkey AS k, c_custkey % 100000 AS blk,
               c_nationkey AS nat, c_name AS name,
               {cents_sql('c_acctbal')} AS bal,
               c_mktsegment AS seg
        FROM customer
    ),
    b AS (
        SELECT k, blk, nat,
               CASE WHEN k % 17 = 0 THEN name || '~' ELSE name END
                   AS name,
               bal + CASE WHEN k % 7 = 0 THEN 25 ELSE 0 END AS bal,
               CASE WHEN k % 11 = 0 THEN 'PERTURBED' ELSE seg END
                   AS seg
        FROM a WHERE k % 19 != 0
        UNION ALL
        SELECT k + 20000000, blk, nat, 'IMPOSTOR-' || name,
               bal + 5000, 'PERTURBED'
        FROM a WHERE k % 23 = 0
        UNION ALL
        SELECT k + 40000000, blk, nat, 'NEARBY-' || name,
               bal + 3, seg
        FROM a WHERE k % 29 = 0
    )
    SELECT a.k = b.k AS is_true,
           a.name = b.name AS ag_name,
           abs(a.bal - b.bal) <= 10 AS ag_bal,
           a.seg = b.seg AS ag_seg,
           a.nat = b.nat AS ag_nat
    FROM a JOIN b ON a.blk = b.blk
"""

_FS_AGREE = ("ag_name", "ag_bal", "ag_seg", "ag_nat")
_FS_M = (0.95, 0.90, 0.90, 0.98)
_FS_U = (0.001, 0.005, 0.20, 0.04)
_FS_LOWER, _FS_UPPER = 0.0, 12.0


def q_fellegi_sunter(spark, sf_dir):
    """Decision × ground-truth confusion summary of the Fellegi-Sunter
    linker over the blocked A×B candidate pairs. The pair construction
    is ONE SQL text both engines parse (integer/string ops only); the
    log-likelihood weights are double literals in the shared scoring
    tail. Cost shape: an equi-join on the bounded block key + a per-row
    fixed four-term score + one small hash aggregate."""
    register_views(spark, sf_dir, ["customer"])
    pairs = spark.sql(_FS_PAIRS_SQL)
    return LK.fs_decisions(spark, pairs, _FS_AGREE, _FS_M, _FS_U,
                           _FS_LOWER, _FS_UPPER)


# -- count-min sketch --------------------------------------------------------------

_CM_DEPTH, _CM_WIDTH = 4, 512
_CM_PROBES = tuple(range(1, 21))  # partkeys present at every test SF


def q_count_min(spark, sf_dir):
    """Count-min point-frequency estimates for 20 probe part keys over
    lineitem, with exact counts and the two integer attestations
    alongside (ge_ok: CM never undercounts; bound_ok: overcount stays
    within 3·N/w). The sketch is depth×width bounded counters that
    MERGE by summing — per-day/per-partition partials roll up without
    rescanning raw rows, which is what makes it the 100 TB frequency
    primitive. N rides a one-row broadcast (documented scalar
    crossJoin)."""
    raw = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    sketch = SK.cm_sketch(raw, "l_partkey", _CM_DEPTH, _CM_WIDTH)
    return SK.cm_probe(spark, sketch, raw, "l_partkey", _CM_PROBES,
                       _CM_DEPTH, _CM_WIDTH)


# -- autocorrelation ---------------------------------------------------------------

_ACF_EPOCH = "1992-01-01"
_ACF_MAX_LAG = 7

# weekly-modulated daily order count: the (1 + day%7) factor injects an
# exact 7-day cycle strong enough to beat the Poisson count noise at
# every SF (measured acf(7) ≈ 0.57 at sf0.01 vs |acf(1..6)| ≤ 0.28; the
# earlier (10 + day%7) spelling left acf(7) at 0.14 — modulation sigma
# must exceed the count-noise sigma, r8 session). day%7 from the
# integer day number is engine-portable (dayofweek builtins disagree
# on their 0/1 origin across engines).
_ACF_SERIES_SQL = f"""
    SELECT day, CAST(cnt * (1 + day % 7) AS BIGINT) AS x
    FROM (
        SELECT CAST(date_diff('day', DATE '{_ACF_EPOCH}',
                              CAST(o_orderdate AS DATE)) AS BIGINT)
                   AS day,
               count(*) AS cnt
        FROM orders GROUP BY 1
    )
"""


def weekly_order_series(spark, sf_dir):
    """THE weekly-modulated daily order-count series (shared with
    extensions18's seasonal_decompose so the modulation calibration
    lives in exactly one place — r8 review: four copies had already
    drifted through one recalibration)."""
    day = F.datediff(F.col("o_orderdate"), F.lit(_ACF_EPOCH))
    return (load_table(spark, sf_dir, "orders")
            .groupBy(day.cast("bigint").alias("day"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select("day",
                    (F.col("cnt") * (1 + F.col("day") % 7))
                    .cast("bigint").alias("x")))


def q_acf_lags(spark, sf_dir):
    """ACF of the weekly-modulated daily order count at lags 0..7:
    lag 0 must be exactly 1.0 (the formula's self-attestation) and the
    injected weekly cycle puts lag 7 far above lags 1..6 (measured
    0.57 vs |others| ≤ 0.28 at sf0.01 — the sawtooth's own harmonics
    fill the middle lags). Integer headroom of the n²-scaled sums
    for THIS series: the dominant term n·S·(A+B) ≈ 1.7e17 at sf1
    (n ≈ 2400 days, S ≈ 6e6) — a ~50× margin against int64; the term
    grows ~sf², so exact through roughly sf7. Beyond that, requantize:
    ACF is scale-invariant, so dividing x by c before integerizing
    restores headroom by c² without changing any result — see
    operators/timeseries._acf_tail_sql."""
    return TS.acf(spark, weekly_order_series(spark, sf_dir), "day",
                  "x", _ACF_MAX_LAG)


QUERIES = {
    "fellegi_sunter": q_fellegi_sunter,
    "count_min": q_count_min,
    "acf_lags": q_acf_lags,
}

ORACLES = {
    "fellegi_sunter": LK.fs_decisions_sql(
        _FS_PAIRS_SQL, _FS_AGREE, _FS_M, _FS_U, _FS_LOWER, _FS_UPPER),
    "count_min": SK.cm_probe_sql(
        "SELECT l_partkey FROM lineitem", "l_partkey", _CM_PROBES,
        _CM_DEPTH, _CM_WIDTH),
    "acf_lags": TS.acf_sql(_ACF_SERIES_SQL, "day", "x", _ACF_MAX_LAG),
}
