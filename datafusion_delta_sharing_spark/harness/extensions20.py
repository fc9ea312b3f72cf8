"""Extensions batch 20 (r8 session, r10 window slots — WINDOW_PLAN.json
r10_new): behavioral attribution and MDM survivorship — the credit and
golden-record layers that sit on top of the repo's event analytics and
record-linkage stacks.

* ``attribution`` — last/first/linear multi-touch credit over a bounded
  lookback window (:func:`..operators.attribution.attribution_credits`):
  the linear 1/n shares aggregate through (channel, n)-bucketed integer
  counts and a fixed max_touches-term expression, never an
  order-dependent double sum.
* ``survivorship`` — golden-record selection over resolved entities
  (:func:`..operators.linkage.survivorship`): the deterministic rule
  cascade (completeness, freshness, value, key) picks one survivor per
  entity — the step after ``fellegi_sunter`` scoring and
  ``dedup_components`` clustering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions.money import cents_sql
from datafusion_delta_sharing_spark.harness import (
    load_table, register_views)
from datafusion_delta_sharing_spark.operators import attribution as AT
from datafusion_delta_sharing_spark.operators import linkage as LK

# -- attribution -----------------------------------------------------------------

_AT_CHANNELS = ("view", "click", "signup")
_AT_LOOKBACK_DAYS, _AT_MAX_TOUCHES = 2, 4


def q_attribution(spark, sf_dir):
    """Per-channel last/first/linear credit for purchase conversions
    against the view/click/signup touchpoints of the same user inside a
    2-day lookback, capped at the 4 most recent touches. The candidate
    join is user-equi + interval residual (the as-of-tolerance
    pattern) — fan-out bounded by touches-per-user-per-window, not by
    history length."""
    ev = load_table(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin(*_AT_CHANNELS))
    conversions = ev.filter(F.col("event_type") == "purchase")
    return AT.attribution_credits(
        touches, conversions, "user_id", "ts", "event_id",
        "event_type", _AT_LOOKBACK_DAYS, _AT_MAX_TOUCHES)


_AT_CH_LIST = ", ".join(f"'{c}'" for c in _AT_CHANNELS)
_AT_TOUCHES_SQL = (f"SELECT user_id, ts, event_id, event_type "
                   f"FROM events WHERE event_type IN ({_AT_CH_LIST})")
_AT_CONV_SQL = ("SELECT user_id, ts, event_id FROM events "
                "WHERE event_type = 'purchase'")

# -- survivorship -----------------------------------------------------------------

# records = the Fellegi-Sunter demo's A snapshot, its perturbed
# successor B, and the impostor families. Entity resolution is the
# clustering step itself, not a key trick (VERDICT r9 #2 retired the
# `k % 20000000` modulus, whose aliasing bound held only through
# ~sf130): records block on the normalized name — strip the impostor
# prefix and the perturbation tilde, exactly the derived match key
# `fellegi_sunter` compares on — and each block's label is its MIN
# record key, the same min-label convention dedup_components emits.
# c_name is key-derived and unique, so blocks ARE the true entities at
# every SF; no key-range bound, and the derivation text is shared
# verbatim with the oracle.
# Rule cascade: 1) completeness (placeholder segment loses), 2)
# freshness (snapshot B outranks A), 3) higher balance, 4) key — a
# total order, so the survivor is deterministic.
_SURV_RECORDS_SQL = f"""
    WITH a AS (
        SELECT c_custkey AS k, c_name AS name,
               {cents_sql('c_acctbal')} AS bal, c_mktsegment AS seg
        FROM customer
    ),
    all_records AS (
        SELECT k, 'A' AS src, name, bal, seg FROM a
        UNION ALL
        SELECT k, 'B' AS src,
               CASE WHEN k % 17 = 0 THEN name || '~' ELSE name END,
               bal + CASE WHEN k % 7 = 0 THEN 25 ELSE 0 END,
               CASE WHEN k % 11 = 0 THEN 'PERTURBED' ELSE seg END
        FROM a WHERE k % 19 != 0
        UNION ALL
        SELECT k + 20000000, 'B', 'IMPOSTOR-' || name, bal + 5000,
               'PERTURBED'
        FROM a WHERE k % 23 = 0
    )
    SELECT MIN(k) OVER (
               PARTITION BY replace(replace(name, 'IMPOSTOR-', ''),
                                    '~', '')
           ) AS entity,
           k, src, name, bal, seg
    FROM all_records
"""

_SURV_RULES_SQL = ("CASE WHEN seg = 'PERTURBED' THEN 1 ELSE 0 END, "
                   "CASE WHEN src = 'B' THEN 0 ELSE 1 END, "
                   "bal DESC, k")
_SURV_OUT_COLS = "entity, k, src, name, bal, seg"


def q_survivorship(spark, sf_dir):
    """Golden record per resolved entity over the two customer
    snapshots + impostors: entities come from a min-label over the
    normalized-name block (the clustering-output shape — no key-range
    aliasing bound, VERDICT r9 #2), then completeness beats freshness
    beats balance, key breaks ties — ONE entity-keyed rank window on
    top of ONE block-keyed min window. The records text, rule cascade,
    and output list are shared verbatim with the oracle. Output thinned
    to every 7th entity so the driver row stays result-sized (thinning
    AFTER selection on both engines)."""
    register_views(spark, sf_dir, ["customer"])
    records = spark.sql(_SURV_RECORDS_SQL)
    golden = LK.survivorship(spark, records, "entity",
                             _SURV_RULES_SQL, _SURV_OUT_COLS)
    return golden.filter(F.col("entity") % 7 == 0)


_SURV_ORACLE = f"""
    SELECT * FROM ({LK.survivorship_sql(
        _SURV_RECORDS_SQL, 'entity', _SURV_RULES_SQL, _SURV_OUT_COLS)})
    WHERE entity % 7 = 0
"""


QUERIES = {
    "attribution": q_attribution,
    "survivorship": q_survivorship,
}

ORACLES = {
    "attribution": AT.attribution_credits_sql(
        _AT_TOUCHES_SQL, _AT_CONV_SQL, "user_id", "ts", "event_id",
        "event_type", _AT_LOOKBACK_DAYS, _AT_MAX_TOUCHES),
    "survivorship": _SURV_ORACLE,
}
