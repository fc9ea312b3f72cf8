"""Regenerate PLANS.md: the physical plans of representative headline
queries with their Exchange counts, as evidence of the shapes the lint
pins. Run after plan-affecting changes: python tools/dump_plans.py"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHOWCASE = [
    ("tpch_q1", "partial+final agg, one Exchange"),
    ("tpch_q5", "6-table join chain, dims broadcast"),
    ("topk_per_group", "WindowGroupLimit pushes top-k below the sort"),
    ("join_broadcast", "explicit broadcast join"),
    ("dedup_exact", "md5 hash-groupBy dedup"),
    ("ngram_jaccard_dfcut", "posting-list self-join with df-cut"),
    ("heavy_hitters", "Misra-Gries candidates + broadcast recount"),
    ("bloom_join", "single-pass bloom prefilter, broadcast-hash only"),
    ("ann_topk", "broadcast queries, no corpus shuffle"),
    ("interval_join", "grain-bucketed interval equi-join"),
    ("pareto_frontier", "two-level skyline: bucket windows + broadcast prefix"),
    ("embedding_covariance", "(dim_i, dim_j)-keyed covariance aggregate"),
    ("containment_pairs", "posting-list self-join, min-side scoring"),
    ("join_salted", "16-way salted skew join (content-deterministic salt)"),
    ("connector_dv_apply",
     "deletion vectors applied in the connector scan (SinglePartition = "
     "byte-sized task floor at sf0.001: 2 tiny files coalesce into one "
     "fetch task; task count grows as total_bytes/bytes_per_task, "
     "capped at one per file)"),
    ("recursive_cte",
     "Spark 4 WITH RECURSIVE: UnionLoop generates the literal-bounded "
     "spine (84 driver-iterated steps, data-independent), the per-month "
     "aggregate is the only corpus-sized work and broadcasts into the "
     "left join"),
    ("lateral_topn",
     "correlated LATERAL (agg + ORDER BY + LIMIT) decorrelated by "
     "Catalyst into partial+final WindowGroupLimit — no per-outer-row "
     "re-execution, no global sort"),
    ("bm25_topk",
     "BM25 in one corpus shuffle: conditional per-term tf counts ride "
     "the doc-length groupBy; the corpus-stats branch shares it via "
     "ReusedExchange at runtime (AQE), stats broadcast back as a "
     "one-row scalar join; top-k via TakeOrderedAndProject"),
    ("dsir_select",
     "DSIR: hashed-bigram bucket counts (bounded 4096-row table) "
     "broadcast back onto the gram stream; the gram explode runs twice "
     "BY DESIGN — recomputing beats materializing a corpus-sized gram "
     "table; selection via TakeOrderedAndProject"),
    ("udaf_window",
     "pandas GROUPED_AGG UDAF over a bounded frame: WindowInPandas "
     "(Arrow slice per frame), per-user partitions — no global sort"),
    ("arrow_grouped_map",
     "applyInArrow grouped map: FlatMapGroupsInArrow after one hash "
     "Exchange — arrow-native, no pandas conversion"),
    ("interval_merge",
     "gaps-and-islands interval merge: ONE hash Exchange on the key, "
     "then both window passes (running max-end island flag, running "
     "island sum) and both aggregates run inside the same partitioning "
     "— no self-join, no second shuffle"),
    ("bfs_hops",
     "level-synchronous BFS: per hop one vertex-keyed join + distinct "
     "+ anti-join against visited, each frontier localCheckpoint-ed "
     "(the connected_components pattern) so the final plan reads "
     "materialized hop leaves — frontier-sized state, never a path "
     "expansion"),
    ("higher_moments",
     "two-pass central moments: per-group mean broadcast back onto the "
     "stream, centered powers in one map-side-combined aggregate; the "
     "builtin cross-check is a 5-row broadcast join"),
    ("bm25_join_topk",
     "query-TABLE BM25: posting-list equi-join on token between query "
     "terms and corpus tf (fan-out df_t x qf_t, df-cut applied), corpus "
     "stats as a one-row broadcast, per-(query, doc) sum, "
     "WindowGroupLimit top-k per query"),
    ("bpe_encode_lens",
     "tokenizer encode: the k trained merges rewrote the VOCAB during "
     "eager build (localCheckpoint leaves); the visible plan is the "
     "corpus token explode equi-joined to the per-word cache + one "
     "doc-keyed aggregate"),
    ("scd2_lookup",
     "point-in-time lookup: hash join on the user equi-key with the "
     "[valid_from, valid_to) range as residual — never a "
     "BroadcastNestedLoopJoin; the non-overlap invariant caps output "
     "at one row per probe"),
    ("shortest_paths",
     "bounded Bellman-Ford: k=4 relaxation rounds ran eagerly during "
     "build (per-round localCheckpoint — the visible plan reads the "
     "final materialized distance leaf; without the checkpoints round "
     "N re-derives every earlier round per reference)"),
    ("percentile_rollup",
     "mergeable percentiles: one raw scan builds (group, cents) "
     "frequency partials; the '__all__' row merges the PARTIALS (sum "
     "by value) and every percentile/cum-rank pass runs over the "
     "frequency table, never the raw rows again"),
    ("sorted_neighborhood",
     "blocked SNM: per-block rank window (hash Exchange on the block "
     "key, no global sort), neighbor candidates via an EQUI-join on "
     "(block, rank+offset), exact-Jaccard verify on candidates only"),
    ("auc_roc",
     "rank-sum AUC: ONE hash Exchange on the group carries both the "
     "RANK and tie-COUNT windows and the final aggregate — ranks stay "
     "integral (2*rank+ties-1), one double division per group"),
    ("ndcg_eval",
     "NDCG@10: both ROW_NUMBER windows (predicted + ideal order) run "
     "inside the single query-id Exchange; gains pivot to k BIGINT "
     "columns so DCG/IDCG are fixed-shape expressions, never an "
     "order-dependent SUM of doubles"),
    ("count_min",
     "count-min probe: the depth*width sketch aggregate is "
     "localCheckpoint-ed ONCE and serves the lookup join and the N "
     "scalar (no third raw scan); the exact recount scan is "
     "predicate-pruned to the 20 probe keys"),
    ("fellegi_sunter",
     "Fellegi-Sunter: equi-join on the bounded block key, per-row "
     "fixed 4-term literal-weight score, one small hash aggregate — "
     "scoring adds no shuffle beyond the blocking join"),
    ("acf_lags",
     "pairs-available ACF: the day-level series aggregate is "
     "localCheckpoint-ed (1 raw scan, 3 consumers); lag fan-out is an "
     "explode of 8 literals + ONE day-keyed equi-join; scalars ride a "
     "one-row broadcast"),
    ("kmeans_fit",
     "Lloyd k-means, final round: the argmin assignment is a pure "
     "per-row CASE over centroid LITERALS (zero-shuffle), then one "
     "partial+final k-row aggregate — the earlier rounds' k-row "
     "collects never appear in the returned plan"),
    ("kcore",
     "k-core peeling: 4 eager rounds (degree aggregate + two "
     "vertex-keyed equi-joins each, per-round localCheckpoint); the "
     "returned plan reads materialized edge leaves and crossJoins "
     "three one-row summary counts incl. the in-plan fixpoint flag"),
    ("seasonal_decompose",
     "classical decomposition: the checkpointed day-level series feeds "
     "two RANGE-framed window passes and a per-dow aggregate joined "
     "back on dow — day-count-sized work after the one raw groupBy"),
    ("cusum_changepoint",
     "CUSUM: one cumulative ROWS window over the checkpointed "
     "day-level series; (n, Σx) and the max-|nS| ride one-row "
     "broadcasts; exact integers end-to-end, no doubles in the plan"),
    ("kmv_overlap",
     "KMV set algebra: ONE shingle explode emits (corpus-label, sh) "
     "rows, one distinct feeds both the per-corpus k-minimum rank "
     "windows (the sketches) and the groupBy(sh) membership flags "
     "(the exact attestation) — no corpus-vs-corpus equi-join; the "
     "estimate itself is a 2x256-row combine"),
    ("logreg_fit",
     "bounded Newton/IRLS logistic regression: each of the 3 rounds is "
     "one scan-shaped hash aggregate of the fixed 3x3 XtWX/XtWz sums "
     "with the current coefficients re-entering as a #groups-row "
     "broadcast join — the returned plan reads the final round's "
     "aggregate; no per-iteration raw-row state"),
    ("stump_fit",
     "exact Gini-optimal decision stump: one aggregate reduces the "
     "scan to the 16-bucket-per-group (bucket, n, pos) table; every "
     "candidate split is a cumulative window over those buckets — the "
     "exhaustive search never re-touches raw rows"),
    ("naive_bayes_fit",
     "multinomial NB train+eval: the corpus is tokenized ONCE into "
     "checkpointed (id, token) / (id, y, fold) leaves (Catalyst "
     "inlines repeated CTEs — the naive form re-scanned 9x), then one "
     "label aggregate, one (token, class) vocabulary aggregate, and "
     "one holdout scoring equi-join; priors/token totals ride a "
     "one-row broadcast"),
    ("conformal_interval",
     "split conformal: one exact-integer OLS hash aggregate, a "
     "broadcastable #groups-row coefficient join, ONE rank window "
     "over the calibration fold only (pure-integer rank, no "
     "division), and an exact filtered coverage count — nothing "
     "super-linear, no global sort"),
    ("adaboost_fit",
     "discrete AdaBoost over exhaustive stumps: ONE aggregate builds "
     "the (group, x, y) contingency cells and ALL boosting rounds run "
     "on that <=48-row cell table via cumulative windows — instance "
     "weights are constant within a cell, so raw rows are never "
     "re-touched after the first aggregate"),
    ("bootstrap_ci",
     "Poisson bootstrap: one scan (repartitioned pre-expansion when "
     "under-split) explodes B=100 replicate literals per row — each "
     "md5 feeds EIGHT 16-bit draws — into ONE (group, replicate) hash "
     "aggregate carrying the full-sample n/sum in the same pass; CI "
     "bounds are order statistics ranked from the survivor count"),
]
# scd2_repair / connector_cdf_scd2 are deliberately absent: their
# registry callables run the refuse->repair->redeliver / CDC-ingest
# cycle EAGERLY and return the final state read, so the dumped plan
# would show a parquet scan of the state dir, not the repair/merge
# shape — that shape is pinned by the streaming tests and documented
# in COVERAGE.md instead.


def main() -> None:
    from datafusion_delta_sharing_spark.plans.audit import shuffles
    from datafusion_delta_sharing_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("dumpplans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    out = [
        "# PLANS — physical-plan dossier (generated by tools/dump_plans.py)",
        "",
        "Representative headline queries and the executed plans Catalyst",
        "chose for them at sf0.001. `tests/test_plan_audit.py` pins every",
        "registry query against scale antipatterns; this file makes the",
        "showcase shapes reviewable without running Spark.",
        "",
    ]
    for name, why in SHOWCASE:
        df = queries[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # compress: drop per-node argument spam longer than 160 chars
        lines = [re.sub(r"(.{160}).*", r"\1 …", ln)
                 for ln in plan.splitlines()]
        out += [f"## {name} — {why}",
                f"Exchanges: {shuffles(df)}", "", "```",
                *lines[:40], "```", ""]
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(out), encoding="utf-8")
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
