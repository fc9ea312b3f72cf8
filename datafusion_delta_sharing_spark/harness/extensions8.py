"""Extension queries batch 8: sketch primitives for scale planning.

Heavy hitters over the token stream (Misra-Gries candidates + exact
recount), a bloom-prefiltered join (dim-side filter applied to the fact
table before any shuffle), and frequency moments of a join key (F2 =
exact self-join output size, the pre-flight number for a 100 TB shuffle
join). All three produce exact, hash-checkable results — the sketches
bound intermediate STATE, not answer quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions.money import cents_sql
from datafusion_delta_sharing_spark.operators import tfidf as TF
from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.operators import corpus as CO
from datafusion_delta_sharing_spark.operators import sketches as SK

_HH_MIN_FRAC = 0.002   # tokens covering >= 0.2% of the corpus stream
_BLOOM_BRAND = "Brand#1"  # dim slice: part rows of one brand prefix


def _token_stream(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (TF.token_rows(docs, "text", "doc_id").select("token"))


_TOKEN_STREAM_SQL = (
    "(SELECT token FROM ("
    + TF.token_rows_sql("documents", "text", "doc_id")
    + "))")


def q_heavy_hitters(spark, sf_dir):
    """Corpus stopword discovery: tokens with frequency >= 0.2% of the
    whole token stream, found with bounded per-partition state and an
    exact candidate recount (never a full-vocabulary shuffle)."""
    toks = _token_stream(spark, sf_dir)
    return SK.heavy_hitters(toks, "token", min_frac=_HH_MIN_FRAC)


def q_bloom_join(spark, sf_dir):
    """Bloom-prefilter lineitem against the Brand#1* slice of part:
    report how many fact rows the dim-derived filter admits vs how many
    truly join — the shuffle-avoidance ratio at 100 TB."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").startswith(_BLOOM_BRAND))
    return SK.bloom_prefilter_join_stats(
        lineitem, dim, "l_partkey", "p_partkey")


def q_freq_moments(spark, sf_dir):
    """Join-key census of lineitem.l_orderkey: F2 is the exact row count
    a self equi-join would emit; max_freq the heaviest reducer cell."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return SK.freq_moments(lineitem, "l_orderkey")


def q_token_entropy(spark, sf_dir):
    """Within-doc token-distribution entropy — the repetition screen
    (boilerplate scores low, diverse text high)."""
    docs = load_table(spark, sf_dir, "documents")
    return CO.token_entropy(docs, "text", "doc_id")


def q_rolling_median(spark, sf_dir):
    """Exact rolling median of event values per user over the trailing 7
    events (``percentile(0.5)`` over a row frame) — the robust-smoothing
    counterpart of the mean-based ``window_running``. Partitioned by
    user_id: per-entity state only, no global sort."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-6, 0))
    return (ev.select(
        "event_id", "user_id",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6)
        .alias("med7"))
        .filter(F.col("event_id") < 2000))


_ROLLING_MEDIAN_SQL = """
    SELECT event_id, user_id,
           round(median(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
    FROM events
    QUALIFY event_id < 2000
"""


def q_bigram_logprob(spark, sf_dir):
    """Bigram-LM quality score per document (Laplace-smoothed, corpus-
    trained) — the next rung of the perplexity-filter ladder above
    ``unigram_logprob``."""
    docs = load_table(spark, sf_dir, "documents")
    return CO.bigram_logprob(docs, "text", "doc_id")


def q_image_pipeline(spark, sf_dir):
    """Real image decode path, oracle-checked end to end: each doc gets a
    solid-color 8x8 BMP synthesized from its id, the REAL encoder/decoder
    round-trips the bytes, and ``image_features`` computes pixel means —
    which the DuckDB oracle mirrors in closed form (mean of a solid color
    IS the color). A broken header parse, channel-order slip (RGB/BGR),
    or padding bug desyncs the hash immediately."""
    import numpy as np
    import pandas as pd

    from datafusion_delta_sharing_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200)

    def synth(it):
        for pdf in it:
            payloads = [
                MM.encode_bmp(np.full(
                    (8, 8, 3),
                    (d % 256, (7 * d) % 256, (13 * d) % 256),
                    np.uint8))
                for d in pdf["doc_id"]]
            yield pd.DataFrame({"media_id": pdf["doc_id"],
                                "payload": payloads})

    media = docs.mapInPandas(synth, "media_id bigint, payload binary")
    return MM.image_features(media).select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b")


_IMAGE_PIPELINE_SQL = """
    SELECT doc_id AS media_id,
           CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_r,
           CAST((7 * doc_id) % 256 AS DOUBLE) AS mean_g,
           CAST((13 * doc_id) % 256 AS DOUBLE) AS mean_b
    FROM documents WHERE doc_id < 200
"""


def q_audio_pipeline(spark, sf_dir):
    """Real audio decode path, oracle-checked: per doc, a PCM16 WAV of
    ``1000 + id%500`` frames of an alternating-sign wave at amplitude
    ``100 + id%900`` — so rms = amplitude EXACTLY, zero-crossing rate =
    1.0, duration = n/1000, all closed-form in the oracle while Spark
    goes through the genuine RIFF chunk walk and sample math."""
    import numpy as np
    import pandas as pd

    from datafusion_delta_sharing_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200)

    def synth(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                n = 1000 + int(d) % 500
                amp = 100 + int(d) % 900
                wave = (amp * np.where(np.arange(n) % 2 == 0, 1, -1)
                        ).astype(np.int16)
                payloads.append(MM.encode_wav(wave, 1000))
            yield pd.DataFrame({"media_id": pdf["doc_id"],
                                "payload": payloads})

    media = docs.mapInPandas(synth, "media_id bigint, payload binary")
    return MM.audio_features(media).select(
        "media_id", "sample_rate", "n_frames", "channels", "duration_s",
        "rms", "zero_cross_rate")


_AUDIO_PIPELINE_SQL = """
    SELECT doc_id AS media_id,
           CAST(1000 AS INTEGER) AS sample_rate,
           CAST(1000 + doc_id % 500 AS BIGINT) AS n_frames,
           CAST(1 AS INTEGER) AS channels,
           round((1000 + doc_id % 500) / 1000.0, 6) AS duration_s,
           CAST(100 + doc_id % 900 AS DOUBLE) AS rms,
           CAST(1.0 AS DOUBLE) AS zero_cross_rate
    FROM documents WHERE doc_id < 200
"""


def q_kfold_split(spark, sf_dir):
    """Deterministic 5-fold assignment plus a group-keyed (by source)
    leakage-safe split per document: every row of a source lands in the
    same split, and folds are pure functions of the id — reproducible
    across engines, runs, and cluster sizes."""
    from datafusion_delta_sharing_spark.functions import splits as SP

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "source",
        SP.kfold_assign("doc_id", k=5).alias("fold"),
        SP.group_split_assign("source").alias("grp_split"))


def _kfold_split_sql():
    from datafusion_delta_sharing_spark.functions import splits as SP

    return f"""
        SELECT doc_id, source,
               {SP.kfold_assign_sql('doc_id', k=5)} AS fold,
               {SP.group_split_assign_sql('source')} AS grp_split
        FROM documents
    """


def q_window_distribution(spark, sf_dir):
    """Distribution window functions per language: percent_rank,
    cume_dist, and quartile (ntile) of document length — deterministic
    tie-break on doc_id. Per-entity partitions; no global sort."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id", "lang", "n_chars",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"))


_WINDOW_DISTRIBUTION_SQL = """
    SELECT doc_id, lang, n_chars,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM documents
    WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
"""


def q_mad_outliers(spark, sf_dir):
    """Robust outlier flags: per language, documents whose length
    deviates from the group median by more than 3 median-absolute-
    deviations. Medians of integers land on .0/.5 exactly, so the
    comparison is float-safe and the oracle hash-exact. Two grouped
    aggregates (median, then MAD) + a broadcast-joined flag pass."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    med = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med"))
    dev = docs.join(F.broadcast(med), "lang").withColumn(
        "dev", F.abs(F.col("n_chars") - F.col("med")))
    mad = dev.groupBy("lang").agg(
        F.expr("percentile(dev, 0.5)").alias("mad"))
    return (dev.join(F.broadcast(mad), "lang")
            .select("doc_id", "lang", "n_chars",
                    F.round("dev", 6).alias("dev"),
                    (F.col("dev") > 3 * F.col("mad")).alias("is_outlier")))


_MAD_OUTLIERS_SQL = """
    WITH med AS (
        SELECT lang, median(n_chars) AS med FROM documents GROUP BY lang
    ),
    dev AS (
        SELECT d.doc_id, d.lang, d.n_chars,
               abs(d.n_chars - m.med) AS dev
        FROM documents d JOIN med m USING (lang)
    ),
    mad AS (SELECT lang, median(dev) AS mad FROM dev GROUP BY lang)
    SELECT d.doc_id, d.lang, d.n_chars,
           round(d.dev, 6) AS dev,
           d.dev > 3 * m.mad AS is_outlier
    FROM dev d JOIN mad m USING (lang)
"""


_INCR_CUTOVER = 3000  # event_id boundary: "already ingested" vs new batch


def q_incremental_agg(spark, sf_dir):
    """Algebraic incremental aggregation: per-(day, event_type) stats
    maintained as mergeable partials — the stored state (events below the
    cutover, pre-aggregated) absorbs a new batch WITHOUT rescanning
    history: merge = sum the partial (n, total) pairs and re-derive the
    average at read time. The oracle recomputes from scratch over all
    events; hash equality proves the merge is exact. At 100 TB this is
    the difference between touching one day's data and touching the
    archive — same pattern as the bucketed dedup index, applied to
    aggregates."""
    from datafusion_delta_sharing_spark.functions import money as MONEY

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type",
        # integer cents BEFORE the partials (r9 review): the merged
        # double sum's 6-dp rounding could land on an accumulation-
        # order-sensitive ulp boundary — partials must merge EXACTLY
        MONEY.cents(F.col("value")).alias("cents"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"))

    def partial(df):
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total_cents"))

    state = partial(ev.filter(F.col("event_id") < _INCR_CUTOVER))
    batch = partial(ev.filter(F.col("event_id") >= _INCR_CUTOVER))
    merged = (state.unionByName(batch)
              .groupBy("day", "event_type")
              .agg(F.sum("n").cast("bigint").alias("n"),
                   F.sum("total_cents").cast("bigint")
                   .alias("total_cents")))
    return merged.select(
        "day", "event_type", "n", "total_cents",
        # one division of exact integers — engine-bit-identical
        (F.col("total_cents").cast("double") / F.col("n"))
        .alias("avg_cents"))


_INCREMENTAL_AGG_SQL = f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           count(*) AS n,
           CAST(sum({cents_sql('value')}) AS BIGINT) AS total_cents,
           CAST(sum({cents_sql('value')}) AS DOUBLE) / count(*)
               AS avg_cents
    FROM events
    GROUP BY strftime(ts, '%Y-%m-%d'), event_type
"""


QUERIES = {
    "heavy_hitters": q_heavy_hitters,
    "bloom_join": q_bloom_join,
    "freq_moments": q_freq_moments,
    "bigram_logprob": q_bigram_logprob,
    "token_entropy": q_token_entropy,
    "rolling_median": q_rolling_median,
    "image_pipeline": q_image_pipeline,
    "audio_pipeline": q_audio_pipeline,
    "kfold_split": q_kfold_split,
    "window_distribution": q_window_distribution,
    "mad_outliers": q_mad_outliers,
    "incremental_agg": q_incremental_agg,
}

ORACLES = {
    "heavy_hitters": SK.heavy_hitters_sql(
        _TOKEN_STREAM_SQL, "token", _HH_MIN_FRAC),
    "bloom_join": SK.bloom_prefilter_join_stats_sql(
        "lineitem",
        f"(SELECT * FROM part WHERE p_brand LIKE '{_BLOOM_BRAND}%')",
        "l_partkey", "p_partkey"),
    "freq_moments": SK.freq_moments_sql("lineitem", "l_orderkey"),
    "bigram_logprob": CO.bigram_logprob_sql("documents", "text", "doc_id"),
    "token_entropy": CO.token_entropy_sql("documents", "text", "doc_id"),
    "rolling_median": _ROLLING_MEDIAN_SQL,
    "image_pipeline": _IMAGE_PIPELINE_SQL,
    "audio_pipeline": _AUDIO_PIPELINE_SQL,
    "kfold_split": _kfold_split_sql(),
    "window_distribution": _WINDOW_DISTRIBUTION_SQL,
    "mad_outliers": _MAD_OUTLIERS_SQL,
    "incremental_agg": _INCREMENTAL_AGG_SQL,
}
