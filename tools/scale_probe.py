"""Targeted sf0.1 -> sf1 growth probe (VERDICT r4 #4): time named registry
queries at /root/testdata/sf0.1 and a 10x replica (tools/make_scale_data.py
10 /tmp/sfbig), report median-of-N wall times and the growth ratio.

Usage: python tools/scale_probe.py [query ...]   (default: the r4 additions)
Prints one JSON line: {"queries": {name: {"sf0.1": s, "sf1": s, "ratio": r}},
"loadavg": {...}} — results land as a table in SCALING.md.

CAVEAT on registry queries: several pin their workload for oracle
checkability (``doc_id < 150`` jaccard/containment subsets, 200 synthetic
media rows) — their sf1 "ratio" measures scan + task overhead over 10x the
input files, NOT operator growth. The ``prop:*`` workloads below re-run
the same OPERATORS over a corpus-PROPORTIONAL subset (every 33rd doc, so
10x the documents at sf1) — those ratios are the real growth curves.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT = [
    "containment_pairs", "embedding_covariance", "random_projection",
    "pareto_frontier", "heavy_hitters", "bloom_join", "freq_moments",
    "image_pipeline", "audio_pipeline", "kfold_split", "token_entropy",
    "rolling_median", "bigram_logprob",
    "ngram_jaccard", "ngram_jaccard_prefix",
    "prop:jaccard_plain", "prop:jaccard_prefix", "prop:containment",
    "prop:image_decode", "prop:audio_decode",
]
SMALL = "/root/testdata/sf0.1"
BIG = os.environ.get("SPARK_GRAFT_BIG_DIR", "/tmp/sfbig")
N = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _docs_frac(spark, sf_dir, mod: int = 33):
    """~1/mod of the documents table at ANY scale factor — the corpus-
    proportional workload the pinned registry queries cannot provide."""
    from pyspark.sql import functions as F

    from datafusion_delta_sharing_spark.harness import load_table

    return (load_table(spark, sf_dir, "documents")
            .filter(F.pmod("doc_id", F.lit(mod)) == 0)
            .select("doc_id", "text"))


def _media_frac(spark, sf_dir, kind: str):
    """Synthetic BMP/WAV payloads for the proportional doc subset — same
    synthesis as the registry image/audio pipelines, corpus-sized."""
    import numpy as np
    import pandas as pd

    from datafusion_delta_sharing_spark.operators import multimodal as MM

    docs = _docs_frac(spark, sf_dir).select("doc_id")

    def synth(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if kind == "image":
                    payloads.append(MM.encode_bmp(np.full(
                        (8, 8, 3),
                        (d % 256, (7 * d) % 256, (13 * d) % 256),
                        np.uint8)))
                else:
                    n, amp = 1000 + d % 500, 100 + d % 900
                    wave = np.full(n, amp, np.int16)
                    wave[1::2] *= -1
                    payloads.append(MM.encode_wav(wave.reshape(-1, 1), 1000))
            yield pd.DataFrame({"media_id": pdf["doc_id"],
                                "payload": payloads})

    return docs.mapInPandas(synth, "media_id bigint, payload binary")


def _proportional(name: str):
    from datafusion_delta_sharing_spark.operators import dedup as DE
    from datafusion_delta_sharing_spark.operators import multimodal as MM

    return {
        "prop:jaccard_plain": lambda s, d: DE.ngram_jaccard_pairs(
            _docs_frac(s, d), "text", "doc_id", k=5, threshold=0.2),
        "prop:jaccard_prefix": lambda s, d: DE.ngram_jaccard_pairs_prefix(
            _docs_frac(s, d), "text", "doc_id", k=5, threshold=0.2),
        "prop:containment": lambda s, d: DE.containment_pairs(
            _docs_frac(s, d), "text", "doc_id", k=5, threshold=0.6),
        "prop:image_decode": lambda s, d: MM.image_features(
            _media_frac(s, d, "image")),
        "prop:audio_decode": lambda s, d: MM.audio_features(
            _media_frac(s, d, "audio")),
    }[name]


def main() -> None:
    names = sys.argv[1:] or DEFAULT

    import __spark_entry__ as entrymod
    from datafusion_delta_sharing_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    load_before = os.getloadavg()
    out: dict[str, dict] = {}
    for name in names:
        fn = _proportional(name) if name.startswith("prop:") else queries[name]
        med = {}
        for label, sf_dir in (("sf0.1", SMALL), ("sf1", BIG)):
            samples = []
            for _ in range(N):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                samples.append(time.perf_counter() - t0)
            med[label] = round(statistics.median(samples), 3)
        med["ratio"] = round(med["sf1"] / med["sf0.1"], 2)
        out[name] = med
        print(f"# {name}: {med}", file=sys.stderr, flush=True)
    print(json.dumps({"queries": out, "n_runs": N,
                      "loadavg": {"before": list(load_before),
                                  "after": list(os.getloadavg())}}))
    spark.stop()


if __name__ == "__main__":
    main()
