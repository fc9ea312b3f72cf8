"""Targeted sf0.1 -> sf1 growth probe (VERDICT r4 #4): time named registry
queries at /root/testdata/sf0.1 and a 10x replica (tools/make_scale_data.py
10 /tmp/sfbig), report median-of-N wall times and the growth ratio.

Usage: python tools/scale_probe.py [query ...]   (default: the r4 additions)
Prints one JSON line: {"queries": {name: {"sf0.1": s, "sf1": s, "ratio": r}},
"loadavg": {...}} — results land as a table in SCALING.md.
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
]
SMALL = "/root/testdata/sf0.1"
BIG = os.environ.get("SPARK_GRAFT_BIG_DIR", "/tmp/sfbig")
N = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


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
        fn = queries[name]
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
