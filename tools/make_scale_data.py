"""Synthesize a larger scale factor by replicating sf0.1 with shifted keys
(deterministic, join-consistent): fact keys shift per copy so the join
graph is preserved; small dims stay as-is. For scale probing only — not
driver testdata.

Usage: python tools/make_scale_data.py [copies] [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_delta_sharing_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
KEY_SHIFTS = {
    # table -> columns shifted by copy_index * stride
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STRIDE = 10_000_000
DIMS = ["region", "nation"]


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    spark = get_spark("scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for name in DIMS:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite").parquet(f"{out}/{name}.parquet")

    for name, keys in KEY_SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        replicated = df.crossJoin(
            spark.range(copies).withColumnRenamed("id", "__copy"))
        for key in keys:
            replicated = replicated.withColumn(
                key, F.col(key) + F.col("__copy") * STRIDE)
        (replicated.drop("__copy")
         .repartition(32)
         .write.mode("overwrite").parquet(f"{out}/{name}.parquet"))
        print(f"{name}: x{copies}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
