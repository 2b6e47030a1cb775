"""Standalone host-quietness probe: one local[N] SparkSession, the same
pure-compute calibration job bench.py uses (warm whole-stage-codegen
chained xxhash64 over spark.range — zero shuffle, zero python), min of 3,
printed as one JSON line.  Run in a subprocess so the watcher process
itself never holds a SparkSession.
"""

import json
import os
import sys
import time

PROBE_ROWS = 2_000_000_000


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sg-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    expr = "bit_xor(xxhash64(xxhash64(xxhash64(id, 1), 2), 3))"
    spark.range(0, PROBE_ROWS // 20).selectExpr(expr).collect()
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        spark.range(0, PROBE_ROWS).selectExpr(expr).collect()
        best = min(best, time.time() - t0)
    spark.stop()
    print(json.dumps({"ts": time.time(), "cpus": cpus, "probe_sec": round(best, 3)}))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
