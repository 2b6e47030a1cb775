"""Dump .explain("formatted") for the bench queries to plans/r06/.

Usage: python dump_plans.py <outdir> <suffix>   (suffix: before|after)
Not part of the driver contract — evidence generation for the
optimization-round deliverables.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "resolve_pipeline",
    "minhash_dedup",
    "simhash",
    "knn_bruteforce",
    "knn_ivf",
    "connected_components",
    "exact_dedup",
    "agg_stats",
    "join_enrich",
    "topk_per_group",
    "dedup_survivors",
    "ngram_jaccard",
    "assign_new",
]


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from gpu_entity_resolver_spark.session import get_spark

    spark = get_spark(app_name=f"plans_{suffix}", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    qs = entry_mod.queries()
    for name in QUERIES:
        if name not in qs:
            continue
        try:
            df = qs[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
