"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline = the flagship resolve pipeline (docs/sec is the metric that maps
to the north rule's pages/sec) plus representative operator queries.

Repeats: ``--runs N`` (or SPARK_GRAFT_RUNS) times each query inside one
session and reports the MIN per query (plus the per-run array under
"runs") — the sandbox shares its host and single-shot numbers carry
documented ~2x noisy-neighbor waves; min-of-runs is the reproducible
number. Default 1 run keeps the driver's single-shot contract.

Scaling evidence (north rule: >=0.8 efficiency from N to 4N executors,
sandbox substitute = two parallelism levels): run twice, e.g.
    SPARK_GRAFT_CPUS=8  python bench.py
    SPARK_GRAFT_CPUS=32 python bench.py
and compare docs_per_sec (see BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Corpus amplification for the flagship pipeline (the driver's documents
    # table caps at 5000 base rows; amplification exercises real scale).
    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "1"))
    n_runs = int(os.environ.get("SPARK_GRAFT_RUNS", "1"))
    if "--runs" in sys.argv:
        n_runs = int(sys.argv[sys.argv.index("--runs") + 1])
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    import __spark_entry__ as entry_mod
    from gpu_entity_resolver_spark.session import get_spark
    from gpu_entity_resolver_spark.plans.resolve import resolve_documents
    from gpu_entity_resolver_spark.sources.webgen import (
        INPUT_COLUMNS,
        generate_documents,
    )

    spark = get_spark(app_name="bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    runs: list[dict[str, float]] = []

    t0 = time.time()
    docs = generate_documents(spark, sf_dir, amplify=amplify).select(*INPUT_COLUMNS)
    docs = docs.localCheckpoint(eager=True)  # exclude generator cost
    n_docs = docs.count()
    gen_s = time.time() - t0

    queries = entry_mod.queries()
    op_names = [] if os.environ.get("SPARK_GRAFT_RESOLVE_ONLY") else [
        "minhash_dedup",
        "exact_dedup",
        "agg_stats",
        "join_enrich",
        "topk_per_group",
        "knn_bruteforce",
        "simhash",
        "connected_components",
    ]

    n_resolved = 0
    for _ in range(n_runs):
        timings: dict[str, float] = {}
        # Flagship: full resolve pipeline; docs/sec headline.
        t0 = time.time()
        resolved = resolve_documents(spark, docs)
        n_resolved = resolved.count()
        timings["resolve_pipeline"] = round(time.time() - t0, 3)
        # Operator benchmarks (each timed to first materialization).
        # SPARK_GRAFT_RESOLVE_ONLY=1 limits the run to the flagship
        # pipeline — used for the N-vs-4N scaling measurements where only
        # the pipeline's docs/sec matters.
        for name in op_names:
            t0 = time.time()
            queries[name](spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
        runs.append(timings)

    best = {k: min(r[k] for r in runs) for k in runs[0]}
    docs_per_sec = round(n_docs / best["resolve_pipeline"], 1)
    total = round(sum(best.values()), 3)
    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": best,
        "sf": sf,
        "n_docs": n_docs,
        "n_resolved": n_resolved,
        "docs_per_sec": docs_per_sec,
        "cpus": cpus,
        "amplify": amplify,
        "gen_sec": round(gen_s, 3),
    }
    if n_runs > 1:
        out["n_runs"] = n_runs
        out["runs"] = runs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
