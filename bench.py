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

Every run also times a pure-compute CALIBRATION PROBE (warm
whole-stage-codegen chained xxhash64 over spark.range — zero shuffle,
zero python, zero DRAM pressure) and reports it as "probe_sec": the probe
measures what the shared host can deliver THAT MINUTE, so efficiency
numbers can be normalized against the attainable ceiling instead of 1.0.

Scaling evidence (north rule: >=0.8 efficiency from N to 4N executors,
sandbox substitute = two parallelism levels): ``--scaling`` runs the
flagship pipeline at cpus/4 and cpus in two SEQUENTIAL subprocesses
(never two Spark sessions at once — they poison each other's timings)
and prints one JSON line with the {raw, probe, normalized} efficiency
triplet. Recommended: SPARK_GRAFT_AMPLIFY=6 so the measurement is
compute-dominated rather than scheduling-floor-dominated (see BENCH.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PROBE_ROWS = 2_000_000_000


def _proc_tree_cpu_sec() -> float:
    """Total CPU seconds (utime+stime) of this process and every live
    descendant — the python driver, the local-mode JVM, and the python
    workers. Pure /proc, no dependencies. Slight undercount when Spark
    retires a python worker mid-run (its CPU time is lost), which biases
    the utilization numbers DOWN — safe for a lower-bound claim."""
    hz = os.sysconf("SC_CLK_TCK")
    procs: dict[int, tuple[int, float]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                rest = f.read().rsplit(")", 1)[1].split()
            procs[int(pid)] = (int(rest[1]), (int(rest[11]) + int(rest[12])) / hz)
        except (OSError, IndexError, ValueError):
            continue
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        children.setdefault(ppid, []).append(pid)
    total, stack, seen = 0.0, [os.getpid()], set()
    while stack:
        p = stack.pop()
        if p in seen or p not in procs:
            continue
        seen.add(p)
        total += procs[p][1]
        stack.extend(children.get(p, []))
    return total


def _probe_sec(spark) -> float:
    """Min-of-3 wall seconds for the fixed pure-compute probe job."""
    expr = "bit_xor(xxhash64(xxhash64(xxhash64(id, 1), 2), 3))"
    spark.range(0, PROBE_ROWS // 20).selectExpr(expr).collect()  # warm codegen
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        spark.range(0, PROBE_ROWS).selectExpr(expr).collect()
        best = min(best, time.time() - t0)
    return best


def _parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument(
        "--runs",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_RUNS", "1")),
        help="repetitions per query inside one session; min is reported",
    )
    p.add_argument(
        "--scaling",
        action="store_true",
        help="run the N vs 4N parallelism ladder (two sequential "
        "subprocesses) and print the efficiency triplet",
    )
    args = p.parse_args()
    if args.runs < 1:
        args.runs = 1
    return args


def _run_scaling(args: argparse.Namespace) -> None:
    """Orchestrate the two-level ladder; the parent holds NO SparkSession."""
    cpus_hi = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cpus_lo = max(2, cpus_hi // 4)
    factor = cpus_hi / cpus_lo
    legs: dict[int, dict] = {}
    for n in (cpus_lo, cpus_hi):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(n),
            SPARK_GRAFT_RESOLVE_ONLY="1",
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--runs", str(args.runs)],
            env=env,
            capture_output=True,
            text=True,
        )
        line = next(
            (l for l in reversed(proc.stdout.splitlines()) if l.startswith("{")),
            None,
        )
        if proc.returncode != 0 or line is None:
            print(
                json.dumps(
                    {
                        "metric": "scaling_efficiency",
                        "error": f"leg cpus={n} failed rc={proc.returncode}",
                        "stderr_tail": proc.stderr[-500:],
                    }
                )
            )
            sys.exit(1)
        legs[n] = json.loads(line)
    lo, hi = legs[cpus_lo], legs[cpus_hi]
    raw = hi["docs_per_sec"] / (factor * lo["docs_per_sec"])
    # probe efficiency: how well the HOST itself scaled lo -> hi cores on
    # pure compute in the same session windows — the attainable ceiling
    probe = (lo["probe_sec"] / hi["probe_sec"]) / factor
    # utilization scaling: fraction of cores kept busy at hi vs lo — 1.0
    # means the plan parallelizes perfectly and any throughput shortfall
    # is per-core slowdown (shared memory bandwidth), not idle cores
    util = (hi["cores_busy"] / cpus_hi) / (lo["cores_busy"] / cpus_lo)
    out = {
        "metric": "scaling_efficiency",
        "value": round(raw, 3),
        "unit": "fraction",
        "cpus_lo": cpus_lo,
        "cpus_hi": cpus_hi,
        "raw": round(raw, 3),
        "probe": round(probe, 3),
        "normalized": round(raw / probe, 3) if probe > 0 else None,
        "utilization": round(util, 3),
        "cores_busy_lo": lo["cores_busy"],
        "cores_busy_hi": hi["cores_busy"],
        "docs_per_sec_lo": lo["docs_per_sec"],
        "docs_per_sec_hi": hi["docs_per_sec"],
        "probe_sec_lo": lo["probe_sec"],
        "probe_sec_hi": hi["probe_sec"],
        "amplify": lo["amplify"],
        "n_docs": lo["n_docs"],
        "n_runs": args.runs,
        "sf": lo["sf"],
    }
    print(json.dumps(out))


def main() -> None:
    args = _parse_args()
    if args.scaling:
        _run_scaling(args)
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Corpus amplification for the flagship pipeline (the driver's documents
    # table caps at 5000 base rows; amplification exercises real scale).
    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "1"))
    n_runs = args.runs
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

    # Host-contention probe BEFORE the timed runs as well as after: the
    # probe estimates the attainable pure-compute ceiling for the window,
    # and a single draw can land on a transient noisy-neighbor spike
    # (observed: 8.69 s at 8 cores vs ~3.8 s quiet — one bad draw poisons
    # the whole ladder normalization). min(before, after) is the best
    # available estimate of the window's TRUE ceiling.
    probe_before = _probe_sec(spark)

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
    busy: list[float] = []
    for _ in range(n_runs):
        timings: dict[str, float] = {}
        # Flagship: full resolve pipeline; docs/sec headline. cores_busy =
        # CPU-seconds / wall across the whole process tree during the run:
        # parallel UTILIZATION, independent of per-core throughput — the
        # lower bound on how many cores the plan kept fed.
        cpu0, t0 = _proc_tree_cpu_sec(), time.time()
        resolved = resolve_documents(spark, docs)
        n_resolved = resolved.count()
        wall = time.time() - t0
        busy.append((_proc_tree_cpu_sec() - cpu0) / wall)
        timings["resolve_pipeline"] = round(wall, 3)
        # Operator benchmarks (each timed to first materialization).
        # SPARK_GRAFT_RESOLVE_ONLY=1 limits the run to the flagship
        # pipeline — used for the N-vs-4N scaling measurements where only
        # the pipeline's docs/sec matters.
        for name in op_names:
            t0 = time.time()
            queries[name](spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
        runs.append(timings)

    probe_s = min(probe_before, _probe_sec(spark))
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
        "probe_sec": round(probe_s, 3),
        # max over runs: the best-observed parallel utilization (noisy
        # neighbors can only steal cores, never add them)
        "cores_busy": round(max(busy), 2),
    }
    if n_runs > 1:
        out["n_runs"] = n_runs
        out["runs"] = runs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
