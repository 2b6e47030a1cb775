"""Probe-gated scaling-ladder watcher (VERDICT round-4 item 1).

Loop for the whole round: every ~8 min measure the host's pure-compute
probe (subprocess, local[32]); append to probe_series.jsonl.  The moment
the host is quiet (probe <= FIRE_QUIET, ~1.2x round 3's 0.95 s quiet
baseline) fire the full scaling ladder `SPARK_GRAFT_AMPLIFY=6 bench.py
--scaling --runs 3` from a frozen rsync snapshot of the repo (so live
edits can't crash a leg mid-import), append the triplet to
ladders.jsonl, and immediately run a second back-to-back ladder
(VERDICT item 8: >=2 same-window triplets).  Success = raw >= 0.55 and
probe >= 0.9, or normalized >= 0.8; after success at amplify=6 the
watcher tries one amplify=12 ladder (more compute-dominated, floors
amortized further) and then only records probes.

Escalation so the round never ends empty-handed: if no ladder has fired
after OPP_AFTER_SEC, fire at probe <= FIRE_OPP; after FORCE_AFTER_SEC
fire once unconditionally.

Coordination with interactive dev work in the same sandbox:
  - skips any cycle while a foreign Spark JVM is alive (pgrep);
  - touches /tmp/sg_ladder_running while a ladder is in flight — dev
    shell checks this flag before launching Spark work.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SNAP = "/tmp/sg_snapshot"
FLAG = "/tmp/sg_ladder_running"
SERIES = os.path.join(HERE, "probe_series.jsonl")
LADDERS = os.path.join(HERE, "ladders.jsonl")

# Round-5 retune: the host never went below probe 1.92 all round (r3's
# quiet baseline 0.95 never recurred), and the forced pair at ~2.2 s
# reproduced the contended 0.24-0.35 raw numbers. Fire only on windows
# QUIETER than anything seen this round — a contended ladder adds noise,
# not evidence. No forced tier (a forced pair is already on record).
FIRE_QUIET = 1.50
FIRE_OPP = 1.95         # opportunistic tier (round best was 1.92)
OPP_AFTER_SEC = 90 * 60
FORCE_AFTER_SEC = 10 ** 9
PROBE_INTERVAL = 8 * 60
MAX_RUNTIME = 6 * 3600


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def append(path: str, obj: dict) -> None:
    with open(path, "a") as f:
        f.write(json.dumps(obj) + "\n")


def foreign_spark_alive() -> bool:
    """Any live Spark JVM not descended from this watcher?  The watcher
    serializes its own subprocesses, so at check time any hit is foreign."""
    r = subprocess.run(
        ["pgrep", "-f", "org.apache.spark.deploy"], capture_output=True, text=True
    )
    return bool(r.stdout.strip())


def run_probe() -> float | None:
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "probe_once.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            rec = json.loads(line)
            append(SERIES, rec)
            return rec["probe_sec"]
    log(f"probe failed rc={proc.returncode}: {proc.stderr[-400:]}")
    return None


def snapshot_repo() -> None:
    # no rsync on this host (learned the hard way: the 15:16 forced fire
    # crashed on FileNotFoundError) — shutil does the same job
    import shutil

    shutil.rmtree(SNAP, ignore_errors=True)
    shutil.copytree(
        REPO,
        SNAP,
        ignore=shutil.ignore_patterns(
            ".git", "__pycache__", "scaling_watch", "*.pyc"
        ),
    )


def run_ladder(
    amplify: int, trigger_probe: float, reason: str, cpus_hi: int = 32
) -> dict | None:
    """cpus_hi=32 runs the 8->32 ladder; cpus_hi=8 runs 2->8 — the
    below-the-bandwidth-wall N->4N instantiation that measured raw 0.647
    even at 1.6-1.9x contention (see BENCH.md) and is the likeliest to
    clear 0.8 in a quiet window."""
    snapshot_repo()
    env = dict(
        os.environ,
        SPARK_GRAFT_AMPLIFY=str(amplify),
        SPARK_GRAFT_CPUS=str(cpus_hi),
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(SNAP, "bench.py"), "--scaling", "--runs", "3"],
        env=env,
        capture_output=True,
        text=True,
        timeout=5400,
        cwd=SNAP,
    )
    rec = None
    for line in proc.stdout.splitlines():
        if line.startswith("{") and '"scaling_efficiency"' in line:
            rec = json.loads(line)
    out = {
        "ts": t0,
        "wall_sec": round(time.time() - t0, 1),
        "amplify": amplify,
        "cpus_hi": cpus_hi,
        "trigger_probe": trigger_probe,
        "reason": reason,
        "rc": proc.returncode,
        "result": rec,
    }
    if rec is None:
        out["stderr_tail"] = proc.stderr[-600:]
        out["stdout_tail"] = proc.stdout[-600:]
    append(LADDERS, out)
    log(f"ladder amplify={amplify} done in {out['wall_sec']}s: {json.dumps(rec)}")
    return rec


def is_success(rec: dict | None) -> bool:
    if not rec:
        return False
    raw = rec.get("raw") or 0
    probe = rec.get("probe") or 0
    norm = rec.get("normalized") or 0
    return (raw >= 0.55 and probe >= 0.9) or norm >= 0.8


def main() -> None:
    start = time.time()
    successes = 0
    ladders_fired = 0
    log(f"watcher up; quiet<= {FIRE_QUIET}, opp<= {FIRE_OPP} after "
        f"{OPP_AFTER_SEC//60}m, force after {FORCE_AFTER_SEC//60}m")
    while time.time() - start < MAX_RUNTIME:
        if foreign_spark_alive():
            log("foreign Spark JVM alive — skipping cycle")
            time.sleep(120)
            continue
        try:
            probe = run_probe()
        except subprocess.TimeoutExpired:
            log("probe timeout")
            probe = None
        if probe is None:
            time.sleep(PROBE_INTERVAL)
            continue
        elapsed = time.time() - start
        # each plan entry: (amplify, cpus_hi, label)
        plan: list[tuple[int, int, str]] = []
        if successes < 2:
            if probe <= FIRE_QUIET:
                # one 8->32 and one 2->8 in the same quiet window
                plan = [(6, 32, "quiet 8->32"), (6, 8, "quiet 2->8")]
            elif (
                probe <= FIRE_OPP
                and elapsed > OPP_AFTER_SEC
                and ladders_fired == 0
            ):
                # the 2->8 config is the likeliest to clear the gate
                plan = [(6, 8, "opportunistic 2->8")]
        log(f"probe {probe}s (elapsed {elapsed/60:.0f}m, fired={ladders_fired}, "
            f"ok={successes}) -> "
            f"{'FIRE ' + plan[0][2] if plan else 'wait'}")
        if plan:
            open(FLAG, "w").close()
            try:
                for amplify, cpus_hi, label in plan:
                    if foreign_spark_alive():
                        log("foreign JVM appeared — aborting ladder plan")
                        break
                    rec = run_ladder(amplify, probe, label, cpus_hi=cpus_hi)
                    ladders_fired += 1
                    if is_success(rec):
                        successes += 1
            finally:
                if os.path.exists(FLAG):
                    os.remove(FLAG)
        time.sleep(PROBE_INTERVAL)
    log(f"watcher done: {ladders_fired} ladders, {successes} successes")


if __name__ == "__main__":
    main()
