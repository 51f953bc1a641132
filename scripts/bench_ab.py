"""Interleaved kernel A/B for the headline extraction rate.

Answers "did the engine regress, or did the box?": runs
scripts/bench_worker.py (fresh process per run) alternately from a
git WORKTREE pinned at a baseline ref and from the CURRENT tree,
A/B/A/B..., on the same box minutes apart, recording box telemetry
(loadavg + effective MHz) beside every run. Interleaving cancels
slow box-state drift; the per-run telemetry exposes fast drift.

Writes BENCH/headline_ab.json.
Usage: python scripts/bench_ab.py <baseline_ref> [n_convs] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _box_state() -> dict:
    st: dict = {}
    try:
        with open("/proc/loadavg") as f:
            p = f.read().split()
        st["loadavg_1m"] = float(p[0])
    except (OSError, ValueError, IndexError):
        pass
    try:
        mhz = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("cpu MHz"):
                    mhz.append(float(line.split(":")[1]))
        if mhz:
            st["cpu_mhz_mean"] = round(sum(mhz) / len(mhz))
    except (OSError, ValueError, IndexError):
        pass
    return st


def run_worker(tree: str, cores: int, n_convs: int) -> dict:
    cmd = [sys.executable, os.path.join(tree, "scripts", "bench_worker.py"),
           str(cores), str(n_convs)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    box0 = _box_state()
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=tree,
                         timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    res["box_before"] = box0
    res["box_after"] = _box_state()
    return res


def main() -> None:
    ref = sys.argv[1]
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    wt = "/tmp/bench_ab_baseline"
    subprocess.run(["git", "worktree", "remove", "--force", wt],
                   cwd=REPO, capture_output=True)
    subprocess.run(["git", "worktree", "add", "--detach", wt, ref],
                   cwd=REPO, check=True, capture_output=True)
    try:
        runs = {"baseline": [], "current": []}
        for r in range(rounds):
            for label, tree in (("baseline", wt), ("current", REPO)):
                res = run_worker(tree, cores, n_convs)
                runs[label].append(res)
                print(f"round {r} {label}: {res['wall_sec']}s "
                      f"({res['triples_per_sec']:,.0f} tps, "
                      f"load {res['box_before'].get('loadavg_1m')}, "
                      f"{res['box_before'].get('cpu_mhz_mean')} MHz)",
                      file=sys.stderr)
        med = {k: sorted(x["triples_per_sec"] for x in v)[len(v) // 2]
               for k, v in runs.items()}
        result = {
            "baseline_ref": ref,
            "current_commit": subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                capture_output=True, text=True).stdout.strip(),
            "cores": cores, "n_convs": n_convs,
            "median_tps": med,
            "current_over_baseline": round(med["current"] / med["baseline"], 3),
            "runs": runs,
            "protocol": ("interleaved A/B/A/B, taskset-pinned, fresh JVM "
                         "per run, full warmup pass untimed; box telemetry "
                         "per run"),
            "recorded_unix": int(time.time()),
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "headline_ab.json"), "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps({k: v for k, v in result.items() if k != "runs"}))
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)


if __name__ == "__main__":
    main()
