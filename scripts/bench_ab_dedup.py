"""Interleaved kernel A/B for battery queries (default: the dedup
family whose BENCH_r04 medians regressed without adjudication).

Same protocol as bench_ab.py's headline A/B: fresh process per run,
taskset-pinned, baseline kernel from a pinned git worktree vs the
current tree, interleaved A/B/A/B with per-run box telemetry. The
worker (bench_query_worker.py) is always taken from the CURRENT tree
and told which tree to import the engine from, so the baseline ref
needs no copy of the harness.

Writes BENCH/dedup_ab.json.
Usage: python scripts/bench_ab_dedup.py <baseline_ref> [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from bench_ab import _box_state  # noqa: E402

DEFAULT_QUERIES = ["doc_dedup_minhash_lsh", "doc_dedup_minhash_capped"]


def run_worker(tree: str, cores: int, sf_dir: str, query: str) -> dict:
    cmd = [sys.executable,
           os.path.join(REPO, "scripts", "bench_query_worker.py"),
           tree, str(cores), sf_dir, query]
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
    queries = sys.argv[2:] or DEFAULT_QUERIES
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))

    wt = "/tmp/bench_ab_dedup_baseline"
    subprocess.run(["git", "worktree", "remove", "--force", wt],
                   cwd=REPO, capture_output=True)
    subprocess.run(["git", "worktree", "add", "--detach", wt, ref],
                   cwd=REPO, check=True, capture_output=True)
    try:
        per_query: dict[str, dict] = {}
        for query in queries:
            runs: dict[str, list] = {"baseline": [], "current": []}
            for r in range(rounds):
                for label, tree in (("baseline", wt), ("current", REPO)):
                    res = run_worker(tree, cores, sf_dir, query)
                    runs[label].append(res)
                    print(f"{query} round {r} {label}: "
                          f"{res['wall_sec']:.2f}s spread {res['spread']} "
                          f"(load {res['box_before'].get('loadavg_1m')}, "
                          f"{res['box_before'].get('cpu_mhz_mean')} MHz)",
                          file=sys.stderr)
            med = {k: sorted(x["wall_sec"] for x in v)[len(v) // 2]
                   for k, v in runs.items()}
            per_query[query] = {
                "median_wall_sec": {k: round(v, 3) for k, v in med.items()},
                # >1 = current SLOWER than baseline (wall ratio)
                "current_over_baseline": round(
                    med["current"] / med["baseline"], 3),
                "runs": runs,
            }
        result = {
            "baseline_ref": ref,
            "current_commit": subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                capture_output=True, text=True).stdout.strip(),
            "cores": cores, "sf_dir": sf_dir,
            "queries": per_query,
            "protocol": ("interleaved A/B/A/B per query, taskset-pinned, "
                         "fresh JVM per run, median-of-3 after full warmup; "
                         "box telemetry per run"),
            "recorded_unix": int(time.time()),
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "dedup_ab.json"), "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps({
            q: {"median_wall_sec": d["median_wall_sec"],
                "current_over_baseline": d["current_over_baseline"]}
            for q, d in per_query.items()}))
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)


if __name__ == "__main__":
    main()
