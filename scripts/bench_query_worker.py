"""One battery-query measurement run against an ARBITRARY tree.

Invoked by bench_ab_dedup.py in a fresh process per run: imports the
engine from the tree path given on argv (so a pinned baseline
worktree needs no copy of this script), runs one named query from
QUERIES median-of-3 with a full untimed warmup pass, prints ONE JSON
line. Mirrors bench.py's measurement protocol (clearCache between
runs, noop sink).

Usage: python bench_query_worker.py <tree> <cores> <sf_dir> <query>
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    tree, cores, sf_dir, query = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4])
    sys.path.insert(0, tree)

    from jsonld_js_spark.queries import QUERIES
    from jsonld_js_spark.session import build_session

    fn = QUERIES[query][0]
    spark = build_session(f"bench-ab-{query}", cores=cores,
                          shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")

    def run_once() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run_once()  # warmup: python workers + codegen + JIT untimed
    walls = sorted(run_once() for _ in range(3))
    spark.stop()
    print(json.dumps({
        "query": query, "cores": cores, "sf_dir": sf_dir,
        "wall_sec": walls[1],
        "spread": [round(walls[0], 3), round(walls[-1], 3)],
    }))


if __name__ == "__main__":
    main()
