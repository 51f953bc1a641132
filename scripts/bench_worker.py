"""One scaling-measurement run: local[cores], seed-42 corpus, timed
fused extraction. Prints ONE JSON line. Invoked by bench_scaling.py
in a fresh process so JVMs don't share state."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    n_convs = int(sys.argv[2])

    from jsonld_js_spark.operators.pipeline import extract_triples_hybrid, triples_only
    from jsonld_js_spark.session import build_session
    from jsonld_js_spark.sources.transcripts import synthesize_transcripts

    spark = build_session(f"bench-scaling-{cores}", cores=cores,
                          shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    tx = synthesize_transcripts(spark, n_convs, seed=42).cache()
    n_turns = tx.count()

    # FULL warmup pass: python workers + codegen + JIT amortized out of
    # the timed region; the timed second pass is the marginal rate
    triples_only(extract_triples_hybrid(tx)).count()

    t0 = time.perf_counter()
    n_triples = triples_only(extract_triples_hybrid(tx)).count()
    wall = time.perf_counter() - t0
    spark.stop()

    print(json.dumps({
        "cores": cores,
        "input_turns": n_turns,
        "triples": n_triples,
        "wall_sec": round(wall, 2),
        "triples_per_sec": round(n_triples / wall, 1),
    }))


if __name__ == "__main__":
    main()
