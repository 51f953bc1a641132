"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: triples/sec of the fused transcripts->triples KG
extraction (the north-rule path), measured over the deterministic
synthetic corpus. `queries` carries per-query wall seconds for the
operator battery at the given scale factor.

Scaling-efficiency protocol (BASELINE.md): run this same script at
SPARK_GRAFT_CPUS=8 and =32 on identical input (scripts/bench_scaling.py
automates it and writes BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time


def _box_state() -> dict:
    """Load/clock telemetry so cross-run regressions can be
    adjudicated: this box is shared — neighbors swing heavy-query
    walls 2-3x — and it down-clocks per-core as active cores grow.
    A headline delta without these numbers is unexplainable."""
    st: dict = {}
    try:
        with open("/proc/loadavg") as f:
            parts = f.read().split()
        st["loadavg_1m"] = float(parts[0])
        st["loadavg_5m"] = float(parts[1])
        st["runnable_over_total"] = parts[3]
    except (OSError, IndexError, ValueError):
        pass
    try:
        mhz = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("cpu MHz"):
                    mhz.append(float(line.split(":")[1]))
        if mhz:
            st["cpu_mhz_mean"] = round(sum(mhz) / len(mhz))
            st["cpu_mhz_min"] = round(min(mhz))
            st["cpu_mhz_max"] = round(max(mhz))
    except (OSError, IndexError, ValueError):
        pass
    return st


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "100000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    from jsonld_js_spark.operators.pipeline import extract_triples_hybrid, triples_only
    from jsonld_js_spark.queries import QUERIES
    from jsonld_js_spark.session import build_session
    from jsonld_js_spark.sources.transcripts import synthesize_transcripts

    spark = build_session("jsonld-js-spark-bench", cores=cpus,
                          shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    # headline: KG extraction throughput over the transcript corpus,
    # measured on the SCALE PATH (extract_triples_hybrid: plain turns
    # stay in whole-stage codegen, only embedded-doc/tool turns cross
    # into the Arrow kernel; parity with extract_triples is asserted
    # in tests/test_hybrid.py)
    tx = synthesize_transcripts(spark, n_convs, seed=42).cache()
    n_turns = tx.count()  # materialize input outside the timed region
    # FULL-SIZE warmup: a 3% sample left ~6s of python-worker fork +
    # codegen + JIT inside the timed region, underreporting the
    # engine's demonstrated rate ~3x at this corpus size (BENCH_r01
    # 168k/s vs the scaling protocol's 466k/s on identical hardware).
    # One complete untimed pass amortizes every fixed cost; the timed
    # pass then measures the marginal rate — the number that predicts
    # cluster throughput.
    triples_only(extract_triples_hybrid(tx)).count()
    headline_walls = []
    headline_box = []
    for _ in range(3):  # median-of-3: the headline must be signal
        headline_box.append(_box_state())
        t0 = time.perf_counter()
        n_triples = triples_only(extract_triples_hybrid(tx)).count()
        headline_walls.append(time.perf_counter() - t0)
    extract_sec = sorted(headline_walls)[1]
    triples_per_sec = n_triples / extract_sec if extract_sec > 0 else 0.0
    tx.unpersist()

    per_query: dict[str, float] = {"kg_extract_transcripts_headline": round(extract_sec, 3)}
    spread: dict[str, list[float]] = {}
    skip = {"kg_extract_transcripts", "kg_canonize_transcripts", "kg_full_build"}

    def run_once(fn) -> float:
        # isolate each measurement: no cross-query cache reuse
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    heavy_box: dict[str, dict] = {}
    for name, (fn, _sql) in QUERIES.items():
        if name in skip:
            continue
        walls = [run_once(fn)]
        if walls[0] > 3.0:
            # heavy queries swing 2-3x run-to-run on this box: report
            # the median of 3 so round-over-round deltas are signal,
            # and snapshot box load so regressions are adjudicable
            # from the artifact alone (BENCH_r04's dedup medians were
            # not)
            heavy_box[name] = _box_state()
            walls += [run_once(fn) for _ in range(2)]
            spread[name] = [round(min(walls), 3), round(max(walls), 3)]
        walls.sort()
        per_query[name] = round(walls[len(walls) // 2], 3)

    record = {
        "metric": "kg_extract_triples_per_sec",
        "value": round(triples_per_sec, 1),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "detail": {
            "cores": cpus,
            "input_turns": n_turns,
            "triples": n_triples,
            "extract_wall_sec": round(extract_sec, 3),
            "extract_wall_spread": [round(min(headline_walls), 3),
                                    round(max(headline_walls), 3)],
            "heavy_query_spread_min_max": spread,
            "box_state_per_headline_run": headline_box,
            "box_state_per_heavy_query": heavy_box,
            "box_state_end": _box_state(),
        },
    }
    # Full record (with per-run telemetry) goes to a file; the driver
    # captures only the TAIL of stdout, and the r4 artifact lost the
    # headline because the one giant line overflowed that capture.
    # The final printed line is COMPACT (headline + per-query medians
    # only) so the driver's tail always parses.
    try:
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/last_run.json", "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
    except OSError:
        pass
    compact = {k: record[k] for k in
               ("metric", "value", "unit", "queries", "sf")}
    compact["detail_file"] = "BENCH/last_run.json"
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
