"""Hybrid (JVM fast path + kernel) extraction must match the pure
kernel path row-for-row on a corpus with embedded docs, tool turns,
nulls, and hostile strings."""

import datetime

import pytest

from jsonld_js_spark.operators.pipeline import (
    extract_triples,
    extract_triples_hybrid,
    triples_only,
)
from jsonld_js_spark.sources.transcripts import synthesize_transcripts


def _collect(df):
    return sorted(map(tuple, df.collect()))


def test_hybrid_matches_kernel_on_corpus(spark):
    tx = synthesize_transcripts(spark, 20, seed=42).cache()
    a = _collect(triples_only(extract_triples(tx)))
    b = _collect(triples_only(extract_triples_hybrid(tx)))
    assert a == b


def test_hybrid_matches_kernel_on_hostile_rows(spark):
    ts = datetime.datetime(2026, 1, 1, 12, 0, 7)
    ts_micro = datetime.datetime(2026, 1, 1, 12, 0, 7, 123456)
    rows = [
        ("c", 0, "assistant", '{"@context": {broken', None, ts),
        ("c", 1, "user", None, None, ts),
        ("c", 2, "user", 'quote " nl \n bs \\ end', None, ts_micro),
        ("c", 3, "tool", "r", '{"name":"x","args":{"q":1}}', ts),
        ("c", 4, None, "plain", None, None),
        ("c", 5, "user", "", None, ts),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    a = _collect(triples_only(extract_triples(df)))
    b = _collect(triples_only(extract_triples_hybrid(df)))
    assert a == b


def test_hybrid_plain_path_has_no_python_stage(spark):
    """The plan for plain turns must not contain a Python/Arrow eval
    node — that's the point of the fast path."""
    import datetime
    tx = spark.createDataFrame(
        [("c", 0, "user", "plain text", None, datetime.datetime(2026, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    from jsonld_js_spark.operators.pipeline import _envelope_triples_jvm
    plan = _envelope_triples_jvm(tx)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "*(" in plan  # whole-stage-codegen stages print as *(N)
