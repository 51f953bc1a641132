"""N-Quads IO round-trip, format registry, DataFrame-level fromRDF."""

import pytest
from pyspark.sql import functions as F

from jsonld_js_spark.operators.fromrdf_ops import (
    from_rdf_nodes,
    referenced_once,
)
from jsonld_js_spark.operators.pipeline import extract_triples, triples_only
from jsonld_js_spark.sources.nquads_io import read_nquads, write_nquads
from jsonld_js_spark.sources.registry import reader, writer
from jsonld_js_spark.sources.transcripts import synthesize_transcripts


@pytest.fixture(scope="module")
def triples(spark):
    tx = synthesize_transcripts(spark, 10, seed=42)
    t = triples_only(extract_triples(tx)).drop("conv_id", "turn_idx").cache()
    t.count()
    return t


def test_nquads_roundtrip_via_spark(spark, triples, tmp_path):
    path = str(tmp_path / "nq")
    write_nquads(triples, path)
    back = read_nquads(spark, path)
    a = sorted(map(tuple, triples.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_registry_dispatch(spark, triples, tmp_path):
    path = str(tmp_path / "nq2")
    writer("application/n-quads")(triples, path)
    back = reader("application/n-quads")(spark, path)
    assert back.count() == triples.count()
    with pytest.raises(ValueError, match="no reader registered"):
        reader("text/turtle")


def test_referenced_once(spark, triples):
    ro = referenced_once(triples)
    # conversation IRIs are referenced once per turn, many turns -> not once;
    # list bnodes are referenced exactly once
    assert ro.filter(F.col("node_id").startswith("_:")).count() > 0


def test_from_rdf_nodes_roundtrip(spark):
    """kernel to_rdf -> DataFrame fromRDF -> same nodes as kernel from_rdf."""
    import json

    from jsonld_js_spark.kernel import from_rdf as k_from_rdf, to_rdf as k_to_rdf
    from jsonld_js_spark.kernel.tordf import quads_to_rows

    doc = {"@context": {"@vocab": "http://ex.org/"},
           "@id": "http://ex.org/s",
           "p": [{"@id": "http://ex.org/o", "q": "deep"}, "lit", 7],
           "steps": {"@list": ["a", "b"]}}
    quads = k_to_rdf(doc)
    rows = quads_to_rows(quads)
    df = spark.createDataFrame(
        rows, "graph string, subj string, pred string, obj_kind string, "
              "obj_value string, obj_datatype string, obj_lang string")
    nodes = {r["subj"]: json.loads(r["node_json"])
             for r in from_rdf_nodes(df).collect()}
    expected = {n["@id"]: n for n in k_from_rdf(quads)}
    assert nodes == expected
    # list was folded back
    assert nodes["http://ex.org/s"]["http://ex.org/steps"] == \
        [{"@list": [{"@value": "a"}, {"@value": "b"}]}]
