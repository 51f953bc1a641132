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
    # kernel from_rdf preserves INPUT quad order -> supply the ordinal
    rows = [r + (i,) for i, r in enumerate(quads_to_rows(quads))]
    df = spark.createDataFrame(
        rows, "graph string, subj string, pred string, obj_kind string, "
              "obj_value string, obj_datatype string, obj_lang string, "
              "seq long")
    nodes = {r["subj"]: json.loads(r["node_json"])
             for r in from_rdf_nodes(df, seq_col="seq").collect()}
    expected = {n["@id"]: n for n in k_from_rdf(quads)}
    assert nodes == expected
    # list was folded back
    assert nodes["http://ex.org/s"]["http://ex.org/steps"] == \
        [{"@list": [{"@value": "a"}, {"@value": "b"}]}]


def test_from_rdf_nodes_matches_kernel_on_list_shapes(spark):
    """The distributed operator == kernel from_rdf applied per graph,
    over every raw N-Quads list shape in the differential corpus
    (IRI list nodes, partial chains, shared tails, nested lists,
    named-graph lists). All cases are merged into ONE operator run by
    namespacing each case's graph — semantics are per graph, so this
    is equivalent and avoids 28 sequential Spark pipelines."""
    import json

    from jsonld_js_spark.kernel.fromrdf import from_rdf as k_from_rdf
    from jsonld_js_spark.kernel.nquads import parse as nq_parse
    from jsonld_js_spark.kernel.tordf import quads_to_rows, rows_to_quads

    from tests.test_fromrdf_lists import CASES

    all_rows = []
    expected = {}
    for name, nq in CASES.items():
        rows = [(f"case::{name}::{r[0]}",) + r[1:]
                for r in quads_to_rows(nq_parse(nq))]
        all_rows.extend(rows)
        by_graph: dict = {}
        for row in rows:
            by_graph.setdefault(row[0], []).append(row)
        for g, grows in by_graph.items():
            # kernel sees the original graph name; shells re-namespaced
            orig = g.split("::", 2)[2]
            quads = rows_to_quads([(orig,) + r[1:] for r in grows])
            for node in k_from_rdf(quads):
                node = dict(node)
                inner = node.pop("@graph", None)
                if inner is not None:
                    for n in inner:
                        expected[(f"case::{name}::{node['@id']}",
                                  n["@id"])] = n
                if len(node) > 1:
                    expected[(g, node["@id"])] = node

    all_rows = [r + (i,) for i, r in enumerate(all_rows)]
    df = spark.createDataFrame(
        all_rows, "graph string, subj string, pred string, obj_kind string, "
                  "obj_value string, obj_datatype string, obj_lang string, "
                  "seq long")
    got = {(r["graph"], r["subj"]): json.loads(r["node_json"])
           for r in from_rdf_nodes(df, seq_col="seq").collect()}
    assert set(got) == set(expected), (
        f"key mismatch:\n only_got={sorted(set(got)-set(expected))}\n"
        f" only_exp={sorted(set(expected)-set(got))}")
    for key in expected:
        assert got[key] == expected[key], (
            f"{key}:\n got={got[key]}\n expected={expected[key]}")


def test_from_rdf_nodes_partitioning_invariant(spark):
    """Without an explicit ordinal, node_json must be byte-identical
    under any partition layout (the old monotonically_increasing_id
    ordering was layout-dependent)."""
    rows = []
    for i in range(40):
        s = f"http://e.org/s{i % 4}"
        rows.append(("", s, "http://e.org/p", "literal",
                     f"v{(i * 7) % 40}", None, None))
    df = spark.createDataFrame(
        rows, "graph string, subj string, pred string, obj_kind string, "
              "obj_value string, obj_datatype string, obj_lang string")
    outs = []
    for n in (1, 7):
        got = {r["subj"]: r["node_json"]
               for r in from_rdf_nodes(df.repartition(n)).collect()}
        outs.append(got)
    assert outs[0] == outs[1]


def test_from_rdf_nodes_many_groups_no_single_task(spark):
    """The assembly must not funnel through one group: a default-graph
    corpus with thousands of subjects assembles correctly (the old
    implementation degraded to @id shells past max_group_rows)."""
    import json

    n = 300
    rows = []
    for i in range(n):
        s = f"http://e.org/s{i}"
        rows.append(("", s, "http://e.org/p", "literal", f"v{i}", None, None))
        rows.append(("", s, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                     "iri", "http://e.org/T", None, None))
    df = spark.createDataFrame(
        rows, "graph string, subj string, pred string, obj_kind string, "
              "obj_value string, obj_datatype string, obj_lang string")
    out = from_rdf_nodes(df).collect()
    assert len(out) == n
    sample = json.loads(sorted(out, key=lambda r: r["subj"])[0]["node_json"])
    assert sample["@type"] == ["http://e.org/T"]
    assert sample["http://e.org/p"] == [{"@value": "v0"}]
