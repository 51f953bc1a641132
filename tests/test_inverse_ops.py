"""fromRDF / flatten / compact / frame vectors + round-trip properties.

Round-trip oracle (mirrors the reference's canonize-then-compare
comparator, /root/reference/tests/test.js:1157-1178): for any document
D, canonize(D) == canonize(from_rdf(to_rdf(D))) — triple emission and
the inverse scan must agree up to blank-node relabeling.
"""

import pytest

from jsonld_js_spark.kernel import (
    canonize,
    compact,
    expand,
    flatten,
    frame,
    from_rdf,
    to_rdf,
)

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

ROUNDTRIP_DOCS = [
    {"@id": EX + "s", EX + "p": "v"},
    {"@id": EX + "s", EX + "p": [1, 2.5, True, "s"]},
    {"@id": EX + "s", EX + "p": {"@list": ["a", "b", "c"]}},
    {"@id": EX + "s", EX + "p": {"@value": "hi", "@language": "en"}},
    {"@id": EX + "g", "@graph": [{"@id": EX + "s", EX + "p": "v"}]},
    {EX + "p": {EX + "q": {EX + "r": "deep"}}},
    {"@id": EX + "s", "@type": [EX + "A", EX + "B"], EX + "p": {"@id": EX + "o"}},
    [{EX + "p": "doc1"}, {EX + "p": "doc2"}],
    {"@id": EX + "s", EX + "p": {"@list": []}},
    {"@id": EX + "s", EX + "nested": {"@list": [{"@id": EX + "a"}, "lit"]}},
]


@pytest.mark.parametrize("doc", ROUNDTRIP_DOCS,
                         ids=[f"doc{i}" for i in range(len(ROUNDTRIP_DOCS))])
def test_tordf_fromrdf_roundtrip(doc):
    quads = to_rdf(doc)
    back = from_rdf(quads)
    assert canonize(back) == canonize(doc)


def test_fromrdf_nquads_string():
    nq = (f'<{EX}s> <{EX}p> "v" .\n'
          f'<{EX}s> <{RDF}type> <{EX}T> .\n')
    out = from_rdf(nq)
    assert out == [{"@id": EX + "s", "@type": [EX + "T"],
                    EX + "p": [{"@value": "v"}]}]


def test_fromrdf_use_native_types():
    nq = (f'<{EX}s> <{EX}i> "42"^^<{XSD}integer> .\n'
          f'<{EX}s> <{EX}d> "2.5E0"^^<{XSD}double> .\n'
          f'<{EX}s> <{EX}b> "true"^^<{XSD}boolean> .\n')
    out = from_rdf(nq, {"useNativeTypes": True})
    node = out[0]
    assert node[EX + "i"] == [{"@value": 42}]
    assert node[EX + "d"] == [{"@value": 2.5}]
    assert node[EX + "b"] == [{"@value": True}]


def test_fromrdf_list_reconstruction():
    nq = (f'<{EX}s> <{EX}p> _:l0 .\n'
          f'_:l0 <{RDF}first> "a" .\n'
          f'_:l0 <{RDF}rest> _:l1 .\n'
          f'_:l1 <{RDF}first> "b" .\n'
          f'_:l1 <{RDF}rest> <{RDF}nil> .\n')
    out = from_rdf(nq)
    assert out == [{"@id": EX + "s",
                    EX + "p": [{"@list": [{"@value": "a"}, {"@value": "b"}]}]}]


def test_fromrdf_json_literal():
    nq = f'<{EX}s> <{EX}p> "{{\\"a\\":1}}"^^<{RDF}JSON> .\n'
    out = from_rdf(nq)
    assert out[0][EX + "p"] == [{"@value": {"a": 1}, "@type": "@json"}]


def test_fromrdf_named_graph_nesting():
    nq = f'<{EX}s> <{EX}p> "v" <{EX}g> .\n'
    out = from_rdf(nq)
    assert out == [{"@id": EX + "g", "@graph": [
        {"@id": EX + "s", EX + "p": [{"@value": "v"}]}]}]


# --- flatten -----------------------------------------------------------------

def test_flatten_basic():
    doc = {"@context": {"@vocab": EX},
           "@id": EX + "a", "knows": {"@id": EX + "b", "name": "Bob"}}
    out = flatten(doc)
    assert out == [
        {"@id": EX + "a", EX + "knows": [{"@id": EX + "b"}]},
        {"@id": EX + "b", EX + "name": [{"@value": "Bob"}]},
    ]


def test_flatten_bnode_labels():
    doc = {EX + "p": {EX + "q": "v"}}
    out = flatten(doc)
    assert out == [
        {"@id": "_:b0", EX + "p": [{"@id": "_:b1"}]},
        {"@id": "_:b1", EX + "q": [{"@value": "v"}]},
    ]


def test_flatten_merges_duplicate_subjects():
    doc = [{"@id": EX + "s", EX + "p": "a"},
           {"@id": EX + "s", EX + "p": "a", EX + "q": "b"}]
    out = flatten(doc)
    assert out == [{"@id": EX + "s",
                    EX + "p": [{"@value": "a"}],
                    EX + "q": [{"@value": "b"}]}]


def test_flatten_named_graphs_fold_to_default():
    doc = {"@id": EX + "g", "@graph": [{"@id": EX + "s", EX + "p": "v"}]}
    out = flatten(doc)
    assert out == [{"@id": EX + "g", "@graph": [
        {"@id": EX + "s", EX + "p": [{"@value": "v"}]}]}]


def test_flatten_with_context_compacts():
    ctx = {"@vocab": EX}
    doc = {"@id": EX + "a", EX + "knows": {"@id": EX + "b"}}
    out = flatten(doc, ctx)
    assert out["@context"] == ctx
    # flatten-with-context always wraps in @graph (lib/jsonld.js:388-391)
    assert out["@graph"] == [{"@id": EX + "a", "knows": {"@id": EX + "b"}}]


# --- compact -----------------------------------------------------------------

def test_compact_terms():
    ctx = {"name": EX + "name", "knows": {"@id": EX + "knows", "@type": "@id"}}
    doc = {"@id": EX + "a",
           EX + "name": [{"@value": "Alice"}],
           EX + "knows": [{"@id": EX + "b"}]}
    out = compact(doc, ctx)
    assert out == {"@context": ctx, "@id": EX + "a",
                   "name": "Alice", "knows": EX + "b"}


def test_compact_curie():
    ctx = {"ex": EX}
    doc = {"@id": EX + "a", EX + "p": [{"@value": "v"}]}
    out = compact(doc, ctx)
    assert out["ex:p"] == "v"
    assert out["@id"] == "ex:a"


def test_compact_typed_value():
    ctx = {"age": {"@id": EX + "age", "@type": XSD + "integer"}}
    doc = {"@id": EX + "a",
           EX + "age": [{"@value": "30", "@type": XSD + "integer"}]}
    out = compact(doc, ctx)
    assert out["age"] == "30"


def test_compact_language_map():
    ctx = {"label": {"@id": EX + "label", "@container": "@language"}}
    doc = {"@id": EX + "s", EX + "label": [
        {"@value": "hello", "@language": "en"},
        {"@value": "hallo", "@language": "de"}]}
    out = compact(doc, ctx)
    assert out["label"] == {"en": "hello", "de": "hallo"}


def test_compact_list():
    ctx = {"p": {"@id": EX + "p", "@container": "@list"}}
    doc = {"@id": EX + "s",
           EX + "p": [{"@list": [{"@value": "a"}, {"@value": "b"}]}]}
    out = compact(doc, ctx)
    assert out["p"] == ["a", "b"]


def test_compact_set_keeps_array():
    ctx = {"p": {"@id": EX + "p", "@container": "@set"}}
    doc = {"@id": EX + "s", EX + "p": [{"@value": "only"}]}
    out = compact(doc, ctx)
    assert out["p"] == ["only"]


def test_compact_vocab_suffix():
    ctx = {"@vocab": EX}
    doc = {"@id": EX + "s", EX + "p": [{"@value": "v"}], "@type": [EX + "T"]}
    out = compact(doc, ctx)
    assert out["p"] == "v"
    assert out["@type"] == "T"


def test_compact_expand_roundtrip():
    ctx = {"@vocab": EX, "knows": {"@type": "@id"}}
    doc = {"@context": ctx, "@id": EX + "a", "name": "Alice",
           "knows": EX + "b", "age": 30}
    expanded = expand(doc)
    compacted = compact(expanded, ctx, {"skipExpansion": True})
    assert expand(compacted) == expanded


# --- frame -------------------------------------------------------------------

def test_frame_by_type():
    doc = [
        {"@id": EX + "a", "@type": EX + "Person", EX + "name": "Alice"},
        {"@id": EX + "b", "@type": EX + "Dog", EX + "name": "Rex"},
    ]
    frm = {"@context": {"@vocab": EX}, "@type": "Person"}
    out = frame(doc, frm)
    body = out.get("@graph", [out])
    if isinstance(body, dict):
        body = [body]
    names = [n.get("name") for n in ([body] if isinstance(body, dict) else body)
             if isinstance(n, dict) and "name" in n]
    assert "Alice" in str(out)
    assert "Rex" not in str(out)


def test_frame_embeds_references():
    doc = [
        {"@id": EX + "a", "@type": EX + "Person",
         EX + "knows": {"@id": EX + "b"}},
        {"@id": EX + "b", "@type": EX + "Person", EX + "name": "Bob"},
    ]
    frm = {"@context": {"@vocab": EX}, "@id": EX + "a"}
    out = frame(doc, frm)
    assert "Bob" in str(out)


def test_tordf_fromrdf_tordf_fixpoint_over_grammar_corpora():
    """Engine invariant: toRDF -> fromRDF -> toRDF reaches a CANONICAL
    fixpoint (same RDFC-1.0 bytes) for every grammar document whose
    graph names are IRIs. Blank-node-NAMED graphs are excluded: the
    reference reads the graph name off term.value without the '_:'
    prefix (lib/fromRdf.js:80-93, replicated quirk), so the
    reconstructed doc carries a relative-IRI graph name that a
    re-serialization must drop — parity, not a kernel bug."""
    import importlib

    from jsonld_js_spark.kernel import from_rdf, to_rdf
    from jsonld_js_spark.kernel.canon import canonize
    from jsonld_js_spark.kernel.errors import JsonLdError
    from jsonld_js_spark.kernel.nquads import parse

    td = importlib.import_module("tests.test_differential")
    checked = excluded = 0
    for name in ("GRAMMAR3", "GRAMMAR14", "GRAMMAR16", "GRAMMAR17"):
        for doc in getattr(td, name):
            try:
                nq1 = to_rdf(doc, {"format": "application/n-quads"})
            except JsonLdError:
                continue
            if any(q["graph"] and q["graph"]["termType"] == "BlankNode"
                   for q in parse(nq1)):
                excluded += 1
                continue
            doc2 = from_rdf(nq1)
            nq2 = to_rdf(doc2, {"format": "application/n-quads"})
            assert canonize(parse(nq1)) == canonize(parse(nq2)), doc
            checked += 1
    assert checked >= 150, (checked, excluded)
