"""Expansion conformance vectors.

Authored from the W3C JSON-LD 1.1 spec (same feature matrix the
reference's expand manifest covers — FIXTURES.md §2): term/CURIE/
@vocab/@base expansion, value objects, containers, @reverse, @nest,
@included, scoped contexts, free-floating drops.
"""

import pytest

from jsonld_js_spark.kernel import expand
from jsonld_js_spark.kernel.errors import JsonLdError

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"

CASES = [
    # --- term & IRI expansion
    (
        "simple-term",
        {"@context": {"name": EX + "name"}, "name": "x"},
        [{EX + "name": [{"@value": "x"}]}],
    ),
    (
        "curie",
        {"@context": {"ex": EX}, "ex:p": "v"},
        [{EX + "p": [{"@value": "v"}]}],
    ),
    (
        "vocab",
        {"@context": {"@vocab": EX}, "p": "v"},
        [{EX + "p": [{"@value": "v"}]}],
    ),
    (
        "base-id",
        {"@context": {"@base": "http://example.org/dir/"}, "@id": "doc",
         "http://example.org/p": "v"},
        [{"@id": "http://example.org/dir/doc", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "keyword-alias",
        {"@context": {"id": "@id", "type": "@type"},
         "id": EX + "s", "type": EX + "T"},
        [{"@id": EX + "s", "@type": [EX + "T"]}],
    ),
    # --- value objects
    (
        "typed-value",
        {"@context": {"age": {"@id": EX + "age", "@type": XSD + "integer"}},
         "age": "30", EX + "x": "y"},
        [{EX + "age": [{"@value": "30", "@type": XSD + "integer"}],
          EX + "x": [{"@value": "y"}]}],
    ),
    (
        "language-value",
        {"@context": {"@language": "en", "label": EX + "label"}, "label": "hi",
         "@id": EX + "s"},
        [{"@id": EX + "s", EX + "label": [{"@value": "hi", "@language": "en"}]}],
    ),
    (
        "language-null-override",
        {"@context": {"@language": "en",
                      "label": {"@id": EX + "label", "@language": None}},
         "label": "hi", "@id": EX + "s"},
        [{"@id": EX + "s", EX + "label": [{"@value": "hi"}]}],
    ),
    (
        "explicit-value-object",
        {EX + "p": {"@value": 5.5}},
        [{EX + "p": [{"@value": 5.5}]}],
    ),
    (
        "json-literal",
        {"@context": {"data": {"@id": EX + "data", "@type": "@json"}},
         "data": {"b": 2, "a": [True, None]}},
        [{EX + "data": [{"@value": {"b": 2, "a": [True, None]}, "@type": "@json"}]}],
    ),
    # --- @type coercion to @id / @vocab
    (
        "type-id-coercion",
        {"@context": {"knows": {"@id": EX + "knows", "@type": "@id"},
                      "@base": EX}, "knows": "bob", "@id": "alice"},
        [{"@id": EX + "alice", EX + "knows": [{"@id": EX + "bob"}]}],
    ),
    (
        "type-vocab-coercion",
        {"@context": {"@vocab": EX, "rel": {"@type": "@vocab"}},
         "rel": "friend", "@id": EX + "s"},
        [{"@id": EX + "s", EX + "rel": [{"@id": EX + "friend"}]}],
    ),
    # --- containers
    (
        "list",
        {"@context": {"p": {"@id": EX + "p", "@container": "@list"}},
         "p": ["a", "b"], "@id": EX + "s"},
        [{"@id": EX + "s", EX + "p": [{"@list": [{"@value": "a"}, {"@value": "b"}]}]}],
    ),
    (
        "explicit-list",
        {EX + "p": {"@list": [1, 2]}, "@id": EX + "s"},
        [{"@id": EX + "s", EX + "p": [{"@list": [{"@value": 1}, {"@value": 2}]}]}],
    ),
    (
        "set-flattens",
        {EX + "p": {"@set": ["a"]}, "@id": EX + "s"},
        [{"@id": EX + "s", EX + "p": [{"@value": "a"}]}],
    ),
    (
        "language-map",
        {"@context": {"label": {"@id": EX + "label", "@container": "@language"}},
         "@id": EX + "s", "label": {"en": "hello", "de": "hallo"}},
        [{"@id": EX + "s", EX + "label": [
            {"@value": "hallo", "@language": "de"},
            {"@value": "hello", "@language": "en"}]}],
    ),
    (
        "index-map",
        {"@context": {"p": {"@id": EX + "p", "@container": "@index"}},
         "@id": EX + "s", "p": {"i1": "a", "i2": "b"}},
        [{"@id": EX + "s", EX + "p": [
            {"@value": "a", "@index": "i1"},
            {"@value": "b", "@index": "i2"}]}],
    ),
    (
        "id-map",
        {"@context": {"@vocab": EX, "m": {"@container": "@id"}},
         "m": {EX + "a": {"p": "1"}, EX + "b": {"p": "2"}}},
        [{EX + "m": [
            {"@id": EX + "a", EX + "p": [{"@value": "1"}]},
            {"@id": EX + "b", EX + "p": [{"@value": "2"}]}]}],
    ),
    (
        "type-map",
        {"@context": {"@vocab": EX, "m": {"@container": "@type"}},
         "m": {"T1": {"@id": EX + "x", "p": "1"}}},
        [{EX + "m": [
            {"@id": EX + "x", "@type": [EX + "T1"], EX + "p": [{"@value": "1"}]}]}],
    ),
    # --- @reverse
    (
        "reverse-term",
        {"@context": {"childOf": {"@reverse": EX + "parentOf"}},
         "@id": EX + "a", "childOf": {"@id": EX + "b"}},
        [{"@id": EX + "a", "@reverse": {EX + "parentOf": [{"@id": EX + "b"}]}}],
    ),
    (
        "reverse-keyword",
        {"@id": EX + "a", "@reverse": {EX + "p": {"@id": EX + "b"}}},
        [{"@id": EX + "a", "@reverse": {EX + "p": [{"@id": EX + "b"}]}}],
    ),
    # --- @graph
    (
        "named-graph",
        {"@id": EX + "g", "@graph": [{"@id": EX + "s", EX + "p": "v"}]},
        [{"@id": EX + "g", "@graph": [{"@id": EX + "s", EX + "p": [{"@value": "v"}]}]}],
    ),
    # --- @nest
    (
        "nest",
        {"@context": {"@vocab": EX, "meta": "@nest"},
         "@id": EX + "s", "meta": {"p": "v"}},
        [{"@id": EX + "s", EX + "p": [{"@value": "v"}]}],
    ),
    # --- @included
    (
        "included",
        {"@id": EX + "s", EX + "p": "v",
         "@included": [{"@id": EX + "t", EX + "q": "w"}]},
        [{"@id": EX + "s", EX + "p": [{"@value": "v"}],
          "@included": [{"@id": EX + "t", EX + "q": [{"@value": "w"}]}]}],
    ),
    # --- scoped contexts
    (
        "property-scoped-context",
        {"@context": {"@vocab": EX,
                      "p": {"@id": EX + "p", "@context": {"@vocab": "http://other.org/"}}},
         "@id": EX + "s", "p": {"q": "v"}},
        [{"@id": EX + "s", EX + "p": [{"http://other.org/q": [{"@value": "v"}]}]}],
    ),
    (
        "type-scoped-context",
        {"@context": {"@vocab": EX,
                      "T": {"@id": EX + "T", "@context": {"inner": "http://other.org/inner"}}},
         "@id": EX + "s", "@type": "T", "inner": "v"},
        [{"@id": EX + "s", "@type": [EX + "T"],
          "http://other.org/inner": [{"@value": "v"}]}],
    ),
    # --- free-floating drops
    (
        "drop-free-floating-value",
        [{"@value": "free"}, {"@id": EX + "s", EX + "p": "v"}],
        [{"@id": EX + "s", EX + "p": [{"@value": "v"}]}],
    ),
    (
        "drop-null-value",
        {"@id": EX + "s", EX + "p": None},
        [],
    ),
    (
        "drop-subject-reference-only",
        [{"@id": EX + "lonely"}],
        [],
    ),
    # --- @direction
    (
        "direction",
        {"@context": {"@direction": "rtl", "label": EX + "label"},
         "@id": EX + "s", "label": "x"},
        [{"@id": EX + "s", EX + "label": [{"@value": "x", "@direction": "rtl"}]}],
    ),
    # --- graph container
    (
        "graph-container",
        {"@context": {"input": {"@id": EX + "input", "@container": "@graph"}},
         "@id": EX + "s", "input": {EX + "p": "v"}},
        [{"@id": EX + "s", EX + "input": [
            {"@graph": [{EX + "p": [{"@value": "v"}]}]}]}],
    ),
    # --- null context reset
    (
        "context-reset",
        {"@context": [{"@vocab": EX, "@language": "en"}, None],
         "@id": EX + "s", EX + "p": "v"},
        [{"@id": EX + "s", EX + "p": [{"@value": "v"}]}],
    ),
    # --- @index on node
    (
        "node-index",
        {"@id": EX + "s", "@index": "idx", EX + "p": "v"},
        [{"@id": EX + "s", "@index": "idx", EX + "p": [{"@value": "v"}]}],
    ),
    # --- array @type
    (
        "multiple-types",
        {"@id": EX + "s", "@type": [EX + "A", EX + "B"]},
        [{"@id": EX + "s", "@type": [EX + "A", EX + "B"]}],
    ),
]


@pytest.mark.parametrize("name,doc,expected", CASES, ids=[c[0] for c in CASES])
def test_expand(name, doc, expected):
    assert expand(doc) == expected


NEGATIVE = [
    ("colliding-keywords",
     {"@context": {"id1": "@id", "id2": "@id"},
      "id1": "http://example.org/a", "id2": "http://example.org/b"},
     "colliding keywords"),
    ("invalid-id",
     {"@id": 5},
     "invalid @id value"),
    ("invalid-reverse-value",
     {"@context": {"rev": {"@reverse": EX + "p"}},
      "@id": EX + "s", "rev": "scalar"},
     "invalid reverse property value"),
    ("invalid-typed-value",
     {EX + "p": {"@value": "v", "@type": "relative"}},
     "invalid typed value"),
    ("keyword-redefinition",
     {"@context": {"@id": EX + "p"}, EX + "q": "v"},
     "keyword redefinition"),
    ("invalid-version",
     {"@context": {"@version": 1.2}, EX + "q": "v"},
     "invalid @version value"),
    ("cyclic-iri-mapping",
     {"@context": {"a": "b:x", "b": "a:y"}, "a:z": "v"},
     "cyclic IRI mapping"),
    ("invalid-container",
     {"@context": {"p": {"@id": EX + "p", "@container": "@bogus"}}, "p": "v"},
     "invalid container mapping"),
    ("language-on-nonstring",
     {EX + "p": {"@value": 5, "@language": "en"}},
     "invalid language-tagged value"),
    ("value-with-extra-member",
     {EX + "p": {"@value": "v", "@id": EX + "x"}},
     "invalid value object"),
]


@pytest.mark.parametrize("name,doc,code", NEGATIVE, ids=[c[0] for c in NEGATIVE])
def test_expand_errors(name, doc, code):
    with pytest.raises(JsonLdError) as exc:
        expand(doc)
    assert exc.value.code == code


def test_remote_context_via_loader():
    loader = {"http://example.org/ctx": {"@context": {"name": EX + "name"}}}
    doc = {"@context": "http://example.org/ctx", "name": "x", "@id": EX + "s"}
    assert expand(doc, {"context_loader": loader}) == [
        {"@id": EX + "s", EX + "name": [{"@value": "x"}]}]


def test_missing_remote_context_fails():
    doc = {"@context": "http://example.org/nope", EX + "p": "v"}
    with pytest.raises(JsonLdError) as exc:
        expand(doc)
    assert exc.value.code == "loading remote context failed"


def test_safe_mode_raises_on_warning():
    with pytest.raises(JsonLdError):
        expand([{"@value": "free"}], {"safe": True})


def test_warnings_collected():
    opts = {"events": []}
    expand([{"@value": "free"}], opts)
    assert any(e["code"] == "object with only @value" for e in opts["events"])
    opts2 = {"events": []}
    expand(["bare scalar"], opts2)
    assert any(e["code"] == "free-floating scalar" for e in opts2["events"])


def test_protected_term_redefinition():
    doc = {
        "@context": [{"@protected": True, "name": EX + "name"},
                     {"name": EX + "other"}],
        "name": "x",
    }
    with pytest.raises(JsonLdError) as exc:
        expand(doc)
    assert exc.value.code == "protected term redefinition"
