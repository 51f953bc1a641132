"""Deserialize JSON-LD to RDF: node map -> quads.

W3C JSON-LD 1.1 API §8 (Deserialize JSON-LD to RDF Algorithm).
Parity: /root/reference/lib/toRdf.js (graph/node iteration 53-197,
list conversion 211-262, literal typing 276-401). The literal
canonical forms here must be byte-identical to the reference —
especially xsd:double's JS ``toExponential(15)`` + exponent-collapse
form (lib/toRdf.js:300-306) and rdf:JSON via JCS (lib/toRdf.js:294-296).

Quads are plain dicts in RDF/JS term shape; :func:`quads_to_rows`
flattens them to the Spark triples schema
``(graph, subj, pred, obj_kind, obj_value, obj_datatype, obj_lang)``.
"""

from __future__ import annotations

import math
import re

from . import constants as C
from .errors import JsonLdError
from .iri import is_absolute_iri
from .jcs import canonicalize
from .nodemap import IdentifierIssuer, create_node_map
from .types import is_list, is_value

_DOUBLE_CANON_RE = re.compile(r"(\d)0*e\+?")


def _float64(v) -> float:
    """JS ``Number(v)`` for values already classified numeric: Python's
    float() RAISES OverflowError on an int beyond float64 range where
    JS Number conversion yields ±Infinity — a 400-digit integer in a
    parsed document must serialize as "Infinity"^^xsd:double like the
    reference (verified live), not kill the task. (r6 fuzz find)"""
    try:
        return float(v)
    except OverflowError:
        return math.inf if v > 0 else -math.inf


def double_canonical(v: float) -> str:
    r"""Canonical xsd:double lexical form, matching JS
    ``toExponential(15).replace(/(\d)0*e\+?/, '$1E')``.

    Non-finite doubles: ``toExponential`` falls back to
    ``Number::toString`` — "Infinity"/"-Infinity"/"NaN", NOT the XSD
    canonical "INF" forms (verified against the live reference;
    reachable from text via JSON.parse-legal ``1e999``). (r6 fuzz find)
    """
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == 0:
        return "0.0E0"  # JS stringifies -0 unsigned
    mant, exp = f"{v:.15e}".split("e")
    js = f"{mant}e{'+' if int(exp) >= 0 else '-'}{abs(int(exp))}"
    return _DOUBLE_CANON_RE.sub(lambda m: m.group(1) + "E", js, count=1)


def _is_double_value(v) -> bool:
    if isinstance(v, bool):
        return False
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v) or abs(v) >= 1e21:
            return True
        # lib/types.js:35-36: isDouble = String(v) contains '.' OR
        # abs >= 1e21. JS prints magnitudes below 1e-6 exponentially,
        # so e.g. 1e-7 stringifies DOTLESS ("1e-7"), fails this test,
        # and lands on the integer path (toFixed(0) -> "0"); 1.5e-7
        # ("1.5e-7") keeps its dot and stays a double. Verified
        # differentially.
        from .jcs import _fmt_number
        return "." in _fmt_number(v)
    if isinstance(v, int):
        # classify on the float64-ROUNDED magnitude: the reference's
        # ints are doubles already, so 999999999999999999999 (exact
        # < 1e21, rounds to exactly 1e21) takes the DOUBLE path
        try:
            return abs(float(v)) >= 1e21
        except OverflowError:
            return True
    return False


def named_node(value: str) -> dict:
    return {"termType": "NamedNode", "value": value}


def blank_node(value: str) -> dict:
    return {"termType": "BlankNode", "value": value[2:] if value.startswith("_:") else value}


DEFAULT_GRAPH = {"termType": "DefaultGraph", "value": ""}


def _term_for_id(iri: str) -> dict:
    return blank_node(iri) if iri.startswith("_:") else named_node(iri)


def _warn(options, code, message):
    from .events import emit
    emit(options if isinstance(options, dict) else {}, code, message)


def to_rdf(expanded, options: dict | None = None) -> list[dict]:
    """Expanded JSON-LD -> list of quads (RDF/JS-shaped dicts)."""
    options = options or {}
    issuer = options.get("issuer") or IdentifierIssuer("_:b")
    graphs = create_node_map(expanded, issuer=issuer)
    dataset: list[dict] = []
    for graph_name in sorted(graphs.keys()):
        if graph_name == "@default":
            graph_term = DEFAULT_GRAPH
        elif graph_name.startswith("_:"):
            graph_term = blank_node(graph_name)
        elif is_absolute_iri(graph_name):
            graph_term = named_node(graph_name)
        else:
            # skip relative graph names (lib/toRdf.js:65-84)
            _warn(options, "relative graph reference",
                  f"Relative graph reference found: {graph_name}")
            continue
        _graph_to_rdf(dataset, graphs[graph_name], graph_term, issuer, options)
    return dataset


def _graph_to_rdf(dataset, graph: dict, graph_term: dict, issuer, options):
    for sid in sorted(graph.keys()):
        node = graph[sid]
        for prop in sorted(node.keys()):
            if prop == "@id":
                continue
            if prop == "@type":
                items = node["@type"]
                predicate = named_node(C.RDF_TYPE)
            elif prop.startswith("@"):
                continue
            else:
                items = node[prop]
                if prop.startswith("_:") and not options.get("produceGeneralizedRdf"):
                    # bnode predicates skipped (lib/toRdf.js:161-180)
                    _warn(options, "blank node predicate",
                          f"Dropping blank node predicate: {prop}")
                    continue
                if not (is_absolute_iri(prop) or prop.startswith("_:")):
                    # relative predicate dropped (lib/toRdf.js:141-158)
                    _warn(options, "relative predicate reference",
                          f"Relative predicate reference found: {prop}")
                    continue
                predicate = _term_for_id(prop)

            if not (sid.startswith("_:") or is_absolute_iri(sid)):
                # relative subject dropped (lib/toRdf.js:119-136)
                _warn(options, "relative subject reference",
                      f"Relative subject reference found: {sid}")
                continue
            subject = _term_for_id(sid)

            for item in items:
                if prop == "@type":
                    item = {"@id": item} if isinstance(item, str) else item
                if is_list(item):
                    head = _list_to_rdf(dataset, item["@list"], issuer,
                                        subject_graph=graph_term, options=options)
                    obj = head
                else:
                    obj = _object_to_rdf(dataset, item, issuer, graph_term, options)
                if obj is not None:
                    dataset.append({"subject": subject, "predicate": predicate,
                                    "object": obj, "graph": graph_term})


def _list_to_rdf(dataset, items: list, issuer, *, subject_graph, options) -> dict:
    """rdf:first/rest/nil chain with fresh bnodes (lib/toRdf.js:211-262).

    Allocation ORDER is observable in the emitted labels and mirrors
    the reference exactly: the head cons cell is issued BEFORE any
    item converts (so a nested inner list gets LATER labels than its
    outer cell), and each following cell is issued right after its
    predecessor's item. Items that convert to None (dropped relative
    references) are still pushed — the reference crashes on them at
    N-Quads serialization time, which kernel/nquads.py replicates."""
    first = named_node(C.RDF_FIRST)
    rest = named_node(C.RDF_REST)
    nil = named_node(C.RDF_NIL)

    items = list(items)
    last = items.pop() if items else None
    result = blank_node(issuer.get_id()) if last is not None else nil
    subject = result
    for item in items:
        obj = _object_to_rdf(dataset, item, issuer, subject_graph, options)
        nxt = blank_node(issuer.get_id())
        dataset.append({"subject": subject, "predicate": first, "object": obj,
                        "graph": subject_graph})
        dataset.append({"subject": subject, "predicate": rest, "object": nxt,
                        "graph": subject_graph})
        subject = nxt
    if last is not None:
        obj = _object_to_rdf(dataset, last, issuer, subject_graph, options)
        dataset.append({"subject": subject, "predicate": first, "object": obj,
                        "graph": subject_graph})
        dataset.append({"subject": subject, "predicate": rest, "object": nil,
                        "graph": subject_graph})
    return result


def _object_to_rdf(dataset, item, issuer, graph_term, options) -> dict | None:
    """Value/node -> RDF term, with canonical literal forms
    (lib/toRdf.js:276-401)."""
    if is_value(item):
        value = item["@value"]
        datatype = item.get("@type")
        language = item.get("@language")
        direction = item.get("@direction")
        obj = {"termType": "Literal", "value": None,
               "datatype": {"termType": "NamedNode", "value": None}, "language": ""}

        if datatype == "@json":
            obj["value"] = canonicalize(value)
            obj["datatype"]["value"] = C.RDF_JSON_LITERAL
        elif isinstance(value, bool):
            obj["value"] = "true" if value else "false"
            obj["datatype"]["value"] = datatype or C.XSD_BOOLEAN
        elif _is_double_value(value) or datatype == C.XSD_DOUBLE:
            obj["value"] = double_canonical(_float64(value))
            obj["datatype"]["value"] = datatype or C.XSD_DOUBLE
        elif isinstance(value, (int, float)) and not isinstance(value, bool):
            # the reference's numbers arrive through JSON.parse as
            # DOUBLES: integers past 2^53 are already rounded before
            # toFixed(0) serializes them ('9007199254740993' emits as
            # ...992). Round through float64 first; the integer path
            # only sees |v| < 1e21 (larger ints take the double path),
            # so the conversion cannot overflow. (r5 probe find)
            iv = int(float(value))
            # JS toFixed(0) keeps the sign when a NONZERO negative
            # rounds to zero — (-1e-7).toFixed(0) === "-0" — but an
            # actual negative zero prints unsigned ((-0).toFixed(0)
            # === "0"). Only dotless tiny floats reach this branch as
            # non-integers.
            if iv == 0 and isinstance(value, float) and value != 0 and \
                    math.copysign(1.0, value) < 0:
                obj["value"] = "-0"
            else:
                obj["value"] = str(iv)
            obj["datatype"]["value"] = datatype or C.XSD_INTEGER
        elif direction is not None and options.get("rdfDirection") == "i18n-datatype":
            obj["value"] = str(value)
            obj["datatype"]["value"] = f"{C.I18N_NS}{(language or '')}_{direction}"
        elif direction is not None and options.get("rdfDirection") == "compound-literal":
            # the reference does NOT implement compound literals — it
            # throws lazily, only when a directional value actually
            # serializes (lib/toRdf.js:316-320); replicated exactly
            raise JsonLdError("Unsupported rdfDirection value.",
                              "jsonld.InvalidRdfDirection",
                              details={"value": options.get("rdfDirection")})
        elif direction is not None and options.get("rdfDirection"):
            raise JsonLdError("Unknown rdfDirection value.",
                              "jsonld.InvalidRdfDirection",
                              details={"value": options.get("rdfDirection")})
        elif language is not None:
            if direction is not None and not options.get("rdfDirection"):
                _warn(options, "rdfDirection not set",
                      "rdfDirection not set for @direction.")
            obj["value"] = value
            obj["datatype"]["value"] = datatype or C.RDF_LANGSTRING
            obj["language"] = language
        else:
            if direction is not None and not options.get("rdfDirection"):
                _warn(options, "rdfDirection not set",
                      "rdfDirection not set for @direction.")
            obj["value"] = value
            obj["datatype"]["value"] = datatype or C.XSD_STRING
        if isinstance(obj["datatype"]["value"], list):
            # array @type on a value object (a type-index-map artifact
            # the reference's expansion legitimately produces): the
            # reference serializes it through JS Array->String coercion,
            # i.e. comma-joined — `"v"^^<a,b>` (lib/toRdf.js:291 keeps
            # the array; the template literal coerces). Replicated.
            obj["datatype"]["value"] = ",".join(obj["datatype"]["value"])
        return obj

    if is_list(item):
        return _list_to_rdf(dataset, item["@list"], issuer,
                            subject_graph=graph_term, options=options)

    # node reference
    iri = item["@id"] if isinstance(item, dict) else item
    if isinstance(iri, str) and iri.startswith("_:"):
        return blank_node(iri)
    if not is_absolute_iri(iri):
        # relative object dropped (lib/toRdf.js:382-398)
        _warn(options, "relative object reference",
              f"Relative object reference found: {iri}")
        return None
    return named_node(iri)


# ---------------------------------------------------------------- Spark rows

TRIPLE_COLUMNS = ("graph", "subj", "pred", "obj_kind", "obj_value",
                  "obj_datatype", "obj_lang")


def _term_to_id(t: dict) -> str:
    if t["termType"] == "BlankNode":
        return "_:" + t["value"]
    if t["termType"] == "DefaultGraph":
        return ""
    return t["value"]


def quads_to_rows(quads: list[dict]) -> list[tuple]:
    """Flatten RDF/JS quads to the engine triples schema."""
    rows = []
    for q in quads:
        o = q["object"]
        if o["termType"] == "Literal":
            kind = "literal"
            dt = o["datatype"]["value"]
            lang = o.get("language") or None
            val = o["value"]
        else:
            kind = "bnode" if o["termType"] == "BlankNode" else "iri"
            dt = None
            lang = None
            val = _term_to_id(o)
        rows.append((
            _term_to_id(q["graph"]),
            _term_to_id(q["subject"]),
            _term_to_id(q["predicate"]),
            kind, val, dt, lang,
        ))
    return rows


def rows_to_quads(rows) -> list[dict]:
    """Inverse of :func:`quads_to_rows`."""
    quads = []
    for graph, subj, pred, kind, val, dt, lang in rows:
        if graph == "" or graph is None:
            g = DEFAULT_GRAPH
        else:
            g = _term_for_id(graph)
        if kind == "literal":
            o = {"termType": "Literal", "value": val,
                 "datatype": named_node(dt or C.XSD_STRING),
                 "language": lang or ""}
        else:
            o = _term_for_id(val)
        quads.append({"subject": _term_for_id(subj),
                      "predicate": _term_for_id(pred),
                      "object": o, "graph": g})
    return quads
