"""Serialize RDF as JSON-LD (the inverse scan): quads -> expanded form.

W3C JSON-LD 1.1 API §9. Parity: /root/reference/lib/fromRdf.js:51-407.
The reference is already relational here — it groups a flat quad array
by (graph, subject) and walks rdf:first/rest chains backwards from
rdf:nil; the Spark operator (operators/fromrdf_ops.py) does the same
grouping with a real hash aggregation and calls this kernel
per-subject-group. This module is the single-dataset form.
"""

from __future__ import annotations

import json
import math
import re

from . import constants as C
from .errors import JsonLdError
from .events import emit
from .expand import _LANG_RE



def _term_id(t: dict) -> str:
    if t["termType"] == "BlankNode":
        return "_:" + t["value"]
    if t["termType"] == "DefaultGraph":
        return "@default"
    return t["value"]


def _rdf_to_object(o: dict, use_native_types: bool, rdf_direction: str | None,
                   options: dict | None = None):
    """RDF term -> JSON-LD value object (lib/fromRdf.js:305-407)."""
    if o["termType"] in ("NamedNode", "BlankNode"):
        return {"@id": _term_id(o)}
    value = o["value"]
    dt = o.get("datatype", {}).get("value") or C.XSD_STRING
    lang = o.get("language") or None

    rval: dict = {"@value": value}
    if lang:
        # lib/fromRdf.js:316-331: malformed literal language tags WARN
        # and are kept verbatim
        if not _LANG_RE.match(lang):
            emit(options or {}, "invalid @language value",
                 "@language value must be valid BCP47.", language=lang)
        rval["@language"] = lang
        return rval
    if dt == C.RDF_JSON_LITERAL:
        try:
            rval["@value"] = json.loads(value)
        except ValueError as e:
            raise JsonLdError("JSON literal could not be parsed.",
                              "jsonld.InvalidJsonLiteral",
                              code="invalid JSON literal",
                              details={"value": value}) from e
        rval["@type"] = "@json"
        return rval
    if use_native_types:
        # exact lib/fromRdf.js:351-377 semantics, quirks included:
        # - isNumeric = !isNaN(parseFloat(v)) && isFinite(Number(v))
        # - a NUMERIC integer that fails the canonical round-trip
        #   ("007", "+7") keeps its STRING value with NO @type
        # - useNativeTypes takes precedence over rdfDirection (the
        #   i18n branch below is an else-if) — an i18n datatype here
        #   is just "some other type" and is retained as @type
        if dt == C.XSD_BOOLEAN:
            if value in ("true", "1"):
                rval["@value"] = True
            elif value in ("false", "0"):
                rval["@value"] = False
            else:
                rval["@type"] = dt
        elif dt == C.XSD_INTEGER:
            if _js_is_numeric(value):
                i = _js_parse_int(value)
                if i is not None and _js_to_fixed0(i) == value:
                    rval["@value"] = int(i)
                # else: string value kept, no @type (reference quirk —
                # incl. integers past 2^53, whose parseInt DOUBLE fails
                # the toFixed(0) round-trip: '9007199254740993' stays a
                # string while Python's exact int would round-trip)
            else:
                rval["@type"] = dt
        elif dt == C.XSD_DOUBLE:
            if _js_is_numeric(value):
                rval["@value"] = _js_parse_float(value)
            else:
                rval["@type"] = dt
        else:
            rval["@type"] = dt
        return rval
    if rdf_direction == "i18n-datatype" and dt.startswith(C.I18N_NS):
        # reference splits on BOTH '#' and '_' (lib/fromRdf.js:383):
        # i18n#en        -> language en, no direction
        # i18n#_rtl      -> direction rtl, no language
        # i18n#en_ltr    -> both
        parts = re.split(r"[#_]", dt)
        language = parts[1] if len(parts) > 1 else ""
        direction = parts[2] if len(parts) > 2 else None
        if language:
            rval["@language"] = language
            # lib/fromRdf.js:382-399: i18n-decoded languages are
            # BCP47-checked too
            if not _LANG_RE.match(language):
                emit(options or {}, "invalid @language value",
                     "@language value must be valid BCP47.",
                     language=language)
        if direction is not None:
            rval["@direction"] = direction
        return rval
    if dt != C.XSD_STRING:
        rval["@type"] = dt
    return rval


def _js_is_numeric(v: str) -> bool:
    """JS types.isNumeric: !isNaN(parseFloat(v)) && isFinite(v)."""
    s = v.strip()
    # parseFloat: a leading decimal-number prefix must exist
    if not re.match(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s) \
            and not re.match(r"^[+-]?Infinity", s):
        return False
    # isFinite(Number(v)): full-string numeric conversion, finite only
    if s == "":
        return False  # parseFloat('') is NaN anyway
    if re.match(r"^[+-]?0[xX][0-9a-fA-F]+$", s):
        return True
    try:
        n = float(s)
    except ValueError:
        return False
    # Python float() accepts 'inf'/'nan' spellings JS Number() rejects;
    # all of them are non-finite, which fails isFinite either way
    return math.isfinite(n)


def _js_parse_int(v: str):
    """JS parseInt(v, 10): the leading digit run, as the DOUBLE JS
    returns (digits beyond 2^53 round — the toFixed round-trip check
    then rejects them)."""
    m = re.match(r"^\s*([+-]?\d+)", v)
    return float(int(m.group(1))) if m else None


def _js_to_fixed0(f: float) -> str:
    """JS Number.toFixed(0) for an INTEGRAL double: its exact decimal
    form, except |f| >= 1e21 falls back to String(f) exponential
    notation (which can never equal an all-digits literal)."""
    if abs(f) >= 1e21:
        return "\x00never-matches"
    return str(int(f))


def _js_parse_float(v: str) -> float:
    """JS parseFloat: value of the leading decimal-number prefix."""
    m = re.match(r"^\s*([+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?)", v)
    return float(m.group(1))


def _add_unique(node: dict, key: str, value) -> None:
    arr = node.setdefault(key, [])
    # json text comparison keeps bool/int distinct (Python == conflates
    # True/1, unlike JS ===)
    sig = json.dumps(value, sort_keys=True)
    if not any(json.dumps(v, sort_keys=True) == sig for v in arr):
        arr.append(value)


def from_rdf(quads: list[dict], *, use_rdf_type: bool = False,
             use_native_types: bool = False,
             rdf_direction: str | None = None,
             options: dict | None = None) -> list:
    """Quads -> expanded JSON-LD array."""
    if rdf_direction:
        # lib/fromRdf.js:64-76: compound-literal is recognized but
        # unsupported on the fromRDF side; anything else is unknown
        if rdf_direction == "compound-literal":
            raise JsonLdError("Unsupported rdfDirection value.",
                              "jsonld.InvalidRdfDirection",
                              details={"value": rdf_direction})
        if rdf_direction != "i18n-datatype":
            raise JsonLdError("Unknown rdfDirection value.",
                              "jsonld.InvalidRdfDirection",
                              details={"value": rdf_direction})
    default_graph: dict = {}
    graph_map: dict[str, dict] = {"@default": default_graph}
    referenced_once: dict[str, object] = {}

    for quad in quads:
        # generalized-RDF raw-value quirks (lib/fromRdf.js:80-93):
        # the GRAPH name and the PREDICATE use term.value directly —
        # a blank-node graph/predicate gets NO '_:' prefix, so a bnode
        # used as both subject and graph lands in TWO entries
        # ('_:b0' node vs 'b0' graph node). Subjects/objects go
        # through _nodeId and ARE prefixed.
        gterm = quad["graph"]
        name = "@default" if gterm["termType"] == "DefaultGraph" \
            else gterm["value"]
        node_map = graph_map.setdefault(name, {})
        if name != "@default":
            default_graph.setdefault(name, {"@id": name})

        s = _term_id(quad["subject"])
        p = quad["predicate"]["value"]
        o = quad["object"]
        node = node_map.setdefault(s, {"@id": s})

        o_is_node = o["termType"] in ("NamedNode", "BlankNode")
        if o_is_node:
            node_map.setdefault(_term_id(o), {"@id": _term_id(o)})

        if p == C.RDF_TYPE and not use_rdf_type and o_is_node:
            _add_unique(node, "@type", _term_id(o))
            continue

        value = _rdf_to_object(o, use_native_types, rdf_direction, options)
        _add_unique(node, p, value)

        # list-usage bookkeeping (lib/fromRdf.js:113-139)
        if o_is_node:
            oid = _term_id(o)
            if oid == C.RDF_NIL:
                usages = node_map[oid].setdefault("usages", [])
                usages.append({"node": node, "property": p, "value": value})
            elif oid in referenced_once:
                referenced_once[oid] = False
            else:
                referenced_once[oid] = {"node": node, "property": p, "value": value}

    # list reconstruction: backwards walk from rdf:nil (lib/fromRdf.js:209-268)
    for name, graph_object in graph_map.items():
        nil = graph_object.get(C.RDF_NIL)
        if not nil or "usages" not in nil:
            continue
        for usage in nil["usages"]:
            node, prop, head = usage["node"], usage["property"], usage["value"]
            lst, list_nodes = [], []
            # NOTE: the walked node need NOT be a blank node here — the
            # reference's while condition has no bnode check (an IRI
            # list node at walk start IS folded, lib/fromRdf.js:236-242);
            # only the post-move break below requires blank nodes.
            while (prop == C.RDF_REST
                   and isinstance(referenced_once.get(node.get("@id", "")), dict)
                   and isinstance(node.get(C.RDF_FIRST), list)
                   and len(node[C.RDF_FIRST]) == 1
                   and isinstance(node.get(C.RDF_REST), list)
                   and len(node[C.RDF_REST]) == 1
                   and (len([k for k in node if k not in ("usages",)]) == 3
                        or (len([k for k in node if k not in ("usages",)]) == 4
                            and node.get("@type") == [C.RDF_LIST]))):
                lst.append(node[C.RDF_FIRST][0])
                list_nodes.append(node["@id"])
                ref = referenced_once[node["@id"]]
                node, prop, head = ref["node"], ref["property"], ref["value"]
                if not node["@id"].startswith("_:"):
                    break
            head.pop("@id", None)
            head["@list"] = list(reversed(lst))
            for ln in list_nodes:
                graph_object.pop(ln, None)
        nil.pop("usages", None)

    # assembly (lib/fromRdf.js:270-292)
    result = []
    for subject in sorted(default_graph.keys()):
        node = default_graph[subject]
        if subject in graph_map and subject != "@default":
            graph = []
            g = graph_map[subject]
            for s in sorted(g.keys()):
                n = g[s]
                n.pop("usages", None)
                if len(n) == 1 and "@id" in n:
                    continue
                graph.append(n)
            node["@graph"] = graph
        node.pop("usages", None)
        if len(node) == 1 and "@id" in node:
            continue
        result.append(node)
    return result
