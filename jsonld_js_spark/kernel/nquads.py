"""N-Quads serialization / parsing.

Parity: the reference delegates to rdf-canonize's NQuads
(/root/reference/lib/NQuads.js:7); this is a fresh implementation of
the W3C N-Quads grammar with the same canonical escaping so
string-compare tests against jsonld.js output hold.
"""

from __future__ import annotations

import re

from . import constants as C
from .errors import JsonLdError
from .tordf import DEFAULT_GRAPH, named_node

_ESCAPE = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r"}
_UNESCAPE = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r", "\\t": "\t"}


def _escape(s: str) -> str:
    return "".join(_ESCAPE.get(c, c) for c in s)


def _term_str(t: dict) -> str:
    if t is None:
        # a list item that converted to None (dropped relative
        # reference) was still pushed into the cons chain
        # (lib/toRdf.js:224-256); the reference then crashes reading
        # null.termType during N-Quads serialization — replicate as a
        # typed error rather than a bare attribute crash
        raise JsonLdError("Cannot read properties of null "
                          "(reading 'termType').", "TypeError")
    tt = t["termType"]
    if tt == "NamedNode":
        return f"<{t['value']}>"
    if tt == "BlankNode":
        return f"_:{t['value']}"
    if tt == "DefaultGraph":
        return ""
    # Literal
    s = f'"{_escape(t["value"])}"'
    dt = t.get("datatype", {}).get("value")
    lang = t.get("language")
    if dt == C.RDF_LANGSTRING:
        if lang:
            s += f"@{lang}"
    elif dt and dt != C.XSD_STRING:
        s += f"^^<{dt}>"
    return s


def serialize_quad(q: dict) -> str:
    g = _term_str(q["graph"])
    parts = [_term_str(q["subject"]), _term_str(q["predicate"]), _term_str(q["object"])]
    if g:
        parts.append(g)
    return " ".join(parts) + " .\n"


def serialize(quads: list[dict], *, sort: bool = True) -> str:
    """Dataset -> N-Quads document (sorted like rdf-canonize)."""
    lines = [serialize_quad(q) for q in quads]
    if sort:
        lines = sorted(set(lines))
    return "".join(lines)


# --- parsing ---------------------------------------------------------------

_IRI = r"<([^:]+:[^>]*)>"
_BNODE = r"(_:(?:[A-Za-z0-9_.\-:]+))"
_PLAIN = r'"((?:[^"\\]|\\.)*)"'
_DATATYPE = rf"\^\^{_IRI}"
_LANGUAGE = r"@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*)"
_LITERAL = rf"(?:{_PLAIN}(?:{_DATATYPE}|{_LANGUAGE})?)"
_WS = r"[ \t]+"
_WSO = r"[ \t]*"

_QUAD_RE = re.compile(
    rf"^{_WSO}(?:{_IRI}|{_BNODE}){_WS}{_IRI}{_WS}"
    rf"(?:{_IRI}|{_BNODE}|{_LITERAL}){_WSO}"
    rf"(?:(?:{_IRI}|{_BNODE}){_WSO})?\.{_WSO}(?:#.*)?$"
)
_EMPTY_RE = re.compile(r"^[ \t]*(?:#.*)?$")


def _unescape(s: str) -> str:
    def sub(m):
        t = m.group(0)
        if t in _UNESCAPE:
            return _UNESCAPE[t]
        if t.startswith("\\u"):
            return chr(int(t[2:], 16))
        if t.startswith("\\U"):
            return chr(int(t[2:], 16))
        return t[1:]
    return re.sub(r"\\U[0-9A-Fa-f]{8}|\\u[0-9A-Fa-f]{4}|\\.", sub, s)


def parse(doc: str) -> list[dict]:
    """N-Quads document -> list of RDF/JS quads."""
    quads = []
    for lineno, line in enumerate(doc.split("\n"), 1):
        if _EMPTY_RE.match(line):
            continue
        m = _QUAD_RE.match(line)
        if not m:
            raise ValueError(f"N-Quads parse error on line {lineno}: {line!r}")
        (s_iri, s_bn, p_iri, o_iri, o_bn, o_lit, o_dt, o_lang,
         g_iri, g_bn) = m.groups()
        subject = named_node(s_iri) if s_iri else {"termType": "BlankNode", "value": s_bn[2:]}
        predicate = named_node(p_iri)
        if o_iri:
            obj = named_node(o_iri)
        elif o_bn:
            obj = {"termType": "BlankNode", "value": o_bn[2:]}
        else:
            if o_lang:
                dt = C.RDF_LANGSTRING
            else:
                dt = o_dt or C.XSD_STRING
            obj = {"termType": "Literal", "value": _unescape(o_lit),
                   "datatype": named_node(dt), "language": o_lang or ""}
        if g_iri:
            graph = named_node(g_iri)
        elif g_bn:
            graph = {"termType": "BlankNode", "value": g_bn[2:]}
        else:
            graph = DEFAULT_GRAPH
        quads.append({"subject": subject, "predicate": predicate,
                      "object": obj, "graph": graph})
    return quads
