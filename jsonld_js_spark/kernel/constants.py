"""RDF / XSD constants and JSON-LD keywords.

Parity: /root/reference/lib/constants.js:6-32 (IRIs) and the keyword
set accepted by jsonld.js's expansion (lib/context.js isKeyword).
"""

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"

RDF_LIST = RDF + "List"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"
RDF_TYPE = RDF + "type"
RDF_LANGSTRING = RDF + "langString"
RDF_JSON_LITERAL = RDF + "JSON"

XSD_BOOLEAN = XSD + "boolean"
XSD_DOUBLE = XSD + "double"
XSD_INTEGER = XSD + "integer"
XSD_STRING = XSD + "string"

I18N_NS = "https://www.w3.org/ns/i18n#"

# Keywords recognized by the JSON-LD 1.1 grammar.
KEYWORDS = frozenset(
    {
        "@base",
        "@container",
        "@context",
        "@default",
        "@direction",
        "@embed",
        "@explicit",
        "@graph",
        "@id",
        "@included",
        "@index",
        "@json",
        "@language",
        "@list",
        "@nest",
        "@none",
        "@omitDefault",
        "@prefix",
        "@preserve",
        "@protected",
        "@requireAll",
        "@reverse",
        "@set",
        "@type",
        "@value",
        "@version",
        "@vocab",
    }
)
# NOTE: the reference's isKeyword (lib/context.js) does NOT include
# @import, @propagate (context-entry directives handled positionally,
# not keywords) — so e.g. a term @id of "@propagate" is a 'reserved
# @id value' warning, not a keyword alias, and an @import-merged
# "@propagate" key is a dropped 'reserved term'. Replicated.


def is_keyword(v) -> bool:
    """True for registered JSON-LD keywords."""
    return isinstance(v, str) and v in KEYWORDS


def looks_like_keyword(v: str) -> bool:
    """True for '@'-prefixed alpha strings (reserved keyword shape)."""
    if not isinstance(v, str) or not v.startswith("@") or len(v) < 2:
        return False
    return v[1:].isalpha()
