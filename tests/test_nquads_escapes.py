"""N-Quads parser/serializer adversarial escape + grammar-edge battery.

The reference's N-Quads codec lives in the external rdf-canonize
package (/root/reference/lib/NQuads.js:7 just re-exports it), which is
not vendored in this sandbox, so no subprocess differential is possible
for the parser itself. These tests pin the kernel codec against the
PUBLISHED grammar instead:

- canonical serialization known answers per W3C canonical N-Quads
  (ECHAR only for backslash, quote, LF, CR; literal TAB stays raw —
  the same canonical form rdf-canonize emits, which the byte-compare
  differential suites elsewhere already rely on),
- unescape semantics for \\uXXXX / \\UXXXXXXXX / ECHARs,
- round-trip identity on adversarial strings,
- rejection of malformed lines.
"""

import pytest

from jsonld_js_spark.kernel.nquads import parse, serialize, serialize_quad

E = "http://example.org/"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def lit(value, dt=XSD_STRING, lang=""):
    return {"termType": "Literal", "value": value,
            "datatype": {"termType": "NamedNode", "value": dt},
            "language": lang}


def quad(value):
    return {"subject": {"termType": "NamedNode", "value": E + "s"},
            "predicate": {"termType": "NamedNode", "value": E + "p"},
            "object": lit(value),
            "graph": {"termType": "DefaultGraph", "value": ""}}


# --- canonical escaping known answers --------------------------------

CANONICAL = {
    'say "hi"': '"say \\"hi\\""',
    "back\\slash": '"back\\\\slash"',
    "line\nfeed": '"line\\nfeed"',
    "carriage\rreturn": '"carriage\\rreturn"',
    "tab\there": '"tab\there"',          # TAB is NOT escaped canonically
    "mixed \\ \" \n \r \t end": '"mixed \\\\ \\" \\n \\r \t end"',
    "unicode é 中 \U0001f600": '"unicode é 中 \U0001f600"',
    "": '""',
}


@pytest.mark.parametrize("value", CANONICAL, ids=lambda v: repr(v)[:20])
def test_canonical_literal_escaping(value):
    line = serialize_quad(quad(value))
    assert line == f"<{E}s> <{E}p> {CANONICAL[value]} .\n"


# --- unescape semantics -----------------------------------------------

UNESCAPE = {
    '"\\u0041"': "A",
    '"\\u00e9"': "é",
    '"\\U0001F600"': "\U0001f600",
    '"\\t"': "\t",
    '"\\n"': "\n",
    '"\\r"': "\r",
    '"\\\\n"': "\\n",                 # escaped backslash then plain n
    '"\\\\\\u0041"': "\\A",           # escaped backslash then \u escape
    '"\\""': '"',
    '"a\\u0020b"': "a b",
    '"\\u0041\\u0042\\u0043"': "ABC",
}


@pytest.mark.parametrize("src", UNESCAPE, ids=lambda s: s[:16])
def test_unescape(src):
    quads = parse(f"<{E}s> <{E}p> {src} .\n")
    assert quads[0]["object"]["value"] == UNESCAPE[src]


# --- adversarial round trips ------------------------------------------

ADVERSARIAL = [
    'quote " backslash \\ both \\" end',
    "newline\nand\rand\ttab",
    "\\n not a newline",
    "trailing backslash \\",
    " control  chars",
    "astral \U0001f923 pair \U0010fffd",
    "combining á mark",
    "rtl שלום text",
    " leading and trailing spaces ",
    '." fake terminator . ',
    "<looks><like><iris>",
    "_:looks_like_bnode",
]


@pytest.mark.parametrize("value", ADVERSARIAL, ids=lambda v: repr(v)[:18])
def test_roundtrip_literal(value):
    q = quad(value)
    back = parse(serialize_quad(q))
    assert back == [q]


def test_roundtrip_langtag_and_datatype():
    doc = (f'<{E}s> <{E}p> "hallo \\"welt\\""@de-Latn-AT .\n'
           f'<{E}s> <{E}p> "x\\ny"^^<{E}Custom> .\n'
           f'<{E}s> <{E}p> "z" <{E}g> .\n'
           f'_:b.1-x <{E}p> _:b2 _:g3 .\n')
    quads = parse(doc)
    assert quads[0]["object"]["language"] == "de-Latn-AT"
    assert quads[0]["object"]["value"] == 'hallo "welt"'
    assert quads[1]["object"]["datatype"]["value"] == f"{E}Custom"
    assert quads[1]["object"]["value"] == "x\ny"
    assert quads[2]["graph"]["value"] == f"{E}g"
    assert quads[3]["subject"]["value"] == "b.1-x"
    assert quads[3]["graph"]["value"] == "g3"
    assert serialize(quads, sort=False) == doc


def test_whitespace_and_comments():
    doc = ("  # leading comment\n"
           "\n"
           f"\t<{E}s>\t<{E}p>\t\"v\"\t.\t\n"
           f"<{E}s> <{E}p> <{E}o> . # trailing comment\n")
    quads = parse(doc)
    assert len(quads) == 2
    assert quads[0]["object"]["value"] == "v"


MALFORMED = [
    f'<{E}s> <{E}p> "unterminated .',
    f'<{E}s> <{E}p> missing_brackets .',
    f'<{E}s> "literal predicate" <{E}o> .',
    f'<relative> <{E}p> "v" .',          # IRIs must be absolute
    f'<{E}s> <{E}p> "v"',                # missing terminating dot
    f'<{E}s> <{E}p> "v"@ .',             # empty language tag
    f'<{E}s> <{E}p> "a" "b" .',          # literal graph label
]


@pytest.mark.parametrize("line", MALFORMED, ids=lambda s: s[:24])
def test_malformed_rejected(line):
    with pytest.raises(ValueError, match="N-Quads parse error"):
        parse(line + "\n")
