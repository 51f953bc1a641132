"""Every synthetic-corpus template's hand-written expected N-Quads must
match the kernel's to_rdf output for EVERY k the corpus can draw
(k in 0..96) — the templates are the P/R oracle, so a wrong expected
line records a false mismatch against the engine (the k=0 canonical
xsd:double bug: "0.5E0" vs the correct "5.0E-1").

Pure-kernel test: no Spark session needed.
"""

import json

import pytest

from jsonld_js_spark.kernel.api import to_rdf
from jsonld_js_spark.kernel.canon import canonize as canon_quads
from jsonld_js_spark.kernel.nquads import parse as nq_parse, serialize as nq_serialize
from jsonld_js_spark.sources.transcripts import TEMPLATES, turn_subject


def _canon_set(quads):
    out = set(canon_quads(quads).strip().split("\n"))
    out.discard("")
    return out


@pytest.mark.parametrize("tmpl", TEMPLATES, ids=[t.__name__ for t in TEMPLATES])
def test_template_expected_matches_to_rdf_all_k(tmpl):
    s = turn_subject("conv-tmpl", 0)
    for k in range(97):
        doc, exp = tmpl(s, k)
        doc = json.loads(json.dumps(doc))  # the pipeline sees JSON text
        actual = to_rdf(doc)
        expected = _canon_set(nq_parse("".join(line + "\n" for line in exp)))
        got = _canon_set(actual)
        assert got == expected, (
            f"{tmpl.__name__} k={k}:\n expected={sorted(expected)}\n"
            f" got={sorted(got)}")
