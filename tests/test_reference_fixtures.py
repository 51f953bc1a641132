"""The reference repo's OWN local test fixtures run through our engine.

- fromRdf-0001: N-Quads (with comments, datatyped/lang literals) ->
  expanded JSON-LD, compared to the repo's expected output
  (/root/reference/tests/fromRdf-0001-{in,out}).
- remote-000X: documents whose @context is a URL served by the
  reference's local test server (tests/test-server.js); here the
  driver-preloaded context_loader dict stands in for the loader —
  exactly the engine's no-executor-I/O design (SURVEY §2.2).
"""

import json
import os

import pytest

from jsonld_js_spark.kernel import expand, from_rdf

REF = "/root/reference/tests"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference fixtures absent")


def _load(name):
    with open(os.path.join(REF, name)) as f:
        return f.read()


def _loader():
    loader = {}
    for fname in os.listdir(os.path.join(REF, "contexts")):
        url = f"http://localhost:8000/{fname}"
        loader[url] = json.loads(_load(os.path.join("contexts", fname)))
    # network-free stand-in for the one external context the fixtures
    # reference (the relevant subset of payswarm v1)
    loader["https://w3id.org/payswarm/v1"] = {
        "@context": {"comment": "http://www.w3.org/2000/01/rdf-schema#comment"}}
    return loader


def test_fromrdf_0001():
    got = from_rdf(_load("fromRdf-0001-in.nq"))
    expected = json.loads(_load("fromRdf-0001-out.jsonld"))
    assert got == expected


@pytest.mark.parametrize("num", ["0001", "0002", "0003", "0004", "0005",
                                 "0006", "0008"])
def test_remote_context_fixture(num):
    doc = json.loads(_load(f"remote-{num}-in.jsonld"))
    expected = json.loads(_load(f"remote-{num}-out.jsonld"))
    got = expand(doc, {"context_loader": _loader(),
                       "base": f"http://localhost:8000/remote-{num}-in.jsonld"})
    assert got == expected, f"remote-{num}: {got}"
