"""The reference's OWN regression corpus (tests/misc.js) as a
differential battery.

misc.js is jsonld.js' hand-curated non-W3C regression suite — js
keywords, relative IRIs, @vocab prepending, literal JSON, value
corners. We mine only the INPUT documents out of it at runtime (the
expected outputs are unnecessary: the reference itself is the oracle)
and run every document through expand / compact / flatten / toRDF on
both engines. Remote-context inputs run against an EMPTY document
table on both sides, so loader failures compare as error-parity.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from jsonld_js_spark.kernel import api
from jsonld_js_spark.kernel import compact as k_compact
from jsonld_js_spark.kernel import flatten as k_flat
from jsonld_js_spark.kernel import to_rdf as k_trd
from jsonld_js_spark.kernel.errors import JsonLdError

from tests.ref_oracle import harness

REF_MISC = "/root/reference/tests/misc.js"
REF_GC = "/root/reference/tests/graph-container.js"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_MISC) and harness.available()),
    reason="reference misc.js or node unavailable")


def _mine_inputs() -> list:
    src = open(REF_MISC).read()
    if os.path.exists(REF_GC):
        src += open(REF_GC).read()
    dec = json.JSONDecoder()
    docs = []
    for m in re.finditer(r"const (?:input|doc) =\s*", src):
        start = m.end()
        if start >= len(src) or src[start] not in "{[":
            continue
        try:
            val, _ = dec.raw_decode(src[start:])
        except ValueError:
            continue  # JS-expression inputs (template strings etc.)
        docs.append(val)
    seen = set()
    out = []
    for d in docs:
        k = json.dumps(d, sort_keys=True)
        if k not in seen:
            seen.add(k)
            out.append(d)
    return out


MISC_DOCS = _mine_inputs() if os.path.exists(REF_MISC) else []


def _js_numbers(x):
    if isinstance(x, float) and x.is_integer() and abs(x) < 2**53:
        return int(x)
    if isinstance(x, list):
        return [_js_numbers(v) for v in x]
    if isinstance(x, dict):
        return {k: _js_numbers(v) for k, v in x.items()}
    return x


def deep_eq(a, b) -> bool:
    return json.dumps(_js_numbers(a), sort_keys=True) == \
        json.dumps(_js_numbers(b), sort_keys=True)


@pytest.fixture(scope="module")
def oracle():
    o = harness.ReferenceOracle()
    yield o
    o.close()


def test_corpus_mined():
    # the miner must find a substantive corpus, not silently shrink
    assert len(MISC_DOCS) >= 60, len(MISC_DOCS)


@pytest.mark.parametrize("doc_i", range(len(MISC_DOCS)),
                         ids=[f"m{i}" for i in range(len(MISC_DOCS))])
@pytest.mark.parametrize("op", ["expand", "compact", "flatten", "toRDF"])
def test_misc_corpus_matches_reference(oracle, op, doc_i):
    doc = MISC_DOCS[doc_i]
    ctx = doc.get("@context") if isinstance(doc, dict) else None
    kw = {"documents": {}}
    if op == "compact":
        ref = oracle.call("compact", doc=doc, ctx={"@context": ctx or {}},
                          **kw)
    else:
        ref = oracle.call(op, doc=doc, **kw)
    kopts = {"context_loader": {}}
    try:
        if op == "expand":
            mine = api.expand(doc, dict(kopts))
        elif op == "flatten":
            mine = k_flat(doc, None, dict(kopts))
        elif op == "toRDF":
            mine = k_trd(doc, {"format": "application/n-quads", **kopts})
        else:
            mine = k_compact(doc, ctx or {}, dict(kopts))
        assert ref["ok"], f"reference errored but we didn't: {ref}"
        if op == "toRDF":
            assert mine == ref["result"], \
                f"mine={mine!r}\nref={ref['result']!r}"
        else:
            assert deep_eq(mine, ref["result"]), (
                f"mine={json.dumps(mine, sort_keys=True)}\n"
                f"ref ={json.dumps(ref['result'], sort_keys=True)}")
    except JsonLdError as e:
        assert not ref["ok"], f"we errored ({e}) but reference ok: {ref}"


@pytest.mark.parametrize("doc_i", range(len(MISC_DOCS)),
                         ids=[f"mi{i}" for i in range(len(MISC_DOCS))])
def test_misc_corpus_expand_idempotent_like_reference(oracle, doc_i):
    """Re-EXPAND each engine's own expanded output (the user path for
    already-expanded data, and the semantic core of skipExpansion):
    expanded documents are a different input distribution — no
    contexts, explicit @value/@list shapes, keyword-only objects."""
    doc = MISC_DOCS[doc_i]
    ref1 = oracle.call("expand", doc=doc, documents={})
    try:
        mine1 = api.expand(doc, {"context_loader": {}})
    except JsonLdError:
        assert not ref1["ok"]
        return
    assert ref1["ok"]
    ref2 = oracle.call("expand", doc=ref1["result"], documents={})
    try:
        mine2 = api.expand(mine1, {"context_loader": {}})
        assert ref2["ok"], f"reference errored on re-expand: {ref2}"
        assert deep_eq(mine2, ref2["result"]), (
            f"mine={json.dumps(mine2, sort_keys=True)}\n"
            f"ref ={json.dumps(ref2['result'], sort_keys=True)}")
    except JsonLdError as e:
        assert not ref2["ok"], f"we errored ({e}) on re-expand but ref ok"


from tests.misc_replay import mine_replay_cases  # noqa: E402

REPLAY_CASES, REPLAY_SKIPPED = (
    mine_replay_cases(["/root/reference/tests/misc.js",
                       "/root/reference/tests/graph-container.js"])
    if os.path.exists(REF_MISC) else ([], 0))


def test_replay_miner_yield():
    # the op-faithful miner must keep most cases (skips are counted)
    assert len(REPLAY_CASES) >= 80, (len(REPLAY_CASES), REPLAY_SKIPPED)


@pytest.mark.parametrize("case_i", range(len(REPLAY_CASES)),
                         ids=[f"rp{i}" for i in range(len(REPLAY_CASES))])
def test_misc_replay_matches_reference(oracle, case_i):
    """Op-FAITHFUL replay of the reference's own misc.js cases: same
    op, same options (skipExpansion etc.), event-code multiset parity,
    plus the safe-mode halves (testSafe: safe:true must behave
    identically; testNotSafe: safe:true must error on BOTH sides)."""
    from collections import Counter

    case = REPLAY_CASES[case_i]
    op, doc = case["op"], case["doc"]
    opts = dict(case.get("options", {}))

    def run_ref(extra=None):
        o = {**opts, **(extra or {})}
        kw = {"options": o} if o else {}
        if op == "fromRDF":
            return oracle.call("fromRDF", dataset=doc,
                               collectEvents=True, **kw)
        if op == "compact":
            return oracle.call("compact", doc=doc,
                               ctx=case.get("ctx") or {},
                               collectEvents=True, **kw)
        return oracle.call(op, doc=doc, collectEvents=True, **kw)

    def run_mine(extra=None):
        kopts = {**opts, **(extra or {}), "events": []}
        if op == "expand":
            out = api.expand(doc, kopts)
        elif op == "toRDF":
            out = api.to_rdf(doc, {"format": "application/n-quads",
                                   **kopts})
        elif op == "fromRDF":
            out = api.from_rdf(doc, kopts)
        elif op == "compact":
            out = api.compact(doc, case.get("ctx") or {}, kopts)
        elif op == "flatten":
            out = api.flatten(doc, None, kopts)
        else:
            pytest.skip(f"op {op} not replayable")
        return out, kopts["events"]

    ref = run_ref()
    try:
        mine, events = run_mine()
        assert ref["ok"], f"reference errored but we didn't: {ref}"
        if op == "toRDF":
            assert mine == ref["result"], \
                f"mine={mine!r}\nref={ref['result']!r}"
        else:
            assert deep_eq(mine, ref["result"]), (
                f"mine={json.dumps(mine, sort_keys=True)}\n"
                f"ref ={json.dumps(ref['result'], sort_keys=True)}")
        assert Counter(e["code"] for e in events) == \
            Counter(e["code"] for e in ref.get("events", [])), (
            [e["code"] for e in events],
            [e["code"] for e in ref.get("events", [])])
    except JsonLdError as e:
        assert not ref["ok"], f"we errored ({e.code}) but reference ok: {ref}"

    if case.get("testSafe"):
        ref_s = run_ref({"safe": True})
        try:
            mine_s, _ = run_mine({"safe": True})
            assert ref_s["ok"], f"safe: reference errored, we didn't: {ref_s}"
            if op == "toRDF":
                assert mine_s == ref_s["result"]
            else:
                assert deep_eq(mine_s, ref_s["result"])
        except JsonLdError as e:
            assert not ref_s["ok"], f"safe: we errored ({e.code}), ref ok"
    if case.get("testNotSafe"):
        ref_s = run_ref({"safe": True})
        assert not ref_s["ok"], f"notSafe: reference stayed ok: {ref_s}"
        with pytest.raises(JsonLdError):
            run_mine({"safe": True})
