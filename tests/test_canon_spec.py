"""Independent RDFC-1.0 conformance checks for kernel/canon.py.

No W3C rdf-canon suite files and no real rdf-canonize package exist in
this sandbox (no network), so this file re-derives the spec's
first-degree hash (RDFC-1.0 §4.6 "Hash First Degree Quads") with its
OWN serializer — sharing no code with the kernel — and checks the
kernel's canonical issuance order against it. For datasets where all
first-degree hashes are distinct (the overwhelmingly common case, and
the only case the first-degree step fully decides), RDFC-1.0 fixes the
complete labeling: c14nN is assigned in ascending first-degree-hash
order. That makes this an exact, independently-computed expected
output, not an invariance property.

The N-degree tie-breaking path is covered by the symmetric
known-answer cases and permutation-invariance fuzz in test_canon.py,
and by the poison-graph work-factor cases here (mirroring the
reference harness semantics, /root/reference/tests/test.js:652-667).
"""

import hashlib
import itertools

import pytest

from jsonld_js_spark.kernel.canon import (
    PoisonedDatasetError,
    canonical_id_map,
    canonize,
)
from jsonld_js_spark.kernel.nquads import parse

EX = "http://example.org/v#"


# ---------------------------------------------------------------------
# Independent spec implementation (test-local; no kernel imports)
# ---------------------------------------------------------------------

def _nq_term(t, ref):
    """Serialize one RDF term per RDFC-1.0 §4.6 step 3: the reference
    blank node becomes _:a, every other blank node _:z."""
    if t["termType"] == "BlankNode":
        return "_:a" if t["value"] == ref else "_:z"
    if t["termType"] == "NamedNode":
        return f"<{t['value']}>"
    if t["termType"] == "DefaultGraph":
        return ""
    # Literal — restricted shapes used in this file (no escapes needed)
    v = f'"{t["value"]}"'
    lang = t.get("language")
    if lang:
        return f"{v}@{lang}"
    dt = t.get("datatype", {}).get("value")
    if dt and dt != "http://www.w3.org/2001/XMLSchema#string":
        return f"{v}^^<{dt}>"
    return v


def spec_first_degree_hash(quads, bnode):
    """RDFC-1.0 §4.6: serialize every quad mentioning the bnode with
    a/z substitution, sort, sha256."""
    lines = []
    for q in quads:
        mentions = any(
            q[pos]["termType"] == "BlankNode" and q[pos]["value"] == bnode
            for pos in ("subject", "object", "graph"))
        if not mentions:
            continue
        s = _nq_term(q["subject"], bnode)
        p = _nq_term(q["predicate"], bnode)
        o = _nq_term(q["object"], bnode)
        g = _nq_term(q["graph"], bnode)
        line = f"{s} {p} {o} {g} .\n" if g else f"{s} {p} {o} .\n"
        lines.append(line)
    lines.sort()
    return hashlib.sha256("".join(lines).encode("utf-8")).hexdigest()


def spec_expected_labels(nq: str) -> dict[str, str]:
    """Expected canonical map when ALL first-degree hashes are
    distinct: c14nN in ascending hash order (RDFC-1.0 §4.4 step 5)."""
    quads = parse(nq)
    bnodes = set()
    for q in quads:
        for pos in ("subject", "object", "graph"):
            if q[pos]["termType"] == "BlankNode":
                bnodes.add(q[pos]["value"])
    hashes = {b: spec_first_degree_hash(quads, b) for b in bnodes}
    assert len(set(hashes.values())) == len(hashes), \
        "test case must have all-distinct first-degree hashes"
    ordered = sorted(bnodes, key=lambda b: hashes[b])
    return {b: f"c14n{i}" for i, b in enumerate(ordered)}


# ---------------------------------------------------------------------
# Distinct-hash datasets: exact expected labelings
# ---------------------------------------------------------------------

DISTINCT_CASES = {
    "two_literal_leaves": (
        f'_:x <{EX}p> "a" .\n'
        f'_:y <{EX}p> "b" .\n'),
    "chain_of_four": (
        f'_:a <{EX}next> _:b .\n'
        f'_:b <{EX}next> _:c .\n'
        f'_:c <{EX}next> _:d .\n'
        f'_:a <{EX}val> "1" .\n'
        f'_:b <{EX}val> "2" .\n'
        f'_:c <{EX}val> "3" .\n'
        f'_:d <{EX}val> "4" .\n'),
    "star": (
        f'_:hub <{EX}e> _:s1 .\n'
        f'_:hub <{EX}e> _:s2 .\n'
        f'_:s1 <{EX}val> "1" .\n'
        f'_:s2 <{EX}val> "2" .\n'),
    "mixed_positions": (
        f'<{EX}i> <{EX}p> _:o .\n'
        f'_:s <{EX}q> <{EX}i> .\n'
        f'_:o <{EX}r> _:s .\n'),
    "graph_position": (
        f'<{EX}a> <{EX}p> "v" _:g .\n'
        f'_:g <{EX}label> "the graph" .\n'
        f'_:n <{EX}q> "w" _:g .\n'),
    "datatypes_and_langs": (
        f'_:a <{EX}p> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        f'_:b <{EX}p> "fem"@de .\n'
        f'_:c <{EX}p> "plain" .\n'),
    "self_reference": (
        f'_:a <{EX}p> _:a .\n'
        f'_:b <{EX}p> "leaf" .\n'),
    "deep_tree": (
        f'_:r <{EX}l> _:c1 .\n'
        f'_:r <{EX}r> _:c2 .\n'
        f'_:c1 <{EX}l> _:c3 .\n'
        f'_:c2 <{EX}val> "x" .\n'
        f'_:c3 <{EX}val> "y" .\n'),
}


@pytest.mark.parametrize("name", DISTINCT_CASES, ids=list(DISTINCT_CASES))
def test_labels_match_spec_first_degree_order(name):
    nq = DISTINCT_CASES[name]
    expected = spec_expected_labels(nq)
    got = canonical_id_map(parse(nq))
    assert got == expected, f"{name}: {got} != {expected}"


@pytest.mark.parametrize("name", DISTINCT_CASES, ids=list(DISTINCT_CASES))
def test_labels_invariant_under_relabeling(name):
    """The expected map is structural: any input relabeling must yield
    the same canonical dataset text."""
    nq = DISTINCT_CASES[name]
    base = canonize(parse(nq))
    labels = sorted({t for t in nq.split() if t.startswith("_:")})
    for perm in itertools.permutations(labels):
        if perm == tuple(labels):
            continue
        tmp = nq
        for i, old in enumerate(labels):
            tmp = tmp.replace(old + " ", f"_:TMP{i} ")
        for i, new in enumerate(perm):
            tmp = tmp.replace(f"_:TMP{i} ", new + " ")
        assert canonize(parse(tmp)) == base, f"{name}: {perm}"


# ---------------------------------------------------------------------
# Work-factor semantics (the reference harness's maxWorkFactor knobs)
# ---------------------------------------------------------------------

def _clique(k: int) -> str:
    """Complete digraph over k bnodes with one predicate — every
    first-degree hash identical, forcing N-degree permutations."""
    return "".join(f'_:n{i} <{EX}e> _:n{j} .\n'
                   for i in range(k) for j in range(k) if i != j)


def test_poison_raises_at_default_work_factor():
    with pytest.raises(PoisonedDatasetError):
        canonize(parse(_clique(10)))


def test_poison_raises_at_low_work_factor():
    with pytest.raises(PoisonedDatasetError):
        canonize(parse(_clique(6)), max_work_factor=1)


def test_small_symmetric_ok_unbounded():
    out = canonize(parse(_clique(4)), max_work_factor=float("inf"))
    # fully symmetric: canonical form must be the relabeled clique
    assert out == _clique(4).replace("_:n", "_:c14n")


def test_work_factor_zero_rejects_any_shared_hash():
    with pytest.raises(PoisonedDatasetError):
        canonize(parse(_clique(2)), max_work_factor=0)
