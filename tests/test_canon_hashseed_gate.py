"""Hash-seed determinism gate (VERDICT r5 "what's wrong" #1 / next #3).

The exact bug class r5 fixed in kernel/canon.py: canonical-id-map
n-degree tie order once followed Python str-hash order, so the map
changed with PYTHONHASHSEED. CONFORMANCE.md's 1/7/99 runs were manual;
this test makes them a permanent regression gate by subprocess-running
the map computation under three fixed seeds and asserting identical
digests — over every committed canon vector AND a seeded sweep of
adversarially symmetric digraphs (the shapes where tie order carries
the whole answer).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import glob, hashlib, json, os, random, sys
sys.path.insert(0, "@@REPO@@")
from jsonld_js_spark.kernel.canon import canonical_id_map
from jsonld_js_spark.kernel.nquads import parse

digest = hashlib.sha256()
for path in sorted(glob.glob(os.path.join("@@REPO@@", "tests", "vectors",
                                          "*.in.nq"))):
    name = os.path.basename(path)
    if "poison" in name:
        continue  # rejected under the default work factor by design
    with open(path) as f:
        nq = f.read()
    m = canonical_id_map(parse(nq))
    digest.update(name.encode())
    digest.update(json.dumps(sorted(m.items())).encode())

# seeded random digraph sweep: rings + unions of isomorphic components
rng = random.Random(20260822)
for case in range(12):
    n = rng.randrange(3, 9)
    lines = []
    for i in range(n):
        lines.append(f"_:a{i} <urn:p> _:a{(i + 1) % n} .")
    for i in range(n):
        lines.append(f"_:b{i} <urn:p> _:b{(i + 1) % n} .")
    if rng.randrange(2):
        lines.append(f"_:a0 <urn:q> _:b{rng.randrange(n)} .")
    nq = "\n".join(lines) + "\n"
    m = canonical_id_map(parse(nq))
    digest.update(json.dumps(sorted(m.items())).encode())

print(digest.hexdigest())
"""


def test_canonical_id_map_identical_under_hash_seeds():
    digests = {}
    for seed in ("1", "7", "99"):
        env = dict(os.environ, PYTHONHASHSEED=seed)
        out = subprocess.run(
            [sys.executable, "-c", _WORKER.replace("@@REPO@@", REPO)],
            capture_output=True, text=True, env=env, timeout=600)
        assert out.returncode == 0, out.stderr[-2000:]
        digests[seed] = out.stdout.strip()
    assert len(set(digests.values())) == 1, digests
