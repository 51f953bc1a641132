"""Deterministic entity dictionary synthesizer (FIXTURES.md §4).

~1k rows (entity_id, surface, kind); a deterministic 1% of surfaces
are high-frequency in the transcript corpus — the skew trigger for
salted joins. The surfaces are drawn from the same word pool the
transcript utterances use, so mentions actually occur.
"""

from __future__ import annotations

ENTITY_NS = "https://example.org/ent/"

# surfaces overlapping sources.transcripts._WORDS => guaranteed mentions;
# 'spark' and 'graph' are the hot heads (they appear in ~every utterance).
_BASE_SURFACES = ["spark", "graph", "partitions", "executors", "arrow",
                  "batches", "shuffles", "keys", "tools", "turns"]
_KINDS = ("topic", "tool", "person")


def gen_entities(n: int = 1000, seed: int = 42) -> list[dict]:
    import hashlib

    rows = []
    for k in range(n):
        if k < len(_BASE_SURFACES):
            surface = _BASE_SURFACES[k]
        else:
            h = hashlib.sha256(f"ent{seed}:{k}".encode()).hexdigest()[:8]
            surface = f"entity_{h}"
        rows.append({
            "entity_id": f"{ENTITY_NS}{k}",
            "surface": surface,
            "kind": _KINDS[k % len(_KINDS)],
        })
    return rows


def entities_df(spark, n: int = 1000, seed: int = 42):
    return spark.createDataFrame(
        gen_entities(n, seed), "entity_id string, surface string, kind string")
