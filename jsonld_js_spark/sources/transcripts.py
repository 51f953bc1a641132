"""Deterministic multi-turn transcript synthesizer (FIXTURES.md §1).

Schema == BASELINE.json input_hint:
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)``.

Properties:
- fully deterministic given (n_convs, seed): generation is a pure
  function of the conversation index, so it runs distributed
  (spark.range -> mapInPandas) with NO driver-side data and scales to
  bench sizes.
- Zipf-skewed turn counts: conversation 0 is ~50x hotter than the
  median (exercises AQE skew handling + salting).
- a deterministic ~10% of assistant turns embed a JSON-LD document
  from the template pool below; each template carries HAND-WRITTEN
  expected N-Quads (the P/R oracle — independent of the kernel).
- `tool` turns carry a JSON payload mapped via TOOL_CONTEXT.

The same pure functions are importable by tests to recompute which
template landed on which turn and what quads it must produce.
"""

from __future__ import annotations

import hashlib
import json
import re
from datetime import datetime, timedelta, timezone

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
V = "https://example.org/vocab#"

BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)

TRANSCRIPT_CONTEXT = {
    "@vocab": V,
    "conv": {"@id": V + "conversation", "@type": "@id"},
    "turnIndex": {"@id": V + "turnIndex", "@type": XSD + "integer"},
    "role": V + "role",
    "text": V + "text",
    "ts": {"@id": V + "ts", "@type": XSD + "dateTime"},
    "invokes": {"@id": V + "invokes", "@type": "@id"},
    "arg": V + "arg",
}

TOOL_CONTEXT = {
    "@vocab": V,
    "name": {"@id": V + "toolName"},
    "args": {"@id": V + "args", "@type": "@json"},
}


def _h(*parts) -> int:
    """Deterministic 64-bit hash of the parts (no Python hash()
    randomization; stable across executors)."""
    raw = "\x1f".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.sha256(raw).digest()[:8], "big")


def turn_count(conv_index: int, seed: int) -> int:
    """Zipf-ish turn counts: head conversations are hot."""
    if conv_index == 0:
        return 500
    if conv_index < 5:
        return 100
    return 4 + _h("turns", seed, conv_index) % 13  # 4..16


def _role(turn_idx: int) -> str:
    return ("user", "assistant", "tool")[turn_idx % 3]


# --------------------------------------------------------------------------
# Embedded JSON-LD templates with hand-written expected N-Quads.
# `s` is the per-turn subject IRI; labels on the expected side are
# arbitrary (comparison is canonize-then-compare per document).
# --------------------------------------------------------------------------

def _t_person(s, k):
    doc = {"@context": {"name": V + "name",
                        "age": {"@id": V + "age", "@type": XSD + "integer"}},
           "@id": s, "name": f"Person{k}", "age": k}
    exp = [f'<{s}> <{V}age> "{k}"^^<{XSD}integer> .',
           f'<{s}> <{V}name> "Person{k}" .']
    return doc, exp


def _t_measure(s, k):
    # Canonical xsd:double exactly as the reference computes it
    # (lib/toRdf.js canonical double: toExponential(15) then strip the
    # trailing-zero run before the exponent) — e.g. 0.5 -> "5.0E-1",
    # 7.5 -> "7.5E0", 96.5 -> "9.65E1". A hand-rolled mantissa split
    # got k=0 wrong ("0.5E0"); this mirrors the rule itself.
    val = k + 0.5
    canon = re.sub(r"(\d)0*e\+?", r"\1E", f"{val:.15e}", count=1)
    canon = re.sub(r"E(-?)0*(\d)", r"E\1\2", canon, count=1)
    doc = {"@context": {"@vocab": V}, "@id": s,
           "score": val, "active": k % 2 == 0}
    exp = [f'<{s}> <{V}active> "{"true" if k % 2 == 0 else "false"}"^^<{XSD}boolean> .',
           f'<{s}> <{V}score> "{canon}"^^<{XSD}double> .']
    return doc, exp


def _t_list(s, k):
    doc = {"@context": {"steps": {"@id": V + "steps", "@container": "@list"}},
           "@id": s, "steps": [f"s{k}", f"s{k+1}"]}
    exp = [f'<{s}> <{V}steps> _:l0 .',
           f'_:l0 <{RDF}first> "s{k}" .',
           f'_:l0 <{RDF}rest> _:l1 .',
           f'_:l1 <{RDF}first> "s{k+1}" .',
           f'_:l1 <{RDF}rest> <{RDF}nil> .']
    return doc, exp


def _t_lang(s, k):
    doc = {"@context": {"label": {"@id": V + "label", "@container": "@language"}},
           "@id": s, "label": {"en": f"item {k}", "de": f"Stück {k}"}}
    exp = [f'<{s}> <{V}label> "item {k}"@en .',
           f'<{s}> <{V}label> "Stück {k}"@de .']
    return doc, exp


def _t_graph(s, k):
    doc = {"@id": s + "/g", "@graph": [
        {"@id": s, V + "p": f"v{k}"}]}
    exp = [f'<{s}> <{V}p> "v{k}" <{s}/g> .']
    return doc, exp


def _t_bnode(s, k):
    doc = {"@context": {"@vocab": V}, "@id": s,
           "knows": {"name": f"Anon{k}"}}
    exp = [f'<{s}> <{V}knows> _:x .',
           f'_:x <{V}name> "Anon{k}" .']
    return doc, exp


def _t_json(s, k):
    doc = {"@context": {"payload": {"@id": V + "payload", "@type": "@json"}},
           "@id": s, "payload": {"b": k, "a": [True, None]}}
    jcs = f'{{"a":[true,null],"b":{k}}}'
    esc = jcs.replace("\\", "\\\\").replace('"', '\\"')
    exp = [f'<{s}> <{V}payload> "{esc}"^^<{RDF}JSON> .']
    return doc, exp


def _t_reverse(s, k):
    doc = {"@context": {"childOf": {"@reverse": V + "parentOf"}},
           "@id": s, "childOf": {"@id": s + "/parent"}}
    exp = [f'<{s}/parent> <{V}parentOf> <{s}> .']
    return doc, exp


def _t_typed(s, k):
    doc = {"@context": {"@vocab": V, "ref": {"@type": "@id"}},
           "@id": s, "@type": ["Alpha", "Beta"], "ref": s + "/other"}
    exp = [f'<{s}> <{RDF}type> <{V}Alpha> .',
           f'<{s}> <{RDF}type> <{V}Beta> .',
           f'<{s}> <{V}ref> <{s}/other> .']
    return doc, exp


def _t_nest(s, k):
    doc = {"@context": {"@vocab": V, "meta": "@nest"},
           "@id": s, "meta": {"note": f"n{k}"}}
    exp = [f'<{s}> <{V}note> "n{k}" .']
    return doc, exp


def _t_prop_scoped(s, k):
    # property-scoped context remaps `inner` for the holder's value
    doc = {"@context": {"@vocab": V,
                        "holder": {"@id": V + "holder",
                                   "@context": {"inner": V + "inner2"}}},
           "@id": s, "holder": {"inner": f"x{k}"}}
    exp = [f'<{s}> <{V}holder> _:h .',
           f'_:h <{V}inner2> "x{k}" .']
    return doc, exp


def _t_type_scoped(s, k):
    # type-scoped context applies to the typed node, reverts below it
    doc = {"@context": {"@vocab": V,
                        "Widget": {"@id": V + "Widget",
                                   "@context": {"size": V + "scopedSize"}}},
           "@id": s, "@type": "Widget", "size": f"{k}cm",
           "part": {"size": f"{k}mm"}}
    exp = [f'<{s}> <{RDF}type> <{V}Widget> .',
           f'<{s}> <{V}scopedSize> "{k}cm" .',
           f'<{s}> <{V}part> _:p .',
           f'_:p <{V}size> "{k}mm" .']
    return doc, exp


TEMPLATES = [_t_person, _t_measure, _t_list, _t_lang, _t_graph,
             _t_bnode, _t_json, _t_reverse, _t_typed, _t_nest,
             _t_prop_scoped, _t_type_scoped]


def turn_subject(conv_id: str, turn_idx: int) -> str:
    return f"https://example.org/conv/{conv_id}/turn/{turn_idx}"


def embedded_case(conv_id: str, turn_idx: int, seed: int):
    """If this (assistant) turn embeds a JSON-LD doc, return
    (doc_json_text, expected_nquads_lines); else None. Pure function —
    the oracle side recomputes it."""
    h = _h("embed", seed, conv_id, turn_idx)
    if h % 10 != 0:
        return None
    tmpl = TEMPLATES[(h // 10) % len(TEMPLATES)]
    s = turn_subject(conv_id, turn_idx)
    k = (h // 100) % 97
    doc, exp = tmpl(s, k)
    return json.dumps(doc, sort_keys=True), [line + "\n" for line in exp]


def tool_payload(conv_id: str, turn_idx: int, seed: int) -> str:
    h = _h("tool", seed, conv_id, turn_idx)
    name = ("search", "calculator", "browser")[h % 3]
    return json.dumps({"name": name, "args": {"q": f"query{h % 50}"}},
                      sort_keys=True)


_WORDS = ("the quick graph spans turns and tools while spark shuffles "
          "partitions across executors with arrow batches and salted keys").split()


def _utterance(conv_id: str, turn_idx: int, seed: int) -> str:
    h = _h("text", seed, conv_id, turn_idx)
    n = 5 + h % 12
    return " ".join(_WORDS[(h + i) % len(_WORDS)] for i in range(n))


def gen_conversation(conv_index: int, seed: int = 42) -> list[dict]:
    """All turns of one conversation — pure, deterministic."""
    conv_id = f"conv-{conv_index:06d}"
    n = turn_count(conv_index, seed)
    rows = []
    for t in range(n):
        role = _role(t)
        tool = None
        if role == "assistant":
            case = embedded_case(conv_id, t, seed)
            text = case[0] if case else _utterance(conv_id, t, seed)
        elif role == "tool":
            tool = tool_payload(conv_id, t, seed)
            text = f"tool result {t}"
        else:
            text = _utterance(conv_id, t, seed)
        rows.append({
            "conv_id": conv_id,
            "turn_idx": t,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": BASE_TS + timedelta(seconds=conv_index * 997 + 7 * t),
        })
    return rows


TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")


def synthesize_transcripts(spark, n_convs: int, seed: int = 42,
                           partitions: int | None = None):
    """Distributed deterministic synthesis: spark.range over conv
    indices -> mapInPandas -> transcript DataFrame. No driver data."""
    import pandas as pd

    if partitions is None:
        partitions = max(8, min(256, n_convs // 64 or 1))

    def gen(batches):
        for pdf in batches:
            out = []
            for conv_index in pdf["id"]:
                out.extend(gen_conversation(int(conv_index), seed))
            if out:
                yield pd.DataFrame(out)

    return (spark.range(0, n_convs, numPartitions=partitions)
            .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA))
