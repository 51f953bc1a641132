"""Framing: pattern-match query + reshaping over the node map.

W3C JSON-LD 1.1 Framing spec. Parity: /root/reference/lib/frame.js
(subject filtering 519-637, value patterns 794-826, embed control
419-439/645-684, @explicit/@requireAll/@default→@preserve 269-295,
cleanup 694-746, bnode pruning 56-60).

Spark note (SURVEY §2.8): a frame is a static-depth graph-pattern
query; the DataFrame operator expresses it as self-joins on the
triples table. This kernel is the per-document / assembled-JSON form.
"""

from __future__ import annotations

from .nodemap import IdentifierIssuer, create_node_map, merge_node_map_graphs
from .types import is_list, is_subject_reference, is_value


class _FrameState:
    def __init__(self, options, graph_map):
        self.options = options
        self.graph_map = graph_map
        self.graph = "@default"
        self.graph_stack = []
        self.subject_stack = []
        self.link = {}
        self.bnode_map = {}
        self.embedded = False
        self.parent = None
        self.uniq = 0


def _flags(frame: dict, options: dict) -> dict:
    def get(name, default):
        v = frame.get(f"@{name}")
        if isinstance(v, list):
            v = v[0] if v else None
        if isinstance(v, dict) and "@value" in v:
            v = v["@value"]
        return default if v is None else v
    return {
        "embed": get("embed", options.get("embed", "@once")),
        "explicit": get("explicit", options.get("explicit", False)),
        "requireAll": get("requireAll", options.get("requireAll", False)),
        "omitDefault": get("omitDefault", options.get("omitDefault", False)),
    }


def _node_values(subject: dict, prop: str) -> list:
    v = subject.get(prop, [])
    return v if isinstance(v, list) else [v]


def _value_match(pattern: dict, value: dict) -> bool:
    """@value pattern match (lib/frame.js:794-826)."""
    v1, t1, l1 = value.get("@value"), value.get("@type"), value.get("@language")
    v2 = pattern.get("@value")
    t2 = pattern.get("@type")
    l2 = pattern.get("@language")
    if v2 is None and t2 is None and l2 is None:
        return True
    def norm(x):
        return x if isinstance(x, list) else ([] if x is None else [x])
    v2, t2, l2 = norm(v2), norm(t2), norm(l2)
    if not v2 and not t2 and not l2:
        return True
    if v2 and not (v1 in v2 or v2 == [{}]):
        return False
    if not v2 and "@value" in pattern and pattern["@value"] == []:
        return False
    if t2 and not (t1 in t2 or t2 == [{}]):
        return False
    if "@type" in pattern and pattern["@type"] == [] and t1 is not None:
        return False
    l1n = l1.lower() if isinstance(l1, str) else l1
    l2n = [x.lower() if isinstance(x, str) else x for x in l2]
    if l2 and not (l1n in l2n or l2 == [{}]):
        return False
    if "@language" in pattern and pattern["@language"] == [] and l1 is not None:
        return False
    return True


def _node_match(state, pattern: dict, value) -> bool:
    if not isinstance(value, dict) or "@id" not in value:
        return False
    node = state.graph_map.get(state.graph, {}).get(value["@id"])
    return node is not None and _filter_subject(state, node, pattern,
                                                _flags(pattern, state.options))


def _filter_subject(state, subject: dict, frame: dict, flags: dict) -> bool:
    """Duck-typed subject match (lib/frame.js:519-637)."""
    matches_some = False
    wildcard = True
    for key in frame:
        v = frame[key]
        is_empty = isinstance(v, list) and len(v) == 0
        if key.startswith("@") and key not in ("@id", "@type"):
            continue
        wildcard = False
        if key == "@id":
            ids = v if isinstance(v, list) else [v]
            if ids and not (ids == [{}] or any(isinstance(i, dict) for i in ids)):
                if subject.get("@id") not in ids:
                    return False
            matches_some = True
            continue
        if key == "@type":
            stypes = _node_values(subject, "@type")
            tv = v if isinstance(v, list) else [v]
            if is_empty:
                if stypes:
                    return False
                matches_some = True
            elif tv == [{}]:
                if not stypes:
                    return False
                matches_some = True
            elif tv and all(isinstance(t, dict) and "@default" in t for t in tv):
                matches_some = True
            else:
                if not any(t in tv for t in stypes):
                    return False
                matches_some = True
            continue
        # property match
        sv = _node_values(subject, key)
        frame_vals = v if isinstance(v, list) else [v]
        pattern = frame_vals[0] if frame_vals else {}
        has_default = isinstance(pattern, dict) and "@default" in pattern
        if not sv:
            if has_default:
                matches_some = True
                continue
            if is_empty:
                matches_some = True
                continue
            if flags["requireAll"]:
                return False
            continue
        if is_empty:
            return False  # match-none but present
        if isinstance(pattern, dict) and not pattern:
            matches_some = True  # wildcard: property present
            continue
        matched_prop = False
        for item in sv:
            for p in frame_vals:
                if not isinstance(p, dict):
                    matched_prop = matched_prop or item == p
                elif is_value(item):
                    matched_prop = matched_prop or _value_match(p, item)
                elif is_list(item):
                    ilist = item["@list"]
                    plist = p.get("@list") if isinstance(p, dict) else None
                    if plist:
                        pp = plist[0]
                        if ilist and isinstance(pp, dict):
                            if is_value(ilist[0]):
                                matched_prop = matched_prop or any(
                                    _value_match(pp, li) for li in ilist)
                            else:
                                matched_prop = matched_prop or any(
                                    _node_match(state, pp, li) for li in ilist)
                else:
                    matched_prop = matched_prop or _node_match(state, p, item)
            if matched_prop:
                break
        if matched_prop:
            matches_some = True
        elif flags["requireAll"]:
            return False
    return wildcard or matches_some


def _filter_subjects(state, subjects: list[str], frame: dict, flags: dict) -> dict:
    rval = {}
    for sid in subjects:
        subject = state.graph_map[state.graph].get(sid)
        if subject is not None and _filter_subject(state, subject, frame, flags):
            rval[sid] = subject
    return rval


def _embed_allowed(state, subject: dict, flags) -> bool:
    embed = flags["embed"]
    sid = subject["@id"]
    if embed == "@never":
        return False
    if embed == "@always":
        return True
    # @once: embed at the first encounter only
    if sid in state.uniq_embeds:
        return False
    state.uniq_embeds.add(sid)
    return True


def frame(expanded_input, expanded_frame, options: dict | None = None) -> list:
    """Framing Algorithm entry: expanded input + expanded frame -> framed
    (still-expanded) output; callers compact afterwards."""
    options = dict(options or {})
    options.setdefault("embed", "@once")
    issuer = IdentifierIssuer("_:b")
    graphs = create_node_map(expanded_input, issuer=issuer)
    if options.get("merged", True):
        graphs = {"@default": merge_node_map_graphs(graphs), "@merged": {}}
    state = _FrameState(options, graphs)
    state.uniq_embeds = set()

    frames = expanded_frame if isinstance(expanded_frame, list) else [expanded_frame]
    the_frame = frames[0] if frames else {}
    flags = _flags(the_frame if isinstance(the_frame, dict) else {}, options)

    results: list = []
    subjects = sorted(state.graph_map["@default"].keys())
    matches = _filter_subjects(state, subjects,
                               the_frame if isinstance(the_frame, dict) else {}, flags)
    for sid in sorted(matches.keys()):
        out = _embed_subject(state, matches[sid],
                             the_frame if isinstance(the_frame, dict) else {},
                             flags, set())
        if out is not None:
            results.append(out)
    if options.get("pruneBlankNodeIdentifiers", True):
        results = _prune_bnodes(results)
    if options.get("omitGraph", True) is False:
        pass
    return results


def _embed_subject(state, subject: dict, frm: dict, flags, path: frozenset | set):
    sid = subject["@id"]
    if sid in path:
        return {"@id": sid}  # circular reference -> reference only
    if not _embed_allowed(state, subject, flags):
        return {"@id": sid}
    path = set(path) | {sid}

    output: dict = {"@id": sid}
    explicit = flags["explicit"]
    for prop in sorted(subject.keys()):
        if prop == "@id":
            continue
        if prop == "@type":
            output["@type"] = list(subject["@type"])
            continue
        if prop.startswith("@"):
            output[prop] = subject[prop]
            continue
        if explicit and prop not in frm:
            continue
        sub_frame_vals = frm.get(prop)
        sub_frame = None
        if isinstance(sub_frame_vals, list) and sub_frame_vals \
                and isinstance(sub_frame_vals[0], dict):
            sub_frame = sub_frame_vals[0]
        elif isinstance(sub_frame_vals, dict):
            sub_frame = sub_frame_vals
        sub_flags = _flags(sub_frame, state.options) if sub_frame else flags

        vals = []
        for item in _node_values(subject, prop):
            if is_list(item):
                inner = []
                for li in item["@list"]:
                    if is_subject_reference(li) and li["@id"] in state.graph_map[state.graph]:
                        node = state.graph_map[state.graph][li["@id"]]
                        lf = (sub_frame or {}).get("@list", [{}])
                        lf0 = lf[0] if isinstance(lf, list) and lf else {}
                        inner.append(_embed_subject(
                            state, node, lf0 if isinstance(lf0, dict) else {},
                            sub_flags, path))
                    else:
                        inner.append(li)
                vals.append({"@list": inner})
            elif is_subject_reference(item) and item["@id"] in state.graph_map[state.graph]:
                node = state.graph_map[state.graph][item["@id"]]
                if sub_frame is not None and not _filter_subject(
                        state, node, sub_frame, sub_flags):
                    continue
                vals.append(_embed_subject(state, node,
                                           sub_frame or {}, sub_flags, path))
            else:
                vals.append(item)
        if vals or not explicit:
            output[prop] = vals

    # defaults for frame-only properties
    for prop in sorted(frm.keys()):
        if prop.startswith("@") or prop in output:
            continue
        pf = frm[prop]
        pf0 = pf[0] if isinstance(pf, list) and pf else pf
        if isinstance(pf0, dict):
            p_flags = _flags(pf0, state.options)
            if p_flags["omitDefault"]:
                continue
            default = pf0.get("@default", "@null")
            if isinstance(default, list) and default:
                default = default[0]
            output[prop] = [{"@preserve": [default]}]
    return output


def _prune_bnodes(element):
    """Remove @id for blank nodes referenced only once (framing spec)."""
    counts: dict[str, int] = {}

    def count(el):
        if isinstance(el, list):
            for x in el:
                count(x)
        elif isinstance(el, dict):
            i = el.get("@id")
            if isinstance(i, str) and i.startswith("_:"):
                counts[i] = counts.get(i, 0) + 1
            for k, v in el.items():
                if k != "@id":
                    count(v)

    def prune(el):
        if isinstance(el, list):
            return [prune(x) for x in el]
        if isinstance(el, dict):
            out = {}
            for k, v in el.items():
                if k == "@id" and isinstance(v, str) and v.startswith("_:") \
                        and counts.get(v, 0) <= 1:
                    continue
                out[k] = prune(v)
            return out
        return el

    count(element)
    return prune(element)


def cleanup_preserve(element):
    """Replace @preserve wrappers with their content (lib/frame.js:694-746)."""
    if isinstance(element, list):
        return [cleanup_preserve(x) for x in element]
    if isinstance(element, dict):
        if "@preserve" in element:
            inner = element["@preserve"]
            inner = inner[0] if isinstance(inner, list) and len(inner) == 1 else inner
            return cleanup_preserve(inner)
        return {k: cleanup_preserve(v) for k, v in element.items()}
    return element


def cleanup_null(element):
    """Drop '@null' placeholders after compaction (lib/frame.js:333)."""
    if isinstance(element, list):
        out = [cleanup_null(x) for x in element]
        return [x for x in out if x is not None]
    if isinstance(element, dict):
        return {k: cleanup_null(v) for k, v in element.items()}
    if element == "@null":
        return None
    return element
