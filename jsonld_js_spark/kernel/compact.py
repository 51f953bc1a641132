"""Compaction: expanded JSON-LD -> compacted form under a context.

W3C JSON-LD 1.1 API §4.2 (Inverse Context Creation), §5.3 (Compaction),
§5.4 (IRI Compaction), §5.5 (Value Compaction). Parity:
/root/reference/lib/compact.js (term selection 1085-1145, fast CURIE
map 874-906, value compaction 954-1071, container re-assembly 536-632).

Spark usage: per-document Arrow UDF over flattened/framed JSON; the
inverse context is built once per context on the driver and broadcast
with it (SURVEY §2.7).
"""

from __future__ import annotations

from .constants import is_keyword
from .context import expand_iri, process_context
from .errors import JsonLdError, syntax_error
from .iri import prepend_base, remove_base
from .types import (
    is_graph,
    is_list,
    is_scalar,
    is_simple_graph,
    is_subject,
    is_subject_reference,
    is_value,
)


# ------------------------------------------------------- inverse context

def _shortest_least(term: str):
    return (len(term), term)


def create_inverse_context(active_ctx: dict) -> dict:
    """Inverse Context Creation (lib/context.js:1238-1398):
    ``inverse[iri][container]['@language'|'@type'|'@any'][key] = term``
    with container = sorted @container values joined, terms considered
    shortest-first then lexicographically least."""
    if active_ctx.get("_inverse") is not None:
        return active_ctx["_inverse"]
    inverse: dict = {}
    default_language = (active_ctx.get("@language") or "@none").lower()
    default_direction = active_ctx.get("@direction")

    for term in sorted(active_ctx["mappings"].keys(), key=_shortest_least):
        mapping = active_ctx["mappings"][term]
        if mapping is None or mapping.get("@id") is None:
            continue
        # [] stays [] (JS `[] || '@none'` keeps the truthy empty array,
        # lib/context.js:1267-1268): an explicit empty/null @container
        # keys the term under '' — selectable by nothing
        _cl = mapping.get("@container")
        container = "".join(sorted(_cl)) if _cl is not None else "@none"
        iri = mapping["@id"]
        entry = inverse.setdefault(iri, {}).setdefault(
            container, {"@language": {}, "@type": {}, "@any": {}})
        entry["@any"].setdefault("@none", term)
        if mapping.get("reverse"):
            entry["@type"].setdefault("@reverse", term)
        elif mapping.get("@type") == "@none":
            entry["@any"].setdefault("@none", term)
            entry["@language"].setdefault("@none", term)
            entry["@type"].setdefault("@none", term)
        elif "@type" in mapping:
            entry["@type"].setdefault(mapping["@type"], term)
        elif mapping.get("_has_language") and mapping.get("_has_direction"):
            lang, direction = mapping.get("@language"), mapping.get("@direction")
            if lang and direction:
                entry["@language"].setdefault(f"{lang}_{direction}".lower(), term)
            elif lang:
                entry["@language"].setdefault(lang.lower(), term)
            elif direction:
                entry["@language"].setdefault(f"_{direction}", term)
            else:
                entry["@language"].setdefault("@null", term)
        elif mapping.get("_has_language"):
            entry["@language"].setdefault(
                (mapping.get("@language") or "@null").lower(), term)
        elif mapping.get("_has_direction"):
            if mapping.get("@direction"):
                entry["@language"].setdefault(f"_{mapping['@direction']}", term)
            else:
                entry["@language"].setdefault("@none", term)
        elif default_direction:
            entry["@language"].setdefault(f"_{default_direction}", term)
            entry["@language"].setdefault("@none", term)
            entry["@type"].setdefault("@none", term)
        else:
            entry["@language"].setdefault(default_language, term)
            entry["@language"].setdefault("@none", term)
            entry["@type"].setdefault("@none", term)
    active_ctx["_inverse"] = inverse
    return inverse


def _array_trie_partial_match(active_ctx, arr) -> bool:
    """Simulate the reference's fastCurieMap partial-match walk with an
    ARRAY in iri position (lib/compact.js:874-884). The trie is built
    from the FIRST-SEEN @id of every colon-free, non-keyword term in
    shortest-least term order (lib/context.js:1258-1298; note the
    `_prefix` flag is checked only LATER, in the curie loop — so
    non-prefix colon-free terms still populate the trie). Walk keys
    are single JS chars, so only a run of single-char elements
    descends; a node with a terminal ('' key, iri length == depth)
    pushes a partial match, and the reference's curie construction
    then calls Array.substr — a TypeError — before the `_prefix`
    check can reject it. The walk stops at `len(arr) - 1` steps
    (maxPartialLength). Exotic element values that would index the
    terminal LIST itself (JS '' / '0' / 'iri' keys) are not modeled —
    they require an element that is not a plausible @type string and
    lead the reference into its own `in`-on-primitive TypeErrors."""
    # memoized on the active context like _inverse (cleared by every
    # ctx clone): the candidate list is a pure function of the final
    # mappings, and rebuilding the shortest-least sort per array-iri
    # call made repeated compactions under one context O(terms log
    # terms) each (ADVICE r5)
    candidates = active_ctx.get("_atrie_candidates")
    if candidates is None:
        candidates = []
        seen: set = set()
        for term in sorted(active_ctx["mappings"].keys(), key=_shortest_least):
            m = active_ctx["mappings"][term]
            if not m:
                continue
            mid = m.get("@id")
            if mid is None:
                continue
            for one in (mid if isinstance(mid, list) else [mid]):
                if not isinstance(one, str) or one in seen:
                    continue
                seen.add(one)
                if not is_keyword(one) and not term.find(":") > 0:
                    candidates.append(one)
        active_ctx["_atrie_candidates"] = candidates
    match = False
    for i in range(len(arr) - 1):
        e = arr[i]
        if not (isinstance(e, str) and len(e) == 1):
            break
        candidates = [c for c in candidates if len(c) > i and c[i] == e]
        if not candidates:
            break
        if any(len(c) == i + 1 for c in candidates):
            match = True
    return match


def _select_term(active_ctx, iri, value, containers, type_or_language,
                 type_or_language_value):
    """Term Selection (lib/compact.js:1085-1145)."""
    if type_or_language_value is None:
        type_or_language_value = "@null"
    prefs: list[str] = []
    if type_or_language_value in ("@id", "@reverse") and \
            isinstance(value, dict) and "@id" in value:
        if type_or_language_value == "@reverse":
            prefs.append("@reverse")
        term = compact_iri(active_ctx, value["@id"], vocab=True)
        m = active_ctx["mappings"].get(term)
        if m is not None and m.get("@id") == value["@id"]:
            prefs += ["@vocab", "@id"]
        else:
            prefs += ["@id", "@vocab"]
    else:
        prefs.append(type_or_language_value)
        lang_dir = next((p for p in prefs if "_" in p), None)
        if lang_dir:
            prefs.append("_" + lang_dir.split("_", 1)[1])
    prefs.append("@none")

    container_map = create_inverse_context(active_ctx).get(iri, {})
    for container in containers:
        if container not in container_map:
            continue
        tl_map = container_map[container][type_or_language]
        for pref in prefs:
            # JS property lookup coerces an ARRAY pref (a value object's
            # multi-element @type survives as an array — wave 8) to its
            # ","-joined string; the membership test above ("_" in p)
            # is ELEMENT membership on arrays in both languages
            if isinstance(pref, list):
                if not all(isinstance(x, str) for x in pref):
                    continue
                pref = ",".join(pref)
            if pref in tl_map:
                return tl_map[pref]
    return None


# ------------------------------------------------------- IRI compaction

import re as _re

_KEYWORD_SHAPE = _re.compile(r"^@[a-zA-Z]+$")


def compact_iri(active_ctx, iri, *, value=None, vocab: bool = False,
                reverse: bool = False, base: str | None = None) -> str:
    """IRI Compaction (lib/compact.js:668-952)."""
    if iri is None:
        return iri

    inverse = create_inverse_context(active_ctx)

    # keyword alias shortcut
    if is_keyword(iri):
        entry = inverse.get(iri, {})
        none_entry = entry.get("@none", {})
        alias = none_entry.get("@type", {}).get("@none")
        if alias is not None:
            return alias
        return iri

    sel_key = None
    if isinstance(iri, list):
        # array @type on a value object (type-index-map expansion
        # artifact, compactValue -> compactIri at lib/compact.js:1020):
        # the JS membership test `iri in inverseCtx` coerces the array
        # to its ","-joined string, so a coerced hit runs TERM
        # SELECTION (property lookups re-coerce); a selection MISS
        # falls through to the ARRAY branches below — NOT the string
        # fallbacks (verified via tests/ref_oracle)
        joined = (",".join(iri)
                  if all(isinstance(x, str) for x in iri) else None)
        if vocab and joined is not None and joined in inverse:
            sel_key = joined
    elif vocab and iri in inverse:
        sel_key = iri

    if sel_key is not None:
        default_language = (active_ctx.get("@language") or "@none").lower()
        containers: list[str] = []
        if isinstance(value, dict) and "@index" in value and "@graph" not in value:
            containers += ["@index", "@index@set"]
        if isinstance(value, dict) and "@preserve" in value:
            pv = value["@preserve"]
            value = pv[0] if isinstance(pv, list) and pv else pv

        if is_graph(value):
            if "@index" in value:
                containers += ["@graph@index", "@graph@index@set",
                               "@index", "@index@set"]
            if "@id" in value:
                containers += ["@graph@id", "@graph@id@set"]
            containers += ["@graph", "@graph@set", "@set"]
            if "@index" not in value:
                containers += ["@graph@index", "@graph@index@set",
                               "@index", "@index@set"]
            if "@id" not in value:
                containers += ["@graph@id", "@graph@id@set"]
        elif isinstance(value, dict) and not is_value(value):
            containers += ["@id", "@id@set", "@type", "@set@type"]

        type_or_language = "@language"
        tl_value = "@null"
        if reverse:
            type_or_language = "@type"
            tl_value = "@reverse"
            containers.append("@set")
        elif is_list(value):
            if "@index" not in value:
                containers.append("@list")
            lst = value["@list"]
            if len(lst) == 0:
                type_or_language, tl_value = "@any", "@none"
            else:
                common_language = None
                common_type = None
                for item in lst:
                    item_language, item_type = "@none", "@none"
                    if is_value(item):
                        if "@direction" in item:
                            item_language = (f"{(item.get('@language') or '').lower()}"
                                             f"_{item['@direction']}")
                        elif "@language" in item:
                            item_language = item["@language"].lower()
                        elif "@type" in item:
                            item_type = item["@type"]
                        else:
                            item_language = "@null"
                    else:
                        item_type = "@id"
                    if common_language is None:
                        common_language = item_language
                    elif item_language != common_language and is_value(item):
                        common_language = "@none"
                    if common_type is None:
                        common_type = item_type
                    elif item_type != common_type:
                        common_type = "@none"
                    if common_language == "@none" and common_type == "@none":
                        break
                common_language = common_language or "@none"
                common_type = common_type or "@none"
                if common_type != "@none":
                    type_or_language, tl_value = "@type", common_type
                else:
                    tl_value = common_language
        else:
            if is_value(value):
                if "@language" in value and "@index" not in value:
                    containers += ["@language", "@language@set"]
                    tl_value = value["@language"]
                    if value.get("@direction"):
                        tl_value = f"{tl_value}_{value['@direction']}"
                elif "@direction" in value and "@index" not in value:
                    tl_value = f"_{value['@direction']}"
                elif "@type" in value:
                    type_or_language, tl_value = "@type", value["@type"]
            else:
                type_or_language, tl_value = "@type", "@id"
            containers.append("@set")
        containers.append("@none")
        if isinstance(value, dict) and "@index" not in value:
            containers += ["@index", "@index@set"]
        if is_value(value) and len(value) == 1:
            containers += ["@language", "@language@set"]

        term = _select_term(active_ctx, sel_key, value, containers,
                            type_or_language, tl_value)
        if term is not None:
            return term
        _ = default_language

    if isinstance(iri, list):
        # post-selection branches are genuine JS STRING ops that the
        # array reaches unguarded (lib/compact.js:830-930):
        # - @vocab prefix test: Array.indexOf(vocab)===0 means the
        #   FIRST ELEMENT equals @vocab, then Array.substr throws
        # - the CURIE partial walk (lib/compact.js:876-884) indexes
        #   whole elements into the per-char fastCurieMap trie: a run
        #   of SINGLE-CHAR elements can walk to a partial match, and
        #   the curie construction then throws Array.substr
        # - the prefix-confusion loop calls Array.startsWith — a
        #   TypeError whenever ANY prefix-capable term is defined
        # - only a prefix-free context passes the array through
        if vocab and active_ctx.get("@vocab") is not None and iri \
                and iri[0] == active_ctx["@vocab"]:
            raise JsonLdError("iri.substr is not a function", "TypeError")
        if _array_trie_partial_match(active_ctx, iri):
            raise JsonLdError("iri.substr is not a function", "TypeError")
        if any(m and m.get("_prefix")
               for m in active_ctx["mappings"].values()):
            raise JsonLdError("iri.startsWith is not a function",
                              "TypeError")
        return iri

    # vocab-suffix fallback
    if vocab and active_ctx.get("@vocab") is not None:
        v = active_ctx["@vocab"]
        if iri.startswith(v) and iri != v:
            suffix = iri[len(v):]
            if suffix not in active_ctx["mappings"]:
                return suffix

    # CURIE candidates: shortest-least usable prefix expansion
    choice = None
    for term, m in active_ctx["mappings"].items():
        if not m or not m.get("_prefix"):
            continue
        mid = m.get("@id")
        if not mid or not iri.startswith(mid) or iri == mid:
            continue
        curie = term + ":" + iri[len(mid):]
        usable = (curie not in active_ctx["mappings"]
                  or (value is None
                      and (active_ctx["mappings"].get(curie) or {}).get("@id") == iri))
        if usable and (choice is None
                       or _shortest_least(curie) < _shortest_least(choice)):
            choice = curie
    if choice is not None:
        return choice

    # 'IRI confused with prefix' guard (lib/compact.js:915-922)
    for term, m in active_ctx["mappings"].items():
        if m and m.get("_prefix") and iri.startswith(term + ":"):
            raise syntax_error(
                f'Absolute IRI "{iri}" confused with prefix "{term}".',
                "IRI confused with prefix")

    if not vocab:
        b = active_ctx.get("@base")
        if b is None:
            return iri
        rel = remove_base(prepend_base(base, b) if base else b, iri)
        return f"./{rel}" if _KEYWORD_SHAPE.match(rel) else rel
    return iri


# ------------------------------------------------------- value compaction

_MISSING = object()


def _scoped_ctx(active_ctx, prop):
    """Term-scoped @context with NULL distinguished from ABSENT — the
    reference checks _isUndefined, so a null scoped context still
    processes (and resets the active context)."""
    if prop is None or not isinstance(prop, str):
        return _MISSING
    m = active_ctx["mappings"].get(prop)
    if m is None or "@context" not in m:
        return _MISSING
    return m["@context"]


def _ctx_value(active_ctx, prop, key):
    """getContextValue semantics (lib/context.js getContextValue):
    term-level value if the term defines it, else the context default
    for @language/@direction, else None."""
    if prop is not None:
        m = active_ctx["mappings"].get(prop)
        if m is not None:
            if key == "@language" and m.get("_has_language"):
                return m.get("@language")
            if key == "@direction" and m.get("_has_direction"):
                return m.get("@direction")
            if key in ("@type", "@context", "@index", "@nest") and key in m:
                return m.get(key)
            if key == "@container":
                return m.get("@container")
    if key == "@language":
        return active_ctx.get("@language")
    if key == "@direction":
        return active_ctx.get("@direction")
    return None


def _add_value(obj, key, value, *, property_is_array=False,
               value_is_array=False, allow_duplicate=True):
    """util.addValue parity (lib/util.js:246-298): arrays flatten
    element-wise unless value_is_array."""
    if value_is_array:
        obj[key] = value
        return
    if isinstance(value, list):
        if len(value) == 0 and property_is_array and key not in obj:
            obj[key] = []
        for v in value:
            _add_value(obj, key, v, property_is_array=property_is_array,
                       allow_duplicate=allow_duplicate)
        return
    if key in obj:
        has = (not allow_duplicate) and any(
            x == value for x in (obj[key] if isinstance(obj[key], list)
                                 else [obj[key]]))
        if not isinstance(obj[key], list) and (not has or property_is_array):
            obj[key] = [obj[key]]
        if not has:
            obj[key].append(value)
    else:
        obj[key] = [value] if property_is_array else value


def compact_value(active_ctx, active_property, value, options):
    """Value Compaction (lib/compact.js:954-1071)."""
    if is_value(value):
        t = _ctx_value(active_ctx, active_property, "@type")
        language = _ctx_value(active_ctx, active_property, "@language")
        direction = _ctx_value(active_ctx, active_property, "@direction")
        container = _ctx_value(active_ctx, active_property, "@container") or []

        preserve_index = "@index" in value and "@index" not in container

        if not preserve_index and t != "@none":
            if value.get("@type") == t and "@type" in value:
                return value["@value"]
            # NOTE reference quirk (lib/compact.js:973-981): a matching
            # @language alone (or @direction alone) compacts to a plain
            # string even when the OTHER of the two does not match the
            # context default — the mismatching component is silently
            # dropped. Replicated exactly.
            if ("@language" in value and value["@language"] == language
                    and "@direction" in value and value.get("@direction") == direction):
                return value["@value"]
            if "@language" in value and value["@language"] == language:
                return value["@value"]
            if "@direction" in value and value.get("@direction") == direction:
                return value["@value"]

        key_count = len(value)
        is_value_only = key_count == 1 or (
            key_count == 2 and "@index" in value and not preserve_index)
        has_default_language = active_ctx.get("@language") is not None
        is_value_string = isinstance(value["@value"], str)
        m = active_ctx["mappings"].get(active_property)
        has_null_mapping = m is not None and m.get("_has_language") \
            and m.get("@language") is None
        if is_value_only and t != "@none" and (
                not has_default_language or not is_value_string or has_null_mapping):
            return value["@value"]

        rval = {}
        if preserve_index:
            rval[compact_iri(active_ctx, "@index", vocab=True)] = value["@index"]
        if "@type" in value:
            rval[compact_iri(active_ctx, "@type", vocab=True)] = \
                compact_iri(active_ctx, value["@type"], vocab=True)
        elif "@language" in value:
            rval[compact_iri(active_ctx, "@language", vocab=True)] = value["@language"]
        if "@direction" in value:
            rval[compact_iri(active_ctx, "@direction", vocab=True)] = value["@direction"]
        rval[compact_iri(active_ctx, "@value", vocab=True)] = value["@value"]
        return rval

    # subject reference
    expanded_property = expand_iri(active_ctx, active_property, vocab=True) \
        if active_property else None
    t = _ctx_value(active_ctx, active_property, "@type")
    compacted = compact_iri(active_ctx, value["@id"], vocab=(t == "@vocab"),
                            base=options.get("base"))
    if t in ("@id", "@vocab") or expanded_property == "@graph":
        return compacted
    return {compact_iri(active_ctx, "@id", vocab=True): compacted}


# ------------------------------------------------------- compaction proper

def compact(active_ctx, element, options: dict | None = None, *,
            active_property: str | None = None):
    """Compaction Algorithm (lib/compact.js:56-651)."""
    options = options or {}
    compact_arrays = options.get("compactArrays", True)

    if isinstance(element, list):
        rval = []
        for item in element:
            c = compact(active_ctx, item, options, active_property=active_property)
            if c is None:
                continue
            rval.append(c)
        if compact_arrays and len(rval) == 1:
            if not (_ctx_value(active_ctx, active_property, "@container") or []):
                return rval[0]
        return rval

    # property-scoped context applies before anything else; a NULL
    # scoped context is DEFINED and resets (the reference's
    # _isUndefined distinction, lib/compact.js:86-101)
    prop_scoped = _scoped_ctx(active_ctx, active_property)
    if prop_scoped is not _MISSING:
        active_ctx = process_context(active_ctx, prop_scoped, options,
                                     override_protected=True)

    if not isinstance(element, dict):
        return element

    # in-memory linked nodes (@embed:@link framing): reuse the already-
    # compacted object for the IDENTICAL expanded element so shared /
    # cyclic nodes stay shared and compaction terminates
    # (lib/compact.js:105-114)
    if options.get("link") is not None and "@id" in element and \
            element["@id"] in options["link"]:
        for pair in options["link"][element["@id"]]:
            if pair["expanded"] is element:
                return pair["compacted"]

    if is_value(element) or is_subject_reference(element):
        rval = compact_value(active_ctx, active_property, element, options)
        if options.get("link") is not None and is_subject_reference(element):
            # store linked element (lib/compact.js:120-126)
            options["link"].setdefault(element["@id"], []).append(
                {"expanded": element, "compacted": rval})
        return rval

    if is_list(element):
        container = _ctx_value(active_ctx, active_property, "@container") or []
        if "@list" in container:
            return compact(active_ctx, element["@list"], options,
                           active_property=active_property)

    inside_reverse = active_property == "@reverse"
    rval: dict = {}
    if options.get("link") is not None and "@id" in element:
        # register BEFORE recursing into properties so circular @link
        # references resolve to this (still-filling) object
        # (lib/compact.js:172-178)
        options["link"].setdefault(element["@id"], []).append(
            {"expanded": element, "compacted": rval})
    input_ctx = active_ctx

    # revert non-propagated context for node objects (lib/compact.js:153-156)
    from .context import revert_to_previous
    active_ctx = revert_to_previous(active_ctx)
    # re-apply property-scoped context after the revert (null resets)
    prop_scoped = _scoped_ctx(input_ctx, active_property)
    if prop_scoped is not _MISSING:
        active_ctx = process_context(active_ctx, prop_scoped, options,
                                     override_protected=True)

    # type-scoped contexts in compacted-type sort order (lib/compact.js:182-205)
    types = element.get("@type", [])
    types = types if isinstance(types, list) else [types]
    if len(types) > 1:
        types = sorted(types)
    type_context = active_ctx
    for t in types:
        if not isinstance(t, str):
            continue
        compacted_type = compact_iri(type_context, t, vocab=True)
        ctx = _scoped_ctx(input_ctx, compacted_type)
        if ctx is not _MISSING:
            active_ctx = process_context(active_ctx, ctx, options,
                                         propagate=False)

    for expanded_property in sorted(element.keys()):
        expanded_value = element[expanded_property]

        if expanded_property == "@id":
            vals = expanded_value if isinstance(expanded_value, list) \
                else [expanded_value]
            compacted = [compact_iri(active_ctx, v, base=options.get("base"))
                         for v in vals]
            if len(compacted) == 1:
                compacted = compacted[0]
            rval[compact_iri(active_ctx, "@id", vocab=True)] = compacted
            continue

        if expanded_property == "@type":
            vals = expanded_value if isinstance(expanded_value, list) \
                else [expanded_value]
            # resolve types against the context BEFORE type-scoping
            compacted = [compact_iri(input_ctx, v, vocab=True) for v in vals]
            if len(compacted) == 1:
                compacted = compacted[0]
            alias = compact_iri(active_ctx, "@type", vocab=True)
            container = _ctx_value(active_ctx, alias, "@container") or []
            type_as_set = "@set" in container and \
                active_ctx.get("processingMode") != "json-ld-1.0"
            is_arr = type_as_set or (
                isinstance(compacted, list) and len(vals) == 0)
            _add_value(rval, alias, compacted, property_is_array=is_arr)
            continue

        if expanded_property == "@reverse":
            compacted = compact(active_ctx, expanded_value, options,
                                active_property="@reverse")
            for prop in list(compacted.keys()):
                m = active_ctx["mappings"].get(prop)
                if m and m.get("reverse"):
                    container = m.get("@container") or []
                    use_array = "@set" in container or not compact_arrays
                    _add_value(rval, prop, compacted.pop(prop),
                               property_is_array=use_array)
            if compacted:
                _add_value(rval, compact_iri(active_ctx, "@reverse", vocab=True),
                           compacted)
            continue

        if expanded_property == "@preserve":
            compacted = compact(active_ctx, expanded_value, options,
                                active_property=active_property)
            if not (isinstance(compacted, list) and len(compacted) == 0):
                _add_value(rval, "@preserve", compacted)
            continue

        if expanded_property == "@index":
            container = _ctx_value(active_ctx, active_property, "@container") or []
            if "@index" in container:
                continue
            _add_value(rval, compact_iri(active_ctx, "@index", vocab=True),
                       expanded_value)
            continue

        if expanded_property not in ("@graph", "@list", "@included") and \
                is_keyword(expanded_property):
            _add_value(rval, compact_iri(active_ctx, expanded_property, vocab=True),
                       expanded_value)
            continue

        if not isinstance(expanded_value, list):
            raise syntax_error("expanded value must be an array.",
                               "invalid expanded value")

        if len(expanded_value) == 0:
            item_active_property = compact_iri(
                active_ctx, expanded_property, value=expanded_value,
                vocab=True, reverse=inside_reverse)
            nest_result = _nest_target(active_ctx, rval,
                                       (active_ctx["mappings"].get(item_active_property)
                                        or {}).get("@nest"))
            _add_value(nest_result, item_active_property, expanded_value,
                       property_is_array=True)

        for expanded_item in expanded_value:
            item_active_property = compact_iri(
                active_ctx, expanded_property, value=expanded_item,
                vocab=True, reverse=inside_reverse)
            nest_result = _nest_target(active_ctx, rval,
                                       (active_ctx["mappings"].get(item_active_property)
                                        or {}).get("@nest"))
            container = _ctx_value(active_ctx, item_active_property,
                                   "@container") or []

            item_is_graph = is_graph(expanded_item)
            item_is_list = is_list(expanded_item)
            if item_is_list:
                inner = expanded_item["@list"]
            elif item_is_graph:
                inner = expanded_item["@graph"]
            else:
                inner = expanded_item
            compacted_item = compact(active_ctx, inner, options,
                                     active_property=item_active_property)

            if item_is_list:
                if not isinstance(compacted_item, list):
                    compacted_item = [compacted_item]
                if "@list" not in container:
                    wrapped = {compact_iri(active_ctx, "@list", vocab=True):
                               compacted_item}
                    if "@index" in expanded_item:
                        wrapped[compact_iri(active_ctx, "@index", vocab=True)] = \
                            expanded_item["@index"]
                    compacted_item = wrapped
                else:
                    _add_value(nest_result, item_active_property, compacted_item,
                               value_is_array=True, allow_duplicate=True)
                    continue

            if item_is_graph:
                if "@graph" in container and (
                        "@id" in container or
                        ("@index" in container and is_simple_graph(expanded_item))):
                    map_object = nest_result.setdefault(item_active_property, {})
                    key = (expanded_item.get("@id") if "@id" in container
                           else expanded_item.get("@index")) or \
                        compact_iri(active_ctx, "@none", vocab=True)
                    _add_value(map_object, key, compacted_item,
                               property_is_array=(not compact_arrays
                                                  or "@set" in container))
                elif "@graph" in container and is_simple_graph(expanded_item):
                    if isinstance(compacted_item, list) and len(compacted_item) > 1:
                        compacted_item = {"@included": compacted_item}
                    _add_value(nest_result, item_active_property, compacted_item,
                               property_is_array=(not compact_arrays
                                                  or "@set" in container))
                else:
                    if isinstance(compacted_item, list) and \
                            len(compacted_item) == 1 and compact_arrays:
                        compacted_item = compacted_item[0]
                    wrapped = {compact_iri(active_ctx, "@graph", vocab=True):
                               compacted_item}
                    if "@id" in expanded_item:
                        wrapped[compact_iri(active_ctx, "@id", vocab=True)] = \
                            compact_iri(active_ctx, expanded_item["@id"],
                                        base=options.get("base"))
                    if "@index" in expanded_item:
                        wrapped[compact_iri(active_ctx, "@index", vocab=True)] = \
                            expanded_item["@index"]
                    _add_value(nest_result, item_active_property, wrapped,
                               property_is_array=(not compact_arrays
                                                  or "@set" in container))
                continue

            if any(c in container for c in ("@language", "@index", "@id", "@type")):
                map_object = nest_result.setdefault(item_active_property, {})
                key = None
                if "@language" in container:
                    if is_value(compacted_item):
                        compacted_item = compacted_item["@value"]
                    key = expanded_item.get("@language")
                elif "@index" in container:
                    index_key = _ctx_value(active_ctx, item_active_property,
                                           "@index") or "@index"
                    container_key = compact_iri(active_ctx, index_key, vocab=True) \
                        if index_key != "@index" else \
                        compact_iri(active_ctx, "@index", vocab=True)
                    if index_key == "@index":
                        key = expanded_item.get("@index")
                        if isinstance(compacted_item, dict):
                            compacted_item.pop(container_key, None)
                    else:
                        # reference quirk: looks up the RAW index key in the
                        # compacted item (lib/compact.js:558-584)
                        kv = compacted_item.get(index_key) \
                            if isinstance(compacted_item, dict) else None
                        kvs = kv if isinstance(kv, list) else \
                            ([] if kv is None else [kv])
                        key = kvs[0] if kvs else None
                        others = kvs[1:]
                        if not isinstance(key, str):
                            key = None
                        elif isinstance(compacted_item, dict):
                            if len(others) == 0:
                                compacted_item.pop(index_key, None)
                            elif len(others) == 1:
                                compacted_item[index_key] = others[0]
                            else:
                                compacted_item[index_key] = others
                elif "@id" in container:
                    id_key = compact_iri(active_ctx, "@id", vocab=True)
                    if isinstance(compacted_item, dict):
                        key = compacted_item.pop(id_key, None)
                elif "@type" in container:
                    type_key = compact_iri(active_ctx, "@type", vocab=True)
                    tv = compacted_item.get(type_key) \
                        if isinstance(compacted_item, dict) else None
                    tvs = tv if isinstance(tv, list) else \
                        ([] if tv is None else [tv])
                    key = tvs[0] if tvs else None
                    types_rest = tvs[1:]
                    if isinstance(compacted_item, dict):
                        if len(types_rest) == 0:
                            compacted_item.pop(type_key, None)
                        elif len(types_rest) == 1:
                            compacted_item[type_key] = types_rest[0]
                        else:
                            compacted_item[type_key] = types_rest
                        if len(compacted_item) == 1 and "@id" in expanded_item:
                            compacted_item = compact(
                                active_ctx, {"@id": expanded_item["@id"]},
                                options, active_property=item_active_property)
                if not key:
                    key = compact_iri(active_ctx, "@none", vocab=True)
                _add_value(map_object, key, compacted_item,
                           property_is_array="@set" in container)
            else:
                is_arr = (not compact_arrays or "@set" in container
                          or "@list" in container
                          or (isinstance(compacted_item, list)
                              and len(compacted_item) == 0)
                          or expanded_property in ("@list", "@graph"))
                _add_value(nest_result, item_active_property, compacted_item,
                           property_is_array=is_arr)
    return rval


def _nest_target(active_ctx, rval, nest):
    if not nest:
        return rval
    if nest != "@nest" and expand_iri(active_ctx, nest, vocab=True) != "@nest":
        raise syntax_error("@nest term must expand to @nest.", "invalid @nest value")
    if not isinstance(rval.get(nest), dict):
        rval[nest] = {}
    return rval[nest]
