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
from .errors import syntax_error
from .iri import remove_base
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

def create_inverse_context(active_ctx: dict) -> dict:
    """container -> type/language -> value -> term, per IRI.

    Structure: ``inverse[iri][container]['@type'|'@language'|'@any'][key] = term``.
    Terms are considered shortest-first then lexicographically
    (lib/context.js:1238-1398).
    """
    if "_inverse" in active_ctx and active_ctx["_inverse"] is not None:
        return active_ctx["_inverse"]
    inverse: dict = {}
    default_lang = (active_ctx.get("@language") or "@none")
    default_dir = active_ctx.get("@direction")
    # sort terms shortest-first, then lexicographically least
    for term in sorted(active_ctx["mappings"].keys(), key=lambda t: (len(t), t)):
        mapping = active_ctx["mappings"][term]
        if mapping is None or mapping.get("@id") is None:
            continue
        container = "".join(mapping.get("@container", ["@none"]))
        iri = mapping["@id"]
        container_map = inverse.setdefault(iri, {})
        entry = container_map.setdefault(
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
            lang = mapping.get("@language")
            d = mapping.get("@direction")
            key = f"{lang}_{d}".lower() if lang and d else (f"_{d}" if d else (lang or "@null"))
            entry["@language"].setdefault(key, term)
        elif mapping.get("_has_language"):
            lang = mapping.get("@language")
            entry["@language"].setdefault((lang or "@null"), term)
        elif mapping.get("_has_direction"):
            d = mapping.get("@direction")
            entry["@language"].setdefault(f"_{d}" if d else "@none", term)
        elif default_dir:
            entry["@language"].setdefault(f"{default_lang}_{default_dir}".lower(), term)
            entry["@language"].setdefault("@none", term)
            entry["@type"].setdefault("@none", term)
        else:
            entry["@language"].setdefault(default_lang.lower(), term)
            entry["@language"].setdefault("@none", term)
            entry["@type"].setdefault("@none", term)
    active_ctx["_inverse"] = inverse
    return inverse


def _select_term(active_ctx, iri, value, containers, type_or_language, preferred):
    """Term Selection (lib/compact.js:1085-1145)."""
    inverse = create_inverse_context(active_ctx)
    container_map = inverse.get(iri)
    if not container_map:
        return None
    if "@any" not in preferred:
        preferred = preferred + ["@any"]
    for container in containers:
        entry = container_map.get(container)
        if entry is None:
            continue
        type_language_value_map = entry[type_or_language]
        for item in preferred:
            if item in type_language_value_map:
                return type_language_value_map[item]
        if "@none" in entry["@any"] and "@any" in preferred:
            pass
    # fall back to @any bucket
    for container in containers:
        entry = container_map.get(container)
        if entry is None:
            continue
        for item in preferred:
            if item in entry["@any"]:
                return entry["@any"][item]
    return None


# ------------------------------------------------------- IRI compaction

def compact_iri(active_ctx, iri, *, value=None, vocab: bool = False,
                reverse: bool = False, base: str | None = None) -> str:
    """IRI Compaction (spec §5.4; lib/compact.js:854-952)."""
    if iri is None:
        return iri
    if is_keyword(iri):
        return iri

    inverse = create_inverse_context(active_ctx) if vocab else None
    if vocab and iri in inverse:
        # build preferred values
        containers = []
        type_or_language = "@language"
        preferred = []
        if isinstance(value, dict) and "@index" in value and not is_graph(value):
            containers += ["@index", "@index@set"]
        if reverse:
            type_or_language = "@type"
            preferred.append("@reverse")
            containers.append("@set")
        elif is_list(value):
            if "@index" not in value:
                containers.append("@list")
            lst = value["@list"]
            common_type = common_lang = None if lst else "@none"
            for item in lst:
                item_lang, item_type = "@none", "@none"
                if is_value(item):
                    if "@direction" in item:
                        item_lang = f"{item.get('@language','')}_{item['@direction']}".lower()
                    elif "@language" in item:
                        item_lang = item["@language"].lower()
                    elif "@type" in item:
                        item_type = item["@type"]
                    else:
                        item_lang = "@null"
                else:
                    item_type = "@id"
                common_lang = item_lang if common_lang is None else (
                    common_lang if common_lang == item_lang else "@none")
                common_type = item_type if common_type is None else (
                    common_type if common_type == item_type else "@none")
                if common_lang == "@none" and common_type == "@none":
                    break
            common_lang = common_lang or "@none"
            common_type = common_type or "@none"
            if common_type != "@none":
                type_or_language = "@type"
                preferred.append(common_type)
            else:
                preferred.append(common_lang)
        elif is_value(value):
            if "@language" in value and "@index" not in value:
                containers += ["@language", "@language@set"]
                lang = value["@language"].lower()
                if "@direction" in value:
                    lang = f"{lang}_{value['@direction']}".lower()
                preferred.append(lang)
            elif "@direction" in value and "@index" not in value:
                preferred.append(f"_{value['@direction']}")
            elif "@type" in value:
                type_or_language = "@type"
                preferred.append(value["@type"])
            else:
                preferred.append("@null")
        else:
            type_or_language = "@type"
            preferred.append("@id")
            containers += ["@id", "@id@set", "@type", "@set@type"]
            if is_graph(value):
                containers = ["@graph", "@graph@set", "@graph@id", "@graph@id@set",
                              "@graph@index", "@graph@index@set"] + containers
        containers += ["@set"] if "@set" not in containers else []
        containers.append("@none")
        if isinstance(value, dict) and "@index" not in value:
            containers += ["@index", "@index@set"]
        if is_value(value) and len(value) == 1:
            containers += ["@language", "@language@set"]
        preferred.append("@none")
        term = _select_term(active_ctx, iri, value, containers, type_or_language, preferred)
        if term is not None:
            return term

    if vocab and active_ctx.get("@vocab"):
        v = active_ctx["@vocab"]
        if iri.startswith(v) and iri != v:
            suffix = iri[len(v):]
            if suffix not in active_ctx["mappings"]:
                return suffix

    # CURIE candidates: shortest eligible
    candidate = None
    for term, mapping in active_ctx["mappings"].items():
        if not mapping or not mapping.get("@id") or not mapping.get("_prefix"):
            continue
        mid = mapping["@id"]
        if iri.startswith(mid) and len(iri) > len(mid):
            curie = term + ":" + iri[len(mid):]
            is_usable = (curie not in active_ctx["mappings"]
                         or (value is None
                             and active_ctx["mappings"].get(curie, {}).get("@id") == iri))
            if is_usable and (candidate is None or (len(curie), curie) < (len(candidate), candidate)):
                candidate = curie
    if candidate is not None:
        return candidate

    # guard against 'IRI confused with prefix' (lib/compact.js:915-922)
    for term, mapping in active_ctx["mappings"].items():
        if mapping and mapping.get("_prefix") and mapping.get("@id") == iri:
            raise syntax_error(f"IRI confused with prefix: {iri}",
                               "IRI confused with prefix")

    if not vocab:
        return remove_base(base if base is not None else active_ctx.get("@base"), iri)
    return iri


# ------------------------------------------------------- value compaction

def compact_value(active_ctx, active_property, value, options):
    """Value Compaction (spec §5.5; lib/compact.js:954-1071)."""
    mapping = active_ctx["mappings"].get(active_property) or {}
    if is_value(value):
        t = mapping.get("@type")
        lang = mapping.get("@language") if mapping.get("_has_language") \
            else active_ctx.get("@language")
        direction = mapping.get("@direction") if mapping.get("_has_direction") \
            else active_ctx.get("@direction")

        n_members = len(value)
        preserve_index = "@index" in value and "@index" not in mapping.get("@container", [])
        if n_members > 2 or (n_members == 2 and not preserve_index):
            pass  # has extra members beyond @value (+preserved @index)
        if t == "@json" and value.get("@type") == "@json":
            return value["@value"]
        if "@id" in value:
            pass
        if not preserve_index and ("@index" in value):
            preserve_index = True
        extra = set(value) - {"@value", "@index"}
        only_indexable = not (set(value) - {"@value", "@index", "@language", "@type", "@direction"})
        if not only_indexable:
            return _compact_value_fallback(active_ctx, value, options)
        if "@index" in value and "@index" not in mapping.get("@container", []):
            return _compact_value_fallback(active_ctx, value, options)
        if value.get("@type") is not None and value.get("@type") == t:
            return value["@value"]
        if "@language" in value or "@direction" in value:
            v_lang = value.get("@language")
            v_dir = value.get("@direction")
            if v_lang == lang and v_dir == direction and isinstance(value["@value"], str):
                return value["@value"]
            return _compact_value_fallback(active_ctx, value, options)
        if "@type" in value:
            return _compact_value_fallback(active_ctx, value, options)
        # untyped, no language on value: emit raw if context has no default
        if isinstance(value["@value"], str) and (lang is not None or direction is not None):
            return _compact_value_fallback(active_ctx, value, options)
        _ = extra
        return value["@value"]

    if is_subject_reference(value):
        t = mapping.get("@type")
        compacted = compact_iri(active_ctx, value["@id"],
                                vocab=(t == "@vocab"), base=options.get("base"))
        if t in ("@id", "@vocab"):
            return compacted
        return {compact_iri(active_ctx, "@id", vocab=True): compacted}
    return value


def _compact_value_fallback(active_ctx, value, options):
    out = {}
    for k in value:
        kk = compact_iri(active_ctx, k, vocab=True)
        v = value[k]
        if k == "@type":
            v = compact_iri(active_ctx, v, vocab=True)
        elif k == "@id":
            v = compact_iri(active_ctx, v, base=options.get("base"))
        out[kk] = v
    return out


# ------------------------------------------------------- compaction proper

def compact(active_ctx, element, options: dict | None = None, *,
            active_property: str | None = None, compaction_map=None):
    """Compaction Algorithm (spec §5.3; lib/compact.js:56-632)."""
    options = options or {}

    if isinstance(element, list):
        rval = [
            r for r in (compact(active_ctx, item, options,
                                active_property=active_property)
                        for item in element)
            if r is not None
        ]
        if options.get("compactArrays", True) and len(rval) == 1:
            mapping = active_ctx["mappings"].get(active_property) or {}
            if not mapping.get("@container"):
                return rval[0]
        return rval

    if not isinstance(element, dict):
        return element

    # value objects / subject refs compact to scalars where possible
    if is_value(element) or is_subject_reference(element):
        rval = compact_value(active_ctx, active_property, element, options)
        if not isinstance(rval, (dict, list)):
            return rval
        element_was_value = True
        if is_value(element):
            return rval
        if not isinstance(rval, dict):
            return rval
        _ = element_was_value

    inside_reverse = active_property == "@reverse"
    mapping = active_ctx["mappings"].get(active_property) or {}

    # scoped context for the active property
    if mapping.get("@context") is not None:
        active_ctx = process_context(active_ctx, mapping["@context"], options,
                                     override_protected=True)

    # type-scoped contexts
    types = element.get("@type", [])
    types = types if isinstance(types, list) else [types]
    compacted_types = sorted(
        compact_iri(active_ctx, t, vocab=True) for t in types if isinstance(t, str))
    for ct in compacted_types:
        m = active_ctx["mappings"].get(ct)
        if m and m.get("@context") is not None:
            active_ctx = process_context(active_ctx, m["@context"], options,
                                         propagate=False)

    rval: dict = {}
    for expanded_property in sorted(element.keys()):
        expanded_value = element[expanded_property]

        if expanded_property in ("@id",):
            v = compact_iri(active_ctx, expanded_value, base=options.get("base"))
            alias = compact_iri(active_ctx, "@id", vocab=True)
            rval[alias] = v
            continue
        if expanded_property == "@type":
            tv = expanded_value if isinstance(expanded_value, list) else [expanded_value]
            compacted = [compact_iri(active_ctx, t, vocab=True) for t in tv]
            if len(compacted) == 1:
                compacted = compacted[0]
            alias = compact_iri(active_ctx, "@type", vocab=True)
            as_array = (not options.get("compactArrays", True)) or (
                "@set" in (active_ctx["mappings"].get(alias) or {}).get("@container", []))
            if as_array and not isinstance(compacted, list):
                compacted = [compacted]
            rval[alias] = compacted
            continue
        if expanded_property == "@reverse":
            compacted = compact(active_ctx, expanded_value, options,
                                active_property="@reverse")
            # move reverse-mapped terms up
            for prop in list(compacted.keys()):
                m = active_ctx["mappings"].get(prop)
                if m and m.get("reverse"):
                    value = compacted.pop(prop)
                    use_array = ("@set" in m.get("@container", [])
                                 or not options.get("compactArrays", True))
                    _append(rval, prop, value, use_array)
            if compacted:
                alias = compact_iri(active_ctx, "@reverse", vocab=True)
                rval[alias] = compacted
            continue
        if expanded_property == "@preserve":
            compacted = compact(active_ctx, expanded_value, options,
                                active_property=active_property)
            if not (isinstance(compacted, list) and not compacted):
                rval["@preserve"] = compacted
            continue
        if expanded_property == "@index":
            if "@index" in mapping.get("@container", []):
                continue
            alias = compact_iri(active_ctx, "@index", vocab=True)
            rval[alias] = expanded_value
            continue
        if expanded_property in ("@value", "@language", "@direction"):
            alias = compact_iri(active_ctx, expanded_property, vocab=True)
            rval[alias] = expanded_value
            continue
        if expanded_property == "@included":
            compacted = compact(active_ctx, expanded_value, options, active_property=None)
            alias = compact_iri(active_ctx, "@included", vocab=True)
            rval[alias] = compacted if isinstance(compacted, list) else [compacted]
            continue
        if expanded_property == "@graph" and active_property in (None, "@graph"):
            # top-level @graph
            compacted = compact(active_ctx, expanded_value, options, active_property=None)
            alias = compact_iri(active_ctx, "@graph", vocab=True)
            rval[alias] = compacted if isinstance(compacted, list) else [compacted]
            continue

        # empty-array property
        if isinstance(expanded_value, list) and not expanded_value:
            item_active_property = compact_iri(
                active_ctx, expanded_property, value=expanded_value,
                vocab=True, reverse=inside_reverse)
            nest = (active_ctx["mappings"].get(item_active_property) or {}).get("@nest")
            target = _nest_target(active_ctx, rval, nest)
            _append(target, item_active_property, [], True)
            continue

        for expanded_item in (expanded_value if isinstance(expanded_value, list)
                              else [expanded_value]):
            item_active_property = compact_iri(
                active_ctx, expanded_property, value=expanded_item,
                vocab=True, reverse=inside_reverse)
            item_mapping = active_ctx["mappings"].get(item_active_property) or {}
            nest = item_mapping.get("@nest")
            target = _nest_target(active_ctx, rval, nest)
            container = item_mapping.get("@container", [])

            is_graph_item = is_graph(expanded_item)
            inner = expanded_item
            if is_list(expanded_item):
                inner = expanded_item["@list"]
            elif is_graph_item:
                inner = expanded_item["@graph"]

            compacted_item = compact(
                active_ctx, inner, options, active_property=item_active_property)

            if is_list(expanded_item):
                if not isinstance(compacted_item, list):
                    compacted_item = [compacted_item]
                if "@list" not in container:
                    wrapped = {compact_iri(active_ctx, "@list", vocab=True): compacted_item}
                    if "@index" in expanded_item:
                        wrapped[compact_iri(active_ctx, "@index", vocab=True)] = \
                            expanded_item["@index"]
                    compacted_item = wrapped
                    _append(target, item_active_property, compacted_item, True)
                else:
                    target[item_active_property] = compacted_item
                continue

            if is_graph_item:
                compacted_item = _recompose_graph(
                    active_ctx, expanded_item, compacted_item, container,
                    item_active_property, options)
                if "@graph" in container and ("@id" in container or "@index" in container):
                    key = (expanded_item.get("@id") if "@id" in container
                           else expanded_item.get("@index")) or "@none"
                    if "@id" in container and "@id" in expanded_item:
                        key = compact_iri(active_ctx, expanded_item["@id"],
                                          base=options.get("base"))
                    m = target.setdefault(item_active_property, {})
                    _append(m, key, compacted_item, "@set" in container)
                    continue
                _append(target, item_active_property, compacted_item,
                        "@set" in container or not options.get("compactArrays", True))
                continue

            if any(c in container for c in ("@language", "@index", "@id", "@type")) \
                    and "@graph" not in container:
                m = target.setdefault(item_active_property, {})
                if "@language" in container:
                    key = expanded_item.get("@language", "@none")
                    if is_value(expanded_item):
                        compacted_item = expanded_item["@value"]
                elif "@index" in container:
                    index_key = item_mapping.get("@index", "@index")
                    if index_key == "@index":
                        key = expanded_item.get("@index", "@none")
                        if isinstance(compacted_item, dict):
                            compacted_item.pop(
                                compact_iri(active_ctx, "@index", vocab=True), None)
                            if len(compacted_item) == 1 and "@id" in expanded_item:
                                compacted_item = compact(
                                    active_ctx, {"@id": expanded_item["@id"]},
                                    options, active_property=item_active_property)
                    else:
                        # property-based index
                        prop_iri = expand_iri(active_ctx, index_key, vocab=True)
                        key = "@none"
                        if isinstance(compacted_item, dict):
                            ckey = compact_iri(active_ctx, prop_iri, vocab=True)
                            kv = compacted_item.get(ckey)
                            if isinstance(kv, list) and kv:
                                key = kv[0] if isinstance(kv[0], str) else "@none"
                                rest = kv[1:]
                                if rest:
                                    compacted_item[ckey] = rest if len(rest) > 1 else rest[0]
                                else:
                                    compacted_item.pop(ckey, None)
                            elif isinstance(kv, str):
                                key = kv
                                compacted_item.pop(ckey, None)
                elif "@id" in container:
                    idk = compact_iri(active_ctx, "@id", vocab=True)
                    key = compacted_item.pop(idk, "@none") \
                        if isinstance(compacted_item, dict) else "@none"
                else:  # @type
                    tk = compact_iri(active_ctx, "@type", vocab=True)
                    key = "@none"
                    if isinstance(compacted_item, dict):
                        tv = compacted_item.get(tk)
                        if isinstance(tv, list) and tv:
                            key = tv[0]
                            rest = tv[1:]
                            if rest:
                                compacted_item[tk] = rest if len(rest) > 1 else rest[0]
                            else:
                                compacted_item.pop(tk, None)
                        elif isinstance(tv, str):
                            key = tv
                            compacted_item.pop(tk, None)
                        if len(compacted_item) == 1 and "@id" in expanded_item:
                            compacted_item = compact(
                                active_ctx,
                                {"@id": expanded_item["@id"]},
                                options, active_property=item_active_property)
                if isinstance(key, dict):
                    key = "@none"
                _append(m, key, compacted_item, "@set" in container)
            else:
                as_array = (not options.get("compactArrays", True)
                            or "@set" in container or "@list" in container
                            or expanded_property in ("@list", "@graph"))
                _append(target, item_active_property, compacted_item, as_array)
    return rval


def idkey_only(d: dict) -> bool:
    return set(d.keys()) == {"@id"}


def _recompose_graph(active_ctx, expanded_item, compacted_item, container,
                     item_active_property, options):
    if "@graph" in container and is_simple_graph(expanded_item):
        if isinstance(compacted_item, list) and len(compacted_item) > 1:
            compacted_item = {compact_iri(active_ctx, "@included", vocab=True):
                              compacted_item}
        if "@index" in expanded_item and "@index" not in container:
            base = compacted_item if isinstance(compacted_item, dict) else {
                compact_iri(active_ctx, "@graph", vocab=True): compacted_item}
            base[compact_iri(active_ctx, "@index", vocab=True)] = expanded_item["@index"]
            compacted_item = base
        return compacted_item
    if "@graph" in container:
        return compacted_item
    # re-wrap explicitly
    wrapped = {compact_iri(active_ctx, "@graph", vocab=True):
               compacted_item if isinstance(compacted_item, list) else [compacted_item]}
    if "@id" in expanded_item:
        wrapped[compact_iri(active_ctx, "@id", vocab=True)] = compact_iri(
            active_ctx, expanded_item["@id"], base=options.get("base"))
    if "@index" in expanded_item:
        wrapped[compact_iri(active_ctx, "@index", vocab=True)] = expanded_item["@index"]
    return wrapped


def _nest_target(active_ctx, rval, nest):
    if not nest:
        return rval
    if nest != "@nest" and expand_iri(active_ctx, nest, vocab=True) != "@nest":
        raise syntax_error("@nest term must expand to @nest.", "invalid @nest value")
    return rval.setdefault(nest, {})


def _append(obj, key, value, as_array):
    if key in obj:
        existing = obj[key]
        if not isinstance(existing, list):
            existing = obj[key] = [existing]
        if isinstance(value, list):
            existing.extend(value)
        else:
            existing.append(value)
    else:
        if as_array and not isinstance(value, list):
            value = [value]
        obj[key] = value
