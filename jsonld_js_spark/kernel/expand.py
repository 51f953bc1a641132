"""JSON-LD 1.1 Expansion.

W3C JSON-LD 1.1 API §5.1 (Expansion Algorithm) + §5.2 (Value
Expansion). Parity target: /root/reference/lib/expand.js (see SURVEY
§2.3 for the sub-operator map).

Runs per-document: a document is one transcript turn's JSON payload,
so recursion depth/size is bounded by document size and the whole
function runs inside an Arrow UDF batch with no Spark interaction.

Warning events (free-floating nodes dropped, null @value, invalid
language tags...) are appended to ``options['events']`` — the Spark
pipeline surfaces them as a `warnings` array column (SURVEY §2.10).
"""

from __future__ import annotations

import re

from .constants import is_keyword, looks_like_keyword
from .context import expand_iri, process_context, revert_to_previous
from .errors import JsonLdError, syntax_error
from .iri import is_absolute_iri
from .types import is_graph, is_list, is_scalar, is_subject, is_subject_reference, is_value

# BCP47 well-formedness (parity: lib/util.js:13)
_LANG_RE = re.compile(
    r"^[a-zA-Z]{1,8}(-[a-zA-Z]{3}){0,3}?(-[a-zA-Z]{4})?(-[a-zA-Z]{2}|-[0-9]{3})?"
    r"(-[a-zA-Z0-9]{5,8}|-[0-9][a-zA-Z0-9]{3})*(-[0-9a-wy-zA-WY-Z](-[a-zA-Z0-9]{2,8})+)*"
    r"(-x(-[a-zA-Z0-9]{1,8})+)?$"
)


def _warn(options: dict, code: str, message: str, **details):
    from .events import emit
    emit(options, code, message, **details)


def _add_value(obj: dict, key: str, value, *, as_array: bool = True, allow_duplicate: bool = True):
    """Append semantics used throughout expansion (lib/util.js:246-298)."""
    if isinstance(value, list):
        if key not in obj and as_array:
            obj[key] = []
        for v in value:
            _add_value(obj, key, v, as_array=as_array, allow_duplicate=allow_duplicate)
        return
    if key in obj:
        existing = obj[key]
        if not isinstance(existing, list):
            existing = obj[key] = [existing]
        if allow_duplicate or value not in existing:
            existing.append(value)
    else:
        obj[key] = [value] if as_array else value


def expand(active_ctx: dict, element, options: dict, *,
           active_property: str | None = None, inside_list: bool = False,
           inside_index: bool = False,
           type_scoped_context: dict | None = None) -> object:
    """Expansion Algorithm. Returns expanded element (possibly None)."""
    if element is None:
        return None

    if active_property == "@default":
        options = {**options, "_frame_expansion": False}

    prop_mapping = active_ctx["mappings"].get(active_property) if active_property else None

    # --- scalars -> value expansion
    if is_scalar(element):
        # lib/expand.js:96-114: the drop is gated on !insideList — a
        # scalar INSIDE an explicit @list expands even with a null
        # active property (top-level {"@list": "x"} then trips the
        # set/list member validation instead of silently dropping)
        if not inside_list and (active_property is None
                                or active_property == "@graph"):
            _warn(options, "free-floating scalar", "Dropping free-floating scalar not in object.")
            return None
        return _expand_value(active_ctx, active_property, element, options)

    # --- arrays
    if isinstance(element, list):
        container = (prop_mapping or {}).get("@container", [])
        inside_list = inside_list or "@list" in container
        rval = []
        for item in element:
            e = expand(active_ctx, item, options, active_property=active_property,
                       inside_list=False, inside_index=inside_index,
                       type_scoped_context=type_scoped_context)
            if inside_list and isinstance(e, list):
                e = {"@list": e}
            if e is None:
                continue
            if isinstance(e, list):
                rval.extend(e)
            else:
                rval.append(e)
        return rval

    # --- objects
    if not isinstance(element, dict):  # pragma: no cover
        raise syntax_error("Unexpected element type.", "invalid input")

    # The reference's entry sequence (lib/expand.js:160-216), exactly:
    # 1. capture any property-scoped context for the active property
    #    BEFORE reverting;
    # 2. revert a non-propagated (type-scoped or @propagate:false)
    #    context unless inside an index expansion or the element is a
    #    value object / lone subject reference (checked against the
    #    TYPE-SCOPED context, <=2 keys, no @context);
    # 3. re-apply the property-scoped context (propagate defaults true,
    #    protected terms overridable);
    # 4. process the element's own @context;
    # 5. snapshot the post-@context state as the type-scoped context
    #    and fold in @type-scoped contexts (sorted types, propagate
    #    false).
    has_prop_scoped = prop_mapping is not None and "@context" in prop_mapping
    property_scoped_ctx = prop_mapping["@context"] if has_prop_scoped else None

    keys0 = sorted(element.keys())
    type_scoped_context = type_scoped_context or (
        active_ctx if active_ctx.get("previousContext") else None)
    must_revert = not inside_index
    if must_revert and type_scoped_context and len(keys0) <= 2 \
            and "@context" not in keys0:
        for k in keys0:
            exp = expand_iri(type_scoped_context, k, vocab=True)
            if exp == "@value":
                must_revert = False
                active_ctx = type_scoped_context
                break
            if exp == "@id" and len(keys0) == 1:
                must_revert = False
                break
    if must_revert:
        active_ctx = revert_to_previous(active_ctx)

    if has_prop_scoped:
        # an explicit null scoped context resets to the initial context
        active_ctx = process_context(active_ctx, property_scoped_ctx, options,
                                     override_protected=True)

    # local context
    if "@context" in element:
        active_ctx = process_context(active_ctx, element["@context"], options)

    # the type-scoped context for @type lookups is the context on input
    type_scoped_ctx = active_ctx

    # find @type keys (ordered) and apply type-scoped contexts
    type_key = None
    type_vals: list[str] = []
    for k in keys0:
        if expand_iri(active_ctx, k, vocab=True) == "@type":
            if type_key is None:
                type_key = k
            tv = element[k]
            tvs = tv if isinstance(tv, list) else [tv]
            type_vals.extend(t for t in tvs if isinstance(t, str))
    for t in sorted(type_vals):
        m = type_scoped_ctx["mappings"].get(t)
        if m and "@context" in m:
            active_ctx = process_context(active_ctx, m["@context"], options, propagate=False)

    rval: dict = {}
    nests: list[str] = []
    _expand_object(active_ctx, active_property, element, rval, options,
                   inside_list=inside_list, type_key=type_key,
                   type_scoped_ctx=type_scoped_ctx, nests=nests)

    # --- post-processing (spec §5.1 steps 14+)
    if "@value" in rval:
        keys = set(rval)
        if "@type" in keys and ("@language" in keys or "@direction" in keys):
            raise syntax_error(
                '"@value" may not contain both "@type" and "@language"/'
                '"@direction".', "invalid value object")
        bad = keys - {"@value", "@type", "@language", "@direction", "@index"}
        if bad:
            raise syntax_error("@value object has disallowed members.", "invalid value object")
        # per-ELEMENT validation over as-array views (lib/expand.js:295-333):
        # @value/@type may legitimately be arrays here (frames, @type
        # index maps, array inputs that survived addValue)
        vv = rval["@value"]
        values = [] if vv is None else (vv if isinstance(vv, list) else [vv])
        tt = rval.get("@type", [])
        types = tt if isinstance(tt, list) else [tt]
        is_empty_obj = lambda x: isinstance(x, dict) and not x
        if types == ["@json"] and \
                active_ctx.get("processingMode") != "json-ld-1.0":
            pass  # any JSON value allowed
        elif len(values) == 0:
            _warn(options, "null @value value", "Dropping null @value object.")
            return None
        elif "@language" in keys and not all(
                isinstance(v, str) or is_empty_obj(v) for v in values):
            raise syntax_error("@language used on non-string @value.", "invalid language-tagged value")
        elif not all((isinstance(t, str) and is_absolute_iri(t)
                      and not t.startswith("_:")) or is_empty_obj(t)
                     for t in types):
            raise syntax_error("@type of a value object must be an IRI.", "invalid typed value")
    elif "@type" in rval and not isinstance(rval["@type"], list):
        rval["@type"] = [rval["@type"]]
    elif "@set" in rval or "@list" in rval:
        keys = set(rval) - {"@index"}
        if len(keys) > 1:
            raise syntax_error("@set/@list object has disallowed members.", "invalid set or list object")
        if "@set" in rval:
            rval = rval["@set"]
            if not isinstance(rval, (list, dict)) and rval is not None:
                return rval
    elif isinstance(rval, dict) and len(rval) == 1 and "@language" in rval:
        _warn(options, "object with only @language",
              "Dropping object with only @language.")
        return None

    # drop free-floating unsafe objects; event codes match the
    # reference's _dropUnsafeObject vocabulary (lib/expand.js:396-437).
    # The guard mirrors lib/expand.js:374-382: also applies under an
    # active property whose container includes @graph, never in lists,
    # and never when keepFreeFloatingNodes is set (the public option;
    # frame expansion passes it, lib/jsonld.js:471)
    if (isinstance(rval, dict) and not inside_list
            and not options.get("keepFreeFloatingNodes")):
        count = len(rval)
        if (active_property is None or active_property == "@graph"
                or "@graph" in ((prop_mapping or {}).get("@container") or [])):
            if count == 0 or "@value" in rval or "@list" in rval:
                if count == 0:
                    _warn(options, "empty object", "Dropping empty object.")
                else:
                    if "@list" in rval:
                        # the reference reports inner droppable value
                        # objects before the list itself
                        for item in rval.get("@list", []):
                            if is_value(item) and len(item) == 1:
                                _warn(options, "object with only @value",
                                      "Dropping object with only @value.")
                        _warn(options, "object with only @list",
                              "Dropping object with only @list.")
                    else:
                        _warn(options, "object with only @value",
                              "Dropping object with only @value.")
                return None
            # _dropUnsafeObject has no frame-mode exception: frames keep
            # @id-only objects via keepFreeFloatingNodes, not isFrame
            if count == 1 and "@id" in rval:
                _warn(options, "object with only @id",
                      "Dropping object with only @id.")
                return None
    return rval


def _drop_unsafe_graph_item(v, options) -> bool:
    """_dropUnsafeObject predicate for @graph-container conversion
    (lib/expand.js:396-437 via :963): one warning per dropped item."""
    if not isinstance(v, dict):
        return False
    count = len(v)
    if count == 0:
        _warn(options, "empty object", "Dropping empty object.")
        return True
    if "@value" in v:
        _warn(options, "object with only @value",
              "Dropping object with only @value.")
        return True
    if "@list" in v:
        _warn(options, "object with only @list",
              "Dropping object with only @list.")
        return True
    if count == 1 and "@id" in v:
        _warn(options, "object with only @id",
              "Dropping object with only @id.")
        return True
    return False


def _expand_object(active_ctx, active_property, element, rval, options, *,
                   inside_list, type_key, type_scoped_ctx, nests):
    """Expand each key/value member of ``element`` into ``rval``."""
    input_type = None
    unexpanded_value = None
    has_value_key = False
    if type_key is not None:
        tv = element[type_key]
        tv0 = tv[-1] if isinstance(tv, list) and tv else tv
        if isinstance(tv0, str):
            input_type = expand_iri(active_ctx, tv0, vocab=True)

    for key in sorted(element.keys()):
        if key == "@context":
            continue
        value = element[key]
        expanded_property = expand_iri(active_ctx, key, vocab=True)

        if expanded_property is None or not (
                isinstance(expanded_property, str) and
                (is_absolute_iri(expanded_property)
                 or is_keyword(expanded_property))):
            _warn(options, "invalid property",
                  f"Dropping property that did not expand to an IRI/keyword: {key}",
                  property=key)
            continue

        if is_keyword(expanded_property):
            if active_property == "@reverse":
                raise syntax_error("@reverse map contains a keyword.", "invalid reverse property map")
            if expanded_property in rval and expanded_property not in ("@included", "@type"):
                raise syntax_error(f"Colliding keywords: {expanded_property}", "colliding keywords")

            if expanded_property == "@id":
                if isinstance(value, str):
                    expanded_id = expand_iri(active_ctx, value, base=True)
                    if expanded_id is None:
                        # keyword-shaped @id value in DATA position:
                        # warn and drop (lib/expand.js:578-594)
                        _warn(options, "reserved @id value",
                              "Reserved @id found.", id=value)
                    elif isinstance(expanded_id, str) and \
                            not is_absolute_iri(expanded_id):
                        # the isAbsolute regex itself accepts _:label
                        # (the `|_` scheme branch) but rejects labels
                        # with whitespace — '_: x' WARNS (r5 probe)
                        _warn(options, "relative @id reference",
                              f"Relative @id reference found: {expanded_id}")
                    _add_value(rval, "@id", expanded_id, as_array=False)
                elif options.get("_frame_expansion") and (
                        isinstance(value, dict) and not value or isinstance(value, list)):
                    rval["@id"] = value if isinstance(value, list) else []
                else:
                    raise syntax_error("@id value must be a string.", "invalid @id value")
                continue
            if expanded_property == "@type":
                _expand_type(active_ctx, type_scoped_ctx, value, rval, options)
                continue
            if expanded_property == "@graph":
                if not isinstance(value, (dict, list)):
                    raise syntax_error("@graph must be an object or array.", "invalid @graph value")
                e = expand(active_ctx, value, options, active_property="@graph")
                _add_value(rval, "@graph", e if isinstance(e, list) else [e])
                continue
            if expanded_property == "@included" and \
                    active_ctx.get("processingMode") != "json-ld-1.0":
                # in 1.0 mode @included has NO branch and falls to the
                # generic keyword path below (lib/expand.js:666 guard).
                # The recursion keeps the ENCLOSING active property
                # (lib/expand.js:667-672): under a property, a scalar
                # expands to a VALUE object and fails the all-subjects
                # check — at top level it free-floating-drops instead
                e = expand(active_ctx, value, options,
                           active_property=active_property)
                es = e if isinstance(e, list) else [e]
                # STRICT isSubject (lib/expand.js:676): a LONE @id
                # subject REFERENCE fails the check and errors — and a
                # dropped (null) expansion wraps to [null], which also
                # fails, exactly like the reference's _asArray(null)
                if not all(is_subject(x) for x in es):
                    raise syntax_error("@included values must be node objects.", "invalid @included value")
                _add_value(rval, "@included", es)
                continue
            if expanded_property == "@value":
                # addValue semantics (lib/expand.js:950-961): an ARRAY
                # adds element-wise, so `"@value": []` adds NOTHING and
                # the object silently stops being a value object; the
                # object/array error fires AFTER the key loop and only
                # if the key actually landed (lib/expand.js:1002-1014)
                unexpanded_value = value
                has_value_key = True
                if input_type == "@json":
                    rval["@value"] = value
                else:
                    _add_value(rval, "@value", value,
                               as_array=bool(options.get("_frame_expansion")))
                continue
            if expanded_property == "@language":
                if value is None:
                    # null @language expands as if absent (lib/expand.js:713-716)
                    continue
                if not isinstance(value, str):
                    if options.get("_frame_expansion") and isinstance(value, (list, dict)):
                        rval["@language"] = value
                        continue
                    raise syntax_error("@language must be a string.", "invalid language-tagged string")
                if not _LANG_RE.match(value):
                    _warn(options, "invalid @language value",
                          f"Language tag not well-formed: {value}")
                rval["@language"] = value.lower()
                continue
            if expanded_property == "@direction":
                if value not in ("ltr", "rtl"):
                    raise syntax_error("@direction must be ltr/rtl.", "invalid base direction")
                rval["@direction"] = value
                continue
            if expanded_property == "@index":
                if not isinstance(value, str):
                    raise syntax_error("@index must be a string.", "invalid @index value")
                rval["@index"] = value
                continue
            if expanded_property == "@reverse":
                if not isinstance(value, dict):
                    raise syntax_error("@reverse value must be an object.", "invalid @reverse value")
                e = expand(active_ctx, value, options, active_property="@reverse")
                if isinstance(e, dict) and "@reverse" in e:
                    for prop, items in e["@reverse"].items():
                        _add_value(rval, prop, items)
                if isinstance(e, dict):
                    rev = rval.setdefault("@reverse", {})
                    for prop, items in e.items():
                        if prop == "@reverse":
                            continue
                        for item in items:
                            if is_value(item) or is_list(item):
                                raise syntax_error(
                                    "Reverse value must be a node object.",
                                    "invalid reverse property value")
                            _add_value(rev, prop, item)
                continue
            if expanded_property == "@nest":
                nests.append(key)
                continue
            if expanded_property == "@list":
                # free-floating lists still expand; the post-processing
                # drop emits 'object with only @list' (lib/expand.js:88-111)
                e = expand(active_ctx, value, options, active_property=active_property,
                           inside_list=True)
                if e is None:
                    # null @list contributes NOTHING (the generic null
                    # drop, lib/expand.js:941-948) — the set/list member
                    # validation never sees the key (r5 sweep find)
                    continue
                rval["@list"] = e if isinstance(e, list) else [e]
                continue
            if expanded_property == "@set":
                e = expand(active_ctx, value, options, active_property=active_property)
                if e is None:
                    continue
                rval["@set"] = e
                continue
            # EVERY remaining keyword (framing keywords @default/@embed/
            # @explicit/@omitDefault/@requireAll, context-directive
            # keywords @base/@vocab/@container/@prefix/@protected/
            # @version/@preserve/@none, and 1.0-mode @included) takes
            # the reference's GENERIC path — recursively expanded with
            # the RAW key as active property, then array-appended
            # (lib/expand.js:925-935,941-999: no special branch, so
            # even plain expansion KEEPS them; r5 probe find). The
            # isFrame reset at lib/expand.js:84 matches '@default'
            # literally, so an ALIASED default key does not disable
            # framing inside — hence active_property=key.
            e = expand(active_ctx, value, options, active_property=key)
            if e is None:
                continue
            _add_value(rval, expanded_property, e, as_array=True)
            continue

        # --- regular property
        mapping = active_ctx["mappings"].get(key) or {}
        container = mapping.get("@container", [])
        # property-scoped context (an explicit null counts — it resets)
        term_ctx = active_ctx
        if "@context" in mapping:
            term_ctx = process_context(active_ctx, mapping["@context"], options,
                                       override_protected=True)

        if value is None and "@list" not in container:
            continue

        if mapping.get("@type") == "@json":
            expanded_value = [{"@value": value, "@type": "@json"}]
        elif "@language" in container and isinstance(value, dict):
            expanded_value = _expand_language_map(term_ctx, key, value, options)
        elif "@index" in container and isinstance(value, dict):
            index_key = mapping.get("@index", "@index")
            property_index = None
            if index_key != "@index":
                property_index = expand_iri(active_ctx, index_key, vocab=True)
            expanded_value = _expand_index_map(
                term_ctx, key, value, options, index_key=index_key,
                as_graph="@graph" in container, property_index=property_index)
        elif "@id" in container and isinstance(value, dict):
            expanded_value = _expand_index_map(
                term_ctx, key, value, options, index_key="@id",
                as_graph="@graph" in container)
        elif "@type" in container and isinstance(value, dict):
            from .context import revert_to_previous
            expanded_value = _expand_index_map(
                revert_to_previous(term_ctx), key, value, options,
                index_key="@type", as_graph=False)
        else:
            is_list_container = "@list" in container
            e = expand(term_ctx, value, options, active_property=key,
                       inside_list=is_list_container)
            if e is None and not is_list_container:
                continue
            expanded_value = e

        if expanded_value is None and "@list" in container:
            expanded_value = []
        if "@list" in container and not is_list(expanded_value):
            expanded_value = {"@list": expanded_value if isinstance(expanded_value, list)
                              else [expanded_value]}
        if "@graph" in container and not ("@id" in container or "@index" in container):
            ev = expanded_value if isinstance(expanded_value, list) else [expanded_value]
            if not options.get("_frame_expansion"):
                # graph conversion drops unsafe items first (empty,
                # @value-/@list-bearing, lone @id) and skips the whole
                # property when nothing survives — lib/expand.js:952-968
                ev = [v for v in ev if not _drop_unsafe_graph_item(v, options)]
                if not ev:
                    continue
            # lib/expand.js:971 wraps EVERY surviving item — its own
            # comment says "and value is not, itself, a graph" but the
            # map has no isGraph guard, so an explicit {"@graph": ...}
            # value DOUBLE-WRAPS (only the @graph@id/@graph@index map
            # path at :1246 checks). Verified differentially.
            expanded_value = [
                {"@graph": v if isinstance(v, list) else [v]}
                for v in ev
            ]

        if mapping.get("reverse"):
            rev = rval.setdefault("@reverse", {})
            evs = expanded_value if isinstance(expanded_value, list) else [expanded_value]
            for item in evs:
                if is_value(item) or is_list(item):
                    raise syntax_error("Reverse value must be a node object.",
                                       "invalid reverse property value")
                _add_value(rev, expanded_property, item)
        else:
            _add_value(rval, expanded_property, expanded_value)

    # deferred @value shape check (lib/expand.js:1002-1014): only when
    # the @value key actually landed, and bypassed for 1.1 @type:@json
    if has_value_key and "@value" in rval:
        if rval.get("@type") == "@json" and \
                active_ctx.get("processingMode") != "json-ld-1.0":
            pass
        elif isinstance(unexpanded_value, (dict, list)) and \
                not options.get("_frame_expansion"):
            raise syntax_error(
                '"@value" value must not be an object or an array.',
                "invalid value object value")

    # @nest handling: recurse into nested maps (lib/expand.js:1016-1039)
    for nest_key in nests:
        nv = element[nest_key]
        nvs = nv if isinstance(nv, list) else [nv]
        for nested in nvs:
            if not isinstance(nested, dict) or any(
                    expand_iri(active_ctx, k, vocab=True) == "@value" for k in nested):
                raise syntax_error("@nest value must be node-like.", "invalid @nest value")
            _expand_object(active_ctx, active_property, nested, rval, options,
                           inside_list=False, type_key=None,
                           type_scoped_ctx=type_scoped_ctx, nests=[])


def _expand_type(active_ctx, type_scoped_ctx, value, rval, options):
    vals = value if isinstance(value, list) else [value]
    out = []
    for v in vals:
        if isinstance(v, str):
            ve = expand_iri(type_scoped_ctx, v, vocab=True, base=True)
            # lib/expand.js:638-655: one warning per element whose
            # expansion is neither @json nor absolute (the reference's
            # REGEX_ABSOLUTE_IRI accepts the "_:" scheme, so blank-node
            # types do NOT warn)
            if ve != "@json" and isinstance(ve, str) and \
                    not ve.startswith("_:") and not is_absolute_iri(ve):
                _warn(options, "relative @type reference",
                      "Relative @type reference found.", type=v)
            out.append(ve)
        elif options.get("_frame_expansion") and isinstance(v, dict):
            if not v:
                out.append(v)
            elif "@default" in v:
                out.append({"@default": expand_iri(type_scoped_ctx, v["@default"],
                                                   vocab=True, base=True)})
            else:
                raise syntax_error("@type frame value invalid.", "invalid type value")
        else:
            raise syntax_error("@type value must be a string or array of strings.",
                               "invalid type value")
    # _addValue(parent, '@type', arr, {propertyIsArray: isFrame})
    # (lib/expand.js:632-681): element-wise add, so [] adds NOTHING
    # (key stays absent), one value stores BARE, several store a list;
    # frames always store a list. Node objects re-wrap to a list later;
    # VALUE objects keep this shape — the source of the reference's
    # array-@type-on-@value quirks.
    existing = rval.get("@type")
    ex = [] if existing is None else (
        existing if isinstance(existing, list) else [existing])
    combined = ex + out
    if options.get("_frame_expansion"):
        rval["@type"] = combined
    elif not combined:
        rval.pop("@type", None)
    elif len(combined) == 1:
        rval["@type"] = combined[0]
    else:
        rval["@type"] = combined


def _expand_language_map(active_ctx, key, value, options):
    rval = []
    mapping = active_ctx["mappings"].get(key) or {}
    direction = mapping.get("@direction", active_ctx.get("@direction")) \
        if mapping.get("_has_direction") or True else None
    for lang in sorted(value.keys()):
        vals = value[lang] if isinstance(value[lang], list) else [value[lang]]
        expanded_lang = expand_iri(active_ctx, lang, vocab=True)
        for item in vals:
            if item is None:
                continue
            if not isinstance(item, str):
                raise syntax_error("Language map values must be strings.",
                                   "invalid language map value")
            if lang != "@none" and not _LANG_RE.match(lang):
                _warn(options, "invalid @language value",
                      f"Language tag not well-formed: {lang}")
            v = {"@value": item}
            if expanded_lang != "@none":
                v["@language"] = lang.lower()
            if direction:
                v["@direction"] = direction
            rval.append(v)
    return rval


def _expand_index_map(active_ctx, key, value, options, *, index_key,
                      as_graph, property_index=None):
    """Index/id/type map expansion (parity lib/expand.js:1190-1281)."""
    from .context import selected_term_ctx

    rval = []
    is_type_index = index_key == "@type"
    for k in sorted(value.keys()):
        ctx = active_ctx
        if is_type_index:
            m = active_ctx["mappings"].get(k)
            if m and "@context" in m:
                ctx = process_context(active_ctx, m["@context"], options,
                                      propagate=False)
        vals = value[k] if isinstance(value[k], list) else [value[k]]
        expanded = expand(ctx, vals, options, active_property=key,
                          inside_list=False, inside_index=True)

        if property_index:
            if k == "@none":
                expanded_k = "@none"
            else:
                expanded_k = _expand_value(active_ctx, index_key, k, options)
        else:
            expanded_k = expand_iri(ctx, k, vocab=True)

        map_key = k
        if index_key == "@id":
            map_key = expand_iri(active_ctx, k, base=True)
        elif is_type_index:
            map_key = expanded_k

        for item in expanded:
            if as_graph and not is_graph(item):
                item = {"@graph": item if isinstance(item, list) else [item]}
            if is_type_index:
                if expanded_k == "@none":
                    pass
                elif item.get("@type"):
                    item = {**item, "@type": [map_key] + item["@type"]}
                else:
                    item = {**item, "@type": [map_key]}
            elif is_value(item) and index_key not in ("@language", "@type",
                                                      "@index"):
                raise syntax_error(
                    f"Attempt to add illegal key to value object: {index_key}.",
                    "invalid value object")
            elif property_index:
                if expanded_k != "@none":
                    item = dict(item)
                    existing = item.get(property_index)
                    prepended = [expanded_k] + (
                        existing if isinstance(existing, list)
                        else [existing] if existing is not None else [])
                    item[property_index] = prepended
            elif expanded_k != "@none" and index_key not in item:
                item = {**item, index_key: map_key}
            rval.append(item)
    return rval


def _expand_value(active_ctx, active_property, value, options):
    """Value Expansion (spec §5.2; parity lib/expand.js:1053-1129)."""
    if value is None:
        return None
    if active_property == "@type":
        return expand_iri(active_ctx, value, vocab=True, base=True)
    if active_property == "@id":
        return expand_iri(active_ctx, value, base=True)

    mapping = active_ctx["mappings"].get(active_property) or {}
    t = mapping.get("@type")
    if t == "@id" and isinstance(value, str):
        expanded_value = expand_iri(active_ctx, value, base=True)
        if expanded_value is None and looks_like_keyword(value):
            # keyword-shaped value under @type:@id coercion: warn,
            # keep the null @id (lib/expand.js:1074-1092; details.id
            # is the PROPERTY there, not the value)
            _warn(options, "reserved @id value", "Reserved @id found.",
                  id=active_property)
        return {"@id": expanded_value}
    if t == "@vocab" and isinstance(value, str):
        return {"@id": expand_iri(active_ctx, value, vocab=True, base=True)}
    if is_keyword(active_property):
        return value

    rval = {"@value": value}
    if t not in (None, "@id", "@vocab", "@none"):
        rval["@type"] = t
    elif isinstance(value, str):
        if mapping.get("_has_language"):
            lang = mapping.get("@language")
        else:
            lang = active_ctx.get("@language")
        if mapping.get("_has_direction"):
            direction = mapping.get("@direction")
        else:
            direction = active_ctx.get("@direction")
        if lang is not None:
            rval["@language"] = lang
        if direction is not None:
            rval["@direction"] = direction
    return rval
