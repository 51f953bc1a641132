"""Node map generation: expanded JSON-LD tree -> grouped adjacency.

W3C JSON-LD 1.1 API §7 (Node Map Generation). Parity:
/root/reference/lib/nodeMap.js:47-290. The node map is exactly a
grouped relational view of the eventual triples table:
``graphs[graph_name][subject_id] -> node_object`` — which is why the
Spark pipeline's fused UDF emits flat rows straight out of this walk.

Blank-node labels come from a sequential :class:`IdentifierIssuer`
(`_:b0`, `_:b1`, ...) whose issuance order follows the deterministic
sorted-key walk, matching the reference (lib/nodeMap.js:111 et al).
Per-document determinism + a dataset-level salt (applied by the Spark
layer, SURVEY §1.6) gives globally unique labels.
"""

from __future__ import annotations

from .constants import is_keyword
from .errors import syntax_error
from .types import is_list, is_subject, is_subject_reference, is_value


class IdentifierIssuer:
    """Sequential blank-node label issuer (parity: rdf-canonize's
    IdentifierIssuer used via lib/util.js:8-28)."""

    def __init__(self, prefix: str = "_:b"):
        self.prefix = prefix
        self.counter = 0
        self.existing: dict[str, str] = {}
        self.order: list[str] = []

    def get_id(self, old: str | None = None) -> str:
        if old is not None and old in self.existing:
            return self.existing[old]
        new_id = f"{self.prefix}{self.counter}"
        self.counter += 1
        if old is not None:
            self.existing[old] = new_id
            self.order.append(old)
        return new_id

    def has_id(self, old: str) -> bool:
        return old in self.existing

    def clone(self) -> "IdentifierIssuer":
        c = IdentifierIssuer(self.prefix)
        c.counter = self.counter
        c.existing = dict(self.existing)
        c.order = list(self.order)
        return c


def _add_value(obj, key, value, *, property_is_array=False, allow_duplicate=True):
    if isinstance(value, list):
        if key not in obj and property_is_array:
            obj[key] = []
        for v in value:
            _add_value(obj, key, v, property_is_array=property_is_array,
                       allow_duplicate=allow_duplicate)
        return
    if key in obj:
        existing = obj[key]
        if not isinstance(existing, list):
            existing = obj[key] = [existing]
        if allow_duplicate or not _has_value(existing, value):
            existing.append(value)
    else:
        obj[key] = [value] if property_is_array else value


def _strict_eq(a, b) -> bool:
    """JS ===-style scalar equality: True !== 1, 0 !== False (Python's
    == conflates bool/int, which silently merged boolean values with
    0/1 integers in node-map dedupe — caught by differential testing)."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    return a == b


def compare_values(v1, v2) -> bool:
    """Equality over expanded values (parity lib/util.js:376-400)."""
    if type(v1) is type(v2) and not isinstance(v1, dict) and _strict_eq(v1, v2):
        return True
    if is_value(v1) and is_value(v2):
        return (_strict_eq(v1.get("@value"), v2.get("@value"))
                and v1.get("@type") == v2.get("@type")
                and v1.get("@language") == v2.get("@language")
                and v1.get("@index") == v2.get("@index"))
    if isinstance(v1, dict) and "@id" in v1 and isinstance(v2, dict) and "@id" in v2:
        return v1["@id"] == v2["@id"]
    return False


def _has_value(arr: list, value) -> bool:
    return any(compare_values(v, value) for v in arr)


def create_node_map(element, *, issuer: IdentifierIssuer | None = None) -> dict:
    """expanded element -> ``{graph_name: {subject_id: node}}``."""
    issuer = issuer or IdentifierIssuer()
    graphs: dict = {"@default": {}}
    _create_node_map(element, graphs, "@default", issuer, None, None)
    return graphs


def _create_node_map(element, graphs, graph, issuer, name, lst):
    if isinstance(element, list):
        for item in element:
            _create_node_map(item, graphs, graph, issuer, None, lst)
        return

    if not isinstance(element, dict):
        if lst is not None:
            lst.append(element)
        return

    # value objects attach to lists / callers directly
    if is_value(element):
        if "@type" in element:
            t = element["@type"]
            if isinstance(t, str) and t.startswith("_:"):
                element = {**element, "@type": issuer.get_id(t)}
        if lst is not None:
            lst.append(element)
        return

    # the list branch applies ONLY when collecting into a parent list
    # (lib/nodeMap.js:74-80: `list && isList(input)`); a TOP-LEVEL list
    # object falls through to the subject path below
    if is_list(element) and lst is not None:
        result: list = []
        _create_node_map(element["@list"], graphs, graph, issuer, name, result)
        out = {"@list": result}
        if "@index" in element:
            out["@index"] = element["@index"]
        lst.append(out)
        return

    # node object
    element = dict(element)
    if "@type" in element:
        types = element["@type"]
        types = types if isinstance(types, list) else [types]
        element["@type"] = [issuer.get_id(t) if isinstance(t, str) and t.startswith("_:") else t
                            for t in types]

    if name is None:
        eid = element.get("@id")
        if eid is not None and not isinstance(eid, str):
            raise syntax_error("@id must be a string.", "invalid @id value")
        if "@id" not in element and is_list(element):
            # an @id-less @list object is NOT a blank node
            # (lib/graphTypes.js isBlankNode rule 3), so the reference
            # takes name = input['@id'] = undefined: the node lands
            # under the literal JS key "undefined" WITHOUT a usable
            # @id (undefined drops on serialize) — mirrored here as
            # the "undefined" key and an omitted @id
            name = None
        elif eid is None or eid.startswith("_:"):
            name = issuer.get_id(eid)
        else:
            name = eid

    subjects = graphs.setdefault(graph, {})
    if name is None:
        subject = subjects.setdefault("undefined", {})
    else:
        subject = subjects.setdefault(name, {"@id": name})

    if lst is not None:
        lst.append({"@id": name})

    for prop in sorted(element.keys()):
        if prop == "@id":
            continue
        if prop == "@reverse":
            referenced = {"@id": name}
            for rev_prop, items in element["@reverse"].items():
                for item in items:
                    item_name = item.get("@id")
                    if item_name is None or item_name.startswith("_:"):
                        item_name = issuer.get_id(item_name)
                    _create_node_map(item, graphs, graph, issuer, item_name, None)
                    node = graphs[graph][item_name]
                    _add_value(node, rev_prop, referenced,
                               property_is_array=True, allow_duplicate=False)
            continue
        if prop == "@graph":
            # named graph rooted at this node
            graphs.setdefault(name, {})
            g = graph if graph == "@merged" else name
            _create_node_map(element["@graph"], graphs, g, issuer, None, None)
            continue
        if prop == "@included":
            _create_node_map(element["@included"], graphs, graph, issuer, None, None)
            continue
        if prop in ("@type",):
            _add_value(subject, "@type", element["@type"],
                       property_is_array=True, allow_duplicate=False)
            continue
        if prop == "@index":
            if "@index" in subject and subject["@index"] != element["@index"]:
                raise syntax_error("Conflicting @index values.", "conflicting indexes")
            subject["@index"] = element["@index"]
            continue
        if prop != "@type" and is_keyword(prop):
            # copy EVERY non-@type keyword VERBATIM — no recursion, no
            # bnode relabeling (lib/nodeMap.js:153-165): framing
            # keywords (@preserve, @default...) that survived
            # expansion ride along as opaque values and toRDF later
            # skips them (r5 keyword sweep find). Also reachable via
            # the top-level-@list subject-path quirk.
            subject[prop] = element[prop]
            continue

        objects = element[prop]
        # rename bnode property (generalized RDF only; keep label issued)
        use_prop = prop
        if prop.startswith("_:"):
            use_prop = issuer.get_id(prop)
        if not objects:
            _add_value(subject, use_prop, [], property_is_array=True)
            continue
        for o in objects:
            if is_subject(o) or is_subject_reference(o):
                if "@id" in o and not o["@id"]:
                    # skip FALSY @id (lib/nodeMap.js:189-192): the
                    # object is dropped wholesale — no reference, no
                    # recursion. Reachable from normal expansion: a
                    # keyword-shaped @graph-@id-container key expands
                    # its graph name to null (r5 grammar-14 find)
                    continue
                oid = o.get("@id")
                if oid is not None and not isinstance(oid, str):
                    raise syntax_error("@id must be a string.", "invalid @id value")
                if oid is None or oid.startswith("_:"):
                    oid = issuer.get_id(oid)
                _add_value(subject, use_prop, {"@id": oid},
                           property_is_array=True, allow_duplicate=False)
                _create_node_map(o, graphs, graph, issuer, oid, None)
            elif is_list(o):
                result: list = []
                _create_node_map(o["@list"], graphs, graph, issuer, name, result)
                out = {"@list": result}
                _add_value(subject, use_prop, out,
                           property_is_array=True, allow_duplicate=True)
            else:
                if is_value(o) and isinstance(o.get("@type"), str) and o["@type"].startswith("_:"):
                    o = {**o, "@type": issuer.get_id(o["@type"])}
                _add_value(subject, use_prop, o,
                           property_is_array=True, allow_duplicate=False)


def merge_node_maps(graphs: dict) -> dict:
    """Fold named graphs into the default graph as ``@graph`` entries
    (parity: lib/nodeMap.js ``mergeNodeMaps``). Returns the default
    graph's subject map, mutated in place."""
    default_graph = graphs.get("@default", {})
    for graph_name in sorted(graphs.keys()):
        if graph_name == "@default":
            continue
        node_map = graphs[graph_name]
        subject = default_graph.setdefault(graph_name, {"@id": graph_name})
        graph = subject.setdefault("@graph", [])
        for sid in sorted(node_map.keys()):
            node = node_map[sid]
            if not is_subject_reference(node):
                graph.append(node)
    return default_graph


def merge_node_map_graphs(graphs: dict) -> dict:
    """Merge node *properties* across all graphs into one subject map
    (parity: lib/nodeMap.js ``mergeNodeMapGraphs``; used by framing's
    ``@merged`` view and by jsonld.merge)."""
    merged: dict = {}
    for graph_name in sorted(graphs.keys()):
        for subj in sorted(graphs[graph_name].keys()):
            node = graphs[graph_name][subj]
            target = merged.setdefault(subj, {"@id": subj})
            for prop in sorted(node.keys()):
                if prop == "@id":
                    continue
                if prop.startswith("@") and prop != "@type":
                    target[prop] = node[prop]
                else:
                    _add_value(target, prop, node[prop], property_is_array=True,
                               allow_duplicate=False)
    return merged
