"""The flagship pipeline: transcripts -> triples, fused in ONE Arrow stage.

Stage plan (SURVEY §3.1):
  stage 1 (narrow, no shuffle): read transcripts -> mapInPandas running
    parse -> context -> expand -> nodeMap -> toRDF (and optionally
    RDFC-1.0 canonicalization) per turn, entirely inside Arrow batches;
  stage 2 (the only shuffle): repartition by subject hash, dedupe,
    write.

The reference materializes each intermediate representation
(lib/jsonld.js:697 -> lib/toRdf.js:53); we never do — Python<->JVM
crossings dominate at scale, so the whole per-document path is one
generator over Arrow record batches (SURVEY §4 item 1).

Blank-node labels are salted per turn (`_:b<hash(conv,turn)>-<n>`) so
labels are dataset-unique without any cross-document coordination —
the reference's own multi-document strategy (lib/jsonld.js:804-808).
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel.api import expand as k_expand
from ..kernel.canon import PoisonedDatasetError, canonical_id_map, relabel_quads
from ..kernel.errors import JsonLdError
from ..kernel.nodemap import IdentifierIssuer
from ..kernel.tordf import quads_to_rows, to_rdf as k_to_rdf
from ..sources.transcripts import TOOL_CONTEXT, TRANSCRIPT_CONTEXT, turn_subject

TRIPLE_SCHEMA = (
    "conv_id string, turn_idx int, kind string, graph string, subj string, "
    "pred string, obj_kind string, obj_value string, obj_datatype string, "
    "obj_lang string"
)

V = "https://example.org/vocab#"


def _doc_salt(conv_id: str, turn_idx: int) -> str:
    return hashlib.sha256(f"{conv_id}\x1f{turn_idx}".encode()).hexdigest()[:10]


def looks_like_jsonld(text: str) -> bool:
    if not text:
        return False
    t = text.lstrip()
    return t[:1] in "{[" and ("@context" in t or "@id" in t or "@graph" in t
                              or "@type" in t or '"@value"' in t)


def envelope_doc(conv_id: str, turn_idx: int, role: str, text: str,
                 tool: str | None, ts) -> dict:
    """Turn metadata as a JSON-LD document under TRANSCRIPT_CONTEXT.

    Carries the text literal unchanged -> per-turn text equality under
    (conv_id, turn_idx) ordering (BASELINE.json input_hint invariant).
    """
    doc = {
        "@context": TRANSCRIPT_CONTEXT,
        "@id": turn_subject(conv_id, turn_idx),
        "@type": "Turn",
        "conv": f"https://example.org/conv/{conv_id}",
        "turnIndex": turn_idx,
        "role": role,
        "text": text if text is not None else "",
    }
    # null timestamps arrive as pandas NaT inside Arrow batches (NaT != NaT)
    if ts is not None and ts == ts:
        doc["ts"] = ts.isoformat() if hasattr(ts, "isoformat") else str(ts)
    if role is None:
        del doc["role"]
    if tool:
        try:
            payload = json.loads(tool)
            name = payload.get("name", "unknown")
            doc["invokes"] = f"https://example.org/tool/{name}"
            if "args" in payload:
                doc["toolArgs"] = {"@value": payload["args"], "@type": "@json"}
        except (ValueError, AttributeError):
            doc["toolRaw"] = tool
    return doc


def turn_to_quads(conv_id: str, turn_idx: int, role: str, text: str,
                  tool: str | None, ts, *, canonicalize: bool = False,
                  mode: str = "auto", options: dict | None = None):
    """One turn -> (quads, events). Pure function; used by the Arrow
    stage AND by driver-side tests (same kernel both places)."""
    events: list[dict] = []
    opts = {**(options or {}), "events": events}
    salt = _doc_salt(conv_id, turn_idx)

    if mode in ("auto", "docs-only") and looks_like_jsonld(text):
        try:
            doc = json.loads(text)
        except ValueError:
            doc = None
    else:
        doc = None
    if doc is None:
        if mode == "docs-only":
            return [], events
        doc = envelope_doc(conv_id, turn_idx, role, text, tool, ts)

    try:
        expanded = k_expand(doc, opts)
        issuer = IdentifierIssuer(f"_:b{salt}-")
        quads = k_to_rdf(expanded, {**opts, "issuer": issuer})
        if canonicalize:
            try:
                id_map = canonical_id_map(
                    quads, max_work_factor=opts.get("maxWorkFactor", 3))
            except PoisonedDatasetError as e:
                events.append({"code": "canonicalization work factor exceeded",
                               "level": "warning", "message": str(e)})
                return [], events
            # namespace canonical labels per document (SURVEY §2.9)
            quads = relabel_quads(
                quads, {old: f"c14n-{salt}-{new[4:]}" for old, new in id_map.items()})
    except JsonLdError as e:
        events.append({"code": e.code or e.name, "level": "error",
                       "message": e.message})
        return [], events
    return quads, events


def extract_triples(transcripts: DataFrame, *, canonicalize: bool = False,
                    mode: str = "auto", context_loader: dict | None = None,
                    options: dict | None = None) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> long
    rows DataFrame (TRIPLE_SCHEMA): kind='triple' rows carry the quad
    columns; kind='warning' rows carry (obj_value=code,
    obj_datatype=message) — the warnings column of SURVEY §2.10 in
    long form, filterable without a second pass.
    """
    import pandas as pd

    spark = transcripts.sparkSession
    base_options = dict(options or {})
    if context_loader:
        base_options["context_loader"] = context_loader
    bc = spark.sparkContext.broadcast(base_options)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        opts = bc.value
        for pdf in batches:
            out: list[tuple] = []
            for conv_id, turn_idx, role, text, tool, ts in zip(
                    pdf["conv_id"], pdf["turn_idx"], pdf["role"],
                    pdf["text"], pdf["tool"], pdf["ts"]):
                turn_idx = int(turn_idx)
                quads, events = turn_to_quads(
                    conv_id, turn_idx, role, text, tool, ts,
                    canonicalize=canonicalize, mode=mode, options=opts)
                for row in quads_to_rows(quads):
                    out.append((conv_id, turn_idx, "triple") + row)
                for e in events:
                    out.append((conv_id, turn_idx, "warning", None, None, None,
                                None, e["code"], e.get("message"), None))
            yield pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "kind", "graph", "subj",
                              "pred", "obj_kind", "obj_value", "obj_datatype",
                              "obj_lang"])

    return transcripts.mapInPandas(run, schema=TRIPLE_SCHEMA)


def triples_only(extracted: DataFrame) -> DataFrame:
    return extracted.filter(F.col("kind") == "triple").drop("kind")


def warnings_only(extracted: DataFrame) -> DataFrame:
    return (extracted.filter(F.col("kind") == "warning")
            .select("conv_id", "turn_idx",
                    F.col("obj_value").alias("code"),
                    F.col("obj_datatype").alias("message")))


def nquad_lines(triples: DataFrame) -> DataFrame:
    """Triples -> N-Quads lines — pure column expressions (JVM-side,
    whole-stage codegen; no Python in this path)."""
    xsd_string = "http://www.w3.org/2001/XMLSchema#string"
    langstring = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

    def term(col):  # IRI or bnode
        return F.when(col.startswith("_:"), col).otherwise(
            F.concat(F.lit("<"), col, F.lit(">")))

    escaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("obj_value"), r"\\", r"\\\\"),
                '"', r'\\"'),
            "\n", r"\\n"),
        "\r", r"\\r")
    literal = F.concat(
        F.lit('"'), escaped, F.lit('"'),
        F.when(F.col("obj_datatype") == langstring,
               F.concat(F.lit("@"), F.col("obj_lang")))
        .when(F.col("obj_datatype").isNotNull()
              & (F.col("obj_datatype") != xsd_string),
              F.concat(F.lit("^^<"), F.col("obj_datatype"), F.lit(">")))
        .otherwise(F.lit("")))
    obj = F.when(F.col("obj_kind") == "literal", literal).otherwise(
        term(F.col("obj_value")))
    graph_part = F.when(
        F.col("graph").isNull() | (F.col("graph") == ""), F.lit("")).otherwise(
        F.concat(F.lit(" "), term(F.col("graph"))))
    line = F.concat(term(F.col("subj")), F.lit(" "),
                    term(F.col("pred")), F.lit(" "),
                    obj, graph_part, F.lit(" ."))
    return triples.select(line.alias("nquad"))


def materialize_graph(triples: DataFrame, path: str, *, buckets: int = 64,
                      fmt: str = "parquet") -> None:
    """Write the triples table partitioned by subject-hash bucket.

    On a cluster with an Iceberg catalog this is
    ``bucket(N, subj_hash)`` table partitioning (north_star); locally
    we materialize the same layout as a `subj_bucket` partition column
    over parquet so downstream graph queries prune + co-locate.
    """
    (triples
     .withColumn("subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(buckets)))
     .repartition(buckets, "subj_bucket")
     .sortWithinPartitions("subj", "pred")
     .write.mode("overwrite")
     .partitionBy("subj_bucket")
     .format(fmt)
     .save(path))
