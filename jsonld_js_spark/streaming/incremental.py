"""Incremental ingest: new transcript files -> triples, exactly once.

The reference is batch-only (documents in, documents out); our engine
adds two incremental paths (SURVEY §2.11 streaming):

1. ``incremental_batches``: snapshot-based — each call processes only
   files not yet recorded in the ingest ledger (the Iceberg
   incremental-read pattern; locally a JSON ledger of seen files).
   This is the north-rule-preferred path: resumable, replayable,
   no always-on cluster.

2. ``stream_extract``: true Structured Streaming — readStream over a
   transcript directory -> the same fused Arrow extraction ->
   writeStream. For deployments that want continuous construction.
   The extraction stage is stateless per-turn, so it composes with
   any sink/trigger; watermarked windowed aggregation over mention
   counts is provided as the stateful example.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.transcripts import TRANSCRIPT_SCHEMA


def _ledger_path(state_dir: str) -> str:
    return os.path.join(state_dir, "ingest_ledger.json")


def incremental_batches(spark: SparkSession, input_dir: str, state_dir: str,
                        *, canonicalize: bool = False) -> tuple[DataFrame | None, list[str]]:
    """Process transcript parquet files not yet in the ledger.

    Returns (triples_df_for_new_files | None, newly_seen_files). The
    caller writes the triples and then calls ``commit_ingest`` —
    write-then-commit, same protocol as plans.lineage.
    """
    os.makedirs(state_dir, exist_ok=True)
    seen: set[str] = set()
    if os.path.exists(_ledger_path(state_dir)):
        with open(_ledger_path(state_dir)) as f:
            seen = set(json.load(f))
    files = sorted(
        os.path.join(input_dir, f) for f in os.listdir(input_dir)
        if f.endswith(".parquet"))
    new = [f for f in files if f not in seen]
    if not new:
        return None, []
    from ..operators.pipeline import extract_triples, triples_only
    df = spark.read.parquet(*new)
    return triples_only(extract_triples(df, canonicalize=canonicalize)), new


def commit_ingest(state_dir: str, new_files: list[str]) -> None:
    seen: set[str] = set()
    if os.path.exists(_ledger_path(state_dir)):
        with open(_ledger_path(state_dir)) as f:
            seen = set(json.load(f))
    seen.update(new_files)
    tmp = _ledger_path(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(sorted(seen), f)
    os.replace(tmp, _ledger_path(state_dir))


def stream_extract(spark: SparkSession, input_dir: str, *,
                   canonicalize: bool = False) -> DataFrame:
    """readStream over a transcript directory -> streaming triples DF.

    Caller attaches writeStream (parquet/console/memory sink). The
    fused mapInPandas stage is stateless, so it runs unchanged under
    the micro-batch engine.
    """
    from ..operators.pipeline import extract_triples, triples_only

    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .parquet(input_dir))
    return triples_only(extract_triples(stream, canonicalize=canonicalize))


def stream_windowed_mentions(transcripts_stream: DataFrame,
                             entities: DataFrame, *,
                             window: str = "5 minutes",
                             watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window mention counts per entity — the
    stateful-aggregation example: turns later than ``watermark``
    behind the max observed event time are dropped, and in append
    mode a window emits once the watermark passes its end.

    The whole lineage stays on ONE watermarked projection (tokenize →
    broadcast entity join → window agg): re-joining back to the raw
    stream would sever the watermark from the aggregation's event-time
    column and Spark rejects the plan."""
    wm = transcripts_stream.withWatermark("ts", watermark)
    toks = wm.select(
        "conv_id", "turn_idx", "ts",
        F.explode(F.array_distinct(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9_]+"),
                     lambda x: x != ""))).alias("token"))
    ents = entities.select(F.lower(F.col("surface")).alias("token"),
                           "entity_id", "kind")
    return (toks.join(F.broadcast(ents), "token")
            .groupBy(F.window("ts", window), "entity_id")
            .agg(F.count(F.lit(1)).alias("mentions")))


def stream_dedup_turns(transcripts_stream: DataFrame, *,
                       state_ttl_minutes: int = 60) -> DataFrame:
    """Exactly-once turn processing across micro-batches: a CUSTOM
    STATEFUL operator via applyInPandasWithState. State per conv_id is
    the set of turn_idx values already emitted; replayed/duplicated
    turns (at-least-once sources re-deliver on recovery) are dropped
    before the expensive extraction stage. State expires after
    ``state_ttl_minutes`` of processing-time inactivity so the store
    stays bounded by ACTIVE conversations, not corpus history.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = TRANSCRIPT_SCHEMA
    state_schema = "seen array<int>"

    def dedup(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh = pdf[~pdf["turn_idx"].isin(seen)]
            # first occurrence within the batch wins, too
            fresh = fresh.drop_duplicates(subset=["turn_idx"], keep="first")
            if len(fresh):
                seen.update(int(t) for t in fresh["turn_idx"])
                yield fresh
        state.update((sorted(seen),))
        state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)

    return (transcripts_stream
            .groupBy("conv_id")
            .applyInPandasWithState(
                dedup, outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
