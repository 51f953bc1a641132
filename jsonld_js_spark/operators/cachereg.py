"""Scoped cache registry: bound cache accumulation across queries.

The dedup/ANN pipelines cache mid-pipeline tables (dedup reps,
signature buckets, cast embedding corpora) because each feeds 2-4
consumers inside ONE query. Those ``.cache()`` calls used to leak:
nothing unpersisted them, so running the full battery in one session
(the driver gate does exactly that) accumulated every query's cached
blocks in executor memory.

``scoped_cache`` registers each cached DataFrame; ``release_caches``
(called at the START of every pipeline that uses scoped caching)
unpersists everything registered by PREVIOUS pipelines. By the time a
sequential driver builds query N+1 it has materialized query N, so
its caches are dead weight — and ``unpersist`` never invalidates
lineage, so even an interleaved consumer stays correct (it just
recomputes). Peak cached footprint = one pipeline's working set
instead of the whole battery's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register for release when the next scoped
    pipeline starts (or on an explicit :func:`release_caches`)."""
    df = df.cache()
    _LIVE.append(df)
    return df


def release_caches() -> None:
    """Unpersist every scoped cache registered so far (non-blocking;
    safe on stopped sessions — failures are ignored)."""
    for df in _LIVE:
        try:
            df.unpersist()
        except Exception:
            pass
    _LIVE.clear()
