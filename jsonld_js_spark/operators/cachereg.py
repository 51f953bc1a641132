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

import threading

from pyspark.sql import DataFrame

# SINGLE-THREADED SEQUENTIAL-DRIVER ASSUMPTION (documented limit, not
# an accident): the registry is process-global, and release_caches()
# at the start of pipeline N+1 unpersists EVERYTHING registered
# before, assuming pipeline N has been fully materialized by then —
# exactly how the driver gate and bench consume the battery. Composing
# two library pipelines inside ONE unmaterialized query, or building
# queries from several driver threads, would drop the first pipeline's
# caches early (correct but recomputes lineage). The lock only makes
# the registry itself race-free; it does not change that contract.
_LOCK = threading.Lock()
_LIVE: list[DataFrame] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register for release when the next scoped
    pipeline starts (or on an explicit :func:`release_caches`)."""
    df = df.cache()
    with _LOCK:
        _LIVE.append(df)
    return df


def release_caches() -> None:
    """Unpersist every scoped cache registered so far (non-blocking;
    safe on stopped sessions — failures are ignored)."""
    with _LOCK:
        live, _LIVE[:] = list(_LIVE), []
    for df in live:
        try:
            df.unpersist()
        except Exception:
            pass
