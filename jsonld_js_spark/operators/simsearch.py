"""Similarity search over embedding columns.

- :func:`brute_topk` — exact cosine top-k: `F.zip_with`/`F.aggregate`
  column algebra, no UDF; the correctness baseline (O(N·Q)).
- :func:`lsh_topk` — the scale path: signed-random-projection LSH.
  Deterministic ±1 hyperplane coefficients are derived from md5 (no
  RNG, resume-safe), signatures are banded, candidates come from a
  bucket equi-join (shuffle bounded by collisions, not N·Q), and the
  exact cosine re-rank runs only on candidates. At 100 TB the bucket
  join is the only shuffle and AQE handles hot buckets.

Recall is validated against brute force in tests/test_simsearch.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def _cosine(a: str, b: str):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def brute_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k of every query against the corpus.

    queries: (query_id, embedding). Queries are broadcast (they are
    the small side by construction)."""
    e = _as_double(embeddings, vec_col)
    q = _as_double(queries, vec_col).withColumnRenamed(vec_col, "_qv")
    joined = e.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col(query_id_col))
    scored = joined.select(
        query_id_col, id_col,
        F.round(_cosine(vec_col, "_qv"), 6).alias("cosine"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))


def _plane_coefs(dims: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 coefficients per (bit, dim) from md5 — derived
    on the driver and inlined as literals, nothing random at runtime."""
    return [[1.0 if hashlib.md5(f"{seed}:{b}:{d}".encode()).digest()[0] & 1
             else -1.0 for d in range(dims)]
            for b in range(bits)]


def _signatures(df: DataFrame, coefs: list[list[float]], *, id_col: str,
                vec_col: str, bands: int, bits: int) -> DataFrame:
    """(id, band, sig) rows computed entirely PER ROW: each bit's
    projection is an F.aggregate dot product against a literal ±1
    plane, band signatures are string concats, and bands explode to
    rows — zero shuffle before the bucket join (the old shape
    posexploded N x dims rows through a join + two groupBys)."""
    rows_per_band = bits // bands

    def proj(b: int):
        plane = F.array(*[F.lit(c) for c in coefs[b]])
        return F.aggregate(F.zip_with(vec_col, plane, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)

    bit_chars = [F.when(proj(b) >= 0, F.lit("1")).otherwise(F.lit("0"))
                 for b in range(bits)]
    band_structs = [
        F.struct(F.lit(i).alias("band"),
                 F.concat(*bit_chars[i * rows_per_band:
                                     (i + 1) * rows_per_band]).alias("sig"))
        for i in range(bands)]
    return (df.select(id_col, F.explode(F.array(*band_structs)).alias("bs"))
            .select(id_col, F.col("bs.band").alias("band"),
                    F.col("bs.sig").alias("sig")))


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             *, bits: int = 16, bands: int = 8, dims: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", seed: int = 42) -> DataFrame:
    """Banded signed-random-projection ANN: candidates share at least
    one band signature with the query; exact cosine re-ranks them."""
    coefs = _plane_coefs(dims, bits, seed)
    e = _as_double(embeddings, vec_col)
    q = _as_double(queries, vec_col)

    e_sig = _signatures(e, coefs, id_col=id_col, vec_col=vec_col,
                        bands=bands, bits=bits)
    q_sig = _signatures(q, coefs, id_col=query_id_col, vec_col=vec_col,
                        bands=bands, bits=bits)
    cand = (e_sig.join(q_sig, ["band", "sig"])
            .select(id_col, query_id_col).distinct())

    joined = (cand
              .join(e.select(id_col, F.col(vec_col).alias("_ev")), id_col)
              .join(F.broadcast(q.select(query_id_col,
                                         F.col(vec_col).alias("_qv"))),
                    query_id_col)
              .filter(F.col(id_col) != F.col(query_id_col)))
    scored = joined.select(
        query_id_col, id_col,
        (F.round(_cosine("_ev", "_qv"), 6) + F.lit(0.0)).alias("cosine"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             *, n_probe: int = 3, id_col: str = "vec_id",
             vec_col: str = "embedding", query_id_col: str = "query_id",
             label_col: str = "label") -> DataFrame:
    """IVF-style ANN using an existing coarse partition (the `label`
    column as cells): per query, probe the n_probe nearest cell
    centroids, exact-search only those cells."""
    e = _as_double(embeddings, vec_col)
    q = _as_double(queries, vec_col)

    centroids = (e.select(label_col, F.posexplode(vec_col).alias("dim", "v"))
                 .groupBy(label_col, "dim").agg(F.avg("v").alias("c"))
                 .groupBy(label_col)
                 .agg(F.array_sort(F.collect_list(F.struct("dim", "c")))
                      .alias("pairs"))
                 .select(label_col,
                         F.transform("pairs", lambda p: p["c"]).alias("cv")))
    probes = (q.crossJoin(F.broadcast(centroids))
              .select(query_id_col, label_col,
                      _cosine(vec_col, "cv").alias("ccos")))
    wp = Window.partitionBy(query_id_col).orderBy(F.col("ccos").desc())
    probe_cells = (probes.withColumn("rn", F.row_number().over(wp))
                   .filter(F.col("rn") <= n_probe)
                   .select(query_id_col, label_col))

    joined = (e.join(probe_cells, label_col)
              .join(F.broadcast(q.select(query_id_col,
                                         F.col(vec_col).alias("_qv"))),
                    query_id_col)
              .filter(F.col(id_col) != F.col(query_id_col)))
    scored = joined.select(
        query_id_col, id_col,
        F.round(_cosine(vec_col, "_qv"), 6).alias("cosine"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))
