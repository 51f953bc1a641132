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


def _hyperplanes(spark, dims: int, bits: int, seed: int = 42) -> DataFrame:
    """Deterministic ±1 coefficients per (bit, dim) from md5 — every
    executor derives the same planes, nothing random at runtime."""
    rows = []
    for b in range(bits):
        for d in range(dims):
            h = hashlib.md5(f"{seed}:{b}:{d}".encode()).digest()[0]
            rows.append((b, d, 1.0 if h & 1 else -1.0))
    return spark.createDataFrame(rows, "bit int, dim int, coef double")


def _signatures(df: DataFrame, planes: DataFrame, *, id_col: str,
                vec_col: str, bands: int, bits: int) -> DataFrame:
    rows_per_band = bits // bands
    elem = df.select(id_col, F.posexplode(vec_col).alias("dim", "v"))
    bit_vals = (elem.join(F.broadcast(planes), "dim")
                .groupBy(id_col, "bit")
                .agg(F.sum(F.col("v") * F.col("coef")).alias("proj")))
    sig_bits = bit_vals.select(
        id_col, "bit",
        F.when(F.col("proj") >= 0, F.lit("1")).otherwise(F.lit("0")).alias("s"),
        (F.col("bit") / rows_per_band).cast("int").alias("band"))
    return (sig_bits.groupBy(id_col, "band")
            .agg(F.concat_ws("", F.sort_array(
                F.collect_list(F.struct("bit", "s")))["s"]).alias("sig")))


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             *, bits: int = 16, bands: int = 8, dims: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", seed: int = 42) -> DataFrame:
    """Banded signed-random-projection ANN: candidates share at least
    one band signature with the query; exact cosine re-ranks them."""
    spark = embeddings.sparkSession
    planes = _hyperplanes(spark, dims, bits, seed)
    e = _as_double(embeddings, vec_col)
    q = _as_double(queries, vec_col)

    e_sig = _signatures(e, planes, id_col=id_col, vec_col=vec_col,
                        bands=bands, bits=bits)
    q_sig = _signatures(q, planes, id_col=query_id_col, vec_col=vec_col,
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
        F.round(_cosine("_ev", "_qv"), 6).alias("cosine"))
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
