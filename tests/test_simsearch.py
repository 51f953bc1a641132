"""ANN operators: exactness of brute force, recall of LSH/IVF vs it."""

import pytest
from pyspark.sql import functions as F

from jsonld_js_spark.operators.simsearch import brute_topk, ivf_topk, lsh_topk

SF = "/root/testdata/sf0.001"
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def queries(spark, emb):
    return (emb.filter(F.col("vec_id") < 5)
            .select(F.col("vec_id").alias("query_id"), "embedding").cache())


@pytest.fixture(scope="module")
def brute(emb, queries):
    return {(r["query_id"], r["vec_id"]): r["cosine"]
            for r in brute_topk(emb, queries, K).collect()}


def test_brute_topk_shape(brute, queries):
    n_q = queries.count()
    assert len(brute) == n_q * K


def test_brute_matches_pairwise_definition(spark, emb, queries, brute):
    """Spot-check one query's scores with numpy."""
    import numpy as np

    q0 = np.array(queries.filter("query_id = 0").first()["embedding"], dtype="float64")
    rows = emb.filter("vec_id != 0").collect()
    cos = {
        r["vec_id"]: float(np.dot(np.array(r["embedding"], dtype="float64"), q0)
                           / (np.linalg.norm(r["embedding"]) * np.linalg.norm(q0)))
        for r in rows
    }
    expected = sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    got = sorted(((vid, c) for (q, vid), c in brute.items() if q == 0),
                 key=lambda kv: (-kv[1], kv[0]))
    assert [v for v, _ in expected] == [v for v, _ in got]
    for (v1, c1), (v2, c2) in zip(expected, got):
        assert abs(c1 - c2) < 1e-5


def _recall(approx_rows, brute, n_queries):
    hits = 0
    for r in approx_rows:
        if (r["query_id"], r["vec_id"]) in brute:
            hits += 1
    return hits / (n_queries * K)


def test_lsh_recall(emb, queries, brute):
    approx = lsh_topk(emb, queries, K, bits=16, bands=8).collect()
    rec = _recall(approx, brute, queries.count())
    # banded SRP-LSH on 64-dim data: generous bound, deterministic seed
    assert rec >= 0.5, f"LSH recall {rec}"


def test_lsh_candidates_bounded(emb, queries):
    """The point of LSH: candidate set must be much smaller than N*Q."""
    from jsonld_js_spark.operators.simsearch import _as_double, _plane_coefs, _signatures

    coefs = _plane_coefs(64, 32)
    e_sig = _signatures(_as_double(emb, "embedding"), coefs,
                        id_col="vec_id", vec_col="embedding", bands=4, bits=32)
    q_sig = _signatures(_as_double(queries, "embedding"), coefs,
                        id_col="query_id", vec_col="embedding", bands=4, bits=32)
    cand = e_sig.join(q_sig, ["band", "sig"]).select("vec_id", "query_id").distinct()
    n, q = emb.count(), queries.count()
    # 4 bands x 8 bits: random pairs collide rarely; near-dups survive
    assert cand.count() < 0.3 * n * q


def test_ivf_recall(emb, queries, brute):
    approx = ivf_topk(emb, queries, K, n_probe=4).collect()
    rec = _recall(approx, brute, queries.count())
    assert rec >= 0.3, f"IVF recall {rec}"


def test_approx_scores_are_exact_for_reported(emb, queries, brute):
    """Re-ranked candidates carry EXACT cosine — any reported pair that
    brute force also reports must agree on the score."""
    approx = lsh_topk(emb, queries, K).collect()
    for r in approx:
        key = (r["query_id"], r["vec_id"])
        if key in brute:
            assert abs(r["cosine"] - brute[key]) < 1e-9
