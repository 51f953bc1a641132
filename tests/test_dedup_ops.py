"""minhash_lsh_pairs hot-bucket cap + connected-component dedup."""

import pytest
from pyspark.sql import functions as F

from jsonld_js_spark.operators.dedup import dedup_components, minhash_lsh_pairs


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # a hot cluster: 30 docs sharing most tokens (same bucket)
    for i in range(30):
        toks = [f"w{j}" for j in range(20)] + [f"u{i}"]
        rows.append((i, toks))
    # a small pair of near-dups
    rows.append((100, [f"x{j}" for j in range(10)]))
    rows.append((101, [f"x{j}" for j in range(9)] + ["y"]))
    # singletons
    for i in range(200, 205):
        rows.append((i, [f"z{i}{j}" for j in range(8)]))
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>").cache()
    df.count()
    return df


def test_uncapped_pairs_quadratic_in_cluster(docs):
    pairs, dropped = minhash_lsh_pairs(docs, threshold=0.5)
    p = pairs.collect()
    assert dropped.count() == 0
    # hot cluster: nearly all 30*29/2=435 pairs present (LSH is
    # probabilistic; a few pairs may miss every band)
    hot = [r for r in p if r["doc1"] < 100]
    assert len(hot) >= 400
    assert {(r["doc1"], r["doc2"]) for r in p if r["doc1"] >= 100} == {(100, 101)}


def test_capped_pairs_star_and_reported(docs):
    pairs, dropped = minhash_lsh_pairs(docs, threshold=0.5, max_bucket=10)
    p = pairs.collect()
    # hot cluster degraded to a star around doc 0: 29 pairs, all (0, i)
    hot = [r for r in p if r["doc1"] < 100]
    assert len(hot) == 29
    assert all(r["doc1"] == 0 for r in hot)
    # the drop is reported, never silent
    d = dropped.collect()
    assert len(d) >= 1 and all(r["size"] > 10 for r in d)
    # the small pair is untouched
    assert {(r["doc1"], r["doc2"]) for r in p if r["doc1"] >= 100} == {(100, 101)}


def test_components_connect_capped_cluster(docs):
    pairs, _ = minhash_lsh_pairs(docs, threshold=0.5, max_bucket=10)
    comp = {r["doc_id"]: r["component"] for r in dedup_components(pairs).collect()}
    # the star keeps the full hot cluster in ONE component
    assert len({comp[i] for i in range(30)}) == 1
    assert comp[100] == comp[101]
    assert comp[100] != comp[0]
