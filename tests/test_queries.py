"""Pre-validate the driver contract: every queries() entry vs its
DuckDB oracle at sf0.001 (the driver runs the same comparison at
sf0.01). Compare row count, column names, and order-insensitive
values (stringified, sorted) — a superset of the driver's hash check.
"""

import math

import duckdb
import pytest

from jsonld_js_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    return str(v)


def _rows_to_set(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLED = [(name, fn, sql) for name, (fn, sql) in QUERIES.items() if sql]
NO_ORACLE = [(name, fn) for name, (fn, sql) in QUERIES.items() if not sql]


@pytest.mark.parametrize("name,fn,sql", ORACLED, ids=[n for n, _, _ in ORACLED])
def test_query_matches_oracle(spark, ddb, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), \
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), \
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    sset = _rows_to_set(spark_rows, spark_cols)
    dset = _rows_to_set(duck_rows, duck_cols)
    if sset != dset:
        diff_s = [r for r in sset if r not in dset][:5]
        diff_d = [r for r in dset if r not in sset][:5]
        raise AssertionError(f"{name}: value mismatch\n spark-only={diff_s}\n duck-only={diff_d}")


@pytest.mark.parametrize("name,fn", NO_ORACLE, ids=[n for n, _ in NO_ORACLE])
def test_rows_only_queries_run(spark, name, fn):
    sdf = fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
