import pytest


@pytest.fixture(scope="session")
def spark():
    from jsonld_js_spark.session import build_session

    s = build_session("jsonld-js-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
