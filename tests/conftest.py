import pytest


@pytest.fixture(scope="session")
def spark():
    from kenlm_rs_spark.spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
