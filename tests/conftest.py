import pytest

from networkit_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("networkit-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
