import pytest


@pytest.fixture(scope="session")
def spark():
    from pyproj_spark.session import get_spark
    sp = get_spark("pyproj_spark-tests", cores=4, shuffle_partitions=8)
    yield sp
