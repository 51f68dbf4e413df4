import pytest

from anycrawl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("anycrawl-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
