import pytest

from anycrawl_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running stress case (hostile-input probes)"
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("anycrawl-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
