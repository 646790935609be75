import sys

import pytest

sys.path.insert(0, "/root/repo")

FIXTURES = "/root/reference/src/test/resources"  # read-only reference fixtures


@pytest.fixture(scope="session")
def spark():
    from disq_spark.session import get_session

    s = get_session("disq_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES
