import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geocode_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("geocode-spark-tests", parallelism=8, shuffle_partitions=8,
                  small_input=True)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def fixtures_dir(sf_dir):
    from geocode_spark.fixtures import ensure_fixtures

    return str(ensure_fixtures(sf_dir))
