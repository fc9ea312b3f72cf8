import os

import pytest

# Single source of truth for the driver-generated parquet sets; tests that
# need a specific scale factor derive from this and SKIP if it is absent.
TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")


def sf_path(sf: str) -> str:
    """Path of one scale-factor set under the shared testdata root."""
    return os.path.join(TESTDATA_ROOT, sf)


@pytest.fixture(scope="session")
def spark():
    from datafusion_delta_sharing_spark.session import get_spark

    session = get_spark("tests", cpus=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return sf_path("sf0.001")
