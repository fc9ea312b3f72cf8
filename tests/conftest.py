import pytest


@pytest.fixture(scope="session")
def spark():
    from datafusion_delta_sharing_spark.session import get_spark

    session = get_spark("tests", cpus=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
