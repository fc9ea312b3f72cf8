"""The connector-on-the-oracle-path harness queries (VERDICT r1 #1): each
reads driver testdata through the real Delta Sharing stack (mock server +
DeltaSharingReader / format('deltasharing') / catalog SQL)."""

from __future__ import annotations

import pytest

from datafusion_delta_sharing_spark.harness import connector as C
from datafusion_delta_sharing_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark("connector-harness-tests", cpus=4)


def test_connector_flagship_http_path(spark):
    df = C.q_connector_flagship(spark, SF_DIR)
    assert df.columns == ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"]
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.c_acctbal >= 1000.0 for r in rows)
    # ranged executor fetch really hit the mock server
    server = C._SERVED[SF_DIR]["server"]
    assert any(r["path"] == "/customer-0.parquet" for r in server.requests)


def test_connector_partitioned_reattaches_status(spark):
    df = C.q_connector_partitioned(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    # o_orderstatus is NOT in the staged data files; it must come back from
    # partition-value decode on every row
    assert {r.o_orderstatus for r in rows} == {"F"}
    assert all(r.o_totalprice > 150000.0 for r in rows)


def test_connector_datasource_agg(spark):
    rows = C.q_connector_datasource(spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 5  # one per mktsegment
    assert all(r.n_customers > 0 for r in rows)


def test_connector_catalog_sql_join(spark):
    rows = C.q_connector_catalog_sql(spark, SF_DIR).collect()
    assert len(rows) >= 1
    assert all(r.revenue > 0 for r in rows)
