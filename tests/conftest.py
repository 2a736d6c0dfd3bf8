from __future__ import annotations

import os

import pytest

from node_mongo2influx_spark.engine import Engine

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def engine(tmp_path_factory):
    from node_mongo2influx_spark.config import EngineConfig

    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    eng = Engine.builder(
        app_name="m2i-spark-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        config=EngineConfig(
            spark_conf={"spark.sql.warehouse.dir": warehouse}
        ),
    )
    yield eng
    eng.spark.stop()


@pytest.fixture(scope="session")
def spark(engine):
    return engine.spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
