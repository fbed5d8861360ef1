import os

import pytest

from efficient_trees_spark.session import get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_MEDIUM = os.environ.get("SPARK_GRAFT_SF_MEDIUM", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    session = get_spark(
        app_name="efficient-trees-spark-tests",
        shuffle_partitions=8,
        # UI enabled so test_shuffle_budget can read stage byte metrics
        # (REST); the port auto-increments if 4040 is taken, and the
        # status store costs a few MB over a 46-minute suite.
        extra_conf={"spark.driver.memory": "4g", "spark.ui.enabled": "true"},
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium():
    return SF_MEDIUM
