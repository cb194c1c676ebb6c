from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests run on sf0.001/sf0.01 fixtures where a 32-thread local scheduler
# only adds dispatch overhead; 8 threads is measurably faster for the
# same coverage. setdefault: an explicit SPARK_GRAFT_CPUS from the
# driver still wins (the session reads it at import time below).
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from pyspark_movie_recommender_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.codegen.wholeStage": "false",
            "spark.sql.codegen.factoryMode": "NO_CODEGEN",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle_dir():
    return SF_ORACLE
