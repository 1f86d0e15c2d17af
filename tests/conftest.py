from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # tests stay light; bench scales up


@pytest.fixture(scope="session")
def spark():
    from lucene_mapreduce_spark.session import get_spark

    s = get_spark("lmr-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
