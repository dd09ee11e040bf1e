from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from osm_pt_validator_spark.session import ensure_py_files, get_spark

    s = get_spark("osm-pt-validator-tests", cores=4, shuffle_partitions=4)
    # builds/refreshes the executor py-files zip (also required by the
    # spark-submit deployment test on a fresh checkout)
    ensure_py_files(s)
    yield s
    s.stop()


SF_DIR_001 = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf001():
    return SF_DIR_001


@pytest.fixture(scope="session")
def sf01():
    return SF_DIR_01
