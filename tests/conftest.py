from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marmot_spark.fixtures import write_fixture_dir
from marmot_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("marmot_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fixtures")
    write_fixture_dir(str(d), n_rows=2000)
    return str(d)


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
