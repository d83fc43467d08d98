from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ot_spark.session import get_spark  # noqa: E402
from ot_spark import synth  # noqa: E402

N_PAGES = 4000


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ot_spark_tests", parallelism=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("fixtures")
    synth.write_fixture_dir(str(out), n_pages=N_PAGES)
    return str(out)


@pytest.fixture(scope="session")
def pages(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/pages.parquet")


@pytest.fixture(scope="session")
def links(spark, fixture_dir):
    return spark.read.parquet(f"{fixture_dir}/links.parquet")


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
