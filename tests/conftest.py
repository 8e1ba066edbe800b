from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dcc_validate_metadata_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def fixture_dir(spark, tmp_path_factory):
    """Small deterministic image_caption fixture + goldens, built once."""
    from dcc_validate_metadata_spark.sources.image_table import generate_image_fixture

    d = tmp_path_factory.mktemp("imgfix")
    generate_image_fixture(d, n_rows=1000, seed=42, n_buckets=4, spark=spark)
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"
