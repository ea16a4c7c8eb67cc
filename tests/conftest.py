from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from duckdb_otlp_spark.session import get_spark  # noqa: E402
from tests.fixtures import write_fixtures  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("duckdb-otlp-spark-tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def otlp_fixtures(tmp_path_factory) -> dict[str, Path]:
    root = tmp_path_factory.mktemp("otlp_data")
    return write_fixtures(root)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
