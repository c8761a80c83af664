from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("data_ingestion_spark_tests", cpus=8)
    yield spark


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")


def rows_as_dicts(df):
    return [r.asDict() for r in df.collect()]
