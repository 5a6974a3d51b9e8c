from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # small + fast for unit tests


@pytest.fixture(scope="session")
def spark():
    from crawl4ai_llm_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def store(spark, tmp_path):
    from crawl4ai_llm_spark.storage import ProductStore

    return ProductStore(spark, str(tmp_path / "warehouse"))


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
