import os

import pytest

from miso_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("miso_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def registry(spark):
    from miso_spark.sources import SourceRegistry

    return SourceRegistry(spark).register_parquet_dir("t", SF_DIR)


@pytest.fixture(scope="session")
def compiler(registry):
    from miso_spark.compiler import Compiler

    return Compiler(registry)
