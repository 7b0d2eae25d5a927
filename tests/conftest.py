import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from kafkaish_spark.session import get_spark

    s = get_spark("kafkaish-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from kafkaish_spark.sources.topic_log import Engine

    return Engine(spark, str(tmp_path / "topics"))


@pytest.fixture()
def engine_factory(spark, tmp_path):
    """Fresh Engine per call — hypothesis runs many examples inside one
    test invocation, each needing its own topic root."""
    import itertools

    from kafkaish_spark.sources.topic_log import Engine

    counter = itertools.count()

    def make():
        return Engine(spark, str(tmp_path / f"topics_{next(counter)}"))

    return make
