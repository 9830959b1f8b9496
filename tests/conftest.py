import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl_spark.session import make_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = make_session(
        "crawl_spark_tests",
        master="local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "8"),
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture(scope="session")
def tiny_fixture(tmp_path_factory):
    """Deterministic tiny pages/seeds/robots fixture (seed 42)."""
    from crawl_spark.sources.fixtures import write_fixture

    out = str(tmp_path_factory.mktemp("fixture_tiny"))
    paths = write_fixture(out, "tiny")
    return paths
