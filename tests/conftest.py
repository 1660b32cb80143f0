from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gear5_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="gear5-tests",
        master=os.environ.get("SPARK_TEST_MASTER", "local[4]"),
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


@pytest.fixture(scope="session")
def tiny_changelog(tmp_path_factory):
    """sf-tiny: 10^4 events (FIXTURES.md §2)."""
    from gen_fixtures import generate_changelog

    d = str(tmp_path_factory.mktemp("changelog-tiny") / "log")
    manifest = generate_changelog(d, n_events=10_000, n_convs=100, chunk_rows=2_000)
    return d, manifest
