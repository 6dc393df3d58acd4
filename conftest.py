"""Repo-root conftest: shared SparkSession fixture for all tests."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    from bio_re_with_entity_embeddings_spark.session import get_spark
    from bio_re_with_entity_embeddings_spark.deploy import ensure_shipped

    s = get_spark(app_name="kg-tests", master="local[8]", shuffle_partitions=8)
    ensure_shipped(s)
    yield s
    s.stop()
