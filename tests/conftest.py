from __future__ import annotations

import pytest

from snapcrawler_spark.fixtures import load_fixture
from snapcrawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    sp = get_spark("snapcrawler-tests", shuffle_partitions=8)
    yield sp


@pytest.fixture(scope="session")
def web_xs():
    return load_fixture(42, "xs")


@pytest.fixture(scope="session")
def web_s():
    return load_fixture(42, "s")
