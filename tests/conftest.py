from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from croawl_spark.session import get_spark

    s = get_spark("croawl-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf001() -> str:
    return "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf0001() -> str:
    return "/root/testdata/sf0.001"
