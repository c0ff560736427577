import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tytodb_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
# override to run the full differential gate at another scale factor
# (e.g. SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.001 catches
# fixture-coupled bugs the default sf0.01 gate can't see)
SF_ORACLE = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)


@pytest.fixture(scope="session")
def spark():
    # cpus: all 32 by default (r12). The suite's wall-clock is a driver
    # gate (the r11 verify pass was killed at ~26% progress), and its
    # biggest block — the 515-query DuckDB differential — is
    # core-bound, not submission-bound, at 8 cores: measured 403 s at
    # local[8] vs 281 s (8 submitter threads) / 198 s (16 threads) at
    # local[32] on the same box. Nothing in the suite depends on the
    # core count (partition-invariance is itself under test); override
    # with SPARK_GRAFT_TEST_CPUS for constrained boxes.
    spark = get_spark(
        "tytodb_spark_tests",
        cpus=os.environ.get("SPARK_GRAFT_TEST_CPUS", "32"),
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def oracle_sf_dir():
    return SF_ORACLE


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="run sf0.1 scale-smoke tests (see tests/test_scale_smoke.py)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: sf0.1 scale smoke (needs --run-slow)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip = pytest.mark.skip(reason="needs --run-slow (sf0.1 scale smoke)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
