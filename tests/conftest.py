from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kinesis_to_firehose_spark.session import get_spark  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "soak: long sf0.1 streaming soak — excluded from the default "
        "run; select with `pytest -m soak`",
    )


def pytest_collection_modifyitems(config, items):
    # CI-optional: soak tests run only when the -m expression names
    # them (round-7 verdict task 8)
    if "soak" in (config.option.markexpr or ""):
        return
    skip = pytest.mark.skip(reason="soak: run with `pytest -m soak`")
    for item in items:
        if "soak" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kinesis-to-firehose-spark-tests", cpus=8)
    yield s
