from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from data_pipeline_capstone_project_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
