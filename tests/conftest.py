from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_bigdata_project_spark import registry  # noqa: E402

registry.load()

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from weather_bigdata_project_spark.session import get_spark

    s = get_spark("pytest", cpus=8)
    yield s
    s.stop()
