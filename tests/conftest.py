from __future__ import annotations

import pytest

from data_validator_guard_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("dvg-tests", master="local[4]", extra_confs={"spark.sql.shuffle.partitions": "8"})
    yield s
