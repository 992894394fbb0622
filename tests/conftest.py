from __future__ import annotations

import pytest

from sema_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="sema_spark-tests",
        cores=4,
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
    s.stop()
