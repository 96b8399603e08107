from __future__ import annotations

import pytest

from datachecker_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, shuffle_partitions=8, app_name="doccheck-tests")
    yield s
