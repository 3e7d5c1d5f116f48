from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from flyscrape_spark.session import get_spark

    spark = get_spark(
        app_name="flyscrape-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/fss-warehouse"},
    )
    yield spark
    spark.stop()
