from __future__ import annotations

import tempfile

import pytest

from realtime_gmall_flink_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gmall-spark-tests", master="local[8]",
                  shuffle_partitions=8,
                  extra_confs={
                      "spark.sql.warehouse.dir": tempfile.mkdtemp(
                          prefix="gmall-wh-"
                      )
                  })
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
