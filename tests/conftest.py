from __future__ import annotations

import shutil
import tempfile

import pytest

from realtime_gmall_flink_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # the warehouse dir is removed at teardown — without it every
    # pytest session leaks one /tmp/gmall-wh-* dir forever (282 had
    # accumulated by r9)
    wh = tempfile.mkdtemp(prefix="gmall-wh-")
    s = get_spark(app_name="gmall-spark-tests", master="local[8]",
                  shuffle_partitions=8,
                  extra_confs={"spark.sql.warehouse.dir": wh})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
    shutil.rmtree(wh, ignore_errors=True)
