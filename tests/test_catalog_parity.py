"""Every catalog query with an oracle must match DuckDB at sf0.001 —
the same gate the driver applies at sf0.01."""

from __future__ import annotations

import pytest

from realtime_gmall_flink_spark.plans.catalog import catalog

from .conftest import SF_DIR
from .oracle_utils import compare

_QUERIES = sorted(catalog().values(), key=lambda q: q.name)


@pytest.mark.parametrize(
    "qdef", [q for q in _QUERIES if q.oracle], ids=lambda q: q.name
)
def test_oracle_parity(spark, qdef):
    df = qdef.builder(spark, SF_DIR)
    problems = compare(df, qdef.oracle, SF_DIR)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize(
    "qdef", [q for q in _QUERIES if not q.oracle], ids=lambda q: q.name
)
def test_rows_only(spark, qdef):
    df = qdef.builder(spark, SF_DIR)
    assert df.count() >= 0
