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


def test_driver_window_invariants():
    """The driver hashes exactly the first DRIVER_CAP catalog entries in
    registration order; the pinned DRIVER_WINDOW must fill that window
    exactly (size, order, uniqueness) so graded operator families cannot
    silently fall out of the checked set."""
    from realtime_gmall_flink_spark.plans.catalog import (
        DRIVER_CAP,
        DRIVER_WINDOW,
        catalog,
    )

    assert len(DRIVER_WINDOW) == DRIVER_CAP
    assert len(set(DRIVER_WINDOW)) == DRIVER_CAP
    assert list(catalog())[:DRIVER_CAP] == list(DRIVER_WINDOW)


def test_driver_window_oracles_no_hugeint():
    """An un-cast SUM in a DuckDB oracle yields HUGEINT, which the
    driver's value-hash cannot reproduce from Spark's bigint/double —
    every windowed oracle must describe clean of HUGEINT columns."""
    from realtime_gmall_flink_spark.plans.catalog import (
        DRIVER_WINDOW,
        catalog,
    )

    from .oracle_utils import duck_connection

    cat = catalog()
    con = duck_connection(SF_DIR)
    bad = []
    for name in DRIVER_WINDOW:
        oracle = cat[name].oracle
        if not oracle:
            continue
        types = con.execute(f"DESCRIBE {oracle}").fetchall()
        for col, typ, *_ in types:
            if "HUGEINT" in typ.upper():
                bad.append((name, col, typ))
    assert not bad, f"HUGEINT oracle columns in driver window: {bad}"
