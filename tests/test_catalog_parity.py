"""Every catalog query with an oracle must match DuckDB at sf0.001 —
the same gate the driver applies at sf0.01. An opt-in leg re-runs the
full catalog at sf0.01 itself (GMALL_PARITY_SF=0.01 or -m sf001) to
catch scale-dependent divergences before the driver does."""

from __future__ import annotations

import os

import pytest

from realtime_gmall_flink_spark.plans.catalog import catalog

from .conftest import SF_DIR
from .oracle_utils import compare

SF001_DIR = "/root/testdata/sf0.01"

_QUERIES = sorted(catalog().values(), key=lambda q: q.name)


@pytest.mark.parametrize(
    "qdef", [q for q in _QUERIES if q.oracle], ids=lambda q: q.name
)
def test_oracle_parity(spark, qdef):
    df = qdef.builder(spark, SF_DIR)
    problems = compare(df, qdef.oracle, SF_DIR)
    assert not problems, "\n".join(problems)


@pytest.mark.sf001
@pytest.mark.skipif(
    os.environ.get("GMALL_PARITY_SF") != "0.01",
    reason="opt-in driver-scale leg: set GMALL_PARITY_SF=0.01",
)
@pytest.mark.parametrize(
    "qdef", [q for q in _QUERIES if q.oracle], ids=lambda q: q.name
)
def test_oracle_parity_sf001(spark, qdef):
    """The driver grades at sf0.01; sf0.001 parity can pass while sf0.01
    diverges (dtype widening, percentile interpolation — r2's
    shipment_lateness hash miss was exactly this class)."""
    df = qdef.builder(spark, SF001_DIR)
    problems = compare(df, qdef.oracle, SF001_DIR)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize(
    "qdef", [q for q in _QUERIES if not q.oracle], ids=lambda q: q.name
)
def test_rows_only(spark, qdef):
    df = qdef.builder(spark, SF_DIR)
    assert df.count() >= 0


def test_driver_window_invariants():
    """The driver hashes exactly the first DRIVER_CAP catalog entries in
    registration order; the computed DRIVER_WINDOW must fill that window
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


def test_rotation_pool_is_exhaustive():
    """Every registered entry sits in exactly one of CORE_WINDOW /
    ROTATION_POOL / ROWS_ONLY_TAIL — a new register() without a pool
    line fails here, so nothing can be added that silently never gets a
    driver row. The tail must be exactly the oracle-less entries (the
    hashed window stays all-oracle: a driver row for a rows-only entry
    is just a rows-check, their real gates are the numeric pytest
    assertions) and CORE/POOL must be all-oracle."""
    from realtime_gmall_flink_spark.plans.catalog import (
        CORE_WINDOW,
        ROTATION_POOL,
        catalog,
        rows_only_tail,
    )

    cat = catalog()
    core, pool = set(CORE_WINDOW), set(ROTATION_POOL)
    assert len(core) == len(CORE_WINDOW)
    assert len(pool) == len(ROTATION_POOL)
    assert not core & pool
    assert core | pool <= set(cat)
    # everything outside CORE/POOL must be a rows-only entry (the
    # derived tail), so an oracle-backed register() without a pool line
    # fails here and can never silently miss its driver rows
    assert set(rows_only_tail()) == {
        n for n, q in cat.items() if not q.oracle
    }


def test_rotation_every_position_valid_and_cycle_covers_all():
    """At every rotation position the window is DRIVER_CAP unique
    registered names containing all of CORE_WINDOW; a full cycle gives
    every catalog entry a driver row. Position 0 must equal the round-5
    pinned window (as a set) so rotation can never regress a
    previously green round."""
    import math

    from realtime_gmall_flink_spark.plans.catalog import (
        CORE_WINDOW,
        DRIVER_CAP,
        ROTATION_BASE_ROUND,
        ROTATION_POOL,
        ROTATION_SLOTS,
        catalog,
        driver_window,
    )

    from realtime_gmall_flink_spark.plans.catalog import rows_only_tail

    tail = set(rows_only_tail())
    cycle = math.ceil(len(ROTATION_POOL) / ROTATION_SLOTS)
    covered = set()
    for r in range(ROTATION_BASE_ROUND, ROTATION_BASE_ROUND + cycle):
        w = driver_window(r)
        assert len(w) == DRIVER_CAP
        assert len(set(w)) == DRIVER_CAP
        assert set(CORE_WINDOW) <= set(w)
        assert set(w) <= set(catalog())
        assert not set(w) & tail
        covered |= set(w)
    assert covered == set(catalog()) - tail
    # pre-rotation rounds clamp to position 0
    assert set(driver_window(1)) == set(driver_window(ROTATION_BASE_ROUND))
    r5_window = set(CORE_WINDOW) | set(ROTATION_POOL[:ROTATION_SLOTS])
    assert set(driver_window(ROTATION_BASE_ROUND)) == r5_window


def test_round_index_env_override(monkeypatch):
    from realtime_gmall_flink_spark.plans.catalog import (
        _round_index,
        driver_window,
    )

    monkeypatch.setenv("GMALL_DRIVER_ROUND", "8")
    assert _round_index() == 8
    # malformed override falls through to the artifact count, exactly
    # as if the variable were unset
    monkeypatch.setenv("GMALL_DRIVER_ROUND", "not-a-number")
    garbled = _round_index()
    monkeypatch.delenv("GMALL_DRIVER_ROUND")
    assert garbled == _round_index()
    assert len(driver_window(8)) == 50


def test_uv_window_approx_within_rsd_of_exact(spark):
    """Accuracy gate for the one oracle-less numeric entry: the HLL
    estimate in traffic_uv_window_approx (rsd=0.02) must land within
    3x the configured rsd of exact countDistinct per window at sf0.01
    (3 standard errors; small windows get an absolute floor of 2 since
    sparse-mode HLL is near-exact there). A wrong rsd, wrong column, or
    broken sketch fails this even though the driver's check is
    rows-only."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.operators.windows import tumble_agg
    from realtime_gmall_flink_spark.plans.traffic import (
        traffic_uv_window_approx,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    approx = traffic_uv_window_approx(spark, SF001_DIR)
    ev = load_table(spark, SF001_DIR, "events")

    exact = tumble_agg(
        ev,
        "ts",
        "10 minutes",
        ["event_type"],
        {"uv_ct_exact": F.countDistinct("user_id")},
    )
    joined = approx.join(exact, ["stt", "edt", "event_type"], "full").select(
        "uv_ct_approx", "uv_ct_exact"
    )
    rows = joined.collect()
    assert rows, "no windows to compare"
    bad = [
        (r.uv_ct_approx, r.uv_ct_exact)
        for r in rows
        if r.uv_ct_approx is None
        or r.uv_ct_exact is None
        or abs(r.uv_ct_approx - r.uv_ct_exact)
        > max(3 * 0.02 * r.uv_ct_exact, 2)
    ]
    assert not bad, f"HLL outside 3*rsd of exact: {bad[:5]}"


def test_length_percentiles_approx_within_band(spark):
    """Accuracy gate for the second oracle-less scale variant: each
    percentile_approx value must land inside the exact +/-0.05 quantile
    band of its group at sf0.01 (percentile_approx returns a real data
    value near the target quantile; the band is the principled bound)."""
    from pyspark.sql import functions as F

    from realtime_gmall_flink_spark.functions.textstats import token_count
    from realtime_gmall_flink_spark.plans.textops import (
        doc_length_percentiles_approx,
    )
    from realtime_gmall_flink_spark.sources.testdata import load_table

    approx = {
        r["source"]: r
        for r in doc_length_percentiles_approx(spark, SF001_DIR).collect()
    }
    docs = load_table(spark, SF001_DIR, "documents")
    bands = {
        r["source"]: r
        for r in docs.groupBy("source")
        .agg(
            *[
                F.percentile(token_count("text"), F.lit(q)).alias(
                    f"tok_{int(q * 100)}"
                )
                for q in (0.45, 0.55, 0.85, 0.95)
            ],
            F.percentile(F.length("text"), F.lit(0.94)).alias("ch_94"),
            F.percentile(F.length("text"), F.lit(1.0)).alias("ch_100"),
        )
        .collect()
    }
    assert approx and set(approx) == set(bands)
    for src, a in approx.items():
        b = bands[src]
        assert b["tok_45"] <= a["p50_tokens"] <= b["tok_55"], src
        assert b["tok_85"] <= a["p90_tokens"] <= b["tok_95"], src
        assert b["ch_94"] <= a["p99_chars"] <= b["ch_100"], src


def test_driver_window_oracles_no_hugeint():
    """An un-cast SUM in a DuckDB oracle yields HUGEINT, which the
    driver's value-hash cannot reproduce from Spark's bigint/double —
    every windowable oracle (any rotation position can surface any
    CORE/POOL entry) must describe clean of HUGEINT columns."""
    from realtime_gmall_flink_spark.plans.catalog import (
        CORE_WINDOW,
        ROTATION_POOL,
        catalog,
    )

    from .oracle_utils import duck_connection

    cat = catalog()
    con = duck_connection(SF_DIR)
    bad = []
    for name in (*CORE_WINDOW, *ROTATION_POOL):
        oracle = cat[name].oracle
        if not oracle:
            continue
        types = con.execute(f"DESCRIBE {oracle}").fetchall()
        for col, typ, *_ in types:
            if "HUGEINT" in typ.upper():
                bad.append((name, col, typ))
    assert not bad, f"HUGEINT oracle columns in driver window: {bad}"
