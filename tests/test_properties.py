"""Property-based tests: Spark operators vs pure-Python references on
random inputs (small example counts — each example is a Spark job)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from realtime_gmall_flink_spark.operators.dedup import latest_row_per_key
from realtime_gmall_flink_spark.operators.visitor import gap_flag

ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # key
        st.integers(min_value=0, max_value=5),     # version
        st.integers(min_value=0, max_value=99),    # unique-ish seq
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(ROWS)
def test_latest_row_matches_python(spark_global, rows):
    # make seq unique so ordering is total
    rows = [(k, v, i) for i, (k, v, _) in enumerate(rows)]
    df = spark_global.createDataFrame(rows, "k string, v int, seq int")
    got = {
        (r["k"], r["v"], r["seq"])
        for r in latest_row_per_key(df, ["k"], ["v", "seq"]).collect()
    }
    expected = {}
    for k, v, seq in rows:
        if k not in expected or (v, seq) > (
            expected[k][1], expected[k][2]
        ):
            expected[k] = (k, v, seq)
    assert got == set(expected.values())


DAYS = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=15
)


@settings(max_examples=8, deadline=None)
@given(DAYS)
def test_gap_flag_matches_python(spark_global, day_offsets):
    days = sorted(set(day_offsets))
    from datetime import date, timedelta

    base = date(2024, 1, 1)
    dates = [base + timedelta(days=d) for d in days]
    df = spark_global.createDataFrame(
        [("u", d) for d in dates], "uid string, ts date"
    )
    got = {
        r["ts"]: r["is_back"]
        for r in gap_flag(df, "uid", "ts", min_gap_days=8).collect()
    }
    expected = {}
    prev = None
    for d in dates:
        expected[d] = 1 if prev is not None and (d - prev).days >= 8 else 0
        prev = d
    assert got == expected


# session-scoped spark fixture adapted for hypothesis (function-scoped
# fixtures interact badly with @given)
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
