"""Log-side pipeline tests (BaseLogApp split, is_new repair, UV, jump-out),
including the reference's canonical 4-row CEP fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_gmall_flink_spark.gmall import log_etl

from . import gmall_fixtures as FX


@pytest.fixture(scope="module")
def parsed(spark):
    raw = spark.createDataFrame(
        [(r,) for r in FX.topic_log_rows()], "value string"
    )
    return log_etl.parse_topic_log(raw).cache()


def test_dirty_routing(parsed):
    split = log_etl.split_log(parsed)
    assert split["dirty"].count() == 1
    assert split["dirty"].collect()[0]["raw"] == "not-json{{{"


def test_split_counts(parsed):
    split = log_etl.split_log(parsed)
    assert split["start"].count() == 1
    assert split["err"].count() == 1
    # 11 page records (start record carries no page; err record has a page
    # but start-less so it also counts as page)
    assert split["page"].count() == 11
    # two displays exploded from one record, one action
    assert split["display"].count() == 2
    assert split["action"].count() == 1
    d = split["display"].select("display.item").collect()
    assert sorted(r["item"] for r in d) == ["S1", "S2"]


def test_is_new_repair(parsed):
    repaired = log_etl.repair_is_new(parsed.filter(~F.col("__dirty")))
    rows = {
        (r["mid"], r["ts"]): r["is_new_fixed"]
        for r in repaired.select("mid", "ts", "is_new_fixed").collect()
    }
    # M1 day1 rows keep 1, M1 day2 row repaired to 0
    assert rows[("M1", FX.ms(FX.DAY1, "10:00:01"))] == 1
    assert rows[("M1", FX.ms(FX.DAY2, "09:00:00"))] == 0
    # M2 claims 0 -> stays 0 even on its first observed date
    assert rows[("M2", FX.ms(FX.DAY1, "11:00:00"))] == 0


def test_unique_visitor_detail(parsed):
    page = log_etl.split_log(parsed)["page"]
    uv = log_etl.unique_visitor_detail(page)
    got = {(r["mid"], r["ts"]) for r in uv.select("mid", "ts").collect()}
    assert got == {
        ("M1", FX.ms(FX.DAY1, "10:00:01")),
        ("M1", FX.ms(FX.DAY2, "09:00:00")),
        ("M2", FX.ms(FX.DAY1, "11:00:00")),
        ("M3", FX.ms(FX.DAY1, "12:00:00")),
        ("M4", FX.ms(FX.DAY1, "13:00:00")),
    }


def test_jump_out(parsed):
    page = log_etl.split_log(parsed)["page"]
    jumps = log_etl.user_jump_detail(page)
    got = {
        (r["mid"], r["ts"])
        for r in jumps.select(F.col("common.mid").alias("mid"), "ts").collect()
    }
    assert got == {
        # M2: start followed 5 min later (beyond 10 s) -> jump
        ("M2", FX.ms(FX.DAY1, "11:00:00")),
        # M3: start followed by another start within 10 s -> jump;
        # second start dangling -> jump
        ("M3", FX.ms(FX.DAY1, "12:00:00")),
        ("M3", FX.ms(FX.DAY1, "12:00:08")),
        # M1 day2 single view dangling -> jump
        ("M1", FX.ms(FX.DAY2, "09:00:00")),
        # M4 day1 start followed 11 days later; day12 login has
        # last_page_id so it's not a start but arrives late -> day1 jumps;
        ("M4", FX.ms(FX.DAY1, "13:00:00")),
    }


def test_cep_canonical_fixture(spark):
    """DwdTrafficUserJumpDetail.java:76-83 — expected: mid 101 only
    (102's start is followed within 10 s by a non-start page)."""
    raw = spark.createDataFrame([(r,) for r in FX.CEP_FIXTURE], "value string")
    page = log_etl.split_log(log_etl.parse_topic_log(raw))["page"]
    jumps = log_etl.user_jump_detail(page)
    got = [
        (r["mid"], r["ts"])
        for r in jumps.select(F.col("common.mid").alias("mid"), "ts").collect()
    ]
    assert got == [("101", 10000)]
