"""Schema registry: fixed StructTypes for every ODS envelope the reference
consumes (SURVEY section 1.2-1.3).

The reference is schema-on-read (fastjson JSONObject on the DataStream side,
all-string DDLs on the SQL side). We declare the schemas once: ``from_json``
in PERMISSIVE mode reproduces the dirty-data tolerance (parse failure ->
null -> routed to the dirty sink, BaseLogApp.java:70-88).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_S = StringType()
_MAP_SS = MapType(StringType(), StringType())

# topic_log — frontend event log (BaseLogApp.java:153-183; FIXTURES.md 1)
LOG_COMMON = StructType(
    [
        StructField("mid", _S),
        StructField("uid", _S),
        StructField("vc", _S),
        StructField("ch", _S),
        StructField("ar", _S),
        StructField("is_new", _S),
    ]
)
LOG_PAGE = StructType(
    [
        StructField("page_id", _S),
        StructField("last_page_id", _S),
        StructField("during_time", LongType()),
        StructField("item", _S),
        StructField("item_type", _S),
    ]
)
LOG_DISPLAY = StructType(
    [
        StructField("item", _S),
        StructField("item_type", _S),
        StructField("pos_id", _S),
    ]
)
LOG_ACTION = StructType(
    [
        StructField("action_id", _S),
        StructField("item", _S),
        StructField("ts", LongType()),
    ]
)
TOPIC_LOG_SCHEMA = StructType(
    [
        StructField("common", LOG_COMMON),
        StructField("page", LOG_PAGE),
        # start/err route by presence; content is free-form -> map
        StructField("start", _MAP_SS),
        StructField("err", _MAP_SS),
        StructField("displays", ArrayType(LOG_DISPLAY)),
        StructField("actions", ArrayType(LOG_ACTION)),
        StructField("ts", LongType()),  # epoch millis
    ]
)

# topic_db — Maxwell-style CDC envelope (DwdTradeOrderPreProcess.java:57-65)
TOPIC_DB_SCHEMA = StructType(
    [
        StructField("database", _S),
        StructField("table", _S),
        StructField("type", _S),
        StructField("data", _MAP_SS),
        StructField("old", _MAP_SS),
        StructField("ts", _S),  # epoch seconds, string-typed as in the DDL
    ]
)

# base_dic dictionary (MysqlUtil.java:5-16)
BASE_DIC_SCHEMA = StructType(
    [
        StructField("dic_code", _S),
        StructField("dic_name", _S),
        StructField("parent_code", _S),
    ]
)

# table_process DIM routing config (bean/TableProcess.java:10-31)
TABLE_PROCESS_SCHEMA = StructType(
    [
        StructField("source_table", _S),
        StructField("sink_table", _S),
        StructField("sink_columns", _S),
        StructField("sink_pk", _S),
        StructField("sink_extend", _S),
    ]
)
