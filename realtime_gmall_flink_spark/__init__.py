"""PySpark-native analytics engine with the query surface of
cresentboy/realtime-gmall-flink (reference: /root/reference, read-only).

The reference is a fixed DAG of ~27 Flink streaming jobs (ODS->DIM->DWD->DWS
over Kafka). This package re-expresses the same query semantics Spark-first:

- ``sources``   : readers for the driver test tables, the gmall ODS envelopes
                  (topic_log nested JSON, topic_db Maxwell CDC), and Kafka.
- ``operators`` : the operator families of SURVEY.md section 2 — latest-row
                  dedup (D1), first-visit repair (D4), per-day distinct (A6),
                  jump-out detection (W5/CEP), tumbling windows (W1-W4),
                  config-driven routing (J6/P9), dimension join cascades (J5).
- ``functions`` : scalar/table function surface — tokenizer (F1), text
                  analytics, dedup sketches (MinHash/SimHash), similarity.
- ``plans``     : the query catalog (driver-checkable queries + DuckDB
                  oracles) and the gmall DWD/DWS pipeline definitions.
- ``streaming`` : Structured Streaming variants of the same pipelines.

Everything is DataFrame/SQL on Catalyst; no custom planner rules are needed
(SURVEY.md section 4). Batch and streaming share the column logic.
"""

__version__ = "0.1.0"
