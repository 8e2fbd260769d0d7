"""The gmall warehouse pipelines: the reference's ~27 jobs re-expressed as
pure DataFrame transformations.

Layer map (SURVEY intro):
- ``log_etl``  : topic_log parse/split, visitor repair, UV, jump-out
                 (BaseLogApp, DwdTrafficUniqueVisitorDetail,
                 DwdTrafficUserJumpDetail).
- ``cdc``      : topic_db envelope parse + generic CDC extraction.
- ``dwd_db``   : the 13 db-side DWD fact tables (trade/tool/interaction/
                 user jobs).
- ``dims``     : table_process-driven dimension routing (DimSinkApp).
- ``dws``      : the 11 windowed summary tables.

Each function is ``DataFrame in -> DataFrame out`` with no I/O, so the same
code runs batch (tests, oracle) and streaming (streaming package wires
readStream/writeStream around it).
"""
