"""Date/time helpers matching the reference's conventions.

The reference formats epoch-millis to `yyyy-MM-dd [HH:mm:ss]` strings in
GMT+8 (utils/DateFormatUtil.java:10-35; tz set at
DwdTradeOrderPreProcess.java:54) and multiplies topic_db's epoch-seconds
by 1000 on the DWS side (DwsTradeOrderWindow.java:173).

These helpers pin the zone explicitly instead of relying on the session
timezone, so results are identical no matter what session the engine runs
in. The oracle-checked catalog avoids zones entirely (TIMESTAMP_NTZ); use
these only for gmall-facing string formatting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GMALL_TZ = "Asia/Shanghai"  # GMT+8


def _local(ts: Column) -> Column:
    """Instant -> naive local time in the gmall zone."""
    return F.from_utc_timestamp(ts, GMALL_TZ)


def ms_to_date_str(ms: Column | str) -> Column:
    """epoch ms -> 'yyyy-MM-dd' in GMT+8 (DateFormatUtil.toDate)."""
    c = F.col(ms) if isinstance(ms, str) else ms
    return F.date_format(_local(F.timestamp_millis(c)), "yyyy-MM-dd")


def ms_to_datetime_str(ms: Column | str) -> Column:
    """epoch ms -> 'yyyy-MM-dd HH:mm:ss' in GMT+8 (toYmdHms)."""
    c = F.col(ms) if isinstance(ms, str) else ms
    return F.date_format(
        _local(F.timestamp_millis(c)), "yyyy-MM-dd HH:mm:ss"
    )


def date_str_to_ms(s: Column | str) -> Column:
    """'yyyy-MM-dd[ HH:mm:ss]' in GMT+8 -> epoch ms (toTs)."""
    c = F.col(s) if isinstance(s, str) else s
    return (
        F.to_utc_timestamp(F.to_timestamp(c), GMALL_TZ).cast("double") * 1000
    ).cast("long")


def sec_str_to_event_time(sec: Column | str) -> Column:
    """topic_db epoch-seconds string -> timestamp instant (x1000 idiom)."""
    c = F.col(sec) if isinstance(sec, str) else sec
    return F.timestamp_seconds(c.cast("long"))
