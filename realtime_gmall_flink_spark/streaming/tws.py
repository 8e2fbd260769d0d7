"""transformWithState implementations of the per-key stateful operators.

Spark 4's transformWithStateInPandas is the closest analog to the
reference's KeyedProcessFunction + ValueState (BaseLogApp.java:109-149,
DwdTrafficUniqueVisitorDetail.java:86-116): typed per-key state handles,
explicit timers, TTL support. These mirror streaming.stateful's
applyInPandasWithState forms; both are kept because the
StatefulProcessor API carries less per-batch overhead and supports state
TTL natively (W8), while applyInPandasWithState is the longer-stable API.

Runtime requirement: the transformWithStateInPandas server needs a
functional ``google.protobuf`` — absent in minimal containers (the test
skips itself there); applyInPandasWithState remains the default path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import StringType, StructField, StructType


class FirstPerDayProcessor(StatefulProcessor):
    """Emit each key's first row per calendar day (A6/W8: the ValueState
    last-date pattern; a date compare replaces the 1-day state TTL)."""

    def __init__(self, ts_col: str, out_cols: list[str]):
        self._ts_col = ts_col
        self._out_cols = out_cols

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "last_date", StructType([StructField("d", StringType())])
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        last = self._state.get()[0] if self._state.exists() else None
        outs = []
        for pdf in rows:
            pdf = pdf.sort_values(self._ts_col)
            dates = pdf[self._ts_col].dt.strftime("%Y-%m-%d")
            keep = []
            for idx, d in zip(pdf.index, dates):
                if d != last:
                    keep.append(idx)
                    last = d
            if keep:
                outs.append(pdf.loc[keep, self._out_cols])
        if last is not None:
            self._state.update((last,))
        for o in outs:
            yield o

    def close(self) -> None:
        pass


def tws_first_per_day(
    df: DataFrame,
    key: str,
    ts_col: str,
    out_schema: str,
    out_cols: list[str],
) -> DataFrame:
    return df.groupBy(key).transformWithStateInPandas(
        statefulProcessor=FirstPerDayProcessor(ts_col, out_cols),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="EventTime",
    )
