"""Streaming stateful operators (SURVEY D1/D4/A6/W5 streaming forms).

The reference implements these with Flink keyed ValueState + timers; here
they are Arrow-batched ``applyInPandasWithState`` operators. State layouts
mirror the reference's:

- UV / first-per-day  : (key -> last seen date)        [A6, state TTL by
                        date compare, W8]
- first-visit repair  : (key -> first seen date)       [D4]
- jump-out            : (key -> pending session start) [W5, event-time
                        timeout via GroupStateTimeout.EventTimeTimeout]

Each processes whole micro-batch groups vectorized; per key the rows of a
batch are sorted by event time, so intra-batch ordering is deterministic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_per_day(
    df: DataFrame,
    key: str | list[str],
    ts_col: str,
    out_schema: str,
    out_cols: list[str],
) -> DataFrame:
    """Emit only each key's first row per calendar day (UV-detail operator,
    DwdTrafficUniqueVisitorDetail.java:86-116). ``df`` must be keyed-able
    on ``key`` (a column or list of columns, e.g. ``[mid, page_id]`` for
    the per-page UV state of DwsTrafficPageViewWindow) with a timestamp
    ``ts_col``; ``out_cols`` are passed through.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def fn(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (last_date,) = state.get if state.exists else (None,)
        outs = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(ts_col)
            dates = pdf[ts_col].dt.strftime("%Y-%m-%d").to_numpy()
            # sorted dates are non-decreasing, so "date changed vs the
            # running last_date" reduces to: first occurrence of each
            # distinct date, minus the leading date when the state
            # already saw it — vectorized instead of a per-row loop
            keep = np.concatenate(([True], dates[1:] != dates[:-1]))
            if last_date is not None and dates[0] == last_date:
                keep[0] = False
            last_date = dates[-1]
            if keep.any():
                outs.append(pdf.loc[keep, out_cols])
        state.update((last_date,))
        for o in outs:
            yield o

    return (
        df.groupBy(*keys)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="last_date string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_first_per_day_gap(
    df: DataFrame,
    key: str,
    ts_col: str,
    out_schema: str,
    out_cols: list[str],
    min_gap_days: int = 8,
    flag_col: str = "is_back",
) -> DataFrame:
    """First row per key per day, flagged ``is_back=1`` when the key's
    previous active date is >= ``min_gap_days`` earlier (the back-flow
    login detector, DwsUserUserLoginWindow.java:126-181: stored last-login
    date vs current date). First-ever sighting flags 0, like the batch
    lag() form (operators.visitor.gap_flag).

    ``out_schema`` must include ``flag_col`` as an int; ``out_cols`` are
    the passthrough columns (``flag_col`` is appended by the operator).
    """

    def fn(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (last_date,) = state.get if state.exists else (None,)
        outs = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(ts_col)
            dates = pdf[ts_col].dt.strftime("%Y-%m-%d").to_numpy()
            keep = np.concatenate(([True], dates[1:] != dates[:-1]))
            if last_date is not None and dates[0] == last_date:
                keep[0] = False
            if keep.any():
                o = pdf.loc[keep, out_cols].copy()
                # gap flags need only the (tiny) distinct-date subset:
                # each kept row's predecessor is the previous kept date,
                # seeded by the state's last seen date
                kept_dates = dates[keep]
                prevs = np.concatenate(([last_date], kept_dates[:-1]))
                flags = []
                for d, p in zip(kept_dates, prevs):
                    gap_ok = p is not None and (
                        pd.Timestamp(d) - pd.Timestamp(p)
                    ).days >= min_gap_days
                    flags.append(1 if gap_ok else 0)
                o[flag_col] = flags
                outs.append(o)
            last_date = dates[-1]
        state.update((last_date,))
        for o in outs:
            yield o

    return (
        df.groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="last_date string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_jump_out(
    df: DataFrame,
    key: str,
    ts_col: str,
    start_col: str,
    out_schema: str,
    out_cols: list[str],
    timeout_seconds: int = 10,
) -> DataFrame:
    """W5 streaming: emit session-start rows followed by another start or by
    silence past the timeout (DwdTrafficUserJumpDetail.java:104-153 — match
    and timeout side-output unioned).

    State: the pending start's epoch-ms + its passthrough payload (as a
    JSON string for schema simplicity). An event-time timer fires when the
    watermark passes pending+timeout.
    """
    timeout_ms = timeout_seconds * 1000

    def fn(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import json

        pending = json.loads(state.get[0]) if state.exists else None

        if state.hasTimedOut:
            if pending is not None:
                yield pd.DataFrame([pending], columns=out_cols)
            state.remove()
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(ts_col)
        out = []
        for _, row in rows.iterrows():
            ts_ms = int(row[ts_col].timestamp() * 1000)
            is_start = bool(row[start_col])
            if pending is not None:
                if ts_ms - pending["__ts_ms"] > timeout_ms or is_start:
                    out.append({c: pending[c] for c in out_cols})
                pending = None
            if is_start:
                pending = {c: row[c] for c in out_cols}
                pending["__ts_ms"] = ts_ms
        if pending is not None:
            state.update((json.dumps(pending, default=str),))
            # a key lagging behind the watermark would otherwise request a
            # timer <= watermark, which Spark rejects (query crash); the
            # clamped timer fires on the next watermark advance instead
            state.setTimeoutTimestamp(
                max(
                    pending["__ts_ms"] + timeout_ms,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        else:
            state.remove()
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    return (
        df.groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="pending string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_first_per_day_ever(
    df: DataFrame,
    key: str,
    ts_col: str,
    out_schema: str,
    out_cols: list[str],
    flag_col: str = "is_first_ever",
) -> DataFrame:
    """First row per key per day, flagged 1 on the key's FIRST-EVER
    emission (the lastPayDt/lastOrderDt keyed state of
    DwsTradePaymentSucWindow / DwsTradeOrderWindow: new-user counting).
    Batch equivalent: first_per_period + first_visit_repair."""

    def fn(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (last_date,) = state.get if state.exists else (None,)
        seen_before = last_date is not None
        outs = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(ts_col)
            dates = pdf[ts_col].dt.strftime("%Y-%m-%d").to_numpy()
            keep = np.concatenate(([True], dates[1:] != dates[:-1]))
            if last_date is not None and dates[0] == last_date:
                keep[0] = False
            if keep.any():
                o = pdf.loc[keep, out_cols].copy()
                flags = [0] * int(keep.sum())
                if not seen_before:
                    flags[0] = 1
                    seen_before = True
                o[flag_col] = flags
                outs.append(o)
            last_date = dates[-1]
        state.update((last_date,))
        for o in outs:
            yield o

    return (
        df.groupBy(key)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="last_date string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_latest_per_key(
    df: DataFrame,
    key: str,
    ts_col: str,
    order_by: list[str],
    out_schema: str,
    out_cols: list[str],
    quiesce_seconds: int = 5,
) -> DataFrame:
    """W7/D1 streaming latest-wins dedup: hold the greatest row per key by
    ``order_by`` (lexicographic tuple compare; first arrival wins ties) and
    emit it once the event-time watermark passes last-seen + quiesce — the
    DwsTradeOrderWindow keyed-state + 5 s dedup timer
    (DwsTradeOrderWindow.java, state saves the latest revision; onTimer
    emits). Batch equivalent: :func:`operators.dedup.latest_row_per_key`.

    State is one JSON row per key, removed at emission — bounded by live
    (in-revision-flight) keys only, never corpus size.
    """
    quiesce_ms = quiesce_seconds * 1000

    def fn(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import json

        best = json.loads(state.get[0]) if state.exists else None

        if state.hasTimedOut:
            if best is not None:
                yield pd.DataFrame(
                    [{c: best[c] for c in out_cols}], columns=out_cols
                )
            state.remove()
            return

        def plain(v):
            # native Python values only, so the JSON state round-trips
            # without default=str turning numbers into strings (which
            # would break ordering compares across a restart)
            return v.item() if hasattr(v, "item") else v

        last_ms = best["__ts_ms"] if best is not None else 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            # vectorized batch argmax: stable-sort by the ordering tuple;
            # the max key is the last row's; among equal-max rows the
            # FIRST arrival (ts order) wins, matching the strict-`>`
            # state compare below
            pdf = pdf.sort_values(ts_col, kind="stable")
            last_ms = max(
                last_ms, int(pdf[ts_col].max().timestamp() * 1000)
            )
            srt = pdf.sort_values(order_by, kind="stable")
            max_key = [plain(srt.iloc[-1][c]) for c in order_by]
            is_max = None
            for c, v in zip(order_by, max_key):
                m = pdf[c] == v
                is_max = m if is_max is None else (is_max & m)
            row = pdf[is_max].iloc[0]
            cand = {c: plain(row[c]) for c in out_cols}
            cand["__k"] = [plain(row[c]) for c in order_by]
            if best is None or cand["__k"] > best["__k"]:
                best = cand
        if best is not None:
            best["__ts_ms"] = last_ms
            state.update((json.dumps(best),))
            # clamp past the watermark: a lagging key's last_ms + quiesce
            # can be <= the current watermark, and Spark rejects such
            # timers (query crash) — fire on the next advance instead
            state.setTimeoutTimestamp(
                max(
                    last_ms + quiesce_ms,
                    state.getCurrentWatermarkMs() + 1,
                )
            )

    return df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="best string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
