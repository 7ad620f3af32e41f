"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 / north-star: arbitrary per-key state machines that the
built-in window operators cannot express).

Demonstrator: **capped sessionization** — sessions close on an
inactivity gap (what ``session_window`` gives you) *or* when the
session's total span exceeds a hard cap (what ``session_window``
cannot do: its windows extend indefinitely under steady activity —
think bot traffic that never pauses). Each key's state is a tiny fixed
tuple; state volume is O(active keys), the watermark bounds it in
time, and event-time timeouts flush sessions for keys that simply stop
sending.

API choice note: Spark 4's successor API (``transformWithStateInPandas``
— composite state types, timers, TTL) requires the ``protobuf`` Python
package for its driver-side runner, which this environment does not
ship; ``applyInPandasWithState`` expresses the same per-key state
machine without that dependency, so it is the supported path here.

Execution shape at scale: one shuffle on the grouping key per
micro-batch (same as any stateful agg); the user function sees
Arrow-batched pandas frames per key — vectorizable, one interpreter
crossing per key-batch, state read/write O(1) per key.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed_by", T.StringType()),
    ]
)

# (session_start_us, last_ts_us, n_events)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_US = 1_000_000


def capped_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    max_len_s: int = 7200,
    watermark: str = "1 hour",
) -> DataFrame:
    """Sessionize a stream with BOTH an inactivity gap and a hard span
    cap. Emits one row per closed session; ``closed_by`` is 'gap',
    'cap', or 'timeout' (key went quiet past the watermark). The last
    session of a still-active key stays in state until a later event
    or its event-time timeout closes it.
    """

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (user,) = key

        def row(start_us: int, end_us: int, n: int, how: str) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "closed_by": [how],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield row(start_us, last_us, n, "timeout")
            return

        ts_us = (
            pd.concat([p[ts_col] for p in pdfs])
            .sort_values()
            .astype("int64")
            .floordiv(1000)  # ns -> us
            .to_numpy()
        )
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = int(ts_us[0])
            n = 0
        out = []
        for t in ts_us:
            t = int(t)
            if n > 0 and t - last_us > gap_s * _US:
                out.append(row(start_us, last_us, n, "gap"))
                start_us, n = t, 0
            elif n > 0 and t - start_us > max_len_s * _US:
                out.append(row(start_us, last_us, n, "cap"))
                start_us, n = t, 0
            last_us = t
            n += 1
        state.update((start_us, last_us, n))
        # flush via event-time timeout once the watermark passes the gap;
        # clamp to just past the current watermark — Spark rejects (and
        # fails the query on) a timeout timestamp that is already behind
        # the advanced event-time watermark, which can happen when a
        # micro-batch delivers stragglers whose ts+gap is in the past.
        timeout_ms = last_us // 1000 + gap_s * 1000
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))
        yield from out

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
