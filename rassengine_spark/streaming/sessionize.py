"""Custom stateful streaming operator: gap-based sessionization.

The reference has no streaming data plane (SURVEY §2.10) — this is the
engine's Spark-native extension of the batch sessionizer
(`__spark_entry__.events_sessionize`: lag/gap windows) to unbounded input,
per the north-star streaming requirement. Same semantics: consecutive
events of one user belong to one session while the gap between them stays
under `gap`; a session closes when the event-time watermark passes its last
event + gap.

Implementation: `applyInPandasWithState` (Arrow-batched per-group state),
keyed by `user_id`, with event-time timeout:

- state = (session_start_us, last_ts_us, n_events) for the one OPEN session
- each micro-batch folds its (sorted) events into the state, emitting any
  session that a later event closes by exceeding the gap
- the watermark timeout closes idle sessions — without it, open-session
  state for users who stop sending would grow forever; with it, state size
  is bounded by the number of users active inside one watermark horizon

Scale: state lives in the state store partitioned by user_id (the shuffle
key), so a 1000-executor cluster holds each user's state on exactly one
task; skewed users cost one hot partition at worst, and the per-batch work
is one Arrow round-trip per active user group.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id string, session_start timestamp, "
              "session_end timestamp, n_events long")
STATE_SCHEMA = "start_us long, last_us long, n long"
_US = 1_000_000


def _to_utc(us: int) -> _dt.datetime:
    return _dt.datetime.fromtimestamp(us / _US, tz=_dt.timezone.utc) \
                       .replace(tzinfo=None)


def sessionize_stream(events: DataFrame, ts_col: str = "ts",
                      key_col: str = "user_id",
                      gap_minutes: float = 30.0,
                      watermark: str = "1 hour") -> DataFrame:
    """CLOSED sessions (key, start, end, n_events) from a streaming frame.

    `events` must be a streaming DataFrame with an event-time `ts_col`.
    Output mode is append: a session row is emitted exactly once, when the
    session closes (by gap or by watermark timeout).
    """
    gap_us = int(gap_minutes * 60 * _US)

    def fold(key: tuple, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            closed.append((key[0], _to_utc(start_us), _to_utc(last_us), n))
            state.remove()
        else:
            ts_us = sorted(
                int(t.value) // 1000
                for pdf in pdfs for t in pd.to_datetime(pdf["_ts"]))
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = ts_us[0]
                n = 0
            for t in ts_us:
                if t - last_us > gap_us:
                    closed.append(
                        (key[0], _to_utc(start_us), _to_utc(last_us), n))
                    start_us, n = t, 0
                last_us = t
                n += 1
            state.update((start_us, last_us, n))
            # close the open session once the watermark passes last + gap
            # (clamped above the current watermark — replayed history would
            # otherwise request a timeout in the past, which Spark rejects)
            state.setTimeoutTimestamp(
                max((last_us + gap_us) // 1000 + 1,
                    state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end",
                             "n_events"])

    prepared = (events
                .withWatermark(ts_col, watermark)
                .selectExpr(f"{key_col} as _key", f"{ts_col} as _ts"))
    return (prepared.groupBy("_key")
            .applyInPandasWithState(fold, OUT_SCHEMA, STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))
