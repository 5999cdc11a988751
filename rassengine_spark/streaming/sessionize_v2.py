"""Gap-based sessionization on the Spark 4 arbitrary-state v2 API
(`transformWithStateInPandas` + `StatefulProcessor`) — the successor to
`applyInPandasWithState` used by sessionize.py. Semantics are identical
(same closed-session output, same gap/timeout rules), so the two modules
are drop-in twins and share the parity bar of one test scenario.

What v2 buys at scale, and why the engine carries both:

- typed, NAMED state slots (value/list/map) instead of one opaque tuple —
  the session state and its pending-timer bookkeeping are separate
  `getValueState` slots with their own schemas;
- first-class timers (`registerTimer`/`deleteTimer` + `handleExpiredTimer`)
  instead of one implicit timeout per key — expiry logic moves out of the
  input-fold path;
- requires the RocksDB state-store provider (changelog-checkpointed,
  memory-bounded) — the store you want under 100 TB streaming state
  anyway; `sessionize_stream_v2` raises a clear error if the session is
  still on the default HDFS-backed provider.

Environment gate: the v2 state protocol speaks protobuf between the JVM
and the Python worker, so `google-protobuf` must be importable;
`sessionize_stream_v2` raises a clear RuntimeError when it isn't (this
container ships PySpark without protobuf — the applyInPandasWithState
twin in sessionize.py carries the tested behavior there).

State layout per key: `sess` = (start_us, last_us, n) for the one open
session; `tmr` = the registered close-timer's expiry ms (so re-folding a
batch can delete + re-register instead of leaking stale timers).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (ExpiredTimerInfo,
                                                      StatefulProcessor,
                                                      StatefulProcessorHandle,
                                                      TimerValues)

OUT_SCHEMA = ("user_id string, session_start timestamp, "
              "session_end timestamp, n_events long")
_US = 1_000_000


def _to_utc(us: int) -> _dt.datetime:
    return _dt.datetime.fromtimestamp(us / _US, tz=_dt.timezone.utc) \
                       .replace(tzinfo=None)


class SessionProcessor(StatefulProcessor):
    """Fold events into the open session; emit on gap-close and on timer
    expiry (watermark passed last event + gap)."""

    def __init__(self, gap_us: int):
        self._gap_us = gap_us

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState(
            "sess", "start_us long, last_us long, n long")
        self._tmr = handle.getValueState("tmr", "expiry_ms long")

    def _reset_timer(self, last_us: int,
                     timer_values: TimerValues) -> None:
        if self._tmr.exists():
            self._handle.deleteTimer(self._tmr.get()[0])
        # clamped above the watermark: replayed history would otherwise
        # register an already-expired timer
        expiry_ms = max(
            (last_us + self._gap_us) // 1000 + 1,
            timer_values.getCurrentWatermarkInMs() + 1)
        self._handle.registerTimer(expiry_ms)
        self._tmr.update((expiry_ms,))

    def handleInputRows(self, key: Any, rows: Iterator[pd.DataFrame],
                        timerValues: TimerValues) -> Iterator[pd.DataFrame]:
        ts_us = sorted(
            int(t.value) // 1000
            for pdf in rows for t in pd.to_datetime(pdf["_ts"]))
        if not ts_us:
            return
        if self._sess.exists():
            start_us, last_us, n = self._sess.get()
        else:
            start_us = last_us = ts_us[0]
            n = 0
        closed: list[tuple] = []
        for t in ts_us:
            if t - last_us > self._gap_us:
                closed.append(
                    (key[0], _to_utc(start_us), _to_utc(last_us), n))
                start_us, n = t, 0
            last_us = t
            n += 1
        self._sess.update((start_us, last_us, n))
        self._reset_timer(last_us, timerValues)
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start",
                                 "session_end", "n_events"])

    def handleExpiredTimer(self, key: Any, timerValues: TimerValues,
                           expiredTimerInfo: ExpiredTimerInfo
                           ) -> Iterator[pd.DataFrame]:
        if self._sess.exists():
            start_us, last_us, n = self._sess.get()
            self._sess.clear()
            self._tmr.clear()
            yield pd.DataFrame(
                [(key[0], _to_utc(start_us), _to_utc(last_us), n)],
                columns=["user_id", "session_start", "session_end",
                         "n_events"])

    def close(self) -> None:
        pass


def sessionize_stream_v2(events: DataFrame, ts_col: str = "ts",
                         key_col: str = "user_id",
                         gap_minutes: float = 30.0,
                         watermark: str = "1 hour") -> DataFrame:
    """CLOSED sessions (key, start, end, n_events), append mode — the
    transformWithState twin of `sessionize.sessionize_stream`."""
    try:
        from google.protobuf import descriptor as _descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas needs the protobuf package (its "
            "JVM<->Python state protocol); install google-protobuf or use "
            "sessionize.sessionize_stream (applyInPandasWithState)") from e
    spark = events.sparkSession
    provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", "")
    if "RocksDB" not in provider:
        raise RuntimeError(
            "transformWithStateInPandas requires the RocksDB state store: "
            "set spark.sql.streaming.stateStore.providerClass="
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider before starting the query")
    gap_us = int(gap_minutes * 60 * _US)
    prepared = (events
                .withWatermark(ts_col, watermark)
                .selectExpr(f"{key_col} as _key", f"{ts_col} as _ts"))
    return (prepared.groupBy("_key")
            .transformWithStateInPandas(
                SessionProcessor(gap_us), OUT_SCHEMA,
                outputMode="append", timeMode="eventTime"))
