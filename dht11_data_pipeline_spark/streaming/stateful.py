"""Custom stateful streaming operator via ``applyInPandasWithState``:
per-device monotonic anomaly tracking across micro-batches.

The built-in windows (streaming/windows.py) cover time-bucketed
aggregation; this operator covers the genuinely *stateful* shape the
reference could never express in cron-batch SQL: state that carries
arbitrary Python values across micro-batches with timeout-based
expiry. The demo semantics — per device, track the running count of
readings and the last seen temperature, and emit a row per batch with
the number of "jumps" (|Δtemp| > threshold vs the previous reading,
including across batch boundaries) — need exactly one reading of
cross-batch memory, which no window aggregation provides.

Scale: state lives in the state store keyed by device; each micro-batch
shuffles only that batch's rows on device_id; state size is O(devices),
not O(readings). GroupStateTimeout expires devices that go quiet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "device_id string, n_total bigint, n_batch int, n_jumps bigint, "
    "last_temp double"
)
STATE_SCHEMA = "n_total bigint, n_jumps bigint, last_temp double"

JUMP_THRESHOLD = 5.0


def _make_track(expire_ms: int | None):
    def _track(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n_total, n_jumps, last_temp = (
            state.get if state.exists else (0, 0, None))
        rows = pd.concat(list(pdfs)).sort_values(["ts"])
        temps = pd.to_numeric(rows["temperature"], errors="coerce")
        n_batch = len(rows)
        for t in temps:
            if pd.notna(t):
                if last_temp is not None and abs(t - last_temp) > JUMP_THRESHOLD:
                    n_jumps += 1
                last_temp = float(t)
        n_total += n_batch
        state.update((n_total, n_jumps, last_temp))
        if expire_ms is not None:
            state.setTimeoutDuration(expire_ms)
        yield pd.DataFrame({
            "device_id": [key[0]], "n_total": [n_total], "n_batch": [n_batch],
            "n_jumps": [n_jumps], "last_temp": [last_temp],
        })
    return _track


def track_device_state(readings: DataFrame,
                       expire_ms: int | None = None) -> DataFrame:
    """Wire the tracker over a (possibly streaming) readings frame.
    Emits one summary row per device per micro-batch.

    ``expire_ms`` enables processing-time expiry of quiet devices — for
    continuously-running streams. Leave None for drain-style
    (availableNow) runs: with timeouts registered, availableNow keeps
    scheduling empty micro-batches until timeouts fire, turning a
    two-batch drain into minutes of idle polling."""
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if expire_ms is not None else GroupStateTimeout.NoTimeout)
    return (
        readings.groupBy("device_id")
        .applyInPandasWithState(
            _make_track(expire_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
