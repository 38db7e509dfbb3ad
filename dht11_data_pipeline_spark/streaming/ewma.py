"""Streaming fixed-point EWMA via ``applyInPandasWithState``: the
stateful twin of ``operators/sequence.fixed_point_ewma``.

State per user is the exact integer pair (Y, t) of the closed form
y_t = Y_t DIV 2^t with Y_t = Σ c_i·2^(i-1) — so folding a new event in
is one shift-add, and the emitted rows are BIT-FOR-BIT the rows the
batch operator produces over the same prefix of the stream (pinned in
tests/test_streaming_ewma.py). Events beyond ``max_steps`` per user
are absorbed silently (same cap as the batch form, which keeps
2^(t-1)·cents inside int64).

Ordering contract: equivalence with the batch form needs per-user
event-time order across micro-batches (within a batch this operator
sorts). The contract is now ENFORCED, not assumed: state carries the
last absorbed (ts, event_id) per user, and a batch delivering an
earlier event raises ``OutOfOrderEventError`` (``strict=False`` keeps
the old absorb-anyway behavior for feeds that accept drift). Production
puts a watermark + sort-within-trigger stage in front; the availableNow
file feed used in tests delivers files in order.

Scale: each micro-batch shuffles only its own rows on the user key;
state is four integers per user — O(users), not O(events) — in the
state store, expirable via GroupStateTimeout for quiet users.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, rn int, event_id bigint, cents bigint, "
                 "ewma_cents bigint")
STATE_SCHEMA = ("y bigint, t int, last_ts bigint, last_event_id bigint, "
                "recent_ts array<bigint>, recent_eid array<bigint>")

_TS_MIN = -(1 << 63)


class OutOfOrderEventError(RuntimeError):
    """A micro-batch delivered an event strictly before the last
    absorbed (ts, event_id) for its user — the batch-equivalence
    contract is violated and the fold's result would silently diverge
    from the batch operator. Fix the feed (watermark + sort stage) or
    pass ``strict=False`` to absorb anyway. An event matching ANY of
    the last ``replay_window`` absorbed (ts, event_id) pairs is not an
    error: it is at-least-once redelivery (a source may re-send a whole
    window, not just the tail event — round-6 ADVICE) and is skipped
    idempotently. Only an event below the watermark that was never
    absorbed — or one older than the replay window — raises."""


class NullTimestampEventError(RuntimeError):
    """A micro-batch delivered an event with a NULL event-time in
    strict mode. Null timestamps have no position in the per-user
    order, so absorbing one would make the fold's result depend on
    arrival timing — segregate or repair such rows upstream, or pass
    ``strict=False`` to absorb them at the front of the order."""


def _cents(v: float) -> int:
    # mirror Spark's CAST(double AS DECIMAL(18,2)): shortest-repr
    # string -> HALF_UP quantize, then *100 is integral
    return int(Decimal(str(v)).quantize(Decimal("0.01"),
                                        rounding=ROUND_HALF_UP) * 100)


def _make_fold(max_steps: int, expire_ms: int | None, strict: bool,
               replay_window: int):
    def _fold(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # Unpack defensively: a checkpoint written before the
            # redelivery ring existed stores 4 fields, not 6 — treat
            # the missing ring as empty so an in-place upgrade resumes
            # instead of dying on tuple arity (only redelivery of the
            # exact tail event stays deduplicated until the ring
            # refills, the pre-upgrade behavior).
            stored = tuple(state.get)
            y, t, last_ts, last_eid = stored[:4]
            r_ts, r_eid = (stored[4], stored[5]) if len(stored) >= 6 \
                else ([], [])
            recent = [(int(a), int(b))
                      for a, b in zip(r_ts or [], r_eid or [])]
        else:
            y, t, last_ts, last_eid, recent = 0, 0, _TS_MIN, _TS_MIN, []
        absorbed = set(recent)
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out = {"user_id": [], "rn": [], "event_id": [], "cents": [],
               "ewma_cents": []}
        for _, r in rows.iterrows():
            if t >= max_steps:
                break
            eid = int(r["event_id"])
            if pd.isna(r["ts"]):
                if strict:
                    raise NullTimestampEventError(
                        f"user {key[0]}: event_id={eid} has a NULL "
                        "event-time; null timestamps cannot be ordered "
                        "against absorbed state (segregate upstream or "
                        "pass strict=False)")
                ts_val = _TS_MIN
            else:
                ts_val = int(pd.Timestamp(r["ts"]).value)
            if strict and (ts_val, eid) <= (last_ts, last_eid):
                if (ts_val, eid) in absorbed:
                    # redelivery of an already-absorbed event — an
                    # at-least-once source may re-send a whole window,
                    # not just the tail (round-6 ADVICE): any event in
                    # the kept ring of the last ``replay_window``
                    # absorbed pairs skips idempotently
                    continue
                raise OutOfOrderEventError(
                    f"user {key[0]}: event_id={eid} ts={r['ts']} arrived "
                    f"after state already absorbed (ts_ns={last_ts}, "
                    f"event_id={last_eid}) and is not among the last "
                    f"{replay_window} absorbed events (genuinely "
                    "out-of-order, or redelivered from beyond the "
                    "replay window)"
                )
            last_ts, last_eid = ts_val, eid
            recent.append((ts_val, eid))
            absorbed.add((ts_val, eid))
            if len(recent) > replay_window:
                absorbed.discard(recent[0])
                del recent[0]
            t += 1
            c = _cents(float(r["value"]))
            y += c << (t - 1)
            out["user_id"].append(key[0])
            out["rn"].append(t)
            out["event_id"].append(eid)
            out["cents"].append(c)
            out["ewma_cents"].append(y >> t)
        state.update((y, t, last_ts, last_eid,
                      [a for a, _ in recent], [b for _, b in recent]))
        if expire_ms is not None:
            state.setTimeoutDuration(expire_ms)
        if out["user_id"]:
            yield pd.DataFrame(out)
    return _fold


def streaming_ewma(events: DataFrame, max_steps: int = 40,
                   expire_ms: int | None = None,
                   strict: bool = True,
                   replay_window: int = 64) -> DataFrame:
    """Wire the EWMA fold over a (possibly streaming) events frame.
    Emits one row per absorbed event with its running smoothed value —
    identical rows to the batch closed form over the same prefix.
    ``strict`` (default) raises ``OutOfOrderEventError`` when a batch
    delivers a per-user event at or before the last absorbed one,
    UNLESS that exact (ts, event_id) is among the last
    ``replay_window`` absorbed events — then it is at-least-once
    redelivery and skips idempotently. The ring bounds state at
    O(replay_window) integers per user; size it to the source's
    maximum redelivery overlap (a Kafka-like source re-sends at most
    one in-flight window)."""
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if expire_ms is not None else GroupStateTimeout.NoTimeout)
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_fold(max_steps, expire_ms, strict, replay_window),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
