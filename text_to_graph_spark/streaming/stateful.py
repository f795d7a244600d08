"""Custom stateful streaming operator — per-user sessionization with
``applyInPandasWithState``.

The batch twin (``operators/events.sessionize``) expresses 30-minute-gap
sessionization as lag + running sum; on an unbounded stream the same
computation needs per-key state that survives micro-batches. This is the
engine's custom-stateful-operator surface: grouped Arrow batches in, a
user-defined state struct carried by the state store, closed sessions out.

Contract (deterministic, oracle-checkable): a session CLOSES when a later
event for the same user arrives more than ``gap_seconds`` after the
session's last event; closed sessions are emitted append-mode. The
still-open trailing session per user lives in state and is never emitted —
so over a finite, time-ordered backlog the emitted set is exactly "every
session except each user's last", which a batch engine (the DuckDB oracle)
reproduces with window functions.

Correctness under micro-batching requires per-user in-order arrival, which
``write_time_sliced_landing`` guarantees by splitting the backlog into
non-overlapping global time ranges written (and therefore picked up) in
chronological order. The within-batch fold is vectorized pandas (shift +
cumsum groups); only the per-SESSION boundary stitching loops, bounded by
the handful of sessions per user per batch.
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id bigint, session_start_s bigint, session_end_s bigint, "
    "n_events bigint, duration_s bigint"
)
_STATE_SCHEMA = "start_sec bigint, last_sec bigint, n_events bigint"
_SESSION_COLS = [
    "user_id",
    "session_start_s",
    "session_end_s",
    "n_events",
    "duration_s",
]


def _fold_batch(
    user_id: int,
    secs: pd.Series,
    carry: tuple[int, int, int] | None,
    gap_seconds: int,
) -> tuple[list[tuple], tuple[int, int, int] | None]:
    """Fold a sorted second-series into (closed sessions, open-session carry).

    Vectorized session grouping: new-session flags via shift+gap compare,
    group ids via cumsum; the only Python loop is over the batch's session
    GROUPS (a handful), never its rows.
    """
    if secs.empty:
        return [], carry
    s = secs.sort_values().reset_index(drop=True)
    prev = s.shift(1)
    if carry is not None:
        prev.iloc[0] = carry[1]
    new_flag = prev.isna() | ((s - prev) > gap_seconds)
    grp = new_flag.cumsum()
    agg = s.groupby(grp).agg(["min", "max", "size"])

    sessions: list[tuple[int, int, int]] = [
        (int(a), int(b), int(n))
        for a, b, n in zip(agg["min"], agg["max"], agg["size"])
    ]
    if carry is not None:
        if not bool(new_flag.iloc[0]):
            # first in-batch session continues the carried one
            st, en, n = sessions[0]
            sessions[0] = (carry[0], en, n + carry[2])
        else:
            # the carried session is closed by the first in-batch event
            sessions.insert(0, carry)
    closed = [
        (user_id, st, en, n, en - st) for st, en, n in sessions[:-1]
    ]
    return closed, sessions[-1]


def make_sessionize_fn(gap_seconds: int = 1800):
    """Build the applyInPandasWithState function (kept importable so tests
    can drive the fold logic without a streaming query)."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        carry = tuple(int(x) for x in state.get) if state.exists else None
        parts = [pdf["sec"] for pdf in pdfs]
        secs = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.Series([], dtype="int64")
        )
        closed, carry = _fold_batch(user_id, secs, carry, gap_seconds)
        if carry is not None:
            state.update(carry)
        if closed:
            yield pd.DataFrame(closed, columns=_SESSION_COLS)

    return fn


def streaming_sessionize_stateful(
    events_stream: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """(user_id, sec) stream -> closed-session rows, state per user.

    ``events_stream`` must carry ``user_id`` and ``sec`` (tz-free epoch
    seconds; see ``operators/events.epoch_seconds_ntz``).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        make_sessionize_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_time_sliced_landing(
    events: DataFrame, landing_dir: str, n_slices: int = 4
) -> int:
    """Write a finite events backlog as chronologically ordered landing
    files: slice k holds the global sec-range [lo_k, lo_{k+1}) so every file
    is wholly later than its predecessors (per-user in-order arrival under
    ``maxFilesPerTrigger=1``). Returns the number of slices written."""
    os.makedirs(landing_dir, exist_ok=True)
    row = events.agg(
        F.min("sec").alias("lo"), F.max("sec").alias("hi")
    ).collect()[0]
    lo, hi = row["lo"], row["hi"]
    if lo is None:
        return 0
    span = max(int(hi) - int(lo) + 1, 1)
    written = 0
    for k in range(n_slices):
        a = int(lo) + span * k // n_slices
        b = int(lo) + span * (k + 1) // n_slices
        part = events.where((F.col("sec") >= a) & (F.col("sec") < b))
        tmp = os.path.join(landing_dir, f"_tmp_{k}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(
            f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet")
        )
        os.replace(
            os.path.join(tmp, src),
            os.path.join(landing_dir, f"slice-{k:04d}.parquet"),
        )
        for leftover in os.listdir(tmp):
            os.remove(os.path.join(tmp, leftover))
        os.rmdir(tmp)
        written += 1
        time.sleep(0.05)  # distinct mtimes -> stable source pickup order
    return written


def stream_event_seconds(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream over a (user_id, event_id, sec) landing dir, one
    file per micro-batch so state genuinely carries across batches."""
    return (
        spark.readStream.schema("user_id long, event_id long, sec long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )
