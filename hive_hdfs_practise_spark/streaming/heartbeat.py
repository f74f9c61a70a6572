"""Structured-Streaming heartbeat liveness monitor (SURVEY.md §2.10,
H8/H9 semantics).

Reference behavior being re-expressed: DataNodes ping every 20 s
(``Client/managers.py:22-37``); the NameNode records last-seen per
node and flips it to Dead after 25 s of silence
(``Server/managers.py:44-62``), never scheduling work to Dead nodes.

Engine form: a stateful stream over (node, event_ts) heartbeats.
State per node = last seen timestamp + current status;
``applyInPandasWithState`` emits Alive→Dead / Dead→Alive
TRANSITIONS (the actionable events the reference logs), not raw
state. Arrow-batched — the Python hop is per GROUP per trigger, not
per row.

Timeout clock choice:
- ``event`` (default): EventTimeTimeout — Dead fires when the
  WATERMARK passes last_seen + timeout. Deterministic with respect
  to the data (same input → same transitions), which is what tests
  and the driver's bounded availableNow runs need.
- ``processing``: ProcessingTimeTimeout — wall-clock silence, the
  live-cluster deployment mode matching the reference's real-time
  25 s rule. Output depends on wall time by construction.

The same classification rule is exposed in batch form below
(``liveness_snapshot``) and as the oracle-checked
``heartbeat_liveness`` plan.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("node", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("n_beats", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_beats", T.LongType()),
        T.StructField("dead", T.BooleanType()),
    ]
)


def _track(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    timeout_ms: int,
    event_time: bool,
) -> Iterable[pd.DataFrame]:
    (node,) = key
    last_us, n_beats, dead = state.get if state.exists else (0, 0, True)

    if state.hasTimedOut:
        # silence past the threshold → Dead transition (ref: 25 s)
        state.update((last_us, n_beats, True))
        yield pd.DataFrame(
            [
                {
                    "node": node,
                    "status": "Dead",
                    "last_ts": pd.Timestamp(last_us, unit="us"),
                    "n_beats": n_beats,
                }
            ]
        )
        return

    max_ts = None
    new = 0
    for pdf in pdfs:
        if len(pdf):
            m = pdf["event_ts"].max()
            max_ts = m if max_ts is None else max(max_ts, m)
            new += len(pdf)
    if max_ts is not None:
        last_us = max(last_us, int(max_ts.value // 1000))
        n_beats += new
    was_dead = dead
    state.update((last_us, n_beats, False))
    if event_time:
        state.setTimeoutTimestamp(last_us // 1000 + timeout_ms)
    else:
        state.setTimeoutDuration(timeout_ms)
    if was_dead:
        yield pd.DataFrame(
            [
                {
                    "node": node,
                    "status": "Alive",
                    "last_ts": pd.Timestamp(last_us, unit="us"),
                    "n_beats": n_beats,
                }
            ]
        )


def liveness_transitions(
    heartbeats: DataFrame,
    timeout_ms: int = 25_000,
    time_mode: str = "event",
    watermark_delay: str = "1 second",
) -> DataFrame:
    """heartbeats(node: string, event_ts: timestamp) → stream of
    Alive/Dead status transitions. ``time_mode='event'`` is
    deterministic (timeouts fire via watermark); ``'processing'``
    uses wall-clock silence like the reference's live monitor."""
    event_time = time_mode == "event"

    def track(key, pdfs, state):
        return _track(key, pdfs, state, timeout_ms, event_time)

    src = (
        heartbeats.withWatermark("event_ts", watermark_delay)
        if event_time
        else heartbeats
    )
    return src.groupBy("node").applyInPandasWithState(
        track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if event_time
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def liveness_snapshot(heartbeats: DataFrame, timeout_seconds: int = 25) -> DataFrame:
    """Batch snapshot of the same rule (shared by the
    ``heartbeat_liveness`` plan): last-seen per node vs the stream
    horizon (max ts), Dead iff silent longer than the timeout."""
    last_seen = heartbeats.groupBy("node").agg(
        F.max("event_ts").alias("last_ts"), F.count(F.lit(1)).alias("n_beats")
    )
    horizon = heartbeats.agg(F.max("event_ts").alias("now_ts"))
    silent = F.col("last_ts") < F.col("now_ts") - F.expr(
        f"INTERVAL {timeout_seconds} SECONDS"
    )
    return last_seen.join(F.broadcast(horizon)).select(
        "node",
        "last_ts",
        "n_beats",
        F.when(silent, F.lit("Dead")).otherwise(F.lit("Alive")).alias("status"),
    )
