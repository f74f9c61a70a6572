"""Streaming CUSUM burst detection — the streaming twin of
``plans/events.py::events_rate_cusum`` (the r11 18th twin): per
event_type, the one-sided CUSUM statistic s_h = max(0, s_{h-1} +
(c_h − K)) over the DENSE hour grid, emitting the hours where it
exceeds H.

Shape: hour buckets are computed by a stateless engine expression
(date_trunc-equivalent epoch-hour longs — identical to the batch
twin's grid key in any session timezone with whole-hour offset);
``applyInPandasWithState`` keyed by event_type carries (next_h, cs,
mn) — the running sum of (n − K) and its prefix minimum — and walks
each batch's hour counts IN ORDER from the first unprocessed hour,
decaying through empty hours exactly like the batch grid. All state
arithmetic is Python ints == engine integers (counts and K are
integers — no rounding surface). Detections for processed hours emit
immediately; each batch also emits one per-type STATE SNAPSHOT row
(upd-countered, the kmv_stream pattern) so the post-sink batch
transform can extend every type's chain through the TRAILING empty
hours up to the global grid end — closed form, because trailing cs
decreases linearly (engine-side integer exprs; see
plans/streaming_plans.py::stream_rate_cusum).

Bounded-twin contract (same as the other 17): hours must arrive
non-decreasing per type ACROSS micro-batches (one availableNow batch
— the certification regime — trivially satisfies this; the
multi-trigger test splits on an hour boundary).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CUSUM_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("eh", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cusum", T.LongType()),
        T.StructField("upd", T.LongType()),
        T.StructField("is_state", T.BooleanType()),
    ]
)

CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_h", T.LongType()),
        T.StructField("cs", T.LongType()),
        T.StructField("mn", T.LongType()),
        T.StructField("upd", T.LongType()),
    ]
)


def _walk_factory(h0: int, k: int, thresh: int):
    def _walk(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (event_type,) = key
        next_h, cs, mn, upd = (
            state.get if state.exists else (h0, 0, 0, 0)
        )
        counts: dict[int, int] = {}
        for pdf in pdfs:
            for v in pdf["eh"]:
                counts[int(v)] = counts.get(int(v), 0) + 1
        out = []
        if counts:
            # walk the dense chain from the first unprocessed hour
            # through this batch's max hour (empty hours decay by K)
            for h in range(next_h, max(counts) + 1):
                n = counts.get(h, 0)
                cs += n - k
                mn = min(mn, cs)
                cusum = cs - min(mn, 0)
                if cusum > thresh:
                    out.append(
                        {
                            "event_type": event_type,
                            "eh": h,
                            "n": n,
                            "cusum": cusum,
                            "upd": upd + 1,
                            "is_state": False,
                        }
                    )
            next_h = max(counts) + 1
        upd += 1
        state.update((next_h, cs, mn, upd))
        # snapshot row: eh carries next_h, n carries cs, cusum carries
        # mn (documented column reuse — the post-sink transform is the
        # only reader)
        out.append(
            {
                "event_type": event_type,
                "eh": next_h,
                "n": cs,
                "cusum": mn,
                "upd": upd,
                "is_state": True,
            }
        )
        yield pd.DataFrame(out).astype(
            {
                "eh": "int64",
                "n": "int64",
                "cusum": "int64",
                "upd": "int64",
                "is_state": "bool",
            }
        )

    return _walk


def cusum_running_state(
    ehs: DataFrame, h0: int, k: int, thresh: int
) -> DataFrame:
    """ehs(event_type, eh) stream → detections + per-batch state
    snapshots (see module docstring)."""
    return ehs.groupBy("event_type").applyInPandasWithState(
        _walk_factory(h0, k, thresh),
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
