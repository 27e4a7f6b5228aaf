"""Custom stateful streaming operator via applyInPandasWithState:
per-series spike detection with carried state.

Demonstrates the pattern the built-in windowed aggregates can't express:
state that depends on the *previous* event (here an exponential moving
average carried across micro-batches) driving a per-event decision
(flag values > ``factor`` × running EMA as spikes).

State layout: one row per series — (ema, n_seen). GroupStateTimeout
handles abandoned series; state size is O(distinct series), not O(events)
— the bounded-state property that makes this viable on an unbounded
stream.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "series string, ts long, value double, ema double, is_spike boolean"
STATE_SCHEMA = "ema double, n_seen long"


def _detect(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    alpha: float = 0.2,
    factor: float = 3.0,
) -> Iterable[pd.DataFrame]:
    (series,) = key
    ema, n_seen = state.get if state.exists else (None, 0)
    for pdf in batches:
        pdf = pdf.sort_values("ts")
        out = []
        for ts, v in zip(pdf["ts"], pdf["value"]):
            is_spike = ema is not None and n_seen >= 3 and v > factor * ema
            ema = v if ema is None else alpha * v + (1 - alpha) * ema
            n_seen += 1
            out.append((series, int(ts), float(v), float(ema), bool(is_spike)))
        yield pd.DataFrame(out, columns=["series", "ts", "value", "ema", "is_spike"])
    state.update((float(ema) if ema is not None else None, int(n_seen)))


def detect_spikes(ticks: DataFrame, field: str = "value") -> DataFrame:
    """Streaming transform: per-series EMA-based spike flags.

    ``ticks`` is a *streaming* DataFrame with (series, ts, value map).
    Returns one output row per input event with the running EMA and the
    spike flag. State survives across micro-batches via the state store.
    """
    from pyspark.sql import functions as F

    # ship _detect by value so executor workers don't need the package
    # on their own import path (the driver process may run from any cwd)
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])

    events = ticks.select(
        "series", "ts", F.col("value").getItem(field).alias("value")
    )
    return events.groupBy("series").applyInPandasWithState(
        _detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
