"""Custom stateful streaming operators via ``applyInPandasWithState``.

``streaming_rate_limit`` is the REAL token bucket of the reference
(libbeat/processors/ratelimit/token_bucket.go:64-74): per-key bucket with
``limit`` tokens refilled continuously at ``limit``/unit, state carried
ACROSS micro-batches in Spark's state store — unlike the batch rate_limit
stage (a per-window row_number), this reproduces the reference's burst
behavior: a key that was quiet accumulates up to ``limit`` tokens of burst
budget.

State value per key: (tokens: double, last_ts: double epoch-seconds).
Rows inside one micro-batch group are processed in event-time order; a row
passes if the refilled bucket holds ≥1 token.

GroupStateTimeout.ProcessingTimeTimeout + a TTL drops idle keys — the
reference's bucket GC (rate_limit.go's gc cycle).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _parse_limit(limit: str) -> tuple[float, float]:
    """'N/unit' → (n, tokens_per_second); ValueError on bad unit/shape,
    matching the batch rate_limit's validation (a bare KeyError from the
    unit table gave no context)."""
    try:
        n_s, unit = str(limit).split("/")
        n = float(n_s)
    except ValueError:
        raise ValueError(f"rate_limit: bad limit {limit!r} (want 'N/unit')")
    per_sec = {"s": 1.0, "m": 60.0, "h": 3600.0}.get(unit)
    if per_sec is None:
        raise ValueError(f"rate_limit: unknown unit {unit!r} in {limit!r}")
    return n, n / per_sec  # tokens per second


def make_rate_limit_fn(limit: str, capacity: int | None = None,
                       idle_timeout_ms: int = 0):
    """Build the (key, batches, state) -> batches function for
    ``applyInPandasWithState``. Exposed separately so unit tests can drive
    it with a fake GroupState."""
    n, rate = _parse_limit(limit)
    cap = float(capacity) if capacity is not None else max(1.0, n)

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if getattr(state, "hasTimedOut", False):
            state.remove()  # idle-key GC (rate_limit.go's bucket gc)
            return
        if state.exists:
            tokens, last = state.get
        else:
            tokens, last = cap, None
        # ONE sort over the whole micro-batch: the iterator yields Arrow
        # CHUNKS of the group, and sorting each chunk independently would
        # process later chunks' earlier timestamps out of event-time order
        # (wrong refill/drop decisions for hot keys spanning chunks)
        chunks = list(pdfs)
        whole = pd.concat(chunks) if chunks else None
        if whole is None or not len(whole):
            state.update((float(tokens), float(last or 0.0)))
            return
        null_ts = whole["ts"].isna()
        pdf = whole[~null_ts].sort_values("ts")
        ts_sec = pdf["ts"].map(lambda t: t.timestamp())
        keep = []
        for t in ts_sec:
            if last is not None and t > last:
                tokens = min(cap, tokens + (t - last) * rate)
            last = max(last, t) if last is not None else t
            if tokens >= 1.0:
                tokens -= 1.0
                keep.append(True)
            else:
                keep.append(False)
        out = pdf[pd.Series(keep, index=pdf.index)]
        if null_ts.any():
            # rows without an event time cannot be rate-limited — pass
            # them through without touching the bucket (NaT.timestamp()
            # would otherwise crash the task)
            out = pd.concat([out, whole[null_ts]])
        if len(out):
            yield out
        state.update((float(tokens), float(last if last is not None else 0.0)))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)

    return fn


def streaming_rate_limit(df: DataFrame, limit: str = "10000/m",
                         fields: list[str] | None = None,
                         capacity: int | None = None,
                         idle_timeout_ms: int = 0) -> DataFrame:
    """Streaming token-bucket keyed by ``fields`` over a streaming DF with
    a ``ts`` timestamp column. Output schema = input schema.

    ``idle_timeout_ms`` > 0 enables idle-key state GC via
    ProcessingTimeTimeout — use it on continuous queries; leave 0 for
    ``availableNow``/batch-drain queries (a processing-time timeout keeps
    the trigger alive firing timeout batches, so availableNow never
    terminates)."""
    fields = fields or ["tool"]
    schema = df.schema
    state_schema = "tokens double, last double"
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_ms
               else GroupStateTimeout.NoTimeout)
    return (
        df.groupBy(*fields)
        .applyInPandasWithState(
            make_rate_limit_fn(limit, capacity, idle_timeout_ms),
            outputStructType=schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
