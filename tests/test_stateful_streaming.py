"""Cross-batch stateful rate limit (applyInPandasWithState token bucket)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from beats_spark.streaming.stateful import make_rate_limit_fn, streaming_rate_limit


class FakeState:
    """Minimal GroupState stand-in for unit-driving the bucket fn."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def setTimeoutDuration(self, ms):
        pass


def _pdf(ts_seconds, tool="search"):
    return pd.DataFrame({
        "tool": tool,
        "ts": pd.to_datetime(ts_seconds, unit="s", utc=True).tz_localize(None),
    })


def test_token_bucket_burst_then_refill():
    """5/m bucket: a 10-event burst passes 5, then one token refills every
    12 s — exactly token_bucket.go semantics, not per-window top-N."""
    fn = make_rate_limit_fn("5/m")
    state = FakeState()
    burst = _pdf([100.0 + i * 0.1 for i in range(10)])
    out = pd.concat(list(fn(("search",), iter([burst]), state)))
    assert len(out) == 5  # burst capacity
    # 24 s later: 2 tokens refilled (5/60 per sec × 24)
    later = _pdf([125.0, 125.1, 125.2])
    out2 = pd.concat(list(fn(("search",), iter([later]), state)))
    assert len(out2) == 2


def test_token_bucket_state_survives_batches():
    fn = make_rate_limit_fn("2/s", capacity=2)
    state = FakeState()
    b1 = _pdf([10.0, 10.01, 10.02])      # 2 pass, bucket empty
    out1 = pd.concat(list(fn(("k",), iter([b1]), state)))
    assert len(out1) == 2
    b2 = _pdf([10.25, 10.26])            # 0.23 s later: 0.46 tokens → 0 pass
    outs = list(fn(("k",), iter([b2]), state))
    assert sum(len(o) for o in outs) == 0
    b3 = _pdf([11.5])                    # 1.24 s later: full-ish → 1 passes
    out3 = pd.concat(list(fn(("k",), iter([b3]), state)))
    assert len(out3) == 1


def test_streaming_rate_limit_end_to_end(spark, tmp_path):
    """Two sequential micro-batches through a real streaming query: the
    second batch sees the bucket the first batch drained."""
    rows1 = [("search", float(i)) for i in range(8)]           # t=0..7 s
    df1 = spark.createDataFrame(rows1, "tool string, sec double").select(
        "tool", F.timestamp_seconds("sec").alias("ts"))
    src = str(tmp_path / "in")
    df1.coalesce(1).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "out")

    def drain():
        stream = spark.readStream.schema("tool string, ts timestamp").parquet(src)
        q = (streaming_rate_limit(stream, limit="4/m", fields=["tool"])
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.parquet(out).count()

    got1 = drain()
    assert got1 == 4  # burst capacity, not row_number-per-window 4+

    # batch 2: 30+ s later → ~2 tokens refilled (4/60 per sec); the bucket
    # state drained by run 1 must survive in the checkpointed state store
    df2 = spark.createDataFrame([("search", 40.0 + i) for i in range(5)],
                                "tool string, sec double").select(
        "tool", F.timestamp_seconds("sec").alias("ts"))
    df2.coalesce(1).write.mode("append").parquet(src)
    got2 = drain() - got1
    # without cross-batch state this would re-burst all 4+ tokens
    assert 1 <= got2 <= 3


def test_bucket_fn_multi_chunk_event_time_order():
    """Arrow chunking must not reorder event time: a later chunk holding
    EARLIER timestamps is merged and sorted before the bucket walk."""
    import pandas as pd
    from beats_spark.streaming.stateful import make_rate_limit_fn

    fn = make_rate_limit_fn("2/s", capacity=2)
    base = pd.Timestamp("2024-01-01 00:00:00")
    chunk1 = pd.DataFrame({"ts": [base + pd.Timedelta(seconds=10)], "v": [3]})
    chunk2 = pd.DataFrame({"ts": [base, base + pd.Timedelta(seconds=0.1)],
                           "v": [1, 2]})
    state = FakeState()
    out = pd.concat(list(fn(("k",), iter([chunk1, chunk2]), state)))
    # capacity 2 at t=0: rows v=1, v=2 pass; by t=10 bucket refilled → v=3
    # passes too. Per-chunk sorting would misorder refill arithmetic.
    assert sorted(out["v"].tolist()) == [1, 2, 3]


def test_bucket_fn_null_ts_passes_through():
    import pandas as pd
    from beats_spark.streaming.stateful import make_rate_limit_fn

    fn = make_rate_limit_fn("1/s", capacity=1)
    pdf = pd.DataFrame({"ts": [pd.Timestamp("2024-01-01"), pd.NaT],
                        "v": [1, 2]})
    out = pd.concat(list(fn(("k",), iter([pdf]), FakeState())))
    assert 2 in out["v"].tolist()  # NaT row passes, no crash
