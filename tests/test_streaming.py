"""Stream ≡ batch equivalence for the windowed aggregate."""

from sparketl.io import load_table
from sparketl.operators.events_ops import tumbling_window_agg
from sparketl.streaming.windows import (
    read_event_stream,
    run_stream_to_table,
    streaming_hourly_agg,
)
from tests.conftest import SF_SMOKE


def test_streaming_hourly_equals_batch(spark):
    batch = tumbling_window_agg(load_table(spark, SF_SMOKE, "events"), "1 hour")
    stream = streaming_hourly_agg(read_event_stream(spark, SF_SMOKE))
    got = run_stream_to_table(stream, spark)
    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in got.collect())
    assert b == s
    assert len(b) > 0
