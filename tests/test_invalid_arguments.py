"""Invalid-argument contract — mirrors the reference's constructor-panic
tests (flow/batch_test.go:82-89, flow/throttler_test.go:74-96,
flow/sliding_window_test.go:187-198): bad parameters fail FAST at
construction with a clear error, never silently misbehave at run time."""

import pytest

from go_streams_spark.operators import (
    batch_by_count, discard_over_quota, throttle_options,
)


def test_batch_by_count_nonpositive_size():
    with pytest.raises(ValueError, match="positive"):
        batch_by_count(0, order_by=["x"])
    with pytest.raises(ValueError, match="positive"):
        batch_by_count(-3, order_by=["x"])


def test_throttle_options_invalid():
    for bad in [(0, 1.0), (5, 0), (-1, 1.0), (5, -0.5)]:
        with pytest.raises(ValueError, match="positive"):
            throttle_options(*bad)


def test_discard_over_quota_invalid():
    with pytest.raises(ValueError, match="positive"):
        discard_over_quota(0, "ts", "1 hour")


def test_redis_connector_missing_options():
    from go_streams_spark.sources.redis_stream import (
        RedisPubSubStreamReader, RedisStreamBatchReader,
        RedisStreamStreamReader, _xadd_rows)
    with pytest.raises(ValueError, match="stream"):
        RedisStreamStreamReader({})
    with pytest.raises(ValueError, match="stream"):
        RedisStreamBatchReader({}).partitions()
    with pytest.raises(ValueError, match="channel"):
        RedisPubSubStreamReader({})
    with pytest.raises(ValueError, match="stream"):
        _xadd_rows({}, iter([]))


def test_nats_pulsar_websocket_aerospike_missing_options():
    from go_streams_spark.sources.aerospike import AerospikeCDCStreamReader
    from go_streams_spark.sources.nats_jetstream import NatsStreamReader
    from go_streams_spark.sources.pulsar import PulsarStreamReader
    from go_streams_spark.sources.websocket import WebSocketStreamReader
    with pytest.raises(ValueError, match="stream"):
        NatsStreamReader({})
    with pytest.raises(ValueError, match="topic"):
        PulsarStreamReader({})
    with pytest.raises(ValueError, match="url"):
        WebSocketStreamReader({})
    with pytest.raises(ValueError, match="namespace"):
        AerospikeCDCStreamReader({}).latestOffset()


def test_retry_wrapper_invalid():
    from go_streams_spark.streaming import with_bounded_retry
    with pytest.raises(ValueError, match="max_retries"):
        with_bounded_retry(lambda df, bid: None, max_retries=0)


def test_distributed_ordinal_requires_order():
    from go_streams_spark.operators import distributed_ordinal
    with pytest.raises(TypeError):
        distributed_ordinal(None)  # order_by is keyword-required


def test_zorder_key_rejects_overwide_keys(spark):
    from pyspark.sql import functions as F

    from go_streams_spark.operators.layout import zorder_key
    cols = [F.lit(1).cast("long")] * 8
    with pytest.raises(ValueError, match="63"):
        zorder_key(cols, bits=8)  # 64 key bits would hit the sign bit
    zorder_key(cols, bits=7)  # 56 bits: fine


def test_token_window_chunks_rejects_nonpositive():
    from go_streams_spark.functions.text import token_window_chunks
    with pytest.raises(ValueError, match="positive"):
        token_window_chunks(None, size=0)
    with pytest.raises(ValueError, match="positive"):
        token_window_chunks(None, stride=-1)


def test_heavy_hitters_invalid():
    from go_streams_spark.streaming import heavy_hitters_stream
    with pytest.raises(ValueError, match=">= 1"):
        heavy_hitters_stream(None, item_col="x", capacity=0)


def test_real_adapter_import_guards():
    """Without the broker client libraries (absent from this container),
    each real adapter must fail with an actionable ImportError naming
    the package and the clientFactory escape hatch — not an opaque
    ModuleNotFoundError deep in a Spark task."""
    from go_streams_spark.sources.nats_jetstream import NatsPyAdapter
    from go_streams_spark.sources.pulsar import PulsarClientAdapter
    from go_streams_spark.sources.redis_stream import resolve_client_factory
    for adapter, pkg in ((PulsarClientAdapter, "pulsar-client"),
                         (NatsPyAdapter, "nats-py"),
                         (resolve_client_factory({}), "'redis'")):
        try:
            adapter({})
        except ImportError as e:
            assert pkg in str(e) and "clientFactory" in str(e), (adapter, e)
        except Exception as e:  # library present: anything else is fine
            pass
