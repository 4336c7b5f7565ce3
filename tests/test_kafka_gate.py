"""Kafka option plumbing (no broker in this image — pure builders only)."""

import pytest

from frolyk_spark.tasks.kafka import build_sink_options, build_source_options
from frolyk_spark.tasks.offsets import LogicalOffset


def test_source_options_earliest():
    opts = build_source_options(
        {"brokers": ["b1:9092", "b2:9092"]}, "topic-a", "earliest",
        consumer={"max_offsets_per_trigger": 10000},
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "topic-a"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "10000"


def test_source_options_latest_default():
    opts = build_source_options({"brokers": "b:9092"}, "t", LogicalOffset.LATEST)
    assert opts["startingOffsets"] == "latest"
    assert "maxOffsetsPerTrigger" not in opts


def test_missing_brokers_raises():
    with pytest.raises(ValueError):
        build_source_options({}, "t", "latest")


def test_sink_options():
    assert build_sink_options({"brokers": "b:9092"}) == {
        "kafka.bootstrap.servers": "b:9092"
    }
    with pytest.raises(ValueError):
        build_sink_options({})


def test_sink_stream_options_full_mapping():
    from frolyk_spark.tasks.kafka import sink_stream_options

    opts = sink_stream_options(
        {"brokers": ["b1:9092", "b2:9092"]}, topic="out", checkpoint="/ckpt/out"
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "topic": "out",
        "checkpointLocation": "/ckpt/out",
    }
    assert sink_stream_options({"brokers": "b:9092"}) == {
        "kafka.bootstrap.servers": "b:9092"
    }


def test_kafka_writer_builds_and_validates_without_broker(spark):
    """The full sink builder path on a real streaming frame — everything up
    to .start() is broker-free. Schema contract (reference producer:
    topic+value per message) is enforced at build time."""
    from pyspark.sql import functions as F

    from frolyk_spark.sources.kafka import kafka_writer
    from frolyk_spark.sources.streams import rate_stream

    msgs = rate_stream(spark).select(
        F.col("value").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )
    writer = kafka_writer(msgs, {"brokers": "b:9092"}, topic="out", checkpoint="/tmp/ck")
    assert writer is not None  # configured, unstarted

    with pytest.raises(ValueError, match="'value' column"):
        kafka_writer(msgs.select("key"), {"brokers": "b:9092"}, topic="out")
    with pytest.raises(ValueError, match="'topic' column"):
        kafka_writer(msgs, {"brokers": "b:9092"})  # no topic col, no topic=
    # a topic column instead of a pinned topic is the reference's
    # per-message routing shape — accepted
    routed = msgs.withColumn("topic", F.lit("out"))
    assert kafka_writer(routed, {"brokers": "b:9092"}) is not None


def test_process_kafka_batch_without_broker(spark):
    """A11's transformation path end-to-end on a synthetic Kafka batch:
    decode -> processor chain (bytes value/key, real timestamp) -> produced
    messages as sink-shaped rows. Only the socket layer needs a broker."""
    import json

    from frolyk_spark.tasks.kafka import process_kafka_batch
    from frolyk_spark.tasks.task import Task

    task = Task(group="kafka-batch")
    src = task.source("clicks")

    def setup(assignment):
        def route(message, context):
            payload = json.loads(message["value"].decode())
            if payload["kind"] == "purchase":
                assignment.send(
                    {
                        "topic": "purchases-out",
                        "key": message["key"],
                        "value": {"user": payload["user"], "ts": message["timestamp"]},
                    }
                )
            return context.abandon

        return route

    task.processor(src, setup)

    rows = [
        ("clicks", p, f"u{i}".encode(), json.dumps({"kind": k, "user": i}).encode(),
         i, f"17000000000{i:02d}")
        for p in (0, 1)
        for i, k in enumerate(["click", "purchase", "purchase", "view"])
    ]
    batch = spark.createDataFrame(
        rows,
        "topic string, partition int, key binary, value binary, offset bigint, timestamp string",
    )
    out = process_kafka_batch(task, spark, "clicks", batch).collect()
    assert len(out) == 4  # 2 purchases per partition
    assert all(r.topic == "purchases-out" for r in out)
    users = sorted(json.loads(r.value.decode())["user"] for r in out)
    assert users == [1, 1, 2, 2]
