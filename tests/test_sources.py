"""Stream source builders (SURVEY §2 B8/B9): file, rate, kafka — all
constructible without a broker; the file path is driven end-to-end."""

import pytest

from frolyk_spark.sources.kafka import kafka_reader, kafka_writer
from frolyk_spark.sources.streams import events_stream, rate_stream
from frolyk_spark.streaming.jobs import run_to_memory


def test_events_file_stream_end_to_end(spark, sf_dir):
    from frolyk_spark.sources.catalog import load_table

    stream = events_stream(spark, sf_dir)
    assert stream.isStreaming
    got = run_to_memory(stream.groupBy("event_type").count(), mode="complete", prefix="src")
    batch = {r.event_type: r["count"] for r in load_table(spark, sf_dir, "events").groupBy("event_type").count().collect()}
    assert {r.event_type: r["count"] for r in got.collect()} == batch


def test_rate_stream_builds(spark):
    df = rate_stream(spark, rows_per_second=5)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["timestamp", "value"]


def test_kafka_reader_writer_build(spark):
    conn = {"brokers": ["broker-1:9092", "broker-2:9092"]}
    reader = kafka_reader(spark, conn, "events")
    assert reader is not None  # configured, unstarted: no broker contact
    from pyspark.sql import functions as F

    df = rate_stream(spark).select(
        F.lit(b"k").alias("key"), F.col("value").cast("string").cast("binary").alias("value")
    )
    writer = kafka_writer(df, conn, topic="out", checkpoint="/tmp/unused")
    assert writer is not None


def test_kafka_reader_requires_brokers(spark):
    with pytest.raises(ValueError, match="brokers"):
        kafka_reader(spark, {}, "events")
