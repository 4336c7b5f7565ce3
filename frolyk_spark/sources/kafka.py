"""Kafka stream source/sink builders (SURVEY §2 B8).

Thin, broker-free-constructible wrappers over Spark's Kafka integration:
building the reader/writer performs no I/O, so everything here unit-tests
without a broker (none ships in this image; see tests/test_kafka_gate.py).
The task-level execution path lives in frolyk_spark.tasks.kafka.

Reference parity: kafka.ts consumer-group mechanics map onto the Kafka
source's checkpoint-managed offsets; producer sends map onto the Kafka sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from frolyk_spark.tasks.kafka import (
    build_source_options, sink_stream_options, validate_sink_frame,
)
from frolyk_spark.tasks.offsets import LogicalOffset


def kafka_reader(
    spark: SparkSession,
    connection: dict,
    topic: str,
    *,
    offset_reset=LogicalOffset.EARLIEST,
    consumer: dict | None = None,
):
    """Configured (unstarted) Kafka DataStreamReader."""
    reader = spark.readStream.format("kafka")
    for k, v in build_source_options(connection, topic, offset_reset, consumer).items():
        reader = reader.option(k, v)
    return reader


def kafka_writer(df: DataFrame, connection: dict, *, topic: str | None = None, checkpoint: str | None = None):
    """Configured (unstarted) Kafka DataStreamWriter. ``df`` must carry
    key/value (binary or string) columns, and a topic column unless
    ``topic`` is given."""
    validate_sink_frame(df, topic_given=topic is not None)
    writer = df.writeStream.format("kafka")
    for k, v in sink_stream_options(connection, topic=topic, checkpoint=checkpoint).items():
        writer = writer.option(k, v)
    return writer
