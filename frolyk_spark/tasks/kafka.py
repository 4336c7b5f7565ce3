"""Kafka execution path — Structured Streaming source/sink.

Parity target: reference src/assignment-contexts/kafka.ts + src/streams.ts
(consumer groups, per-partition streams, manual commits, producer sends).
Spark's Kafka integration replaces all of the hand-rolled mechanics:

- consumer group / rebalance / heartbeats → Spark's Kafka source manages
  offsets in the checkpoint; executors split partitions automatically.
- manual ``commitOffset`` + restart-from-committed → ``checkpointLocation``.
- pause/resume backpressure (streams.ts:148-226) → ``maxOffsetsPerTrigger``.
- ``send`` to other topics (kafka.ts:105-124) → Kafka sink per micro-batch.

No broker ships in this image, so ``start_kafka_task`` is exercised only
through its pure option-building helpers in unit tests; the topology code
path itself is identical to the tested batch bridge (foreachBatch reuses
run_task_batch).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frolyk_spark.tasks.offsets import to_starting_offsets


def build_source_options(connection: dict, topic: str, offset_reset,
                         consumer: dict | None = None) -> dict:
    """Map frolyk connection/consumer config to Kafka source options."""
    brokers = connection.get("brokers") or connection.get("bootstrap_servers")
    if not brokers:
        raise ValueError("connection requires 'brokers'")
    if isinstance(brokers, (list, tuple)):
        brokers = ",".join(brokers)
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": to_starting_offsets(offset_reset),
        "failOnDataLoss": "false",
        # headers are part of the reference's message contract
        # (NewMessage.headers, index.ts:37-40); Spark's source omits the
        # column unless asked
        "includeHeaders": "true",
    }
    max_per_trigger = (consumer or {}).get("max_offsets_per_trigger")
    if max_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_per_trigger)
    return opts


def build_sink_options(connection: dict) -> dict:
    brokers = connection.get("brokers") or connection.get("bootstrap_servers")
    if not brokers:
        raise ValueError("connection requires 'brokers'")
    if isinstance(brokers, (list, tuple)):
        brokers = ",".join(brokers)
    return {"kafka.bootstrap.servers": brokers}


def sink_stream_options(
    connection: dict, *, topic: str | None = None, checkpoint: str | None = None
) -> dict:
    """The COMPLETE option set a Kafka sink writer applies — the producer
    side of the reference's connection config (kafka.ts producer.send maps
    onto the Kafka sink; exactly-once resume comes from checkpointLocation,
    not producer transactions). Pure builder so the mapping is assertable
    without a broker."""
    opts = build_sink_options(connection)
    if topic:
        opts["topic"] = topic
    if checkpoint:
        opts["checkpointLocation"] = checkpoint
    return opts


def validate_sink_frame(df: DataFrame, *, topic_given: bool) -> None:
    """Build-time check of the Kafka sink contract (the reference producer
    requires topic+value per message, kafka.ts:105-124; Spark enforces the
    same at RUNTIME — failing at builder time keeps the error broker-free
    and immediate): a `value` column always, and a `topic` column unless
    the writer pins one."""
    cols = set(df.columns)
    if "value" not in cols:
        raise ValueError("Kafka sink requires a 'value' column")
    if not topic_given and "topic" not in cols:
        raise ValueError("Kafka sink requires a 'topic' column or an explicit topic=")


def _decode_kafka_batch(df: DataFrame) -> DataFrame:
    """Kafka rows -> frolyk message columns (value JSON-decoded downstream).
    ``headers`` (present when the source ran with includeHeaders, or a null
    column otherwise) rides through in Spark's native
    array<struct<key,value>> shape — the bridge turns it into the
    reference's per-message headers dict."""
    headers = (
        F.col("headers")
        if "headers" in df.columns
        else F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers")
    )
    return df.select(
        F.col("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("key"),
        F.col("value"),
        headers,
        F.col("offset").cast("bigint").alias("offset"),
        F.col("timestamp").cast("string").alias("timestamp"),
    )


def process_kafka_batch(task, spark: SparkSession, topic: str, batch_df: DataFrame) -> DataFrame:
    """One micro-batch of Kafka-shaped rows through the task's processor
    chain; returns the produced messages as Kafka-sink-shaped rows.

    Messages reach processors with the same shape the local inject context
    produces (local.py _create_message): value/key as the raw Kafka bytes,
    the real record timestamp. What flows back to Kafka is what processors
    send() — the reference's producer path (kafka.ts producer.send) — not
    chain results. Broker-free (pure transformation), so A11's semantics
    are testable without a broker: tests/test_kafka_gate.py drives this
    with synthetic batches.
    """
    from frolyk_spark.tasks.bridge import run_task_batch

    decoded = _decode_kafka_batch(batch_df).withColumn("part", F.col("partition"))
    return run_task_batch(
        task, spark, decoded, topic=topic,
        partition_col="part", offset_col="offset",
        value_col="value", key_col="key", timestamp_col="timestamp",
        headers_col="headers",
        emit="produced",
    )


def start_kafka_task(task, spark: SparkSession, checkpoint_dir: str | None = None):
    """One streaming query per source, mirroring task.ts:107-155."""
    connection = task.options["connection"]
    consumer = task.options.get("consumer")
    checkpoint_root = checkpoint_dir or tempfile.mkdtemp(prefix="frolyk-ckpt-")
    queries = []
    for source in task.sources:
        opts = build_source_options(connection, source.topic_name, source.offset_reset, consumer)
        stream = spark.readStream.format("kafka")
        for k, v in opts.items():
            stream = stream.option(k, v)
        raw = stream.load()

        def handle_batch(batch_df: DataFrame, epoch_id: int, _source=source) -> None:
            out = process_kafka_batch(task, spark, _source.topic_name, batch_df)
            out.write.format("kafka").options(
                **build_sink_options(connection)
            ).save()

        # the RAW stream goes to foreachBatch — process_kafka_batch owns
        # the decode (decoding here too would project/cast every batch
        # twice, working only because the decode happens to be idempotent)
        q = (
            raw.writeStream.foreachBatch(handle_batch)
            .option("checkpointLocation", os.path.join(checkpoint_root, source.topic_name))
            .start()
        )
        queries.append(q)
    return queries
