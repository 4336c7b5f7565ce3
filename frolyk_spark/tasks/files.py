"""File-backed task execution — the broker-free ``task.start()``.

Runs a Task topology as real Structured Streaming queries over file-stream
"topics" (directories of parquet), with the same lifecycle the Kafka path
has (reference src/task.ts:107-255): checkpoint-managed offsets, restart
picks up only unprocessed files, processor ``send()`` output lands in a
parquet sink partitioned by (source, epoch, destination topic) — the
epoch-keyed overwrite makes foreachBatch's at-least-once retries
idempotent, so the sink is effectively exactly-once. This is the path CI can
exercise end-to-end — the Kafka variant (tasks/kafka.py) only swaps the
source/sink formats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frolyk_spark.tasks.bridge import run_task_batch


def start_file_task(
    task,
    spark: SparkSession,
    *,
    topic_dirs: dict[str, str],
    schemas: dict[str, object],
    partition_col: str,
    offset_col: str,
    checkpoint_root: str,
    sink_dir: str,
    available_now: bool = True,
    batch_hook=None,
):
    """One streaming query per source. Rows of a topic directory are the
    message values (DataFrame-native shape: ``message['value']`` is the row
    dict); ``partition_col``/``offset_col`` give frolyk's partition/offset
    coordinates. Returns the list of started queries; with
    ``available_now`` they terminate once caught up — call again later to
    resume from the checkpoint (committed-offset recovery).

    ``batch_hook(topic, epoch_id)``, if given, runs after the sink write
    and before the epoch commits — for metrics/telemetry; an exception it
    raises fails the epoch so it is retried on restart (the sink write is
    idempotent, see below).
    """
    queries = []
    for source in task.sources:
        topic = source.topic_name
        if topic not in topic_dirs:
            raise ValueError(f"no directory mapped for source topic {topic!r}")

        def handle_batch(batch_df: DataFrame, epoch_id: int, _topic=topic) -> None:
            produced = run_task_batch(
                task, spark, batch_df, topic=_topic,
                partition_col=partition_col, offset_col=offset_col,
                emit="produced",
            )
            # foreachBatch is at-least-once; exactly-once comes from the
            # epoch-keyed directory overwrite: a retried epoch replaces its
            # own previous (possibly partial) output instead of appending a
            # duplicate.
            epoch_dir = os.path.join(sink_dir, f"src={_topic}", f"epoch={epoch_id}")
            produced.write.mode("overwrite").partitionBy("topic").parquet(epoch_dir)
            if batch_hook is not None:
                batch_hook(_topic, epoch_id)

        writer = (
            spark.readStream.schema(schemas[topic])
            .parquet(topic_dirs[topic])
            .writeStream.foreachBatch(handle_batch)
            .option("checkpointLocation", os.path.join(checkpoint_root, topic))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        queries.append(writer.start())
    return queries
