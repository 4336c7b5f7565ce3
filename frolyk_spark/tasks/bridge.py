"""Distributed execution of a Task's processor chain over Spark.

This is the scale path the reference cannot express: the same
``setup(assignment) -> fn(value, context)`` processors that run in the local
inject harness execute across a cluster, one assignment per partition group,
rows Arrow-batched through ``applyInPandas`` (grouped-map). Per-partition
ordering — frolyk's core guarantee (reference src/streams.ts: one ordered
stream per topic-partition) — is preserved by sorting each group on the
offset column before the chain runs.

At 100 TB the number of "partitions" is the parallelism knob: groups hash-
shuffle once, each group streams through a single Python worker as Arrow
batches, and the chain itself is plain per-message Python exactly like the
reference's processors.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frolyk_spark.tasks.pipeline import build_processors, is_abandoned, process_message


class BatchAssignmentContext:
    """AssignmentContext for distributed batch runs.

    Offset bookkeeping is local to the partition group; ``send`` is collected
    into ``produced`` for the caller's sink (in streaming mode foreachBatch
    flushes these to Kafka).
    """

    def __init__(self, topic: str, partition: int, group: str, high_offset: int):
        self.topic = topic
        self.partition = partition
        self.group = group
        self._high_offset = high_offset
        self._committed = {"offset": -1, "metadata": None}
        self.committed_offsets: list[dict] = []
        self.produced: list[dict] = []

    def caught_up(self, offset: int) -> bool:
        return offset + 1 >= self._high_offset

    def commit_offset(self, new_offset: int, metadata: str | None = None) -> None:
        entry = {"offset": new_offset, "metadata": metadata}
        self._committed = entry
        self.committed_offsets.append(entry)

    def committed(self) -> dict:
        return dict(self._committed)

    def is_empty(self) -> bool:
        return self._high_offset <= 0

    def log(self, tags, payload) -> None:
        pass

    def seek(self, offset) -> None:
        raise NotImplementedError("seek is not available in distributed batch mode")

    def send(self, messages) -> list[dict]:
        if not isinstance(messages, (list, tuple)):
            messages = [messages]
        self.produced.extend(messages)
        return [
            {"topic_name": m.get("topic"), "partition": m.get("partition"), "error_code": 0}
            for m in messages
        ]

    def watermarks(self) -> dict:
        return {"high_offset": self._high_offset, "low_offset": 0}


def run_task_batch(
    task,
    spark: SparkSession,
    df: DataFrame,
    *,
    topic: str,
    partition_col: str,
    offset_col: str,
    output_schema: str,
    num_partitions: int | None = None,
) -> DataFrame:
    source = next((s for s in task.sources if s.topic_name == topic), None)
    if source is None:
        raise ValueError(f"task has no source {topic!r}")
    processors = list(source.processors)
    group = task.group

    out_cols = [f.strip().split()[0] for f in output_schema.split(",")]

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(offset_col, kind="mergesort")
        partition = int(pdf[partition_col].iloc[0])
        offsets = pdf[offset_col].astype("int64")
        high = int(offsets.iloc[-1]) + 1
        ctx = BatchAssignmentContext(topic, partition, group, high)
        fns = build_processors(ctx, processors)

        results: list[dict[str, Any]] = []
        records = pdf.to_dict("records")
        for rec, off in zip(records, offsets):
            message = {
                "topic": topic,
                "partition": partition,
                "key": None,
                "value": rec,
                "offset": int(off),
                "timestamp": str(rec.get("ts", "")),
                "high_water_offset": high,
            }
            result, _ = process_message(message, fns, ctx)
            if not is_abandoned(result):
                results.append(result)
        if not results:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols})
        return pd.DataFrame(results, columns=out_cols)

    return df.groupBy(partition_col).applyInPandas(run_group, output_schema)


# --- queries() entry: the frolyk processor API compiled to Spark -----------

def task_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declare a frolyk-style task (source + chained processors with an
    ABANDON filter) and execute it distributed over the events table."""
    from frolyk_spark.sources.catalog import load_table
    from frolyk_spark.tasks.task import Task

    task = Task(group="pipeline-demo")
    events = task.source("events")

    def setup(assignment):
        def keep_commerce(message, context):
            value = message["value"]
            if value["event_type"] not in ("click", "purchase"):
                return context.abandon
            return value

        def enrich(value, context):
            # doubling a float is exact in IEEE-754, so the DuckDB oracle
            # (value * 2) matches bit-for-bit
            return {"event_id": value["event_id"], "doubled": value["value"] * 2.0}

        return [keep_commerce, enrich]

    task.processor(events, setup)

    df = load_table(spark, sf_dir, "events").withColumn(
        "part", F.pmod(F.col("user_id"), F.lit(16)).cast("int")
    )
    return task.run_batch(
        spark, df, topic="events", partition_col="part", offset_col="event_id",
        output_schema="event_id bigint, doubled double",
    )


TASK_PIPELINE_SQL = """
SELECT event_id, value * 2 AS doubled
FROM events
WHERE event_type IN ('click', 'purchase')
"""

QUERIES = {"task_pipeline": task_pipeline}
ORACLES = {"task_pipeline": TASK_PIPELINE_SQL}
