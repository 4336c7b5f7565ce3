"""frolyk_spark — PySpark-native stream-processing + analytics engine.

Re-expresses the capabilities of JaapRood/frolyk (a Kafka stream-processing
library for Node, see /root/reference) on Apache Spark: Structured Streaming
for the stream-processing core, the DataFrame/SQL API for the analytics and
LLM-data-pipeline operator surface. Designed for 100 TB-scale clusters;
tested locally against DuckDB oracles.
"""

from frolyk_spark.session import get_spark
from frolyk_spark.tasks.task import Task, create_task, ABANDON

__all__ = ["get_spark", "Task", "create_task", "ABANDON"]
