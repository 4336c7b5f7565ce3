from frolyk_spark.tasks.offsets import LogicalOffset, is_earliest, is_latest
from frolyk_spark.tasks.pipeline import ABANDON, ProcessingContext
from frolyk_spark.tasks.task import Source, Task, create_task

__all__ = [
    "ABANDON",
    "LogicalOffset",
    "ProcessingContext",
    "Source",
    "Task",
    "create_task",
    "is_earliest",
    "is_latest",
]
