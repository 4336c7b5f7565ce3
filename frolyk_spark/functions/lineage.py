"""Lineage control shared by operators that feed one computed frame into
both sides of a self-join or a broadcast-scalar crossJoin.

Spark reuses *exchanges* only for identical plan subtrees; a computed
frame referenced twice (self-join sides, scalar + probe) is otherwise
recomputed per reference — the simhash-pairs 9× lesson (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` once and return a frame whose plan starts from
    the materialized blocks. localCheckpoint stores blocks on executors
    (non-reliable): one executor loss mid-iteration fails the whole job,
    and each round's blocks pin executor memory for the session lifetime.
    When the session has a reliable checkpoint dir configured
    (sparkContext.setCheckpointDir — HDFS/object store on a cluster), use
    checkpoint() instead: survives executor loss and keeps state off the
    executors. Tests/local runs without a checkpoint dir keep the fast
    local path."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
