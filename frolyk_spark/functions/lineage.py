"""Lineage control shared by operators that feed one computed frame into
both sides of a self-join or a broadcast-scalar crossJoin.

Spark reuses *exchanges* only for identical plan subtrees; a computed
frame referenced twice (self-join sides, scalar + probe) is otherwise
recomputed per reference — the simhash-pairs 9× lesson (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Materialize ``df`` once and return a frame whose plan starts from
    the materialized blocks. localCheckpoint stores blocks on executors
    (non-reliable): one executor loss mid-iteration fails the whole job,
    and each round's blocks pin executor memory for the session lifetime.
    When the session has a reliable checkpoint dir configured
    (sparkContext.setCheckpointDir — HDFS/object store on a cluster), use
    checkpoint() instead: survives executor loss and keeps state off the
    executors. Tests/local runs without a checkpoint dir keep the fast
    local path.

    ``eager=False`` (r15 optimization) truncates the plan NOW but defers
    materialization to the caller's next action — the shape for iterative
    loops whose fixpoint probe (a count) can double as the materializing
    action, folding the old checkpoint-job + count-job pair into ONE job
    per round. The caller owns the contract that its next action scans
    EVERY partition (count/agg do; a limit would under-materialize).
    NOTE: persist() is NOT a substitute here — it truncates the physical
    plan but keeps the logical tree nested, and with 2-3 self-join arms
    per round the AQE plan-description string grows exponentially in
    round count (measured: OOM at round ~7 of the kcore peel at sf0.1,
    in explainString via Arrays.copyOfRange)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
