"""Physical-plan inspection: the pre-flight audit for 100 TB posture.

A query can return the right rows while scanning every column, skipping
pushdown, or planning a cartesian product — correctness tests can't see
any of that. ``plan_report`` extracts the facts that matter from
``explain("formatted")`` into a dict; ``assert_scale_shape`` turns them
into a guard a pipeline (or a test — see tests/test_plans.py) runs before
committing cluster hours. Pairs with operators.relational.key_skew_profile
(the data-side pre-flight probe) — one checks the plan, the other the keys.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

#: join operators worth reporting, in the order they appear in plans
_JOIN_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def _formatted(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _top_level_columns(schema_body: str) -> set:
    """Column names from a struct<...> body, splitting only on commas at
    nesting depth 0 so array<…>/struct<…> column types stay intact —
    parentheses count as nesting too, or decimal(10,2)/char(n) types
    would split at their internal comma into phantom columns."""
    cols, depth, cur = [], 0, []
    for ch in schema_body:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        cols.append("".join(cur))
    return {c.split(":")[0].strip() for c in cols if c.strip()}


def plan_report(df: DataFrame) -> dict:
    """Extract the scale-relevant facts of ``df``'s physical plan.

    Returns a dict with:

    - ``pushed_filters``: list of PushedFilters strings, one per scan —
      empty strings mean a scan with NOTHING pushed (a filter evaluated
      after the read).
    - ``read_schemas``: list of per-scan column-name sets — the column
      pruning story; a scan reading 16 columns for a 2-column projection
      shows up here.
    - ``joins``: dict of join-operator name -> count.
    - ``scans``: number of file scans (a frame feeding a self-join twice
      without a lineage cut shows as duplicate scans).
    - ``exchanges``: number of shuffle exchanges.
    - ``has_cartesian``: CartesianProduct anywhere in the plan.
    - ``has_take_ordered``: top-K planned as a heap (TakeOrderedAndProject)
      rather than a global sort + limit.
    """
    plan = _formatted(df)
    # greedy-to-end-of-line captures survive nested types (array<double>,
    # struct<…>) and bracketed filters (In(col, [a,b])) — a lazy
    # [^>]*/[^\]]* form truncates at the FIRST closer, dropping trailing
    # columns/filters and leaking nested field names as phantom columns
    read_schemas = [
        _top_level_columns(m)
        for m in re.findall(r"ReadSchema: struct<(.*)>", plan)
    ]
    # "formatted" lists every operator twice (tree + details); count the
    # numbered detail headers — exactly one per physical operator
    def _op_count(op: str) -> int:
        return len(re.findall(rf"\(\d+\) {op}", plan))

    return {
        "pushed_filters": re.findall(r"PushedFilters: \[(.*)\]", plan),
        "read_schemas": read_schemas,
        "joins": {op: _op_count(op) for op in _JOIN_OPS if op in plan},
        "scans": _op_count("Scan parquet"),
        "exchanges": _op_count("Exchange"),
        "has_cartesian": "CartesianProduct" in plan,
        "has_take_ordered": "TakeOrderedAndProject" in plan,
        # the distinct-rewrite trap (CLAUDE.md): Expand is how Spark plans
        # MULTI-count(DISTINCT) alongside other aggregates — every other
        # aggregate's buffer rides the per-distinct-key regroup. Harmless
        # for tiny buffers (sums), catastrophic for sketch buffers
        # (ObjectHashAggregate: GK percentiles, HLL, collect_*) — 13 s vs
        # 1.3 s at sf0.1 on approx_stats_bounds (r11). Expand is ALSO how
        # rollup/cube/grouping-sets plan, so the distinct rewrite is
        # identified by its `gid#N` attribute (RewriteDistinctAggregates'
        # group id), never by Expand alone — grouping sets carry
        # `spark_grouping_id#N` instead (r14 review: a legitimate
        # rollup + collect_set must not trip the guard).
        "has_expand": _op_count("Expand") > 0,
        "has_distinct_expand": (
            _op_count("Expand") > 0 and bool(re.search(r"\bgid#\d+", plan))
        ),
        "has_object_aggregate": _op_count("ObjectHashAggregate") > 0,
        "plan": plan,
    }


def assert_scale_shape(
    df: DataFrame,
    *,
    forbid_cartesian: bool = True,
    forbid_nested_loop: bool = False,
    forbid_distinct_sketch_regroup: bool = True,
    require_pushed: tuple[str, ...] = (),
    max_scan_columns: int | None = None,
    max_scans: int | None = None,
) -> dict:
    """Guard a plan before running it at scale; returns the report.

    - ``forbid_cartesian``: fail on CartesianProduct (default: on).
    - ``forbid_nested_loop``: also fail on BroadcastNestedLoopJoin (off by
      default — a broadcast ONE-ROW scalar legitimately plans as one).
    - ``forbid_distinct_sketch_regroup``: fail when a count-DISTINCT
      rewrite's Expand (identified by its gid attribute — rollup/cube
      Expands carry spark_grouping_id and stay legal) coexists with an
      ObjectHashAggregate (sketch buffers: GK percentiles, HLL,
      collect_*) — the regroup drags every sketch buffer through a
      per-distinct-key shuffle (10x at sf0.1, r11). Run the exact
      distinct in its OWN pass and crossJoin the one-row results
      instead (default: on — the combination is never the plan you
      want at scale).
    - ``require_pushed``: substrings (usually column names) that must
      appear in some scan's PushedFilters — the predicate actually
      reached storage.
    - ``max_scan_columns``: ceiling on columns read by any single scan
      (column-pruning guard).
    - ``max_scans``: ceiling on file scans (catches a self-join
      recomputing its input instead of cutting lineage).

    Raises ``AssertionError`` with the offending fact and a plan excerpt.
    """
    rep = plan_report(df)
    excerpt = rep["plan"][:2000]
    if forbid_cartesian and rep["has_cartesian"]:
        raise AssertionError(f"plan contains CartesianProduct\n{excerpt}")
    if forbid_nested_loop and "BroadcastNestedLoopJoin" in rep["joins"]:
        raise AssertionError(f"plan contains BroadcastNestedLoopJoin\n{excerpt}")
    if (
        forbid_distinct_sketch_regroup
        and rep["has_distinct_expand"]
        and rep["has_object_aggregate"]
    ):
        raise AssertionError(
            "count(DISTINCT) rewrite (Expand) drags sketch buffers "
            "(ObjectHashAggregate) through a per-distinct-key regroup — "
            "run the distinct in its own pass and crossJoin the one-row "
            f"results (CLAUDE.md, r11: 13 s vs 1.3 s)\n{excerpt}"
        )
    pushed_all = " ".join(rep["pushed_filters"])
    for needle in require_pushed:
        if needle not in pushed_all:
            raise AssertionError(
                f"filter on {needle!r} did not reach any scan "
                f"(pushed: {rep['pushed_filters']})\n{excerpt}"
            )
    if max_scan_columns is not None:
        for cols in rep["read_schemas"]:
            if len(cols) > max_scan_columns:
                raise AssertionError(
                    f"scan reads {len(cols)} columns (> {max_scan_columns}): "
                    f"{sorted(cols)}\n{excerpt}"
                )
    if max_scans is not None and rep["scans"] > max_scans:
        raise AssertionError(
            f"{rep['scans']} file scans (> {max_scans}) — recomputed input? "
            f"consider functions.lineage.cut_lineage\n{excerpt}"
        )
    return rep
