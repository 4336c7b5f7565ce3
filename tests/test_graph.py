"""pagerank_parts (C67): independent pure-Python integer reference +
plan-shape audit. Oracle parity runs in test_correctness like every
other entry; this file checks the MATH against a third implementation
(Python ints, no SQL engine) so a shared Spark/DuckDB misreading of the
update rule can't self-certify."""

from collections import defaultdict

import pyarrow.parquet as pq

from frolyk_spark.operators.graph import (
    PR_DAMP_PCT,
    PR_MASS,
    PR_ROUNDS,
    PR_TOP_K,
    pagerank_parts,
)


def _python_reference(sf_dir: str):
    tbl = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    by_order = defaultdict(set)
    for ok, pk in zip(tbl["l_orderkey"].to_pylist(), tbl["l_partkey"].to_pylist()):
        by_order[ok].add(pk)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                edges.add((u, v))
                edges.add((v, u))
    outdeg = defaultdict(int)
    for u, _ in edges:
        outdeg[u] += 1
    nodes = sorted(outdeg)
    n = len(nodes)
    r = {u: PR_MASS // n for u in nodes}
    for _ in range(PR_ROUNDS):
        inflow = defaultdict(int)
        share = {u: r[u] // outdeg[u] for u in nodes}
        for u, v in edges:
            inflow[v] += share[u]
        r = {
            u: (15 * PR_MASS) // (100 * n) + (PR_DAMP_PCT * inflow[u]) // 100
            for u in nodes
        }
    ranked = sorted(nodes, key=lambda u: (-r[u], u))[:PR_TOP_K]
    return [(i + 1, u, r[u]) for i, u in enumerate(ranked)]


def test_pagerank_matches_python_reference(spark, sf_dir):
    got = sorted(
        tuple(row) for row in pagerank_parts(spark, sf_dir).collect()
    )
    want = sorted(_python_reference(sf_dir))
    assert got == want


def test_pagerank_plan_shape(spark, sf_dir):
    from frolyk_spark.plans.inspect import assert_scale_shape

    # the final frame's lineage starts at the last round's checkpoint; the
    # audit still proves the top-K window runs without a cartesian and the
    # result is a bounded 3-column projection
    assert_scale_shape(pagerank_parts(spark, sf_dir), forbid_cartesian=True)


def _python_kcore(sf_dir: str):
    from frolyk_spark.operators.graph import (
        KCORE_DEN, KCORE_NUM, KCORE_ROUNDS,
    )

    tbl = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order = defaultdict(set)
    for ok, pk in zip(tbl["l_orderkey"].to_pylist(), tbl["l_partkey"].to_pylist()):
        by_order[ok].add(pk)
    adj = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                adj[u].add(v)
                adj[v].add(u)
    n = len(adj)
    m = sum(len(vs) for vs in adj.values())
    k = (KCORE_NUM * (m // n)) // KCORE_DEN
    deg = {u: len(adj[u]) for u in adj}
    rr = {u: 0 for u in adj}
    alive = set(adj)
    for t in range(1, KCORE_ROUNDS + 1):
        drop = {u for u in alive if deg[u] < k}
        for u in drop:
            rr[u] = t  # degree frozen at removal
        alive -= drop
        deg.update(
            (u, sum(1 for v in adj[u] if v in alive)) for u in alive
        )
    return sorted((u, rr[u], deg[u]) for u in adj)


def test_kcore_matches_python_reference(spark, sf_dir):
    from frolyk_spark.operators.graph import kcore_parts

    got = sorted(tuple(row) for row in kcore_parts(spark, sf_dir).collect())
    want = _python_kcore(sf_dir)
    assert got == want
    # the peel actually fired (some node removed in round >= 1)
    assert any(r[1] >= 1 for r in want)


def test_kcore_plan_shape(spark, sf_dir):
    from frolyk_spark.operators.graph import kcore_parts
    from frolyk_spark.plans.inspect import assert_scale_shape

    assert_scale_shape(kcore_parts(spark, sf_dir), forbid_cartesian=True)


def _python_triangles(sf_dir: str):
    tbl = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order = defaultdict(set)
    for ok, pk in zip(tbl["l_orderkey"].to_pylist(), tbl["l_partkey"].to_pylist()):
        by_order[ok].add(pk)
    adj = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                adj[u].add(v)
                adj[v].add(u)
    tri = defaultdict(int)
    order = {u: (len(adj[u]), u) for u in adj}
    for u in adj:
        higher = sorted((v for v in adj[u] if order[v] > order[u]),
                        key=lambda v: order[v])
        for i, v in enumerate(higher):
            for w in higher[i + 1:]:
                if w in adj[v]:
                    tri[u] += 1
                    tri[v] += 1
                    tri[w] += 1
    return sorted(
        (u, len(adj[u]), tri[u], (len(adj[u]) * (len(adj[u]) - 1)) // 2)
        for u in adj
    )


def test_triangle_matches_python_reference(spark, sf_dir):
    from frolyk_spark.operators.graph import triangle_parts

    got = sorted(tuple(row) for row in triangle_parts(spark, sf_dir).collect())
    want = _python_triangles(sf_dir)
    assert got == want
    # the count actually fired: triangles exist and 3 | sum(per-node)
    total = sum(r[2] for r in want)
    assert total > 0 and total % 3 == 0


def test_triangle_plan_shape(spark, sf_dir):
    from frolyk_spark.operators.graph import triangle_parts
    from frolyk_spark.plans.inspect import assert_scale_shape

    assert_scale_shape(triangle_parts(spark, sf_dir), forbid_cartesian=True)
