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
    converged = not any(deg[u] < k for u in alive)
    return sorted((u, rr[u], deg[u], converged) for u in adj)


def test_kcore_matches_python_reference(spark, sf_dir):
    from frolyk_spark.operators.graph import kcore_parts

    got = sorted(tuple(row) for row in kcore_parts(spark, sf_dir).collect())
    want = _python_kcore(sf_dir)
    assert got == want
    # the peel actually fired (some node removed in round >= 1)
    assert any(r[1] >= 1 for r in want)
    # and the shipped SFs all reach fixpoint inside the round budget
    assert all(r[3] for r in want)


def test_kcore_converged_flag_boundary(spark, sf_dir, monkeypatch):
    """Truncation honesty (r12 verdict item 7): with the round budget
    squeezed below the graph's real peel depth, every row must report
    converged=false — the 100×-scale consumer's signal that the peel was
    cut short, not finished."""
    from frolyk_spark.operators import graph

    # sf0.001 needs 3 peel rounds; 1 round leaves sub-k parts alive
    monkeypatch.setattr(graph, "KCORE_ROUNDS", 1)
    rows = graph.kcore_parts(spark, sf_dir).collect()
    assert rows and all(r["converged"] is False for r in rows)
    # nothing was stamped past the truncated budget
    assert all(r["removed_round"] <= 1 for r in rows)


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


def _python_components(sf_dir: str):
    """Union-find ground truth — deliberately a DIFFERENT algorithm than
    the min-label propagation under test (the test_dedup_clusters
    posture), so a shared misreading can't self-certify. The converged
    flag alone is propagation-defined, so it is simulated separately."""
    from frolyk_spark.operators.graph import COMPONENTS_ROUNDS

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
    parent = {u: u for u in adj}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for u in adj:
        for v in adj[u]:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
    comp = {u: find(u) for u in adj}
    # canonical id = component min (union-by-min above preserves it)
    roots = defaultdict(list)
    for u, r in comp.items():
        roots[r].append(u)
    cid = {u: min(roots[comp[u]]) for u in adj}
    size = {r: len(ms) for r, ms in roots.items()}
    # converged: simulate the fixed-budget min-label propagation
    label = {u: u for u in adj}
    converged = False
    for _ in range(COMPONENTS_ROUNDS):
        new = {
            u: min([label[u]] + [label[v] for v in adj[u]]) for u in adj
        }
        if new == label:
            converged = True
            break
        label = new
    return sorted(
        (u, cid[u], u == cid[u], size[comp[u]], converged) for u in adj
    )


def test_components_matches_union_find(spark, sf_dir):
    from frolyk_spark.operators.graph import components_parts

    got = sorted(tuple(r) for r in components_parts(spark, sf_dir).collect())
    want = _python_components(sf_dir)
    assert got == want
    assert all(r[4] for r in want)  # shipped SFs reach the fixpoint


def test_components_plan_shape(spark, sf_dir):
    from frolyk_spark.operators.graph import components_parts
    from frolyk_spark.plans.inspect import assert_scale_shape

    assert_scale_shape(components_parts(spark, sf_dir), forbid_cartesian=True)


def test_graph_profile_matches_python_reference(spark, sf_dir):
    from frolyk_spark.operators.graph import graph_profile

    tbl = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order = defaultdict(set)
    for ok, pk in zip(tbl["l_orderkey"].to_pylist(), tbl["l_partkey"].to_pylist()):
        by_order[ok].add(pk)
    w: dict = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                w[(u, v)] += 1
                w[(v, u)] += 1
    adj = defaultdict(dict)
    for (u, v), c in w.items():
        adj[u][v] = c
    deg = {u: len(vs) for u, vs in adj.items()}
    stren = {u: sum(vs.values()) for u, vs in adj.items()}
    n = len(deg)
    m = sum(deg.values())
    sum_deg2 = sum(d * d for d in deg.values())
    assort = sum(deg[u] * deg[v] for u, vs in adj.items() for v in vs)
    total_w = sum(stren.values())
    sum_strength2 = sum(s * s for s in stren.values())

    def histo(vals, kind):
        rows = defaultdict(lambda: [0, 0, 1 << 62, 0])
        for d in vals:
            b = d.bit_length() - 1
            rows[b][0] += 1
            rows[b][1] += d
            rows[b][2] = min(rows[b][2], d)
            rows[b][3] = max(rows[b][3], d)
        return [
            (kind, b, c, s, lo, hi, n, m, sum_deg2, assort, total_w,
             sum_strength2)
            for b, (c, s, lo, hi) in rows.items()
        ]

    want = sorted(
        histo(deg.values(), "deg") + histo(stren.values(), "strength")
    )
    got = sorted(tuple(r) for r in graph_profile(spark, sf_dir).collect())
    assert got == want
    # each histogram spans buckets, and strength mass exceeds degree mass
    # (repeated co-purchases exist)
    assert sum(1 for r in want if r[0] == "deg") >= 2
    assert sum(1 for r in want if r[0] == "strength") >= 2
    assert total_w > m


def test_graph_profile_plan_shape(spark, sf_dir):
    from frolyk_spark.operators.graph import graph_profile
    from frolyk_spark.plans.inspect import assert_scale_shape

    assert_scale_shape(graph_profile(spark, sf_dir), forbid_cartesian=False)


def _python_weighted_reference(sf_dir: str):
    tbl = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order = defaultdict(set)
    for ok, pk in zip(tbl["l_orderkey"].to_pylist(), tbl["l_partkey"].to_pylist()):
        by_order[ok].add(pk)
    w = defaultdict(int)  # symmetric: both directions carry the co-order count
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                w[(u, v)] += 1
                w[(v, u)] += 1
    wdeg = defaultdict(int)
    for (u, _), c in w.items():
        wdeg[u] += c
    nodes = sorted(wdeg)
    n = len(nodes)
    r = {u: PR_MASS // n for u in nodes}
    for _ in range(PR_ROUNDS):
        rate = {u: r[u] // wdeg[u] for u in nodes}
        inflow = defaultdict(int)
        for (u, v), c in w.items():
            inflow[v] += c * rate[u]
        r = {
            u: (15 * PR_MASS) // (100 * n) + (PR_DAMP_PCT * inflow[u]) // 100
            for u in nodes
        }
    ranked = sorted(nodes, key=lambda u: (-r[u], u))[:PR_TOP_K]
    return [(i + 1, u, r[u], wdeg[u]) for i, u in enumerate(ranked)]


def test_pagerank_weighted_matches_python_reference(spark, sf_dir):
    from frolyk_spark.operators.graph import pagerank_weighted

    got = sorted(
        tuple(row) for row in pagerank_weighted(spark, sf_dir).collect()
    )
    want = sorted(_python_weighted_reference(sf_dir))
    assert got == want
    # non-degeneracy: the corpus really contains a repeated co-purchase
    # (all-w=1 data would make C74 collapse to C67 and this test test
    # nothing beyond it; w_deg > 0 alone is true by construction —
    # r14 review). Recomputed here from the raw table, independent of
    # the ranked output.
    tbl = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order = defaultdict(set)
    for ok, pk in zip(tbl["l_orderkey"].to_pylist(), tbl["l_partkey"].to_pylist()):
        by_order[ok].add(pk)
    w = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                w[(u, v)] += 1
    assert any(c > 1 for c in w.values())


def test_pagerank_weighted_differs_from_unweighted(spark, sf_dir):
    """The weighted walk must not degenerate to the unweighted one — if
    every co-purchase count were 1 the new operator would be C67 with
    extra steps. On the shipped data repeated co-purchases exist, so the
    score vectors differ somewhere in the top-K."""
    from frolyk_spark.operators.graph import pagerank_parts, pagerank_weighted

    unw = {r["part_key"]: r["pr_score"]
           for r in pagerank_parts(spark, sf_dir).collect()}
    wgt = {r["part_key"]: r["pr_score"]
           for r in pagerank_weighted(spark, sf_dir).collect()}
    assert any(unw.get(k) != v for k, v in wgt.items())


def test_pagerank_weighted_plan_shape(spark, sf_dir):
    from frolyk_spark.operators.graph import pagerank_weighted
    from frolyk_spark.plans.inspect import assert_scale_shape

    assert_scale_shape(pagerank_weighted(spark, sf_dir), forbid_cartesian=True)


def _python_wkcore(sf_dir: str):
    from frolyk_spark.operators.graph import (
        KCORE_ROUNDS, WKCORE_DEN, WKCORE_NUM,
    )

    tbl = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order = defaultdict(set)
    for ok, pk in zip(tbl["l_orderkey"].to_pylist(), tbl["l_partkey"].to_pylist()):
        by_order[ok].add(pk)
    w: dict = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                w[(u, v)] += 1
                w[(v, u)] += 1
    adj = defaultdict(dict)
    for (u, v), c in w.items():
        adj[u][v] = c
    n = len(adj)
    tot = sum(sum(d.values()) for d in adj.values())
    k = (WKCORE_NUM * (tot // n)) // WKCORE_DEN
    s = {u: sum(adj[u].values()) for u in adj}
    rr = {u: 0 for u in adj}
    alive = set(adj)
    for t in range(1, KCORE_ROUNDS + 1):
        drop = {u for u in alive if s[u] < k}
        for u in drop:
            rr[u] = t  # strength frozen at removal
        alive -= drop
        s.update(
            (u, sum(c for v, c in adj[u].items() if v in alive))
            for u in alive
        )
    converged = not any(s[u] < k for u in alive)
    return sorted((u, rr[u], s[u], converged) for u in adj)


def test_kcore_weighted_matches_python_reference(spark, sf_dir):
    from frolyk_spark.operators.graph import kcore_weighted

    got = sorted(tuple(row) for row in kcore_weighted(spark, sf_dir).collect())
    want = _python_wkcore(sf_dir)
    assert got == want
    # both regimes visible at the probed threshold: the peel fired AND
    # a core survived (the STRENGTH-carrying parts) — and it converged
    assert any(r[1] >= 1 for r in want)
    assert any(r[1] == 0 for r in want)
    assert all(r[3] for r in want)


def test_kcore_weighted_differs_from_unweighted(spark, sf_dir):
    """The weighted peel must use MASS, not degree: at the shipped SFs
    the two peels classify different part sets (a part with many one-off
    co-purchases survives by degree but falls by strength)."""
    from frolyk_spark.operators.graph import kcore_parts, kcore_weighted

    kd = {r.part_key: r.removed_round for r in kcore_parts(spark, sf_dir).collect()}
    kw = {r.part_key: r.removed_round for r in kcore_weighted(spark, sf_dir).collect()}
    assert set(kd) == set(kw)
    assert any(
        (kd[p] == 0) != (kw[p] == 0) for p in kd
    ), "weighted and unweighted cores are identical — weight unused?"


def test_kcore_weighted_plan_shape(spark, sf_dir):
    from frolyk_spark.operators.graph import kcore_weighted
    from frolyk_spark.plans.inspect import assert_scale_shape

    assert_scale_shape(kcore_weighted(spark, sf_dir), forbid_cartesian=True)
