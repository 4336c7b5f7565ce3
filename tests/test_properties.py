"""Property-based checks (hypothesis) for the pure-Python layers: the
portable hash model and the local inject harness. No Spark session — each
example runs in microseconds, so hypothesis can explore widely."""

import hashlib
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from frolyk_spark.tasks.task import Task

# --- the portable-hash model -------------------------------------------------
# Spark computes conv(substr(md5(x),1,15),16,10); DuckDB casts the same hex
# slice. Both must equal this Python model (Spark/DuckDB agreement with the
# model is pinned by tests/test_hashing.py on a fixed corpus + documents).


def _model_hash(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_model_hash_is_60bit_nonnegative(s):
    h = _model_hash(s)
    assert 0 <= h < (1 << 60)


@given(st.text(min_size=1, max_size=100))
@settings(max_examples=200, deadline=None)
def test_duckdb_matches_python_model(s):
    import duckdb

    con = duckdb.connect()
    (h,) = con.execute(
        "SELECT cast(concat('0x', substr(md5(?), 1, 15)) as bigint)", [s]
    ).fetchone()
    con.close()
    assert h == _model_hash(s)


# --- local inject harness ----------------------------------------------------


def _make_harness():
    task = Task(group="prop")
    src = task.source("t")

    def setup(assignment):
        def double(message, context):
            v = json.loads(message["value"].decode())
            if v % 3 == 0:
                return context.abandon
            return v * 2

        return double

    task.processor(src, setup)
    return task.inject({"topic": "t", "partition": 0})


@given(st.lists(st.integers(min_value=-10**6, max_value=10**6), max_size=40))
@settings(max_examples=100, deadline=None)
def test_inject_results_match_chain_model(values):
    """processing_results == chain applied in order, minus abandoned;
    processed_offsets covers every injected message in order."""
    ctx = _make_harness()
    for v in values:
        ctx.inject({"value": v})
    expected = [v * 2 for v in values if v % 3 != 0]
    assert ctx.processing_results == expected
    assert ctx.processed_offsets == sorted(ctx.processed_offsets)
    assert len(ctx.processed_offsets) == len(values)
    if values:
        assert ctx.caught_up()


@given(
    st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=20),
)
@settings(max_examples=100, deadline=None)
def test_explicit_offsets_must_increase(offsets):
    """The harness enforces the reference's high-watermark rule: an injected
    offset must exceed the current one (local.ts offset checks)."""
    ctx = _make_harness()
    current = -1
    for off in offsets:
        target = current + off  # strictly increasing
        ctx.inject({"value": 1, "offset": target})
        current = target
    assert ctx.processed_offsets == list(
        _running(offsets)
    ), "offsets processed exactly as injected"


def _running(offsets):
    acc = -1
    for off in offsets:
        acc += off
        yield acc


# --- AllPairs/PPJoin filter admissibility (dedup_ngram_jaccard) --------------
# Pure-Python model of the candidate filters in
# frolyk_spark.operators.dedup.dedup_ngram_jaccard: df-ordered prefix join,
# size filter, and the positional overlap upper bound. The property: no pair
# with true Jaccard >= t is ever pruned — the filters are admissible for ANY
# input, which is the exactness claim the operator's recall rests on.

import math


def _ppjoin_model(docs, t):
    """Return (true_pairs, surviving_pairs) under the modeled filters."""
    sets = [frozenset(d) for d in docs]
    df = {}
    for s in sets:
        for g in s:
            df[g] = df.get(g, 0) + 1
    order = {g: i for i, g in enumerate(sorted(df, key=lambda g: (df[g], g)))}
    ranked = [sorted(s, key=order.get) for s in sets]
    prefix = [
        r[: len(r) - math.ceil(t * len(r)) + 1] if r else []
        for r in ranked
    ]
    rank = [{g: i + 1 for i, g in enumerate(r)} for r in ranked]

    true_pairs = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union and inter / union >= t:
                true_pairs.add((i, j))

    surviving = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            na, nb = len(sets[i]), len(sets[j])
            if not na or not nb:
                continue
            shared_prefix = set(prefix[i]) & set(prefix[j])
            if not shared_prefix:
                continue  # AllPairs prefix join produced no candidate
            if min(na, nb) < t * max(na, nb):
                continue  # size filter
            c = len(shared_prefix)
            mrk_a = max(rank[i][g] for g in shared_prefix)
            mrk_b = max(rank[j][g] for g in shared_prefix)
            alpha = math.ceil(t / (1.0 + t) * (na + nb))
            if c + min(na - mrk_a, nb - mrk_b) >= alpha:
                surviving.add((i, j))
    return true_pairs, surviving


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=25), min_size=1, max_size=20),
        min_size=2,
        max_size=8,
    ),
    st.sampled_from([0.3, 0.5, 0.7, 0.9]),
)
@settings(max_examples=300, deadline=None)
def test_ppjoin_filters_never_prune_true_pairs(docs, t):
    """Admissibility: prefix join + size filter + positional upper bound
    keep EVERY pair with Jaccard >= t. (The converse — pruning false
    candidates — is an efficiency property, not asserted.)"""
    true_pairs, surviving = _ppjoin_model(docs, t)
    missed = true_pairs - surviving
    assert not missed, f"true pairs pruned: {missed}"


# --- BMP/WAV codec round trips (D58 decode boundary) --------------------------


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=12),
    st.randoms(use_true_random=False),
)
@settings(max_examples=120, deadline=None)
def test_bmp_roundtrip_property(w, h, rng):
    from frolyk_spark.functions.codecs import decode_bmp, encode_bmp

    content = bytes(rng.randrange(256) for _ in range(3 * w * h))
    assert decode_bmp(encode_bmp(content, w, h)) == (w, h, content)


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=256),
    st.sampled_from([8000, 16000, 22050, 44100]),
)
@settings(max_examples=120, deadline=None)
def test_wav_roundtrip_property(samples, rate):
    from frolyk_spark.functions.codecs import decode_wav, encode_wav

    assert decode_wav(encode_wav(samples, rate)) == (rate, samples)


@given(
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=120),
    st.randoms(use_true_random=False),
)
@settings(max_examples=80, deadline=None)
def test_fvid_roundtrip_property(w, h, n, fps, rng):
    from frolyk_spark.functions.codecs import decode_fvid, encode_fvid

    frames = [
        bytes(rng.randrange(256) for _ in range(3 * w * h)) for _ in range(n)
    ]
    assert decode_fvid(encode_fvid(frames, w, h, fps)) == (w, h, fps, frames)


@given(st.integers(min_value=0, max_value=(1 << 60) - 1))
@settings(max_examples=300, deadline=None)
def test_bloom_probe_positions_distinct_and_in_range(gh):
    """decontaminate_bloom's double hashing must yield BLOOM_K DISTINCT
    in-range positions for every 60-bit gram hash — h2 is forced odd, so
    it is coprime with the power-of-two BLOOM_M and i·h2 mod m never
    collides for i < k. A collision would silently lower the effective k
    (more false positives than the docstring's math claims)."""
    from frolyk_spark.operators.pipeline import BLOOM_K, BLOOM_M

    h2 = ((gh >> 20) % BLOOM_M) | 1
    pos = [(gh + i * h2) % BLOOM_M for i in range(BLOOM_K)]
    assert len(set(pos)) == BLOOM_K
    assert all(0 <= p < BLOOM_M for p in pos)


def test_dsir_products_inside_int64_at_test_scale():
    """dsir_select's cross-multiplied selector stays integer-exact only
    while sum_t·tot_r and sum_r·tot_t fit int64; assert BOTH actual
    selector products at the largest test SF so growth toward the
    documented decimal(38,0) escalation point is visible, not silent.
    (tot_t/tot_r are the corpus totals the selector really multiplies —
    an earlier form of this test used Σ_docs sum_r, a ~350x-larger
    quadratic-growth quantity that would fire spuriously.)"""
    import duckdb

    from frolyk_spark.operators.pipeline import DSIR_SELECT_SQL

    con = duckdb.connect()
    con.sql(
        "create view documents as select * from "
        "'/root/testdata/sf0.1/documents.parquet'"
    )
    # recompute the totals exactly as the operator defines them: sums of
    # the per-bucket counts = total gram occurrences (target / raw)
    mt, mr, tot_t, tot_r = con.sql(
        f"""
        WITH d AS ({DSIR_SELECT_SQL})
        SELECT max(sum_t), max(sum_r),
               (SELECT count(*) FROM (
                  SELECT unnest(string_split(text, ' ')) FROM documents
                  WHERE lang = 'en') t) - (SELECT count(*) FROM documents
                                           WHERE lang = 'en'),
               (SELECT count(*) FROM (
                  SELECT unnest(string_split(text, ' ')) FROM documents) t)
               - (SELECT count(*) FROM documents)
        FROM d
        """
    ).fetchone()
    assert int(mt) * int(tot_r) < 2**62, (mt, tot_r)
    assert int(mr) * int(tot_t) < 2**62, (mr, tot_t)


# --- r11 integer kernels -------------------------------------------------------
# Pure-Python models of the cross-engine integer arithmetic the r11
# operators rely on: both engines execute these exact expressions, so the
# property layer explores the input space the fixed corpus can't.


@given(
    st.integers(min_value=0, max_value=30_000_000),  # idf_u (1e6-scaled ln)
    st.integers(min_value=1, max_value=10_000),      # tf
    st.integers(min_value=1, max_value=100_000),     # A = floor avgdl
    st.integers(min_value=1, max_value=10_000_000),  # dl
)
@settings(max_examples=500, deadline=None)
def test_bm25_units_fit_in_bigint_and_bound(idf_u, tf, a, dl):
    """The quantized-BM25 per-term unit stays inside BIGINT at any
    plausible scale and is bounded by 2.2x the idf (the k1+1 ceiling of
    the tf saturation), so per-doc sums cannot overflow for any real
    document width."""
    num = idf_u * 22 * tf * a
    den = 10 * a * tf + 3 * a + 9 * dl
    assert num < (1 << 63)
    units = num // den
    assert 0 <= units <= (idf_u * 22) // 10 + 1


@given(
    st.lists(st.integers(min_value=1, max_value=1000), min_size=2, max_size=40),
    st.integers(min_value=2, max_value=400),
)
@settings(max_examples=200, deadline=None)
def test_pagerank_update_conserves_bounded_mass(outdegs, n_rounds_seed):
    """The integer PageRank round never grows total mass beyond the pool:
    floor divisions only ever LOSE mass, so sum(r) <= MASS + n (the +n is
    the per-node teleport floor remainder), at every depth. Models one
    star round on a synthetic degree profile."""
    from frolyk_spark.operators.graph import PR_DAMP_PCT, PR_MASS

    n = len(outdegs)
    ranks = [PR_MASS // n] * n
    for _ in range(min(8, n_rounds_seed % 9 + 1)):
        shares = [r // d for r, d in zip(ranks, outdegs)]
        # worst case: every share lands on one node per edge
        inflow = [sum(shares)] + [0] * (n - 1)
        ranks = [
            (15 * PR_MASS) // (100 * n) + (PR_DAMP_PCT * i) // 100
            for i in inflow
        ]
        assert all(0 <= r <= PR_MASS + n for r in ranks)
        assert sum(ranks) <= PR_MASS + n


@given(st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=200),
       st.integers(min_value=0, max_value=1 << 40))
@settings(max_examples=200, deadline=None)
def test_packed_offsets_model_contiguity(tokens, base):
    """The two-phase prefix-sum model: bucketed partial sums stitched by
    bucket prefix offsets equal the flat cumulative sum for ANY bucket
    assignment — the invariant packed_offsets and the token feed's
    cross-batch continuity both stand on."""
    buckets = [t % 7 for t in tokens]  # arbitrary deterministic bucketing
    flat_for_bucket_order = sorted(range(len(tokens)), key=lambda i: (buckets[i], i))
    expect = base
    totals = {}
    for i in flat_for_bucket_order:
        b = buckets[i]
        totals.setdefault(b, 0)
    prefix, acc = {}, base
    for b in sorted(totals):
        prefix[b] = acc
        acc += sum(t for t, bb in zip(tokens, buckets) if bb == b)
    seen = {b: 0 for b in totals}
    for i in flat_for_bucket_order:
        b = buckets[i]
        start = prefix[b] + seen[b]
        assert start == expect
        seen[b] += tokens[i]
        expect += tokens[i]


@given(st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=300),
       st.integers(min_value=2, max_value=8))
@settings(max_examples=200, deadline=None)
def test_keyed_drop_mod_split_partitions(ids, parts):
    """stage_keyed_file_drop's content rule: the mod split is a partition
    of the id set (every row in exactly one file) and file k holds only
    keys congruent to k."""
    files = {k: [i for i in ids if i % parts == k] for k in range(parts)}
    assert sorted(x for f in files.values() for x in f) == sorted(ids)
    for k, f in files.items():
        assert all(i % parts == k for i in f)


@given(
    st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
             min_size=1, max_size=120),
    st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
             min_size=0, max_size=120),
)
@settings(max_examples=100, deadline=None)
def test_cms_upper_bound_and_mergeability(batch_a, batch_b):
    """The two claims D81/B31 stand on, checked on the pure-Python twin
    of the kernel: (1) the CMS estimate is an upper bound on the true
    count for every key; (2) cell-wise ADDITION of two batches' sketches
    equals the sketch of the concatenation (the B31 mergeable-state
    contract — bit-exact, not approximate)."""
    from collections import Counter

    from frolyk_spark.functions.hashing import portable_hash_py
    from frolyk_spark.operators.vocab import CMS_D, CMS_W

    def cells_of(words):
        cells = Counter()
        for w, c in Counter(words).items():
            for r in range(CMS_D):
                cells[(r, portable_hash_py(f"cms{r}:{w}") % CMS_W)] += c
        return cells

    ca, cb, cab = cells_of(batch_a), cells_of(batch_b), cells_of(batch_a + batch_b)
    assert ca + cb == cab  # mergeability: cells add, exactly

    truth = Counter(batch_a + batch_b)
    for w, true_c in truth.items():
        est = min(
            cab[(r, portable_hash_py(f"cms{r}:{w}") % CMS_W)]
            for r in range(CMS_D)
        )
        assert est >= true_c


@given(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=200, deadline=None)
def test_vocab_growth_bucket_in_range(mn, span_off, doc_off):
    """D82/B32's range-slice function maps every doc_id in the observed
    [mn, mx] span into bucket 0..VG_BUCKETS-1 — for ANY span and offset
    (no density or 0-base assumption, the r11 ADVICE rule)."""
    from frolyk_spark.operators.vocab import VG_BUCKETS

    mx = mn + span_off
    doc = mn + min(doc_off, span_off)
    b = ((doc - mn) * VG_BUCKETS) // (mx - mn + 1)
    assert 0 <= b < VG_BUCKETS


# --- B36: the contraction argument behind stream_components -------------------
# Per batch, stream_components min-label-propagates only over the CONTRACTED
# label graph (label(u), label(v)) and folds the merge map back through one
# label-keyed relabel. The claim that this ends at the true connected
# components REGARDLESS of how edges are split into batches is the operator's
# correctness core — exercised here as a pure-Python model against union-find
# over arbitrary random graphs and arbitrary batchings (the Spark job's
# basket-intact batching is one instance; the invariant needs none of it).


def _simulate_stream_components(edges, n_batches):
    """The exact per-batch algorithm stream_components runs, in Python."""
    labels: dict = {}
    batches = [edges[i::n_batches] for i in range(n_batches)]
    for batch in batches:
        if not batch:
            continue
        # contracted pairs under current labels (self-loops dropped)
        cpairs = set()
        for u, v in batch:
            la, lb = labels.get(u, u), labels.get(v, v)
            if la != lb:
                cpairs.add((la, lb))
        # min-label propagation to fixpoint on the contracted graph
        adj: dict = {}
        for a, b in cpairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        lab = {x: x for x in adj}
        changed = True
        while changed:
            changed = False
            new = {
                x: min([lab[x]] + [lab[y] for y in adj[x]]) for x in adj
            }
            if new != lab:
                lab, changed = new, True
        # relabel: base = prior state + first-seen endpoints (label=self),
        # every label mapped through the merge map
        for part in list(labels):
            labels[part] = lab.get(labels[part], labels[part])
        for u, v in batch:
            for x in (u, v):
                if x not in labels:
                    labels[x] = lab.get(x, x)
    return labels


def _union_find_min_labels(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical = component min; union-by-min preserves it at the root
    comp: dict = {}
    for x in parent:
        comp[x] = find(x)
    # roots may not be minimal after path compression alone — take true mins
    members: dict = {}
    for x, r in comp.items():
        members.setdefault(r, []).append(x)
    return {x: min(members[comp[x]]) for x in comp}


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=120,
    ),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=300, deadline=None)
def test_stream_components_contraction_equals_union_find(raw_edges, n_batches):
    edges = [(u, v) for u, v in raw_edges if u != v]
    if not edges:
        return
    got = _simulate_stream_components(edges, n_batches)
    want = _union_find_min_labels(edges)
    assert got == want


@given(
    st.lists(
        st.lists(st.integers(min_value=1, max_value=10**6),
                 min_size=1, max_size=8),
        min_size=2, max_size=25,
    ),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_pagerank_weighted_update_conserves_bounded_mass(node_weights, rounds):
    """C74's weighted round loses mass like C67's: with rate = r div W and
    per-edge flow w*rate, a node's total outflow is sum(w)*nothing-more
    than W*(r div W) <= r, so total inflow <= total rank and
    sum(r') <= MASS + n at every depth; the per-edge product w*rate stays
    far inside BIGINT for any rank bounded by the pool."""
    from frolyk_spark.operators.graph import PR_DAMP_PCT, PR_MASS

    n = len(node_weights)
    wdeg = [sum(ws) for ws in node_weights]
    ranks = [PR_MASS // n] * n
    for _ in range(rounds):
        rates = [r // w for r, w in zip(ranks, wdeg)]
        flows = [
            [w * rate for w in ws]
            for ws, rate in zip(node_weights, rates)
        ]
        for fs, r in zip(flows, ranks):
            for f in fs:
                assert 0 <= f < (1 << 63)
            assert sum(fs) <= r
        # worst case: all flow lands on one node
        inflow = [sum(sum(fs) for fs in flows)] + [0] * (n - 1)
        ranks = [
            (15 * PR_MASS) // (100 * n) + (PR_DAMP_PCT * i) // 100
            for i in inflow
        ]
        assert all(0 <= r <= PR_MASS + n for r in ranks)
        assert sum(ranks) <= PR_MASS + n
