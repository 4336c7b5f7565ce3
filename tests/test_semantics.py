"""Semantic checks for the exact-sufficient-statistics operators (C42-C45,
D37): the DuckDB oracles prove Spark and DuckDB agree, but both could
agree on the wrong formula — these recompute each statistic naively
(numpy/pandas over collected sf0.001 rows) and compare.
"""

import math

import numpy as np


def test_price_discount_corr_is_pearson(spark, sf_dir):
    from frolyk_spark.operators.relational import price_discount_corr
    from frolyk_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount"
    )
    rows = li.collect()
    by_flag: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        x = int(r.l_quantity)
        y = int(math.floor(r.l_discount * 100.0 + 0.5))
        by_flag.setdefault(r.l_returnflag, []).append((x, y))
    got = {r.l_returnflag: r.corr_qty_discount for r in price_discount_corr(spark, sf_dir).collect()}
    for flag, pairs in by_flag.items():
        xs = np.array([p[0] for p in pairs], dtype=np.float64)
        ys = np.array([p[1] for p in pairs], dtype=np.float64)
        expect = np.corrcoef(xs, ys)[0, 1]
        assert abs(got[flag] - expect) < 1e-6, (flag, got[flag], expect)


def test_anomaly_zscore_matches_naive(spark, sf_dir):
    from frolyk_spark.operators.relational import anomaly_zscore
    from frolyk_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type: dict[str, list[int]] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(int(math.floor(r.value * 100.0 + 0.5)))
    got = {r.event_type: r for r in anomaly_zscore(spark, sf_dir).collect()}
    for t, xs in by_type.items():
        a = np.array(xs, dtype=np.float64)
        mu, sigma = a.mean(), a.std()  # population std, like the operator
        n_out = int((np.abs(a - mu) > 3 * sigma).sum())
        assert got[t].n_events == len(xs)
        assert got[t].n_outliers == n_out, (t, got[t].n_outliers, n_out)
        assert abs(got[t].mean_value - round(mu / 100.0, 4)) < 1e-9
        assert abs(got[t].std_value - round(sigma / 100.0, 4)) < 1e-9


def test_order_value_quartiles_match_numpy(spark, sf_dir):
    from frolyk_spark.operators.relational import order_value_quartiles
    from frolyk_spark.sources.catalog import load_table

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    by_p: dict[str, list[float]] = {}
    for r in rows:
        by_p.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    got = {r.o_orderpriority: r for r in order_value_quartiles(spark, sf_dir).collect()}
    for p, vals in by_p.items():
        a = np.array(sorted(vals))
        for col, q in (("p25", 25), ("p50", 50), ("p75", 75)):
            expect = float(np.percentile(a, q, method="linear"))
            assert abs(got[p][col] - round(expect, 4)) < 1e-6, (p, col)


def test_conversion_funnel_matches_naive(spark, sf_dir):
    from frolyk_spark.operators.relational import (
        FUNNEL_WINDOW_HOURS,
        conversion_funnel,
    )
    from frolyk_spark.sources.catalog import load_table

    import datetime

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type").collect()
    win = datetime.timedelta(hours=FUNNEL_WINDOW_HOURS)
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    n_v = n_c = n_p = 0
    for evs in by_user.values():
        t1 = min((t for t, e in evs if e == "view"), default=None)
        if t1 is None:
            continue
        n_v += 1
        t2 = min((t for t, e in evs if e == "click" and t1 < t <= t1 + win), default=None)
        if t2 is None:
            continue
        n_c += 1
        if any(e == "purchase" and t2 < t <= t2 + win for t, e in evs):
            n_p += 1
    got = conversion_funnel(spark, sf_dir).collect()[0]
    assert (got.n_users, got.n_viewed, got.n_clicked_after_view, got.n_purchased_after_click) == (
        len(by_user), n_v, n_c, n_p,
    )


def test_embedding_quantize_roundtrip(spark, sf_dir):
    """Dequantized codes reconstruct each component within scale/2, codes
    stay in int8 range, and zero vectors take scale 1.0 with all-zero
    codes."""
    from pyspark.sql import functions as F

    from frolyk_spark.operators.similarity import embedding_quantize_frame
    from frolyk_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = embedding_quantize_frame(emb).join(emb, "vec_id")
    rows = q.select("vec_id", "scale", "codes", "embedding").collect()
    assert rows
    for r in rows:
        assert all(-127 <= c <= 127 for c in r.codes), r.vec_id
        # scale is rounded to 6 decimals for output; allow that slack
        for c, x in zip(r.codes, r.embedding):
            assert abs(c * r.scale - x) <= r.scale / 2 + 1e-4, r.vec_id


def test_funnel_forms_agree_on_null_user(spark, sf_dir):
    """A NULL user_id must not break the array fold, and both funnel
    forms must agree: the null group counts in n_users but reaches no
    stage (equi-joins never match a null key)."""
    import datetime

    from frolyk_spark.operators import relational

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, "view"),
        (1, base + datetime.timedelta(minutes=5), "click"),
        (1, base + datetime.timedelta(minutes=10), "purchase"),
        (None, base, "view"),
        (None, base + datetime.timedelta(minutes=5), "click"),
        (None, base + datetime.timedelta(minutes=10), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")
    orig = relational.load_table
    relational.load_table = lambda s, d, n: df if n == "events" else orig(s, d, n)
    try:
        a = tuple(relational.conversion_funnel(spark, "unused").collect()[0])
        b = tuple(relational.funnel_fold(spark, "unused").collect()[0])
    finally:
        relational.load_table = orig
    assert a == b == (2, 1, 1, 1)


def test_portable_round_boundary(spark, duck):
    """The portable floor(x·10⁴+0.5)/10⁴ round agrees across engines on
    the boundary double that builtin round() diverges on (Spark rounds
    the shortest decimal repr 0.59825 up; DuckDB rounds the numeric
    double 0.59824999… down) — the text_stats sf0.1 sweep finding."""
    from pyspark.sql import functions as F

    from frolyk_spark.operators.text import _round4

    v = 0.59825
    s = spark.range(1).select(_round4(F.lit(v)).alias("r")).collect()[0].r
    d = duck.sql(
        f"SELECT floor(CAST({v!r} AS DOUBLE) * 10000.0 + 0.5) / 10000.0"
    ).fetchone()[0]
    assert s == d == 0.5982

    sr = spark.range(1).select(F.round(F.lit(v), 4).alias("r")).collect()[0].r
    dr = duck.sql(f"SELECT round(CAST({v!r} AS DOUBLE), 4)").fetchone()[0]
    assert (sr, dr) == (0.5983, 0.5982), "engines agree now? revisit _round4"


def test_portable_round_randomized_cross_engine(spark, duck):
    """_round4 must agree between engines on arbitrary doubles, including
    manufactured .xxxx5 boundaries — batch-checked (one Spark job, one
    DuckDB scan over the same 400 values).

    The DuckDB side reads STORED doubles (registered frame — the same
    path every real oracle takes from parquet). Feeding the values as
    SQL literals instead would false-fail: DuckDB's constant folder
    evaluates literal arithmetic through a non-IEEE path (0.38785…003 *
    10000.0 folds to 3878.4999999999995, one ulp below the correctly
    rounded product its execution engine produces for the same stored
    double) — a folding artifact, unreachable by data-driven queries."""
    import random

    import pandas as pd

    from pyspark.sql import functions as F

    from frolyk_spark.operators.text import _round4

    rng = random.Random(42)
    vals = [rng.random() for _ in range(200)]
    # exact-boundary shapes: k/2·10⁻⁴ puts the true value ON the half
    vals += [rng.randrange(0, 20000) / 2 * 1e-4 for _ in range(200)]

    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double")
    got_s = {r.i: r.r for r in sdf.select("i", _round4(F.col("v")).alias("r")).collect()}
    duck.register("_r4vals", pd.DataFrame({"i": range(len(vals)), "v": vals}))
    got_d = dict(
        duck.sql("SELECT i, floor(v * 10000.0 + 0.5) / 10000.0 FROM _r4vals").fetchall()
    )
    duck.unregister("_r4vals")
    for i in range(len(vals)):
        assert got_s[i] == got_d[i], (i, vals[i], got_s[i], got_d[i])


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """D47: the distributed BPE loop must produce the exact merge table a
    pure-Python implementation of the same algorithm produces (count
    DESC / pair ASC tie-break, greedy left-to-right re-segmentation)."""
    from collections import Counter

    import duckdb

    from frolyk_spark.operators.vocab import BPE_MERGES, bpe_train

    got = [
        (r.step, r.left, r.right, r.merged, r.cnt)
        for r in bpe_train(spark, sf_dir).orderBy("step").collect()
    ]

    texts = [
        t for (t,) in duckdb.sql(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    ]
    words = [list(w) for t in texts for w in t.split(" ") if w]
    expected = []
    for step in range(1, BPE_MERGES + 1):
        counts = Counter()
        for toks in words:
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += 1
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((step, a, b, a + b, cnt))
        for toks in words:
            out = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            toks[:] = out
    assert got == expected


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    """D52: the distributed corpus encoding must match, per document, a
    pure-Python train+encode of the same algorithm — piece counts AND the
    portable hash of the exact piece sequence."""
    import hashlib
    from collections import Counter

    import duckdb

    from frolyk_spark.operators.vocab import BPE_MERGES, bpe_encode

    got = {
        r.doc_id: (r.n_words, r.n_pieces, r.enc_hash)
        for r in bpe_encode(spark, sf_dir).collect()
    }

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    per_doc = {
        doc_id: [list(w) for w in text.split(" ") if w] for doc_id, text in rows
    }
    all_words = [toks for ws in per_doc.values() for toks in ws]
    for _ in range(BPE_MERGES):
        counts = Counter()
        for toks in all_words:
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += 1
        if not counts:
            break
        (a, b), _cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for toks in all_words:
            out = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            toks[:] = out

    assert set(got) == set(per_doc)
    for doc_id, ws in per_doc.items():
        enc = " ".join("|".join(toks) for toks in ws)
        h = int(hashlib.md5(enc.encode()).hexdigest()[:15], 16)
        exp = (len(ws), sum(len(t) for t in ws), h)
        assert got[doc_id] == exp, (doc_id, got[doc_id], exp)


def test_containment_chain_closure_multi_hop(spark):
    """D57: the recursive closure must surface transitively-implied pairs
    with their MIN hop count — including pairs with both a direct edge
    and a longer route (min wins), and 3-hop chains."""
    from frolyk_spark.operators.dedup import _chain_closure

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3), (10, 20)],
        "doc_a bigint, doc_b bigint",
    )
    got = {(r.doc_a, r.doc_b): r.min_depth for r in _chain_closure(spark, edges).collect()}
    assert got == {
        (1, 2): 1,
        (2, 3): 1,
        (3, 4): 1,
        (1, 3): 1,   # direct edge beats the 2-hop route
        (2, 4): 2,
        (1, 4): 2,   # via the 1->3 shortcut, not the 3-hop path
        (10, 20): 1,
    }


def test_sweep_peak_matches_bruteforce_reference(spark):
    """C53: the sweep-line peak must equal a brute-force per-day count on
    randomized interval sets (one key per generated case — a single Spark
    job checks 40 cases, including same-day intervals, full overlaps,
    touching endpoints, and singleton keys)."""
    import datetime
    import random

    from frolyk_spark.operators.temporal import sweep_peak_frame

    rng = random.Random(1234)
    base = datetime.date(2024, 1, 1)
    cases = {}
    rows = []
    for key in range(40):
        n = rng.randint(1, 12)
        ivs = []
        for _ in range(n):
            s = rng.randint(0, 30)
            e = s + rng.randint(0, 10)
            ivs.append((s, e))
            rows.append(
                (key, base + datetime.timedelta(s), base + datetime.timedelta(e))
            )
        cases[key] = ivs

    df = spark.createDataFrame(rows, "key bigint, start_d date, end_d date")
    got = {r.key: r for r in sweep_peak_frame(df).collect()}

    for key, ivs in cases.items():
        counts = {}
        for s, e in ivs:
            for d in range(s, e + 1):
                counts[d] = counts.get(d, 0) + 1
        peak = max(counts.values())
        peak_day = min(d for d, c in counts.items() if c == peak)
        r = got[key]
        assert r.n_intervals == len(ivs), key
        assert r.peak_open == peak, (key, r.peak_open, peak)
        assert r.peak_date == str(base + datetime.timedelta(peak_day)), key


def test_dup_span_coverage_matches_bruteforce_reference(spark, tmp_path):
    """D50: on a crafted corpus (known shared 8-grams, overlapping dup
    spans, exact dups, short docs), the interval-union coverage must
    equal a brute-force position-marking reference."""
    import duckdb as _duck

    from frolyk_spark.operators.pipeline import SPAN_W, dup_span_coverage

    texts = {
        0: "a b c d e f g h i j k l m n o p",        # shares prefix gram with 1
        1: "a b c d e f g h X Y Z Q R S T U",
        2: "m m m m m m m m m m m m m m m m",        # self-repeats only (df=1)
        3: "a b c d e f g h i j k l m n o p",        # exact dup of 0
        4: "short doc",                               # < SPAN_W tokens
        5: "short doc",                               # whole-text fallback dup of 4
        6: "Z Z a b c d e f g h i j Z Z Z Z",        # interior shared span
    }
    pdf = _duck.sql(
        "SELECT * FROM (VALUES "
        + ", ".join(f"({k}, '{v}')" for k, v in texts.items())
        + ") t(doc_id, text)"
    ).df()
    sf = str(tmp_path / "sfx")
    import os

    os.makedirs(sf, exist_ok=True)
    _duck.sql("SELECT doc_id, text FROM pdf").write_parquet(os.path.join(sf, "documents.parquet"))

    # brute-force reference: mark every position covered by a gram that
    # appears (as a distinct gram) in >= 2 docs; short docs fall back to
    # one whole-text gram at pos 1 (the operator's documented rule)
    def grams(words):
        if len(words) < SPAN_W:
            return [(1, " ".join(words))]
        return [
            (i + 1, " ".join(words[i : i + SPAN_W]))
            for i in range(len(words) - SPAN_W + 1)
        ]

    docs_of = {}
    for k, t in texts.items():
        for _, g in set(grams(t.split(" "))):
            docs_of.setdefault(g, set()).add(k)
    expected = {}
    for k, t in texts.items():
        ws = t.split(" ")
        covered = set()
        for pos, g in grams(ws):
            if len(docs_of[g]) >= 2:
                covered.update(range(pos, min(pos + SPAN_W - 1, len(ws)) + 1))
        expected[k] = (len(ws), len(covered))

    got = {r.doc_id: (r.n_tokens, r.covered_tokens) for r in dup_span_coverage(spark, sf).collect()}
    assert got == expected, (got, expected)

    # D59 on the same crafted corpus: the trimmed text must be exactly the
    # uncovered tokens in order (brute-force reference), and the trim must
    # be CONSISTENT with D50: kept_tokens == n_tokens - covered_tokens
    from frolyk_spark.operators.pipeline import span_trim

    trim_expected = {}
    for k, t in texts.items():
        ws = t.split(" ")
        covered = set()
        for pos, g in grams(ws):
            if len(docs_of[g]) >= 2:
                covered.update(range(pos, min(pos + SPAN_W - 1, len(ws)) + 1))
        kept = [w for i, w in enumerate(ws, start=1) if i not in covered]
        trim_expected[k] = (len(ws), len(kept), " ".join(kept))

    trim_got = {
        r.doc_id: (r.n_tokens, r.kept_tokens, r.trimmed_text)
        for r in span_trim(spark, sf).collect()
    }
    assert trim_got == trim_expected, (trim_got, trim_expected)
    for k in texts:
        assert trim_got[k][1] == got[k][0] - expected[k][1]


def test_chain_closure_polynomial_on_adversarial_shapes(spark):
    """D57 (r6 ADVICE): the BFS closure must stay polynomial on the shapes
    that broke the old path-enumerating recursion — a dense clique (old
    guard's target), a 14-mirror star (old guard's false positive), and a
    chained-diamond DAG whose PATH count doubles per stage while vertex
    degree stays at 2 (old guard's false negative)."""
    from frolyk_spark.operators.dedup import _chain_closure

    # 14-clique oriented a<b: every pair has a direct edge -> depth 1
    k = 14
    clique = spark.createDataFrame(
        [(a, b) for a in range(k) for b in range(a + 1, k)],
        "doc_a bigint, doc_b bigint",
    )
    got = {(r.doc_a, r.doc_b): r.min_depth for r in _chain_closure(spark, clique).collect()}
    assert got == {(a, b): 1 for a in range(k) for b in range(a + 1, k)}

    # star: one short doc mirrored 14 times — linear, must NOT be rejected
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 15)], "doc_a bigint, doc_b bigint"
    )
    got = {(r.doc_a, r.doc_b): r.min_depth for r in _chain_closure(spark, star).collect()}
    assert got == {(0, i): 1 for i in range(1, 15)}

    # 20 chained diamonds: 2^20 distinct PATHS end-to-end, but only
    # O(stages^2) distinct pairs — completes fast, min-depth = 2 hops/stage
    edges, stages = [], 20
    for s in range(stages):
        a, b1, b2, c = 3 * s, 3 * s + 1, 3 * s + 2, 3 * (s + 1)
        edges += [(a, b1), (a, b2), (b1, c), (b2, c)]
    diamonds = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {(r.doc_a, r.doc_b): r.min_depth for r in _chain_closure(spark, diamonds).collect()}
    # spine distances: hub 0 to hub 3*s is 2*s hops; 0 to last mid-vertex
    assert got[(0, 3 * stages)] == 2 * stages
    assert got[(0, 3 * (stages - 1) + 1)] == 2 * (stages - 1) + 1
    assert got[(0, 3)] == 2 and got[(0, 1)] == 1


def test_scd2_frame_matches_bruteforce_reference(spark):
    """C52: the windowed SCD2 build must equal a brute-force run-collapse
    on randomized event streams (30 users, repeated types, simultaneous
    timestamps broken by event_id — the tie the windows must respect)."""
    import datetime
    import random

    from frolyk_spark.operators.temporal import scd2_frame

    rng = random.Random(99)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    streams = {}
    for user in range(30):
        n = rng.randint(1, 15)
        evs = []
        t = 0
        for _ in range(n):
            # occasional equal timestamps force the event_id tie-break
            t += rng.choice([0, 1, 1, 5])
            evs.append((eid, t, rng.choice("abc")))
            eid += 1
        streams[user] = evs
        for e, t, ty in evs:
            rows.append((user, e, base + datetime.timedelta(seconds=t), ty))

    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    got = {
        (r.user_id, r.version): (r.event_type, r.valid_from_us, r.valid_to_us, r.is_current)
        for r in scd2_frame(df).collect()
    }

    def us(t):
        return int((base + datetime.timedelta(seconds=t)).timestamp() * 1_000_000)

    expected = {}
    for user, evs in streams.items():
        ordered = sorted(evs, key=lambda e: (e[1], e[0]))
        runs = []
        for e, t, ty in ordered:
            if not runs or runs[-1][0] != ty:
                runs.append((ty, t))
        for v, (ty, t) in enumerate(runs, start=1):
            nxt = us(runs[v][1]) if v < len(runs) else None
            expected[(user, v)] = (ty, us(t), nxt, nxt is None)
    assert got == expected


def test_scd2_lookup_matches_bruteforce_reference(spark):
    """C63: the union-window point-in-time lookup must equal the naive
    per-purchase scan for the prevailing run at ts−1 µs, on randomized
    streams with simultaneous timestamps (event_id tie-break) and
    purchases that open their user's very first run (which must DROP —
    no prevailing state strictly before them)."""
    import datetime
    import random

    from frolyk_spark.operators.temporal import scd2_lookup_frame

    rng = random.Random(4242)
    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    streams = {}
    for user in range(25):
        n = rng.randint(1, 14)
        evs = []
        t = 0
        for _ in range(n):
            t += rng.choice([0, 1, 1, 7])
            evs.append((eid, t, rng.choice(["purchase", "view", "click"])))
            eid += 1
        streams[user] = evs
        for e, t, ty in evs:
            rows.append((user, e, base + datetime.timedelta(seconds=t), ty))

    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    got = {
        r.event_id: (r.user_id, r.prev_version, r.prev_state)
        for r in scd2_lookup_frame(df).collect()
    }

    expected = {}
    for user, evs in streams.items():
        ordered = sorted(evs, key=lambda e: (e[1], e[0]))
        # runs: (type, start_t, start_idx) collapsing consecutive repeats
        runs = []
        for i, (e, t, ty) in enumerate(ordered):
            if not runs or runs[-1][0] != ty:
                runs.append((ty, t, i))
        for e, t, ty in ordered:
            if ty != "purchase":
                continue
            # prevailing run at time t - 1µs: the last run whose start
            # time is STRICTLY before t (same-second run starts are not
            # yet valid at t-1µs, sub-second resolution in this data)
            prev = [
                (v, r) for v, r in enumerate(runs, start=1) if r[1] < t
            ]
            if prev:
                v, r = prev[-1]
                expected[e] = (user, v, r[0])
    assert got == expected


def test_line_dedup_matches_bruteforce_reference(spark, tmp_path):
    """D66: on a crafted corpus (cross-doc duplicate segments, within-doc
    repeats, exact whole-doc dup, short docs, ragged tail segments) the
    keep-first line dedup must equal a brute-force first-seen reference."""
    import os

    import duckdb as _duck

    from frolyk_spark.operators.pipeline import LINE_W, line_dedup

    A = "a1 a2 a3 a4 a5 a6 a7 a8"
    B = "b1 b2 b3 b4 b5 b6 b7 b8"
    U = "u1 u2 u3 u4 u5 u6 u7 u8"
    texts = {
        0: f"{A} {B}",            # two full segments
        1: f"{A} {U}",            # seg A is doc 0's: dropped here
        2: f"{B} {B}",            # within-doc repeat: 2nd dropped (B is doc 0's too)
        3: f"{A} {B}",            # exact dup of doc 0: empty survivor
        4: "tiny doc",            # short: one ragged segment
        5: "tiny doc",            # dup of 4: empty survivor
        6: f"{U} tail1 tail2",    # U already doc 1's; ragged 2-word tail survives
    }
    pdf = _duck.sql(
        "SELECT * FROM (VALUES "
        + ", ".join(f"({k}, '{v}')" for k, v in texts.items())
        + ") t(doc_id, text)"
    ).df()
    sf = str(tmp_path / "sfx")
    os.makedirs(sf, exist_ok=True)
    _duck.sql("SELECT doc_id, text FROM pdf").write_parquet(
        os.path.join(sf, "documents.parquet")
    )

    def segments(words):
        return [
            " ".join(words[i : i + LINE_W]) for i in range(0, len(words), LINE_W)
        ]

    seen: set = set()
    expected = {}
    for k in sorted(texts):  # global first-seen order = (doc_id, seg_idx)
        segs = segments(texts[k].split(" "))
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        expected[k] = (len(segs), len(kept), " ".join(kept))

    got = {
        r.doc_id: (r.n_segs, r.n_kept, r.deduped_text)
        for r in line_dedup(spark, sf).collect()
    }
    assert got == expected, (got, expected)
    # the crafted corpus must actually exercise every path
    assert got[3] == (2, 0, "")
    assert got[2][1] == 0 and got[6][1] == 1


def test_mv_state_survives_streaming_reclaim_and_is_reused(spark, sf_dir):
    """C64 regression (r8 review finding): the MV state must live outside
    the streaming janitor's pid-scoped results root — a streaming op in
    the same process must not reclaim it out from under the lazily-read
    returned frame — and a second call must REUSE the persisted state
    (the refresh path), not rebuild it."""
    import os

    from frolyk_spark.operators.relational import mv_incremental_refresh
    from frolyk_spark.streaming.jobs import stream_tumbling

    from frolyk_spark.sources.streams import SCRATCH

    mv_root = os.path.join(SCRATCH, "mv_state")
    first = mv_incremental_refresh(spark, sf_dir)
    rows1 = first.collect()
    state_dirs = lambda: set(os.listdir(mv_root))  # noqa: E731
    built = state_dirs()
    assert built, "first call must persist the MV state"
    mtime = {
        d: os.path.getmtime(os.path.join(mv_root, d)) for d in built
    }
    # a streaming op triggers the pid-root reclaim loop
    stream_tumbling(spark, sf_dir).collect()
    # the earlier frame still reads (state not reclaimed)
    assert first.collect() == rows1
    # second call reuses the state: same dirs, untouched mtimes
    second = mv_incremental_refresh(spark, sf_dir).collect()
    assert second == rows1
    assert state_dirs() == built
    assert all(
        os.path.getmtime(os.path.join(mv_root, d)) == mtime[d] for d in built
    )


def test_epoch_shuffle_epochs_genuinely_reorder(spark, sf_dir):
    """D67: the point of the per-epoch key is that epoch 0 and epoch 1
    see different document orders — if the epoch weren't folded into the
    hash, every epoch would replay the same order (the classic
    shuffle-once training bug). Also pins per-epoch completeness: every
    doc appears exactly once per epoch, and positions are a dense 1..n
    sequence within each shard."""
    from collections import Counter

    from frolyk_spark.operators.sampling import N_EPOCHS, epoch_shuffle

    rows = epoch_shuffle(spark, sf_dir).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, {})[r.doc_id] = (r.shard, r.pos)
    assert set(by_epoch) == set(range(N_EPOCHS))
    docs = set(by_epoch[0])
    assert all(set(m) == docs for m in by_epoch.values())
    # dense positions per (epoch, shard)
    for ep, m in by_epoch.items():
        per_shard = Counter(sh for sh, _ in m.values())
        for sh, n in per_shard.items():
            got = sorted(p for s, p in m.values() if s == sh)
            assert got == list(range(1, n + 1))
    # epochs must disagree for the vast majority of docs (hash-random
    # placement: P[same (shard,pos)] is tiny; require <10% agreement)
    same = sum(1 for d in docs if by_epoch[0][d] == by_epoch[1][d])
    assert same < 0.1 * len(docs), f"{same}/{len(docs)} unchanged"


def test_persisted_bpe_model_keyed_by_depth(spark, sf_dir, monkeypatch):
    """The persisted BPE model (r11 train-once split) must key its scratch
    cache on (source path, depth): changing BPE_MERGES retrains instead
    of silently reusing the other depth's model, and repeated calls at
    one depth return the identical merge table (the reuse path)."""
    import frolyk_spark.operators.vocab as V

    full = V.persisted_bpe_merges(spark, sf_dir)
    assert len(full) == V.BPE_MERGES
    monkeypatch.setattr(V, "BPE_MERGES", 2)
    short = V.persisted_bpe_merges(spark, sf_dir)
    assert len(short) == 2
    # greedy BPE is prefix-stable: the first merges agree across depths
    assert short == full[:2]
    assert V.persisted_bpe_merges(spark, sf_dir) == short  # cache hit


def test_bigram_lm_score_covers_heldout_and_fires_backoff(spark, sf_dir):
    """D79: exactly the held-out docs are scored, pair counts match the
    documents' bigram counts, and the backoff path genuinely fires on
    this corpus (otherwise the CASE branch is dead code the oracle
    can't distinguish)."""
    from frolyk_spark.operators.sampling import train_test_split
    from frolyk_spark.operators.text import bigram_lm_score
    from frolyk_spark.sources.catalog import load_table

    rows = {r.doc_id: r for r in bigram_lm_score(spark, sf_dir).collect()}
    held = {
        r.doc_id
        for r in train_test_split(spark, sf_dir).collect()
        if r.split != "train"
    }
    assert set(rows) == held
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
        if r.doc_id in held
    }
    for doc_id, r in rows.items():
        assert r.n_pairs == len(docs[doc_id].split(" ")) - 1
        assert 0 <= r.n_backoff <= r.n_pairs
        assert r.neg_logprob_mu > 0
    assert sum(r.n_backoff for r in rows.values()) > 0


def test_heavy_hitters_cms_upper_bound_and_saturation(spark, sf_dir):
    """D81: the CMS estimate is a provable UPPER bound on the true count
    (min over cells each summing a superset), the reported overcount is
    exactly their gap, and on this corpus the sketch genuinely saturates
    (some bigram collides in all CMS_D rows — otherwise the overcount
    column is dead and the entry degenerates to exact counts)."""
    from frolyk_spark.operators.vocab import CMS_K, heavy_hitters_cms

    rows = heavy_hitters_cms(spark, sf_dir).collect()
    assert 0 < len(rows) <= CMS_K
    for r in rows:
        assert r.est_count >= r.true_count > 0
        assert r.overcount == r.est_count - r.true_count
    assert any(r.overcount > 0 for r in rows)


def test_vocab_growth_conserves_totals(spark, sf_dir):
    """D82: the curve's last point equals the corpus totals (every token
    counted once, every distinct word first-seen exactly once), buckets
    partition the docs, and both cumulative columns are monotone."""
    import duckdb

    from frolyk_spark.operators.vocab import VG_BUCKETS, vocab_growth

    rows = sorted(vocab_growth(spark, sf_dir).collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(VG_BUCKETS))
    toks, vocab, docs = duckdb.sql(
        f"""SELECT (SELECT sum(len(string_split(text, ' ')))
                    FROM '{sf_dir}/documents.parquet'),
                   (SELECT count(DISTINCT w)
                    FROM (SELECT unnest(string_split(text, ' ')) AS w
                          FROM '{sf_dir}/documents.parquet')),
                   (SELECT count(DISTINCT doc_id)
                    FROM '{sf_dir}/documents.parquet')"""
    ).fetchone()
    assert rows[-1].cum_tokens == toks
    assert rows[-1].cum_vocab == vocab
    assert sum(r.n_docs_b for r in rows) == docs
    for a, b in zip(rows, rows[1:]):
        assert b.cum_tokens >= a.cum_tokens and b.cum_vocab >= a.cum_vocab


def test_tokenizer_fertility_bounds(spark, sf_dir):
    """D83: every source is present, fertility >= 1 (a word is at least
    one piece) and pieces >= words per source; the metric actually varies
    or exceeds 1 somewhere (depth-24 BPE on this corpus fragments words,
    so a flat 1.0 column would mean the model table did not join)."""
    from frolyk_spark.operators.vocab import tokenizer_fertility
    from frolyk_spark.sources.catalog import load_table

    rows = tokenizer_fertility(spark, sf_dir).collect()
    sources = {
        r.source
        for r in load_table(spark, sf_dir, "documents").select("source").distinct().collect()
    }
    assert {r.source for r in rows} == sources
    for r in rows:
        assert r.n_pieces >= r.n_words > 0
        assert r.fertility_4dp >= 1.0
    assert any(r.fertility_4dp > 1.0 for r in rows)


def test_quantile_sketch_error_bounded_by_bin_width(spark, sf_dir):
    """C73: the histogram inverse-CDF estimate must lower-bound the true
    order statistic with error strictly under one bin width, and the
    target ranks must be the ceil(d*n/10) ladder."""
    from frolyk_spark.operators.relational import QSKETCH_BINS, _t, quantile_sketch

    rows = sorted(
        (r.decile, r.target_rank, r.est_cents, r.exact_cents, r.err_cents)
        for r in quantile_sketch(spark, sf_dir).collect()
    )
    assert [r[0] for r in rows] == list(range(1, 10))
    o = _t(spark, sf_dir, "orders")
    n = o.count()
    import pyspark.sql.functions as F

    stats = o.agg(
        F.min(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("lo"),
        F.max(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("hi"),
    ).collect()[0]
    bin_width = (stats.hi - stats.lo + 1) // QSKETCH_BINS + 1
    for d, r, est, exact, err in rows:
        assert r == (d * n + 9) // 10
        assert err == exact - est
        assert 0 <= err <= bin_width, (d, err, bin_width)
    # monotone: later deciles never report smaller exact values
    exacts = [r[3] for r in rows]
    assert exacts == sorted(exacts)


def test_filter_funnel_monotone_and_matches_corpus_filter(spark, sf_dir):
    """D87: stage counts are monotone non-increasing, and the last stage
    sums to exactly corpus_filter's survivor count (same rules evaluated
    as flags instead of filters)."""
    from frolyk_spark.operators.text import corpus_filter, filter_funnel

    rows = filter_funnel(spark, sf_dir).collect()
    assert rows and len(rows) >= 2  # multiple sources
    for r in rows:
        assert r.n_raw >= r.after_dedup >= r.after_lang >= r.after_quality >= 0
    assert sum(r.after_quality for r in rows) == corpus_filter(spark, sf_dir).count()
    # the funnel is non-degenerate: the gates drop documents overall
    # (sf0.001 has no exact duplicates, so the dedup stage alone may be
    # a no-op there — assert on the gate stages and the total instead)
    assert any(r.after_dedup > r.after_lang for r in rows)
    assert any(r.after_lang > r.after_quality for r in rows)
    assert sum(r.n_raw for r in rows) > sum(r.after_quality for r in rows)
