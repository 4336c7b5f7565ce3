"""dedup_substring (D80): independent brute-force diagonal-scan reference
on a crafted corpus (planted spans: above / at / below the threshold,
repeated occurrences, periodic text), the hot-gram occurrence-cap guard,
span-hash verification, and the plan-shape audit. The Spark/DuckDB oracle
parity runs in test_correctness at sf0.001 and in the driver gate at
sf0.01; this file is the third implementation so a shared misreading of
the maximal-run semantics can't self-certify."""

from frolyk_spark.functions.hashing import portable_hash_py
from frolyk_spark.operators.dedup import (
    SUBSTR_MIN_TOKENS,
    dedup_substring,
    dedup_substring_frame,
)


def _brute_maximal_runs(docs: dict[int, list[str]], min_tokens: int):
    """All maximal cross-doc equal token runs >= min_tokens, by scanning
    every (pair, diagonal) — O(pairs * len^2), fine for a crafted corpus.
    Returns {(doc_a, doc_b, start_a, start_b, len)} with 1-based starts."""
    out = set()
    ids = sorted(docs)
    for i, da in enumerate(ids):
        for db in ids[i + 1:]:
            a, b = docs[da], docs[db]
            for off in range(-(len(b) - 1), len(a)):
                s0, s1 = max(0, off), min(len(a), len(b) + off)
                run = 0
                for s in range(s0, s1):
                    if a[s] == b[s - off]:
                        run += 1
                        continue
                    if run >= min_tokens:
                        out.add((da, db, s - run + 1, s - run - off + 1, run))
                    run = 0
                if run >= min_tokens:
                    out.add((da, db, s1 - run + 1, s1 - run - off + 1, run))
    return out


def _mk_docs(spark, docs: dict[int, list[str]]):
    return spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in sorted(docs.items())],
        "doc_id bigint, text string",
    )


def _crafted_corpus():
    filler = lambda d, n, k0=0: [f"d{d}w{k}" for k in range(k0, k0 + n)]
    big = [f"s{j}" for j in range(20)]        # 20-token planted span
    atmin = [f"m{j}" for j in range(12)]      # exactly the 12-token threshold
    below = [f"u{j}" for j in range(11)]      # one under: must NOT appear
    period = [f"p{j}" for j in range(4)] * 5  # 20 tokens of period 4
    docs = {
        1: filler(1, 5) + big + filler(1, 6, 50) + atmin + filler(1, 4, 90),
        2: filler(2, 9) + big + filler(2, 3, 50) + below + filler(2, 5, 90),
        3: filler(3, 7) + atmin + filler(3, 2, 50) + below + filler(3, 8, 90),
        4: filler(4, 3) + big + filler(4, 9, 50) + big + filler(4, 2, 90),
        5: filler(5, 6) + period + filler(5, 7, 50),
        6: filler(6, 11) + period + filler(6, 2, 50),
    }
    assert all(len(ws) >= 8 for ws in docs.values())
    return docs


def test_matches_bruteforce_on_crafted_corpus(spark):
    docs = _crafted_corpus()
    got = dedup_substring_frame(_mk_docs(spark, docs), min_tokens=12).collect()
    got_runs = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.len_tokens) for r in got
    }
    want = _brute_maximal_runs(docs, 12)
    assert got_runs == want and want
    # the planted shapes really exercised what they claim to
    assert any(r[4] == 20 for r in want)            # the big span
    assert any(r[4] == 12 for r in want)            # at-threshold span kept
    assert not any(r[4] == 11 for r in want)        # below-threshold absent
    assert len([r for r in want if r[:2] == (1, 4)]) == 2   # repeated span
    assert len({r[1:3] for r in want if r[0] == 5 and r[1] == 6}) >= 2  # diagonals
    # span_h really is the hash of the text sliced from doc_a
    for r in got:
        span = " ".join(docs[r.doc_a][r.start_a - 1 : r.start_a - 1 + r.len_tokens])
        assert r.span_h == portable_hash_py(span), (r, span)


def test_trim_matches_bruteforce_on_crafted_corpus(spark):
    """D84: keep-earliest span removal — covered positions derived from
    the brute-force maximal runs (doc_b side only), then the rebuild
    checked token-for-token. Keep-earliest invariants asserted
    explicitly: doc 1 (earliest holder of both planted spans) survives
    whole; later holders lose exactly their span positions."""
    from frolyk_spark.operators.dedup import dedup_substring_trim_frame

    docs = _crafted_corpus()
    runs = _brute_maximal_runs(docs, 12)
    covered = {i: set() for i in docs}
    for _da, db, _sa, sb, n in runs:
        covered[db].update(range(sb, sb + n))  # 1-based, doc_b side only
    want = {}
    for i, ws in docs.items():
        kept = [w for p, w in enumerate(ws, start=1) if p not in covered[i]]
        want[i] = (len(ws), len(kept), " ".join(kept))
    got = {
        r.doc_id: (r.n_tokens, r.kept_tokens, r.trimmed_text)
        for r in dedup_substring_trim_frame(
            _mk_docs(spark, docs), min_tokens=12
        ).collect()
    }
    assert got == want
    # doc 1 is the earliest holder of `big` and `atmin`: untouched
    assert got[1][1] == got[1][0]
    # doc 2 holds `big` later than doc 1: lost exactly those 20 tokens
    assert got[2][0] - got[2][1] == 20
    # doc 4 holds `big` twice, both later than doc 1: lost both copies
    assert got[4][0] - got[4][1] == 40


def test_occurrence_cap_excludes_hot_grams(spark):
    """A span whose grams exceed the occurrence cap must not chain — the
    star-routing guard that keeps boilerplate grams from fanning out to
    occ^2 pair rows at scale (mirrored in the oracle)."""
    boiler = [f"b{j}" for j in range(14)]
    docs = {
        i: [f"d{i}w{k}" for k in range(3)] + boiler + [f"d{i}x{k}" for k in range(3)]
        for i in range(1, 11)
    }
    frame = _mk_docs(spark, docs)
    # 10 docs share every boiler gram: occ=10 chains under cap=16 ...
    assert dedup_substring_frame(frame, min_tokens=12, occ_cap=16).count() == 45
    # ... and is excluded when the cap drops below the occurrence count
    assert dedup_substring_frame(frame, min_tokens=12, occ_cap=9).count() == 0


def test_default_threshold_and_sf_data(spark, sf_dir):
    """At the shipped defaults the testdata's planted duplicates surface
    (BASELINE probes found >=12 runs >=50 tokens at every SF) and every
    reported run respects the threshold."""
    rows = dedup_substring(spark, sf_dir).collect()
    assert rows
    assert all(r.len_tokens >= SUBSTR_MIN_TOKENS for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)


def test_plan_shape(spark, sf_dir):
    from frolyk_spark.plans.inspect import assert_scale_shape, plan_report

    df = dedup_substring(spark, sf_dir)
    assert_scale_shape(df, forbid_cartesian=True)
    # candidate generation must be the gram-hash equi-join, never a
    # nested-loop pairing
    rep = plan_report(df)
    assert "CartesianProduct" not in rep["plan"]
    assert "BroadcastNestedLoopJoin" not in rep["plan"]
