"""bm25_topk (D74): independent pure-Python integer reference + plan
audit. The Spark/DuckDB oracle parity runs in test_correctness; this
checks the quantized-BM25 MATH against a third implementation so a
shared misreading of the spec can't self-certify, and pins the
broadcast candidate-generation plan."""

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from frolyk_spark.operators.retrieval import (
    BM25_TOP_K,
    DF_PRUNE_DENOM,
    IDF_SCALE,
    N_QUERIES,
    bm25_topk,
)


def _python_reference(sf_dir: str):
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    postings = {}
    for doc_id, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        ws = text.split(" ")
        postings[doc_id] = Counter(
            f"{a} {b}" for a, b in zip(ws, ws[1:])
        )
    n = len(postings)
    dl = {d: sum(c.values()) for d, c in postings.items()}
    a = sum(dl.values()) // n
    df = Counter()
    for c in postings.values():
        df.update(c.keys())
    out = []
    for q in sorted(postings):
        if q >= N_QUERIES:
            continue
        scores, terms = defaultdict(int), defaultdict(int)
        for w in postings[q]:
            if df[w] * DF_PRUNE_DENOM > n:
                continue
            idf_u = math.floor(
                IDF_SCALE * math.log((n - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
            )
            for d, cnt in postings.items():
                if d == q or w not in cnt:
                    continue
                tf = cnt[w]
                scores[d] += (idf_u * 22 * tf * a) // (
                    10 * a * tf + 3 * a + 9 * dl[d]
                )
                terms[d] += 1
        ranked = sorted(scores, key=lambda d: (-scores[d], d))[:BM25_TOP_K]
        out.extend(
            (q, i + 1, d, terms[d], scores[d]) for i, d in enumerate(ranked)
        )
    return sorted(out)


def test_bm25_matches_python_reference(spark, sf_dir):
    got = sorted(tuple(r) for r in bm25_topk(spark, sf_dir).collect())
    assert got == _python_reference(sf_dir)


def test_bm25_plan_shape(spark, sf_dir):
    from frolyk_spark.plans.inspect import assert_scale_shape, plan_report

    df = bm25_topk(spark, sf_dir)
    assert_scale_shape(df, forbid_cartesian=True)
    # candidate generation must be a broadcast join on the bounded
    # query-term table, never a shuffle of the postings on the term key
    rep = plan_report(df)
    assert "BroadcastHashJoin" in rep["plan"]


def test_ln_quantization_boundary_distance():
    """The r11 ADVICE flagged the ONE guarded ln() the repo allows in a
    compare path (bm25_topk's idf_u, bigram_lm_score's lp_mu): a 1-ulp
    JVM-vs-DuckDB libm difference could flip floor(SCALE*ln(x)) when the
    value sits ON an integer boundary. Sweep every ratio the two
    operators actually evaluate at every shipped SF and assert a
    boundary distance >= 1e-5 micro-units — cross-libm ln divergence at
    these magnitudes is ~1e-9, so this is a 10^4x safety margin (the
    observed minimum is ~1.5e-4). ln(1.0) == 0.0 is IEEE-exact on every
    libm (c_ab == c_a pairs) and is excluded as safe-by-identity."""
    import os

    from frolyk_spark.functions.hashing import portable_hash_py
    from frolyk_spark.operators.sampling import SPLIT_TRAIN
    from frolyk_spark.operators.text import LM_SCALE

    def boundary_dist(v: float) -> float:
        f = v - math.floor(v)
        return min(f, 1.0 - f)

    root = os.path.dirname(os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    ))
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = os.path.join(root, sf)
        if not os.path.isdir(sf_dir):
            continue
        tbl = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        ids = tbl["doc_id"].to_pylist()
        texts = tbl["text"].to_pylist()

        # bm25: every pruned query-term idf ratio
        df_counter, n_docs, probe_terms = Counter(), 0, set()
        for doc_id, text in zip(ids, texts):
            ws = text.split(" ")
            grams = {f"{a} {b}" for a, b in zip(ws, ws[1:])}
            df_counter.update(grams)
            n_docs += 1
            if doc_id < N_QUERIES:
                probe_terms |= grams
        for w in probe_terms:
            if df_counter[w] * DF_PRUNE_DENOM > n_docs:
                continue
            v = IDF_SCALE * math.log(
                (n_docs - df_counter[w] + 0.5) / (df_counter[w] + 0.5) + 1.0
            )
            assert boundary_dist(v) >= 1e-5, (sf, "idf", w, v)

        # bigram LM: every seen-pair and backoff ratio actually scored
        bi, uni, held = Counter(), Counter(), []
        for doc_id, text in zip(ids, texts):
            ws = text.split(" ")
            prs = list(zip(ws, ws[1:]))
            if portable_hash_py(str(doc_id)) % 100 < SPLIT_TRAIN:
                bi.update(prs)
                uni.update(a for a, _ in prs)
            else:
                held.append(prs)
        n_total = sum(uni.values())
        for prs in held:
            for a, b in prs:
                ratio = (
                    bi[(a, b)] / uni[a]
                    if (a, b) in bi
                    else 0.4 * (uni.get(b, 0) + 1.0) / (n_total + 1.0)
                )
                if ratio == 1.0:
                    continue  # ln(1)=0 exact on every libm
                v = LM_SCALE * math.log(ratio)
                assert boundary_dist(v) >= 1e-5, (sf, "lm", a, b, v)
