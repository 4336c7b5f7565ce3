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
