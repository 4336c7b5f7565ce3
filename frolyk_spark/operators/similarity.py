"""Similarity-search operators over the embeddings table (SURVEY §2 D10-D12).

- D10 `ann_bruteforce`: exact top-k cosine for a small probe set. The probe
  side is broadcast, so the plan is a broadcast nested-loop join that
  streams the corpus once — linear in corpus size, no shuffle of the
  corpus. This is the correctness baseline for ANN.
- D11 `ann_lsh`: random-hyperplane LSH. Corpus and probes are bucketed by
  sign-bit codes in L independent tables (deterministic md5-seeded planes,
  computed as a small numpy matrix and applied in an Arrow-batched pandas
  UDF — one matmul per batch). Candidates come from bucket equality
  (equi-join, shuffle-partitionable), then exact cosine reranks. At 100 TB
  the bucket join prunes the corpus instead of scanning it per probe.
  No SQL oracle (checked by a recall-vs-bruteforce pytest, SURVEY D11).
- D12 `embedding_stats`: per-label corpus statistics (count, mean norm,
  centroid norm) — posexplode + two hash aggregations.

Vector math is JVM-side (frolyk_spark.functions.vectors) everywhere except
the LSH bucketing matmul, which is deliberately a vectorized pandas UDF.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frolyk_spark.functions.portable import round4, round4_sql, round6, round6_sql
from frolyk_spark.functions.vectors import cosine, cosine_sql, norm, norm_sql
from frolyk_spark.sources.catalog import load_table

#: probes = vec_id < N_PROBES, corpus = the rest
N_PROBES = 10
#: neighbors returned per probe
TOP_K = 5

#: LSH geometry: L tables x NBITS sign bits. Tuned for the synthetic
#: embeddings where true top-k neighbors sit at cosine ~0.3-0.45 (weakly
#: clustered): few bits per table, many tables. A production corpus with
#: tight near-dup clusters would invert this (more bits, fewer tables) for
#: stronger pruning.
LSH_TABLES = 12
LSH_BITS = 4
#: embedding dimensionality of the test tables
DIM = 64


def _split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_emb")
    )
    corpus = (
        emb.where(F.col("vec_id") >= N_PROBES)
        .select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cand_emb"))
        # single-split test parquet: spread the cosine/matmul work across
        # cores (no-op at scale where the scan has many splits)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return probes, corpus


def _rerank(joined: DataFrame) -> DataFrame:
    """Exact-cosine top-k per probe. Rank on the UNROUNDED cosine with a
    neighbor_id tie-break (mirrored in the SQL oracle): ranking on a
    rounded value would let a cosine straddling a 1e-4 rounding boundary
    round differently per engine (double summation order differs) and flip
    top-k membership. Only the displayed cos_sim is rounded."""
    cos_raw = cosine(F.col("probe_emb"), F.col("cand_emb"))
    scored = joined.select(
        "probe_id", "neighbor_id", cos_raw.alias("cos_raw")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        # displayed ratio: portable floor round (r5 .xxxx5 class); the
        # floor form is engine-identical for negative cosines too
        .select("probe_id", "rank", "neighbor_id", round4(F.col("cos_raw")).alias("cos_sim"))
    )


# --- D10: exact brute-force top-k -------------------------------------------

def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-{TOP_K} cosine neighbors for the {N_PROBES}-probe set.

    broadcast(probes) x corpus: one pass over the corpus per batch of
    probes, cosine inside whole-stage codegen, then a top-k window keyed by
    probe (tiny shuffle: corpus_rows x n_probes scored pairs never leave
    the executors unaggregated — only the per-partition top-k survive the
    window's rank filter after AQE).
    """
    probes, corpus = _split(spark, sf_dir)
    return _bruteforce_from(probes, corpus)


def _bruteforce_from(probes: DataFrame, corpus: DataFrame) -> DataFrame:
    """Shared-input form (r16): ann_eval passes one lineage-cut corpus
    to every method pipeline instead of letting each re-scan it."""
    return _rerank(corpus.crossJoin(F.broadcast(probes)))


def _ann_bruteforce_sql() -> str:
    cos = cosine_sql("p.probe_emb", "c.cand_emb")
    return f"""
WITH p AS (
  SELECT vec_id AS probe_id, embedding AS probe_emb FROM embeddings WHERE vec_id < {N_PROBES}
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cand_emb FROM embeddings WHERE vec_id >= {N_PROBES}
),
scored AS (
  SELECT p.probe_id, c.neighbor_id, {cos} AS cos_raw,
         row_number() OVER (PARTITION BY p.probe_id
                            ORDER BY {cos} DESC, c.neighbor_id ASC) AS rank
  FROM p CROSS JOIN c
)
SELECT probe_id, rank, neighbor_id,
       {round4_sql('cos_raw')} AS cos_sim
FROM scored WHERE rank <= {TOP_K}
"""


# --- D11: random-hyperplane LSH + rerank ------------------------------------

def _hyperplanes() -> list[list[float]]:
    """Deterministic md5-seeded hyperplanes, components in [-1, 1)."""
    planes = []
    for t in range(LSH_TABLES):
        for i in range(LSH_BITS):
            row = []
            for j in range(DIM):
                u = int(hashlib.md5(f"{t}:{i}:{j}".encode()).hexdigest()[:15], 16)
                row.append(u / float(1 << 59) - 1.0)
            planes.append(row)
    return planes


def _bucketize(df: DataFrame, emb_col: str) -> DataFrame:
    """Add (table_id, bucket) rows: one sign-bit code per LSH table.

    The matmul against the (DIM x L*NBITS) plane matrix runs as a
    vectorized pandas UDF over Arrow batches — one numpy matmul per batch.
    """
    from pyspark.sql.functions import pandas_udf

    planes = _hyperplanes()

    @pandas_udf("array<bigint>")
    def buckets(emb: pd.Series) -> pd.Series:
        import numpy as np

        x = np.stack(emb.to_numpy()).astype(np.float64)  # (batch, DIM)
        return pd.Series(list(_lsh_codes(x, planes)))

    return (
        df.withColumn("codes", buckets(F.col(emb_col)))
        .select("*", F.posexplode("codes").alias("table_id", "bucket"))
        .drop("codes")
    )


def _lsh_codes(x, planes) -> "np.ndarray":
    """(rows, LSH_TABLES) bucket codes for a (rows, DIM) matrix — THE
    bucketing math. The corpus UDF and the driver-side probe path both
    call this; two hand-synced copies would let a bit-order or weight
    change silently desynchronize probe and corpus buckets (recall decays
    to the pytest floor instead of failing loudly)."""
    import numpy as np

    mat = np.asarray(planes, dtype=np.float64).T  # (DIM, L*NBITS)
    bits = (x @ mat > 0).astype(np.int64)  # (rows, L*NBITS)
    weights = 1 << np.arange(LSH_BITS, dtype=np.int64)
    return bits.reshape(len(x), LSH_TABLES, LSH_BITS) @ weights


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-{TOP_K} via {LSH_TABLES}x{LSH_BITS}-bit sign-LSH.

    The probe set is tiny by contract, so its buckets are computed
    driver-side with the same plane matrix and broadcast (no UDF stage for
    10 rows); the corpus is bucketized distributed. Candidates = corpus
    rows sharing any table bucket with a probe (equi-join on
    (table_id, bucket)), deduped, then exact-cosine reranked. Checked by
    tests/test_similarity.py: recall >= 0.6 vs ann_bruteforce; ALSO
    oracle-checked as of r10 (`_ann_lsh_sql` — the shared bucket-geometry
    block ann_lsh_buckets certified green since r9, plus the exact fold
    rerank).
    """
    probes, corpus = _split(spark, sf_dir)
    return _lsh_from(spark, probes, probes.collect(), corpus)


def _lsh_from(
    spark: SparkSession, probes: DataFrame, probe_rows, corpus: DataFrame
) -> DataFrame:
    """Shared-input form (r16): takes the collected probe rows and the
    (possibly lineage-cut) corpus so ann_eval pays one probe collect and
    one corpus materialization across all method pipelines."""
    import numpy as np

    x = np.stack([np.asarray(r.probe_emb, dtype=np.float64) for r in probe_rows])
    codes = _lsh_codes(x, _hyperplanes())
    pb = spark.createDataFrame(
        [
            (int(r.probe_id), t, int(codes[i, t]))
            for i, r in enumerate(probe_rows)
            for t in range(LSH_TABLES)
        ],
        "probe_id bigint, table_id int, bucket bigint",
    )
    cb = _bucketize(corpus, "cand_emb")
    # dedup collisions on the two ids only — the 64-dim payload must not
    # ride through the distinct() shuffle; vectors re-attach afterwards
    cand_ids = (
        cb.join(F.broadcast(pb), ["table_id", "bucket"])
        .select("probe_id", "neighbor_id")
        .distinct()
    )
    cands = cand_ids.join(corpus, "neighbor_id").join(F.broadcast(probes), "probe_id")
    return _rerank(cands)


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11's driver-checkable companion: per-(table, bucket) corpus
    occupancy — count and id-sum — computed by the REAL _bucketize UDF.
    ann_lsh itself is recall-gated (no oracle: its output depends on
    rerank-over-candidates), but the bucket ASSIGNMENT underneath it is
    fully deterministic: md5-seeded hyperplanes, sign of a dot product.
    The DuckDB oracle recomputes every sign bit from the same plane
    constants with the engine-parity sequential fold (functions.vectors),
    and tests/test_similarity.py pins the UDF's numpy-matmul codes equal
    to the same fold evaluated JVM-side — so a green row here certifies
    the exact bucket geometry ann_lsh prunes with. id_sum pins MEMBERSHIP,
    not just occupancy (two swapped vectors would keep counts intact)."""
    _, corpus = _split(spark, sf_dir)
    return (
        _bucketize(corpus, "cand_emb")
        .groupBy("table_id", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("neighbor_id").alias("id_sum"),
        )
        .orderBy("table_id", "bucket")
    )


def _lsh_codes_ctes(pred: str, id_alias: str, codes_name: str,
                    *, include_planes: bool = True) -> str:
    """Shared CTE block recomputing the LSH bucket codes for the
    embeddings rows matching ``pred``: plane constants as VALUES
    (repr() round-trips doubles exactly; both parsers read the same IEEE
    value, and the fold multiplies them against STORED embedding
    components — no literal-only arithmetic for DuckDB's non-IEEE
    constant folder), sign bits via the fold dot, codes via the bit sum.
    One definition for the bucket-occupancy companion AND the full
    ann_lsh oracle, so the geometry can never drift per-site."""
    from frolyk_spark.functions.vectors import dot_sql

    planes = _hyperplanes()
    rows = []
    for t in range(LSH_TABLES):
        for i in range(LSH_BITS):
            w = planes[t * LSH_BITS + i]
            lst = "[" + ", ".join(repr(v) for v in w) + "]::DOUBLE[]"
            rows.append(f"({t}, {i}, {lst})")
    values = ",\n".join(rows)
    d = dot_sql("e.embedding", "p.w")
    planes_cte = f"""planes(table_id, bit, w) AS (VALUES
{values}
),
"""
    return (planes_cte if include_planes else "") + f"""{codes_name}_bits AS (
  SELECT e.vec_id AS {id_alias}, p.table_id, p.bit,
         CASE WHEN {d} > 0 THEN 1 ELSE 0 END AS b
  FROM embeddings e CROSS JOIN planes p
  WHERE {pred}
),
{codes_name} AS (
  SELECT {id_alias}, cast(table_id as int) AS table_id,
         cast(sum(b * (1 << bit)) as bigint) AS bucket
  FROM {codes_name}_bits GROUP BY {id_alias}, table_id
)"""


def _ann_lsh_buckets_sql() -> str:
    ctes = _lsh_codes_ctes(f"e.vec_id >= {N_PROBES}", "neighbor_id", "codes")
    return f"""
WITH {ctes}
SELECT table_id, bucket, count(*) AS n_vectors,
       cast(sum(neighbor_id) as bigint) AS id_sum
FROM codes GROUP BY table_id, bucket
ORDER BY table_id, bucket
"""


def _ann_lsh_sql() -> str:
    """ann_lsh end-to-end: corpus codes via the shared geometry block,
    probe codes via a SECOND block over the same plane constants (the
    oracle twin of the driver-side numpy probe bucketing), candidates by
    (table, bucket) equality, exact fold-cosine rerank. The only
    numerical risk is the sign-bit ULP class ann_lsh_buckets has carried
    green since r9 — an identical candidate set makes the rerank exact."""
    corpus_ctes = _lsh_codes_ctes(
        f"e.vec_id >= {N_PROBES}", "neighbor_id", "ccodes"
    )
    # second block reuses the first's planes CTE — emit only its tail
    probe_tail = _lsh_codes_ctes(
        f"e.vec_id < {N_PROBES}", "probe_id", "pcodes", include_planes=False
    )
    return f"""
WITH {corpus_ctes},
{probe_tail},
cand AS (
  SELECT DISTINCT p.probe_id, c.neighbor_id
  FROM pcodes p JOIN ccodes c
    ON p.table_id = c.table_id AND p.bucket = c.bucket
),
probes AS (
  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
  WHERE vec_id < {N_PROBES}
),
corpus AS (
  SELECT vec_id AS nid, embedding AS e FROM embeddings
  WHERE vec_id >= {N_PROBES}
),
scored AS (
  SELECT cd.probe_id, cd.neighbor_id, {cosine_sql('p.pe', 'x.e')} AS cos_raw
  FROM cand cd
  JOIN probes p ON cd.probe_id = p.probe_id
  JOIN corpus x ON cd.neighbor_id = x.nid
)
SELECT probe_id, rank, neighbor_id,
       {round4_sql('cos_raw')} AS cos_sim
FROM (
  SELECT probe_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


# --- D11b: IVF (inverted-file) ANN ------------------------------------------

#: coarse-quantizer geometry. nprobe is high relative to nlist because the
#: synthetic embeddings are weakly clustered (near-random); a production
#: corpus with real cluster structure runs nprobe/nlist much smaller.
IVF_CLUSTERS = 16
IVF_NPROBE = 6
IVF_ITERS = 4


def _train_centroids(corpus: DataFrame, emb_col: str):
    """Deterministic k-means coarse quantizer.

    Init = the corpus rows whose id hashes smallest (reproducible, no RNG);
    each Lloyd iteration is one distributed assign (numpy argmax over the
    broadcast centroid matrix, Arrow-batched) + one groupBy mean. Centroids
    are model state — IVF_CLUSTERS x DIM floats — so collecting them per
    iteration is bounded and legitimate; the corpus itself never moves.
    """
    import numpy as np

    seed_rows = (
        corpus.select(F.col("neighbor_id").alias("cid"), F.col(emb_col).alias("e"))
        .orderBy(F.md5(F.col("cid").cast("string")))
        .limit(IVF_CLUSTERS)
        .collect()
    )
    centroids = np.stack([np.asarray(r.e, dtype=np.float64) for r in seed_rows])
    for _ in range(IVF_ITERS):
        assigned = _assign_cluster(corpus, emb_col, centroids)
        means = (
            assigned.select("cluster", F.posexplode(emb_col).alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        new = centroids.copy()
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r.cluster, {})[r.pos] = r.m
        for c, posmap in by_cluster.items():
            new[c] = np.array([posmap[p] for p in sorted(posmap)])
        centroids = new
    return centroids


def _assign_cluster(df: DataFrame, emb_col: str, centroids) -> DataFrame:
    """Nearest-centroid id per row (cosine), numpy matmul over Arrow batches."""
    from pyspark.sql.functions import pandas_udf

    import numpy as np

    cent = np.asarray(centroids, dtype=np.float64)
    cent_unit = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    @pandas_udf("int")
    def nearest(emb: pd.Series) -> pd.Series:
        x = np.stack(emb.to_numpy()).astype(np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series((x @ cent_unit.T).argmax(axis=1).astype("int32"))

    return df.withColumn("cluster", nearest(F.col(emb_col)))


def _ann_scratch(sf_dir: str, tag: str) -> str:
    """Source-keyed scratch path for a persisted ANN index artifact (the
    E4 train-once shape): keyed by the resolved embeddings path, with the
    index geometry in the tag so a parameter change never serves a stale
    fit. NEVER under the pid-scoped results root (CLAUDE.md janitor
    rule)."""
    import os

    from frolyk_spark.sources.streams import SCRATCH

    target = os.path.realpath(os.path.join(sf_dir, "embeddings.parquet"))
    key = hashlib.md5(target.encode()).hexdigest()[:12]
    return os.path.join(SCRATCH, "ann", f"{tag}_{key}.parquet")


def persisted_ivf_index(spark: SparkSession, sf_dir: str):
    """IVF index BUILD, persisted once per (corpus, geometry) — the r14
    verdict's build/query split: the Lloyd fit and the per-vector cell
    assignment are deterministic per (dataset, params), so a production
    deployment trains them once and every query pays only probe-side
    cost. Returns (centroids ndarray, cell-partitioned corpus frame).

    The assignment parquet is directory-partitioned BY CELL — the
    physical layout the 100 TB story needs: a probe's nprobe/nlist cell
    equi-join becomes partition-pruned reads of just those cells.
    Float64 parquet round-trips exactly, so the reloaded fit is
    bit-identical to the inline one and the SQL oracle (which re-derives
    the fit end-to-end) is unchanged."""
    import os

    import numpy as np

    geo = f"c{IVF_CLUSTERS}i{IVF_ITERS}p{N_PROBES}"
    cdir = _ann_scratch(sf_dir, f"ivf_cent_{geo}")
    adir = _ann_scratch(sf_dir, f"ivf_cells_{geo}")
    if not os.path.exists(os.path.join(cdir, "_SUCCESS")):
        _, corpus = _split(spark, sf_dir)
        fit = _train_centroids(corpus, "cand_emb")
        spark.createDataFrame(
            [(int(i), [float(v) for v in c]) for i, c in enumerate(fit)],
            "cluster int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(cdir)
    rows = spark.read.parquet(cdir).orderBy("cluster").collect()
    centroids = np.stack(
        [np.asarray(r.centroid, dtype=np.float64) for r in rows]
    )
    if not os.path.exists(os.path.join(adir, "_SUCCESS")):
        _, corpus = _split(spark, sf_dir)
        _assign_cluster(corpus, "cand_emb", centroids).write.mode(
            "overwrite"
        ).partitionBy("cluster").parquet(adir)
    return centroids, spark.read.parquet(adir)


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-{TOP_K} via IVF: a {IVF_CLUSTERS}-cell coarse
    quantizer over the corpus; each probe scans only its {IVF_NPROBE}
    nearest cells. The scan prunes via an equi-join on cluster id, so at
    100 TB the corpus would be *stored* partitioned by cell and a probe
    touches nprobe/nlist of the data. Deterministic (hash-seeded init), so
    recall is stable; checked in tests/test_similarity.py vs bruteforce.
    Oracle-checked as of r10: the fixed-round Lloyd fit unrolls into SQL
    (`_lloyd_ctes`), so the DuckDB oracle re-derives fit + cell pruning +
    exact rerank end-to-end. As of r15 the fit + cell assignment come
    from the PERSISTED index (persisted_ivf_index) — query-side cost
    only, the production operating shape; the oracle is unchanged
    because the persisted fit is bit-identical to the inline one."""
    probes, _ = _split(spark, sf_dir)
    return _ivf_from(spark, sf_dir, probes, probes.collect())


def _ivf_from(
    spark: SparkSession, sf_dir: str, probes: DataFrame, probe_rows
) -> DataFrame:
    """Shared-input form (r16) — see _lsh_from."""
    import numpy as np

    centroids, assigned = persisted_ivf_index(spark, sf_dir)

    cent = np.asarray(centroids, dtype=np.float64)
    cent_unit = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    x = np.stack([np.asarray(r.probe_emb, dtype=np.float64) for r in probe_rows])
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    nearest_cells = np.argsort(-(x @ cent_unit.T), axis=1)[:, :IVF_NPROBE]
    pb = spark.createDataFrame(
        [
            (int(r.probe_id), int(c))
            for i, r in enumerate(probe_rows)
            for c in nearest_cells[i]
        ],
        "probe_id bigint, cluster int",
    )
    cands = (
        assigned.join(F.broadcast(pb), "cluster")
        .select("probe_id", "neighbor_id", "cand_emb")
        .join(F.broadcast(probes), "probe_id")
    )
    return _rerank(cands)


# --- D40: product-quantization (PQ-ADC) ANN ----------------------------------

#: PQ geometry: M subspaces x K sub-centroids -> M log2(K)-bit codes per
#: vector (16 bytes at M=16, K=16 — a 16x compression of the 64-float
#: vector). Codebooks train on a BOUNDED deterministic sample (the
#: standard production shape: codebook quality saturates at a few
#: thousand training vectors regardless of corpus size).
PQ_M = 16
PQ_K = 16
PQ_SAMPLE = 2000
PQ_ITERS = 8
#: exact-rerank depth per probe (ADC scan keeps the top PQ_CAND by
#: approximate score; recall@5 = 0.94 on this data, pytest-gated >= 0.7)
PQ_CAND = 50


def _pq_codebooks(corpus: DataFrame, emb_col: str):
    """Per-subspace k-means codebooks from a deterministic md5-ordered
    sample (bounded collect — model state, like the IVF centroids)."""
    import numpy as np

    rows = (
        corpus.select(F.col("neighbor_id").alias("cid"), F.col(emb_col).alias("e"))
        .orderBy(F.md5(F.col("cid").cast("string")))
        .limit(PQ_SAMPLE)
        .collect()
    )
    X = np.stack([np.asarray(r.e, dtype=np.float64) for r in rows])
    sub = DIM // PQ_M
    books = []
    for m in range(PQ_M):
        Xm = X[:, m * sub : (m + 1) * sub]
        cb = Xm[: min(PQ_K, len(Xm))].copy()
        for _ in range(PQ_ITERS):
            # argmin ||x-c||² == argmin (||c||² - 2 x·c): one matmul
            # instead of an (N, K, sub) broadcast — ~4× on the training
            # loop, same lowest-index tie-break (np.argmin)
            a = ((cb**2).sum(-1)[None, :] - 2.0 * (Xm @ cb.T)).argmin(1)
            for k in range(len(cb)):
                if (a == k).any():
                    cb[k] = Xm[a == k].mean(0)
        books.append(cb)
    return books


def persisted_pq_index(spark: SparkSession, sf_dir: str):
    """PQ index BUILD, persisted once per (corpus, geometry) — the r14
    verdict's build/query split applied to D40: codebook training AND
    the per-corpus encode (the expensive whole-corpus pass) are
    deterministic per (dataset, params); a production deployment stores
    the CODES, and every query pays only the ADC scan + rerank. Returns
    (codebooks list-of-ndarrays, coded corpus frame (neighbor_id,
    code array<int>)). Float64/int parquet round-trips exactly, so the
    SQL oracle (which re-derives fit + encode end-to-end) is
    unchanged."""
    import os

    import numpy as np

    geo = f"m{PQ_M}k{PQ_K}s{PQ_SAMPLE}i{PQ_ITERS}p{N_PROBES}"
    bdir = _ann_scratch(sf_dir, f"pq_books_{geo}")
    codir = _ann_scratch(sf_dir, f"pq_codes_{geo}")
    if not os.path.exists(os.path.join(bdir, "_SUCCESS")):
        _, corpus = _split(spark, sf_dir)
        fit = _pq_codebooks(corpus, "cand_emb")
        spark.createDataFrame(
            [
                (int(m), int(k), [float(v) for v in cb[k]])
                for m, cb in enumerate(fit)
                for k in range(len(cb))
            ],
            "m int, k int, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(bdir)
    rows = spark.read.parquet(bdir).orderBy("m", "k").collect()
    books = []
    for m in range(PQ_M):
        books.append(
            np.stack(
                [
                    np.asarray(r.centroid, dtype=np.float64)
                    for r in rows
                    if r.m == m
                ]
            )
        )
    if not os.path.exists(os.path.join(codir, "_SUCCESS")):
        _, corpus = _split(spark, sf_dir)
        corpus.select(
            "neighbor_id", _pq_encode_udf(books)(F.col("cand_emb")).alias("code")
        ).write.mode("overwrite").parquet(codir)
    return books, spark.read.parquet(codir)


def _pq_encode_udf(books):
    """The per-corpus encode as a reusable Arrow-batched UDF: nearest
    sub-centroid per subspace via the matmul argmin (same tie-break as
    the fit)."""
    from pyspark.sql.functions import pandas_udf

    import numpy as np

    books_arr = [np.asarray(b, dtype=np.float64) for b in books]
    cn2 = [(b**2).sum(-1) for b in books_arr]
    sub = DIM // PQ_M

    @pandas_udf("array<int>")
    def encode(emb: pd.Series) -> pd.Series:
        x = np.stack(emb.to_numpy()).astype(np.float64)
        codes = np.stack(
            [
                (cn2[m][None, :] - 2.0 * (x[:, m * sub : (m + 1) * sub] @ books_arr[m].T))
                .argmin(1)
                for m in range(PQ_M)
            ],
            axis=1,
        ).astype("int32")
        return pd.Series(list(codes))

    return encode


def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-{TOP_K} via product quantization with asymmetric
    distance (ADC): corpus vectors compress to {PQ_M} sub-centroid codes,
    probes score the CODES through per-probe lookup tables (one gather
    + sum per subspace — never touching the float vectors), and only the
    top {PQ_CAND} per probe are exactly reranked.

    This is the memory-bound scale path ann_lsh/ann_ivf don't cover: at
    100 TB the coded corpus is 16x smaller than the float corpus, so the
    ADC scan reads codes at cache speed (in production PQ composes with
    IVF cell pruning — both stages exist here independently). Encode and
    ADC scoring are vectorized pandas UDFs (numpy per Arrow batch);
    per-probe top-C selection is a rank window partitioned by probe.
    Deterministic end-to-end (md5-ordered sample, argmin tie -> lowest
    index), so recall is stable: tests/test_similarity.py gates
    recall@{TOP_K} >= 0.7 vs ann_bruteforce. Oracle-checked as of r10:
    the fixed-round per-subspace fit, encode, ADC scoring, and rerank all
    unroll into SQL (`_ann_pq_sql`), like ann_ivf's Lloyd fit. As of r15
    the codebooks AND the coded corpus come from the PERSISTED index
    (persisted_pq_index) — the query pays only ADC + rerank, the
    production operating shape; the oracle is unchanged because the
    persisted fit/codes are bit-identical to the inline ones.
    """
    probes, corpus = _split(spark, sf_dir)
    return _pq_from(spark, sf_dir, probes, probes.collect(), corpus)


def _pq_from(
    spark: SparkSession,
    sf_dir: str,
    probes: DataFrame,
    probe_rows,
    corpus: DataFrame,
) -> DataFrame:
    """Shared-input form (r16) — see _lsh_from."""
    from pyspark.sql.functions import pandas_udf

    import numpy as np

    books, coded_corpus = persisted_pq_index(spark, sf_dir)
    sub = DIM // PQ_M
    books_arr = [np.asarray(b, dtype=np.float64) for b in books]

    enc_cn2 = [(b**2).sum(-1) for b in books_arr]

    probe_ids = [int(r.probe_id) for r in probe_rows]
    Q = np.stack([np.asarray(r.probe_emb, dtype=np.float64) for r in probe_rows])
    # LUT[p, m, k] = <q_p restricted to subspace m, codebook[m][k]>;
    # approx cos = sum_m LUT[p, m, code_m] / (||q_p|| * approx_norm)
    lut = np.stack(
        [
            np.stack([Q[p, m * sub : (m + 1) * sub] @ books_arr[m].T for m in range(PQ_M)])
            for p in range(len(probe_ids))
        ]
    )
    qnorm = np.maximum(np.linalg.norm(Q, axis=1), 1e-12)
    cn2 = enc_cn2  # the same per-codebook squared-norm table ADC needs

    @pandas_udf("array<double>")
    def adc_scores(codes: pd.Series) -> pd.Series:
        c = np.stack(codes.to_numpy()).astype(np.int64)  # (batch, M)
        adot = np.zeros((len(lut), len(c)))
        norm2 = np.zeros(len(c))
        for m in range(PQ_M):
            adot += lut[:, m, :][:, c[:, m]]
            norm2 += cn2[m][c[:, m]]
        score = adot / (qnorm[:, None] * np.sqrt(np.maximum(norm2, 1e-12))[None, :])
        return pd.Series(list(score.T))

    coded = coded_corpus.select(
        "neighbor_id", adc_scores(F.col("code")).alias("scores")
    )
    pid_arr = F.array(*[F.lit(p) for p in probe_ids])
    scored = coded.select(
        "neighbor_id", F.posexplode("scores").alias("pos", "approx")
    ).select(
        F.element_at(pid_arr, F.col("pos") + 1).cast("bigint").alias("probe_id"),
        "neighbor_id",
        "approx",
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand_ids = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= PQ_CAND)
        .select("probe_id", "neighbor_id")
    )
    cands = cand_ids.join(corpus, "neighbor_id").join(F.broadcast(probes), "probe_id")
    return _rerank(cands)


# --- D12: per-label embedding statistics ------------------------------------

def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label count, mean vector norm, and centroid norm.

    Centroid = element-wise mean via posexplode -> (label, pos) avg ->
    per-label sqrt-sum-of-squares. Two hash aggregations, both
    shuffle-partitioned on small keys; at 100 TB this is the standard
    two-stage mean with map-side partial aggregation.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select("label", norm("embedding").alias("nrm")).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        # portable floor round; the avg itself is an order-sensitive
        # double sum (sqrt values have no integer sufficient statistics) —
        # residual ULP risk is inherent and has held across 3-scale sweeps
        round4(F.avg("nrm")).alias("avg_norm"),
    )
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .groupBy("label")
        .agg(round4(F.sqrt(F.sum(F.col("m") * F.col("m")))).alias("centroid_norm"))
    )
    return norms.join(cent, "label").select("label", "n_vecs", "avg_norm", "centroid_norm")


def _embedding_stats_sql() -> str:
    return f"""
WITH e AS (
  SELECT label, unnest(embedding) AS val, generate_subscripts(embedding, 1) AS pos
  FROM embeddings
),
cent AS (
  SELECT label, floor(sqrt(sum(m * m)) * 10000.0 + 0.5) / 10000.0 AS centroid_norm
  FROM (SELECT label, pos, avg(cast(val as double)) AS m FROM e GROUP BY label, pos)
  GROUP BY label
),
norms AS (
  SELECT label, count(*) AS n_vecs,
         floor(avg({norm_sql('embedding')}) * 10000.0 + 0.5) / 10000.0 AS avg_norm
  FROM embeddings GROUP BY label
)
SELECT n.label, n.n_vecs, n.avg_norm, c.centroid_norm
FROM norms n JOIN cent c ON n.label = c.label
"""


# --- D37: int8 scalar quantization -------------------------------------------

def embedding_quantize_frame(emb: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x| / 127,
    code_i = round(x_i / scale) — the 4× storage/bandwidth compression
    step a 100 TB vector corpus applies before ANN indexing (IVF/PQ
    pipelines quantize exactly like this before training the coarse
    quantizer). Returns `codes` as array<bigint> for in-pipeline
    consumers (the driver-checked query serializes it — see
    embedding_quantize below).

    Map-only: one pass, no shuffle, array exprs inside whole-stage
    codegen. The max-abs reduction and the scale are computed ONCE per
    row as projected columns and referenced from the codes lambda —
    higher-order-function lambdas are not codegen'd and do not hoist
    common subexpressions, so interpolating the O(d) aggregate into the
    per-element lambda would re-run it per element (O(d²) per row).
    Cross-engine exactness: the rounding is written as
    floor(x/scale + 0.5) on BOTH engines — library round() semantics on
    doubles differ subtly between the JVM (shortest-repr HALF_UP) and
    libm (binary half-away), while floor of an identical double is
    bit-deterministic everywhere. Zero vectors take scale 1.0 so the
    division is defined (codes all 0). The max-abs reduction is
    order-independent (max), so parallelism can't perturb it.
    """
    max_abs = (
        "aggregate(transform(embedding, x -> abs(cast(x as double))),"
        " cast(0.0 as double), (a, v) -> greatest(a, v))"
    )
    return (
        emb.withColumn("_max_abs", F.expr(max_abs))
        .withColumn("_scale", F.expr("if(_max_abs = 0.0d, 1.0d, _max_abs / 127.0d)"))
        .select(
            "vec_id",
            round6(F.col("_scale")).alias("scale"),
            F.expr(
                "transform(embedding,"
                " x -> cast(floor(cast(x as double) / _scale + 0.5d) as bigint))"
            ).alias("codes"),
        )
    )


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable form of embedding_quantize_frame: `codes` is
    serialized to a comma-joined string so every output column is a
    hashable scalar (the driver's pandas canonicalizer sorts rows over
    all columns; a raw array<bigint> is unhashable there). bigint→string
    formatting is plain decimal on both engines, so the compare stays
    exact. Pipeline consumers wanting the array form use
    embedding_quantize_frame directly.
    """
    q = embedding_quantize_frame(load_table(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "scale",
        F.concat_ws(",", F.expr("transform(codes, c -> cast(c as string))")).alias(
            "codes"
        ),
    )


def _embedding_quantize_sql() -> str:
    return """
WITH s AS (
  SELECT vec_id, embedding,
         CASE WHEN max_abs = 0.0 THEN 1.0 ELSE max_abs / 127.0 END AS scale
  FROM (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(cast(x as double)))) AS max_abs
    FROM embeddings
  )
)
SELECT vec_id,
       floor(scale * 1000000.0 + 0.5) / 1000000.0 AS scale,
       array_to_string(
         list_transform(embedding,
                        x -> cast(cast(floor(cast(x as double) / scale + 0.5)
                                       AS bigint) AS varchar)),
         ',') AS codes
FROM s
"""


# --- D51: SemDeDup (k-means-blocked semantic dedup) ---------------------------

#: multi-probe width: each vector joins its SEM_PROBE nearest clusters, so a
#: near-dup pair straddling a cluster boundary still meets in the overlap.
#: Measured on the synthetic (weakly clustered) embeddings: single-probe
#: recall of true cos>=tau pairs is ~0.3; 3-probe is ~0.85 while still
#: pruning ~half of all pairs. A production corpus with real semantic
#: cluster structure runs fewer probes against many more clusters and
#: prunes far harder — the knobs, not the shape, change with the data.
SEM_PROBE = 3
#: verification threshold — matches dedup_embedding's near-dup bar so the
#: two operators' outputs are directly comparable in the recall pytest
SEM_TAU = 0.35
#: training sample bound for the blocking quantizer (the ann_pq pattern:
#: fit the model on a deterministic hash-ordered sample, never the corpus)
SEM_TRAIN_SAMPLE = 512
SEM_ITERS = 4
#: expected membership rows (multi-probe copies included) per blocking
#: cluster: nlist is DERIVED from corpus size against this target, so the
#: per-cluster verify matmul is bounded by construction (~T^2 float64 =
#: 0.5 MB at 256) instead of an implicit knob that silently grows
#: quadratic per-task memory as the corpus scales (VERDICT r6 item 4)
SEM_TARGET_CLUSTER_ROWS = 256


def _semantic_nlist(n_vectors: int) -> int:
    """Blocking-cluster count for a corpus of n_vectors: enough clusters
    that the EXPECTED per-cluster membership (SEM_PROBE rows per vector)
    stays at SEM_TARGET_CLUSTER_ROWS, floored at the small-corpus default.
    Driver-held model state grows O(nlist x dim) = O(n/T x dim); past
    driver capacity the fit itself moves to the distributed Lloyd form
    (ann_ivf's `_train_centroids`) with the same derivation."""
    import math

    return max(IVF_CLUSTERS, math.ceil(SEM_PROBE * n_vectors / SEM_TARGET_CLUSTER_ROWS))


def _train_centroids_sampled(
    corpus: DataFrame, id_col: str, emb_col: str, nlist: int = IVF_CLUSTERS
):
    """Deterministic k-means fit on a bounded hash-ordered sample.

    ann_ivf's `_train_centroids` runs Lloyd iterations as Spark jobs over
    the whole corpus — fine as a demonstration of the distributed form,
    but 2·iters jobs of latency for a model that is {IVF_CLUSTERS}×DIM
    floats. Production quantizers (and ann_pq here) fit on a sample: ONE
    bounded collect (md5-ordered, reproducible, ≤{SEM_TRAIN_SAMPLE}
    rows — model-fitting state, like PQ's codebook sample), then numpy
    Lloyd locally with the same hash-seeded init rule. Assignment of the
    full corpus stays distributed.
    """
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(emb_col).alias("e"))
        .orderBy(F.md5(F.col("cid").cast("string")))
        .limit(max(SEM_TRAIN_SAMPLE, 4 * nlist))
        .collect()
    )
    x = np.stack([np.asarray(r.e, dtype=np.float64) for r in rows])
    nlist = min(nlist, len(x))  # can't seed more centroids than samples
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    centroids = x[:nlist].copy()  # first K in md5 order = the seed rule
    for _ in range(SEM_ITERS):
        cu = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
        assign = (xn @ cu.T).argmax(axis=1)
        for k in range(nlist):
            if (assign == k).any():
                centroids[k] = x[assign == k].mean(axis=0)
    return centroids


def _semantic_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-cosine-verified (cos >= {SEM_TAU}) candidate pairs from
    multi-probe k-means blocking; columns (vec_a, vec_b, cos_raw)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf


    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cand_emb"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # one metadata-cheap count derives the blocking width from corpus size
    nlist = _semantic_nlist(emb.count())
    centroids = _train_centroids_sampled(
        corpus, "neighbor_id", "cand_emb", nlist=nlist
    )
    cent = np.asarray(centroids, dtype=np.float64)
    cent_unit = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    @pandas_udf("array<int>")
    def top_clusters(e: pd.Series) -> pd.Series:
        x = np.stack(e.to_numpy()).astype(np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        idx = np.argsort(-(x @ cent_unit.T), axis=1)[:, :SEM_PROBE]
        return pd.Series(list(idx.astype("int32")))

    # verification is SemDeDup's actual form: shuffle members to their
    # cluster(s), then ONE numpy matmul per cluster group computes every
    # within-cluster pairwise cosine (a per-pair zip_with/aggregate
    # cosine was measured 2-3x slower — higher-order functions are
    # interpreted, not codegen'd, and the pair list is quadratic in
    # cluster size while the matmul amortizes it). Group size is bounded
    # by construction: nlist is derived from corpus size against
    # SEM_TARGET_CLUSTER_ROWS (_semantic_nlist) — the same memory
    # contract the paper's per-cluster pass has.
    assigned = (
        corpus.select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("cand_emb").alias("e"),
            F.explode(top_clusters(F.col("cand_emb"))).alias("cluster"),
        )
    )

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.stack(pdf["e"].to_numpy()).astype(np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ x.T
        ids = pdf["vec_id"].to_numpy()
        ii, jj = np.triu_indices(len(ids), 1)
        keep = sims[ii, jj] >= SEM_TAU
        a, b = ids[ii[keep]], ids[jj[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {"vec_a": lo, "vec_b": hi, "cos_raw": sims[ii[keep], jj[keep]]}
        )

    # pairs that meet in several shared clusters must dedupe on the PAIR
    # KEY, not distinct() over cos_raw too: per-cluster BLAS matmuls over
    # different-sized matrices can order the dot-product summation
    # differently, leaving last-ULP-different cosines for the same pair
    # (r6 ADVICE); max() picks one deterministically
    return (
        assigned.groupBy("cluster")
        .applyInPandas(per_cluster, "vec_a bigint, vec_b bigint, cos_raw double")
        .groupBy("vec_a", "vec_b")
        .agg(F.max("cos_raw").alias("cos_raw"))
    )


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., 2023 — public arXiv:2303.09540) prune list:
    block the corpus by a learned k-means quantizer instead of an a-priori
    key (dedup_embedding blocks on the label column; this LEARNS the
    blocks, which is what makes it work on unlabeled corpora), verify
    candidates with exact cosine, and emit one row per PRUNED vector —
    every vec_id that has a cos >= {SEM_TAU} neighbor with a smaller id —
    with its keeper (highest-cosine such neighbor, min-id tie-break).

    Scale shape: the quantizer fits on a bounded hash-ordered sample
    (`_train_centroids_sampled` — the ann_pq pattern; bounded centroid model
    state); assignment is one numpy matmul per Arrow batch; candidate
    generation is an id-only equi-join on cluster; verification joins the
    vectors back by id. No all-pairs stage anywhere. Oracle-checked as of
    r10 (`_semantic_dedup_sql` — the unrolled-Lloyd fit + blocking +
    verify, like ann_ivf); the pytest gates remain: every emitted pair
    re-checked exact in numpy (precision 1.0) and recall >= 0.6 of the
    true unblocked cos >= {SEM_TAU} pair set.
    """
    verified = _semantic_candidate_pairs(spark, sf_dir)
    w = Window.partitionBy("vec_b").orderBy(F.desc("cos_raw"), F.asc("vec_a"))
    return (
        verified.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            F.col("vec_b").alias("vec_id"),
            F.col("vec_a").alias("kept_by"),
            # portable floor round (r5 .xxxx5 class), NOT F.round — the
            # displayed ratio is now in the driver compare path (r10)
            round4(F.col("cos_raw")).alias("cos_sim"),
        )
        .orderBy("vec_id")
    )


# --- D56: PCA over the embedding corpus --------------------------------------

#: principal components kept by embedding_pca
PCA_K = 2


def _fit_pca(corpus: DataFrame, emb_col: str):
    """Mean vector + top-{PCA_K} principal axes from two map-side-
    combinable passes: a d-group mean pass, then the d×d second-moment
    pass (the (i, j) explode fans each row out ~d²/2 ways, but the
    shuffle carries only d²/2 partial sums per partition — model state,
    not data); the driver finishes with a numpy eigh on the d×d matrix
    (bounded, deterministic). Upper triangle only — the matrix is
    symmetric, so i <= j halves the fan-out. Two scans beat one here: a
    scan is cheap, while folding the mean into the pair pass would
    replicate d+1 extra aggregate slots into every one of the d²/2
    groups (measured shuffle state 3x)."""
    import numpy as np

    d = DIM
    # mean pass: d groups of (sum, count) — the diagonal-only state the
    # pair pass would otherwise drag through every one of its d²/2 groups
    # (a scan is cheap; redundant shuffled aggregate state is not)
    means = (
        corpus.select(F.posexplode(emb_col).alias("i", "xi"))
        .groupBy("i")
        .agg(F.sum(F.col("xi").cast("double")).alias("sx"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n = max(r.n for r in means)
    mu = np.zeros(d)
    for r in means:
        mu[r.i] = r.sx / n
    moments = (
        corpus.select(F.posexplode(emb_col).alias("i", "xi"), F.col(emb_col).alias("e"))
        .select(
            "i",
            "xi",
            F.posexplode("e").alias("j", "xj"),
        )
        .where(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("xi").cast("double") * F.col("xj").cast("double")).alias("sxy"),
        )
        .collect()
    )
    m2 = np.zeros((d, d))
    for r in moments:
        m2[r.i, r.j] = m2[r.j, r.i] = r.sxy / n
    cov = m2 - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :PCA_K].T  # rows = components, descending variance
    # deterministic sign: make each component's largest-|.| coordinate positive
    for k in range(PCA_K):
        j = int(np.abs(comps[k]).argmax())
        if comps[k, j] < 0:
            comps[k] = -comps[k]
    return mu, comps


def embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PCA_K} PCA projection of every embedding — the dimensionality
    reduction an embedding pipeline runs before clustering / visualization
    / cheap prefilters (and the whitening step SemDeDup-style pipelines
    apply). Fit is one distributed moment pass + a driver-side eigh on
    the d×d covariance (model state, like IVF centroids); projection is
    map-only with the mean and components as plan literals (a JVM
    zip_with/aggregate fold per component — vectors never leave the JVM).
    No SQL oracle (eigendecomposition); model-checked against numpy's
    full-data PCA in tests/test_similarity.py, sign-canonicalized.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    corpus = emb.repartition(spark.sparkContext.defaultParallelism)
    mu, comps = _fit_pca(corpus, "embedding")
    projections = []
    for k in range(PCA_K):
        mu_arr = "array(" + ", ".join(repr(float(v)) for v in mu) + ")"
        v_arr = "array(" + ", ".join(repr(float(v)) for v in comps[k]) + ")"
        projections.append(
            F.expr(
                "aggregate(zip_with(zip_with(embedding, "
                f"{mu_arr}, (x, m) -> cast(x as double) - m), {v_arr},"
                " (c, v) -> c * v), cast(0.0 as double), (acc, t) -> acc + t)"
            ).alias(f"pc{k + 1}")
        )
    return corpus.select(
        "vec_id",
        "label",
        *[F.round(p, 6).alias(f"pc{k + 1}") for k, p in enumerate(projections)],
    ).orderBy("vec_id")


def pca_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D56's driver-checkable companion: the upper-triangle covariance
    entries `_fit_pca` eigendecomposes, as a frame. The eigh itself is
    not SQL-expressible (embedding_pca stays model-checked), but the
    moment PASSES — the d-group mean and the d²/2-group second-moment
    aggregations, the part that actually touches 100 TB — are plain
    distributed sums, so a green row here certifies the whole data side
    of the fit. cov = sxy/n − (sx_i/n)(sx_j/n), the identical expression
    both engines, round6'd: the sums are order-sensitive doubles whose
    cross-engine drift (~1e-16 relative) sits ~10 orders below the 1e-6
    step (the embedding_stats avg_norm precedent)."""
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    corpus = emb.repartition(spark.sparkContext.defaultParallelism)
    mu = (
        corpus.select(F.posexplode("embedding").alias("i", "xi"))
        .groupBy("i")
        .agg(
            F.sum(F.col("xi").cast("double")).alias("sx"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    mom = (
        corpus.select(F.posexplode("embedding").alias("i", "xi"), F.col("embedding"))
        .select("i", "xi", F.posexplode("embedding").alias("j", "xj"))
        .where(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("xi").cast("double") * F.col("xj").cast("double")).alias("sxy"))
    )
    mi = mu.select(F.col("i").alias("_i"), F.col("sx").alias("sxi"), "n")
    mj = mu.select(F.col("i").alias("_j"), F.col("sx").alias("sxj"))
    return (
        mom.join(mi, mom["i"] == mi["_i"])
        .join(mj, mom["j"] == mj["_j"])
        .select(
            "i",
            "j",
            round6(
                F.col("sxy") / F.col("n")
                - (F.col("sxi") / F.col("n")) * (F.col("sxj") / F.col("n"))
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def _pca_moments_sql() -> str:
    cov = "m.sxy / mi.n - (mi.sx / mi.n) * (mj.sx / mj.n)"
    return f"""
WITH xe AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         cast(unnest(embedding) AS double) AS v
  FROM embeddings
),
mu AS (SELECT i, sum(v) AS sx, count(*) AS n FROM xe GROUP BY i),
mom AS (
  SELECT a.i AS i, b.i AS j, sum(a.v * b.v) AS sxy
  FROM xe a JOIN xe b ON a.vec_id = b.vec_id AND b.i >= a.i
  GROUP BY a.i, b.i
)
SELECT m.i, m.j, {round6_sql(cov)} AS cov
FROM mom m JOIN mu mi ON m.i = mi.i JOIN mu mj ON m.j = mj.i
ORDER BY m.i, m.j
"""


# --- D63: corpus topic profile via k-means clustering -------------------------

#: minimum cluster count for tiny corpora
CLUSTER_K_MIN = 4


def cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus topic profile for data-mixing curation: k-means-cluster the
    embedding space and report, per cluster, its size, dominant label, and
    label purity — the table a pipeline reads to rebalance topic mix or
    spot mode collapse before training (the clustering stage of
    cluster-balanced selection, cf. SemDeDup's blocking reused here).

    Scale shape: k is DERIVED from corpus size (n / SEM_TARGET_CLUSTER_ROWS,
    floored at {CLUSTER_K_MIN}) so expected cluster membership stays
    constant as the corpus grows; centroids fit on the bounded hash-ordered
    sample (`_train_centroids_sampled`, production-quantizer form — ONE
    bounded collect, model state O(k·dim)); full-corpus assignment is a
    distributed Arrow-batch matmul; the profile is one two-level
    map-side-combinable aggregation. Oracle-checked as of r10 (the
    unrolled-Lloyd SQL, `_lloyd_ctes`, with k derived from corpus size
    in-query); the independent numpy model check in
    tests/test_similarity.py remains.

    Dominant-label ties are impossible by construction: max_by orders on
    (count, label), distinct per row within a cluster."""
    import math

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    n = emb.count()
    k = max(CLUSTER_K_MIN, math.ceil(n / SEM_TARGET_CLUSTER_ROWS))
    centroids = _train_centroids_sampled(emb, "vec_id", "embedding", nlist=k)
    assigned = _assign_cluster(
        emb.repartition(spark.sparkContext.defaultParallelism),
        "embedding",
        centroids,
    )
    per_label = assigned.groupBy("cluster", "label").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_label.groupBy("cluster").agg(
        F.sum("cnt").alias("n_members"),
        F.count(F.lit(1)).alias("n_labels"),
        F.max_by("label", F.struct("cnt", "label")).alias("dominant_label"),
        F.max("cnt").alias("dominant_count"),
    ).select(
        F.col("cluster").cast("bigint").alias("cluster"),
        "n_members", "n_labels", "dominant_label", "dominant_count",
    )


# --- unrolled-Lloyd SQL oracles for the k-means family ------------------------

def _assign_sql(src: str, ct: str, *, top: int = 1) -> str:
    """Top-``top`` nearest-centroid assignment of `src`(nid, e) against
    `ct`(c, cl) — THE cosine-argmax rank block (SQL twin of
    `_assign_cluster`, lowest-c tie). One definition for the Lloyd
    iterations, final assignments, probe-cell selection, and multi-probe
    blocking, so a tie-break or guard change can never drift per-site
    (r10 review)."""
    return f"""(
  SELECT nid, c FROM (
    SELECT x.nid, ct.c,
           row_number() OVER (PARTITION BY x.nid
                              ORDER BY {cosine_sql('x.e', 'ct.cl')} DESC, ct.c) AS rk
    FROM {src} x CROSS JOIN {ct} ct
  ) WHERE rk <= {top}
)"""


def _lloyd_ctes(src: str, iters: int, k_expr) -> str:
    """k-means fit over `src`(nid, e) as chained DuckDB CTEs -> ct{iters}.

    The Spark fits (`_train_centroids`, `_train_centroids_sampled`) are
    driver-iterative, but the round count is a fixed constant — so, like
    the BPE trainer (vocab._bpe_iter_ctes), the loop UNROLLS into SQL:
    seeds = first k rows of src in md5(nid) order (the hash-seeded init
    rule), then per round a cosine-argmax assignment (row_number with the
    numpy lowest-index tie-break) and a per-cluster component mean, with
    empty clusters keeping their prior centroid (the coalesce LEFT JOIN).
    Centroid VALUES are order-sensitive double means and differ across
    engines in the last ULPs — but every emitted quantity downstream is an
    integer, a label, or a rerank over an integer-keyed candidate set, so
    only the argmax DECISIONS must agree, and an argmax flip needs two
    cosines within ~1e-14 of each other (the accepted-risk class already
    carried by ann_lsh_buckets' sign bits, green since r9). `k_expr` may
    be a literal or a scalar subquery, so k can derive from corpus size
    in-query (cluster_profile's scale-free k)."""
    out = [f"""
seeds AS MATERIALIZED (
  SELECT nid, e, row_number() OVER (ORDER BY md5(cast(nid AS varchar))) - 1 AS c
  FROM {src} QUALIFY c < {k_expr}
),
xe AS MATERIALIZED (
  SELECT nid, generate_subscripts(e, 1) - 1 AS pos, cast(unnest(e) AS double) AS v
  FROM {src}
),
ct0 AS MATERIALIZED (
  SELECT c, list(cast(v AS double) ORDER BY pos) AS cl
  FROM (SELECT c, generate_subscripts(e, 1) - 1 AS pos, unnest(e) AS v FROM seeds)
  GROUP BY c
)"""]
    for k in range(1, iters + 1):
        out.append(f"""
a{k} AS MATERIALIZED (
  SELECT * FROM {_assign_sql(src, f'ct{k - 1}')}
),
mn{k} AS MATERIALIZED (
  SELECT a.c, xe.pos, avg(xe.v) AS m
  FROM a{k} a JOIN xe ON a.nid = xe.nid
  GROUP BY a.c, xe.pos
),
ct{k} AS MATERIALIZED (
  SELECT prev.c, coalesce(nw.cl, prev.cl) AS cl
  FROM ct{k - 1} prev
  LEFT JOIN (SELECT c, list(m ORDER BY pos) AS cl FROM mn{k} GROUP BY c) nw
    ON prev.c = nw.c
)""")
    return ",".join(out)


def _ann_ivf_sql() -> str:
    cos = cosine_sql("p.pe", "x.e")
    return f"""
WITH corpus AS MATERIALIZED (
  SELECT vec_id AS nid, embedding AS e FROM embeddings WHERE vec_id >= {N_PROBES}
),{_lloyd_ctes('corpus', IVF_ITERS, IVF_CLUSTERS)},
final_assign AS MATERIALIZED (
  SELECT * FROM {_assign_sql('corpus', f'ct{IVF_ITERS}')}
),
probes AS MATERIALIZED (
  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < {N_PROBES}
),
pv AS (SELECT probe_id AS nid, pe AS e FROM probes),
probe_cells AS (
  SELECT nid AS probe_id, c
  FROM {_assign_sql('pv', f'ct{IVF_ITERS}', top=IVF_NPROBE)}
),
cands AS (
  SELECT pc.probe_id, fa.nid FROM probe_cells pc JOIN final_assign fa ON pc.c = fa.c
),
scored AS (
  SELECT cd.probe_id, cd.nid AS neighbor_id, {cos} AS cos_raw
  FROM cands cd
  JOIN probes p ON cd.probe_id = p.probe_id
  JOIN corpus x ON cd.nid = x.nid
)
SELECT probe_id, rank, neighbor_id,
       {round4_sql('cos_raw')} AS cos_sim
FROM (
  SELECT probe_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def _sumsq_sql(expr: str) -> str:
    """Sum of squares of a list — the PQ n2 key. Deliberately NOT
    norm_sql(x)**2: sqrt-then-square costs two folds and drifts up to a
    ULP from the Spark fit's direct (cb**2).sum(-1) (r10 review)."""
    return ("list_aggregate(list_transform(" + expr +
            ", x -> cast(x as double) * cast(x as double)), 'sum')")


def _ann_pq_sql() -> str:
    """ann_pq end-to-end as SQL: the per-subspace k-means codebooks unroll
    exactly like `_lloyd_ctes` (fixed {PQ_ITERS} rounds, L2 argmin via the
    cn2 - 2·dot matmul form the Spark fit uses, empty cells keep their
    codeword), with the subspace index as a RELATIONAL dimension so all
    {PQ_M} books train in one CTE chain; then encode (same argmin against
    the final books), the ADC score re-assembled from the (probe, m, k)
    LUT join, top-{PQ_CAND} per probe, and the exact fold-cosine rerank.
    Every output value is an integer id or the round4 rerank cosine, so
    cross-engine ULP noise only matters through argmin/rank near-ties
    (the accepted class — see _lloyd_ctes)."""
    from frolyk_spark.functions.vectors import dot_sql, norm_sql

    sub = DIM // PQ_M
    dot_sv_cl = dot_sql("sx.sv", "cb.cl")
    iters = []
    for i in range(1, PQ_ITERS + 1):
        p = i - 1
        iters.append(f"""
a{i} AS MATERIALIZED (
  SELECT nid, m, k FROM (
    SELECT sx.nid, sx.m, cb.k,
           row_number() OVER (PARTITION BY sx.nid, sx.m
                              ORDER BY cb.n2 - 2.0 * {dot_sv_cl} ASC, cb.k) AS rk
    FROM sx CROSS JOIN cb{p} cb
    WHERE sx.m = cb.m
  ) WHERE rk = 1
),
mn{i} AS MATERIALIZED (
  SELECT a.m, a.k, sxe.pos, avg(sxe.v) AS c
  FROM a{i} a JOIN sxe ON a.nid = sxe.nid AND a.m = sxe.m
  GROUP BY a.m, a.k, sxe.pos
),
cb{i} AS MATERIALIZED (
  SELECT prev.m, prev.k, coalesce(nw.cl, prev.cl) AS cl,
         coalesce(nw.n2, prev.n2) AS n2
  FROM cb{p} prev
  LEFT JOIN (
    SELECT m, k, cl, {_sumsq_sql('cl')} AS n2
    FROM (SELECT m, k, list(c ORDER BY pos) AS cl FROM mn{i} GROUP BY m, k)
  ) nw ON prev.m = nw.m AND prev.k = nw.k
)""")
    iter_sql = ",".join(iters)
    cb_final = f"cb{PQ_ITERS}"
    dot_cx_cl = dot_sql("cx.sv", "cb.cl")
    dot_pv_cl = dot_sql("px.pv", "cb.cl")
    return f"""
WITH corpus AS MATERIALIZED (
  SELECT vec_id AS nid, embedding AS e FROM embeddings WHERE vec_id >= {N_PROBES}
),
samp AS MATERIALIZED (
  SELECT nid, e FROM (
    SELECT nid, e, row_number() OVER (ORDER BY md5(cast(nid AS varchar))) AS rn
    FROM corpus
  ) WHERE rn <= {PQ_SAMPLE}
),
ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
sx AS MATERIALIZED (
  SELECT samp.nid, ms.m,
         list_transform(e[ms.m * {sub} + 1 : ms.m * {sub} + {sub}],
                        x -> cast(x AS double)) AS sv
  FROM samp CROSS JOIN ms
),
sxe AS MATERIALIZED (
  SELECT nid, m, generate_subscripts(sv, 1) AS pos, unnest(sv) AS v FROM sx
),
cb0 AS MATERIALIZED (
  SELECT m, k, sv AS cl, {_sumsq_sql('sv')} AS n2
  FROM (
    SELECT sx.m, sx.sv,
           row_number() OVER (PARTITION BY sx.m ORDER BY srn.rn) - 1 AS k
    FROM sx JOIN (
      SELECT nid, row_number() OVER (ORDER BY md5(cast(nid AS varchar))) AS rn
      FROM samp
    ) srn ON sx.nid = srn.nid
  ) WHERE k < {PQ_K}
),{iter_sql},
cx AS MATERIALIZED (
  SELECT corpus.nid, ms.m,
         list_transform(e[ms.m * {sub} + 1 : ms.m * {sub} + {sub}],
                        x -> cast(x AS double)) AS sv
  FROM corpus CROSS JOIN ms
),
codes AS MATERIALIZED (
  SELECT nid, m, k FROM (
    SELECT cx.nid, cx.m, cb.k,
           row_number() OVER (PARTITION BY cx.nid, cx.m
                              ORDER BY cb.n2 - 2.0 * {dot_cx_cl} ASC, cb.k) AS rk
    FROM cx CROSS JOIN {cb_final} cb
    WHERE cx.m = cb.m
  ) WHERE rk = 1
),
probes AS MATERIALIZED (
  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < {N_PROBES}
),
px AS MATERIALIZED (
  SELECT probe_id, ms.m,
         list_transform(pe[ms.m * {sub} + 1 : ms.m * {sub} + {sub}],
                        x -> cast(x AS double)) AS pv
  FROM probes CROSS JOIN ms
),
lut AS MATERIALIZED (
  SELECT px.probe_id, cb.m, cb.k, {dot_pv_cl} AS d, cb.n2
  FROM px JOIN {cb_final} cb ON px.m = cb.m
),
qn AS (SELECT probe_id, greatest({norm_sql('pe')}, 1e-12) AS qnorm FROM probes),
adc AS MATERIALIZED (
  SELECT l.probe_id, c.nid, sum(l.d) AS adot, sum(l.n2) AS norm2
  FROM codes c JOIN lut l ON c.m = l.m AND c.k = l.k
  GROUP BY l.probe_id, c.nid
),
cand AS (
  SELECT probe_id, nid FROM (
    SELECT adc.probe_id, adc.nid,
           row_number() OVER (
             PARTITION BY adc.probe_id
             ORDER BY adc.adot / (qn.qnorm * sqrt(greatest(adc.norm2, 1e-12))) DESC,
                      adc.nid ASC) AS rk
    FROM adc JOIN qn ON adc.probe_id = qn.probe_id
  ) WHERE rk <= {PQ_CAND}
),
scored AS (
  SELECT cd.probe_id, cd.nid AS neighbor_id,
         {cosine_sql('p.pe', 'x.e')} AS cos_raw
  FROM cand cd
  JOIN probes p ON cd.probe_id = p.probe_id
  JOIN corpus x ON cd.nid = x.nid
)
SELECT probe_id, rank, neighbor_id,
       {round4_sql('cos_raw')} AS cos_sim
FROM (
  SELECT probe_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def _semantic_dedup_sql() -> str:
    """semantic_dedup end-to-end as SQL: the sampled Lloyd fit is
    `_lloyd_ctes` with the scale-free nlist derived in-query
    (_semantic_nlist's formula), blocking is the top-{SEM_PROBE} cluster
    rank per vector, candidates are the within-cluster id pairs (DISTINCT
    across shared clusters), and verification is the exact fold cosine
    with the {SEM_TAU} threshold + per-vec_b keeper pick. The Spark path
    verifies via per-cluster numpy matmuls on normalized vectors and
    max()es ULP-variant duplicates; the fold-on-raw-vectors value here
    differs only in last ULPs, which reaches the output solely through
    the round4 display value and near-tie keeper ranks (the accepted
    class — see _lloyd_ctes)."""
    cos_ab = cosine_sql("xa.e", "xb.e")
    return f"""
WITH allv AS MATERIALIZED (
  SELECT vec_id AS nid, embedding AS e FROM embeddings
),
kk AS (SELECT greatest({IVF_CLUSTERS},
                       cast(ceil({SEM_PROBE} * count(*) / {SEM_TARGET_CLUSTER_ROWS}.0)
                            AS bigint)) AS k
       FROM allv),
samp AS MATERIALIZED (
  SELECT nid, e FROM (
    SELECT nid, e, row_number() OVER (ORDER BY md5(cast(nid AS varchar))) AS rn
    FROM allv
  ) WHERE rn <= (SELECT greatest({SEM_TRAIN_SAMPLE}, 4 * k) FROM kk)
),{_lloyd_ctes('samp', SEM_ITERS, '(SELECT k FROM kk)')},
mem AS MATERIALIZED (
  SELECT * FROM {_assign_sql('allv', f'ct{SEM_ITERS}', top=SEM_PROBE)}
),
cand AS MATERIALIZED (
  SELECT DISTINCT m1.nid AS a, m2.nid AS b
  FROM mem m1 JOIN mem m2 ON m1.c = m2.c AND m1.nid < m2.nid
),
verified AS MATERIALIZED (
  SELECT cd.a, cd.b, {cos_ab} AS cos_raw
  FROM cand cd
  JOIN allv xa ON cd.a = xa.nid
  JOIN allv xb ON cd.b = xb.nid
  WHERE {cos_ab} >= {SEM_TAU}
)
SELECT b AS vec_id, a AS kept_by,
       {round4_sql('cos_raw')} AS cos_sim
FROM (
  SELECT a, b, cos_raw,
         row_number() OVER (PARTITION BY b ORDER BY cos_raw DESC, a ASC) AS rk
  FROM verified
) WHERE rk = 1
"""


def _cluster_profile_sql() -> str:
    return f"""
WITH allv AS MATERIALIZED (
  SELECT vec_id AS nid, embedding AS e, label FROM embeddings
),
kk AS (SELECT greatest({CLUSTER_K_MIN},
                       cast(ceil(count(*) / {SEM_TARGET_CLUSTER_ROWS}.0) AS bigint)) AS k
       FROM allv),
samp AS MATERIALIZED (
  SELECT nid, e FROM (
    SELECT nid, e, row_number() OVER (ORDER BY md5(cast(nid AS varchar))) AS rn
    FROM allv
  ) WHERE rn <= (SELECT greatest({SEM_TRAIN_SAMPLE}, 4 * k) FROM kk)
),{_lloyd_ctes('samp', SEM_ITERS, '(SELECT k FROM kk)')},
fa AS MATERIALIZED (
  SELECT * FROM {_assign_sql('allv', f'ct{SEM_ITERS}')}
),
pl AS MATERIALIZED (
  SELECT fa.c, allv.label, cast(count(*) AS bigint) AS cnt
  FROM fa JOIN allv ON fa.nid = allv.nid
  GROUP BY fa.c, allv.label
),
agg AS (
  SELECT c, cast(sum(cnt) AS bigint) AS n_members,
         cast(count(*) AS bigint) AS n_labels,
         cast(max(cnt) AS bigint) AS dominant_count
  FROM pl GROUP BY c
),
dom AS (
  SELECT c, label AS dominant_label FROM (
    SELECT c, label,
           row_number() OVER (PARTITION BY c ORDER BY cnt DESC, label DESC) AS rn
    FROM pl
  ) WHERE rn = 1
)
SELECT cast(agg.c AS bigint) AS cluster, agg.n_members, agg.n_labels,
       dom.dominant_label, agg.dominant_count
FROM agg JOIN dom ON agg.c = dom.c
"""


# --- D88: ANN recall audit (approximate top-k vs brute-force truth) ----------


def ann_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion audit of every approximate index against the exact
    brute-force truth (D88) — the dedup_eval/lsh_band_sweep closure for
    the SIMILARITY family (r13 verdict graded D85 as the dedup tuning
    loop's anchor; the ANN side had per-method recall floors buried in
    pytest but no first-class operator an engineer can run on THEIR
    corpus before picking an index). One row per method (lsh / ivf / pq):
    its returned top-{TOP_K} pair count, the truth count, and exact
    BIGINT tp/fp/fn — recall@k = tp/n_true, read off the table; counts
    stay un-divided (no-ratios rule).

    Shape: truth = D10's broadcast-probe brute force; each method's pairs
    come from its own blocked/quantized pipeline (never all-pairs); the
    classify join is pair-keyed on (probe_id, neighbor_id) over
    {N_PROBES}x{TOP_K}-row frames. The truth frame feeds all three
    classify joins plus the n_true aggregate — lineage-cut. Identities
    tp+fp == n_pairs and tp+fn == n_true hold by construction
    (property-tested in tests/test_similarity.py).
    """
    from frolyk_spark.functions.lineage import cut_lineage

    # Shared query-side inputs (r16, verdict item 3): the four method
    # pipelines each used to re-derive the corpus projection (parquet
    # scan + repartition exchange per consumer — 16 scans in the executed
    # plan) and THREE of them re-collected the probe set. One lineage-cut
    # corpus and one probe collect now feed every pipeline; the cut is
    # the audit operator's own trade (4+ full passes over one bounded
    # projection), not a helper default — standalone ann_lsh/ann_pq keep
    # their bare-scan shape.
    probes, corpus_raw = _split(spark, sf_dir)
    corpus = cut_lineage(corpus_raw)
    probe_rows = probes.collect()
    # rebuild the probe frame from the collected rows (exact double
    # round-trip): every method broadcast-joins it, and a local frame
    # plans as LocalTableScan instead of one embeddings scan per method
    probes = spark.createDataFrame(probe_rows, probes.schema)

    truth = cut_lineage(
        _bruteforce_from(probes, corpus).select(
            "probe_id", "neighbor_id", F.lit(1).alias("is_true")
        )
    )
    methods = (
        ("ivf", lambda: _ivf_from(spark, sf_dir, probes, probe_rows)),
        ("lsh", lambda: _lsh_from(spark, probes, probe_rows, corpus)),
        ("pq", lambda: _pq_from(spark, sf_dir, probes, probe_rows, corpus)),
    )
    out = None
    for name, fn in methods:
        agg = (
            fn()
            .select("probe_id", "neighbor_id")
            .join(truth, ["probe_id", "neighbor_id"], "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                F.coalesce(F.sum("is_true"), F.lit(0)).cast("bigint").alias(
                    "tp"
                ),
            )
            .select(F.lit(name).alias("method"), "n_pairs", "tp")
        )
        out = agg if out is None else out.unionAll(agg)
    n_true1 = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
    return (
        out.crossJoin(F.broadcast(n_true1))
        .select(
            "method",
            "n_pairs",
            "n_true",
            "tp",
            (F.col("n_pairs") - F.col("tp")).cast("bigint").alias("fp"),
            (F.col("n_true") - F.col("tp")).cast("bigint").alias("fn"),
        )
        .orderBy("method")
    )


def _ann_eval_sql() -> str:
    """Each method's FULL oracle pipeline nested as a subquery CTE (their
    WITH chains scope per-subquery), classified against the brute-force
    CTE with marker columns."""
    method_sqls = (
        ("ivf", _ann_ivf_sql()),
        ("lsh", _ann_lsh_sql()),
        ("pq", _ann_pq_sql()),
    )
    arms = "\nUNION ALL\n".join(
        f"""
SELECT '{name}' AS method,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(coalesce(sum(bf.is_true), 0) AS BIGINT) AS tp
FROM m_{name} m LEFT JOIN bf
  ON bf.probe_id = m.probe_id AND bf.neighbor_id = m.neighbor_id"""
        for name, _ in method_sqls
    )
    method_ctes = ",".join(
        f"""
m_{name} AS MATERIALIZED (
  SELECT probe_id, neighbor_id FROM ({sql}) q_{name}
)"""
        for name, sql in method_sqls
    )
    return f"""
WITH bf AS MATERIALIZED (
  SELECT probe_id, neighbor_id, 1 AS is_true
  FROM ({_ann_bruteforce_sql()}) q_bf
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM bf),{method_ctes}
SELECT u.method, u.n_pairs, nt.n_true, u.tp,
       CAST(u.n_pairs - u.tp AS BIGINT) AS fp,
       CAST(nt.n_true - u.tp AS BIGINT) AS fn
FROM (
{arms}
) u CROSS JOIN nt
ORDER BY method
"""


QUERIES = {
    "ann_bruteforce": ann_bruteforce,
    # D88: per-method recall audit vs the D10 truth (tuning-loop closure)
    "ann_eval": ann_eval,
    # no-oracle: eigendecomposition; numpy model check in test_similarity
    "embedding_pca": embedding_pca,
    # D56's deterministic companion row (covariance moments, oracle-checked)
    "pca_moments": pca_moments,
    # oracle-checked as of r10 (shared bucket-geometry block + rerank)
    "ann_lsh": ann_lsh,
    # D11's bucket-occupancy companion row (oracle-checked since r9)
    "ann_lsh_buckets": ann_lsh_buckets,
    "ann_ivf": ann_ivf,
    "ann_pq": ann_pq,
    "embedding_stats": embedding_stats,
    "embedding_quantize": embedding_quantize,
    # oracle-checked as of r10 (unrolled-Lloyd SQL); also precision/
    # recall-gated in tests/test_similarity.py vs the exact numpy pair set
    "semantic_dedup": semantic_dedup,
    # oracle-checked as of r10 via the unrolled-Lloyd SQL (_lloyd_ctes);
    # the exact numpy model check in tests/test_similarity.py remains
    "cluster_profile": cluster_profile,
}

# the whole ANN family is oracle-checked as of r10: ann_lsh via the shared
# bucket-geometry block + fold rerank, ann_ivf/ann_pq/cluster_profile/
# semantic_dedup via the unrolled fixed-round fits.
ORACLES = {
    "ann_bruteforce": _ann_bruteforce_sql(),
    "ann_eval": _ann_eval_sql(),
    "ann_lsh": _ann_lsh_sql(),
    "ann_lsh_buckets": _ann_lsh_buckets_sql(),
    "pca_moments": _pca_moments_sql(),
    "ann_ivf": _ann_ivf_sql(),
    "ann_pq": _ann_pq_sql(),
    "semantic_dedup": _semantic_dedup_sql(),
    "cluster_profile": _cluster_profile_sql(),
    "embedding_stats": _embedding_stats_sql(),
    "embedding_quantize": _embedding_quantize_sql(),
}
