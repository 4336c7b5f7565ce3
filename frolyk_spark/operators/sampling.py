"""Deterministic sampling / split assignment (SURVEY §2 D18-D19).

Training pipelines need samples and train/val/test splits that are
reproducible across reruns, engines, and data relayouts. RNG-based
`sample()`/`sampleBy()` can't promise that (seeds bind to partitioning),
so both operators here derive membership from the portable 60-bit md5 of
the stable document id: pure map-side predicates, no shuffle, identical
answers in Spark and DuckDB — which also makes them oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frolyk_spark.functions.hashing import portable_hash_expr, portable_hash_sql
from frolyk_spark.sources.catalog import load_table

#: per-language sampling percentages (strata -> percent kept)
STRATA_PCT = {"en": 50, "de": 20, "fr": 20, "es": 10, "zh": 10}
#: train/val/test split percentages
SPLIT_TRAIN, SPLIT_VAL = 80, 10  # test = remainder


def _bucket(col) -> F.Column:
    """Stable 0-99 bucket from the document id."""
    return F.pmod(portable_hash_expr(col), F.lit(100))


def _bucket_sql(expr: str) -> str:
    return f"({portable_hash_sql(expr)}) % 100"


# --- D18: stratified sample ---------------------------------------------------

def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep a per-language percentage of documents, deterministically:
    doc is kept iff hash-bucket(doc_id) < pct(lang). Re-running, adding
    columns, or repartitioning never changes membership."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    bucket = _bucket(F.col("doc_id").cast("string"))
    pct = F.lit(None).cast("int")
    for lang, p in sorted(STRATA_PCT.items(), reverse=True):
        pct = F.when(F.col("lang") == lang, F.lit(p)).otherwise(pct)
    return (
        docs.withColumn("bucket", bucket)
        .where(F.col("bucket") < F.coalesce(pct, F.lit(0)))
        .select("doc_id", "lang", "bucket")
    )


def _sample_stratified_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {p}" for lang, p in sorted(STRATA_PCT.items())
    )
    b = _bucket_sql("cast(doc_id as varchar)")
    return f"""
SELECT doc_id, lang, {b} AS bucket
FROM documents
WHERE {b} < coalesce(CASE {cases} END, 0)
"""


# --- D19: train/val/test split ------------------------------------------------

def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to train/val/test by stable hash bucket
    ({SPLIT_TRAIN}/{SPLIT_VAL}/remainder percent). The assignment is a
    pure function of doc_id — new data lands in splits without moving any
    existing document."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    bucket = _bucket(F.col("doc_id").cast("string"))
    split = (
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket < SPLIT_TRAIN + SPLIT_VAL, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", split.alias("split"))


def _train_test_split_sql() -> str:
    b = _bucket_sql("cast(doc_id as varchar)")
    return f"""
SELECT doc_id,
       CASE WHEN {b} < {SPLIT_TRAIN} THEN 'train'
            WHEN {b} < {SPLIT_TRAIN + SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# --- D44: exact-k per-group sample -------------------------------------------

#: documents kept per source
SAMPLE_K = 5


def sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly {SAMPLE_K} documents per source, deterministically — the
    reservoir-sample shape without RNG: rank documents within each
    source by the portable hash of doc_id (a stable uniform-ish order)
    and keep the first {SAMPLE_K}. Fraction-based sampling (D18) can't
    promise exact counts per group; this can, and membership still
    survives reruns, engines, and relayouts.

    Scale shape: one window rank per source partition (partition count =
    source count; rows-per-source is the per-group data, the same bound
    any per-group top-K has — Spark runs it as a partial top-K-per-
    partition before the exchange via WindowGroupLimit). doc_id breaks
    hash ties so boundary membership is total-ordered.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    from pyspark.sql import Window

    h = portable_hash_expr(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= SAMPLE_K)
        .select("source", "rk", "doc_id")
    )


def _sample_per_source_sql() -> str:
    h = portable_hash_sql("cast(doc_id as varchar)")
    return f"""
SELECT source, rk, doc_id
FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY {h} ASC, doc_id ASC) AS rk
  FROM documents
)
WHERE rk <= {SAMPLE_K}
"""


# --- D67: deterministic per-epoch shuffle + shard assignment ------------------

#: training shards per epoch (on a cluster: O(corpus / target-shard-bytes))
N_SHARDS = 8
#: epochs materialized side by side (real runs produce one epoch at a time)
N_EPOCHS = 2


def epoch_shuffle_frame(docs: DataFrame) -> DataFrame:
    """Deterministic global training-data shuffle of a (doc_id, ...)
    frame (E5 frame form — composes with any source or a pipeline
    stage's output): every (epoch, doc) gets a pseudo-random sort key
    from the portable hash of ``epoch:doc_id``, the key's low bits pick
    the output shard, and the within-shard position is the rank of the
    key inside that shard. Different epochs therefore see genuinely
    different document orders, yet the whole layout is a pure function
    of (epoch, doc_id) — reproducible across reruns, engines, and data
    relayouts, with no RNG and no driver state.

    Scale shape: no global sort. The only shuffle is the hash partition
    into (epoch, shard) groups, and the per-shard rank is the same sort a
    training-shard writer (E8) performs while laying out the file anyway.
    Shard count is the operator's parallelism knob: at 100 TB you set
    N_SHARDS to corpus-bytes / target-shard-bytes and each window
    partition stays at target-shard size by construction.
    """
    docs = docs.select("doc_id")
    epochs = F.explode(F.array(*[F.lit(e) for e in range(N_EPOCHS)]))
    keyed = docs.select(F.col("doc_id"), epochs.alias("epoch"))
    ord_ = portable_hash_expr(
        F.concat(F.col("epoch").cast("string"), F.lit(":"),
                 F.col("doc_id").cast("string"))
    )
    keyed = keyed.withColumn("ord", ord_)
    shard = F.pmod(F.col("ord"), F.lit(N_SHARDS)).cast("int")
    from pyspark.sql import Window

    w = Window.partitionBy("epoch", "shard").orderBy(
        F.col("ord").asc(), F.col("doc_id").asc()
    )
    return (
        keyed.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("epoch", "shard", "pos", "doc_id")
    )


def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return epoch_shuffle_frame(load_table(spark, sf_dir, "documents"))


def _epoch_shuffle_sql() -> str:
    h = portable_hash_sql("concat(cast(epoch as varchar), ':', cast(doc_id as varchar))")
    epochs = ", ".join(f"({e})" for e in range(N_EPOCHS))
    return f"""
WITH keyed AS (
  SELECT d.doc_id, e.epoch, {h} AS ord
  FROM documents d CROSS JOIN (VALUES {epochs}) AS e(epoch)
)
SELECT epoch, cast(ord % {N_SHARDS} as int) AS shard,
       row_number() OVER (PARTITION BY epoch, ord % {N_SHARDS}
                          ORDER BY ord ASC, doc_id ASC) AS pos,
       doc_id
FROM keyed
"""


# --- D68: curriculum mix by quality tier --------------------------------------

#: keep-percentage per length-quality bin (bin 0 = shortest docs)
CURRICULUM_PCT = (10, 30, 60, 90)


def _curriculum_binned(docs: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *extra, wc, bin) — the shared tier-binning stage of D68/D69:
    word counts compared against scale-free multiples of the corpus mean
    via exact integer cross-multiplication (see curriculum_mix_frame for
    the full cross-engine rationale). The word-count frame is lineage-cut
    so the stats aggregate and the main pass share ONE scan."""
    from frolyk_spark.functions.lineage import cut_lineage

    pre = cut_lineage(
        docs.select(
            "doc_id",
            *extra,
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("wc"),
        )
    )
    stats = pre.agg(F.count(F.lit(1)).alias("n"), F.sum("wc").alias("s"))
    wc, n, s = F.col("wc"), F.col("n"), F.col("s")
    bin_ = (
        F.when(F.lit(2) * wc * n < s, 0)
        .when(wc * n < s, 1)
        .when(wc * n < F.lit(2) * s, 2)
        .otherwise(3)
        .cast("int")
    )
    return (
        pre.crossJoin(F.broadcast(stats))
        .withColumn("bin", bin_)
        .drop("n", "s")
    )


#: the shared tier-binning CTEs of the D68/D69 oracles (mirrors
#: _curriculum_binned; {cols} = extra passthrough columns, with trailing comma)
_CURRICULUM_BINNED_SQL = """
WITH pre AS (
  SELECT doc_id, {cols} cast(len(string_split(text, ' ')) as bigint) AS wc
  FROM documents
), st AS (
  SELECT cast(count(*) as bigint) AS n, cast(sum(wc) as bigint) AS s FROM pre
), binned AS (
  SELECT doc_id, {cols} wc,
         CASE WHEN 2 * wc * n < s THEN 0
              WHEN wc * n < s THEN 1
              WHEN wc * n < 2 * s THEN 2
              ELSE 3 END AS bin
  FROM pre CROSS JOIN st
)
"""


def curriculum_mix_frame(docs: DataFrame) -> DataFrame:
    """Quality-tier curriculum sampling report over a (doc_id, text)
    frame (E5 frame form): documents are binned by word count RELATIVE
    TO THE CORPUS MEAN (edges at 0.5x / 1x / 2x mean — scale-free by
    construction, the bins mean the same thing at sf0.01 and at 100 TB),
    then each bin keeps a deterministic hash-bucket percentage that
    rises with the tier ({CURRICULUM_PCT}). Output is the per-bin mix
    report (docs seen / kept, words kept) a mixing stage feeds into its
    sampling weights.

    Cross-engine discipline: the bin test is cleared of division —
    ``wc < k * mean`` becomes the exact integer compare
    ``wc * n < k * sum_wc`` (order-free BIGINT sums; products stay far
    inside int64: wc <= 1e4 and n <= 1e11 at 100 TB gives ~1e15 < 2^63).
    Membership is the same portable-hash bucket as D18, salted with
    'cur:' so curriculum membership is independent of the stratified
    sample's. One tiny 1-row aggregate broadcast back over the scan (the
    lineage-cut scalar-crossJoin shape), one map-side-combinable final
    aggregate — two scans, no quantile sort, no driver collect.
    """
    binned = _curriculum_binned(docs)
    pct = F.lit(None).cast("int")
    for b in range(len(CURRICULUM_PCT) - 1, -1, -1):
        pct = F.when(F.col("bin") == b, F.lit(CURRICULUM_PCT[b])).otherwise(pct)
    kept = _bucket(F.concat(F.lit("cur:"), F.col("doc_id").cast("string"))) < pct
    return (
        binned
        .withColumn("kept", kept.cast("int").cast("bigint"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            F.sum(F.col("kept") * F.col("wc")).alias("words_kept"),
        )
        .orderBy("bin")
    )


def curriculum_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curriculum_mix_frame(load_table(spark, sf_dir, "documents"))


def _curriculum_mix_sql() -> str:
    b = _bucket_sql("concat('cur:', cast(doc_id as varchar))")
    cases = " ".join(
        f"WHEN bin = {i} THEN {p}" for i, p in enumerate(CURRICULUM_PCT)
    )
    return _CURRICULUM_BINNED_SQL.format(cols="") + f"""
, flagged AS (
  SELECT bin, wc,
         CASE WHEN {b} < (CASE {cases} END) THEN 1 ELSE 0 END AS kept
  FROM binned
)
SELECT cast(bin as int) AS bin, count(*) AS n_docs,
       cast(sum(kept) as bigint) AS n_kept,
       cast(sum(kept * wc) as bigint) AS words_kept
FROM flagged GROUP BY bin ORDER BY bin
"""


# --- D69: exact per-(tier x source) quota --------------------------------------

#: documents kept per (curriculum tier, source) cell
QUOTA_K = 3


def curriculum_quota_frame(docs: DataFrame) -> DataFrame:
    """Exactly {QUOTA_K} documents per (curriculum tier × source) cell —
    D68's scale-free tier bins composed with D44's deterministic windowed
    exact-k, the joint quota a real mixing stage draws when it balances
    difficulty AND provenance at once (fraction-based sampling can promise
    neither exact cell counts nor rerun stability; this promises both).

    Shares D68's single-scan binning stage (_curriculum_binned — the
    stats broadcast and the main pass read the corpus once), then one
    window rank per (bin, source) cell. Cell count is bounded (4 tiers ×
    |sources|), rows-per-cell is per-group top-K which Spark executes as a
    partial top-K before the exchange (WindowGroupLimit) — the same 100 TB
    shape as sample_per_source. The hash is salted 'quota:' so membership
    is independent of D18/D68 draws."""
    from pyspark.sql import Window

    binned = _curriculum_binned(docs, extra=("source",))
    h = portable_hash_expr(
        F.concat(F.lit("quota:"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("bin", "source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        binned.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= QUOTA_K)
        .select("bin", "source", "rk", "doc_id", "wc")
    )


def curriculum_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curriculum_quota_frame(load_table(spark, sf_dir, "documents"))


def _curriculum_quota_sql() -> str:
    h = portable_hash_sql("concat('quota:', cast(doc_id as varchar))")
    return _CURRICULUM_BINNED_SQL.format(cols="source,") + f"""
SELECT cast(bin as int) AS bin, source, rk, doc_id, wc
FROM (
  SELECT bin, source, doc_id, wc,
         row_number() OVER (PARTITION BY bin, source
                            ORDER BY {h} ASC, doc_id ASC) AS rk
  FROM binned
)
WHERE rk <= {QUOTA_K}
"""


# --- D78: deterministic weighted sampling (bottom-k priorities) -----------------

#: docs kept by the weighted sample
WEIGHTED_K = 200


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, deterministically (D78):
    each document gets priority = hash(doc_id) div weight (weight =
    n_chars — longer docs get proportionally smaller priorities, hence
    proportionally higher inclusion odds), and the sample is the
    bottom-{WEIGHTED_K} priorities — the integer-arithmetic cousin of
    A-ES exponential-jump weighted reservoir sampling (Efraimidis &
    Spirakis use u^(1/w); hash/w keeps the whole compare path in exact
    BIGINTs, trading the precise inclusion distribution for bit-exact
    reproducibility, which is what a replayable pipeline needs).

    Membership is a pure function of (doc_id, weight): re-running,
    repartitioning, or appending other documents never flips a kept doc
    except by genuine displacement. One TakeOrderedAndProject top-K —
    never a global sort; ties broken by doc_id.
    """
    from frolyk_spark.functions.hashing import portable_hash_spark_sql

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = portable_hash_spark_sql("cast(doc_id as string)")
    scored = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("weight"),
        F.expr(f"({h}) div cast(n_chars as bigint)").alias("priority"),
    )
    return (
        scored.orderBy("priority", "doc_id")
        .limit(WEIGHTED_K)
        .select("doc_id", "weight", "priority")
    )


def _sample_weighted_sql() -> str:
    from frolyk_spark.functions.hashing import portable_hash_sql

    h = portable_hash_sql("cast(doc_id as varchar)")
    return f"""
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
       ({h}) // CAST(n_chars AS BIGINT) AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT {WEIGHTED_K}
"""


# --- D77: train/test split leakage audit ---------------------------------------

def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-hygiene audit (D77): does the held-out split leak into train?
    The question every benchmark result depends on, asked of the split
    this repo itself produces (train_test_split's stable hash buckets).
    Two leakage channels, each reported per held-out split (val, test):

      - ``exact``: a val/test document whose full text (portable 60-bit
        hash — never a full-text shuffle key) also appears in train;
      - ``near``: a val/test document linked to ANY train document by a
        minhash band-bucket candidate pair (the same near-dup relation
        dedup_minhash ships) — the channel that catches the perturbed
        copies exact hashing misses.

    Output: (split, channel, n_docs, n_leaked, leaked_id_sum) — all
    integer; a zero-leak row is a PASS certificate, not a degenerate
    result. Scale: the exact channel is one hash groupBy + a broadcast-
    eligible semi join of held-out hashes against train hashes; the near
    channel reads the PERSISTED signature pairs (computed once per
    corpus) and classifies each pair by the split rule — no new corpus
    pass at all.
    """
    from frolyk_spark.functions.hashing import portable_hash_expr
    from frolyk_spark.operators.dedup import (
        band_pairs, persisted_minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bucket = _bucket(F.col("doc_id").cast("string"))
    split = (
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket < SPLIT_TRAIN + SPLIT_VAL, "val")
        .otherwise("test")
    )
    tagged = docs.select(
        "doc_id", split.alias("split"), portable_hash_expr("text").alias("th")
    )
    sizes = (
        tagged.where(F.col("split") != "train")
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    train_th = tagged.where(F.col("split") == "train").select("th").distinct()
    exact_leaked = (
        tagged.where(F.col("split") != "train")
        .join(train_th, "th", "left_semi")
        .select("split", "doc_id")
        .distinct()
    )
    splits_by_id = tagged.select("doc_id", "split")
    pairs = band_pairs(persisted_minhash_signatures(spark, sf_dir))
    sa = splits_by_id.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    sb = splits_by_id.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    tagged_pairs = pairs.join(sa, "doc_a").join(sb, "doc_b")
    near_leaked = (
        tagged_pairs.where(
            (F.col("split_a") == "train") & (F.col("split_b") != "train")
        )
        .select(F.col("split_b").alias("split"), F.col("doc_b").alias("doc_id"))
        .unionByName(
            tagged_pairs.where(
                (F.col("split_b") == "train") & (F.col("split_a") != "train")
            ).select(
                F.col("split_a").alias("split"), F.col("doc_a").alias("doc_id")
            )
        )
        .distinct()
    )

    def _channel(leaked: DataFrame, name: str) -> DataFrame:
        agg = leaked.groupBy("split").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_leaked"),
            F.sum("doc_id").cast("bigint").alias("leaked_id_sum"),
        )
        return sizes.join(agg, "split", "left").select(
            "split",
            F.lit(name).alias("channel"),
            "n_docs",
            F.coalesce("n_leaked", F.lit(0).cast("bigint")).alias("n_leaked"),
            F.coalesce("leaked_id_sum", F.lit(0).cast("bigint")).alias(
                "leaked_id_sum"
            ),
        )

    return _channel(exact_leaked, "exact").unionByName(
        _channel(near_leaked, "near")
    )


def _split_leakage_sql() -> str:
    from frolyk_spark.functions.hashing import portable_hash_sql
    from frolyk_spark.operators.dedup import _dedup_minhash_sql

    b = _bucket_sql("cast(doc_id as varchar)")
    th = portable_hash_sql("text")
    return f"""
WITH tagged AS (
  SELECT doc_id,
         CASE WHEN {b} < {SPLIT_TRAIN} THEN 'train'
              WHEN {b} < {SPLIT_TRAIN + SPLIT_VAL} THEN 'val'
              ELSE 'test' END AS split,
         {th} AS th
  FROM documents
),
sizes AS (
  SELECT split, CAST(count(*) AS BIGINT) AS n_docs
  FROM tagged WHERE split <> 'train' GROUP BY split
),
exact_leaked AS (
  SELECT DISTINCT t.split, t.doc_id
  FROM tagged t
  WHERE t.split <> 'train'
    AND t.th IN (SELECT th FROM tagged WHERE split = 'train')
),
pairs AS ({_dedup_minhash_sql()}),
tp AS (
  SELECT p.doc_a, p.doc_b, ta.split AS split_a, tb.split AS split_b
  FROM pairs p
  JOIN tagged ta ON ta.doc_id = p.doc_a
  JOIN tagged tb ON tb.doc_id = p.doc_b
),
near_leaked AS (
  SELECT DISTINCT split, doc_id FROM (
    SELECT split_b AS split, doc_b AS doc_id FROM tp
    WHERE split_a = 'train' AND split_b <> 'train'
    UNION ALL
    SELECT split_a AS split, doc_a AS doc_id FROM tp
    WHERE split_b = 'train' AND split_a <> 'train'
  )
),
chan AS (
  SELECT 'exact' AS channel, split,
         CAST(count(*) AS BIGINT) AS n_leaked,
         CAST(sum(doc_id) AS BIGINT) AS leaked_id_sum
  FROM exact_leaked GROUP BY split
  UNION ALL
  SELECT 'near' AS channel, split,
         CAST(count(*) AS BIGINT) AS n_leaked,
         CAST(sum(doc_id) AS BIGINT) AS leaked_id_sum
  FROM near_leaked GROUP BY split
)
SELECT s.split, ch.channel, s.n_docs,
       coalesce(c.n_leaked, 0) AS n_leaked,
       coalesce(c.leaked_id_sum, 0) AS leaked_id_sum
FROM sizes s
CROSS JOIN (VALUES ('exact'), ('near')) ch(channel)
LEFT JOIN chan c ON c.split = s.split AND c.channel = ch.channel
"""


QUERIES = {
    "sample_stratified": sample_stratified,
    "train_test_split": train_test_split,
    # D77: eval-hygiene — exact + near leakage across the split
    "split_leakage_audit": split_leakage_audit,
    # D78: deterministic bottom-k weighted sample
    "sample_weighted": sample_weighted,
    "sample_per_source": sample_per_source,
    "epoch_shuffle": epoch_shuffle,
    "curriculum_mix": curriculum_mix,
    "curriculum_quota": curriculum_quota,
}

ORACLES = {
    "curriculum_quota": _curriculum_quota_sql(),
    "sample_stratified": _sample_stratified_sql(),
    "train_test_split": _train_test_split_sql(),
    "split_leakage_audit": _split_leakage_sql(),
    "sample_weighted": _sample_weighted_sql(),
    "sample_per_source": _sample_per_source_sql(),
    "epoch_shuffle": _epoch_shuffle_sql(),
    "curriculum_mix": _curriculum_mix_sql(),
}
