"""Text-analysis operators for training-data pipelines (SURVEY §2 D1-D4).

All pure ``pyspark.sql.functions`` expressions — whole-stage codegen over the
parquet scan, zero Python in the hot path, trivially linear at 100 TB (no
shuffle at all: these are per-row map operators; outputs would normally be
written straight back to partitioned parquet).

Each operator has a value-identical DuckDB oracle; hash-dependent parts use
the portable md5 hash (see frolyk_spark.functions.hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frolyk_spark.functions.hashing import (
    portable_hash_expr, portable_hash_spark_sql, portable_hash_sql,
)
from frolyk_spark.sources.catalog import load_table

STOPWORDS = ("the", "a", "of", "and", "to")

# deterministic indicator-word profiles for the n-gram language heuristic;
# scored by whole-word occurrence counts
LANG_PROFILES = {
    "de": ("hash", "window", "gross"),
    "en": ("the", "a", "key"),
    "es": ("data", "mesa", "rapido"),
    "fr": ("table", "petit", "group"),
    "zh": ("big", "stream", "line"),
}


# --- D1: text stats / quality score -----------------------------------------

# portable ratio rounding — see functions.portable for the why
from frolyk_spark.functions.portable import round4 as _round4
from frolyk_spark.functions.portable import round4_sql as _round4_sql


def split_words() -> F.Column:
    """THE corpus word split (single-space convention) — every consumer
    of per-text word features (text_stats, quality score, learn.py's
    classifier features) must build on this one definition so a change
    to the tokenization can never leave a consumer on a stale formula."""
    return F.split(F.col("text"), " ")


def stopword_hits(words: F.Column) -> F.Column:
    """English-stopword hit count over a split-words array — shared by
    the quality score, text_stats, and the D53 classifier features."""
    return F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))


def _quality_score_col() -> F.Column:
    """The corpus_filter quality score as a bare per-row Column over
    `text` — shared by text_stats_frame and the fused single-scan
    consumers (source_yield)."""
    words = split_words()
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    stop_hits = stopword_hits(words)
    quality = (
        0.4 * F.least(n_words / F.lit(100.0), F.lit(1.0))
        + 0.3 * (n_distinct / n_words)
        + 0.3 * (1 - stop_hits / n_words)
    )
    return _round4(quality)


def text_stats_frame(docs: DataFrame) -> DataFrame:
    """Frame-level form: works on any (doc_id, text) frame — catalog
    tables, arbitrary sources, or streaming micro-batches."""
    words = split_words()
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    stop_hits = stopword_hits(words)
    n_chars = F.length("text")
    # single-space separated text: total word chars = n_chars - (n_words - 1)
    avg_word_len = (n_chars - (n_words - 1)) / n_words
    stop_ratio = stop_hits / n_words
    return docs.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        n_distinct.cast("bigint").alias("n_distinct_words"),
        _round4(avg_word_len).alias("avg_word_len"),
        _round4(stop_ratio).alias("stopword_ratio"),
        _quality_score_col().alias("quality_score"),
    )


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats_frame(load_table(spark, sf_dir, "documents"))


TEXT_STATS_SQL = f"""
SELECT doc_id,
       cast(length(text) as bigint) AS n_chars,
       cast(len(string_split(text, ' ')) as bigint) AS n_words,
       cast(len(list_distinct(string_split(text, ' '))) as bigint) AS n_distinct_words,
       {_round4_sql("(length(text) - (len(string_split(text, ' ')) - 1)) * 1.0"
                    " / len(string_split(text, ' '))")} AS avg_word_len,
       {_round4_sql(f"len(list_filter(string_split(text, ' '),"
                    f" w -> w IN {STOPWORDS!r})) * 1.0"
                    " / len(string_split(text, ' '))")} AS stopword_ratio,
       {_round4_sql(f"0.4 * least(len(string_split(text, ' ')) / 100.0, 1.0)"
                    " + 0.3 * (len(list_distinct(string_split(text, ' '))) * 1.0"
                    " / len(string_split(text, ' ')))"
                    f" + 0.3 * (1 - len(list_filter(string_split(text, ' '),"
                    f" w -> w IN {STOPWORDS!r})) * 1.0"
                    " / len(string_split(text, ' ')))")} AS quality_score
FROM documents
"""


# --- D2: language identification heuristic ------------------------------------

def _profile_regex(words: tuple[str, ...]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def _lang_score_cols() -> list:
    """Per-language indicator-word counts as per-row Columns over `text`."""
    return [
        F.regexp_count("text", F.lit(_profile_regex(ws))).cast("bigint").alias(f"s_{lang}")
        for lang, ws in sorted(LANG_PROFILES.items())
    ]


def _predicted_lang_col() -> F.Column:
    """Winning language from the projected s_* score columns; first lang
    (asc) reaching the max wins — deterministic tie-break."""
    best = F.greatest(*[F.col(f"s_{lang}") for lang in sorted(LANG_PROFILES)])
    predicted = F.lit(None).cast("string")
    for lang in sorted(LANG_PROFILES, reverse=True):
        predicted = F.when(F.col(f"s_{lang}") == best, F.lit(lang)).otherwise(predicted)
    return predicted


def lang_id_frame(docs: DataFrame) -> DataFrame:
    """Frame-level form (see text_stats_frame)."""
    scored = docs.select("doc_id", *_lang_score_cols())
    return scored.withColumn("predicted_lang", _predicted_lang_col())


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id_frame(load_table(spark, sf_dir, "documents"))


def _lang_id_sql() -> str:
    scores = ",\n       ".join(
        f"cast(len(regexp_extract_all(text, '{_profile_regex(ws)}')) as bigint) AS s_{lang}"
        for lang, ws in sorted(LANG_PROFILES.items())
    )
    langs = sorted(LANG_PROFILES)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
WITH scored AS (
  SELECT doc_id,
       {scores}
  FROM documents
)
SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh, {case} AS predicted_lang
FROM scored
"""


LANG_ID_SQL = _lang_id_sql()


# --- D3: token counting ---------------------------------------------------------

#: letter runs, single digits, or single punctuation marks — a BPE-flavored
#: pre-tokenizer shape kept RE2/Java-regex portable (no lookarounds)
BPE_ISH = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def token_count_frame(docs: DataFrame) -> DataFrame:
    """Frame-level form (see text_stats_frame)."""
    ws_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe_tokens = F.regexp_count("text", F.lit(BPE_ISH))
    return docs.select(
        "doc_id",
        ws_tokens.cast("bigint").alias("ws_tokens"),
        bpe_tokens.cast("bigint").alias("bpe_tokens"),
        # derived RATIO: portable floor round (r5 .xxxx5 class)
        _round4(F.length("text") / bpe_tokens).alias("chars_per_token"),
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count_frame(load_table(spark, sf_dir, "documents"))


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       cast(len(regexp_split_to_array(trim(text), '\\s+')) as bigint) AS ws_tokens,
       cast(len(regexp_extract_all(text, '{BPE_ISH}')) as bigint) AS bpe_tokens,
       floor((length(text) * 1.0 / len(regexp_extract_all(text, '{BPE_ISH}')))
             * 10000.0 + 0.5) / 10000.0 AS chars_per_token
FROM documents
"""


# --- D4: document fingerprint (winnowing-style) ----------------------------------

#: character shingle width for the rolling fingerprint
K_GRAM = 8


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one md5 per character position: spread the single-split test scan
    # across cores (no-op on a real multi-split corpus)
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    h = portable_hash_spark_sql(f"substr(text, i, {K_GRAM})")
    fingerprint = F.expr(
        f"array_min(transform(sequence(1, greatest(length(text) - {K_GRAM - 1}, 1)),"
        f" i -> {h}))"
    )
    n_grams = F.greatest(F.length("text") - (K_GRAM - 1), F.lit(1)).cast("bigint")
    return docs.select(
        "doc_id",
        fingerprint.alias("fingerprint"),
        n_grams.alias("n_grams"),
    )


DOC_FINGERPRINT_SQL = f"""
SELECT doc_id,
       list_min(list_transform(range(1, greatest(length(text) - {K_GRAM - 1}, 1) + 1),
                i -> {portable_hash_sql(f"substr(text, i, {K_GRAM})")})) AS fingerprint,
       cast(greatest(length(text) - {K_GRAM - 1}, 1) as bigint) AS n_grams
FROM documents
"""


# --- D16: redaction (PII-scrub shape) ----------------------------------------
# Training pipelines scrub identifiers before anything else sees the text.
# The patterns here are deliberately dialect-portable (no lookarounds):
# long digit runs and word@word.word shapes. Pure regexp_replace — map-only,
# zero shuffle, linear at any scale.

REDACT_NUM = "[0-9]{6,}"
REDACT_EMAIL = "[A-Za-z0-9._]+@[A-Za-z0-9.]+\\.[A-Za-z]+"


def text_redact_frame(docs: DataFrame) -> DataFrame:
    """Frame-level form (see text_stats_frame)."""
    once = F.regexp_replace("text", REDACT_EMAIL, "<EMAIL>")
    scrubbed = F.regexp_replace(once, REDACT_NUM, "<NUM>")
    return docs.select(
        "doc_id",
        F.length(scrubbed).cast("bigint").alias("n_chars_redacted"),
        F.regexp_count("text", F.lit(REDACT_NUM)).cast("bigint").alias("n_num_hits"),
        F.regexp_count("text", F.lit(REDACT_EMAIL)).cast("bigint").alias("n_email_hits"),
        portable_hash_expr(scrubbed).alias("redacted_hash"),
    )


def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_redact_frame(load_table(spark, sf_dir, "documents"))


_REDACTED_DUCK = (
    f"regexp_replace(regexp_replace(text, '{REDACT_EMAIL}', '<EMAIL>', 'g'),"
    f" '{REDACT_NUM}', '<NUM>', 'g')"
)

TEXT_REDACT_SQL = f"""
SELECT doc_id,
       cast(length({_REDACTED_DUCK}) as bigint) AS n_chars_redacted,
       cast(len(regexp_extract_all(text, '{REDACT_NUM}')) as bigint) AS n_num_hits,
       cast(len(regexp_extract_all(text, '{REDACT_EMAIL}')) as bigint) AS n_email_hits,
       {portable_hash_sql(_REDACTED_DUCK)} AS redacted_hash
FROM documents
"""


# --- D17: end-to-end corpus filter -------------------------------------------
# The composite a training pipeline actually runs: quality-score gate +
# language gate + exact-dedup keep-first, emitting the surviving doc ids.
# One hash shuffle (the dedup window); everything else is map-only.

MIN_QUALITY = 0.5
KEEP_LANGS = ("en", "de")


def corpus_filter_frame(raw: DataFrame) -> DataFrame:
    """Frame-level composite (quality + language + exact-dedup keep-first);
    this is the per-micro-batch body of the streaming ingest path too
    (tests/test_streaming.py)."""
    from pyspark.sql import Window

    stats = text_stats_frame(raw).select("doc_id", "quality_score")
    langs = lang_id_frame(raw).select("doc_id", "predicted_lang")
    docs = raw.select("doc_id", portable_hash_expr("text").alias("text_hash"))
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    first_per_hash = docs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        first_per_hash.join(stats, "doc_id")
        .join(langs, "doc_id")
        .where(
            (F.col("quality_score") >= MIN_QUALITY)
            & F.col("predicted_lang").isin(*KEEP_LANGS)
        )
        .select("doc_id", "predicted_lang", "quality_score")
    )


def corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_filter_frame(load_table(spark, sf_dir, "documents"))


# --- D87: cleaning-funnel observability ---------------------------------------


def filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source survival funnel of the D17 cleaning composite (D87) —
    the observability table a curation team reads before shipping a
    filter change (the RefinedWeb-style "how much does each rule cost
    per source" ablation): for every source, the document counts
    surviving each stage of the FIXED pipeline order
    raw → exact-dedup keep-first → language gate → quality gate.
    The final column equals corpus_filter's survivor count by
    construction (same flags, same thresholds — the rules are evaluated
    once, here kept as booleans instead of filtered on), and the
    intermediate columns attribute the losses: a source bleeding at the
    dedup stage is a mirror/boilerplate problem, at the language stage a
    routing problem, at the quality stage a content problem.

    ONE aggregate over the flag projection (stage survival = running
    conjunction, so each stage is a sum of AND-chains — no per-stage
    passes, no joins beyond D17's own three); one hash-keyed window
    shuffle (the dedup keep-first) + one source-keyed groupBy. All
    counts BIGINT."""
    raw = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    from pyspark.sql import Window

    stats = text_stats_frame(raw).select("doc_id", "quality_score")
    langs = lang_id_frame(raw).select("doc_id", "predicted_lang")
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    flags = (
        raw.select(
            "doc_id", "source", portable_hash_expr("text").alias("text_hash")
        )
        .withColumn("rn", F.row_number().over(w))
        .join(stats, "doc_id")
        .join(langs, "doc_id")
        .select(
            "source",
            (F.col("rn") == 1).alias("s_dedup"),
            F.col("predicted_lang").isin(*KEEP_LANGS).alias("ok_lang"),
            (F.col("quality_score") >= MIN_QUALITY).alias("ok_quality"),
        )
    )
    one = lambda c: F.sum(c.cast("int")).cast("bigint")
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw"),
            one(F.col("s_dedup")).alias("after_dedup"),
            one(F.col("s_dedup") & F.col("ok_lang")).alias("after_lang"),
            one(
                F.col("s_dedup") & F.col("ok_lang") & F.col("ok_quality")
            ).alias("after_quality"),
        )
        .orderBy("source")
    )


def _filter_funnel_sql() -> str:
    langs = ", ".join(f"'{l}'" for l in KEEP_LANGS)
    return f"""
WITH stats AS ({TEXT_STATS_SQL.strip()}),
langs AS ({LANG_ID_SQL.strip()}),
hashed AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY {portable_hash_sql('text')} ORDER BY doc_id) AS rn
  FROM documents
)
SELECT h.source,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(sum(CASE WHEN h.rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS after_dedup,
       CAST(sum(CASE WHEN h.rn = 1 AND l.predicted_lang IN ({langs})
                THEN 1 ELSE 0 END) AS BIGINT) AS after_lang,
       CAST(sum(CASE WHEN h.rn = 1 AND l.predicted_lang IN ({langs})
                AND s.quality_score >= {MIN_QUALITY}
                THEN 1 ELSE 0 END) AS BIGINT) AS after_quality
FROM hashed h
JOIN stats s ON h.doc_id = s.doc_id
JOIN langs l ON h.doc_id = l.doc_id
GROUP BY h.source
ORDER BY h.source
"""


def _corpus_filter_sql() -> str:
    langs = ", ".join(f"'{l}'" for l in KEEP_LANGS)
    return f"""
WITH stats AS ({TEXT_STATS_SQL.strip()}),
langs AS ({LANG_ID_SQL.strip()}),
hashed AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY {portable_hash_sql('text')} ORDER BY doc_id) AS rn
  FROM documents
)
SELECT s.doc_id, l.predicted_lang, s.quality_score
FROM hashed h
JOIN stats s ON h.doc_id = s.doc_id
JOIN langs l ON h.doc_id = l.doc_id
WHERE h.rn = 1 AND s.quality_score >= {MIN_QUALITY}
  AND l.predicted_lang IN ({langs})
"""


# --- D27: unigram-entropy quality signal -------------------------------------

def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy (bits) of the word distribution — the
    perplexity-proxy quality signal (low-entropy docs are repetitive
    boilerplate, a standard pretraining filter alongside repetition_stats).

    H = log2(n) - sum(c*log2 c)/n over per-word counts c: two hash
    aggregations (doc×word, then doc), both map-side combinable, so the
    shuffled volume is distinct words per doc, not words. The explode
    stays JVM-side; no Python.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.sum(F.col("c") * F.log2("c")).alias("clogc"),
        )
        .select(
            "doc_id",
            "n_words",
            # portable floor round; log2 is libm on both engines — the
            # residual last-ULP risk is absorbed at 4dp (green r4-r8 at
            # three scales), the floor form removes the repr-divergence
            _round4(F.log2("n_words") - F.col("clogc") / F.col("n_words")).alias(
                "entropy_bits"
            ),
        )
    )


TOKEN_ENTROPY_SQL = """
SELECT doc_id,
       cast(sum(c) AS bigint) AS n_words,
       floor((log2(sum(c)) - sum(c * log2(c)) / sum(c)) * 10000.0 + 0.5)
         / 10000.0 AS entropy_bits
FROM (SELECT doc_id, w, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY doc_id, w)
GROUP BY doc_id
"""


# --- D32: corpus-LM negative log-probability (perplexity proxy) -------------

#: hybrid-join head size: the Zipf head of the vocabulary (stopwords carry
#: most postings) is broadcast; only the tail shuffles. Bounded, so the
#: broadcast is safe at any corpus size. The OUTPUT is invariant to the
#: head/tail split — every word carries the same corpus count either way.
VOCAB_HEAD_K = 10_000


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log2-probability under the corpus's
    own unigram LM — the CCNet-style perplexity quality signal (docs of
    globally-rare words score high; boilerplate of common words scores
    low). avg(-log2(c_w/N)) = log2(N) - avg(log2(c_w)).

    Skew posture (the r4 watch-list item, now implemented): the
    postings×vocab join is HYBRID. The top-{VOCAB_HEAD_K} head of the
    vocab — bounded, so broadcastable at any corpus size, and by Zipf
    exactly the keys (stopwords) whose postings lists are huge — joins
    map-side via BroadcastHashJoin; only tokens whose word falls in the
    anti-filtered tail, where every key's posting count sits below the
    head threshold, take the shuffle path. Same hot-key pattern as
    salted_join_segments (relational.py). The vocab aggregation stage is
    computed once and reused by head/tail/total (identical subtrees ⇒
    exchange/stage reuse); the token-stream scan is map-only in both
    join branches — deliberately NOT pre-aggregated per (doc, word): a
    per-posting reduction would de-skew the join too, but costs a full
    shuffle of the token stream that the broadcast-head plan never
    pays (measured 1.34× slower at sf0.1).

    The corpus total N is a one-row aggregate broadcast into the
    projection (never a driver collect).
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    head = vocab.orderBy(F.desc("c"), "w").limit(VOCAB_HEAD_K)
    head_words = head.select("w")
    tail = vocab.join(F.broadcast(head_words), "w", "left_anti")
    # The tail branch anti-filters head tokens MAP-SIDE (broadcast anti
    # join) before its exchange — without this the hot tokens would still
    # be shuffled and only dropped at the join, leaving the skew in the
    # exchange.
    tail_tokens = words.join(F.broadcast(head_words), "w", "left_anti")
    scored = words.join(F.broadcast(head), "w").unionByName(tail_tokens.join(tail, "w"))
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.log2("c")).alias("slc"),
    )
    total = vocab.agg(F.sum("c").alias("n_total"))
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_words",
        _round4(
            F.log2("n_total") - F.col("slc") / F.col("n_words")
        ).alias("avg_neg_logprob"),
    )


UNIGRAM_LOGPROB_SQL = """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
v AS (SELECT w, count(*) AS c FROM w GROUP BY w),
t AS (SELECT sum(c) AS n_total FROM v),
d AS (SELECT doc_id, count(*) AS n_words, sum(log2(v.c)) AS slc
      FROM w JOIN v USING (w) GROUP BY doc_id)
SELECT doc_id, cast(n_words AS bigint) AS n_words,
       floor((log2(t.n_total) - slc / n_words) * 10000.0 + 0.5) / 10000.0
         AS avg_neg_logprob
FROM d, t
"""


# --- D48: language-label confusion matrix ------------------------------------

def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix between the corpus's CLAIMED language labels and
    the lang_id heuristic's predictions — the label-quality audit run
    before trusting per-language sampling weights or filters (a feed
    whose 'en' label disagrees with detection is mislabeled or mixed).

    One map-only scoring pass — lang_id's per-row score expressions
    projected ALONGSIDE the carried claimed label in a single select
    (no join back, one scan) — then one map-side-combinable count
    aggregation over |langs|² keys, plus an exact per-label agreement
    share (integer counts, one portable-rounded division).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    scored = docs.select("lang", *_lang_score_cols()).withColumn(
        "predicted_lang", _predicted_lang_col()
    )
    counts = scored.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return counts.select(
        "lang",
        "predicted_lang",
        "n_docs",
        _round4(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double")
        ).alias("label_share"),
    ).orderBy("lang", "predicted_lang")


def _lang_confusion_sql() -> str:
    return f"""
WITH preds AS ({LANG_ID_SQL.strip()}),
labeled AS (
  SELECT d.lang, p.predicted_lang
  FROM documents d JOIN preds p ON d.doc_id = p.doc_id
),
counts AS (
  SELECT lang, predicted_lang, count(*) AS n_docs
  FROM labeled GROUP BY 1, 2
)
SELECT lang, predicted_lang, n_docs,
       {_round4_sql("CAST(n_docs AS DOUBLE)"
                    " / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE)")}
         AS label_share
FROM counts
ORDER BY lang, predicted_lang
"""


# --- D49: per-source filter yield ---------------------------------------------

def source_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source yield through the corpus_filter gates: how many docs
    each feed contributes, how many survive the quality gate, the
    language gate, and both — the per-feed acceptance report that tells
    a pipeline owner WHICH source is burning ingest budget before any
    document is dropped corpus-wide.

    All counts are exact integers from ONE conditional aggregation over
    the map-only scored frame: the quality score and the language score
    columns are projected in the SAME single select over the scan (no
    joins, one pass — the same per-row expressions text_stats/lang_id
    project separately); rates are single portable-rounded divisions of
    exact BIGINTs.
    """
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    scored = docs.select(
        "source",
        _quality_score_col().alias("quality_score"),
        *_lang_score_cols(),
    ).withColumn("predicted_lang", _predicted_lang_col())
    q_ok = (F.col("quality_score") >= MIN_QUALITY).cast("int")
    l_ok = F.col("predicted_lang").isin(*KEEP_LANGS).cast("int")
    agg = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(q_ok).cast("bigint").alias("n_quality_ok"),
        F.sum(l_ok).cast("bigint").alias("n_lang_ok"),
        F.sum(q_ok * l_ok).cast("bigint").alias("n_pass"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_quality_ok",
        "n_lang_ok",
        "n_pass",
        _round4(
            F.col("n_pass").cast("double") / F.col("n_docs").cast("double")
        ).alias("yield_rate"),
    ).orderBy("source")


def _source_yield_sql() -> str:
    langs = ", ".join(f"'{l}'" for l in KEEP_LANGS)
    return f"""
WITH stats AS ({TEXT_STATS_SQL.strip()}),
preds AS ({LANG_ID_SQL.strip()}),
scored AS (
  SELECT d.source,
         CASE WHEN s.quality_score >= {MIN_QUALITY} THEN 1 ELSE 0 END AS q_ok,
         CASE WHEN p.predicted_lang IN ({langs}) THEN 1 ELSE 0 END AS l_ok
  FROM documents d
  JOIN stats s ON d.doc_id = s.doc_id
  JOIN preds p ON d.doc_id = p.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(q_ok) AS BIGINT) AS n_quality_ok,
       CAST(sum(l_ok) AS BIGINT) AS n_lang_ok,
       CAST(sum(q_ok * l_ok) AS BIGINT) AS n_pass,
       {_round4_sql("CAST(sum(q_ok * l_ok) AS DOUBLE) / CAST(count(*) AS DOUBLE)")}
         AS yield_rate
FROM scored
GROUP BY source
ORDER BY source
"""


# --- D54: hashing-trick bag-of-words featurization ---------------------------

#: hashed feature dimensions (Weinberger et al.'s hashing trick: bucket =
#: hash mod FH_DIM, sign = the next hash bit — the fastText/VW input
#: featurization that needs no vocabulary pass at all)
FH_DIM = 16


def feature_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document {FH_DIM}-dim hashed bag-of-words vector: every word
    occurrence adds ±1 (sign = hash bit {FH_DIM}) to bucket hash mod
    {FH_DIM} — the model-free text featurization (feature hashing /
    "hashing trick") that turns a corpus into linear-model or ANN input
    WITHOUT a vocabulary table or an embedding model. Complements
    dedup_simhash (which sums a sign for EVERY bit per word — a dense
    Rademacher projection for near-dup detection); this buckets each word
    into ONE dimension, preserving additive BoW structure for learners.

    Scale shape: one explode + ONE map-side-combinable aggregation keyed
    by doc_id ({FH_DIM} conditional integer sums); all-integer arithmetic
    on the portable hash, so the vector is bit-identical cross-engine and
    the oracle compares exactly. Output columns e0..e{FH_DIM - 1}.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") > 0)
    )
    h = portable_hash_spark_sql("w")
    hashed = words.select(
        "doc_id",
        F.expr(f"({h}) % {FH_DIM}").alias("bucket"),
        F.expr(f"1 - 2 * ((({h}) div {FH_DIM}) % 2)").cast("bigint").alias("sign"),
    )
    sums = [
        F.sum(F.when(F.col("bucket") == j, F.col("sign")).otherwise(0))
        .cast("bigint")
        .alias(f"e{j}")
        for j in range(FH_DIM)
    ]
    return hashed.groupBy("doc_id").agg(*sums).orderBy("doc_id")


def _feature_hash_sql() -> str:
    h = portable_hash_sql("w")
    cols = ",\n       ".join(
        f"cast(sum(CASE WHEN bucket = {j} THEN sign ELSE 0 END) AS BIGINT) AS e{j}"
        for j in range(FH_DIM)
    )
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
hashed AS (
  SELECT doc_id,
         ({h}) % {FH_DIM} AS bucket,
         1 - 2 * ((({h}) // {FH_DIM}) % 2) AS sign
  FROM words WHERE len(w) > 0
)
SELECT doc_id,
       {cols}
FROM hashed GROUP BY doc_id ORDER BY doc_id
"""


# --- D79: Stupid-Backoff bigram LM scoring of held-out data --------------------

#: log-prob quantization: micro-units per natural-log unit (the BM25 idf
#: treatment — ONE guarded transcendental, floor-quantized, then pure BIGINT)
LM_SCALE = 1_000_000


def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out perplexity proxy under a Stupid-Backoff bigram LM
    (Brants et al. 2007 — the web-scale scoring rule: no normalization,
    score(b|a) = C(a,b)/C(a) if seen, else 0.4 * C(b)/N): the LM trains
    on the TRAIN split (the same stable hash split train_test_split
    ships) and scores the held-out docs — the quality-filter shape where
    new data is scored by a model of the curated corpus, and the one
    arrangement where the backoff path genuinely fires (a corpus scored
    by its own LM has no unseen bigrams).

    Cross-engine exactness: each token-pair log-prob quantizes to
    floor({LM_SCALE}·ln(ratio)) — the ratio is one IEEE-exact division
    of BIGINT counts built identically on both engines (backoff
    add-one-guards the unseen-unigram edge) — and everything after the
    floor is an order-free BIGINT sum. Output per held-out doc: pair
    count, backoff-hit count (makes the backoff path hash-visible), and
    the summed negative log-prob in micro-units.

    Scale: bigram extraction binds the split array once (the zip_with
    barrier idiom); the LM tables scale with the corpus (Heaps' law) so
    both joins are UN-hinted — AQE broadcasts while small; one shuffle
    each for the two count tables, one join pipeline for scoring.
    """
    from frolyk_spark.operators.sampling import SPLIT_TRAIN, _bucket

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    is_train = _bucket(F.col("doc_id").cast("string")) < SPLIT_TRAIN
    pairs_expr = (
        "transform(array(split(text, ' ')), ws -> "
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1), "
        "(a, b) -> struct(a, b)))[0]"
    )
    pairs = docs.withColumn("is_train", is_train).select(
        "doc_id", "is_train", F.explode(F.expr(pairs_expr)).alias("p")
    ).select("doc_id", "is_train", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    train_pairs = pairs.where("is_train")
    bi = train_pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_ab")
    )
    uni = train_pairs.groupBy("a").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_a")
    )
    uni_b = uni.select(F.col("a").alias("b"), F.col("c_a").alias("c_b"))
    n1 = uni.agg(F.sum("c_a").alias("n_total"))
    held = (
        pairs.where(~F.col("is_train"))
        .join(bi, ["a", "b"], "left")
        .join(uni, "a", "left")
        .join(uni_b, "b", "left")
        .crossJoin(F.broadcast(n1))
    )
    lp = F.when(
        F.col("c_ab").isNotNull(),
        F.floor(
            F.lit(float(LM_SCALE))
            * F.log(F.col("c_ab").cast("double") / F.col("c_a").cast("double"))
        ),
    ).otherwise(
        # backoff: 0.4 * C(b)/N, add-one on both so an unseen unigram
        # (impossible on this corpus, structural elsewhere) stays finite
        F.floor(
            F.lit(float(LM_SCALE))
            * F.log(
                F.lit(0.4)
                * (F.coalesce(F.col("c_b"), F.lit(0)).cast("double") + 1.0)
                / (F.col("n_total").cast("double") + 1.0)
            )
        )
    ).cast("bigint")
    return (
        held.select(
            "doc_id",
            lp.alias("lp_mu"),
            F.when(F.col("c_ab").isNull(), 1).otherwise(0).alias("backoff"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("backoff").cast("bigint").alias("n_backoff"),
            (-F.sum("lp_mu")).cast("bigint").alias("neg_logprob_mu"),
        )
    )


def _bigram_lm_sql() -> str:
    from frolyk_spark.operators.sampling import SPLIT_TRAIN, _bucket_sql

    b = _bucket_sql("cast(doc_id as varchar)")
    return f"""
WITH toks AS (
  SELECT doc_id, ({b}) < {SPLIT_TRAIN} AS is_train,
         string_split(text, ' ') AS ws
  FROM documents
),
pairs AS (
  SELECT doc_id, is_train,
         unnest(list_transform(range(2, len(ws) + 1), i -> ws[i-1])) AS a,
         unnest(list_transform(range(2, len(ws) + 1), i -> ws[i])) AS b
  FROM toks
),
bi AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
  FROM pairs WHERE is_train GROUP BY a, b
),
uni AS (
  SELECT a, CAST(count(*) AS BIGINT) AS c_a
  FROM pairs WHERE is_train GROUP BY a
),
nn AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_total FROM uni),
held AS (
  SELECT p.doc_id,
         CASE WHEN bi.c_ab IS NOT NULL THEN
           CAST(floor({LM_SCALE}.0 * ln(CAST(bi.c_ab AS DOUBLE)
                                        / CAST(u.c_a AS DOUBLE))) AS BIGINT)
         ELSE
           CAST(floor({LM_SCALE}.0 * ln(0.4
                * (CAST(coalesce(ub.c_a, 0) AS DOUBLE) + 1.0)
                / (CAST(nn.n_total AS DOUBLE) + 1.0))) AS BIGINT)
         END AS lp_mu,
         CASE WHEN bi.c_ab IS NULL THEN 1 ELSE 0 END AS backoff
  FROM pairs p
  LEFT JOIN bi ON bi.a = p.a AND bi.b = p.b
  LEFT JOIN uni u ON u.a = p.a
  LEFT JOIN uni ub ON ub.a = p.b
  CROSS JOIN nn
  WHERE NOT p.is_train
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(backoff) AS BIGINT) AS n_backoff,
       CAST(-sum(lp_mu) AS BIGINT) AS neg_logprob_mu
FROM held GROUP BY doc_id
"""


QUERIES = {
    "bigram_lm_score": bigram_lm_score,
    "unigram_logprob": unigram_logprob,
    "feature_hash_embedding": feature_hash_embedding,
    "token_entropy": token_entropy,
    "text_stats": text_stats,
    "lang_id": lang_id,
    "lang_confusion": lang_confusion,
    "source_yield": source_yield,
    "token_count": token_count,
    "doc_fingerprint": doc_fingerprint,
    "text_redact": text_redact,
    "corpus_filter": corpus_filter,
    "filter_funnel": filter_funnel,
}

ORACLES = {
    "bigram_lm_score": _bigram_lm_sql(),
    "unigram_logprob": UNIGRAM_LOGPROB_SQL,
    "feature_hash_embedding": _feature_hash_sql(),
    "token_entropy": TOKEN_ENTROPY_SQL,
    "text_stats": TEXT_STATS_SQL,
    "lang_id": LANG_ID_SQL,
    "lang_confusion": _lang_confusion_sql(),
    "source_yield": _source_yield_sql(),
    "token_count": TOKEN_COUNT_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "text_redact": TEXT_REDACT_SQL,
    "corpus_filter": _corpus_filter_sql(),
    "filter_funnel": _filter_funnel_sql(),
}
