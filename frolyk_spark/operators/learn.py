"""Distributed model training over the corpus (SURVEY §2 D53):
a logistic-regression quality classifier trained with full-batch
gradient descent where each step is ONE map-side-combinable aggregation.

This is the third trainable-model loop in the repo (k-means: similarity
`_train_centroids`; BPE: vocab `_bpe_loop`) and establishes the linear-
model pattern a 100 TB pipeline uses for fastText-style quality/domain
classifiers: features stay distributed, the model (a handful of doubles)
lives on the driver, and each training step reduces the corpus to one
gradient row. Nothing corpus-sized ever leaves the executors.

Reference parity note: the reference (JaapRood/frolyk) is a Kafka
stream-processing library; this implements the LLM-data-pipeline surface
of the charter (SURVEY §2 D).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frolyk_spark.functions.lineage import cut_lineage
from frolyk_spark.operators.text import split_words, stopword_hits
from frolyk_spark.sources.catalog import load_table

#: gradient-descent geometry: full-batch steps and a fixed step size —
#: deterministic given the data (no minibatch RNG)
LOGREG_ITERS = 8
LOGREG_LR = 1.0


def _quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc training rows (doc_id, y, x1, x2, x3): label = claimed
    English, features = English-stopword ratio, average word length,
    words/100. Computed once as JVM expressions and lineage-cut, because
    every training step aggregates this frame — without the cut each of
    the {LOGREG_ITERS} steps would re-parse the text."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    # shared word/stopword definitions (operators.text) so the classifier
    # features can never drift from the corpus-wide tokenization; x2 is
    # DELIBERATELY the raw chars/word (÷10 for GD conditioning), not
    # text_stats' separator-corrected avg_word_len
    words = split_words()
    n_words = F.size(words).cast("double")
    stop_hits = stopword_hits(words).cast("double")
    # features pre-scaled to O(1) ranges so full-batch GD at LOGREG_LR
    # descends monotonically (unscaled avg-word-length ~5 made lr=1
    # overshoot — measured divergent; /10 keeps the step well-conditioned)
    return cut_lineage(
        docs.repartition(spark.sparkContext.defaultParallelism).select(
            "doc_id",
            (F.col("lang") == "en").cast("double").alias("y"),
            (stop_hits / n_words).alias("x1"),
            (F.length("text").cast("double") / n_words / F.lit(10.0)).alias("x2"),
            (n_words / F.lit(100.0)).alias("x3"),
        )
    )


def _model_z(w: list[float]) -> F.Column:
    """w·x over (x1, x2, x3) with the weights as plan literals — THE
    model form. Training and scoring must share this one definition, or
    a model change (new feature, rescale) made in one place would
    silently score with a different model than was trained; the
    tolerance test checks the weights, not the scoring expression, so
    that drift would ship."""
    return (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )


def _train_logreg(feats: DataFrame) -> tuple[list[float], list[float]]:
    """Full-batch GD; returns (weights [w0..w3], per-step mean log-loss).

    Each step evaluates p = sigmoid(w·x) with the CURRENT weights as
    literals (whole-stage codegen — the model is constants in the plan)
    and reduces to one row: the four gradient components and the loss.
    Driver state is the weight vector — bounded model state, like IVF
    centroids and BPE merge rows. Note the float sums accumulate in
    partition order, so the last ULPs of the gradient are run-dependent;
    the model check in tests/test_learn.py is therefore a tolerance
    check (rtol 1e-6), not the exact-hash discipline oracle-compared
    operators use — and why this operator is no-oracle by design.
    """
    n = feats.count()
    w = [0.0, 0.0, 0.0, 0.0]
    losses: list[float] = []
    for _ in range(LOGREG_ITERS):
        z = _model_z(w)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        r = feats.select(
            (p - F.col("y")).alias("d"), "x1", "x2", "x3", "y", z.alias("z")
        ).agg(
            F.sum("d").alias("g0"),
            F.sum(F.col("d") * F.col("x1")).alias("g1"),
            F.sum(F.col("d") * F.col("x2")).alias("g2"),
            F.sum(F.col("d") * F.col("x3")).alias("g3"),
            # logloss = ln(1 + e^-z) + (1-y)·z, the numerically-stable form
            F.sum(
                F.log1p(F.exp(-F.abs("z")))
                + F.when(F.col("z") > 0, (F.lit(1.0) - F.col("y")) * F.col("z"))
                .otherwise(-F.col("y") * F.col("z"))
            ).alias("loss"),
        ).collect()[0]
        losses.append(float(r.loss) / n)
        g = [float(r.g0), float(r.g1), float(r.g2), float(r.g3)]
        w = [wi - LOGREG_LR * gi / n for wi, gi in zip(w, g)]
    return w, losses


def quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style quality/domain classifier, trained ON the corpus BY
    the engine: {LOGREG_ITERS} full-batch GD steps for P(lang = 'en' |
    stopword ratio, word length, doc length), then one map-only scoring
    pass. Output: per doc, the label, the model probability and the 0.5
    decision — the score a quality-filtering pipeline thresholds on.

    Scale shape: training reduces the corpus to ONE gradient row per
    step (map-side-combinable sums over a lineage-cut feature frame);
    scoring is map-only with the weights as plan literals. No SQL oracle
    (iterative, like bpe_train/dedup_clusters); model-checked against a
    numpy reference of the identical iteration in tests/test_learn.py,
    plus a monotone-loss gate.
    """
    feats = _quality_features(spark, sf_dir)
    w, _losses = _train_logreg(feats)
    z = _model_z(w)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        "doc_id",
        F.col("y").cast("int").alias("label_en"),
        F.round(p, 6).alias("p_en"),
        (p >= 0.5).cast("int").alias("pred_en"),
    ).orderBy("doc_id")


def logreg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D53's driver-checkable companion: the exact per-doc training rows
    (label + the three features) `quality_logreg` descends on. The GD
    loop itself stays tolerance-checked (sigmoid/exp are transcendental
    and its gradient sums are order-sensitive — the no-oracle-by-design
    class), but the FEATURE pipeline feeding it is a handful of IEEE
    divisions on small integers (stopword hits / word count, chars /
    words / 10, words / 100) — bit-deterministic on both engines with no
    rounding needed — so a green row here certifies the entire data side
    of the model: tokenization, stopword set, label rule, scaling."""
    return _quality_features(spark, sf_dir).orderBy("doc_id")


def _logreg_features_sql() -> str:
    from frolyk_spark.operators.text import STOPWORDS

    # cast(bool) not CASE: (lang = 'en') propagates a NULL lang as NULL,
    # matching Spark's (col == lit).cast(double) — a CASE ELSE 0.0 would
    # silently classify NULL-lang rows differently per engine (r10 review)
    return f"""
SELECT doc_id,
       cast(lang = 'en' AS double) AS y,
       (len(list_filter(string_split(text, ' '), w -> w IN {STOPWORDS!r})) * 1.0)
         / len(string_split(text, ' ')) AS x1,
       (length(text) * 1.0 / len(string_split(text, ' '))) / 10.0 AS x2,
       len(string_split(text, ' ')) / 100.0 AS x3
FROM documents
"""


QUERIES = {
    # no-oracle: iterative driver-held model state per step; tolerance
    # model check vs a numpy reference in tests/test_learn.py
    "quality_logreg": quality_logreg,
    # D53's deterministic companion row (feature pipeline, oracle-checked)
    "logreg_features": logreg_features,
}

ORACLES: dict[str, str] = {"logreg_features": _logreg_features_sql()}
