"""Temporal-modeling operators (SURVEY §2 C52-C53, C55-C56, C63):
SCD2 dimension history + point-in-time lookup, interval sweep-line
concurrency, time-weighted averages, and OHLC bars.

These round out the relational family (relational.py) with the two
warehouse temporal patterns it didn't yet cover: slowly-changing-
dimension versioning (the MERGE/SCD2 shape every dimension pipeline
runs) and interval overlap analysis WITHOUT a pairwise join (the
sweep-line rewrite — a pairwise interval self-join is quadratic per key
and never survives a 100× scale-up; the sweep is linear in interval
count and shuffles once).

Reference parity note: the reference (JaapRood/frolyk) is a Kafka
stream-processing library with no relational layer; these implement the
charter's OLAP surface. Cross-engine conventions per CLAUDE.md:
timestamps leave as epoch-µs bigints, dates as 'yyyy-MM-dd' strings,
and every computed column is aliased identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frolyk_spark.sources.catalog import load_table


# --- C52: SCD2 dimension history ---------------------------------------------

def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history of each user's
    event_type "state": collapse consecutive runs of the same type into
    one versioned row with [valid_from_us, valid_to_us) validity and an
    is_current flag — the standard SCD2 build every dimension pipeline
    materializes from a change stream.

    Scale shape: ONE user_id shuffle total. The run-change detection
    (lag), the versioning (row_number) and the validity close-out (lead)
    are all windows PARTITIONED BY user_id — Catalyst reuses the single
    sort/exchange for all three, and a 1000-executor run partitions
    cleanly by user. No joins, no driver state.
    """
    return scd2_frame(load_table(spark, sf_dir, "events")).orderBy(
        "user_id", "version"
    )


def scd2_frame(ev: DataFrame) -> DataFrame:
    """Frame-level SCD2 build over (user_id, event_type, event_id, ts).
    Checked against a brute-force run-collapse reference on randomized
    event streams in tests/test_semantics.py."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    wc = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return changes.select(
        "user_id",
        F.row_number().over(wc).cast("bigint").alias("version"),
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(wc).alias("valid_to_us"),
        F.lead("ts_us").over(wc).isNull().alias("is_current"),
    )


SCD2_HISTORY_SQL = """
WITH o AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
c AS (
  SELECT user_id, event_type, event_id, ts_us
  FROM o WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id,
       cast(row_number() OVER w AS BIGINT) AS version,
       event_type,
       ts_us AS valid_from_us,
       lead(ts_us) OVER w AS valid_to_us,
       lead(ts_us) OVER w IS NULL AS is_current
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
ORDER BY user_id, version
"""


# --- C63: point-in-time (SCD2 as-of) lookup -----------------------------------

def scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup: for every purchase event, the SCD2 state
    version (C52's history) prevailing STRICTLY BEFORE it (valid at
    ts−1 µs) — the point-in-time join every event/dimension pipeline runs
    ("which version of the customer record did this order see").

    Implemented in the union-window form, not an interval join: history
    starts (kind 0) and probes (kind 1) union into one stream, ONE
    user_id window computes last_value(version/state) ignoring nulls, and
    probe rows read their prevailing version off the running state. That
    is one shuffle on the dimension key — the interval-predicate join
    (`valid_from <= t < valid_to`) the oracle uses is quadratic per key
    under skew and needs a range-join optimizer Spark lacks. Ordering
    (ts, kind, version) makes same-timestamp version stacks resolve to
    the LAST version — exactly the row whose half-open interval is
    non-empty, matching the oracle's containment predicate. Purchases
    before any state change drop on both sides (inner-join semantics)."""
    return scd2_lookup_frame(load_table(spark, sf_dir, "events"))


def scd2_lookup_frame(ev: DataFrame) -> DataFrame:
    """Frame-level point-in-time lookup (see scd2_lookup). Checked against
    a brute-force prevailing-run reference on randomized streams in
    tests/test_semantics.py."""
    hist = scd2_frame(ev).select(
        "user_id",
        F.col("valid_from_us").alias("ts_k"),
        F.lit(0).alias("kind"),
        "version",
        F.col("event_type").alias("state"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    probes = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        (F.unix_micros("ts") - 1).alias("ts_k"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("version"),
        F.lit(None).cast("string").alias("state"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_k", "kind", "version")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = hist.unionByName(probes).select(
        "user_id", "kind", "event_id",
        F.last("version", ignorenulls=True).over(w).alias("prev_version"),
        F.last("state", ignorenulls=True).over(w).alias("prev_state"),
    )
    return u.where(
        (F.col("kind") == 1) & F.col("prev_version").isNotNull()
    ).select("event_id", "user_id", "prev_version", "prev_state")


SCD2_LOOKUP_SQL = f"""
WITH history AS ({SCD2_HISTORY_SQL.replace("ORDER BY user_id, version", "")}),
probes AS (
  SELECT event_id, user_id, epoch_us(ts) - 1 AS t
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       h.version AS prev_version,
       h.event_type AS prev_state
FROM probes p
JOIN history h
  ON p.user_id = h.user_id
 AND h.valid_from_us <= p.t
 AND (h.valid_to_us IS NULL OR p.t < h.valid_to_us)
"""


# --- C53: interval sweep-line concurrency ------------------------------------

def supplier_peak_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent open shipments per supplier via a sweep-line over
    the per-lineitem active window [least(orderdate, shipdate),
    greatest(orderdate, shipdate)] (the synthetic dates are unordered, so
    the window is normalized) — the interval-overlap question answered
    WITHOUT the pairwise interval self-join, which is quadratic per key
    (600 lineitems/supplier → 180k pairs each) and dies at scale.

    Sweep shape: each interval contributes +1 at start and -1 at
    end+1 day; deltas are pre-aggregated per (supplier, date) — a
    map-side-combinable groupBy, which also makes the running sum
    tie-free — then ONE supplier-partitioned window computes the running
    open count, its max (the peak), and the earliest date attaining it.
    Linear in lineitems, one fact shuffle for the orders join (orderkey),
    one for the sweep (suppkey).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.to_date("l_shipdate").alias("ship_d")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("order_d")
    )
    iv = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("l_suppkey").alias("key"),
        F.least("order_d", "ship_d").alias("start_d"),
        F.greatest("order_d", "ship_d").alias("end_d"),
    )
    return sweep_peak_frame(iv).select(
        F.col("key").alias("l_suppkey"), "n_intervals", "peak_open", "peak_date"
    ).orderBy("l_suppkey")


def sweep_peak_frame(iv: DataFrame) -> DataFrame:
    """Frame-level sweep: (key, start_d, end_d) closed date intervals ->
    (key, n_intervals, peak_open, peak_date). Checked against a
    brute-force day-count reference on randomized interval sets in
    tests/test_semantics.py."""
    deltas = iv.select(
        "key",
        F.explode(
            F.array(
                F.struct(F.col("start_d").alias("d"), F.lit(1).alias("delta")),
                F.struct(
                    F.date_add("end_d", 1).alias("d"), F.lit(-1).alias("delta")
                ),
            )
        ).alias("e"),
    ).select("key", F.col("e.d").alias("d"), F.col("e.delta").alias("delta"))
    per_date = deltas.groupBy("key", "d").agg(
        F.sum("delta").cast("bigint").alias("net"),
        F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).cast("bigint").alias("starts"),
    )
    w = Window.partitionBy("key").orderBy("d")
    ws = Window.partitionBy("key")
    swept = per_date.select(
        "key",
        "d",
        F.sum("net").over(w).alias("open_now"),
        F.sum("starts").over(ws).alias("n_intervals"),
    ).withColumn("peak_open", F.max("open_now").over(ws))
    return (
        swept.where(F.col("open_now") == F.col("peak_open"))
        .groupBy("key")
        .agg(
            F.max("n_intervals").alias("n_intervals"),
            F.max("peak_open").alias("peak_open"),
            F.min("d").cast("string").alias("peak_date"),
        )
    )


SUPPLIER_PEAK_LOAD_SQL = """
WITH iv AS (
  SELECT l.l_suppkey,
         least(cast(o.o_orderdate AS DATE), cast(l.l_shipdate AS DATE)) AS start_d,
         greatest(cast(o.o_orderdate AS DATE), cast(l.l_shipdate AS DATE)) AS end_d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
deltas AS (
  SELECT l_suppkey, start_d AS d, 1 AS delta FROM iv
  UNION ALL
  SELECT l_suppkey, end_d + INTERVAL 1 DAY, -1 FROM iv
),
per_date AS (
  SELECT l_suppkey, cast(d AS DATE) AS d,
         cast(sum(delta) AS BIGINT) AS net,
         cast(sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS starts
  FROM deltas GROUP BY l_suppkey, cast(d AS DATE)
),
swept AS (
  SELECT l_suppkey, d,
         cast(sum(net) OVER (PARTITION BY l_suppkey ORDER BY d) AS BIGINT)
           AS open_now,
         cast(sum(starts) OVER (PARTITION BY l_suppkey) AS BIGINT)
           AS n_intervals
  FROM per_date
),
peaked AS (
  SELECT *, max(open_now) OVER (PARTITION BY l_suppkey) AS peak_open FROM swept
)
SELECT l_suppkey,
       max(n_intervals) AS n_intervals,
       max(peak_open) AS peak_open,
       cast(min(d) AS VARCHAR) AS peak_date
FROM peaked
WHERE open_now = peak_open
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


# --- C55: time-weighted average (hypertable-style) ----------------------------

def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of `value` — the TimescaleDB
    `time_weight('LOCF', ...)` rollup: each observation holds until the
    next one, so its weight is the µs gap to the successor, and the
    average is Σ value·gap / Σ gap over the user's observed span.

    Cross-engine exact by the sufficient-statistics discipline: values
    cents-scale to BIGINT, gaps are integer µs, so the weighted sum is
    an exact BIGINT on both engines and ONE double division ends the
    compare path (portable round4). Users with a single event have no
    observed span and are excluded (both engines identically, via the
    null lead). One user_id shuffle: the lead window and the final
    per-user reduce share the partitioning.
    """
    from frolyk_spark.functions.portable import round4

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return (
        gapped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_holds"),
            F.sum("gap_us").cast("bigint").alias("span_us"),
            F.sum(F.col("cents") * F.col("gap_us")).cast("bigint").alias("wsum"),
        )
        .select(
            "user_id",
            "n_holds",
            "span_us",
            round4(
                F.col("wsum").cast("double")
                / F.col("span_us").cast("double")
                / F.lit(100.0)
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


TIME_WEIGHTED_AVG_SQL = """
WITH gapped AS (
  SELECT user_id,
         cast(round(value * 100) AS BIGINT) AS cents,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS gap_us
  FROM events
)
SELECT user_id,
       cast(count(*) AS BIGINT) AS n_holds,
       cast(sum(gap_us) AS BIGINT) AS span_us,
       floor(cast(sum(cents * gap_us) AS DOUBLE)
             / cast(sum(gap_us) AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
         AS twa_value
FROM gapped
WHERE gap_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


# --- C56: OHLC bars ------------------------------------------------------------

def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars of `value` per event_type —
    the candlestick rollup every timeseries store ships. Open/close are
    the first/last observation in the bar under the deterministic
    (ts, event_id) order — computed with first()/last() over ONE bar
    window (unbounded frame), which shares its exchange with the
    min/max/count aggregates; money values are cents-exact doubles, so
    no portable rounding is needed.
    """
    ev = load_table(spark, sf_dir, "events")
    bar = F.date_trunc("hour", F.col("ts"))
    w = (
        Window.partitionBy("event_type", "bar")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "event_type",
            bar.alias("bar"),
            "ts",
            "event_id",
            "value",
        )
        .select(
            "event_type",
            "bar",
            "value",
            F.first("value").over(w).alias("open"),
            F.last("value").over(w).alias("close"),
        )
        .groupBy("event_type", "bar")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("open").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max("close").alias("close"),
        )
        .select(
            "event_type",
            F.date_format("bar", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
            "n",
            "open",
            "high",
            "low",
            "close",
        )
        .orderBy("event_type", "bar_start")
    )


OHLC_BARS_SQL = """
WITH bars AS (
  SELECT event_type, date_trunc('hour', ts) AS bar, ts, event_id, value,
         first_value(value) OVER w AS open,
         last_value(value) OVER
           (PARTITION BY event_type, date_trunc('hour', ts)
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close
  FROM events
  WINDOW w AS (PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       strftime(bar, '%Y-%m-%d %H:%M:%S') AS bar_start,
       cast(count(*) AS BIGINT) AS n,
       max(open) AS open,
       max(value) AS high,
       min(value) AS low,
       max(close) AS close
FROM bars
GROUP BY event_type, bar
ORDER BY event_type, bar_start
"""


QUERIES = {
    "scd2_history": scd2_history,
    "scd2_lookup": scd2_lookup,
    "supplier_peak_load": supplier_peak_load,
    "time_weighted_avg": time_weighted_avg,
    "ohlc_bars": ohlc_bars,
}

ORACLES = {
    "scd2_history": SCD2_HISTORY_SQL,
    "scd2_lookup": SCD2_LOOKUP_SQL,
    "supplier_peak_load": SUPPLIER_PEAK_LOAD_SQL,
    "time_weighted_avg": TIME_WEIGHTED_AVG_SQL,
    "ohlc_bars": OHLC_BARS_SQL,
}
