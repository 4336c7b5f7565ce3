"""Supplier-part inventory queries (SURVEY §2 C47-C50): the
partsupp-dependent TPC-H family (Q2/Q11/Q16/Q20) over a DERIVED
supplier-part relation.

The test data has no partsupp table (VERDICT r4 "What's missing" #2), so
these operators derive the supplier-part relation the honest way a
warehouse without one would: ``SELECT l_partkey, l_suppkey, <exact sums>
FROM lineitem GROUP BY 1, 2``. That keeps the *query patterns* the family
exists to exercise — correlated-min rewritten as a window (Q2), a
group-total fraction threshold via a broadcast one-row scalar (Q11),
multi-filter count_distinct with an anti-joined exclusion list (Q16), and
a conditional-aggregate self-comparison feeding a semi-join chain (Q20) —
while every number stays oracle-checkable against the same derivation in
DuckDB.

Scale shape: where unit economics are needed (Q2), the derived relation
is ONE map-side-combinable aggregation of lineitem keyed by (partkey,
suppkey) — at 100 TB that is the ~double shuffle of a partsupp scan, but
the query's subsequent joins run on the reduced pair table (|parts|×
|suppliers-per-part| rows, ~50× smaller than lineitem). Q16/Q20 skip the
pair materialization entirely and reduce straight from a two-column
lineitem projection. part and supplier join WITHOUT broadcast hints
(both scale with SF; AQE picks broadcast when they fit), nation/region
are fixed-cardinality broadcasts.

Cross-engine exactness discipline (same as relational.price_discount_corr):
money is cents-scaled to BIGINT before summing (order-free integer sums),
quantities are integral and summed as BIGINT, and every derived double
(unit cost, value share) is ONE division / comparison of exact integers
evaluated with the identical expression on both engines.

Reference parity note: the reference (JaapRood/frolyk, src/streams.ts) is
a Kafka stream-processing library with no relational layer; this module
implements the OLAP surface of the charter (SURVEY §2 C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from frolyk_spark.functions.portable import round2, round2_sql, round4, round4_sql
from frolyk_spark.sources.catalog import load_table

#: cents-scaled extended price (exact BIGINT; prices are exact cents in the
#: test data, and the floor(+0.5) form is the portable round-half-up)
_CENTS = "cast(floor(l_extendedprice * 100.0d + 0.5d) as bigint)"
_CENTS_DUCK = "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"

#: the derived supplier-part relation (priced pairs — used where unit
#: economics matter, e.g. Q2; Q16/Q20 reduce straight from lineitem)
_PS_DUCK = f"""
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST(sum({_CENTS_DUCK}) AS BIGINT) AS ps_cents,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_qty
  FROM lineitem GROUP BY 1, 2
"""


def _derived_ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.sum(F.expr(_CENTS)).alias("ps_cents"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("ps_qty"),
        )
    )


def _nations_of_region(spark: SparkSession, sf_dir: str, region: str) -> DataFrame:
    """nation keys of one region — 25×5 rows, always broadcast."""
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    return F.broadcast(
        nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("n_nationkey", "n_name")
    )


# --- C47: TPC-H Q2 pattern — min-cost supplier per part ----------------------

Q2_SIZE_LO, Q2_SIZE_HI = 10, 20
Q2_TYPE = "ECONOMY"
Q2_REGION = "EUROPE"


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted to the derived supplier-part relation: for each
    {Q2_TYPE} part sized [{Q2_SIZE_LO}, {Q2_SIZE_HI}], the {Q2_REGION}
    supplier with the lowest unit cost (cents/qty from exact integer
    sums; suppkey tie-break). Q2's correlated min-subquery is rewritten
    as a per-part window rank over the already-joined frame — one pass,
    no re-join of the subquery result (reference pattern: TPC-H spec
    Q2; the window rewrite is the standard decorrelation).

    The window partitions by part (suppliers-per-part is bounded by the
    supplier distribution, not corpus size), and the final top-100 is a
    TakeOrderedAndProject heap with a unique (s_acctbal DESC, s_name,
    p_partkey) total order.
    """
    ps = _derived_ps(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size").between(Q2_SIZE_LO, Q2_SIZE_HI))
        & (F.col("p_type") == Q2_TYPE)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = _nations_of_region(spark, sf_dir, Q2_REGION)
    cost = F.col("ps_cents").cast("double") / F.col("ps_qty").cast("double")
    joined = (
        ps.join(part, ps.ps_partkey == part.p_partkey)
        .join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .withColumn("cost_per_unit", cost)
    )
    rk = F.row_number().over(
        W.partitionBy("p_partkey").orderBy("cost_per_unit", "ps_suppkey")
    )
    return (
        joined.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            # derived RATIO: portable floor round, not engine round
            # (Spark/DuckDB disagree on .xxxx5 — confirmed 4441/800)
            round4(F.col("cost_per_unit")).alias("cost_per_unit"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = f"""
WITH ps AS ({_PS_DUCK}),
ranked AS (
  SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
         CAST(ps.ps_cents AS DOUBLE) / CAST(ps.ps_qty AS DOUBLE)
           AS cost_per_unit,
         row_number() OVER (
           PARTITION BY p.p_partkey
           ORDER BY CAST(ps.ps_cents AS DOUBLE) / CAST(ps.ps_qty AS DOUBLE),
                    ps.ps_suppkey) AS rk
  FROM ps
  JOIN part p ON ps.ps_partkey = p.p_partkey
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE p.p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
    AND p.p_type = '{Q2_TYPE}' AND r.r_name = '{Q2_REGION}'
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name,
       {round4_sql("cost_per_unit")} AS cost_per_unit
FROM ranked WHERE rk = 1
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 100
"""


# --- C48: TPC-H Q11 pattern — important parts by value share -----------------

Q11_REGION = "AFRICA"
#: keep parts whose value exceeds this multiple of the MEAN per-part value
Q11_MEAN_MULT = 2


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: per-part discounted value from {Q11_REGION}
    suppliers, keeping parts above {Q11_MEAN_MULT}× the MEAN per-part
    value. Q11's spec threshold (a fixed fraction of the total) shrinks
    per-part shares as the part count grows — at sf0.1 it already
    selects zero rows — so, like the spec's own fraction/SF scaling
    rule, the threshold here is scale-free: value > mult·total/n_parts.
    The scalar subquery (total + part count) becomes a broadcast
    one-row crossJoin over the per-part aggregate — the classic
    small-stats-join-back shape, never a driver collect.

    Value is the exact integer Σ cents·(100 − discount%); the threshold
    compares value·n_parts with mult·total in DOUBLE (the products
    exceed 2^53 at scale, but both engines evaluate the identical
    expression on identical integers — same rounding, same verdict).
    One lineitem aggregation, one part-key shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = _nations_of_region(spark, sf_dir, Q11_REGION)
    scaled = F.expr(
        f"{_CENTS} * (100 - cast(floor(l_discount * 100.0d + 0.5d) as bigint))"
    )
    from frolyk_spark.functions.lineage import cut_lineage

    per_part = cut_lineage(
        # materialized once: the broadcast-total crossJoin would otherwise
        # re-run the full lineitem aggregation on BOTH the scalar side and
        # the probe side (plan audit r5 — two lineitem scans)
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(scaled).alias("value_scaled"))
    )
    total = per_part.agg(
        F.sum("value_scaled").alias("total_scaled"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("value_scaled").cast("double") * F.col("n_parts").cast("double")
            > F.lit(float(Q11_MEAN_MULT)) * F.col("total_scaled").cast("double")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            # scaled-sum ratio: portable floor round (1450/10000 → .145
            # rounds differently per engine with round(…,2))
            round2(F.col("value_scaled").cast("double") / 10000.0).alias(
                "value"
            ),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l.l_partkey,
         CAST(sum({_CENTS_DUCK}
                  * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
              AS BIGINT) AS value_scaled
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{Q11_REGION}'
  GROUP BY l.l_partkey
),
t AS (SELECT CAST(sum(value_scaled) AS BIGINT) AS total_scaled,
             count(*) AS n_parts
      FROM per_part)
SELECT l_partkey AS p_partkey,
       {round2_sql("CAST(value_scaled AS DOUBLE) / 10000.0")} AS value
FROM per_part, t
WHERE CAST(value_scaled AS DOUBLE) * CAST(n_parts AS DOUBLE)
      > {float(Q11_MEAN_MULT)} * CAST(total_scaled AS DOUBLE)
ORDER BY value DESC, p_partkey
"""


# --- C49: TPC-H Q16 pattern — supplier counts by part attribute --------------

Q16_EXCL_BRAND = "Brand#9"
Q16_EXCL_TYPE_PREFIX = "PROMO"
Q16_SIZES = (1, 5, 10, 15, 20, 25, 30, 35)


def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct supplier counts per (brand, type,
    size) over the derived pair relation, excluding brand
    {Q16_EXCL_BRAND}, {Q16_EXCL_TYPE_PREFIX}-type parts, and suppliers
    on the exclusion list (Q16's '%Customer%Complaints%' becomes the
    s_acctbal < 0 set — the data's only supplier blemish signal),
    applied as a left_anti join, never a NOT IN over a subquery.

    count_distinct(suppkey) plans as the two-phase expand-free distinct
    aggregate; the anti-join side is tiny (6 rows at sf0.01) and
    broadcast. Group count is bounded by |brand|×|type|×|sizes| —
    a heap-friendly output at any SF.

    Unlike Q2/Q11/Q20 this query needs only SUPPLIER existence per
    group, and count_distinct already dedups within the aggregate — so
    there is no materialized pair relation at all: a two-column lineitem
    projection joins the filtered part dimension and reduces straight
    into the expand-free distinct aggregate (the derived-ps GROUP BY
    would be a second, redundant full-width shuffle).
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (~F.col("p_type").startswith(Q16_EXCL_TYPE_PREFIX))
        & (F.col("p_size").isin(*Q16_SIZES))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey,
                "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = f"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> '{Q16_EXCL_BRAND}'
  AND p.p_type NOT LIKE '{Q16_EXCL_TYPE_PREFIX}%'
  AND p.p_size IN {Q16_SIZES}
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- C50: TPC-H Q20 pattern — suppliers with excess part concentration -------

Q20_YEAR = 1997
Q20_NAME_PREFIX = "small"
Q20_REGION = "ASIA"


def q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: {Q20_REGION} suppliers who shipped more than
    half of a '{Q20_NAME_PREFIX}%' part's lifetime quantity in
    {Q20_YEAR} alone (Q20's availqty > ½·year-qty availability test
    becomes a year-vs-lifetime concentration test — same conditional-
    aggregate-vs-total comparison, availqty being underivable from
    lineitem). The year and lifetime sums come from ONE conditional
    aggregation pass (no second scan), the comparison is exact BIGINT
    (2·qty_year > qty_total), and qualifying suppliers semi-join the
    supplier table (left_semi — never a distinct-then-join).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    pairs = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.when(
                    F.year("l_shipdate") == Q20_YEAR,
                    F.col("l_quantity").cast("bigint"),
                ).otherwise(F.lit(0))
            ).alias("qty_year"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty_total"),
        )
        .where(F.lit(2) * F.col("qty_year") > F.col("qty_total"))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = _nations_of_region(spark, sf_dir, Q20_REGION)
    return (
        supp.join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(pairs, supp.s_suppkey == pairs.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH pairs AS (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '{Q20_NAME_PREFIX}%'
  GROUP BY l.l_partkey, l.l_suppkey
  HAVING 2 * sum(CASE WHEN year(l_shipdate) = {Q20_YEAR}
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
         > sum(CAST(l_quantity AS BIGINT))
)
SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q20_REGION}'
  AND s.s_suppkey IN (SELECT l_suppkey FROM pairs)
ORDER BY s.s_name
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q16_parts_supplier_counts": q16_parts_supplier_counts,
    "q20_concentrated_suppliers": q20_concentrated_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_parts": Q11_SQL,
    "q16_parts_supplier_counts": Q16_SQL,
    "q20_concentrated_suppliers": Q20_SQL,
}
