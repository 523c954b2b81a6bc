"""TPC-H completion set (Q7/Q8/Q9/Q11/Q16/Q20/Q21 shapes) — with the
tpch_* queries in relational.py / advanced.py / tpch_extra.py this makes
all 22 TPC-H query shapes available on the driver fixture schema.

Fixture adaptations (columns the fixtures lack):
- no partsupp table -> lineitem's (l_partkey, l_suppkey) pairs play its
  role (Q11, Q20), exactly as in tpch_extra.py Q2;
- no ps_supplycost -> p_retailprice * quantity stands in as cost (Q9);
- no l_commitdate/l_receiptdate -> `l_returnflag = 'R'` marks a failed
  line and o_orderstatus = 'F' a finished order (Q21 keeps its
  EXISTS / NOT-EXISTS-other-supplier structure verbatim);
- no s_comment -> negative account balance marks the excluded
  supplier set (Q16's NOT IN).

Spark-first notes (each docstring says why the plan scales):
- every correlated aggregate is decorrelated to a window or a 1-row
  broadcast — no per-row re-scan survives;
- EXISTS-pairs over the same fact (Q21) become ONE per-order aggregate
  joined back, so lineitem is read twice total instead of 2x per row;
- money rides exact integer cents/ten-thousandths through every partial
  aggregate (partition-order insensitive); divisions to display doubles
  happen once at the output edge. Q9's profit can be negative, so it is
  never integer-divided (DuckDB `//` floors, Spark `div` truncates —
  they disagree below zero); the exact sum is divided as a double.

Reference parity anchor: the reference has no joins at all
(ref:spark-apps/weather_streaming.py:1-216 has no `join` token;
SURVEY.md §2.6) — this module is extension surface for relational
completeness.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .. import tables
from ..functions.exprs import cents, money
from ..operators.textops import materialize
from ..registry import query

#: discounted price in exact integer ten-thousandths (sum-safe)
_DISC_TT = (
    "CAST(ROUND(l_extendedprice * (1.0e0 - l_discount) * 10000.0e0) AS BIGINT)"
)


def _ts(lit: str) -> "F.Column":
    return F.expr(f"to_timestamp_ntz('{lit} 00:00:00')")


# --- Q7 shape: volume shipping between two nations ---------------------------
@query(
    "tpch_q7_volume_shipping",
    oracle=(
        "SELECT supp_nation, cust_nation, l_year, "
        f"{money('SUM(disc_tt) // 100')} AS revenue FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        f"YEAR(l_shipdate) AS l_year, {_DISC_TT} AS disc_tt "
        "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
        "AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00') "
        "GROUP BY supp_nation, cust_nation, l_year"
    ),
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume by year. The two nation
    dims broadcast onto supplier and customer BEFORE the fact joins, so
    the pair-disjunction runs against broadcast-hash-joined rows — only
    the date filter and the two fact joins touch shuffle. At 100 TB the
    plan is: pruned lineitem scan (2 money cols + 2 keys + shipdate) ->
    shuffle on orderkey -> shuffle on custkey; both sides of the pair
    predicate are dimension attributes, so Catalyst keeps it as a
    residual filter on the broadcast outputs — no cartesian anywhere."""
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1995-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(F.expr(_DISC_TT)).alias("rev_tt"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.expr(money("rev_tt div 100")).alias("revenue"),
        )
    )


# --- Q8 shape: national market share -----------------------------------------
@query(
    "tpch_q8_market_share",
    oracle=(
        "SELECT o_year, "
        "CAST(SUM(CASE WHEN nation = 'NATION_3' THEN disc_tt ELSE 0 END) "
        "AS DOUBLE) / CAST(SUM(disc_tt) AS DOUBLE) AS mkt_share FROM ("
        f"SELECT YEAR(o_orderdate) AS o_year, {_DISC_TT} AS disc_tt, "
        "n2.n_name AS nation "
        "FROM part JOIN lineitem ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
        "JOIN region ON n1.n_regionkey = r_regionkey "
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
        "WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY' "
        "AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00') "
        "GROUP BY o_year"
    ),
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_3's share of the AMERICA market for
    ECONOMY parts, by order year. The selective p_type filter broadcasts
    into the lineitem scan FIRST (kills ~5/6 of the fact before any
    shuffle); region->nation->customer is a broadcast chain. The share
    is a conditional-sum / sum over the SAME exact-integer column, so
    numerator and denominator come out of one aggregate — no second
    pass, and the final double division is bit-identical across engines
    because both divide the same two integers."""
    p = tables.load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    o = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    disc = F.expr(_DISC_TT)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"), "inner")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("nation") == "NATION_3", disc).otherwise(F.lit(0)))
            .alias("num_tt"),
            F.sum(disc).alias("den_tt"),
        )
        .select(
            "o_year",
            (
                F.col("num_tt").cast("double") / F.col("den_tt").cast("double")
            ).alias("mkt_share"),
        )
    )


# --- Q9 shape: product-type profit by nation and year ------------------------
#: profit in exact ten-thousandths; cost stand-in = retailprice * quantity
#: (no ps_supplycost in fixtures). Can be negative -> no integer division.
_PROFIT_TT = (
    f"({_DISC_TT} - {cents('p_retailprice')} * 100 "
    "* CAST(l_quantity AS BIGINT))"
)


@query(
    "tpch_q9_product_profit",
    oracle=(
        "SELECT nation, o_year, "
        "(CAST(SUM(profit_tt) AS DOUBLE) / 10000.0e0) AS sum_profit FROM ("
        "SELECT n_name AS nation, YEAR(o_orderdate) AS o_year, "
        f"{_PROFIT_TT} AS profit_tt "
        "FROM part JOIN lineitem ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE p_name LIKE '%red%') "
        "GROUP BY nation, o_year"
    ),
)
def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit on red parts by supplier nation and order
    year (cost stood in by p_retailprice * quantity; see module note).
    The LIKE filter prunes part BEFORE its broadcast; supplier and
    nation broadcast too, so the only shuffle joins lineitem to orders
    on orderkey. Profit is an exact integer per row — the sum is
    partition-order-insensitive, and because profit can be NEGATIVE the
    final /10000 is a double division (integer floor-vs-truncate would
    diverge between engines below zero)."""
    p = tables.load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    o = tables.load(spark, sf_dir, "orders")
    n = tables.load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(F.expr(_PROFIT_TT)).alias("profit_tt"))
        .select(
            "nation",
            "o_year",
            (F.col("profit_tt").cast("double") / F.lit(10000.0)).alias(
                "sum_profit"
            ),
        )
    )


# --- Q11 shape: important stock ----------------------------------------------
@query(
    "tpch_q11_important_stock",
    oracle=(
        "WITH ps AS (SELECT l_partkey, "
        f"SUM({_DISC_TT}) AS value_tt "
        "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE n_name = 'NATION_7' GROUP BY l_partkey) "
        f"SELECT l_partkey, {money('value_tt // 100')} AS part_value "
        "FROM ps WHERE CAST(value_tt AS DOUBLE) > "
        "(SELECT CAST(SUM(value_tt) AS DOUBLE) * 0.001e0 FROM ps)"
    ),
)
def tpch_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (partsupp stood in by NATION_7-supplied lineitem
    value): parts whose stocked value exceeds 0.1% of the nation's
    total. The HAVING-against-global-scalar decorrelates to a 1-row
    aggregate broadcast over the ALREADY-AGGREGATED per-part frame. The
    per-part frame is materialized (lazy local checkpoint) because two
    consumers hang off it — Catalyst has no common-subplan sharing, so
    without the pin the scalar branch would re-scan lineitem; with it
    the fact is scanned ONCE and the (parts x 1 row) comparison reads
    the pinned frame. Both engines compare doubles derived from the
    same exact integers, so the > cut is engine-identical."""
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    ps = materialize(
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.expr(_DISC_TT)).alias("value_tt"))
    )
    total = ps.agg(
        (F.sum("value_tt").cast("double") * F.lit(0.001)).alias("cut_tt")
    )
    return (
        ps.join(
            F.broadcast(total), F.col("value_tt").cast("double") > F.col("cut_tt")
        )
        .select(
            "l_partkey", F.expr(money("value_tt div 100")).alias("part_value")
        )
    )


# --- Q16 shape: supplier count by part attributes ----------------------------
@query(
    "tpch_q16_supplier_part_counts",
    oracle=(
        "SELECT p_brand, p_type, p_size, "
        "COUNT(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand <> 'Brand#4' AND p_type <> 'MEDIUM' "
        "AND p_size IN (1, 4, 9, 16, 25, 36, 49) "
        "AND l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0e0) "
        "GROUP BY p_brand, p_type, p_size"
    ),
)
def tpch_q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct suppliers can deliver each
    surviving (brand, type, size) bucket, excluding blacklisted
    suppliers (negative balance stands in for the complaint-comment
    scan). NOT IN over a non-nullable key compiles to a left_anti
    against the tiny filtered supplier list — broadcast, zero shuffle.
    The count-distinct shuffles (partkey-bucket, suppkey) pairs after
    Spark's partial-dedup — at 100 TB the map-side Expand+partial
    aggregate keeps the exchange near the distinct-pair cardinality,
    not the fact row count."""
    p = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "MEDIUM")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    li = tables.load(spark, sf_dir, "lineitem")
    bad = (
        tables.load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q20 shape: dominant-share suppliers of promoted parts -------------------
@query(
    "tpch_q20_promotion_suppliers",
    oracle=(
        "WITH pair AS (SELECT l_suppkey, l_partkey, "
        "SUM(CAST(l_quantity AS BIGINT)) AS pair_qty "
        "FROM lineitem WHERE l_partkey IN "
        "(SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%') "
        "AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY l_suppkey, l_partkey), "
        "tot AS (SELECT l_partkey, SUM(pair_qty) AS part_qty "
        "FROM pair GROUP BY l_partkey) "
        "SELECT DISTINCT s_suppkey, s_name FROM supplier "
        "WHERE s_suppkey IN (SELECT l_suppkey FROM pair JOIN tot USING (l_partkey) "
        "WHERE CAST(pair_qty AS DOUBLE) > 0.2e0 * CAST(part_qty AS DOUBLE))"
    ),
)
def tpch_q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (availqty stood in by shipped share): suppliers
    holding >20% of any promoted part's 1996 volume. The nested-IN
    chain decorrelates the Spark-first way: part filter -> broadcast
    semi into the pruned lineitem scan, ONE groupBy on (suppkey,
    partkey), then the per-part total as a window over l_partkey. The
    window costs a second exchange, but over the REDUCED pair frame
    (distinct pairs, not fact rows) — the cheap order at 100 TB:
    pre-partitioning by partkey alone would save that exchange but
    shuffle raw fact rows without map-side combine. The qualifying
    supplier set feeds a broadcast left_semi into supplier (semi joins
    dedup, so no distinct needed). Quantities are exact integers; the
    share compare is the same double math in both engines."""
    promoted = (
        tables.load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    s = tables.load(spark, sf_dir, "supplier")
    pair = (
        li.join(
            F.broadcast(promoted), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("pair_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        pair.withColumn("part_qty", F.sum("pair_qty").over(w))
        .filter(
            F.col("pair_qty").cast("double")
            > F.lit(0.2) * F.col("part_qty").cast("double")
        )
        .select("l_suppkey")
    )
    return s.join(
        F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


# --- Q21 shape: suppliers who kept orders waiting ----------------------------
@query(
    "tpch_q21_waiting_suppliers",
    oracle=(
        "SELECT s_name, COUNT(*) AS numwait "
        "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
        "JOIN orders ON o_orderkey = l1.l_orderkey "
        "WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' "
        "AND EXISTS (SELECT 1 FROM lineitem l2 "
        "WHERE l2.l_orderkey = l1.l_orderkey "
        "AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
        "WHERE l3.l_orderkey = l1.l_orderkey "
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') "
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10"
    ),
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (returnflag 'R' stands in for the late-receipt
    columns the fixtures lack): the sole supplier whose lines failed on
    a multi-supplier finished order. The EXISTS / NOT-EXISTS pair over
    the same fact is rewritten as ONE per-order aggregate off ONE
    lineitem scan: collect_set(supplier) and collect_list(failed
    supplier) per order, then pure array logic — `n_suppliers > 1 AND
    n_failed = 1` is exactly "another supplier exists, no other failed
    supplier exists", the sole failed supplier is bad[0], and its line
    count is size(bad). Lines-per-order is bounded (7 in TPC-H), so the
    collected arrays are O(1) per key at any scale and partial
    (map-side) aggregation still applies. One fact shuffle total; the
    qualifying-order frame that joins orders and supplier afterward is
    order-reduced. Top-10 compiles to TakeOrderedAndProject with
    s_name (unique in fixtures) as tie-break."""
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    s = tables.load(spark, sf_dir, "supplier")
    qual = (
        li.groupBy("l_orderkey")
        .agg(
            F.collect_set("l_suppkey").alias("supps"),
            F.expr(
                "collect_list(CASE WHEN l_returnflag = 'R' "
                "THEN l_suppkey END)"
            ).alias("bad"),
        )
        .filter(
            (F.size("supps") > 1)
            & (F.size(F.array_distinct("bad")) == 1)
        )
        .select(
            "l_orderkey",
            F.col("bad").getItem(0).alias("l_suppkey"),
            F.size("bad").alias("n_bad_lines"),
        )
    )
    return (
        qual.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_bad_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )
