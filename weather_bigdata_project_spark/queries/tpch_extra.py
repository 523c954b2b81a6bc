"""TPC-H correlated-subquery family (Q2/Q10/Q13/Q15/Q17/Q19/Q22 shapes),
adapted to the driver fixture schema (no partsupp table — lineitem's
(l_partkey, l_suppkey) pairs play its role; no container/phone/ship-mode
columns — nearest available columns substitute).

These are the decorrelation showcases: each query the reference's pandas
layer could never express is written the way Catalyst wants it —

- correlated scalar MIN/AVG  -> window function over the correlation key
  (ONE shuffle on the key instead of an O(n^2) re-scan per outer row);
- scalar subquery against an aggregate (global MAX / global AVG)
  -> 1-row aggregate broadcast-joined (BroadcastNestedLoopJoin over a
  single row is free, and the big side never moves);
- NOT EXISTS -> left_anti join; EXISTS -> left_semi join;
- OR-of-ANDs predicates stay declarative so Catalyst can extract the
  common conjuncts and push them into BOTH parquet scans.

Float discipline per `functions/exprs.py`: money sums ride exact integer
cents/ten-thousandths through every partial aggregate (partition-order
insensitive), one division at the output edge.

Reference parity anchor: the reference has no joins at all
(ref:spark-apps/weather_streaming.py:1-216 has no `join` token; SURVEY.md
§2.6) — this module is extension surface for relational completeness.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .. import tables
from ..functions.exprs import cents, money, rnd
from ..operators.textops import materialize
from ..registry import query

#: discounted price in exact integer ten-thousandths (sum-safe)
_DISC_TT = (
    "CAST(ROUND(l_extendedprice * (1.0e0 - l_discount) * 10000.0e0) AS BIGINT)"
)


# --- Q2 shape: minimum-cost supplier per part ------------------------------
@query(
    "tpch_q2_min_cost_supplier",
    oracle=(
        "WITH ps AS (SELECT l_partkey, l_suppkey, "
        f"MIN({cents('l_extendedprice')}) AS cost_c "
        "FROM lineitem GROUP BY l_partkey, l_suppkey) "
        "SELECT p_partkey, p_name, s_name, n_name, "
        f"{money('ps.cost_c')} AS min_cost "
        "FROM part p JOIN ps ON p_partkey = ps.l_partkey "
        "JOIN supplier s ON s_suppkey = ps.l_suppkey "
        "JOIN nation n ON s_nationkey = n_nationkey "
        "WHERE p_size <= 10 AND p_type = 'LARGE' "
        "AND ps.cost_c = (SELECT MIN(ps2.cost_c) FROM ps ps2 "
        "WHERE ps2.l_partkey = p.p_partkey)"
    ),
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (partsupp stood in by lineitem's part/supplier
    pairs): correlated scalar MIN decorrelated to a window. The per-part
    minimum is MIN() OVER (PARTITION BY l_partkey) on the already-reduced
    ps aggregate — one shuffle on l_partkey that the groupBy below reuses;
    the correlated re-scan the oracle runs never happens. Dim joins
    (supplier, nation, filtered part) broadcast."""
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.expr(cents("l_extendedprice"))).alias("cost_c")
    )
    w = Window.partitionBy("l_partkey")
    best = ps.withColumn("min_c", F.min("cost_c").over(w)).filter(
        F.col("cost_c") == F.col("min_c")
    )
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.expr(money("cost_c")).alias("min_cost"),
        )
    )


# --- Q10 shape: returned-item revenue, top 20 customers ---------------------
@query(
    "tpch_q10_returned_revenue",
    oracle=(
        "SELECT c_custkey, c_name, "
        f"{money(f'SUM({_DISC_TT}) // 100')} AS revenue, "
        "c_acctbal, n_name "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_returnflag = 'R' "
        "GROUP BY c_custkey, c_name, c_acctbal, n_name "
        "ORDER BY SUM(" + _DISC_TT + ") DESC, c_custkey LIMIT 20"
    ),
)
def tpch_q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: who returned the most revenue last quarter.
    Both fact filters (order date window, returnflag='R') push to the
    parquet scans BEFORE the fact-fact join; nation broadcasts; the
    final top-20 compiles to TakeOrderedAndProject (no global sort —
    each partition keeps 20, the driver merges). Tie-break on the unique
    c_custkey makes the LIMIT deterministic for the oracle hash."""
    o = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("to_timestamp_ntz('1996-10-01 00:00:00')"))
        & (F.col("o_orderdate") < F.expr("to_timestamp_ntz('1997-01-01 00:00:00')"))
    )
    li = tables.load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(F.expr(_DISC_TT)).alias("rev_tt"))
        .orderBy(F.desc("rev_tt"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.expr(money("rev_tt div 100")).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


# --- Q13 shape: distribution of orders per customer -------------------------
@query(
    "tpch_q13_order_count_distribution",
    oracle=(
        "SELECT c_count, COUNT(*) AS custdist FROM ("
        "SELECT c_custkey, COUNT(o_orderkey) AS c_count "
        "FROM customer LEFT JOIN orders "
        "ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' "
        "GROUP BY c_custkey) GROUP BY c_count"
    ),
)
def tpch_q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left outer join with a pushed non-key condition
    (urgent orders excluded INSIDE the join, so customers whose only
    orders are urgent still count as 0), then a two-level aggregation.
    The second groupBy's input is one row per customer — AQE coalesces
    its exchange to a handful of partitions at runtime."""
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- Q15 shape: top supplier(s) by quarterly revenue ------------------------
@query(
    "tpch_q15_top_supplier",
    oracle=(
        "WITH revenue AS (SELECT l_suppkey, "
        f"SUM({_DISC_TT}) AS total_tt FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' "
        "GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, "
        f"{money('total_tt // 100')} AS total_revenue "
        "FROM supplier JOIN revenue ON s_suppkey = l_suppkey "
        "WHERE total_tt = (SELECT MAX(total_tt) FROM revenue)"
    ),
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: aggregate view + scalar-subquery MAX against the
    view itself. The revenue view (one row per supplier) is materialized
    (lazy local checkpoint) because both the MAX branch and the final
    filter consume it — Catalyst has no common-subplan sharing, so
    without the pin the scalar branch would re-scan lineitem; with it
    the fact is scanned exactly once at any scale. Exact-cents revenue
    makes `= MAX(...)` safe (float equality against an aggregate would
    be a correctness bug)."""
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("to_timestamp_ntz('1996-01-01 00:00:00')"))
        & (F.col("l_shipdate") < F.expr("to_timestamp_ntz('1996-04-01 00:00:00')"))
    )
    s = tables.load(spark, sf_dir, "supplier")
    revenue = materialize(
        li.groupBy("l_suppkey").agg(F.sum(F.expr(_DISC_TT)).alias("total_tt"))
    )
    best = revenue.agg(F.max("total_tt").alias("max_tt"))
    return (
        revenue.join(F.broadcast(best), F.col("total_tt") == F.col("max_tt"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.expr(money("total_tt div 100")).alias("total_revenue"),
        )
    )


# --- Q17 shape: small-quantity-order revenue --------------------------------
@query(
    "tpch_q17_small_quantity_revenue",
    oracle=(
        "SELECT "
        + rnd(
            f"CAST(SUM({cents('l_extendedprice')}) AS DOUBLE) / 700.0e0", 2
        )
        + " AS avg_yearly FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand = 'Brand#23' AND p_size = 5 "
        "AND l_quantity < (SELECT 0.2e0 * "
        "(CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)) "
        "FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)"
    ),
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape (container column absent -> p_size=5): correlated
    AVG decorrelated to a window over l_partkey. Because the outer filter
    touches only part columns, the per-part average over the semi-filtered
    lineitem equals the correlated average over all of that part's
    lineitems — so one broadcast join + one window replaces a per-row
    re-aggregation. The average is SUM(int)/COUNT (exact), making the
    `<` threshold bit-identical across engines."""
    p = tables.load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") == 5)
    )
    li = tables.load(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    qsum = F.sum(F.col("l_quantity").cast("bigint")).over(w)
    qcnt = F.count(F.lit(1)).over(w)
    flt = joined.withColumn(
        "avg_qty", qsum.cast("double") / qcnt
    ).filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    return flt.agg(
        F.expr(
            rnd(f"CAST(SUM({cents('l_extendedprice')}) AS DOUBLE) / 700.0e0", 2)
        ).alias("avg_yearly")
    )


# --- Q19 shape: OR-of-ANDs join predicates ----------------------------------
_Q19_PRED = (
    "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 "
    "AND l_quantity >= 1 AND l_quantity <= 11) "
    "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 "
    "AND l_quantity >= 10 AND l_quantity <= 20) "
    "OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15 "
    "AND l_quantity >= 20 AND l_quantity <= 30)"
)


@query(
    "tpch_q19_or_predicate_revenue",
    oracle=(
        f"SELECT {money(f'SUM({_DISC_TT}) // 100')} AS revenue "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        f"WHERE {_Q19_PRED}"
    ),
)
def tpch_q19_or_predicate_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of brand/size/quantity conjunctions.
    Left declarative so Catalyst extracts the common implied conjuncts
    (p_size >= 1, quantity within the hull of the three ranges, the
    3-brand IN-list) and pushes them into both parquet scans — the join
    only sees pre-filtered rows, and the residual OR runs post-join.
    The filtered part side broadcasts."""
    li = tables.load(spark, sf_dir, "lineitem")
    p = tables.load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.expr(_Q19_PRED))
        .agg(F.expr(money(f"SUM({_DISC_TT}) div 100")).alias("revenue"))
    )


# --- Q22 shape: dormant high-balance customers ------------------------------
_BAL_C = cents("c_acctbal")


@query(
    "tpch_q22_dormant_customers",
    oracle=(
        "SELECT c_nationkey, COUNT(*) AS numcust, "
        f"{money(f'SUM({_BAL_C})')} AS totacctbal "
        "FROM customer WHERE c_acctbal > "
        f"(SELECT CAST(SUM({_BAL_C}) AS DOUBLE) "
        "/ (100.0e0 * COUNT(*)) FROM customer WHERE c_acctbal > 0.0e0) "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) "
        "GROUP BY c_nationkey"
    ),
)
def tpch_q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape (phone country code absent -> c_nationkey):
    above-average balances with no orders. The global-average scalar is a
    1-row aggregate broadcast into a nested-loop join (free on one row);
    NOT EXISTS is a left_anti join on o_custkey. The average is exact
    cents / exact count, so the `>` cut is engine-identical. At 100 TB
    the anti join shuffles on custkey; orders need only its o_custkey
    column (column pruning keeps the probe narrow)."""
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.expr(
                f"CAST(SUM({cents('c_acctbal')}) AS DOUBLE) "
                "/ (100.0e0 * COUNT(*))"
            ).alias("avg_bal")
        )
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.expr(money(f"SUM({cents('c_acctbal')})")).alias("totacctbal"),
        )
    )
