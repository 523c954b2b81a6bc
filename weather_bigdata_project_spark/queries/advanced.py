"""Advanced relational operators: as-of join, band (range) join, salted
skew join, deterministic stratified sampling, and the TPC-H query shapes
(Q4/Q12/Q14/Q18) that exercise correlated-exists, conditional aggregation,
ratio-of-sums, and having-then-join-back patterns.

The reference has no joins at all (SURVEY.md §2.6) — this module is part
of the relational-completeness extension surface, and each operator is
written the way it must be written at 100 TB:

- **as-of join** (Spark has no built-in): implemented as the union+window
  plan — tag both sides, shuffle ONCE on the key, sort within partition,
  carry the most recent right-hand value forward with
  `last(..., ignorenulls=True)`. This is O(n log n/partition) with a
  single exchange, vs the naive correlated-subquery O(n·m) the oracle
  runs; it never materializes a pair blowup.
- **band join** (inequality-range join): bucketize time into fixed-width
  buckets = the band width, explode the PROBE side into the 2 adjacent
  buckets, equi-join on (key, bucket), then re-check the exact range.
  Turns a non-equi join (nested-loop in most engines) into a hash join
  with 2x probe duplication — the standard scale trick.
- **salted join**: when one join key dominates (hot user, hot null),
  a plain hash join puts the whole key on one reducer. Salting splits
  the fact side S ways on a deterministic salt and replicates the dim
  side S times; result is identical to the plain join, but the hot key
  now spreads over S reducers. (AQE skew-join does this adaptively for
  sort-merge; explicit salting is the portable form and works for
  broadcast-ineligible dims.)
- **stratified sample**: content-hash (md5) thresholding per stratum —
  deterministic, reproducible across engines/retries/scale (unlike
  `sampleBy`, which draws from a seeded RNG that is partition-layout
  dependent), and embarrassingly parallel: no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .. import tables
from ..functions.exprs import money, rnd
from ..operators.textops import hashed_id_duck, hashed_id_spark
from ..registry import query


# --- as-of join: last click at-or-before each purchase --------------------
@query(
    "join_asof_purchase_last_click",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "p AS (SELECT event_id, user_id, ts FROM events_t "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts, MAX(value) AS click_value "
        "FROM events_t WHERE event_type = 'click' GROUP BY user_id, ts) "
        "SELECT p.event_id, p.user_id, p.ts, "
        "c.ts AS last_click_ts, c.click_value "
        "FROM p ASOF LEFT JOIN c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts"
    ),
)
def join_asof_purchase_last_click(spark, sf_dir):
    """AS-OF LEFT JOIN (Spark lacks the operator; DuckDB oracle runs its
    native ASOF JOIN). Union+window plan: one shuffle on user_id, sort by
    (ts, side) within partition — right rows sort before left rows at
    equal ts, so "at-or-before" includes ties — then `last(ignorenulls)`
    carries the most recent click forward. Ties among clicks at the same
    (user_id, ts) are resolved inside the same sort (value ascending, so
    the carried row is the MAX — matching the oracle's GROUP BY + MAX
    collapse) rather than with a separate pre-aggregation: the whole
    operator is ONE exchange + one partition-local sort. No pair blowup
    at any scale; window state is a single carried row."""
    ev = tables.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast(ev.schema["ts"].dataType).alias("click_ts"),
        F.lit(None).cast("double").alias("click_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "click_value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .select(
            "event_id",
            "user_id",
            "ts",
            "side",
            F.last("click_ts", ignorenulls=True).over(w).alias("last_click_ts"),
            F.last("click_value", ignorenulls=True).over(w).alias("click_value"),
        )
        .filter(F.col("side") == 1)
        .drop("side")
    )


# --- band join: clicks in the 10 minutes before each purchase -------------
_BAND_S = 600  # band width in seconds == bucket width


@query(
    "join_range_clicks_before_purchase",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + " "
        "SELECT p.event_id, p.user_id, COUNT(c.ts) AS n_clicks "
        "FROM events_t p LEFT JOIN events_t c "
        "ON c.user_id = p.user_id AND c.event_type = 'click' "
        "AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts "
        "WHERE p.event_type = 'purchase' "
        "GROUP BY p.event_id, p.user_id"
    ),
)
def join_range_clicks_before_purchase(spark, sf_dir):
    """Band join via bucketization: clicks keep their single 600 s epoch
    bucket; purchases probe buckets {b-1, b} (a 600 s look-back window
    spans at most 2 buckets), equi-join on (user_id, bucket), exact range
    re-checked post-join. The plan is a plain hash join — no nested-loop
    non-equi join, no cross product; probe-side duplication is exactly
    2x. Bucket ids are computed with timestampdiff from the epoch, which
    is timezone-independent on timestamp_ntz."""
    ev = tables.load(spark, sf_dir, "events")
    bucket = (
        "CAST(FLOOR(timestampdiff(SECOND, "
        f"to_timestamp_ntz('1970-01-01 00:00:00'), ts) / {_BAND_S}) AS BIGINT)"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.expr(bucket).alias("c_bucket"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", F.expr(bucket).alias("p_bucket"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.explode(
                F.array(F.col("p_bucket") - 1, F.col("p_bucket"))
            ).alias("probe_bucket"),
        )
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("probe_bucket") == F.col("c_bucket"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 10 MINUTE"))
        & (F.col("c_ts") < F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("c_ts").alias("n_clicks")
    )


# --- TPC-H Q4 shape: orders with late-shipping lineitems -------------------
@query(
    "tpch_q4_late_shipment_orders",
    oracle=(
        "SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders o "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
        "AND EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) "
        "GROUP BY o_orderpriority"
    ),
)
def tpch_q4_late_shipment_orders(spark, sf_dir):
    """TPC-H Q4 shape (adapted to fixture columns: commit/receipt dates
    do not exist, so "late" = shipped >60 days after order date). The
    correlated EXISTS compiles to a LEFT SEMI join carrying the non-equi
    date predicate as a join condition — one shuffle, no row
    multiplication for multi-lineitem orders."""
    o = tables.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("to_timestamp_ntz('1996-01-01 00:00:00')"))
        & (F.col("o_orderdate") < F.expr("to_timestamp_ntz('1997-01-01 00:00:00')"))
    )
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --- TPC-H Q12 shape: priority mix by return flag -------------------------
_HIGH = "('1-URGENT', '2-HIGH')"


@query(
    "tpch_q12_priority_by_returnflag",
    oracle=(
        "SELECT l_returnflag, "
        f"SUM(CASE WHEN o_orderpriority IN {_HIGH} THEN 1 ELSE 0 END) "
        "AS high_line_count, "
        f"SUM(CASE WHEN o_orderpriority NOT IN {_HIGH} THEN 1 ELSE 0 END) "
        "AS low_line_count "
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY l_returnflag"
    ),
)
def tpch_q12_priority_by_returnflag(spark, sf_dir):
    """TPC-H Q12 shape (shipmode column absent -> grouped by returnflag):
    fact-fact equi join + conditional aggregation. The CASE WHEN counters
    are exact integers — no float-order concern — and fold into the
    map-side partial agg."""
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("to_timestamp_ntz('1996-01-01 00:00:00')"))
        & (F.col("l_shipdate") < F.expr("to_timestamp_ntz('1997-01-01 00:00:00')"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- TPC-H Q14 shape: revenue share of one part type -----------------------
_DISC_TTC = (
    "CAST(ROUND(l_extendedprice * (1.0e0 - l_discount) * 10000.0e0) AS BIGINT)"
)


@query(
    "tpch_q14_type_revenue_share",
    oracle=(
        "SELECT "
        + rnd(
            f"100.0e0 * SUM(CASE WHEN p_type = 'ECONOMY' THEN {_DISC_TTC} "
            f"ELSE 0 END) / SUM({_DISC_TTC})",
            4,
        )
        + " AS economy_revenue_pct, "
        f"{money(f'SUM({_DISC_TTC}) // 100')} AS total_revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'"
    ),
)
def tpch_q14_type_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape (PROMO -> 'ECONOMY', the fixture's p_type value):
    ratio-of-sums over a fact-dim join. Both sums are exact integer
    ten-thousandths (order-insensitive); the single division happens once
    at the output edge. part⋈lineitem is left to AQE: at small SF it
    broadcasts, at 100 TB (part is SF-proportional) it shuffle-joins."""
    li = tables.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("to_timestamp_ntz('1997-06-01 00:00:00')"))
        & (F.col("l_shipdate") < F.expr("to_timestamp_ntz('1997-07-01 00:00:00')"))
    )
    p = tables.load(spark, sf_dir, "part")
    econ = F.when(F.col("p_type") == "ECONOMY", F.expr(_DISC_TTC)).otherwise(
        F.lit(0)
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(econ).alias("econ_tt"),
            F.sum(F.expr(_DISC_TTC)).alias("all_tt"),
        )
        .select(
            F.expr(
                rnd("100.0e0 * econ_tt / all_tt", 4)
            ).alias("economy_revenue_pct"),
            F.expr(money("all_tt div 100")).alias("total_revenue"),
        )
    )


# --- TPC-H Q18 shape: large-volume orders ----------------------------------
_Q18_MIN_QTY = 250


@query(
    "tpch_q18_large_volume_orders",
    oracle=(
        "SELECT c_name, c_custkey, o_orderkey, o_orderdate, "
        + money("SUM(CAST(ROUND(o_totalprice * 100.0e0) AS BIGINT))")
        + " AS o_totalprice, "
        "SUM(CAST(l_quantity AS BIGINT)) AS sum_qty "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
        f"GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > {_Q18_MIN_QTY}) "
        "GROUP BY c_name, c_custkey, o_orderkey, o_orderdate"
    ),
)
def tpch_q18_large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: aggregate-HAVING subquery -> semi join back to
    the facts. The hot-key list (orders over the quantity threshold) is
    tiny relative to lineitem, so it broadcasts into the semi join —
    lineitem is filtered before the expensive customer join. Note
    o_totalprice is grouped-through via SUM/COUNT trick (it is constant
    per orderkey, summed cents / n rows keeps it exact)."""
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sq"))
        .filter(F.col("sq") > _Q18_MIN_QTY)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate")
        .agg(
            F.expr(
                money("SUM(CAST(ROUND(o_totalprice * 100.0e0) AS BIGINT))")
            ).alias("o_totalprice"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
    )


# --- salted skew join -------------------------------------------------------
_SALTS = 8


@query(
    "join_salted_events_customer",
    oracle=(
        "SELECT c_mktsegment, COUNT(*) AS n_events, "
        + money("SUM(CAST(ROUND(value * 100.0e0) AS BIGINT))")
        + " AS total_value "
        "FROM events JOIN customer ON user_id = c_custkey "
        "GROUP BY c_mktsegment"
    ),
)
def join_salted_events_customer(spark, sf_dir):
    """Skew-resistant salted join: events.user_id is low-cardinality
    (~150 keys for 10k+ rows — every key is 'hot' relative to a 200-way
    shuffle), the textbook case where a plain shuffle join puts entire
    keys on single reducers. Fact side gets salt = event_id % 8
    (deterministic, retry-stable); dim side is replicated 8x via
    explode; join key becomes (custkey, salt). Result is provably
    identical to the plain join — the oracle IS the plain join."""
    ev = tables.load(spark, sf_dir, "events").select(
        "user_id", "value", (F.pmod(F.col("event_id"), F.lit(_SALTS))).alias("salt")
    )
    c = tables.load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.array(*[F.lit(i) for i in range(_SALTS)])).alias("salt_r"),
    )
    return (
        ev.join(
            c,
            (F.col("user_id") == F.col("c_custkey"))
            & (F.col("salt") == F.col("salt_r")),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                money("SUM(CAST(ROUND(value * 100.0e0) AS BIGINT))")
            ).alias("total_value"),
        )
    )


# --- deterministic stratified sampling --------------------------------------
#: per-stratum keep rate in percent (content-hash threshold).
_STRATA_PCT = {
    "purchase": 100,
    "signup": 50,
    "error": 25,
    "click": 10,
    "view": 10,
}


def _strata_case(hash_expr: str) -> str:
    whens = " ".join(
        f"WHEN event_type = '{k}' THEN {v}" for k, v in _STRATA_PCT.items()
    )
    return f"(({hash_expr}) % 100) < (CASE {whens} ELSE 0 END)"


@query(
    "sample_stratified_events",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + " "
        "SELECT event_id, user_id, event_type, value FROM events_t "
        "WHERE " + _strata_case(hashed_id_duck("CAST(event_id AS VARCHAR)"))
    ),
)
def sample_stratified_events(spark, sf_dir):
    """Deterministic stratified sample: keep rate varies per event_type
    (100% of rare purchases, 10% of abundant clicks — the
    rebalance-the-classes shape every training-data pipeline needs).
    Selection = md5(event_id) mod 100 < rate: reproducible across
    engines, retries, partitionings, and scale factors (a row's fate
    never depends on which partition it landed in, unlike sampleBy's
    seeded-RNG draw). Pure narrow filter — zero shuffle."""
    ev = tables.load(spark, sf_dir, "events")
    return ev.filter(
        F.expr(_strata_case(hashed_id_spark("CAST(event_id AS STRING)")))
    ).select("event_id", "user_id", "event_type", "value")


# --- market-basket brand affinity ----------------------------------------

_LIFT_MIN_N = 5

#: lift = P(a,b) / (P(a) P(b)) over orders; all probabilities are
#: single divisions of exact integer counts, snapped to micro-units
_LIFT_U = (
    "CAST(ROUND((CAST(n_ab AS DOUBLE) / CAST(n_orders AS DOUBLE)) / "
    "((CAST(n_a AS DOUBLE) / CAST(n_orders AS DOUBLE)) * "
    "(CAST(n_b AS DOUBLE) / CAST(n_orders AS DOUBLE))) * 1.0e6) AS BIGINT)"
)

_BASKET_ORACLE = f"""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
tot AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM ob),
bf AS (SELECT brand, COUNT(*) AS n FROM ob GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS n_ab
  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
),
scored AS (
  SELECT brand_a, brand_b, n_ab,
         {_LIFT_U.replace('n_a ', 'fa.n ').replace('n_b ', 'fb.n ')} AS lift_u
  FROM pairs
  JOIN bf fa ON fa.brand = brand_a
  JOIN bf fb ON fb.brand = brand_b
  CROSS JOIN tot
  WHERE n_ab >= {_LIFT_MIN_N}
)
SELECT brand_a, brand_b, n_ab,
       CAST(lift_u AS DOUBLE) / 1.0e6 AS lift
FROM scored ORDER BY lift_u DESC, brand_a, brand_b LIMIT 25
"""


@query("basket_brand_lift", oracle=_BASKET_ORACLE)
def basket_brand_lift(spark, sf_dir):
    """Market-basket affinity: top-25 part-brand pairs by lift across
    orders. The brand dimension broadcasts onto lineitem; per-order
    brand sets are gathered by ONE groupBy(order) and pairs expand
    IN-ROW from the sorted set (bounded by brands-per-order, ~7 in this
    schema) — the classic ob-join-ob self-join would shuffle the
    order-brand frame twice and explode skewed orders quadratically in
    the join. Probabilities are single divisions of exact counts,
    snapped before the top-k heap."""
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    pt = tables.load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
    )
    from ..operators.textops import materialize

    sets = materialize(
        ob.groupBy("okey").agg(
            F.expr("sort_array(collect_set(brand))").alias("bs")
        )
    )
    tot = sets.agg(F.count(F.lit(1)).alias("n_orders"))
    bf = sets.select(F.explode("bs").alias("brand")).groupBy("brand").agg(
        F.count(F.lit(1)).alias("n")
    )
    pair_expr = (
        "flatten(transform(bs, (x, i) -> "
        "transform(slice(bs, i + 2, size(bs)), "
        "y -> struct(x AS brand_a, y AS brand_b))))"
    )
    pairs = (
        sets.filter(F.size("bs") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(
            F.col("p.brand_a").alias("brand_a"),
            F.col("p.brand_b").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _LIFT_MIN_N)
    )
    scored = (
        pairs.join(
            F.broadcast(bf.selectExpr("brand AS brand_a", "n AS n_a")),
            "brand_a",
        )
        .join(
            F.broadcast(bf.selectExpr("brand AS brand_b", "n AS n_b")),
            "brand_b",
        )
        .join(F.broadcast(tot))
        .select(
            "brand_a", "brand_b", "n_ab", F.expr(_LIFT_U).alias("lift_u")
        )
    )
    return (
        scored.orderBy(F.desc("lift_u"), "brand_a", "brand_b")
        .limit(25)
        .select(
            "brand_a", "brand_b", "n_ab",
            F.expr("CAST(lift_u AS DOUBLE) / 1.0e6").alias("lift"),
        )
    )


# --- PageRank over the brand co-occurrence graph --------------------------

_PR_ITERS = 3
_PR_D_NUM, _PR_D_DEN = 85, 100  # damping 0.85 as an exact rational

#: shared graph CTEs: symmetric weighted edges from order co-occurrence
_PR_GRAPH = """
ob AS MATERIALIZED (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
pairs AS (
  SELECT a.brand AS ba, b.brand AS bb, COUNT(*) AS w
  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
),
edges AS MATERIALIZED (
  SELECT ba AS src, bb AS dst, w FROM pairs
  UNION ALL
  SELECT bb AS src, ba AS dst, w FROM pairs
),
outw AS MATERIALIZED (
  SELECT src, SUM(w) AS wout FROM edges GROUP BY src
),
nodes AS MATERIALIZED (SELECT src AS brand FROM outw),
nn AS (SELECT COUNT(*) AS n FROM nodes)"""


def _pr_oracle() -> str:
    """Unrolled damped PageRank. Rank vectors live in integer nano-units;
    each edge contribution snaps before the per-destination sum, so every
    iteration is exact integer arithmetic plus one identical IEEE
    expression — bit-equal across engines, like the power-iteration PC1."""
    cte = [_PR_GRAPH, (
        "r0 AS (SELECT brand, CAST(ROUND(1.0e9 / (SELECT n FROM nn)) "
        "AS BIGINT) AS ru FROM nodes)"
    )]
    for k in range(1, _PR_ITERS + 1):
        p = k - 1
        cte.append(f"""s{k} AS (
  SELECT e.dst AS brand,
         SUM(CAST(ROUND(CAST(e.w AS DOUBLE) * CAST(r.ru AS DOUBLE)
           / CAST(o.wout AS DOUBLE)) AS BIGINT)) AS su
  FROM edges e
  JOIN r{p} r ON r.brand = e.src
  JOIN outw o ON o.src = e.src
  GROUP BY e.dst
),
r{k} AS MATERIALIZED (
  SELECT n.brand, CAST(ROUND(
    {100 - _PR_D_NUM}.0e0 / {_PR_D_DEN} * 1.0e9 / (SELECT n FROM nn)
    + {_PR_D_NUM}.0e0 / {_PR_D_DEN} * CAST(COALESCE(s.su, 0) AS DOUBLE)
  ) AS BIGINT) AS ru
  FROM nodes n LEFT JOIN s{k} s ON s.brand = n.brand
)""")
    return (
        "WITH " + ",\n".join(cte)
        + f"""
SELECT brand, CAST(ru AS DOUBLE) / 1.0e9 AS pagerank
FROM r{_PR_ITERS}"""
    )


@query("graph_pagerank_brands", oracle=_pr_oracle())
def graph_pagerank_brands(spark, sf_dir):
    """Damped PageRank (3 iterations, d=0.85) over the brand
    co-occurrence graph induced by orders — the graph-analytics pattern
    on the star schema. The graph builds once (edges + out-weights,
    pinned); each iteration is ONE broadcast join of the rank vector
    (node-cardinality — brands, users, hosts — always << edges) onto the
    edge list and one per-destination sum of nano-snapped contributions,
    so iterations are exact integer arithmetic and match the unrolled
    SQL oracle bit-for-bit. At 100 TB the same loop shuffles edges once
    per iteration on dst; rank state stays dimension-sized."""
    from ..operators.textops import materialize

    # Round 9: pairs come from the shared one-scan grouped-list core
    # (_brand_cooc_pairs) — the old ob-self-join paid a redundant
    # distinct() exchange plus a two-sided join of the (okey, brand)
    # frame; w (orders containing both brands) is identical. The
    # symmetrization is one in-row explode (reads pairs once, so no
    # pairs pin), not a union that consumes the chain twice.
    pairs = _brand_cooc_pairs(spark, sf_dir, pin=False)
    # re-referenced by every pagerank round: cut lineage so per-round
    # plans embed a leaf, not the whole co-occurrence subtree
    edges = materialize(
        pairs.select(
            F.explode(
                F.expr(
                    "array(struct(ba AS src, bb AS dst, w), "
                    "struct(bb AS src, ba AS dst, w))"
                )
            ).alias("e")
        ).select("e.src", "e.dst", "e.w"),
        cut_lineage=True,
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    nodes = outw.select(F.col("src").alias("brand"))
    n = nodes.count()
    ranks = materialize(
        nodes.select(
            "brand",
            F.expr(f"CAST(ROUND(1.0e9 / {n}) AS BIGINT)").alias("ru"),
        )
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(
                F.broadcast(
                    ranks.selectExpr("brand AS src", "ru")
                ),
                "src",
            )
            .join(F.broadcast(outw), "src")
            .groupBy(F.col("dst").alias("brand"))
            .agg(
                F.sum(
                    F.expr(
                        "CAST(ROUND(CAST(w AS DOUBLE) * CAST(ru AS DOUBLE)"
                        " / CAST(wout AS DOUBLE)) AS BIGINT)"
                    )
                ).alias("su")
            )
        )
        ranks = materialize(
            nodes.join(contrib, "brand", "left").select(
                "brand",
                F.expr(
                    f"CAST(ROUND({100 - _PR_D_NUM}.0e0 / {_PR_D_DEN} "
                    f"* 1.0e9 / {n} + {_PR_D_NUM}.0e0 / {_PR_D_DEN} "
                    "* CAST(COALESCE(su, 0) AS DOUBLE)) AS BIGINT)"
                ).alias("ru"),
            ),
            cut_lineage=True,  # loop state: plan must not grow per round
        )
    return ranks.select(
        "brand", F.expr("CAST(ru AS DOUBLE) / 1.0e9").alias("pagerank")
    )


# --- triangle counting / clustering coefficient ---------------------------

#: keep the strongest 30% of co-occurrence edges (exact integer rank
#: cut — 10*rank <= 3*|E| — so the sparsification is engine-exact and
#: scale-relative, never an absolute weight threshold that breaks when
#: the data grows 100x).
_TRI_ORACLE = (
    "WITH " + _PR_GRAPH + ", "
    "ne AS (SELECT COUNT(*) AS n FROM pairs), "
    "rk AS (SELECT ba, bb, ROW_NUMBER() OVER "
    "(ORDER BY w DESC, ba, bb) AS r FROM pairs), "
    "kept AS (SELECT ba, bb FROM rk CROSS JOIN ne WHERE 10 * r <= 3 * ne.n), "
    "tri AS (SELECT e1.ba AS a, e1.bb AS b, e2.bb AS c "
    "FROM kept e1 JOIN kept e2 ON e1.bb = e2.ba "
    "JOIN kept e3 ON e3.ba = e1.ba AND e3.bb = e2.bb), "
    "tn AS (SELECT brand, COUNT(*) AS n_tri FROM ("
    "SELECT a AS brand FROM tri UNION ALL SELECT b FROM tri "
    "UNION ALL SELECT c FROM tri) GROUP BY brand), "
    "deg AS (SELECT brand, COUNT(*) AS degree FROM ("
    "SELECT ba AS brand FROM kept UNION ALL SELECT bb FROM kept) "
    "GROUP BY brand) "
    "SELECT d.brand, d.degree, COALESCE(tn.n_tri, 0) AS n_triangles, "
    "CASE WHEN d.degree >= 2 THEN "
    + rnd(
        "2.0e0 * COALESCE(tn.n_tri, 0) / (d.degree * (d.degree - 1.0e0))",
        6,
    )
    + " ELSE CAST(NULL AS DOUBLE) END AS clustering "
    "FROM deg d LEFT JOIN tn ON tn.brand = d.brand"
)


def _brand_cooc_pairs(spark, sf_dir, pin=True):
    """(ba, bb, w) with ba < bb: brand co-occurrence pairs, w = number
    of orders containing both brands — the shared edge-list core of the
    brand-graph family (triangles, recursive reach, PageRank).

    Round 9, one fact scan: okey-grouped `sort_array(collect_set)` (the
    set dedups within the order, so the old pre-aggregation
    `.distinct()` was a redundant full exchange of the fact-side frame)
    -> in-row ordered pair explode -> pair count. The old self-join
    formulation (`ob JOIN ob ON okey`) paid two exchanges of the
    (okey, brand) frame plus the join; as a twice-referenced CTE inside
    sql_recursive_brand_reach's SQL text it additionally re-derived
    `ob` per reference (the round-7 inlining hazard, now gone: the
    Spark side is this DataFrame chain, the oracle keeps the naive
    SQL). `pin=False` skips the persist for single-consumer callers
    (the kept-edges rank cut reads it exactly once)."""
    from ..operators.textops import materialize

    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    pt = tables.load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    sets = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
        .groupBy("okey")
        .agg(F.expr("sort_array(collect_set(brand))").alias("bs"))
    )
    pair_expr = (
        "flatten(transform(bs, (x, i) -> "
        "transform(slice(bs, i + 2, size(bs)), "
        "y -> struct(x AS ba, y AS bb))))"
    )
    pairs = (
        sets.filter(F.size("bs") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.ba").alias("ba"), F.col("p.bb").alias("bb"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return materialize(pairs) if pin else pairs


def _brand_cooc_kept(spark, sf_dir):
    """The strongest-30% sparsified edge list (exact integer rank cut
    over _brand_cooc_pairs) — shared by the triangle (pinned wrapper
    below: four consumers) and recursive-reach (single consumer,
    un-pinned) queries. The rank window is over the brand-pair
    frame (dimension-sized). The edge count rides the SAME
    single-partition window as the rank (`COUNT(*) OVER ()` reuses the
    exchange) instead of a separate count() action — one job and one
    pass over the pair build instead of two, so the pair frame itself
    no longer needs pinning (the pin knob lives on _brand_cooc_pairs;
    multi-consumer callers use the _brand_cooc_kept_pinned wrapper —
    the reach query reads this un-pinned form exactly once)."""
    from ..operators.textops import materialize

    pairs = _brand_cooc_pairs(spark, sf_dir, pin=False)
    rk = pairs.select(
        "ba",
        "bb",
        F.row_number()
        .over(Window.orderBy(F.desc("w"), "ba", "bb"))
        .alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .alias("n_edges"),
    )
    return rk.filter(F.expr("10 * r <= 3 * n_edges")).select("ba", "bb")


def _brand_cooc_kept_pinned(spark, sf_dir):
    from ..operators.textops import materialize

    return materialize(_brand_cooc_kept(spark, sf_dir))


@query("graph_triangle_brands", oracle=_TRI_ORACLE)
def graph_triangle_brands(spark, sf_dir):
    """Per-brand triangle count + local clustering coefficient on the
    strongest-30% brand co-occurrence graph — the graph-topology
    pattern next to `graph_pagerank_brands` (community cohesion, spam
    detection, feature engineering for graph ML).

    The edge list is brand-cardinality (dimension-sized), so the
    rank-based sparsification window and the three-way triangle
    self-join all run on frames << the fact table; the fact scan
    happens once to build co-occurrence. Triangles enumerate each
    a<b<c exactly once because every kept edge is stored low<high and
    the join chain preserves the order. At 100 TB with a fact-sized
    edge list the same plan holds with the standard degree-ordering
    trick (orient edges from low- to high-degree endpoints) — the
    rank cut here plays that load-bounding role. Counts are integers,
    the coefficient is one snapped division — engine-exact."""
    kept = _brand_cooc_kept_pinned(spark, sf_dir)
    e1, e2, e3 = kept.alias("e1"), kept.alias("e2"), kept.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.bb") == F.col("e2.ba"))
        .join(
            e3,
            (F.col("e3.ba") == F.col("e1.ba"))
            & (F.col("e3.bb") == F.col("e2.bb")),
        )
        .select(
            F.col("e1.ba").alias("a"),
            F.col("e1.bb").alias("b"),
            F.col("e2.bb").alias("c"),
        )
    )
    # corner counting via ONE in-row explode (round 9): the old
    # three-branch union executed the whole triangle join chain once
    # PER BRANCH COLUMN; kept is pinned so its two-branch union was
    # cache reads, but the explode is one pass either way
    tn = (
        tri.select(F.explode(F.expr("array(a, b, c)")).alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    deg = (
        kept.select(F.explode(F.expr("array(ba, bb)")).alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    coeff = (
        "CASE WHEN degree >= 2 THEN "
        + rnd(
            "2.0e0 * COALESCE(n_tri, 0) / (degree * (degree - 1.0e0))", 6
        )
        + " ELSE CAST(NULL AS DOUBLE) END"
    )
    return deg.join(F.broadcast(tn), "brand", "left").select(
        "brand",
        "degree",
        F.expr("COALESCE(n_tri, 0)").alias("n_triangles"),
        F.expr(coeff).alias("clustering"),
    )


# --- forward as-of join: next click at-or-after each purchase -------------


@query(
    "join_asof_purchase_next_click",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "p AS (SELECT event_id, user_id, ts FROM events_t "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts, MAX(value) AS click_value "
        "FROM events_t WHERE event_type = 'click' GROUP BY user_id, ts) "
        "SELECT p.event_id, p.user_id, p.ts, "
        "c.ts AS next_click_ts, c.click_value "
        "FROM p ASOF LEFT JOIN c "
        "ON p.user_id = c.user_id AND p.ts <= c.ts"
    ),
)
def join_asof_purchase_next_click(spark, sf_dir):
    """FORWARD as-of join (pandas merge_asof direction='forward'): each
    purchase paired with the user's next click at-or-after it — the
    post-purchase-behavior twin of join_asof_purchase_last_click.

    Same union+window plan mirrored in time: one shuffle on user_id,
    partition-local sort by (ts, side, value DESC) — purchases sort
    BEFORE clicks at equal ts so "at-or-after" includes ties, and
    descending value makes the first eligible click the MAX-value one,
    matching the oracle's GROUP BY + MAX collapse — then
    first(ignorenulls) over the [current, unbounded following] frame.
    ONE exchange, no pair blowup, O(1) window state."""
    ev = tables.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        "event_id",
        F.lit(None).cast(ev.schema["ts"].dataType).alias("click_ts"),
        F.lit(None).cast("double").alias("click_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", F.desc("click_value"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        clicks.unionByName(purchases)
        .select(
            "event_id",
            "user_id",
            "ts",
            "side",
            F.first("click_ts", ignorenulls=True).over(w).alias(
                "next_click_ts"
            ),
            F.first("click_value", ignorenulls=True).over(w).alias(
                "click_value"
            ),
        )
        .filter(F.col("side") == 0)
        .drop("side")
    )


# --- as-of join via co-grouped pandas -------------------------------------
@query(
    "join_asof_cogrouped_pandas",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "p AS (SELECT event_id, user_id, ts FROM events_t "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts, MAX(value) AS click_value "
        "FROM events_t WHERE event_type = 'click' GROUP BY user_id, ts) "
        "SELECT p.event_id, p.user_id, p.ts, "
        "c.ts AS last_click_ts, c.click_value "
        "FROM p ASOF LEFT JOIN c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts"
    ),
)
def join_asof_cogrouped_pandas(spark, sf_dir):
    """The SAME as-of semantics as `join_asof_purchase_last_click`, but
    through Spark's co-grouped map API: `groupBy(key).cogroup(...)
    .applyInPandas` hands each user's clicks AND purchases to one
    Arrow-batched pandas function that runs `merge_asof` locally. This
    is the escape hatch for per-key algorithms the DataFrame DSL cannot
    express (multi-column nearest-match, custom tolerance logic,
    model scoring per entity): both sides shuffle ONCE on the key,
    Arrow moves each group across the Python boundary in columnar
    batches, and the pair blowup never materializes. The union+window
    form stays the preferred JVM-only plan when semantics allow —
    this query exists to pin the cogroup plumbing (plan shows
    FlatMapCoGroupsInPandas) against the identical DuckDB ASOF oracle.
    Skew note: one group = one pandas call, so a hot user lands on one
    task — profile with events_key_skew_profile first; pandas per-group
    cost is O(n log n) sorts."""
    import pandas as pd

    ev = tables.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )

    out_schema = (
        "event_id bigint, user_id bigint, ts timestamp_ntz, "
        "last_click_ts timestamp_ntz, click_value double"
    )

    def asof(cl: pd.DataFrame, pu: pd.DataFrame) -> pd.DataFrame:
        if len(pu) == 0:
            return pd.DataFrame(
                columns=[
                    "event_id",
                    "user_id",
                    "ts",
                    "last_click_ts",
                    "click_value",
                ]
            )
        pu = pu.sort_values("ts", kind="mergesort")
        if len(cl) == 0:
            out = pu[["event_id", "user_id", "ts"]].copy()
            out["last_click_ts"] = pd.NaT
            out["click_value"] = pd.NA
            return out
        # collapse click ties at equal ts to MAX(value) — matches the
        # oracle's GROUP BY user_id, ts + MAX collapse
        c = (
            cl.groupby("ts", as_index=False)["value"]
            .max()
            .sort_values("ts", kind="mergesort")
        )
        c["last_click_ts"] = c["ts"]
        c = c.rename(columns={"value": "click_value"})
        out = pd.merge_asof(
            pu,
            c,
            on="ts",
            direction="backward",
            allow_exact_matches=True,
        )
        return out[
            ["event_id", "user_id", "ts", "last_click_ts", "click_value"]
        ]

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(asof, schema=out_schema)
    )


# --- as-of join, direction = nearest --------------------------------------

_NEAREST_PICK_BACK = (
    "(fts IS NULL OR (bts IS NOT NULL AND "
    "epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts)))"
)


@query(
    "join_asof_nearest_click",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "p AS (SELECT event_id, user_id, ts FROM events_t "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts, MAX(value) AS click_value "
        "FROM events_t WHERE event_type = 'click' GROUP BY user_id, ts), "
        "b AS (SELECT p.event_id, p.user_id, p.ts, "
        "c.ts AS bts, c.click_value AS bval "
        "FROM p ASOF LEFT JOIN c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts), "
        "f AS (SELECT p.event_id, c.ts AS fts, c.click_value AS fval "
        "FROM p ASOF LEFT JOIN c "
        "ON p.user_id = c.user_id AND p.ts <= c.ts) "
        "SELECT event_id, user_id, ts, "
        f"CASE WHEN {_NEAREST_PICK_BACK} THEN bts ELSE fts END "
        "AS nearest_click_ts, "
        f"CASE WHEN {_NEAREST_PICK_BACK} THEN bval ELSE fval END "
        "AS click_value, "
        "CASE WHEN bts IS NULL AND fts IS NULL THEN NULL "
        f"WHEN {_NEAREST_PICK_BACK} THEN 'backward' ELSE 'forward' END "
        "AS direction, "
        + rnd(
            f"ABS(epoch_us(CASE WHEN {_NEAREST_PICK_BACK} THEN bts "
            "ELSE fts END) - epoch_us(ts)) / 1.0e6",
            4,
        )
        + " AS dt_s FROM b JOIN f USING (event_id)"
    ),
)
def join_asof_nearest_click(spark, sf_dir):
    """As-of join with direction = NEAREST (pandas merge_asof's third
    mode, completing backward / forward / nearest): each purchase pairs
    with whichever click is closest in time, either side, ties to
    backward.

    Fused single-scan plan: ONE scan of events (clicks + purchases
    kept by one IN filter, row shape chosen in-row by CASE — no union,
    no second scan), ONE shuffle on user_id, and BOTH directions
    resolved by two window passes over the same partitioning — the
    backward pass is the
    join_asof_purchase_last_click ordering (clicks before purchases at
    equal ts, value ascending, last(ignorenulls) over the preceding
    frame) and the forward pass the ..._next_click ordering (purchases
    before clicks at equal ts via the flipped side bit, value
    descending, first(ignorenulls) over the following frame). Catalyst
    reuses the exchange and inserts only a second partition-local sort,
    so the whole operator is one scan + one exchange + two sorts — the
    previous composition of the two standalone as-of queries joined on
    event_id scanned events four times and shuffled three (round-7
    scan audit). The tie-break and distance compute on exact integer
    epoch microseconds; dt_s snaps at the edge."""
    eus = (
        "timestampdiff(MICROSECOND, to_timestamp_ntz('1970-01-01 00:00:00'), "
        "{c})"
    )
    ev = tables.load(spark, sf_dir, "events")
    is_click = F.col("event_type") == "click"
    u = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        # backward: clicks first at equal ts; forward: purchases first
        F.when(is_click, 0).otherwise(1).alias("bside"),
        F.when(is_click, 1).otherwise(0).alias("fside"),
        F.when(~is_click, F.col("event_id")).alias("event_id"),
        F.when(is_click, F.col("ts")).alias("click_ts"),
        F.when(is_click, F.col("value")).alias("click_value"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "bside", "click_value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "fside", F.desc("click_value"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    j = (
        u
        .select(
            "event_id",
            "user_id",
            "ts",
            "bside",
            F.last("click_ts", ignorenulls=True).over(wb).alias("bts"),
            F.last("click_value", ignorenulls=True).over(wb).alias("bval"),
            F.first("click_ts", ignorenulls=True).over(wf).alias("fts"),
            F.first("click_value", ignorenulls=True)
            .over(wf)
            .alias("fval"),
        )
        .filter(F.col("bside") == 1)
        .drop("bside")
    )
    pick_back = (
        "(fts IS NULL OR (bts IS NOT NULL AND "
        f"{eus.format(c='ts')} - {eus.format(c='bts')} <= "
        f"{eus.format(c='fts')} - {eus.format(c='ts')}))"
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.expr(f"CASE WHEN {pick_back} THEN bts ELSE fts END").alias(
            "nearest_click_ts"
        ),
        F.expr(f"CASE WHEN {pick_back} THEN bval ELSE fval END").alias(
            "click_value"
        ),
        F.expr(
            "CASE WHEN bts IS NULL AND fts IS NULL THEN NULL "
            f"WHEN {pick_back} THEN 'backward' ELSE 'forward' END"
        ).alias("direction"),
        F.expr(
            rnd(
                f"ABS({eus.format(c='(CASE WHEN ' + pick_back + ' THEN bts ELSE fts END)')}"
                f" - {eus.format(c='ts')}) / 1.0e6",
                4,
            )
        ).alias("dt_s"),
    )


# --- common-neighbor link prediction --------------------------------------

#: shared tail from the weighted-pairs frame: same strongest-30% exact
#: rank cut as graph_triangle_brands, then Jaccard-of-neighborhoods over
#: candidate NON-edges (pairs sharing >= 1 neighbor). Everything after
#: the fact-side co-occurrence build is brand-cardinality.
_LP_TAIL = (
    "ne AS (SELECT COUNT(*) AS n FROM {pairs}), "
    "rk AS (SELECT ba, bb, ROW_NUMBER() OVER "
    "(ORDER BY w DESC, ba, bb) AS r FROM {pairs}), "
    "kept AS (SELECT ba, bb FROM rk CROSS JOIN ne "
    "WHERE 10 * r <= 3 * ne.n), "
    "adj AS (SELECT ba AS a, bb AS b FROM kept "
    "UNION ALL SELECT bb AS a, ba AS b FROM kept), "
    "deg AS (SELECT a, COUNT(*) AS d FROM adj GROUP BY a), "
    "cn AS (SELECT x.a AS u, y.a AS v, COUNT(*) AS common "
    "FROM adj x JOIN adj y ON x.b = y.b AND x.a < y.a "
    "GROUP BY x.a, y.a), "
    "nonedge AS (SELECT u, v, common FROM cn LEFT JOIN kept k "
    "ON k.ba = cn.u AND k.bb = cn.v WHERE k.ba IS NULL), "
    "scored AS (SELECT u, v, common, du.d AS deg_u, dv.d AS deg_v, "
    + rnd("CAST(common AS DOUBLE) / (du.d + dv.d - common)", 6)
    + " AS jaccard FROM nonedge "
    "JOIN deg du ON du.a = nonedge.u JOIN deg dv ON dv.a = nonedge.v) "
    "SELECT u AS brand1, v AS brand2, CAST(common AS BIGINT) AS n_common, "
    "CAST(deg_u AS BIGINT) AS deg_u, CAST(deg_v AS BIGINT) AS deg_v, "
    "jaccard FROM scored ORDER BY jaccard DESC, brand1, brand2 LIMIT 10"
)


def _order_brands(spark, sf_dir):
    """(okey, brand) DISTINCT — the one fact-cardinality frame of the
    basket/graph family: lineitem x broadcast part dim, projected to
    the order/brand pair. Unmaterialized by design; callers that read
    it more than once (basket_association_rules needs both the pair
    build and per-brand counts) materialize it themselves so the fact
    scan + distinct exchange run ONCE instead of per consumer."""
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    pt = tables.load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(
            F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand")
        )
        .distinct()
    )


def _brand_pairs(spark, sf_dir, ob=None):
    """Weighted brand co-occurrence pairs (ba < bb) from order baskets —
    the same fact-side build as graph_triangle_brands: broadcast part
    dim join, per-order brand set, IN-ROW pair explode (baskets are
    small), one hash-agg. This is the only fact-cardinality work in the
    graph family. `ob` overrides the (okey, brand) frame so callers
    that also consume it directly share one scan."""
    from ..operators.textops import materialize

    if ob is None:
        ob = _order_brands(spark, sf_dir)
    sets = (
        ob.groupBy("okey")
        .agg(F.expr("sort_array(collect_set(brand))").alias("bs"))
    )
    pair_expr = (
        "flatten(transform(bs, (x, i) -> "
        "transform(slice(bs, i + 2, size(bs)), "
        "y -> struct(x AS ba, y AS bb))))"
    )
    pairs = (
        sets.filter(F.size("bs") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(F.col("p.ba").alias("ba"), F.col("p.bb").alias("bb"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return materialize(pairs)


@query(
    "graph_link_prediction_brands",
    oracle="WITH " + _PR_GRAPH + ", " + _LP_TAIL.format(pairs="pairs"),
)
def graph_link_prediction_brands(spark, sf_dir):
    """Common-neighbor link prediction on the sparsified brand graph:
    for every non-adjacent brand pair sharing at least one neighbor,
    the Jaccard similarity of their neighborhoods — top-10 predicted
    links (recommendation candidates / graph-completion features).
    Completes the graph family: components (dedup_clusters), triangles,
    PageRank, and now prediction. The candidate set is generated by the
    neighbor self-join (never all-pairs), the non-edge filter is an
    anti join against the kept edge list, and every frame past the one
    fact-cardinality co-occurrence build is brand-sized; counts are
    exact integers and the score is one snapped division."""
    pairs = _brand_pairs(spark, sf_dir)
    pairs.createOrReplaceTempView("lp_pairs")
    return spark.sql("WITH " + _LP_TAIL.format(pairs="lp_pairs"))


# --- multi-touch attribution (linear credit) -------------------------------

_ATTR_S = 3600  # look-back window in seconds == bucket width


@query(
    "events_attribution_linear",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "tp AS (SELECT DISTINCT p.event_id AS pid, "
        "c.event_type AS touch_type "
        "FROM events_t p JOIN events_t c ON c.user_id = p.user_id "
        "AND c.event_type <> 'purchase' "
        "AND c.ts >= p.ts - INTERVAL 60 MINUTE AND c.ts < p.ts "
        "WHERE p.event_type = 'purchase'), "
        "nt AS (SELECT pid, COUNT(*) AS n FROM tp GROUP BY pid), "
        "cr AS (SELECT touch_type, "
        "CAST(ROUND(1.0e6 / n) AS BIGINT) AS credit_u "
        "FROM tp JOIN nt USING (pid)) "
        "SELECT touch_type, COUNT(*) AS n_conversions_touched, "
        "CAST(SUM(credit_u) AS BIGINT) AS credit_u_total "
        "FROM cr GROUP BY touch_type"
    ),
)
def events_attribution_linear(spark, sf_dir):
    """Linear multi-touch attribution: every event type seen for the
    user in the 60 minutes before a purchase shares that conversion's
    credit equally (1/n to each distinct touching type). The
    marketing-analytics counterpart of the funnel family —
    join_asof_purchase_last_click IS last-touch attribution; this is
    the fractional model. Same bucketized band join as
    join_range_clicks_before_purchase (probe buckets {b-1, b}, exact
    range re-checked — a hash join, never a time-inequality NLJ); the
    per-conversion share snaps to integer micro-credits at its single
    division so the corpus-wide credit sums are exact BIGINTs."""
    ev = tables.load(spark, sf_dir, "events")
    bucket = (
        "CAST(FLOOR(timestampdiff(SECOND, "
        f"to_timestamp_ntz('1970-01-01 00:00:00'), ts) / {_ATTR_S}) AS BIGINT)"
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_type").alias("touch_type"),
        F.expr(bucket).alias("c_bucket"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", F.expr(bucket).alias("pb"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.explode(F.array(F.col("pb") - 1, F.col("pb"))).alias(
                "probe_bucket"
            ),
        )
    )
    tp = (
        purchases.join(
            touches,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("probe_bucket") == F.col("c_bucket"))
            & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 60 MINUTE"))
            & (F.col("c_ts") < F.col("ts")),
        )
        .select(F.col("event_id").alias("pid"), "touch_type")
        .distinct()
    )
    nt = tp.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    return (
        tp.join(nt, "pid")
        .select(
            "touch_type",
            F.expr("CAST(ROUND(1.0e6 / n) AS BIGINT)").alias("credit_u"),
        )
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_conversions_touched"),
            F.sum("credit_u").cast("bigint").alias("credit_u_total"),
        )
    )


# --- attribution window sensitivity ----------------------------------------

_AWS_WINDOWS = [10, 30, 60]  # minutes


def _aws_oracle() -> str:
    """Per-window linear-attribution credit totals per touch type —
    three window widths in one statement, each arm the same distinct-
    touch / micro-credit aggregation as events_attribution_linear."""
    arms = []
    for w in _AWS_WINDOWS:
        arms.append(
            f"(WITH tp AS (SELECT DISTINCT p.event_id AS pid, "
            "c.event_type AS touch_type "
            "FROM events_t p JOIN events_t c ON c.user_id = p.user_id "
            "AND c.event_type <> 'purchase' "
            f"AND c.ts >= p.ts - INTERVAL {w} MINUTE AND c.ts < p.ts "
            "WHERE p.event_type = 'purchase'), "
            "nt AS (SELECT pid, COUNT(*) AS n FROM tp GROUP BY pid), "
            "cr AS (SELECT touch_type, "
            "CAST(ROUND(1.0e6 / n) AS BIGINT) AS credit_u "
            "FROM tp JOIN nt USING (pid)) "
            f"SELECT {w} AS window_minutes, touch_type, "
            "COUNT(*) AS n_conversions_touched, "
            "CAST(SUM(credit_u) AS BIGINT) AS credit_u_total "
            "FROM cr GROUP BY touch_type)"
        )
    return (
        "WITH " + tables.EVENTS_ORACLE_CTE + " "
        + " UNION ALL ".join(arms)
    )


@query("events_attribution_window_sensitivity", oracle=_aws_oracle())
def events_attribution_window_sensitivity(spark, sf_dir):
    """Attribution-window sensitivity matrix: linear credit totals per
    touch type at 10 / 30 / 60-minute look-backs — the tuning table
    that must be read BEFORE events_attribution_linear's single-window
    number drives budget (credit that swings hard with the window is
    an artifact of the window, not the channel; the self-evaluation
    doctrine applied to attribution). Each arm reuses the bucketized
    band join with the bucket width matched to its window, so no arm
    ever pays a time-inequality NLJ. The fact frame is MATERIALIZED:
    three window arms each read it twice (touch side + purchase side),
    and unpersisted that was six parquet scans per run (round-7 scan
    audit)."""
    from ..operators.textops import materialize as _mat

    ev = _mat(tables.load(spark, sf_dir, "events"))
    out = None
    for w in _AWS_WINDOWS:
        band_s = w * 60
        bucket = (
            "CAST(FLOOR(timestampdiff(SECOND, "
            f"to_timestamp_ntz('1970-01-01 00:00:00'), ts) / {band_s}) "
            "AS BIGINT)"
        )
        touches = ev.filter(F.col("event_type") != "purchase").select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_type").alias("touch_type"),
            F.expr(bucket).alias("c_bucket"),
        )
        purchases = (
            ev.filter(F.col("event_type") == "purchase")
            .select(
                "event_id", "user_id", "ts", F.expr(bucket).alias("pb")
            )
            .select(
                "event_id",
                "user_id",
                "ts",
                F.explode(
                    F.array(F.col("pb") - 1, F.col("pb"))
                ).alias("probe_bucket"),
            )
        )
        tp = (
            purchases.join(
                touches,
                (F.col("user_id") == F.col("c_user"))
                & (F.col("probe_bucket") == F.col("c_bucket"))
                & (
                    F.col("c_ts")
                    >= F.col("ts") - F.expr(f"INTERVAL {w} MINUTE")
                )
                & (F.col("c_ts") < F.col("ts")),
            )
            .select(F.col("event_id").alias("pid"), "touch_type")
            .distinct()
        )
        nt = tp.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
        arm = (
            tp.join(nt, "pid")
            .select(
                "touch_type",
                F.expr("CAST(ROUND(1.0e6 / n) AS BIGINT)").alias(
                    "credit_u"
                ),
            )
            .groupBy("touch_type")
            .agg(
                F.count(F.lit(1)).alias("n_conversions_touched"),
                F.sum("credit_u").cast("bigint").alias("credit_u_total"),
            )
            .select(
                F.lit(w).alias("window_minutes"),
                "touch_type",
                "n_conversions_touched",
                "credit_u_total",
            )
        )
        out = arm if out is None else out.unionByName(arm)
    return out


# --- association rules (support / confidence / lift) -----------------------

_AR_MIN_W = 3
_AR_TOP = 15

_AR_TAIL = (
    "bc AS (SELECT brand, COUNT(*) AS nb FROM ob GROUP BY brand), "
    "nt AS (SELECT COUNT(DISTINCT okey) AS n FROM ob), "
    "dir AS (SELECT ba AS a, bb AS b, w FROM pairs "
    "UNION ALL SELECT bb AS a, ba AS b, w FROM pairs), "
    "rules AS (SELECT d.a, d.b, d.w, ca.nb AS na, cb.nb AS nbb "
    "FROM dir d JOIN bc ca ON ca.brand = d.a "
    "JOIN bc cb ON cb.brand = d.b "
    f"WHERE d.w >= {_AR_MIN_W}) "
    "SELECT a AS antecedent, b AS consequent, "
    "CAST(w AS BIGINT) AS n_cooccur, "
    + rnd("CAST(w AS DOUBLE) / (SELECT n FROM nt)", 6) + " AS support, "
    + rnd("CAST(w AS DOUBLE) / na", 6) + " AS confidence, "
    + rnd(
        "CAST(w AS DOUBLE) * (SELECT n FROM nt) / "
        "(CAST(na AS DOUBLE) * nbb)",
        6,
    )
    + " AS lift FROM rules "
    f"ORDER BY confidence DESC, antecedent, consequent LIMIT {_AR_TOP}"
)


@query(
    "basket_association_rules",
    oracle="WITH " + _PR_GRAPH + ", " + _AR_TAIL,
)
def basket_association_rules(spark, sf_dir):
    """Association rules over order baskets: for every directed brand
    pair above minimum co-occurrence, support / confidence / lift —
    the rule form ('orders with A also contain B x% of the time')
    that basket_brand_lift's symmetric lift matrix cannot express,
    ranked by confidence on a top-k heap. Rides the shared
    co-occurrence build (_brand_pairs: one fact scan, in-row basket
    pair explode); everything after is brand-cardinality with exact
    integer counts and snapped ratios. The (okey, brand) frame is
    materialized ONCE and feeds the pair build, the per-brand counts,
    and the basket total; the total and the brand counts ride BROADCAST
    joins, not scalar subqueries — before round 7 this query ran the
    fact scan + distinct exchange twice, and each scalar `(SELECT n
    FROM nt)` re-scanned the fact table again (3 extra full scans in
    the ledger profile, a 100-TB disqualifier)."""
    from ..operators.textops import materialize as _mat

    ob = _mat(_order_brands(spark, sf_dir))
    pairs = _brand_pairs(spark, sf_dir, ob=ob)
    bc = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("nb"))
    nt = ob.agg(F.countDistinct("okey").alias("n"))
    dirdf = pairs.select(
        F.col("ba").alias("a"), F.col("bb").alias("b"), "w"
    ).unionByName(
        pairs.select(F.col("bb").alias("a"), F.col("ba").alias("b"), "w")
    )
    rules = (
        dirdf.filter(F.col("w") >= _AR_MIN_W)
        .join(
            F.broadcast(
                bc.select(F.col("brand").alias("a"), F.col("nb").alias("na"))
            ),
            "a",
        )
        .join(
            F.broadcast(
                bc.select(F.col("brand").alias("b"), F.col("nb").alias("nbb"))
            ),
            "b",
        )
        .crossJoin(F.broadcast(nt))
    )
    return (
        rules.select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            F.col("w").cast("bigint").alias("n_cooccur"),
            F.expr(rnd("CAST(w AS DOUBLE) / n", 6)).alias("support"),
            F.expr(rnd("CAST(w AS DOUBLE) / na", 6)).alias("confidence"),
            F.expr(
                rnd(
                    "CAST(w AS DOUBLE) * n / (CAST(na AS DOUBLE) * nbb)",
                    6,
                )
            ).alias("lift"),
        )
        .orderBy(F.desc("confidence"), "antecedent", "consequent")
        .limit(_AR_TOP)
    )


# --- Shapley-value attribution ---------------------------------------------

def _fact(x: str) -> str:
    """Exact factorial for 0..8 as an engine-neutral CASE (channel
    counts past 8 make exact Shapley the wrong tool anyway — sample
    permutations instead)."""
    return (
        f"CASE ({x}) WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 "
        "WHEN 3 THEN 6 WHEN 4 THEN 24 WHEN 5 THEN 120 WHEN 6 THEN 720 "
        "WHEN 7 THEN 5040 WHEN 8 THEN 40320 END"
    )


def _shapley_sql(
    src: str, nch_expr: str = "COUNT(*)", g_rel: str | None = None
) -> str:
    """Shared text: coalition = the SET of channels a user touched
    before first purchase (bitmask over the sorted channel list),
    v(S) = that coalition's observed conversion rate (nano-snapped),
    and the exact Shapley sum decomposed over OBSERVED coalitions only:
    n! * phi_c = sum_{U obs, c in U} (|U|-1)!(n-|U|)! v(U)
               - sum_{S obs, c notin S} |S|!(n-|S|-1)! v(S)
    (unobserved coalitions carry v = 0, so they cancel from both
    terms — no 2^n enumeration ever happens).

    `nch_expr` is the channel-count aggregate in the nch CTE; the Spark
    caller passes an assert_true-wrapped form so the >8-channel guard
    rides this existing aggregate LAZILY (no eager job at
    DataFrame-construction time — round-4 ADVICE) while the DuckDB
    oracle keeps the plain count.

    `g_rel` names a pre-materialized (user_id, event_type, mt) frame
    of per-(user, type) FIRST timestamps: `fp` is then a re-aggregate
    of it and `tc` the 'first touch of chn strictly before the first
    purchase' filter — exactly the original from-source semantics
    (∃ event of type t with ts < pt ⇔ MIN(ts of t) < pt) off ONE fact
    scan. Without it, Spark's CTE inlining re-derived fp/tc per
    reference: 4x events parquet scans (round-7 scan audit)."""
    bit = "CAST(ROUND(POWER(2.0e0, idx)) AS BIGINT)"
    if g_rel:
        prefix = (
            "fp AS (SELECT user_id, MIN(CASE WHEN event_type = "
            f"'purchase' THEN mt END) AS pt FROM {g_rel} "
            "GROUP BY user_id), "
            f"tc AS (SELECT g.user_id, g.event_type AS chn FROM {g_rel} g "
            "JOIN fp ON fp.user_id = g.user_id "
            "WHERE g.event_type <> 'purchase' "
            "AND (fp.pt IS NULL OR g.mt < fp.pt)), "
        )
    else:
        prefix = (
            "fp AS (SELECT user_id, MIN(CASE WHEN event_type = 'purchase' "
            f"THEN ts END) AS pt FROM {src} GROUP BY user_id), "
            "tc AS (SELECT DISTINCT e.user_id, e.event_type AS chn "
            f"FROM {src} e JOIN fp ON fp.user_id = e.user_id "
            "WHERE e.event_type <> 'purchase' "
            "AND (fp.pt IS NULL OR e.ts < fp.pt)), "
        )
    return (
        prefix +
        "chan AS (SELECT chn, CAST(ROW_NUMBER() OVER (ORDER BY chn) - 1 "
        "AS INT) AS idx FROM (SELECT DISTINCT chn FROM tc) z), "
        f"nch AS (SELECT {nch_expr} AS n FROM chan), "
        "um AS (SELECT fp.user_id, "
        "MAX(CASE WHEN fp.pt IS NULL THEN 0 ELSE 1 END) AS conv, "
        f"COALESCE(SUM({bit}), 0) AS mask "
        "FROM fp LEFT JOIN tc ON tc.user_id = fp.user_id "
        "LEFT JOIN chan ON chan.chn = tc.chn GROUP BY fp.user_id), "
        "co AS (SELECT mask, COUNT(*) AS nu, "
        "CAST(ROUND(1.0e9 * SUM(conv) / COUNT(*)) AS BIGINT) AS vu "
        "FROM um GROUP BY mask), "
        "ph AS (SELECT ch.chn, SUM(CASE WHEN (co.mask & ch.bit) <> 0 "
        "THEN " + _fact("bit_count(co.mask) - 1") + " * "
        + _fact("n - bit_count(co.mask)")
        + " * co.vu ELSE -" + _fact("bit_count(co.mask)") + " * "
        + _fact("n - bit_count(co.mask) - 1")
        + " * co.vu END) AS phi_u, MAX(n) AS n FROM co CROSS JOIN "
        f"(SELECT chn, idx, {bit} AS bit FROM chan) ch "
        "CROSS JOIN nch GROUP BY ch.chn), "
        "tch AS (SELECT chn, COUNT(*) AS n_users FROM tc GROUP BY chn) "
        "SELECT ph.chn AS channel, "
        "CAST(tch.n_users AS BIGINT) AS n_users_touched, "
        + rnd(
            "CAST(phi_u AS DOUBLE) / (" + _fact("n") + " * 1.0e9)", 6
        )
        + " AS shapley_value, "
        "CASE WHEN SUM(phi_u) OVER () = 0 THEN NULL ELSE "
        + rnd("CAST(phi_u AS DOUBLE) / SUM(phi_u) OVER ()", 6)
        + " END AS shapley_share "
        "FROM ph JOIN tch ON tch.chn = ph.chn"
    )


@query(
    "events_shapley_attribution",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        + _shapley_sql("events_t")
    ),
)
def events_shapley_attribution(spark, sf_dir):
    """Shapley-value multi-touch attribution (the cooperative-game
    counterpart of the Markov removal effect, and the method ad
    platforms actually shipped as 'data-driven attribution'): each
    channel's credit is its average marginal contribution to the
    conversion rate across all orderings of the channel coalition.
    Characteristic function v(S) = observed conversion rate of users
    whose pre-purchase touch set is exactly S; the exact Shapley sum
    runs over OBSERVED coalitions only (unobserved S have v = 0 and
    cancel), so the 2^n lattice never materializes — the whole
    computation after the one touch-set aggregate is
    (coalitions x channels) rows, broadcast-sized at any corpus scale.
    Coalition membership is a bitmask over the deterministic sorted
    channel order; conversion rates snap to nano-units and the
    factorial weights are exact integers, so every engine agrees to
    the bit. Compare with events_markov_attribution (path-model
    credit) and events_attribution_linear (heuristic): disagreement
    between the three is the signal that budget decisions need a
    holdout experiment, not a better model.

    Guard: the exact factorial table covers n <= 8 channels (past that
    the CASE would yield NULL and SUM would silently skip coalitions,
    returning plausible-but-wrong credits). The guard is LAZY — an
    assert_true wrapped around the channel count inside the existing
    nch CTE, so it raises loudly at execution time with zero extra
    jobs, scans, or plan stages (construction stays plan-only like
    every other registry query; the round-4 eager distinct().count()
    polluted bench/ledger measurements) — at >8 channels sample
    permutations, don't enumerate.

    Single scan: events reduces ONCE to the materialized per-(user,
    type) first-timestamp frame `g`; fp and tc both re-aggregate it
    ('touched chn before first purchase' ⇔ MIN(ts of chn) < pt — the
    original from-source semantics exactly), so the four CTE reference
    chains re-read the persisted reduction instead of re-deriving the
    fact scan (4x events reads, round-7 scan audit)."""
    from ..operators.textops import materialize as _mat

    ev = tables.load(spark, sf_dir, "events")
    g = _mat(
        ev.groupBy("user_id", "event_type").agg(F.min("ts").alias("mt"))
    )
    g.createOrReplaceTempView("adv_shapley_g")
    guarded_n = (
        "CASE WHEN COUNT(*) <= 8 THEN COUNT(*) ELSE "
        "CAST(assert_true(COUNT(*) <= 8, CONCAT("
        "'events_shapley_attribution: ', CAST(COUNT(*) AS STRING), "
        "' distinct non-purchase channels, but exact Shapley factorial "
        "weights are tabulated (and BIGINT-safe) only to n = 8. "
        "Refusing to return NULL-poisoned coalition credits — use "
        "sampled permutations for wide channel sets.')) AS BIGINT) END"
    )
    return spark.sql(
        "WITH "
        + _shapley_sql(
            "adv_shapley_g", nch_expr=guarded_n, g_rel="adv_shapley_g"
        )
    )


# --- as-of join with tolerance (pandas merge_asof tolerance=) --------------

#: max staleness for an as-of match: 30 minutes, in microseconds
_ASOF_TOL_US = 30 * 60 * 1_000_000


@query(
    "join_asof_tolerance",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "p AS (SELECT event_id, user_id, ts FROM events_t "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts, MAX(value) AS click_value "
        "FROM events_t WHERE event_type = 'click' GROUP BY user_id, ts), "
        "m AS (SELECT p.event_id, p.user_id, p.ts, "
        "c.ts AS m_ts, c.click_value AS m_val "
        "FROM p ASOF LEFT JOIN c "
        "ON p.user_id = c.user_id AND p.ts >= c.ts) "
        "SELECT event_id, user_id, ts, "
        "CASE WHEN m_ts IS NOT NULL AND "
        f"epoch_us(ts) - epoch_us(m_ts) <= {_ASOF_TOL_US} "
        "THEN m_ts END AS last_click_ts, "
        "CASE WHEN m_ts IS NOT NULL AND "
        f"epoch_us(ts) - epoch_us(m_ts) <= {_ASOF_TOL_US} "
        "THEN m_val END AS click_value, "
        "CAST(m_ts IS NOT NULL AND "
        f"epoch_us(ts) - epoch_us(m_ts) > {_ASOF_TOL_US} "
        "AS BOOLEAN) AS dropped_stale FROM m"
    ),
)
def join_asof_tolerance(spark, sf_dir):
    """AS-OF join with a TOLERANCE bound (pandas merge_asof's
    `tolerance=`): the last click at-or-before each purchase counts
    only when it is at most 30 minutes old — a stale match is worse
    than no match for attribution and feature freshness (a
    point-in-time feature older than the tolerance is a leak of
    staleness, not information). Same single-shuffle union+window plan
    as join_asof_purchase_last_click; the tolerance is one epoch-us
    comparison applied AFTER the carry, so the plan cost is identical
    and the dropped_stale flag records which matches the bound
    rejected (the audit column a pipeline alerts on when staleness
    spikes). DuckDB oracle: native ASOF LEFT JOIN + the same
    post-filter."""
    ev = tables.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast(ev.schema["ts"].dataType).alias("click_ts"),
        F.lit(None).cast("double").alias("click_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "click_value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = (
        "timestampdiff(MICROSECOND, to_timestamp_ntz("
        "'1970-01-01 00:00:00'), ts) - "
        "timestampdiff(MICROSECOND, to_timestamp_ntz("
        "'1970-01-01 00:00:00'), m_ts)"
    )
    fresh = f"(m_ts IS NOT NULL AND {gap} <= {_ASOF_TOL_US})"
    return (
        clicks.unionByName(purchases)
        .select(
            "event_id",
            "user_id",
            "ts",
            "side",
            F.last("click_ts", ignorenulls=True).over(w).alias("m_ts"),
            F.last("click_value", ignorenulls=True).over(w).alias("m_val"),
        )
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.expr(f"CASE WHEN {fresh} THEN m_ts END").alias(
                "last_click_ts"
            ),
            F.expr(f"CASE WHEN {fresh} THEN m_val END").alias(
                "click_value"
            ),
            F.expr(
                f"CAST(m_ts IS NOT NULL AND {gap} > {_ASOF_TOL_US} "
                "AS BOOLEAN)"
            ).alias("dropped_stale"),
        )
    )


# --- strict as-of join (pandas merge_asof allow_exact_matches=False) -------

@query(
    "join_asof_strict_before",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "p AS (SELECT event_id, user_id, ts FROM events_t "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts, MAX(value) AS click_value "
        "FROM events_t WHERE event_type = 'click' GROUP BY user_id, ts) "
        "SELECT p.event_id, p.user_id, p.ts, "
        "c.ts AS last_click_ts, c.click_value "
        "FROM p ASOF LEFT JOIN c "
        "ON p.user_id = c.user_id AND p.ts > c.ts"
    ),
)
def join_asof_strict_before(spark, sf_dir):
    """STRICT as-of join (pandas merge_asof allow_exact_matches=False;
    DuckDB's ASOF with `>` instead of `>=`): the last click STRICTLY
    before each purchase — the tie-exclusion matters whenever the
    matched event could be a consequence of the probe event at the
    same timestamp (same-instant click caused BY the purchase page is
    not attribution, and a feature recorded at exactly the label time
    is leakage in point-in-time training joins). Identical
    single-shuffle union+window plan as join_asof_purchase_last_click
    with ONE flipped bit: purchases sort BEFORE clicks at equal ts
    (side 0 vs 1), so the carry can never see a same-instant click.
    Same cost, different — and for ML joins, safer — semantics."""
    ev = tables.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        "event_id",
        F.lit(None).cast(ev.schema["ts"].dataType).alias("click_ts"),
        F.lit(None).cast("double").alias("click_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "click_value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .select(
            "event_id",
            "user_id",
            "ts",
            "side",
            F.last("click_ts", ignorenulls=True)
            .over(w)
            .alias("last_click_ts"),
            F.last("click_value", ignorenulls=True)
            .over(w)
            .alias("click_value"),
        )
        .filter(F.col("side") == 0)
        .drop("side")
    )
