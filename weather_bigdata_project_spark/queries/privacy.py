"""Privacy / re-identification audits over the training-data tables.

A curation pipeline that ships user-derived data into a training corpus
owes the same pre-flight it owes dedup and contamination: how close is
any row to being re-identifiable from its quasi-identifiers? These
queries implement the standard k-anonymity audit (Sweeney 2002) and the
generalization-lattice trade-off a release process actually walks —
each level coarsens one quasi-identifier and buys anonymity with
utility. Reference has no privacy surface (its PII handling is
text-level, twinned by text_pii_redact); this family extends it with
the record-level audit.

Float discipline: bucket edges are single IEEE divisions + FLOOR,
identical in both engines; all reported rates are exact-integer ratios
divided once and snapped at the output edge.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .. import tables
from ..functions.exprs import rnd
from ..registry import query

#: a quasi-identifier group with fewer than K_T members is "at risk":
#: an attacker who knows the quasi-identifiers narrows a target to
#: under K_T candidate rows
_K_T = 5

#: the quasi-identifier set for the customer table: coarse geography,
#: market segment, and account balance rounded to $1000 buckets — the
#: classic (zip, birth-date, sex)-shaped triple for this schema
_QI_BUCKET = "CAST(FLOOR(c_acctbal / 1000.0e0) AS BIGINT)"


@query(
    "privacy_k_anonymity",
    oracle=(
        "SELECT c_nationkey AS nation_key, c_mktsegment AS segment, "
        f"{_QI_BUCKET} AS bal_kbucket, "
        "CAST(COUNT(*) AS BIGINT) AS k, "
        f"COUNT(*) < {_K_T} AS at_risk "
        "FROM customer GROUP BY 1, 2, 3"
    ),
)
def privacy_k_anonymity(spark, sf_dir):
    """k-anonymity audit: every quasi-identifier equivalence class in
    the customer table with its size k. A class with k < 5 means those
    customers are re-identifiable by anyone who knows (nation, segment,
    approximate balance) — the rows a privacy review blocks from
    release or generalizes further (privacy_generalization_tradeoff
    walks that lattice). ONE hash aggregate at quasi-identifier
    cardinality; at 100 TB the group count is bounded by the QI
    domain (~10^4 here), so the result is always broadcast-sized
    regardless of row count."""
    c = tables.load(spark, sf_dir, "customer")
    return c.groupBy(
        F.col("c_nationkey").alias("nation_key"),
        F.col("c_mktsegment").alias("segment"),
        F.expr(_QI_BUCKET).alias("bal_kbucket"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (F.count(F.lit(1)) < _K_T).alias("at_risk"),
    )


#: the generalization lattice: level -> (description, needs_region,
#: balance-bucket SQL or None). Each level strictly coarsens the
#: previous — finer balance buckets, then coarser, then nation->region,
#: then dropping balance entirely.
_LATTICE = [
    (0, "nation+segment+bal500", False, "FLOOR(c_acctbal / 500.0e0)"),
    (1, "nation+segment+bal2000", False, "FLOOR(c_acctbal / 2000.0e0)"),
    (2, "region+segment+bal2000", True, "FLOOR(c_acctbal / 2000.0e0)"),
    (3, "region+segment", True, None),
]


def _lattice_oracle() -> str:
    rows = []
    for lvl, desc, use_region, bucket in _LATTICE:
        geo = "n.n_regionkey" if use_region else "c.c_nationkey"
        b = f"CAST({bucket} AS BIGINT)" if bucket else "CAST(0 AS BIGINT)"
        rows.append(
            f"SELECT {lvl} AS level, '{desc}' AS generalization, "
            "CAST(COUNT(*) AS BIGINT) AS n_groups, "
            "CAST(SUM(k) AS BIGINT) AS n_rows, "
            f"CAST(SUM(CASE WHEN k < {_K_T} THEN k ELSE 0 END) AS BIGINT) "
            "AS rows_at_risk, "
            + rnd(
                f"CAST(SUM(CASE WHEN k < {_K_T} THEN k ELSE 0 END) "
                "AS DOUBLE) / SUM(k)",
                6,
            )
            + " AS pct_at_risk, "
            "CAST(MIN(k) AS BIGINT) AS min_k "
            "FROM (SELECT COUNT(*) AS k FROM customer c "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey "
            f"GROUP BY {geo}, c.c_mktsegment, {b})"
        )
    return " UNION ALL ".join(rows)


@query("privacy_generalization_tradeoff", oracle=_lattice_oracle())
def privacy_generalization_tradeoff(spark, sf_dir):
    """The k-anonymity generalization lattice, measured: four
    generalization levels of the customer quasi-identifiers (finer ->
    coarser balance buckets, nation -> region, then dropping balance),
    each with its group count, rows still at risk (in classes smaller
    than k=5), and the at-risk fraction — the privacy/utility curve a
    release process reads to pick the cheapest generalization that
    clears its k threshold. ONE QI-cardinality aggregate over one
    broadcast nation join builds the FINEST grid (nation x segment x
    500-wide bucket, region carried alongside — functional on nation,
    so the grouping is unchanged), materialized; every coarser level
    re-aggregates it, which is exact because the lattice strictly
    nests: 2000 = 4 x 500 and floor(x/2000) == floor(floor(x/500)/4)
    for ANY real x (the nested-floor identity), nation -> region is a
    functional map, and level 3 just drops the bucket key. The
    previous form re-ran the fact scan per level (3.97x, round-7 scan
    audit); now the lattice costs one map-side-combine pass at 100 TB
    and three grid-sized rollups."""
    from ..operators.textops import materialize as _mat

    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    base = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    fine = _mat(
        base.groupBy(
            F.col("c_nationkey").alias("nk"),
            F.col("n_regionkey").alias("rk"),
            F.col("c_mktsegment").alias("s"),
            F.expr(
                "CAST(FLOOR(c_acctbal / 500.0e0) AS BIGINT)"
            ).alias("b500"),
        ).agg(F.count(F.lit(1)).alias("k0"))
    )
    #: per level: (geo key, bucket rollup of b500)
    _ROLLUP = {
        0: ("nk", "b500"),
        1: ("nk", "CAST(FLOOR(b500 / 4.0e0) AS BIGINT)"),
        2: ("rk", "CAST(FLOOR(b500 / 4.0e0) AS BIGINT)"),
        3: ("rk", "CAST(0 AS BIGINT)"),
    }
    out = None
    for lvl, desc, _use_region, _bucket in _LATTICE:
        geo, b = _ROLLUP[lvl]
        grp = fine.groupBy(
            F.expr(geo).alias("g"),
            F.col("s"),
            F.expr(b).alias("b"),
        ).agg(F.sum("k0").alias("k"))
        row = grp.agg(
            F.lit(lvl).alias("level"),
            F.lit(desc).alias("generalization"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("k").cast("bigint").alias("n_rows"),
            F.sum(F.expr(f"CASE WHEN k < {_K_T} THEN k ELSE 0 END"))
            .cast("bigint")
            .alias("rows_at_risk"),
            F.expr(
                rnd(
                    f"CAST(SUM(CASE WHEN k < {_K_T} THEN k ELSE 0 END) "
                    "AS DOUBLE) / SUM(k)",
                    6,
                )
            ).alias("pct_at_risk"),
            F.min("k").cast("bigint").alias("min_k"),
        )
        out = row if out is None else out.unionByName(row)
    return out


#: an equivalence class needs at least L_T distinct sensitive values or
#: an attacker who locates a target's class learns the sensitive value
#: (near-)exactly — homogeneity attack (Machanavajjhala et al. 2007)
_L_T = 3


@query(
    "privacy_l_diversity",
    oracle=(
        "SELECT c.c_nationkey AS nation_key, "
        "c.c_mktsegment AS segment, "
        f"{_QI_BUCKET} AS bal_kbucket, "
        "CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS k, "
        "CAST(COUNT(DISTINCT o.o_orderpriority) AS BIGINT) AS l, "
        "COUNT(DISTINCT o.o_orderpriority) = 1 AS homogeneous, "
        f"COUNT(DISTINCT o.o_orderpriority) < {_L_T} AS at_risk "
        "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
        "GROUP BY 1, 2, 3"
    ),
)
def privacy_l_diversity(spark, sf_dir):
    """l-diversity audit — the attack k-anonymity misses: a
    quasi-identifier class can be large (k high) yet carry only ONE
    sensitive value, so locating a target's class discloses the
    sensitive attribute without re-identifying the row (homogeneity
    attack). Per customer QI class (same QI set as
    privacy_k_anonymity), the number of distinct sensitive values
    (order priority standing in for the sensitive column) among its
    members' orders: homogeneous classes and classes below l=3 are
    flagged. One fact-to-dimension equi-join and one QI-cardinality
    aggregate with two distinct counts — at 100 TB the join broadcasts
    the customer QI projection and the output stays QI-domain-bounded."""
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey)
    return j.groupBy(
        F.col("c_nationkey").alias("nation_key"),
        F.col("c_mktsegment").alias("segment"),
        F.expr(_QI_BUCKET).alias("bal_kbucket"),
    ).agg(
        F.countDistinct("c_custkey").cast("bigint").alias("k"),
        F.countDistinct("o_orderpriority").cast("bigint").alias("l"),
        (F.countDistinct("o_orderpriority") == 1).alias("homogeneous"),
        (F.countDistinct("o_orderpriority") < _L_T).alias("at_risk"),
    )


# --- t-closeness ------------------------------------------------------------

#: variational-distance threshold: a QI class whose sensitive-attribute
#: distribution sits further than this from the global distribution
#: leaks attribute information even when k and l look healthy
_T_T = 0.3

#: snapped-integer form of the threshold comparison: sum of per-value
#: |p - q| terms in 1e-9 units, compared against 2 * t * 1e9 exactly
_T_T_UNITS = 600_000_000


def _tclose_sql(cust: str, pre_reduced: bool = False) -> str:
    """Shared text: per-QI-class variational distance between the
    class's sensitive-attribute (market segment) distribution and the
    global one. The class x segment grid is built by a cross join of
    the two bounded domains then left-joined to observed cells, so
    ABSENT segments contribute their full |0 - q_v| mass (dropping
    them understates t — the classic implementation bug). Each |p - q|
    snaps to 1e-9 integer units before the cross-value sum; the
    threshold verdict compares exact integers."""
    term = (
        "CAST(ROUND(1.0e9 * ABS(CAST(COALESCE(c, 0) AS DOUBLE) / n "
        "- CAST(g AS DOUBLE) / nt)) AS BIGINT)"
    )
    # every downstream frame re-aggregates the FINEST cell grid, so
    # the fact table is scanned once and cls/gl/tot are
    # grid-cardinality rollups of it (the from-source spellings
    # scanned customer once per branch — 4x, round-7 scan audit; the
    # Spark caller passes a pre-materialized cells rel so its four
    # downstream references re-read the persisted grid)
    cells = (
        f"cells AS (SELECT nation_key, bal_kbucket, seg, c FROM {cust}), "
        if pre_reduced
        else (
            f"q AS (SELECT c_nationkey AS nation_key, {_QI_BUCKET} "
            f"AS bal_kbucket, c_mktsegment AS seg FROM {cust}), "
            "cells AS (SELECT nation_key, bal_kbucket, seg, COUNT(*) "
            "AS c FROM q GROUP BY 1, 2, 3), "
        )
    )
    return (
        cells +
        "cls AS (SELECT nation_key, bal_kbucket, SUM(c) AS n "
        "FROM cells GROUP BY 1, 2), "
        "gl AS (SELECT seg, SUM(c) AS g FROM cells GROUP BY seg), "
        "tot AS (SELECT SUM(c) AS nt FROM cells), "
        "grid AS (SELECT cls.nation_key, cls.bal_kbucket, cls.n, "
        "gl.seg, gl.g FROM cls CROSS JOIN gl), "
        "d AS (SELECT grid.nation_key, grid.bal_kbucket, grid.n, "
        f"{term} AS t_u "
        "FROM grid CROSS JOIN tot "
        "LEFT JOIN cells ON cells.nation_key = grid.nation_key "
        "AND cells.bal_kbucket = grid.bal_kbucket "
        "AND cells.seg = grid.seg) "
        "SELECT nation_key, bal_kbucket, CAST(MAX(n) AS BIGINT) AS k, "
        + rnd("CAST(SUM(t_u) AS DOUBLE) / 2.0e9", 6)
        + " AS t_closeness, "
        f"SUM(t_u) > {_T_T_UNITS} AS exceeds_t "
        "FROM d GROUP BY nation_key, bal_kbucket"
    )


@query("privacy_t_closeness", oracle="WITH " + _tclose_sql("customer"))
def privacy_t_closeness(spark, sf_dir):
    """t-closeness audit (Li et al. 2007) — the third leg of the
    release triad: k-anonymity bounds re-identification, l-diversity
    bounds attribute certainty within a class, and t-closeness bounds
    what the CLASS MEMBERSHIP ITSELF reveals, by requiring each
    quasi-identifier class's sensitive-attribute distribution to stay
    within variational distance t of the global distribution (a class
    that is 95% one market segment leaks the segment even with l
    healthy values present). Distance over the categorical domain is
    0.5 * sum_v |p_v - q_v| with absent values contributing their full
    global mass. Everything is QI-domain x segment-domain cardinality
    after one fact-table aggregate — broadcast-sized at any row count,
    like the rest of the privacy family. The finest class x segment
    cell grid is materialized and every downstream frame re-aggregates
    it, so the fact table is scanned ONCE (the from-source shared text
    re-derived the scan per branch — 4x, round-7 scan audit)."""
    from ..operators.textops import materialize as _mat

    cu = tables.load(spark, sf_dir, "customer")
    cells = _mat(
        cu.selectExpr(
            "c_nationkey AS nation_key",
            f"{_QI_BUCKET} AS bal_kbucket",
            "c_mktsegment AS seg",
        )
        .groupBy("nation_key", "bal_kbucket", "seg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cells.createOrReplaceTempView("tcl_cells")
    return spark.sql(
        "WITH " + _tclose_sql("tcl_cells", pre_reduced=True)
    )


# --- contribution bounding (DP-prep clipping audit) --------------------------

#: per-user contribution cap per histogram bucket: the L1 sensitivity a
#: differentially-private release of this histogram would add noise for
_CB_CAP = 10


def _cb_sql(src: str) -> str:
    return (
        "u AS (SELECT event_type, user_id, COUNT(*) AS c "
        f"FROM {src} GROUP BY event_type, user_id) "
        "SELECT event_type, "
        "CAST(SUM(c) AS BIGINT) AS n_raw, "
        "CAST(COUNT(*) AS BIGINT) AS n_users, "
        "CAST(MAX(c) AS BIGINT) AS max_user_contrib, "
        f"CAST(SUM(LEAST(c, {_CB_CAP})) AS BIGINT) AS n_clipped, "
        f"CAST(SUM(CASE WHEN c > {_CB_CAP} THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_users_clipped, "
        + rnd(
            f"1.0e0 - CAST(SUM(LEAST(c, {_CB_CAP})) AS DOUBLE) / SUM(c)",
            6,
        )
        + " AS clip_loss_rate "
        "FROM u GROUP BY event_type"
    )


@query(
    "privacy_contribution_bounding",
    oracle="WITH " + tables.EVENTS_ORACLE_CTE + ", " + _cb_sql("events_t"),
)
def privacy_contribution_bounding(spark, sf_dir):
    """Contribution-bounding audit — the step BEFORE any differentially
    private histogram release: a DP count's noise scale is set by the
    most any single user can move a bucket (its L1 sensitivity), so
    heavy users must be clipped to a per-user cap first, and the audit
    quantifies the price. Per event-type bucket: raw count, the actual
    max single-user contribution (the unclipped sensitivity — on this
    corpus far above the cap, which is exactly why clipping exists),
    the count after clipping each user at 10, how many users the cap
    touched, and the fraction of signal clipping discards (the
    bias-vs-noise dial: raise the cap and the DP noise grows with it,
    lower it and clip_loss_rate does). Two stacked hash aggregates,
    (type x user) then type cardinality — broadcast-sized output at
    any corpus scale, and the same shuffle key every per-user query
    shares. Completes the privacy family's fourth release-pipeline
    stage: k-anon / l-div / t-closeness audit the QUASI-identifiers,
    this bounds the CONTRIBUTIONS."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView(
        "cb_events"
    )
    return spark.sql("WITH " + _cb_sql("cb_events"))
