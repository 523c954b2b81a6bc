"""Distributed ML training as a first-class query: logistic regression
by full-batch gradient descent over `documents` — the
iterative-algorithm pattern (MLlib-style driver loop) applied to model
fitting, fully oracle-GATED like `embed_power_iteration_pc1`.

Why it scales: each iteration is ONE map-side-combined aggregate over
the (materialized, narrow) feature frame — three snapped gradient sums
— plus an O(1) driver-side weight update computed IN SQL (so ROUND
ties-away semantics match the oracle, never Python's banker rounding).
The data never moves; per-iteration driver state is 3 integers. At
100 TB this is exactly MLlib's `LogisticRegressionWithLBFGS` data
pattern (treeAggregate of gradient partials), minus the line search.

Cross-engine determinism doctrine (SCALE.md): per-row gradient
contributions are snapped to integer micro-units BEFORE the cross-row
SUM (exact, order-insensitive); weights are integer micro-units; the
only libm call (EXP) sits inside a snap. Prediction correctness uses
`z >= 0` (algebraically equivalent to p >= 0.5) so accuracy counting
involves no EXP at all.

Reference parity: the reference has no ML surface; this is north-star
extension surface (training-data pipelines end in model fits).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import tables
from ..functions.exprs import id_mix, rnd
from ..operators.textops import materialize
from ..registry import query

_ITERS = 3
_LR = "2.0e0"

#: feature spec, identical SQL text in both engines: label = english,
#: x1 = chars/1000, x2 = whitespace tokens/100, bias implicit.
_Y = "CASE WHEN lang = 'en' THEN 1.0e0 ELSE 0.0e0 END"
_X1 = "CAST(n_chars AS DOUBLE) / 1000.0e0"


def _x2(engine: str) -> str:
    if engine == "spark":
        return "CAST(size(split(text, ' ')) AS DOUBLE) / 100.0e0"
    return "CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0e0"


def _z(w0: str, w1: str, w2: str) -> str:
    """Linear score with micro-unit integer weight expressions."""
    return (
        f"((CAST({w0} AS DOUBLE) / 1.0e6) "
        f"+ (CAST({w1} AS DOUBLE) / 1.0e6) * x1 "
        f"+ (CAST({w2} AS DOUBLE) / 1.0e6) * x2)"
    )


def _grad_u(w0: str, w1: str, w2: str, xj: str) -> str:
    """SUM of per-row snapped gradient contributions (micro-units)."""
    p = f"(1.0e0 / (1.0e0 + EXP(-{_z(w0, w1, w2)})))"
    return f"SUM(CAST(ROUND((y - {p}) * {xj} * 1.0e6) AS BIGINT))"


def _upd(w_old: str, sg: str, n: str) -> str:
    """w_u + ROUND(lr * mean-gradient): everything in SQL so ROUND is
    ties-away in both engines."""
    return (
        f"CAST({w_old} + ROUND({_LR} * CAST({sg} AS DOUBLE) / {n}) "
        "AS BIGINT)"
    )


def _correct(w0: str, w1: str, w2: str) -> str:
    """n_correct at weights w: prediction is z >= 0 (== p >= 0.5), so no
    EXP — the count is exact in both engines."""
    return (
        f"SUM(CASE WHEN ({_z(w0, w1, w2)} >= 0.0e0) = (y = 1.0e0) "
        "THEN 1 ELSE 0 END)"
    )


def _oracle() -> str:
    # MATERIALIZED throughout: the weight chain references each previous
    # CTE many times; inlined CTEs would expand the scan tree
    # exponentially in the iteration count (observed as fd exhaustion).
    fx = (
        f"fx AS MATERIALIZED (SELECT {_Y} AS y, {_X1} AS x1, "
        f"{_x2('duck')} AS x2 FROM documents)"
    )
    parts = [fx, "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM fx)",
             "w0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS a, "
             "CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS c)"]
    for i in range(1, _ITERS + 1):
        pw = f"(SELECT a FROM w{i-1})", f"(SELECT b FROM w{i-1})", \
            f"(SELECT c FROM w{i-1})"
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT {_grad_u(*pw, '1.0e0')} AS s0, "
            f"{_grad_u(*pw, 'x1')} AS s1, "
            f"{_grad_u(*pw, 'x2')} AS s2 FROM fx)"
        )
        parts.append(
            f"w{i} AS MATERIALIZED (SELECT "
            + ", ".join(
                _upd(
                    f"(SELECT {o} FROM w{i-1})",
                    f"(SELECT {s} FROM g{i})",
                    "(SELECT n FROM nn)",
                )
                + f" AS {o}"
                for o, s in (("a", "s0"), ("b", "s1"), ("c", "s2"))
            )
            + ")"
        )
    evals = []
    for i in range(_ITERS + 1):
        wi = f"(SELECT a FROM w{i})", f"(SELECT b FROM w{i})", \
            f"(SELECT c FROM w{i})"
        evals.append(
            f"SELECT {i} AS iter, "
            f"CAST((SELECT a FROM w{i}) AS DOUBLE) / 1.0e6 AS w0, "
            f"CAST((SELECT b FROM w{i}) AS DOUBLE) / 1.0e6 AS w1, "
            f"CAST((SELECT c FROM w{i}) AS DOUBLE) / 1.0e6 AS w2, "
            f"(SELECT {_correct(*wi)} FROM fx) AS n_correct"
        )
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(evals)


@query("ml_logreg_gd", oracle=_oracle())
def ml_logreg_gd(spark, sf_dir):
    """Logistic regression (predict lang='en' from document length
    features) trained by 3 full-batch GD steps; output = the weight
    trajectory + training accuracy at every step. Per iteration: one
    aggregate (3 exact snapped sums) + one 1-row SQL weight update; the
    feature frame is materialized once and scanned 3+4 times (gradient
    + eval passes), each a map-combined aggregate — bytes to the driver
    per pass: 3 integers. Bit-identical to the unrolled-CTE oracle."""

    docs = tables.load(spark, sf_dir, "documents")
    fx = materialize(
        docs.select(
            F.expr(_Y).alias("y"),
            F.expr(_X1).alias("x1"),
            F.expr(_x2("spark")).alias("x2"),
        )
    )
    n = fx.count()
    w = (0, 0, 0)
    hist = []

    def lit(v: int) -> str:
        return f"CAST({v} AS BIGINT)"

    for i in range(_ITERS + 1):
        if i > 0:
            pw = tuple(lit(x) for x in w)
            g = fx.agg(
                F.expr(_grad_u(*pw, "1.0e0")).alias("s0"),
                F.expr(_grad_u(*pw, "x1")).alias("s1"),
                F.expr(_grad_u(*pw, "x2")).alias("s2"),
            ).collect()[0]
            upd = spark.sql(
                "SELECT "
                + ", ".join(
                    _upd(lit(w[j]), lit(int(g[f"s{j}"])), str(n))
                    + f" AS u{j}"
                    for j in range(3)
                )
            ).collect()[0]
            w = (int(upd["u0"]), int(upd["u1"]), int(upd["u2"]))
        wi = tuple(lit(x) for x in w)
        nc = fx.agg(F.expr(_correct(*wi)).alias("nc")).collect()[0]["nc"]
        hist.append((i, w[0], w[1], w[2], int(nc)))

    out = spark.createDataFrame(
        hist, "iter INT, a BIGINT, b BIGINT, c BIGINT, n_correct BIGINT"
    )
    return out.select(
        "iter",
        F.expr("CAST(a AS DOUBLE) / 1.0e6").alias("w0"),
        F.expr("CAST(b AS DOUBLE) / 1.0e6").alias("w1"),
        F.expr("CAST(c AS DOUBLE) / 1.0e6").alias("w2"),
        "n_correct",
    )


# --- multinomial Naive Bayes: train + holdout confusion matrix ------------

#: shared SQL snippets — identical text in both engines; every log is
#: snapped to integer micro-units before any cross-row SUM.
_NB_LP_U = (
    "CAST(ROUND(LN(CAST(COALESCE(cnt, 0) + 1 AS DOUBLE) "
    "/ CAST(n_tok + v AS DOUBLE)) * 1.0e6) AS BIGINT)"
)
_NB_PR_U = (
    "CAST(ROUND(LN(CAST(n_docs AS DOUBLE) / CAST(nd_all AS DOUBLE)) "
    "* 1.0e6) AS BIGINT)"
)

_NB_ORACLE = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
tr AS MATERIALIZED (SELECT * FROM toks WHERE doc_id % 10 < 7),
te AS MATERIALIZED (SELECT * FROM toks WHERE doc_id % 10 >= 7),
cls AS MATERIALIZED (
  SELECT lang AS cls, COUNT(*) AS n_tok FROM tr GROUP BY lang
),
nd AS MATERIALIZED (
  SELECT lang AS cls, COUNT(*) AS n_docs
  FROM (SELECT DISTINCT doc_id, lang FROM tr) GROUP BY lang
),
vv AS (SELECT COUNT(DISTINCT tok) AS v FROM tr),
ndt AS (SELECT SUM(n_docs) AS nd_all FROM nd),
model AS MATERIALIZED (
  SELECT tok, lang AS cls, COUNT(*) AS cnt FROM tr GROUP BY tok, lang
),
pri AS (SELECT cls, {_NB_PR_U} AS pr_u FROM nd, ndt),
st AS (
  SELECT t.doc_id, t.lang, c.cls, {_NB_LP_U} AS lp_u
  FROM te t
  CROSS JOIN cls c
  CROSS JOIN vv
  LEFT JOIN model m ON m.tok = t.tok AND m.cls = c.cls
),
ds AS (
  SELECT doc_id, lang, cls, SUM(lp_u) AS s_tok
  FROM st GROUP BY doc_id, lang, cls
),
sc AS (
  SELECT d.doc_id, d.lang, d.cls, d.s_tok + p.pr_u AS s_u
  FROM ds d JOIN pri p ON d.cls = p.cls
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY s_u DESC, cls) AS rk
  FROM sc
)
SELECT lang, cls AS pred_lang, COUNT(*) AS n_docs
FROM r WHERE rk = 1 GROUP BY lang, cls
"""


@query("ml_naive_bayes_langid", oracle=_NB_ORACLE)
def ml_naive_bayes_langid(spark, sf_dir):
    """Multinomial Naive Bayes language classifier trained on a
    deterministic 70% split (doc_id % 10 < 7) and evaluated as a
    confusion matrix on the holdout — the classic one-pass-trainable
    text model (add-one smoothing, log-domain scoring).

    Train = two hash-aggs (class token totals, per-(token, class)
    counts) + two tiny scalars (vocab size, doc priors) — all
    map-side-combined; the model is vocabulary x classes, Zipf-bounded,
    broadcast onto the scoring join here (at a vocabulary too big to
    broadcast, the same plan shuffle-joins on tok). Scoring fans each
    holdout token out by |classes| (= 5, a constant), sums EXACT snapped
    per-token log-probs per (doc, class), adds the snapped prior, and
    takes the per-doc argmax through one window (DESC score, class-name
    tie-break => total order). Every LN is snapped to micro-units before
    any cross-row sum, so both engines produce the identical matrix —
    complementing ml_logreg_gd (iterative, driver loop) with the
    closed-form, fully-declarative end of distributed model fitting."""

    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    )
    tr = materialize(toks.filter(F.expr("doc_id % 10 < 7")))
    te = toks.filter(F.expr("doc_id % 10 >= 7"))
    cls = tr.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_tok")
    )
    nd = (
        tr.select("doc_id", "lang").distinct()
        .groupBy(F.col("lang").alias("cls"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    vv = tr.agg(F.countDistinct("tok").alias("v"))
    ndt = nd.agg(F.sum("n_docs").alias("nd_all"))
    model = tr.groupBy("tok", F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    pri = nd.crossJoin(F.broadcast(ndt)).select(
        "cls", F.expr(_NB_PR_U).alias("pr_u")
    )
    st = (
        te.crossJoin(F.broadcast(cls))
        .crossJoin(F.broadcast(vv))
        .join(F.broadcast(model), ["tok", "cls"], "left")
        .select("doc_id", "lang", "cls", F.expr(_NB_LP_U).alias("lp_u"))
    )
    ds = st.groupBy("doc_id", "lang", "cls").agg(
        F.sum("lp_u").alias("s_tok")
    )
    sc = ds.join(F.broadcast(pri), "cls").select(
        "doc_id", "lang", "cls",
        (F.col("s_tok") + F.col("pr_u")).alias("s_u"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("s_u"), F.asc("cls"))
    return (
        sc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("lang", F.col("cls").alias("pred_lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- closed-form OLS: normal equations from one gram-matrix aggregate -----

#: exact integer units: y = price cents, x1 = quantity, x2 = discount
#: hundredths. Every gram accumulator is DECIMAL(38,0): y*y reaches
#: ~1e14 per row, so its BIGINT sum dies around 1e5 rows — the decimal
#: sums stay exact and partition-order-insensitive at any scale.
_OLS_GRAM = (
    "u AS (SELECT CAST(ROUND(l_extendedprice * 100.0e0) AS BIGINT) AS y, "
    "CAST(l_quantity AS BIGINT) AS x1, "
    "CAST(ROUND(l_discount * 100.0e0) AS BIGINT) AS x2 FROM {src}), "
    "g AS (SELECT COUNT(*) AS n, "
    "SUM(CAST(x1 AS DECIMAL(38,0))) AS s1, "
    "SUM(CAST(x2 AS DECIMAL(38,0))) AS s2, "
    "SUM(CAST(y AS DECIMAL(38,0))) AS sy, "
    "SUM(CAST(x1 * x1 AS DECIMAL(38,0))) AS s11, "
    "SUM(CAST(x1 * x2 AS DECIMAL(38,0))) AS s12, "
    "SUM(CAST(x2 * x2 AS DECIMAL(38,0))) AS s22, "
    "SUM(CAST(x1 * y AS DECIMAL(38,0))) AS s1y, "
    "SUM(CAST(x2 * y AS DECIMAL(38,0))) AS s2y, "
    "SUM(CAST(y * y AS DECIMAL(38,0))) AS syy FROM u), "
    "gd AS (SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1, "
    "CAST(s2 AS DOUBLE) AS s2, CAST(sy AS DOUBLE) AS sy, "
    "CAST(s11 AS DOUBLE) AS s11, CAST(s12 AS DOUBLE) AS s12, "
    "CAST(s22 AS DOUBLE) AS s22, CAST(s1y AS DOUBLE) AS s1y, "
    "CAST(s2y AS DOUBLE) AS s2y, CAST(syy AS DOUBLE) AS syy FROM g)"
)


def _det3(r1: str, r2: str, r3: str) -> str:
    """3x3 determinant text from comma-joined row strings."""
    a, b, c = r1.split(",")
    d, e, f = r2.split(",")
    g, h, i = r3.split(",")
    return (
        f"(({a}) * (({e}) * ({i}) - ({f}) * ({h})) "
        f"- ({b}) * (({d}) * ({i}) - ({f}) * ({g})) "
        f"+ ({c}) * (({d}) * ({h}) - ({e}) * ({g})))"
    )


#: Cramer's rule on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] beta = [sy,s1y,s2y]
_OLS_DET = _det3("n,s1,s2", "s1,s11,s12", "s2,s12,s22")
_OLS_B0 = _det3("sy,s1,s2", "s1y,s11,s12", "s2y,s12,s22")
_OLS_B1 = _det3("n,sy,s2", "s1,s1y,s12", "s2,s2y,s22")
_OLS_B2 = _det3("n,s1,sy", "s1,s11,s1y", "s2,s12,s2y")

#: NULLIF on the determinant and the R^2 denominator: a constant
#: regressor (or constant y) makes the normal equations singular — the
#: fit is undefined and must come back NULL in every engine (ANSI Spark
#: would otherwise THROW on the bare division; caught by the skewed
#: fixture fuzz, constant l_quantity).
_OLS_TAIL = (
    "beta AS (SELECT n, sy, s1y, s2y, syy, "
    f"{_OLS_B0} / NULLIF({_OLS_DET}, 0.0e0) AS b0, "
    f"{_OLS_B1} / NULLIF({_OLS_DET}, 0.0e0) AS b1, "
    f"{_OLS_B2} / NULLIF({_OLS_DET}, 0.0e0) AS b2 FROM gd) "
    "SELECT CAST(n AS BIGINT) AS n, "
    + rnd("b0 / 100.0e0", 4) + " AS intercept_dollars, "
    + rnd("b1 / 100.0e0", 4) + " AS beta_per_qty_dollars, "
    + rnd("b2 / 100.0e0", 4) + " AS beta_per_disc_pt_dollars, "
    + rnd(
        "1.0e0 - (syy - b0 * sy - b1 * s1y - b2 * s2y) "
        "/ NULLIF(syy - sy * sy / n, 0.0e0)",
        6,
    )
    + " AS r2 FROM beta"
)


def _ols_sql(src: str) -> str:
    return "WITH " + _OLS_GRAM.format(src=src) + ", " + _OLS_TAIL


@query("ml_linreg_normal_eq", oracle=_ols_sql("lineitem"))
def ml_linreg_normal_eq(spark, sf_dir):
    """Closed-form multiple linear regression (extendedprice ~ quantity +
    discount) via the normal equations: ONE map-combined aggregate
    builds the exact-decimal gram matrix (9 sums + count), then Cramer's
    rule solves the 3x3 system in a single deterministic float
    evaluation — no gradient loop, no driver-side linear algebra, no
    second data pass (R^2 falls out of the same sums). This is the
    MLlib-`summary`-style distributed pattern: at 100 TB the cost is
    exactly one scan + one 10-scalar reduce, and the identical SQL text
    runs on the DuckDB oracle. Complements ml_logreg_gd, whose loss has
    no closed form and needs the iterative path."""
    tables.load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ols_lineitem"
    )
    return spark.sql(_ols_sql("ols_lineitem"))


# --- grouped regression: one model per brand in a single pass --------------

#: simple OLS of quantity on discount points, per part brand; exact
#: integer sums (quantity <= 50, discount points <= 10 — headroom is
#: trivial), closed-form slope/intercept/r2 as one float evaluation
#: per GROUP. The "fit 10^4 models in one aggregate" pattern: model
#: count scales with group cardinality, data passes stay at ONE.
_GOLS_BODY = (
    "u AS (SELECT p.p_brand AS brand, "
    "CAST(l.l_quantity AS BIGINT) AS x, "
    "CAST(ROUND(l.l_discount * 100.0e0) AS BIGINT) AS y "
    "FROM {l} l JOIN {p} p ON l.l_partkey = p.p_partkey), "
    "g AS (SELECT brand, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, "
    "SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy "
    "FROM u GROUP BY brand), "
    # NULLIF: a brand whose x (or y) is constant has an undefined
    # slope/r2 — NULL in every engine, never an ANSI throw (skew fuzz)
    "f AS (SELECT brand, n, "
    "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
    "NULLIF(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx, 0.0e0) "
    "AS slope, "
    "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) * "
    "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
    "NULLIF((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * "
    "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy), 0.0e0) AS r2, "
    "CAST(sy AS DOUBLE) / n AS ybar, CAST(sx AS DOUBLE) / n AS xbar "
    "FROM g WHERE n > 1) "
    "SELECT brand, CAST(n AS BIGINT) AS n_lines, "
    + rnd("slope", 6) + " AS slope_disc_pt_per_qty, "
    + rnd("ybar - slope * xbar", 6) + " AS intercept_disc_pt, "
    + rnd("r2", 6) + " AS r2"
    " FROM f"
)


@query(
    "ml_linreg_grouped_brands",
    oracle="WITH " + _GOLS_BODY.format(l="lineitem", p="part"),
)
def ml_linreg_grouped_brands(spark, sf_dir):
    """Grouped regression — one OLS model PER BRAND from a single
    aggregate pass: does discount depth track order quantity, and does
    the relationship differ across brands? Five integer moment sums per
    group (map-side combined), closed-form slope/intercept/r^2 per
    group row. This is the scale pattern applyInPandas+sklearn gets
    reached for prematurely: 25 brands or 10^6 SKUs cost the same ONE
    shuffle, all JVM-side, vs a Python boundary per group. Broadcast
    part dim onto the fact scan; nothing else touches fact
    cardinality."""
    tables.load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "gols_lineitem"
    )
    tables.load(spark, sf_dir, "part").createOrReplaceTempView("gols_part")
    return spark.sql(
        "WITH " + _GOLS_BODY.format(l="gols_lineitem", p="gols_part")
    )


# --- decision stump: exact histogram-based split finding -------------------

def _stump_sql(src: str) -> str:
    """Shared text: per-distinct-feature-value class counts (the
    'histogram' — domain-bounded, 50 quantity values), cumulative
    left/right counts per candidate split, and the split minimizing
    weighted Gini impurity. Minimizing W is equivalent to maximizing
    S = (posL^2+negL^2)/nL + (posR^2+negR^2)/nR, evaluated in DOUBLE
    from exact integers with identical text — the same
    histogram-then-scan shape distributed GBDT split finding
    (LightGBM/XGBoost-style) runs per node at scale."""
    return (
        "h AS (SELECT CAST(l_quantity AS BIGINT) AS x, COUNT(*) AS n_x, "
        "SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS p_x "
        f"FROM {src} GROUP BY CAST(l_quantity AS BIGINT)), "
        "cum AS (SELECT x, "
        "SUM(n_x) OVER (ORDER BY x) AS nl, "
        "SUM(p_x) OVER (ORDER BY x) AS pl, "
        "(SELECT SUM(n_x) FROM h) AS n, "
        "(SELECT SUM(p_x) FROM h) AS p FROM h), "
        "cand AS (SELECT x AS threshold, nl, pl, n - nl AS nr, "
        "p - pl AS pr, "
        "(CAST(pl AS DOUBLE) * pl + CAST(nl - pl AS DOUBLE) * (nl - pl))"
        " / nl + "
        "(CAST(p - pl AS DOUBLE) * (p - pl) + "
        "CAST((n - nl) - (p - pl) AS DOUBLE) * ((n - nl) - (p - pl)))"
        " / (n - nl) AS s, "
        "1.0e0 - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n) "
        "- (1.0e0 - CAST(p AS DOUBLE) / n) "
        "* (1.0e0 - CAST(p AS DOUBLE) / n) AS gini_root, "
        "CAST(n AS DOUBLE) AS nd FROM cum WHERE nl < n) "
        "SELECT CAST(threshold AS BIGINT) AS split_quantity_le, "
        "CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right, "
        + rnd("CAST(pl AS DOUBLE) / nl", 6) + " AS pos_rate_left, "
        + rnd("CAST(pr AS DOUBLE) / nr", 6) + " AS pos_rate_right, "
        + rnd("gini_root - (1.0e0 - s / nd)", 6)
        + " AS gini_decrease "
        "FROM cand ORDER BY s DESC, threshold LIMIT 1"
    )


@query(
    "ml_decision_stump",
    oracle="WITH " + _stump_sql("lineitem"),
)
def ml_decision_stump(spark, sf_dir):
    """Depth-1 decision tree (stump) learned exactly: the quantity
    threshold best separating returned lineitems by Gini impurity.
    ONE class-count histogram over the domain-bounded feature (the
    single fact-cardinality aggregate), one cumulative window over its
    50 rows, and an exact argmax over candidate splits — precisely the
    histogram-based split search a distributed GBDT runs per tree node,
    demonstrated as a first-class relational plan instead of a
    black-box fit. Completes the supervised set: linear (OLS family),
    logistic (GD), generative (Naive Bayes), tree (here)."""
    tables.load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "stump_lineitem"
    )
    return spark.sql("WITH " + _stump_sql("stump_lineitem"))


# --- stump generalization: holdout accuracy vs majority baseline -----------

#: deterministic 90/10 hash split on the line identity: the
#: (orderkey, linenumber) pair folds into one BIGINT key (linenumber
#: is 1..7; distinct pairs can collide only when orderkeys differ by
#: an exact multiple of the 2654435761 stride — measure-zero for a
#: hash split, and harmless: a collision merely co-assigns two lines
#: to the same fold), then the full-entropy id_mix buckets it (no
#: mod-2^20 periodicity). Key-range contract: the fold adds at most
#: 7 * 2654435761 < 1.9e10, so it overflows only for
#: orderkey > 2^63 - 1 - 1.9e10 (TPC-H orderkeys are < 6e9 at any
#: SF; test_robustness skips that extreme corner by the same
#: contract).
_LINE_KEY = "(l_orderkey + l_linenumber * 2654435761)"
_STU_TRAIN = f"({id_mix(_LINE_KEY)} % 1000) < 900"


def _stump_eval_sql(src: str) -> str:
    return (
        "tr AS (SELECT * FROM " + src + " WHERE " + _STU_TRAIN + "), "
        "te AS (SELECT * FROM " + src + " WHERE NOT (" + _STU_TRAIN + ")), "
        "h AS (SELECT CAST(l_quantity AS BIGINT) AS x, COUNT(*) AS n_x, "
        "SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS p_x "
        "FROM tr GROUP BY CAST(l_quantity AS BIGINT)), "
        "cum AS (SELECT x, SUM(n_x) OVER (ORDER BY x) AS nl, "
        "SUM(p_x) OVER (ORDER BY x) AS pl, "
        "(SELECT SUM(n_x) FROM h) AS n, (SELECT SUM(p_x) FROM h) AS p "
        "FROM h), "
        "best AS (SELECT x AS thr, "
        "CASE WHEN 2 * pl >= nl THEN 1 ELSE 0 END AS cls_l, "
        "CASE WHEN 2 * (p - pl) >= (n - nl) THEN 1 ELSE 0 END AS cls_r, "
        "CASE WHEN 2 * p >= n THEN 1 ELSE 0 END AS cls_maj "
        "FROM cum WHERE nl < n ORDER BY "
        "(CAST(pl AS DOUBLE) * pl + CAST(nl - pl AS DOUBLE) * (nl - pl))"
        " / nl + "
        "(CAST(p - pl AS DOUBLE) * (p - pl) + "
        "CAST((n - nl) - (p - pl) AS DOUBLE) * ((n - nl) - (p - pl)))"
        " / (n - nl) DESC, x LIMIT 1), "
        "sc AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END "
        "AS y, CASE WHEN CAST(l_quantity AS BIGINT) <= b.thr "
        "THEN b.cls_l ELSE b.cls_r END AS yhat, b.cls_maj "
        "FROM te CROSS JOIN best b) "
        "SELECT COUNT(*) AS n_test, "
        + rnd(
            "CAST(SUM(CASE WHEN y = yhat THEN 1 ELSE 0 END) AS DOUBLE)"
            " / COUNT(*)",
            6,
        )
        + " AS stump_accuracy, "
        + rnd(
            "CAST(SUM(CASE WHEN y = cls_maj THEN 1 ELSE 0 END) AS DOUBLE)"
            " / COUNT(*)",
            6,
        )
        + " AS majority_accuracy FROM sc"
    )


@query(
    "ml_stump_holdout_eval",
    oracle="WITH " + _stump_eval_sql("lineitem"),
)
def ml_stump_holdout_eval(spark, sf_dir):
    """Out-of-sample evaluation of the decision stump: train the split
    on a deterministic 90% hash split, score the held-out 10%, report
    accuracy against the majority-class baseline — the generalization
    gate (events_markov_eval / events_holt_backtest discipline applied
    to the tree primitive). On TPC-H's independent returnflag the lift
    over majority is ~zero BY CONSTRUCTION, and that null result is
    the point: the evaluation leg exists to catch exactly this before
    a useless model ships. Train histogram + split scan as in
    ml_decision_stump; scoring is one broadcast of the 1-row model."""
    tables.load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "stump_lineitem"
    )
    return spark.sql("WITH " + _stump_eval_sql("stump_lineitem"))


# --- exact AUC via the rank-sum identity -----------------------------------

def _auc_sql(src: str) -> str:
    """AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos*n_neg) with tie-average
    ranks — the Mann-Whitney identity, so the doubled-rank trick makes
    every sum exact BIGINT (ties in the discrete score handled
    correctly, each contributing 0.5)."""
    return (
        "vals AS (SELECT CAST(l_quantity AS BIGINT) AS v, "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g "
        f"FROM {src}), "
        "agg AS (SELECT v, COUNT(*) AS c, SUM(g) AS c1 FROM vals "
        "GROUP BY v), "
        "rk AS (SELECT v, c, c1, COALESCE(SUM(c) OVER (ORDER BY v "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cprev "
        "FROM agg), "
        "s AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, "
        "CAST(SUM(c) - SUM(c1) AS BIGINT) AS n2, "
        "CAST(SUM(c1 * (2 * cprev + c + 1)) AS BIGINT) AS r1_2 FROM rk) "
        # NULLIF: AUC is undefined with zero positives or zero
        # negatives — NULL in every engine, never an ANSI throw
        # (sparse fixture fuzz: a corpus with no 'R' returnflags)
        "SELECT n1 AS n_pos, n2 AS n_neg, "
        + rnd(
            "(CAST(r1_2 - n1 * (n1 + 1) AS DOUBLE) / 2.0e0) / "
            "NULLIF(CAST(n1 AS DOUBLE) * n2, 0.0e0)",
            6,
        )
        + " AS auc FROM s"
    )


@query("ml_auc_quantity_returns", oracle="WITH " + _auc_sql("lineitem"))
def ml_auc_quantity_returns(spark, sf_dir):
    """Exact AUC of quantity as a ranking score for returned lineitems —
    the evaluation metric surface, computed via the Mann-Whitney
    rank-sum identity rather than threshold sweeps: AUC == normalized U,
    so the same doubled-rank contingency machinery as
    events_mannwhitney_u gives the exact tie-corrected area in one
    domain-bounded aggregate + one tiny window. AUC ~ 0.5 here is the
    designed null (TPC-H returns are independent of quantity) — the
    metric's job is to SAY so."""
    tables.load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "auc_lineitem"
    )
    return spark.sql("WITH " + _auc_sql("auc_lineitem"))


# --- threshold metrics + calibration table --------------------------------

_PR_THRESHOLD = 25


@query(
    "ml_precision_recall",
    oracle=(
        "WITH c AS (SELECT "
        "SUM(CASE WHEN l_quantity >= 25 AND l_returnflag = 'R' "
        "THEN 1 ELSE 0 END) AS tp, "
        "SUM(CASE WHEN l_quantity >= 25 AND l_returnflag <> 'R' "
        "THEN 1 ELSE 0 END) AS fp, "
        "SUM(CASE WHEN l_quantity < 25 AND l_returnflag = 'R' "
        "THEN 1 ELSE 0 END) AS fn, "
        "SUM(CASE WHEN l_quantity < 25 AND l_returnflag <> 'R' "
        "THEN 1 ELSE 0 END) AS tn FROM lineitem) "
        # NULLIF: an empty predicted-positive (or actual-positive) set
        # makes the metric undefined — NULL in every engine, never an
        # ANSI throw (skew fuzz: constant quantity below the threshold)
        "SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, "
        "CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn, "
        + rnd("CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0)", 6)
        + " AS precision_at_t, "
        + rnd("CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0)", 6)
        + " AS recall_at_t, "
        + rnd(
            "2.0e0 * tp / NULLIF(2.0e0 * tp + fp + fn, 0.0e0)", 6
        )
        + " AS f1_at_t FROM c"
    ),
)
def ml_precision_recall(spark, sf_dir):
    """Confusion-matrix metrics at a fixed operating threshold
    (quantity >= 25 predicting returns): TP/FP/FN/TN counts plus
    precision/recall/F1 — one scan, one 4-counter aggregate, the
    companion to the threshold-free AUC (ml_auc_quantity_returns).
    The same four counters at k thresholds = the full PR curve with
    one extra CASE per point, still one scan."""
    li = tables.load(spark, sf_dir, "lineitem")
    c = li.agg(
        F.expr(
            "SUM(CASE WHEN l_quantity >= 25 AND l_returnflag = 'R' "
            "THEN 1 ELSE 0 END)"
        ).alias("tp"),
        F.expr(
            "SUM(CASE WHEN l_quantity >= 25 AND l_returnflag <> 'R' "
            "THEN 1 ELSE 0 END)"
        ).alias("fp"),
        F.expr(
            "SUM(CASE WHEN l_quantity < 25 AND l_returnflag = 'R' "
            "THEN 1 ELSE 0 END)"
        ).alias("fn"),
        F.expr(
            "SUM(CASE WHEN l_quantity < 25 AND l_returnflag <> 'R' "
            "THEN 1 ELSE 0 END)"
        ).alias("tn"),
    )
    return c.selectExpr(
        "CAST(tp AS BIGINT) AS tp",
        "CAST(fp AS BIGINT) AS fp",
        "CAST(fn AS BIGINT) AS fn",
        "CAST(tn AS BIGINT) AS tn",
        rnd("CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0)", 6)
        + " AS precision_at_t",
        rnd("CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0)", 6)
        + " AS recall_at_t",
        rnd("2.0e0 * tp / NULLIF(2.0e0 * tp + fp + fn, 0.0e0)", 6)
        + " AS f1_at_t",
    )


@query(
    "ml_calibration_bins",
    oracle=(
        "WITH b AS (SELECT "
        "CAST(FLOOR((CAST(l_quantity AS BIGINT) - 1) / 5.0e0) AS BIGINT) AS bin, "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y "
        "FROM lineitem), "
        "g AS (SELECT bin, COUNT(*) AS n, SUM(y) AS pos FROM b "
        "GROUP BY bin), "
        "t AS (SELECT CAST(SUM(pos) AS DOUBLE) / SUM(n) AS base FROM g) "
        "SELECT bin, CAST(n AS BIGINT) AS n, "
        + rnd("CAST(pos AS DOUBLE) / n", 6) + " AS observed_rate, "
        + rnd("(SELECT base FROM t)", 6) + " AS base_rate, "
        + rnd("CAST(pos AS DOUBLE) / n - (SELECT base FROM t)", 6)
        + " AS lift FROM g"
    ),
)
def ml_calibration_bins(spark, sf_dir):
    """Reliability/calibration table: score bins (quantity in widths of
    5) vs observed return rate and its lift over the base rate — the
    table behind a calibration plot, and the binned dependence check
    that explains WHY the AUC sits where it does. One hash aggregate
    at bin cardinality; flat lifts on TPC-H are the designed null."""
    tables.load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "cal_lineitem"
    )
    return spark.sql(
        "WITH b AS (SELECT "
        "CAST(FLOOR((CAST(l_quantity AS BIGINT) - 1) / 5.0e0) AS BIGINT) AS bin, "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y "
        "FROM cal_lineitem), "
        "g AS (SELECT bin, COUNT(*) AS n, SUM(y) AS pos FROM b "
        "GROUP BY bin), "
        "t AS (SELECT CAST(SUM(pos) AS DOUBLE) / SUM(n) AS base FROM g) "
        "SELECT bin, CAST(n AS BIGINT) AS n, "
        + rnd("CAST(pos AS DOUBLE) / n", 6) + " AS observed_rate, "
        + rnd("(SELECT base FROM t)", 6) + " AS base_rate, "
        + rnd("CAST(pos AS DOUBLE) / n - (SELECT base FROM t)", 6)
        + " AS lift FROM g"
    )


# --- k-fold cross-validation -----------------------------------------------

_KF_K = 5
#: full-entropy id_mix over the folded line key — BIGINT-safe at ANY
#: orderkey scale (all intermediates < 2^63; the pre-round-4 unreduced
#: LCG overflowed past l_orderkey ~ 8.4e9: Spark would wrap silently
#: while DuckDB raises) and free of the mod-2^20 assignment period
_KF_FOLD = f"({id_mix(_LINE_KEY)} % {_KF_K})"

#: the stump's split score (weighted Gini numerator) — identical op
#: order in both engines; shared by the per-fold ROW_NUMBER pick
_KF_SCORE = (
    "(CAST(pl AS DOUBLE) * pl + CAST(nl - pl AS DOUBLE) * (nl - pl))"
    " / nl + "
    "(CAST(p - pl AS DOUBLE) * (p - pl) + "
    "CAST((n - nl) - (p - pl) AS DOUBLE) * ((n - nl) - (p - pl)))"
    " / (n - nl)"
)


def _kfold_sql(src: str) -> str:
    acc = (
        "CAST(ROUND(1.0e6 * SUM(CASE WHEN y = yhat THEN 1 ELSE 0 END) "
        "/ COUNT(*)) AS BIGINT)"
    )
    macc = (
        "CAST(ROUND(1.0e6 * SUM(CASE WHEN y = cls_maj THEN 1 ELSE 0 END)"
        " / COUNT(*)) AS BIGINT)"
    )
    # CV mean/std on the micro-unit fold accuracies: exact integer
    # moments, one sqrt + one division at the edge
    std = (
        "SQRT(CAST(COUNT(*) OVER () * SUM(au * au) OVER () "
        "- SUM(au) OVER () * SUM(au) OVER () AS DOUBLE) "
        "/ (COUNT(*) OVER () * (COUNT(*) OVER () - 1))) / 1.0e6"
    )
    return (
        "b AS (SELECT CAST(l_quantity AS BIGINT) AS x, "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y, "
        f"{_KF_FOLD} AS fold FROM {src}), "
        "fl AS (SELECT DISTINCT fold AS tf FROM b), "
        "h AS (SELECT fl.tf, x, COUNT(*) AS n_x, SUM(y) AS p_x "
        "FROM b JOIN fl ON b.fold <> fl.tf GROUP BY fl.tf, x), "
        "cum AS (SELECT tf, x, "
        "SUM(n_x) OVER (PARTITION BY tf ORDER BY x) AS nl, "
        "SUM(p_x) OVER (PARTITION BY tf ORDER BY x) AS pl, "
        "SUM(n_x) OVER (PARTITION BY tf) AS n, "
        "SUM(p_x) OVER (PARTITION BY tf) AS p FROM h), "
        "rkd AS (SELECT tf, x AS thr, "
        "CASE WHEN 2 * pl >= nl THEN 1 ELSE 0 END AS cls_l, "
        "CASE WHEN 2 * (p - pl) >= (n - nl) THEN 1 ELSE 0 END AS cls_r, "
        "CASE WHEN 2 * p >= n THEN 1 ELSE 0 END AS cls_maj, "
        "ROW_NUMBER() OVER (PARTITION BY tf ORDER BY "
        + _KF_SCORE
        + " DESC, x) AS rk FROM cum WHERE nl < n), "
        "best AS (SELECT tf, thr, cls_l, cls_r, cls_maj FROM rkd "
        "WHERE rk = 1), "
        "sc AS (SELECT b.fold, b.y, CASE WHEN b.x <= best.thr "
        "THEN best.cls_l ELSE best.cls_r END AS yhat, best.cls_maj, "
        "best.thr FROM b JOIN best ON best.tf = b.fold), "
        "per AS (SELECT fold, MAX(thr) AS thr, "
        "COUNT(*) AS n_test, "
        f"{acc} AS au, {macc} AS mau FROM sc GROUP BY fold) "
        "SELECT CAST(fold AS INT) AS fold, "
        "CAST(n_test AS BIGINT) AS n_test, "
        "CAST(thr AS BIGINT) AS split_quantity_le, "
        "CAST(au AS DOUBLE) / 1.0e6 AS stump_accuracy, "
        "CAST(mau AS DOUBLE) / 1.0e6 AS majority_accuracy, "
        "CAST(SUM(au) OVER () AS DOUBLE) / (1.0e6 * COUNT(*) OVER ()) "
        "AS cv_mean_accuracy, "
        + rnd(std, 6)
        + " AS cv_std_accuracy FROM per"
    )


@query("ml_kfold_cv", oracle="WITH " + _kfold_sql("lineitem"))
def ml_kfold_cv(spark, sf_dir):
    """k-fold cross-validation of the decision stump — the evaluation
    discipline single-holdout scores lack: 5 deterministic hash folds
    of lineitem, a stump trained on each fold's complement and scored
    on the held fold, plus the cross-fold mean and std that say
    whether ml_stump_holdout_eval's one number was luck. ALL folds
    train from ONE shared (fold, threshold) histogram (the k training
    histograms are the global histogram minus each fold's — realized
    as one fold-keyed aggregate, never k scans); per-fold best-split
    search is a ROW_NUMBER over the threshold grid, scoring is one
    equi-join back to the rows. Fold accuracies snap to micro-units so
    the CV moments are exact integer arithmetic — engine-identical,
    like every number here. At 100 TB: histogram cardinality is
    (folds x distinct thresholds), the only row-scale passes are the
    histogram build and the scoring join, both map-side-combinable."""
    tables.load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ml_lineitem_kf"
    )
    return spark.sql("WITH " + _kfold_sql("ml_lineitem_kf"))


# --- isotonic regression calibration (PAVA via minimax) ---------------------


def _isotonic_sql(src: str) -> str:
    """Engine-shared isotonic-calibration body. The isotonic fit uses
    the minimax characterization of PAVA (Robertson/Wright/Dykstra):
    g(i) = max_{j<=i} min_{k>=i} weightedMean(y over bins j..k) — an
    exact closed form, so no sequential pool-adjacent loop exists to
    disagree across engines. Interval means are ratios of exact BIGINT
    prefix sums (deterministic doubles); only the output snaps."""
    return (
        "b AS (SELECT "
        "CAST(FLOOR((CAST(l_quantity AS BIGINT) - 1) / 5.0e0) AS BIGINT) "
        "AS bin, "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y "
        f"FROM {src}), "
        "g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(y) AS BIGINT) AS pos FROM b GROUP BY bin), "
        "c AS (SELECT bin, n, pos, "
        "CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn, "
        "CAST(SUM(pos) OVER (ORDER BY bin) AS BIGINT) AS cpos FROM g), "
        # all O(B^2) interval means (B = 10 bins -> 55 rows)
        "iv AS (SELECT j.bin AS jb, k.bin AS kb, "
        "CAST(k.cpos - j.cpos + j.pos AS DOUBLE) "
        "/ (k.cn - j.cn + j.n) AS m "
        "FROM c j JOIN c k ON k.bin >= j.bin), "
        # inner min over k >= i, then outer max over j <= i
        "mn AS (SELECT c.bin, iv.jb, MIN(iv.m) AS m_j FROM c "
        "JOIN iv ON iv.jb <= c.bin AND iv.kb >= c.bin "
        "GROUP BY c.bin, iv.jb), "
        "iso AS (SELECT bin, MAX(m_j) AS iso_raw FROM mn GROUP BY bin) "
        "SELECT g.bin, g.n, g.pos, "
        + rnd("CAST(g.pos AS DOUBLE) / g.n", 6)
        + " AS observed_rate, "
        + rnd("iso.iso_raw", 6)
        + " AS isotonic_rate, "
        "CASE WHEN "
        + rnd("CAST(g.pos AS DOUBLE) / g.n", 6)
        + " <> "
        + rnd("iso.iso_raw", 6)
        + " THEN 1 ELSE 0 END AS pooled "
        "FROM g JOIN iso ON iso.bin = g.bin"
    )


@query(
    "ml_isotonic_calibration",
    oracle="WITH " + _isotonic_sql("lineitem"),
)
def ml_isotonic_calibration(spark, sf_dir):
    """Isotonic-regression calibration of the quantity->return-rate
    score (the production follow-up to ml_calibration_bins: Platt's
    competitor that calibrates ANY monotone score without a parametric
    form — what ad/ranking systems run nightly on billions of logged
    scores). Per score bin: observed rate, the isotonic (monotone
    non-decreasing, weighted-least-squares) fitted rate, and whether
    PAVA pooled the bin with neighbors. On TPC-H's designed-null
    dependence nearly everything pools toward the base rate — the fit
    SHOWING that is the point (a calibrator that invents slope from
    noise is broken).

    PAVA is a sequential pool-adjacent loop — unusable as a
    distributed primitive — so the fit uses the exact minimax closed
    form g(i) = max_{j<=i} min_{k>=i} mean(y, bins j..k) over the
    BINNED sufficient statistics: the corpus-sized input reduces to
    B=10 (n, pos) pairs in ONE map-side-combined aggregate, and the
    O(B^2)=55-row minimax lattice is broadcast-trivial. That two-level
    shape (big scan -> tiny exact solve) is the same discipline as
    ml_linreg_normal_eq and runs unchanged at 100 TB; calibration bins
    in production are quantiles of the score, still O(B) state."""
    tables.load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "iso_lineitem"
    )
    return spark.sql("WITH " + _isotonic_sql("iso_lineitem"))


# --- split-conformal prediction intervals ----------------------------------

#: body over {sp} = the materialized split frame (rk, x, y_c, s).
#: s: 0/1 train, 2 calibration, 3 test — disjoint by id_mix, the
#: engine-shared full-entropy assignment.
_CONF_BODY = (
    "tr AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y_c) AS sy, "
    "SUM(x * x) AS sxx, SUM(x * y_c) AS sxy FROM {sp} WHERE s <= 1), "
    # NULLIF: constant-x train split leaves the slope undefined (NULL,
    # never an ANSI throw — the degenerate-input doctrine)
    "fb AS (SELECT n, "
    "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
    "NULLIF(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx, 0.0e0) "
    "AS b, sx, sy FROM tr), "
    "f AS (SELECT n AS n_train, b, "
    "(CAST(sy AS DOUBLE) - b * sx) / NULLIF(n, 0) AS a FROM fb), "
    # calibration residuals snapped to exact milli-cent integers: the
    # conformal quantile becomes an integer ORDER STATISTIC, immune to
    # float tie ambiguity cross-engine
    "cal AS (SELECT CAST(ROUND(abs(y_c - (a + b * x)) * 1.0e3) "
    "AS BIGINT) AS rmu FROM {sp} CROSS JOIN f WHERE s = 2), "
    # k = ceil((n_cal+1)*0.9) in EXACT integer arithmetic (9(n+1)/10
    # rounded up) — (n+1)*0.9e0 is off by an ulp at multiples of ten
    "kq AS (SELECT COUNT(*) AS n_calib, "
    "(9 * (COUNT(*) + 1) + 9) // 10 AS kk FROM cal), "
    # distributed exact order statistic: bucket counts -> cumulative
    # over the BOUNDED bucket frame -> rank only inside the one target
    # bucket (the two-phase prefix-sum pattern; no global row sort)
    "bc AS (SELECT rmu // 1000000 AS bk, COUNT(*) AS c "
    "FROM cal GROUP BY rmu // 1000000), "
    "cum AS (SELECT bk, c, SUM(c) OVER (ORDER BY bk) AS cm FROM bc), "
    "tb AS (SELECT MIN(bk) AS tbk, MIN(cm - c) AS below "
    "FROM cum CROSS JOIN kq WHERE cm >= kk), "
    "w AS (SELECT rmu, row_number() OVER (ORDER BY rmu) AS rn "
    "FROM cal CROSS JOIN tb WHERE rmu // 1000000 = tbk), "
    "qv AS (SELECT MIN(rmu) AS q_mu FROM w CROSS JOIN kq "
    "CROSS JOIN tb WHERE rn = kk - below), "
    "te AS (SELECT COUNT(*) AS n_test, "
    "SUM(CASE WHEN CAST(ROUND(abs(y_c - (a + b * x)) * 1.0e3) "
    "AS BIGINT) <= q_mu THEN 1 ELSE 0 END) AS n_covered "
    "FROM {sp} CROSS JOIN f CROSS JOIN qv WHERE s = 3) "
    "SELECT CAST(f.n_train AS BIGINT) AS n_train, "
    "CAST(kq.n_calib AS BIGINT) AS n_calib, "
    "CAST(te.n_test AS BIGINT) AS n_test, "
    "CAST(qv.q_mu AS DOUBLE) / 1.0e3 AS q_cents, "
    "CAST(te.n_covered AS BIGINT) AS n_covered, "
    "CAST(te.n_covered AS DOUBLE) / NULLIF(te.n_test, 0) AS coverage "
    "FROM f CROSS JOIN kq CROSS JOIN qv CROSS JOIN te"
)

_CONF_SPLIT = (
    "SELECT l_orderkey * 8 + l_linenumber AS rk, "
    "CAST(l_quantity AS BIGINT) AS x, "
    "CAST(ROUND(l_extendedprice * 100.0e0) AS BIGINT) AS y_c, "
    f"{id_mix('l_orderkey * 8 + l_linenumber', 11)} % 4 AS s "
    "FROM {l}"
)


@query(
    "ml_conformal_interval",
    oracle=(
        "WITH sp AS MATERIALIZED ("
        + _CONF_SPLIT.format(l="lineitem")
        + "), "
        + _CONF_BODY.format(sp="sp")
    ),
)
def ml_conformal_interval(spark, sf_dir):
    """Split-conformal prediction intervals (Vovk et al.; Lei et al.
    2018) — the distribution-free uncertainty layer modern ML evals
    wrap around ANY point model, here the one-feature OLS
    (extendedprice ~ quantity): fit on the train split, take the
    ceil((n+1)(1-alpha)) smallest absolute calibration residual as the
    interval half-width q, and measure finite-sample test coverage —
    guaranteed >= 1-alpha in expectation REGARDLESS of the model or
    data distribution, which is the whole point. Everything is
    relational and exact: id_mix 4-way split, closed-form OLS from one
    gram aggregate, residuals snapped to integer milli-cents so the
    conformal quantile is an integer order statistic computed by the
    DISTRIBUTED two-phase pattern (bucket counts -> bounded cumulative
    window -> rank inside the single target bucket — no global row
    sort; the prefix-sum doctrine), and integer-exact k (9(n+1)+9)//10
    avoiding the (n+1)*0.9 ulp trap. Degenerate splits (constant x,
    empty calibration) ride NULLIF to NULL, never an ANSI throw. The
    split frame is materialized once against its three consumers."""
    sp = materialize(
        tables.load(spark, sf_dir, "lineitem").selectExpr(
            "l_orderkey * 8 + l_linenumber AS rk",
            "CAST(l_quantity AS BIGINT) AS x",
            "CAST(ROUND(l_extendedprice * 100.0e0) AS BIGINT) AS y_c",
            f"{id_mix('l_orderkey * 8 + l_linenumber', 11)} % 4 AS s",
        )
    )
    sp.createOrReplaceTempView("conf_sp")
    body = _CONF_BODY.format(sp="conf_sp").replace(" // ", " DIV ")
    return spark.sql("WITH " + body)
