"""Retrieval operators over `documents`: BM25 ranking and positional
phrase search — the query-serving half of the inverted-index story
(`text_inverted_index` builds the index; these are the lookups a
retrieval-augmented pipeline runs against it).

Scale notes (SCALE.md doctrine):
- BM25 filters the token stream to the query's terms BEFORE any shuffle,
  so the aggregate carries candidate-docs x query-terms rows, never the
  corpus; document length is a narrow in-row `size(split(...))`.
- Per-(doc, term) contributions are snapped to integer micro-units
  before the cross-term SUM, so scores are exact integers — order- and
  partitioning-insensitive, bit-stable across engines (the `_PMI_U`
  doctrine from text.py).
- Phrase search is a positional-index self-equi-join on (doc_id, pos) —
  a hash join, never a nested loop; the oracle recomputes occurrences
  with an in-row list scan (a genuinely different algorithm), so the
  match is an algebraic cross-check, not a mirror.

Reference parity: the reference has no retrieval surface at all (its
only text handling is `weather_description.like(...)` —
ref:spark-apps/weather_streaming.py:107-112); this extends the
north-star text-analysis family.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exprs import rnd
from ..operators import textops as T
from ..registry import query

# --- BM25 ----------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "stream")
_BM25_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"
_BM25_K1 = "1.2e0"
_BM25_B = "0.75e0"
_BM25_TOP = 10

#: Okapi BM25 contribution of one (doc, term) row, in integer
#: micro-units. `idf_u` is the LN snapped to nano-units first (absorbs
#: last-ulp libm differences); dl/avgdl is the exact-integer product
#: dl*n divided once by sdl, so both engines see identical doubles.
#: Identical expression TEXT runs on Spark and DuckDB.
_BM25_CONTRIB_U = (
    "CAST(ROUND((CAST(idf_u AS DOUBLE) / 1.0e9) * "
    f"(CAST(tf AS DOUBLE) * ({_BM25_K1} + 1.0e0)) / "
    f"(CAST(tf AS DOUBLE) + {_BM25_K1} * (1.0e0 - {_BM25_B} + {_BM25_B} * "
    "(CAST(dl * n AS DOUBLE) / CAST(sdl AS DOUBLE)))) "
    "* 1.0e6) AS BIGINT)"
)

_BM25_IDF_U = (
    "CAST(ROUND(LN((CAST(n - df AS DOUBLE) + 0.5e0) / "
    "(CAST(df AS DOUBLE) + 0.5e0) + 1.0e0) * 1.0e9) AS BIGINT)"
)


#: CTE chain ending in `scored(doc_id, score_u)` — shared by the BM25
#: top-10 oracle and the RRF fusion oracle (the SQL twin of
#: _bm25_scored below).
_BM25_SCORED_CTES = (
    T.TOKS_CTE + ", "
    "dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl "
    "FROM documents), "
    "tot AS (SELECT SUM(dl) AS sdl, COUNT(*) AS n FROM dl), "
    "tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks "
    f"WHERE tok IN {_BM25_TERMS_SQL} GROUP BY doc_id, tok), "
    "dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok), "
    "idf AS (SELECT tok, df, " + _BM25_IDF_U + " AS idf_u "
    "FROM dfq, tot), "
    "contrib AS (SELECT doc_id, " + _BM25_CONTRIB_U + " AS c_u "
    "FROM tf JOIN idf USING (tok) JOIN dl USING (doc_id), tot), "
    "scored AS (SELECT doc_id, SUM(c_u) AS score_u FROM contrib "
    "GROUP BY doc_id)"
)


def _bm25_scored(spark, sf_dir):
    """(doc_id, score_u): exact-integer BM25 scores for every candidate
    doc of the fixed query — the shared core of text_bm25_search and
    retrieval_rrf_fusion.

    Single scan: document length AND the per-term frequencies are pure
    in-row array folds (size of the filtered split ==
    explode-filter-count, for a fixed 3-term query), so ONE narrow
    doc-cardinality frame carries everything; it is materialized
    because the totals, the candidate stack, and the length join
    reference it three ways (the previous explode+aggregate form
    re-derived the corpus scan per reference — 4-6x documents parquet
    reads across the two callers, round-7 scan audit). Everything
    after the scan carries candidate-docs x query-terms rows; df and
    the global (sdl, n) totals are 1-to-3-row broadcast aggregates."""
    b = T.materialize(
        T.docs(spark, sf_dir).selectExpr(
            "doc_id",
            "size(split(text, ' ')) AS dl",
            *(
                "CAST(size(filter(split(text, ' '), t -> t = "
                f"'{w}')) AS BIGINT) AS tf{i}"
                for i, w in enumerate(_BM25_TERMS)
            ),
        )
    )
    tot = b.agg(F.sum("dl").alias("sdl"), F.count(F.lit(1)).alias("n"))
    stack_args = ", ".join(
        f"'{w}', tf{i}" for i, w in enumerate(_BM25_TERMS)
    )
    tf = b.selectExpr(
        "doc_id", f"stack({len(_BM25_TERMS)}, {stack_args}) AS (tok, tf)"
    ).filter(F.col("tf") > 0)
    dfq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = dfq.crossJoin(F.broadcast(tot)).select(
        "tok", "df", F.expr(_BM25_IDF_U).alias("idf_u")
    )
    contrib = (
        tf.join(F.broadcast(idf), "tok")
        .join(b.select("doc_id", "dl"), "doc_id")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.expr(_BM25_CONTRIB_U).alias("c_u"))
    )
    return contrib.groupBy("doc_id").agg(F.sum("c_u").alias("score_u"))


@query(
    "text_bm25_search",
    oracle=(
        "WITH " + _BM25_SCORED_CTES + ", "
        "r AS (SELECT doc_id, score_u, ROW_NUMBER() OVER "
        "(ORDER BY score_u DESC, doc_id) AS rnk FROM scored) "
        "SELECT rnk, doc_id, "
        "CAST(score_u AS DOUBLE) / 1.0e6 AS bm25 "
        f"FROM r WHERE rnk <= {_BM25_TOP}"
    ),
)
def text_bm25_search(spark, sf_dir):
    """BM25 top-10 for the fixed query {spark, join, stream} (k1=1.2,
    b=0.75). Scoring core shared with retrieval_rrf_fusion
    (_bm25_scored); contributions are micro-unit integers so the
    cross-term SUM and the top-10 cut are exact. Tie-break on doc_id =>
    total order."""
    scored = _bm25_scored(spark, sf_dir)
    # top-10 cut FIRST via orderBy+limit => TakeOrderedAndProject
    # (per-partition 10-row heaps, driver merges 10 rows) — the global
    # rank window then runs over a 10-row frame, never the candidate set.
    top = scored.orderBy(F.desc("score_u"), F.asc("doc_id")).limit(
        _BM25_TOP
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score_u"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).alias("rnk"),
        "doc_id",
        F.expr("CAST(score_u AS DOUBLE) / 1.0e6").alias("bm25"),
    )


# --- positional phrase search --------------------------------------------

_PHRASE_W1 = "merge"
_PHRASE_W2 = "join"


@query(
    "text_phrase_search",
    oracle=(
        # In-row list scan: 1-based DuckDB lists; i ranges over positions
        # that have a successor. Deliberately NOT the join algorithm the
        # Spark side uses — an independent recomputation.
        "WITH sp AS (SELECT doc_id, string_split(text, ' ') AS s "
        "FROM documents) "
        "SELECT doc_id, len(list_filter(range(1, len(s)), "
        f"i -> s[i] = '{_PHRASE_W1}' AND s[i + 1] = '{_PHRASE_W2}')) "
        "AS n_occurrences "
        "FROM sp "
        "WHERE len(list_filter(range(1, len(s)), "
        f"i -> s[i] = '{_PHRASE_W1}' AND s[i + 1] = '{_PHRASE_W2}')) > 0"
    ),
)
def text_phrase_search(spark, sf_dir):
    """Exact phrase search ("merge join") as a positional-index
    self-join: occurrences are (doc, pos) pairs where tok='merge' meets
    tok='join' at pos+1 — the classic IR positional-intersection
    operator. Both sides are pre-filtered to their single term before
    the join, so the hash join's inputs are term-posting-sized, never
    the corpus; the join key (doc_id, pos+1=pos) is equi, so this is a
    shuffle hash join at scale — no nested loop. The oracle recomputes
    occurrences with an in-row list scan: two different algorithms must
    agree exactly."""
    toks = T.tokens(spark, sf_dir)
    left = toks.filter(F.col("tok") == _PHRASE_W1).select(
        "doc_id", (F.col("pos") + F.lit(1)).alias("succ")
    )
    right = toks.filter(F.col("tok") == _PHRASE_W2).select(
        F.col("doc_id").alias("r_doc_id"), F.col("pos").alias("r_pos")
    )
    hits = left.join(
        right,
        (left.doc_id == F.col("r_doc_id"))
        & (left.succ == F.col("r_pos")),
    ).select(left.doc_id)
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


# --- reciprocal-rank fusion (hybrid retrieval) -----------------------------

#: standard RRF constant (Cormack et al. 2009) and per-ranker pool depth
_RRF_K = 60
_RRF_POOL = 100
_RRF_TOP = 10

#: one ranker's RRF contribution in integer nano-units: 1e9/(k + rank)
#: snapped once per (doc, ranker), so the two-ranker sum is exact
#: integer arithmetic in both engines.
def _rrf_term(rank_col: str) -> str:
    return (
        f"COALESCE(CAST(ROUND(1.0e9 / ({_RRF_K} + {rank_col})) "
        "AS BIGINT), 0)"
    )


def _rrf_oracle() -> str:
    # text.py registers text_quality_score before this module loads
    # (registry.load order); force it for direct-import callers too.
    from . import text as _text  # noqa: F401
    from ..registry import ORACLES

    return (
        "WITH " + _BM25_SCORED_CTES + ", "
        "q AS (SELECT doc_id, quality FROM ("
        + ORACLES["text_quality_score"]
        + ")), "
        "lex AS (SELECT doc_id, ROW_NUMBER() OVER "
        "(ORDER BY score_u DESC, doc_id) AS r_lex FROM scored), "
        f"lex100 AS (SELECT * FROM lex WHERE r_lex <= {_RRF_POOL}), "
        "qq AS (SELECT s.doc_id, ROW_NUMBER() OVER "
        "(ORDER BY q.quality DESC, s.doc_id) AS r_q "
        "FROM scored s JOIN q ON q.doc_id = s.doc_id), "
        f"q100 AS (SELECT * FROM qq WHERE r_q <= {_RRF_POOL}), "
        "f AS (SELECT COALESCE(lex100.doc_id, q100.doc_id) AS doc_id, "
        "r_lex, r_q FROM lex100 FULL JOIN q100 "
        "ON lex100.doc_id = q100.doc_id), "
        "sc AS (SELECT doc_id, r_lex, r_q, "
        + _rrf_term("r_lex") + " + " + _rrf_term("r_q") + " AS rrf_u "
        "FROM f), "
        "rr AS (SELECT *, ROW_NUMBER() OVER "
        "(ORDER BY rrf_u DESC, doc_id) AS rnk FROM sc) "
        "SELECT rnk, doc_id, r_lex AS lex_rank, r_q AS quality_rank, "
        "CAST(rrf_u AS DOUBLE) / 1.0e9 AS rrf "
        f"FROM rr WHERE rnk <= {_RRF_TOP}"
    )


@query("retrieval_rrf_fusion", oracle=_rrf_oracle())
def retrieval_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval by RECIPROCAL-RANK FUSION (Cormack et al. 2009,
    the fusion every hybrid BM25+prior / BM25+vector stack uses): the
    lexical BM25 ranking and a document-quality prior ranking are each
    cut to a top-100 pool, fused by sum of 1/(60+rank), and the fused
    top-10 returned with both source ranks (NULL = doc absent from that
    ranker's pool — RRF's defining property is graceful handling of
    partial overlap).

    Scale shape: each ranker ends in a TakeOrdered top-100 heap (never
    a global sort); the fusion's full-outer join and final rank run on
    <= 200 rows. The quality prior joins candidate docs only (inner
    join against the BM25 candidate set), so the prior's corpus-wide
    aggregate is the only corpus-scale stage — in production that score
    is precomputed at ingest. Contributions snap to integer nano-units
    per (doc, ranker), so the fused ordering is bit-stable across
    engines and partitionings."""
    from pyspark.sql import Window

    scored = T.materialize(_bm25_scored(spark, sf_dir))
    from ..registry import QUERIES

    q = QUERIES["text_quality_score"](spark, sf_dir).select(
        "doc_id", "quality"
    )
    lex100 = (
        scored.orderBy(F.desc("score_u"), F.asc("doc_id"))
        .limit(_RRF_POOL)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score_u"), F.asc("doc_id")))
            .alias("r_lex"),
        )
    )
    q100 = (
        scored.join(q, "doc_id")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .limit(_RRF_POOL)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("quality"), F.asc("doc_id")))
            .alias("r_q"),
        )
    )
    fused = lex100.join(q100, "doc_id", "full").select(
        "doc_id",
        "r_lex",
        "r_q",
        F.expr(_rrf_term("r_lex") + " + " + _rrf_term("r_q")).alias(
            "rrf_u"
        ),
    )
    top = fused.orderBy(F.desc("rrf_u"), F.asc("doc_id")).limit(_RRF_TOP)
    w = Window.orderBy(F.desc("rrf_u"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).alias("rnk"),
        "doc_id",
        F.col("r_lex").alias("lex_rank"),
        F.col("r_q").alias("quality_rank"),
        F.expr("CAST(rrf_u AS DOUBLE) / 1.0e9").alias("rrf"),
    )


# --- hybrid lexical+semantic more-like-this retrieval ----------------------

_MLT_Q = 0  # query document / embedding id (id-aligned sidecar layout)


def _mlt_oracle() -> str:
    return (
        "WITH " + T.SHINGLES_CTE + ", "
        "ids AS (SELECT doc_id, " + T.hashed_id_duck("shingle")
        + " AS sh FROM shingles), "
        f"q0 AS (SELECT sh FROM ids WHERE doc_id = {_MLT_Q}), "
        "n0 AS (SELECT COUNT(*) AS n0 FROM q0), "
        "sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM ids GROUP BY doc_id), "
        "c AS (SELECT i.doc_id, COUNT(*) AS c FROM ids i JOIN q0 "
        f"USING (sh) WHERE i.doc_id <> {_MLT_Q} GROUP BY i.doc_id), "
        "lexs AS (SELECT c.doc_id, "
        + rnd("CAST(c AS DOUBLE) / (sz.n_sh + n0.n0 - c)", 6)
        + " AS jac FROM c JOIN sz USING (doc_id) CROSS JOIN n0), "
        "lex AS (SELECT doc_id, ROW_NUMBER() OVER "
        "(ORDER BY jac DESC, doc_id) AS r_lex FROM lexs), "
        f"lex100 AS (SELECT * FROM lex WHERE r_lex <= {_RRF_POOL}), "
        "z AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x, "
        "CAST(unnest(qe) AS DOUBLE) AS y FROM embeddings, "
        f"(SELECT embedding AS qe FROM embeddings WHERE vec_id = {_MLT_Q}) "
        f"WHERE vec_id <> {_MLT_Q}), "
        "d AS (SELECT vec_id, SUM(x * y) AS dot, SUM(x * x) AS n2, "
        "SUM(y * y) AS q2 FROM z GROUP BY vec_id), "
        "vecs AS (SELECT vec_id AS doc_id, "
        + rnd("dot / (SQRT(n2) * SQRT(q2))", 6)
        + " AS cosine FROM d), "
        "vec AS (SELECT doc_id, ROW_NUMBER() OVER "
        "(ORDER BY cosine DESC, doc_id) AS r_vec FROM vecs), "
        f"vec100 AS (SELECT * FROM vec WHERE r_vec <= {_RRF_POOL}), "
        "f AS (SELECT COALESCE(lex100.doc_id, vec100.doc_id) AS doc_id, "
        "r_lex, r_vec FROM lex100 FULL JOIN vec100 "
        "ON lex100.doc_id = vec100.doc_id), "
        "sc AS (SELECT doc_id, r_lex, r_vec, "
        + _rrf_term("r_lex") + " + " + _rrf_term("r_vec") + " AS rrf_u "
        "FROM f), "
        "rr AS (SELECT *, ROW_NUMBER() OVER "
        "(ORDER BY rrf_u DESC, doc_id) AS rnk FROM sc) "
        "SELECT rnk, doc_id, r_lex AS lex_rank, r_vec AS vec_rank, "
        "CAST(rrf_u AS DOUBLE) / 1.0e9 AS rrf "
        f"FROM rr WHERE rnk <= {_RRF_TOP}"
    )


@query("retrieval_hybrid_morelikethis", oracle=_mlt_oracle())
def retrieval_hybrid_morelikethis(spark, sf_dir):
    """TRUE hybrid retrieval for one query document (doc 0, whose
    embedding is vec 0 in the id-aligned sidecar — doc_embedding_join's
    layout): the LEXICAL leg ranks docs by exact 3-gram-shingle Jaccard
    to the query doc (Elasticsearch's more-like-this), the SEMANTIC leg
    by embedding cosine (the kNN route), and reciprocal-rank fusion
    merges the two top-100 pools — the BM25+vector hybrid every RAG
    stack runs, with both source ranks reported (NULL = found by only
    one modality, which is the whole point of running both).

    Scale shape: the lexical leg broadcasts the query doc's shingle-id
    set and probes the corpus shingle frame (candidate docs = docs
    sharing >= 1 shingle — never all pairs); the semantic leg is the
    broadcast-query cosine scan (IVF-routed at 100 TB, same fusion);
    each leg ends in a top-100 TakeOrdered heap and the fusion runs on
    <= 200 rows. RRF terms snap to integer nano-units, so the fused
    order is bit-stable."""
    from pyspark.sql import Window

    from .. import tables

    sh = T.doc_shingle_ids_shared(spark, sf_dir)
    q0 = sh.filter(F.col("doc_id") == _MLT_Q).select("sh")
    n0 = q0.agg(F.count(F.lit(1)).alias("n0"))
    c = (
        sh.filter(F.col("doc_id") != _MLT_Q)
        .join(F.broadcast(q0), "sh")
        .groupBy("doc_id")
        .agg(F.first("n_sh").alias("n_sh"), F.count(F.lit(1)).alias("c"))
    )
    lex100 = (
        c.crossJoin(F.broadcast(n0))
        .select(
            "doc_id",
            F.expr(rnd("CAST(c AS DOUBLE) / (n_sh + n0 - c)", 6)).alias(
                "jac"
            ),
        )
        .orderBy(F.desc("jac"), F.asc("doc_id"))
        .limit(_RRF_POOL)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("jac"), F.asc("doc_id")))
            .alias("r_lex"),
        )
    )
    emb = tables.load(spark, sf_dir, "embeddings")
    qe = emb.filter(F.col("vec_id") == _MLT_Q).select(
        F.col("embedding").alias("qe")
    )
    dot = (
        "aggregate(zip_with(embedding, qe, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0e0, (acc, v) -> acc + v)"
    )
    n2 = (
        "aggregate(zip_with(embedding, embedding, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0e0, (acc, v) -> acc + v)"
    )
    q2 = (
        "aggregate(zip_with(qe, qe, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0e0, (acc, v) -> acc + v)"
    )
    vec100 = (
        emb.filter(F.col("vec_id") != _MLT_Q)
        .crossJoin(F.broadcast(qe))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.expr(rnd(f"({dot}) / (SQRT({n2}) * SQRT({q2}))", 6)).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(_RRF_POOL)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("cosine"), F.asc("doc_id")))
            .alias("r_vec"),
        )
    )
    fused = lex100.join(vec100, "doc_id", "full").select(
        "doc_id",
        "r_lex",
        "r_vec",
        F.expr(_rrf_term("r_lex") + " + " + _rrf_term("r_vec")).alias(
            "rrf_u"
        ),
    )
    top = fused.orderBy(F.desc("rrf_u"), F.asc("doc_id")).limit(_RRF_TOP)
    w = Window.orderBy(F.desc("rrf_u"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).alias("rnk"),
        "doc_id",
        F.col("r_lex").alias("lex_rank"),
        F.col("r_vec").alias("vec_rank"),
        F.expr("CAST(rrf_u AS DOUBLE) / 1.0e9").alias("rrf"),
    )
