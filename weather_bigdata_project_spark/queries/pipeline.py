"""The end-to-end training-data pipeline query: what the extension
operators exist FOR, composed. A document survives into the corpus iff

  - quality score >= 0.5        (text_quality_score)
  - detected language = 'en'    (text_language_id)
  - it is its exact-dup group's canonical copy (dedup_exact_survivors)
  - it is not the non-canonical side of any MinHash near-dup pair
    (dedup_minhash_lsh, keep-lowest-id policy)

Both sides compose the ALREADY-VERIFIED building blocks: the Spark side
calls the registered query functions; the oracle nests their oracle SQL
as subqueries. At 100 TB each stage is the same plan that was
individually shuffle-audited (SCALE.md) — composition adds joins on
doc_id only, all safely re-partitioned by one key."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import textops as T  # noqa: F401  (oracle CTE reuse)

# the building blocks must be registered before we can nest their SQL —
# explicit imports make this module safe to import directly, not only
# through registry.load()
from . import dedup as _dedup  # noqa: F401
from . import text as _text  # noqa: F401
from ..registry import ORACLES, QUERIES, query

_SUB = {
    "quality": "text_quality_score",
    "lang": "text_language_id",
    "survivors": "dedup_exact_survivors",
    "neardup": "dedup_minhash_lsh",
}


def _fused_quality_lang(spark, sf_dir):
    """quality + language fused into ONE pass, with `source` carried
    along for free. Round 10: the pass is now fully IN-ROW (the shared
    _TOK_STATS_INLINE struct over the split array) — the old fused
    explode + groupBy(doc_id, source) with COUNT(DISTINCT tok) paid a
    full corpus-token shuffle plus the distinct-agg Expand doubling;
    now the whole quality/language/token-count surface is a narrow map
    over the corpus scan, zero shuffles. Same expressions, same
    rounding as the registered blocks (see the identity notes on
    _TOK_STATS_INLINE), verified identical by the callers' nested
    oracles. Shared by corpus_filter_pipeline /
    corpus_training_assembly / corpus_dedup_funnel."""
    from .text import _QUALITY_SQL, _TOK_STATS_INLINE

    return (
        T.docs(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", F.inline(F.expr(_TOK_STATS_INLINE)))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.expr(_QUALITY_SQL).alias("quality"),
            F.when(F.col("_nstop") / F.col("n_tokens") >= 0.05, "en")
            .otherwise("unknown")
            .alias("lang_pred"),
            F.expr(rnd("_nstop / n_tokens", 4)).alias("stop_ratio"),
        )
    )


@query(
    "corpus_filter_pipeline",
    oracle=(
        "SELECT q.doc_id, q.n_tokens, q.quality, l.stop_ratio "
        "FROM ({quality}) q "
        "JOIN ({lang}) l USING (doc_id) "
        "JOIN ({survivors}) s USING (doc_id) "
        "WHERE q.quality >= 0.5e0 AND l.lang_pred = 'en' "
        "AND q.doc_id NOT IN (SELECT doc2 FROM ({neardup}))"
    ).format(**{k: ORACLES[v] for k, v in _SUB.items()}),
)
def corpus_filter_pipeline(spark, sf_dir):
    """See module docstring; quality/language/token stats come from the
    shared one-scan fused frame (_fused_quality_lang)."""
    return _filtered_corpus(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality", "stop_ratio"
    )


def _filtered_corpus(spark, sf_dir):
    """The surviving-document frame (doc_id, source, n_tokens, quality,
    stop_ratio, ...) behind corpus_filter_pipeline, kept wide so
    corpus_training_assembly can read `source` without a second
    documents join (the round-7 scan audit charged that join as an
    extra corpus scan)."""
    fused = _fused_quality_lang(spark, sf_dir)
    survivors = QUERIES["dedup_exact_survivors"](spark, sf_dir)
    # no distinct: the left_anti probe neither multiplies nor cares
    neardup = QUERIES["dedup_minhash_lsh"](spark, sf_dir).select(
        F.col("doc2").alias("doc_id")
    )
    return (
        fused.join(survivors, "doc_id", "left_semi")
        .join(neardup, "doc_id", "left_anti")
        .filter((F.col("quality") >= 0.5) & (F.col("lang_pred") == "en"))
    )


# --- the full training-data assembly: filter -> split -> pack --------------

from ..functions.exprs import rnd  # noqa: E402
from .curation import _SEQ_LEN, _SPLIT  # noqa: E402  (registered above)

_ASM_TAIL = (
    "g AS (SELECT split, source, COUNT(*) AS n_docs, "
    "SUM(n_tokens) AS n_tokens FROM surv GROUP BY split, source), "
    "p AS (SELECT split, source, n_docs, n_tokens, "
    f"CAST(CEIL(CAST(n_tokens AS DOUBLE) / {_SEQ_LEN}.0e0) AS BIGINT) "
    "AS n_sequences FROM g) "
    "SELECT split, CAST(SUM(n_docs) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_tokens) AS BIGINT) AS n_tokens, "
    "CAST(SUM(n_sequences) AS BIGINT) AS n_sequences, "
    + rnd(
        f"CAST(SUM(n_tokens) AS DOUBLE) / ({_SEQ_LEN}.0e0 "
        "* SUM(n_sequences))",
        4,
    )
    + " AS fill_rate FROM p GROUP BY split"
)


@query(
    "corpus_training_assembly",
    oracle=(
        "WITH surv AS (SELECT f.doc_id, f.n_tokens, "
        + _SPLIT.replace("doc_id", "f.doc_id")
        + " AS split, d.source FROM ("
        + ORACLES["corpus_filter_pipeline"]
        + ") f JOIN documents d ON d.doc_id = f.doc_id), "
        + _ASM_TAIL
    ),
)
def corpus_training_assembly(spark, sf_dir):
    """The whole training-data assembly as one verified composition:
    quality/language/dedup filtering (corpus_filter_pipeline) ->
    deterministic LCG train/validation/test split -> per-(split,
    source) greedy 512-token sequence packing, summarized per split as
    docs / tokens / sequences / packing fill rate. This is the job
    whose output feeds the GPUs; every stage is an already-oracle-
    verified block, composition adds only doc_id joins and one
    split-cardinality aggregate. Fill rate is the number a pretraining
    lead actually asks for (wasted pad fraction = 1 - fill). `source`
    rides the shared filtered frame, so no second documents join (and
    no second corpus scan) exists."""
    surv = _filtered_corpus(spark, sf_dir).select(
        "doc_id", "n_tokens", F.expr(_SPLIT).alias("split"), "source"
    )
    g = surv.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    p = g.select(
        "split",
        "n_docs",
        "n_tokens",
        F.expr(
            f"CAST(CEIL(CAST(n_tokens AS DOUBLE) / {_SEQ_LEN}.0e0) "
            "AS BIGINT)"
        ).alias("n_sequences"),
    )
    return p.groupBy("split").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_sequences").cast("bigint").alias("n_sequences"),
        F.expr(
            rnd(
                f"CAST(SUM(n_tokens) AS DOUBLE) / ({_SEQ_LEN}.0e0 "
                "* SUM(n_sequences))",
                4,
            )
        ).alias("fill_rate"),
    )


# --- the dedup survivorship funnel ----------------------------------------


def _funnel_oracle() -> str:
    surv = ORACLES["dedup_exact_survivors"]
    near = ORACLES["dedup_minhash_lsh"]
    qual = ORACLES["text_quality_score"]
    lang = ORACLES["text_language_id"]
    s2 = f"(SELECT doc_id FROM ({surv}) _s)"
    s3 = (
        f"(SELECT doc_id FROM {s2} _e WHERE doc_id NOT IN "
        f"(SELECT doc2 FROM ({near}) _n))"
    )
    s4 = (
        f"(SELECT doc_id FROM {s3} _c WHERE doc_id IN "
        f"(SELECT doc_id FROM ({qual}) _q WHERE quality >= 0.5e0) "
        f"AND doc_id IN "
        f"(SELECT doc_id FROM ({lang}) _l WHERE lang_pred = 'en'))"
    )
    stage = (
        "SELECT {k} AS stage, '{name}' AS stage_name, "
        "CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(t) AS BIGINT) AS tk "
        "FROM tok {pred}"
    )
    return (
        "WITH tok AS (SELECT doc_id, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS t "
        "FROM documents), "
        "raw AS (SELECT CAST(COUNT(*) AS BIGINT) AS raw_n, "
        "CAST(SUM(t) AS BIGINT) AS raw_t FROM tok), "
        "st AS ("
        + stage.format(k=1, name="raw", pred="")
        + " UNION ALL "
        + stage.format(
            k=2, name="exact_canonical",
            pred=f"WHERE doc_id IN {s2}",
        )
        + " UNION ALL "
        + stage.format(
            k=3, name="neardup_canonical",
            pred=f"WHERE doc_id IN {s3}",
        )
        + " UNION ALL "
        + stage.format(
            k=4, name="quality_lang",
            pred=f"WHERE doc_id IN {s4}",
        )
        + ") SELECT stage, stage_name, n AS n_docs, tk AS n_tokens, "
        + rnd("CAST(n AS DOUBLE) / raw_n", 6)
        + " AS retained_frac, "
        + rnd("CAST(tk AS DOUBLE) / raw_t", 6)
        + " AS token_retained_frac FROM st CROSS JOIN raw"
    )


@query("corpus_dedup_funnel", oracle=_funnel_oracle())
def corpus_dedup_funnel(spark, sf_dir):
    """The survivorship funnel a curation run reports: document AND
    token counts plus retained fractions after each pipeline stage —
    raw -> exact canonical (one per byte-identical group) -> near-dup
    canonical (keep-lowest-id against verified MinHash pairs) ->
    quality+language gate. Token columns are the number the GPUs care
    about (dedup preferentially removes boilerplate, so doc and token
    retention DIVERGE — that divergence is itself a signal). Each stage
    composes the ALREADY-VERIFIED blocks with the same keep-lowest-id
    policy as corpus_filter_pipeline; the oracle nests their SQL. This
    one result is the headline number of a 100 TB curation job ("we
    kept 43% of docs, 47% of tokens"), and stage deltas localize where
    the data went.

    Single-scan shape: token counts, the quality gate, and the
    language gate all read the ONE materialized fused tokens aggregate
    (_fused_quality_lang — n_tokens == size(split), the same count the
    raw-stage column needs), and the cumulative stage frames are
    materialized too: tok is referenced by all four stage counts plus
    the raw totals, and stage k's survivor set is the base of stage
    k+1's — without persistence each reference re-derives its whole
    upstream chain (s4 re-runs s3 re-runs s2), which the round-7 scan
    audit measured as SIX documents parquet scans per run (the
    quality/language blocks' separate explodes were two of them)."""
    fused = T.materialize(_fused_quality_lang(spark, sf_dir))
    tok = fused.select(
        "doc_id", F.col("n_tokens").cast("bigint").alias("t")
    )
    s2 = T.materialize(QUERIES["dedup_exact_survivors"](spark, sf_dir))
    near = QUERIES["dedup_minhash_lsh"](spark, sf_dir).select(
        F.col("doc2").alias("doc_id")
    )
    s3 = T.materialize(s2.join(near, "doc_id", "left_anti"))
    q = fused.filter(F.col("quality") >= 0.5).select("doc_id")
    lang = fused.filter(F.col("lang_pred") == "en").select("doc_id")
    s4 = s3.join(q, "doc_id", "left_semi").join(lang, "doc_id", "left_semi")
    stages = [
        (1, "raw", tok),
        (2, "exact_canonical", s2),
        (3, "neardup_canonical", s3),
        (4, "quality_lang", s4),
    ]
    out = None
    for k, name, frame in stages:
        counted = (
            tok if name == "raw" else frame.join(tok, "doc_id")
        )
        row = counted.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("t").cast("bigint").alias("tk"),
        ).select(
            F.lit(k).alias("stage"),
            F.lit(name).alias("stage_name"),
            F.col("n").cast("bigint").alias("n_docs"),
            F.col("tk").alias("n_tokens"),
        )
        out = row if out is None else out.unionByName(row)
    raw = tok.agg(
        F.count(F.lit(1)).cast("bigint").alias("raw_n"),
        F.sum("t").cast("bigint").alias("raw_t"),
    )
    return out.join(F.broadcast(raw)).select(
        "stage",
        "stage_name",
        "n_docs",
        "n_tokens",
        F.expr(rnd("CAST(n_docs AS DOUBLE) / raw_n", 6)).alias(
            "retained_frac"
        ),
        F.expr(rnd("CAST(n_tokens AS DOUBLE) / raw_t", 6)).alias(
            "token_retained_frac"
        ),
    )
