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
    q = QUERIES["text_quality_score"](spark, sf_dir)
    lang = QUERIES["text_language_id"](spark, sf_dir)
    survivors = QUERIES["dedup_exact_survivors"](spark, sf_dir)
    # no distinct: the left_anti probe neither multiplies nor cares
    neardup = QUERIES["dedup_minhash_lsh"](spark, sf_dir).select(
        F.col("doc2").alias("doc_id")
    )
    return (
        q.join(lang, "doc_id")
        .join(survivors, "doc_id", "left_semi")
        .join(neardup, "doc_id", "left_anti")
        .filter((F.col("quality") >= 0.5) & (F.col("lang_pred") == "en"))
        .select("doc_id", "n_tokens", "quality", "stop_ratio")
    )
