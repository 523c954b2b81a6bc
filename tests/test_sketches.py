"""Sketch-family invariants that the hash oracle can't express as
structure: one-sided error (CMS/Bloom never under-report) and the
fill-factor sanity of the Bloom bitset. The value-level parity itself is
covered by tests/test_oracle_parity.py like every other query."""

from __future__ import annotations

from weather_bigdata_project_spark.registry import QUERIES, load

from tests.conftest import SF_SMOKE

load()


def test_cms_frequency_one_sided_and_exact_top(spark):
    rows = QUERIES["events_cms_frequency"](spark, SF_SMOKE).collect()
    assert rows, "no users"
    for r in rows:
        # Count-Min never under-counts: est = min over rows of
        # (true + collision mass), each term >= true.
        assert r.est_cnt >= r.true_cnt
        assert r.overest == r.est_cnt - r.true_cnt
    # ordering contract: true_cnt desc, user_id asc tie-break
    keys = [(-r.true_cnt, r.user_id) for r in rows]
    assert keys == sorted(keys)


def test_cms_joinsize_one_sided(spark):
    (row,) = QUERIES["events_cms_joinsize"](spark, SF_SMOKE).collect()
    assert row.true_pairs > 0
    assert row.est_pairs >= row.true_pairs  # inner product adds cross terms
    assert row.overest == row.est_pairs - row.true_pairs


def test_bloom_no_false_negatives(spark):
    (row,) = QUERIES["lineitem_bloom_join_prune"](spark, SF_SMOKE).collect()
    # every truly-joinable key passes the filter (Bloom has no false
    # negatives), so the pass set is a superset of the member set
    assert row.n_pass_keys == row.n_member_keys + row.n_false_pos
    assert row.rows_passed >= row.rows_joinable
    # the bitset can't exceed k * n_build distinct positions (and the
    # prune must actually prune something at this selectivity)
    assert 0 < row.bits_set <= 3 * row.n_build
    assert row.n_pass_keys < row.n_probe_keys


def test_nndescent_round_expands_and_improves(spark):
    rows = QUERIES["embed_nndescent_knn"](spark, SF_SMOKE).collect()
    assert rows, "empty audit sample"
    # the descent candidate set strictly contains the init edges
    assert all(r.n_cand >= r.n_init for r in rows)
    # candidates evaluated stay far below the exact-graph n-1 per node
    # (bound derived from the fixture, not a hardcoded corpus size)
    n_corpus = (
        spark.read.parquet(SF_SMOKE + "/embeddings.parquet").count()
    )
    assert all(r.n_cand < n_corpus - 1 for r in rows)
    # aggregate recall never degrades: every init edge remains a
    # candidate in round 1, so the top-K can only gain truth hits
    # (modulo rounded-cosine ties, which the tie-break pins)
    assert sum(r.hits_r1 for r in rows) >= sum(r.hits_init for r in rows)
    for r in rows:
        assert 0 <= r.hits_init <= 5 and 0 <= r.hits_r1 <= 5


def test_binary_quantize_rerank_recovers_recall(spark):
    rows = QUERIES["embed_binary_quantize_recall"](spark, SF_SMOKE).collect()
    assert len(rows) == 8
    # the rerank candidate pool (top-40 by Hamming) contains the top-10
    # by Hamming, so exact reranking can only match or beat the raw
    # code ranking in aggregate
    assert sum(r.hits_rerank for r in rows) >= sum(r.hits_bq for r in rows)
    for r in rows:
        assert 0 <= r.hits_bq <= 10 and 0 <= r.hits_rerank <= 10
