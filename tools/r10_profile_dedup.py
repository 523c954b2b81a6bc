"""Round-10 component profiler for the dedup shared shingle/truth-set
core (VERDICT r09 "Next round" item 1). Times each sub-frame of the
prefix machinery + minhash chain with the noop sink, best-of-2, full
session-state clearing between components — same hygiene as bench.py.

Usage: python3 tools/r10_profile_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from weather_bigdata_project_spark.session import get_spark
    from weather_bigdata_project_spark import registry

    registry.load()
    from weather_bigdata_project_spark.operators import textops as T
    from weather_bigdata_project_spark.queries import dedup as D

    spark = get_spark("r10-profile")
    spark.range(1000).count()

    def clear() -> None:
        spark.catalog.clearCache()
        for rdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            rdd.unpersist()
        T.clear_shingle_memo()
        spark.sparkContext._jvm.System.gc()

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timeit(label, fn, reps=2):
        best = None
        for _ in range(reps):
            clear()
            t0 = time.time()
            fn()
            d = time.time() - t0
            best = d if best is None else min(best, d)
        print(f"{label}: {best:.3f}s")
        return best

    # sizes first
    sh = T.doc_shingle_ids_shared(spark, sf_dir)
    n_docs = T.docs(spark, sf_dir).count()
    n_sh_rows = sh.count()
    print(f"# docs={n_docs} shingle_rows={n_sh_rows}")
    clear()

    # 1. shingle build + pin (the floor under everything)
    def c_shingles():
        noop(T.doc_shingle_ids_shared(spark, sf_dir))

    timeit("shingle_build_pin", c_shingles)

    # 2. docsig aggregate (pin + consume)
    def c_docsig():
        noop(D._minhash_docsig(spark, sf_dir))

    timeit("docsig_agg", c_docsig)

    # 3. LSH candidates (docsig + band self-join + distinct, pinned)
    def c_lshcand():
        docsig = D._minhash_docsig(spark, sf_dir)
        noop(T.materialize(D._lsh_candidates(docsig)))

    timeit("lsh_candidates", c_lshcand)

    # 4. full verify chain (lsh query end-to-end)
    def c_lsh_full():
        noop(registry.QUERIES["dedup_minhash_lsh"](spark, sf_dir))

    timeit("dedup_minhash_lsh_full", c_lsh_full)

    # 5. prefix frame alone (df window + rank window + pin)
    def c_prefix_frame():
        from pyspark.sql import Window

        shf = T.doc_shingle_ids_shared(spark, sf_dir)
        ranked = shf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
        )
        w = Window.partitionBy("doc_id").orderBy("df", "sh")
        plen = "CAST(n_sh - ((n_sh + 1) div 2) + 1 AS INT)"
        pfx = ranked.withColumn(
            "rk", F.row_number().over(w)
        ).filter(F.expr(f"rk <= {plen}")).select(
            "doc_id", F.col("n_sh").alias("n"),
            F.col("sh").alias("psh"), "rk",
        )
        noop(T.materialize(pfx))

    timeit("prefix_frame", c_prefix_frame)

    # 6. prefix candidates (frame + self-join + positional agg, pinned)
    def c_prefix_cand():
        shf = T.doc_shingle_ids_shared(spark, sf_dir)
        # replicate _prefix_filter_verified up to cand materialize
        from pyspark.sql import Window

        ranked = shf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
        )
        w = Window.partitionBy("doc_id").orderBy("df", "sh")
        plen = "CAST(n_sh - ((n_sh + 1) div 2) + 1 AS INT)"
        pfx = T.materialize(
            ranked.withColumn("rk", F.row_number().over(w))
            .filter(F.expr(f"rk <= {plen}"))
            .select(
                "doc_id", F.col("n_sh").alias("n"),
                F.col("sh").alias("psh"), "rk",
            )
        )
        a = pfx.alias("a")
        b = pfx.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.psh") == F.col("b.psh"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
                & (2 * F.col("a.n") >= F.col("b.n"))
                & (2 * F.col("b.n") >= F.col("a.n")),
            )
            .select(
                F.col("a.doc_id").alias("doc1"),
                F.col("b.doc_id").alias("doc2"),
                F.col("a.n").alias("n1"),
                F.col("b.n").alias("n2"),
                F.col("a.rk").alias("ra"),
                F.col("b.rk").alias("rb"),
            )
            .groupBy("doc1", "doc2", "n1", "n2")
            .agg(
                F.count(F.lit(1)).alias("o"),
                F.max("ra").alias("pa"),
                F.max("rb").alias("pb"),
            )
            .filter(
                F.expr("3 * (o + least(n1 - pa, n2 - pb)) >= n1 + n2")
            )
            .select("doc1", "doc2")
        )
        noop(T.materialize(cand))

    timeit("prefix_cand", c_prefix_cand)

    # 7. full prefix-filter query
    def c_pf_full():
        noop(
            registry.QUERIES["dedup_prefix_filter_jaccard"](spark, sf_dir)
        )

    timeit("dedup_prefix_filter_full", c_pf_full)

    # 8. truth set alone (what band_tuning pays before banding)
    def c_truth():
        shf = T.doc_shingle_ids_shared(spark, sf_dir)
        jac = "CAST(c AS DOUBLE) / (n1 + n2 - c)"
        tru = D._prefix_filter_verified(spark, sf_dir, shf).filter(
            F.expr(f"{jac} >= 0.5e0")
        ).select("doc1", "doc2")
        noop(T.materialize(tru))

    timeit("band_tuning_truth_set", c_truth)

    # 9. full band tuning
    def c_bt_full():
        noop(
            registry.QUERIES["dedup_minhash_band_tuning"](spark, sf_dir)
        )

    timeit("dedup_minhash_band_tuning_full", c_bt_full)

    # 10. corpus_filter_pipeline fused agg alone
    def c_fused():
        from weather_bigdata_project_spark.queries.pipeline import (
            _fused_quality_lang,
        )

        noop(_fused_quality_lang(spark, sf_dir))

    timeit("fused_quality_lang", c_fused)

    # 11. full corpus_filter_pipeline / split_leakage
    def c_cfp():
        noop(registry.QUERIES["corpus_filter_pipeline"](spark, sf_dir))

    timeit("corpus_filter_pipeline_full", c_cfp)

    def c_csl():
        noop(registry.QUERIES["corpus_split_leakage"](spark, sf_dir))

    timeit("corpus_split_leakage_full", c_csl)

    # 12. canonical quality (label propagation)
    def c_canon():
        noop(
            registry.QUERIES["dedup_cluster_canonical_quality"](
                spark, sf_dir
            )
        )

    timeit("dedup_cluster_canonical_quality_full", c_canon)

    spark.stop()


if __name__ == "__main__":
    main()
