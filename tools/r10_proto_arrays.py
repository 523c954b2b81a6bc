"""Round-10 prototype: array-based shingle core A/B, interleaved in one
session, with row-equality checks against the current implementation.

Variants measured (noop sink, best-of-N interleaved):
  docsig:  A = current groupBy(doc_id).agg(16 mins) over exploded rows
           B = narrow array_min(transform(...)) x16 over pinned arrays
  prefix:  A = df window + rank window -> pinned prefix rows
           B = df window + groupBy(doc) sorted collect -> pinned arrays,
               prefix rows via posexplode(slice(...))
  verify:  A = _cand_arrays (semi-join + collect_list groupBy)
           B = semi-join projection off the pinned array frame

Usage: python3 tools/r10_proto_arrays.py [sf_dir]
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
    from weather_bigdata_project_spark.queries.dedup import (
        _HASH_PARAMS,
        _P,
    )

    spark = get_spark("r10-proto")
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

    # --- builders -----------------------------------------------------

    def garr_frame():
        """(doc_id, n_sh, shs) fully in-row — doc_shingle_ids minus the
        explode."""
        d = T.spread_small_scan(
            T.docs(spark, sf_dir), spark, f"{sf_dir}/documents.parquet"
        ).select("doc_id", F.split(F.col("text"), " ").alias("toks"))
        grams = (
            "transform(sequence(1, size(toks) - 2), "
            "i -> "
            + T.hashed_id_spark("concat_ws(' ', slice(toks, i, 3))")
            + ")"
        )
        arr = (
            f"CASE WHEN size(toks) < 3 THEN array() "
            f"ELSE array_distinct({grams}) END"
        )
        return d.select(
            "doc_id", F.expr(arr).alias("shs")
        ).select(
            "doc_id", F.size("shs").alias("n_sh"), "shs"
        )

    def docsig_arrays(garr):
        return garr.filter(F.col("n_sh") > 0).select(
            "doc_id",
            *[
                F.expr(
                    f"array_min(transform(shs, x -> ({a} * x + {b}) % {_P}))"
                ).alias(f"mh{j}")
                for j, (a, b) in enumerate(_HASH_PARAMS, 1)
            ],
            "n_sh",
        )

    def docsig_arrays_onepass(garr):
        # one interpreted pass: per element, all 16 hashes via a struct
        # fold is awkward; try transform->struct then 16 mins over it
        hs = ", ".join(
            f"({a} * x + {b}) % {_P} AS h{j}"
            for j, (a, b) in enumerate(_HASH_PARAMS, 1)
        )
        return garr.filter(F.col("n_sh") > 0).select(
            "doc_id",
            F.expr(f"transform(shs, x -> struct({hs}))").alias("hh"),
            "n_sh",
        ).select(
            "doc_id",
            *[
                F.expr(f"array_min(hh.h{j})").alias(f"mh{j}")
                for j in range(1, 17)
            ],
            "n_sh",
        )

    def prefix_arrays(garr):
        """pfxarr: (doc_id, n_sh, toks sorted by (df, sh))."""
        ex = garr.select(
            "doc_id", "n_sh", F.explode("shs").alias("sh")
        )
        from pyspark.sql import Window

        ranked = ex.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
        )
        return ranked.groupBy("doc_id").agg(
            F.first("n_sh").alias("n_sh"),
            F.expr(
                "sort_array(collect_list(struct(df, sh)))"
            ).alias("toks"),
        )

    plen = "CAST(n_sh - ((n_sh + 1) div 2) + 1 AS INT)"

    def pfx_rows_from_arrays(pfxarr):
        return pfxarr.select(
            "doc_id",
            F.col("n_sh").alias("n"),
            F.posexplode(F.expr(f"slice(toks, 1, {plen})")).alias(
                "i", "t"
            ),
        ).select(
            "doc_id",
            "n",
            F.col("t.sh").alias("psh"),
            (F.col("i") + 1).alias("rk"),
        )

    def pfx_rows_current(sh):
        from pyspark.sql import Window

        ranked = sh.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
        )
        w = Window.partitionBy("doc_id").orderBy("df", "sh")
        return (
            ranked.withColumn("rk", F.row_number().over(w))
            .filter(F.expr(f"rk <= {plen}"))
            .select(
                "doc_id",
                F.col("n_sh").alias("n"),
                F.col("sh").alias("psh"),
                "rk",
            )
        )

    def cand_from_pfx(pfx):
        a = pfx.alias("a")
        b = pfx.alias("b")
        return (
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

    def verify_from_garr(garr, cand):
        ids = (
            cand.select(F.col("doc1").alias("doc_id"))
            .unionByName(cand.select(F.col("doc2").alias("doc_id")))
            .distinct()
        )
        arr = garr.join(ids, "doc_id", "left_semi").select(
            "doc_id", "n_sh", "shs"
        )
        d1 = arr.select(
            F.col("doc_id").alias("doc1"),
            F.col("n_sh").alias("n1"),
            F.col("shs").alias("shs1"),
        )
        d2 = arr.select(
            F.col("doc_id").alias("doc2"),
            F.col("n_sh").alias("n2"),
            F.col("shs").alias("shs2"),
        )
        return (
            cand.join(d1, "doc1")
            .join(d2, "doc2")
            .select(
                "doc1",
                "doc2",
                F.size(F.array_intersect("shs1", "shs2")).alias("c"),
                "n1",
                "n2",
            )
        )

    # --- equality checks ----------------------------------------------

    print("== equality checks ==", flush=True)
    garr = T.materialize(garr_frame())
    sh = T.doc_shingle_ids_shared(spark, sf_dir)

    a = D._minhash_docsig(spark, sf_dir)
    b = docsig_arrays(garr)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"docsig equal: {diff == 0} (diff rows {diff})", flush=True)

    pa = pfx_rows_current(sh)
    pb = pfx_rows_from_arrays(T.materialize(prefix_arrays(garr)))
    diff = pa.exceptAll(pb).count() + pb.exceptAll(pa).count()
    print(f"prefix rows equal: {diff == 0} (diff rows {diff})", flush=True)

    cand = T.materialize(cand_from_pfx(pa))
    va = D._verified_pairs(spark, sf_dir, cand)
    vb = verify_from_garr(garr, cand)
    diff = va.exceptAll(vb).count() + vb.exceptAll(va).count()
    print(f"verified equal: {diff == 0} (diff rows {diff})", flush=True)
    clear()

    # --- interleaved timing -------------------------------------------

    def timeit(label, fn, reps=3):
        best = None
        for _ in range(reps):
            clear()
            t0 = time.time()
            fn()
            d = time.time() - t0
            best = d if best is None else min(best, d)
        print(f"{label}: {best:.3f}s", flush=True)
        return best

    # docsig A vs B (including their pin source build)
    def a_docsig():
        noop(D._minhash_docsig(spark, sf_dir))

    def b_docsig():
        g = T.materialize(garr_frame())
        noop(T.materialize(docsig_arrays(g)))

    def b2_docsig():
        g = T.materialize(garr_frame())
        noop(T.materialize(docsig_arrays_onepass(g)))

    # prefix machinery A vs B (through cand, pinned)
    def a_prefix():
        shf = T.doc_shingle_ids_shared(spark, sf_dir)
        pfx = T.materialize(pfx_rows_current(shf))
        noop(T.materialize(cand_from_pfx(pfx)))

    def b_prefix():
        g = T.materialize(garr_frame())
        pfxarr = T.materialize(prefix_arrays(g))
        pfx = pfx_rows_from_arrays(pfxarr)
        noop(T.materialize(cand_from_pfx(pfx)))

    # full verified chain A vs B
    def a_full():
        shf = T.doc_shingle_ids_shared(spark, sf_dir)
        pfx = T.materialize(pfx_rows_current(shf))
        cand = T.materialize(cand_from_pfx(pfx))
        noop(D._verified_pairs(spark, sf_dir, cand))

    def b_full():
        g = T.materialize(garr_frame())
        pfxarr = T.materialize(prefix_arrays(g))
        pfx = pfx_rows_from_arrays(pfxarr)
        cand = T.materialize(cand_from_pfx(pfx))
        noop(verify_from_garr(g, cand))

    def b_full_pfxverify():
        # verify straight off pfxarr's sorted toks (no garr reference
        # downstream — pfxarr is the single pinned frame)
        g = garr_frame()  # un-pinned: only read once by pfxarr build
        pfxarr = T.materialize(prefix_arrays(g))
        pfx = pfx_rows_from_arrays(pfxarr)
        cand = T.materialize(cand_from_pfx(pfx))
        varr = pfxarr.select(
            "doc_id", "n_sh", F.expr("toks.sh").alias("shs")
        )
        noop(verify_from_garr(varr.withColumnRenamed("shs", "shs").selectExpr(
            "doc_id", "n_sh", "shs"
        ).withColumn("shs", F.col("shs")), cand))

    for r in range(2):
        timeit(f"[{r}] A docsig (agg)", a_docsig)
        timeit(f"[{r}] B docsig (arrays x16)", b_docsig)
        timeit(f"[{r}] B2 docsig (arrays onepass)", b2_docsig)
    for r in range(2):
        timeit(f"[{r}] A prefix cand (windows)", a_prefix)
        timeit(f"[{r}] B prefix cand (arrays)", b_prefix)
    for r in range(2):
        timeit(f"[{r}] A full verified (current)", a_full)
        timeit(f"[{r}] B full verified (arrays)", b_full)
        timeit(f"[{r}] B' full verified (pfxarr-only)", b_full_pfxverify)

    spark.stop()


if __name__ == "__main__":
    main()
