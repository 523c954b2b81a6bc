"""Pin the ICU collation-init warmup contract (session._warm_collation_init).

Spark 4 codegen routes lower()/upper() through CollationSupport's ICU
paths; the first call per JVM triggers CollationAwareUTF8String.<clinit>
(ICU case-mapping table build, 7-100 s measured on this box). session.tune
must pay that at session setup so no registered query's measured wall
absorbs the spike (corpus_url_canonicalize read 119 s cold / 1.1 s warm
at sf0.001 before the fix).
"""

from __future__ import annotations

import time

from weather_bigdata_project_spark import session as S


def test_tune_registers_icu_warmup(spark):
    """tune() marks the app warmed; a second tune is a cheap no-op."""
    app_id = spark.sparkContext.applicationId
    assert app_id in S._ICU_WARMED  # conftest's get_spark already tuned
    t0 = time.time()
    S.tune(spark)
    assert time.time() - t0 < 2.0  # guard hit: no re-collect

    # correctness of the warmed path: case-fold actually works post-init
    row = spark.range(0, 1, 1, 1).selectExpr(
        "lower('HTTPS://WWW.X.COM') AS v", "upper('ab') AS u"
    ).collect()[0]
    assert row.v == "https://www.x.com" and row.u == "AB"


def test_warmup_expression_is_not_foldable():
    """The warmup must stay NON-foldable: constant folding evaluates
    lower() interpreted (UTF8String.toLowerCase — no ICU), which would
    silently skip the class-init and reintroduce the in-query spike.
    Pin the shape: the warm expression references the range's id column.
    """
    import inspect

    src = inspect.getsource(S._warm_collation_init)
    assert "CAST(id AS STRING)" in src and "lower(" in src
    # and per-SLOT: one single-row partition per scheduler slot, so on
    # a real cluster every executor JVM pays its class-init at setup
    # (round-8 ADVICE), not inside the first case-folding query
    assert "defaultParallelism" in src
    assert "spark.range(0, slots, 1, slots)" in src
