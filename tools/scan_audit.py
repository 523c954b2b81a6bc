"""Full-registry single-scan audit: measured input vs tables loaded.

For every registry query this tool runs the plan (noop sink), sums the
status store's input_records over the query's stages, and compares to
the total row count of the tables the query actually loaded
(instrumented `tables.load`). A ratio far above 1 means the plan reads
its input more than once — the mechanical detector behind the round-7
single-scan purge (11 queries fixed: CTEs that Spark inlines per
reference, scalar subqueries that re-run as separate jobs, unpersisted
frames consumed by several branches, lazy loop-state checkpoints).

Reading the ratio honestly:
- The status store counts CACHE / checkpoint-BLOCK reads as input too,
  so a ratio of ~2-5 on a query whose frames are materialized may be
  entirely in-memory re-reads (fine at any scale). Distinguish with the
  per-stage bytes (--stages name): a parquet re-scan shows the file's
  on-disk bytes; a cache read shows the (different) deserialized size.
- Ratio ~2 with two DIFFERENTLY-FILTERED scans of one table (funnel
  arms, asof join sides) is the legitimate pruned-scan pattern.
- Iterative algorithms legitimately make multiple passes; the question
  is whether the passes read cache (good) or parquet (bad).

Usage:
    python3 tools/scan_audit.py [--sf /root/testdata/sf0.01]
        [--flag 1.9] [--stages name] [names...]
Prints flagged queries (ratio >= --flag) sorted worst-first.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--flag", type=float, default=1.9)
    ap.add_argument(
        "--stages",
        default=None,
        help="print the per-stage input breakdown for ONE query "
        "instead of the sweep (bytes tell parquet from cache)",
    )
    ap.add_argument(
        "--out", default=os.path.join(_REPO_ROOT, "SCAN_AUDIT.json")
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from tools.shuffle_ledger import _stage_map
    from weather_bigdata_project_spark import registry, tables
    from weather_bigdata_project_spark.operators import textops
    from weather_bigdata_project_spark.session import get_spark

    con = duckdb.connect()
    rows = {
        t: con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{args.sf}/{t}.parquet')"
        ).fetchone()[0]
        for t in TABLES
    }

    registry.load()
    spark = get_spark("scan-audit", cpus=16)
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm, gw = sc._jvm, sc._gateway

    loaded: set[str] = set()
    orig_load = tables.load

    def spy_load(spark_, sf_dir, name, *a, **kw):
        loaded.add(name)
        return orig_load(spark_, sf_dir, name, *a, **kw)

    tables.load = spy_load

    def run(name):
        spark.catalog.clearCache()
        for rdd in list(sc._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        textops.clear_shingle_memo()
        loaded.clear()
        before = set(_stage_map(store, jvm, gw))
        registry.QUERIES[name](spark, args.sf).write.format(
            "noop"
        ).mode("overwrite").save()
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        return {
            k: v
            for k, v in _stage_map(store, jvm, gw).items()
            if k not in before
        }

    if args.stages:
        new = run(args.stages)
        for (sid, _a), v in sorted(new.items()):
            if v["ir"] > 0:
                print(f"stage {sid}: ir={v['ir']:,} ib={v['ib']:,}")
        spark.stop()
        return

    names = args.names or sorted(registry.QUERIES)
    out = []
    for i, n in enumerate(names):
        try:
            new = run(n)
            ir = sum(v["ir"] for v in new.values())
            exp = sum(rows[t] for t in loaded)
            ratio = round(ir / exp, 2) if exp else None
            out.append(
                {"query": n, "input_records": ir, "expected": exp,
                 "ratio": ratio, "tables": sorted(loaded)}
            )
        except Exception as e:  # noqa: BLE001
            out.append({"query": n, "err": f"{type(e).__name__}: {e}"})
        if (i + 1) % 50 == 0:
            print(f"...{i + 1}/{len(names)}", file=sys.stderr, flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    flagged = sorted(
        (o for o in out if o.get("ratio") and o["ratio"] >= args.flag),
        key=lambda o: -o["ratio"],
    )
    for o in flagged:
        print(
            f"{o['ratio']:>6}x  {o['query']}  "
            f"({o['input_records']:,} vs {o['expected']:,} "
            f"{'+'.join(o['tables'])})"
        )
    print(f"total {len(out)}, flagged >= {args.flag}: {len(flagged)}")
    spark.stop()


if __name__ == "__main__":
    main()
