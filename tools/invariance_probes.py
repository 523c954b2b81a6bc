"""Invariance probes: re-run the full oracle-parity sweep under hostile
session shapes. Catches classes of bugs the plain 32-thread sweep hides:

- partition layout (cpus=3, shuffle.partitions=7): partition-order
  dependent float reductions, coalesce-sensitive plans;
- codegen off (wholeStage=false, factoryMode=NO_CODEGEN): interpreted
  vs codegen'd expression discrepancies (HOF folds especially).

Usage:
    python3 tools/invariance_probes.py [--sf /root/testdata/sf0.001] \
        [--probe layout|nocodegen] [names...]

Prints the same OK/FAIL/WEAK lines as tools/check_oracle.py; exit 1 on
any FAIL.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--probe", choices=["layout", "nocodegen", "ansi"], default="layout"
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from weather_bigdata_project_spark import session as S

    orig_get_spark = S.get_spark

    if args.probe == "layout":
        def hostile_get_spark(name, cpus=None):
            s = orig_get_spark(name, cpus=3)
            s.conf.set("spark.sql.shuffle.partitions", "7")
            return s
    elif args.probe == "ansi":
        # strictest-dialect probe: ANSI error semantics + a non-UTC
        # session zone. Queries must self-tune (session.tune) — anything
        # relying on silent-NULL casts, lenient overflow, or UTC-pinned
        # timestamps fails here with an EXCEPTION row.
        def hostile_get_spark(name, cpus=None):
            s = orig_get_spark(name, cpus=8)
            s.conf.set("spark.sql.ansi.enabled", "true")
            s.conf.set("spark.sql.session.timeZone", "America/New_York")
            return s
    else:
        def hostile_get_spark(name, cpus=None):
            s = orig_get_spark(name, cpus=8)
            s.conf.set("spark.sql.codegen.wholeStage", "false")
            s.conf.set(
                "spark.sql.codegen.factoryMode", "NO_CODEGEN"
            )
            return s

    S.get_spark = hostile_get_spark

    import time

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare, duck_connect

    spark = S.get_spark("probe")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    con = duck_connect(args.sf)
    n_pass = n_fail = n_weak = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            if name not in oracles:
                sdf.count()
                n_weak += 1
                print(f"WEAK  {name} ({time.time()-t0:.1f}s)")
                continue
            problems = compare(name, sdf, oracles[name], con)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            n_pass += 1
            print(f"OK    {name} ({time.time()-t0:.1f}s)")
    print(
        f"\nprobe={args.probe}: {n_pass} ok, {n_fail} fail, "
        f"{n_weak} weak (no oracle)"
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
