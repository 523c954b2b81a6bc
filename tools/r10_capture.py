"""Round-10 optimization evidence capture: write
plans/r10/<query>_<tag>.txt — the FULL `.explain("formatted")` output for
each named query so before/after plan claims in OPTIMIZATION_r10.md are
checkable without running Spark.

Round-9 ADVICE fix: cpus come from the same env the bench harness uses
($SPARK_GRAFT_CPUS, default host-sized) instead of a hardcoded 8, so
captured plans embed the same partition counts as the benchmarked
config.

Usage:
    python3 tools/r10_capture.py --tag before [names...]
    python3 tools/r10_capture.py --tag after  [names...]
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from weather_bigdata_project_spark import registry
    from weather_bigdata_project_spark.plans import checks as C
    from weather_bigdata_project_spark.session import get_spark

    registry.load()
    names = args.names
    if not names:
        import bench

        names = list(bench.HEADLINE)

    out_dir = os.path.join(_REPO, "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    spark = get_spark(
        "r10_capture", cpus=int(cpus) if cpus else None
    )
    for name in names:
        plan = C.formatted_plan(registry.QUERIES[name](spark, args.sf))
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
