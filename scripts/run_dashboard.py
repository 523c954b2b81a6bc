"""Dashboard runner — the reference's Streamlit analytics surface
(ref:streamlit/app.py:183-460) as a batch CLI: every panel the app
renders (metrics row, per-city stats, alert counts, temperature
histogram, box stats, recent alerts, filtered previews, exports) is one
registered engine query; this script executes a panel set and prints
compact tables. Unlike the reference — which re-reads the whole lake
with pandas on every browser interaction — each panel here is a Spark
plan over the columnar fixtures, and the same queries serve any BI tool
via spark.sql.

Usage:
  python3 scripts/run_dashboard.py [--sf-dir /root/testdata/sf0.001]
                                   [--panels weather_city_stats,...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the default panel set mirrors the app's page order
PANELS = [
    "weather_global_stats",      # metrics row (ref:app.py:183-206)
    "weather_preview",           # table preview (ref:app.py:222)
    "weather_city_stats",        # per-city agg (ref:app.py:333-338)
    "weather_temp_histogram",    # distribution (ref:app.py:304-313)
    "weather_city_boxstats",     # box plot stats (ref:app.py:317-327)
    "weather_alert_counts",      # alert panel (ref:app.py:351-360)
    "weather_recent_alerts",     # newest alerts (ref:app.py:378)
    "weather_degree_days",       # energy upgrade (beyond the reference)
    "weather_temp_equidepth",    # equi-depth buckets (beyond)
    "events_value_ewma",         # smoothed trend line (beyond)
    "events_anomaly_mad",        # robust outlier flags (beyond)
    "events_trailing_distinct_users",  # WAU curve (beyond)
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--panels", default=None)
    ap.add_argument("--rows", type=int, default=8)
    args = ap.parse_args()

    from weather_bigdata_project_spark import registry
    from weather_bigdata_project_spark.session import get_spark

    registry.load()
    panels = (
        [p.strip() for p in args.panels.split(",") if p.strip()]
        if args.panels
        else PANELS
    )
    unknown = [p for p in panels if p not in registry.QUERIES]
    if unknown:
        raise SystemExit(f"unknown panels: {unknown}")

    spark = get_spark("dashboard")
    for name in panels:
        df = registry.QUERIES[name](spark, args.sf_dir)
        print(f"\n== {name} ==")
        df.show(args.rows, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
