"""weather_bigdata_project_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference `mariaelhoudaigui/weather-bigdata-project` (a NiFi→Kafka→Spark
Streaming→MinIO→Streamlit weather pipeline), re-expressed as ONE idiomatic
PySpark engine:

- batch + streaming share the same DataFrame->DataFrame transformation fns
  (`functions.enrich`), so the reference's triple surface (NiFi expression
  flow / Spark streaming DSL / pandas dashboard) collapses into one engine;
- all analytics are declarative DataFrame/Spark-SQL plans (Catalyst
  optimizes: pushdown, pruning, broadcast, AQE) — no driver-side loops;
- beyond the reference surface: relational completeness (joins, set ops,
  windows, rollup/cube) and LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal column plumbing) designed for 100 TB.

Reference parity citations use `ref:` prefix, e.g.
`ref:spark-apps/weather_streaming.py:62` (read-only checkout at
/root/reference).
"""

__version__ = "0.1.0"
