"""JSON path extraction and nested-document flattening — the NiFi
EvaluateJsonPath / AttributesToJSON stages (SURVEY §2.1 S4/S5, §2.3 F11)
done natively in Spark.

The reference extracted 20 JSONPath leaves declaratively in NiFi; here
`get_json_object` / `from_json` run inside codegen on the executors —
the flatten travels WITH the data instead of in a separate service.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as Ty

from .. import tables
from ..functions.exprs import rnd
from ..registry import query


@query(
    "events_json_extract",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "x AS (SELECT event_type, "
        "TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k "
        "FROM events_t) "
        "SELECT event_type, COUNT(k) AS n, SUM(k) AS sum_k, "
        + rnd("CAST(SUM(k) AS DOUBLE) / COUNT(k)", 2)
        + " AS avg_k FROM x GROUP BY event_type"
    ),
)
def events_json_extract(spark, sf_dir):
    """S4/F11: JSONPath leaf extraction ($.k from events.props) + grouped
    stats. get_json_object evaluates in the JVM per partition — no
    shuffle until the 5-key aggregate."""
    ev = tables.load(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        F.get_json_object(F.col("props"), "$.k").try_cast("int").alias("k"),
    )
    return x.groupBy("event_type").agg(
        F.count("k").alias("n"),
        F.sum("k").alias("sum_k"),
        F.expr(rnd("CAST(SUM(k) AS DOUBLE) / COUNT(k)", 2)).alias("avg_k"),
    )


@query(
    "events_json_roundtrip",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "doc AS (SELECT event_id, to_json(struct_pack("
        "main := struct_pack(temp := value), "
        "weather := [struct_pack(description := event_type)], "
        "props := props)) AS j FROM events_t) "
        "SELECT event_id, "
        "json_extract_string(j, '$.main.temp') AS temp_str, "
        "TRY_CAST(json_extract_string(j, '$.main.temp') AS DOUBLE) AS temp, "
        "json_extract_string(j, '$.weather[0].description') AS description, "
        "TRY_CAST(json_extract_string(json_extract_string(j, '$.props'), "
        "'$.k') AS INTEGER) AS k "
        "FROM doc"
    ),
)
def events_json_roundtrip(spark, sf_dir):
    """S5 + S4 end-to-end: re-serialize a nested OpenWeatherMap-shaped
    document (struct + array-of-struct, FIXTURES.md §A3) with to_json,
    then extract `$.main.temp` and `$.weather[0].description` back out —
    the NiFi flatten round-trip, fully inside codegen."""
    ev = tables.load(spark, sf_dir, "events")
    doc = ev.select(
        "event_id",
        F.to_json(
            F.struct(
                F.struct(F.col("value").alias("temp")).alias("main"),
                F.array(
                    F.struct(F.col("event_type").alias("description"))
                ).alias("weather"),
                F.col("props").alias("props"),
            )
        ).alias("j"),
    )
    return doc.select(
        "event_id",
        F.get_json_object("j", "$.main.temp").alias("temp_str"),
        F.get_json_object("j", "$.main.temp").try_cast("double").alias("temp"),
        F.get_json_object("j", "$.weather[0].description").alias("description"),
        F.get_json_object(F.get_json_object("j", "$.props"), "$.k")
        .try_cast("int")
        .alias("k"),
    )


@query(
    "events_json_typed_parse",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + " "
        "SELECT event_id, "
        "TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k "
        "FROM events_t WHERE TRY_CAST(json_extract_string(props, '$.k') "
        "AS BIGINT) IS NOT NULL"
    ),
)
def events_json_typed_parse(spark, sf_dir):
    """S2 idiom: from_json with a declared StructType (the typed parse the
    streaming job does on every Kafka message) instead of stringly
    JSONPath."""
    ev = tables.load(spark, sf_dir, "events")
    schema = Ty.StructType([Ty.StructField("k", Ty.LongType())])
    return (
        ev.select(
            "event_id", F.from_json(F.col("props"), schema).alias("p")
        )
        .select("event_id", F.col("p.k").alias("k"))
        .filter(F.col("k").isNotNull())
    )
