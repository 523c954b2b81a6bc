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
from ..functions.exprs import id_mix, rnd
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


# --- scalar function batteries -------------------------------------------
# Broad engine-parity coverage of the scalar surface beyond what the
# weather pipeline exercises: string, datetime, and three-valued-logic
# semantics, each as ONE narrow projection the oracle mirrors verbatim
# (or with the documented per-engine spelling where names differ).

_STR_EXPRS = [
    ("up", "UPPER(substr(text, 1, 12))",
     "UPPER(substr(text, 1, 12))"),
    ("lo", "LOWER(substr(text, 1, 12))",
     "LOWER(substr(text, 1, 12))"),
    ("tr", "TRIM('  ' || substr(text, 1, 8) || ' ')",
     "TRIM('  ' || substr(text, 1, 8) || ' ')"),
    ("lp", "LPAD(CAST(doc_id AS STRING), 8, '0')",
     "LPAD(CAST(doc_id AS STRING), 8, '0')"),
    ("rp", "RPAD(lang, 6, '_')",
     "RPAD(lang, 6, '_')"),
    ("rev", "REVERSE(substr(text, 1, 10))",
     "REVERSE(substr(text, 1, 10))"),
    ("rep", "REPLACE(substr(text, 1, 20), ' ', '-')",
     "REPLACE(substr(text, 1, 20), ' ', '-')"),
    ("cw", "CONCAT_WS('|', lang, source, CAST(n_chars AS STRING))",
     "CONCAT_WS('|', lang, source, CAST(n_chars AS STRING))"),
    ("ins", "INSTR(text, 'data')",
     "INSTR(text, 'data')"),
    ("lft", "LEFT(text, 6)",
     "LEFT(text, 6)"),
    ("rgt", "RIGHT(text, 6)",
     "RIGHT(text, 6)"),
    ("spl", "SPLIT_PART(text, ' ', 3)",
     "SPLIT_PART(text, ' ', 3)"),
    ("rx", "REGEXP_REPLACE(substr(text, 1, 30), '[aeiou]', '*')",
     "REGEXP_REPLACE(substr(text, 1, 30), '[aeiou]', '*', 'g')"),
    ("sw", "CAST((text LIKE 'the%') AS INT)",
     "CAST((text LIKE 'the%') AS INT)"),
    ("md", "MD5(substr(text, 1, 16))",
     "MD5(substr(text, 1, 16))"),
]


@query(
    "sql_string_functions",
    oracle=(
        "SELECT doc_id, "
        + ", ".join(f"{d} AS {n}" for n, _, d in _STR_EXPRS)
        + " FROM documents"
    ),
)
def sql_string_functions(spark, sf_dir):
    """String-function battery: 15 scalar functions in one narrow
    projection, text mirrored verbatim into the oracle (both engines
    accept the same spellings — DuckDB's STRING alias included). Covers case
    mapping, pad/trim, reverse/replace, multi-arg concat, search,
    slicing, split-part, regex replace, predicates-as-ints, and hashing.
    All whole-stage-codegen'd; zero shuffles."""
    from ..operators import textops as T

    return T.docs(spark, sf_dir).selectExpr(
        "doc_id", *[f"{sp} AS {n}" for n, sp, _ in _STR_EXPRS]
    )


#: (name, spark spelling, duckdb spelling) — names differ per engine for
#: a few; semantics verified identical by the oracle gate
_DT_EXPRS = [
    ("trunc_w", "CAST(date_trunc('week', ts) AS DATE)",
     "CAST(date_trunc('week', ts) AS DATE)"),
    ("trunc_d", "CAST(date_trunc('day', ts) AS DATE)",
     "CAST(date_trunc('day', ts) AS DATE)"),
    ("yr", "year(ts)", "year(ts)"),
    ("qtr", "quarter(ts)", "quarter(ts)"),
    ("mo", "month(ts)", "month(ts)"),
    ("dy", "day(ts)", "day(ts)"),
    ("doy", "dayofyear(ts)", "dayofyear(ts)"),
    ("hr", "hour(ts)", "hour(ts)"),
    ("mi", "minute(ts)", "minute(ts)"),
    ("ld", "last_day(CAST(ts AS DATE))", "last_day(CAST(ts AS DATE))"),
    ("plus_3d", "CAST(ts + INTERVAL 3 DAY AS DATE)",
     "CAST(ts + INTERVAL 3 DAY AS DATE)"),
    ("minus_2h", "ts - INTERVAL 2 HOUR", "ts - INTERVAL 2 HOUR"),
    ("fmt", "date_format(ts, 'yyyy-MM-dd HH:mm')",
     "strftime(ts, '%Y-%m-%d %H:%M')"),
    ("epoch_d", "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)",
     "CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)"),
]


@query(
    "sql_datetime_functions",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + " SELECT event_id, "
        + ", ".join(d + f" AS {n}" for n, _, d in _DT_EXPRS)
        + " FROM events_t"
    ),
)
def sql_datetime_functions(spark, sf_dir):
    """Datetime-function battery over the NTZ event timestamps: truncs,
    parts, interval arithmetic, last_day, formatting, epoch-day. Where
    the engines spell a function differently (date_format vs strftime,
    2-arg vs 3-arg datediff) both spellings are pinned side by side and
    the oracle gate proves the semantics identical. NTZ keeps every
    value session-timezone-independent (hostile-session safe)."""
    ev = tables.load(spark, sf_dir, "events")
    return ev.selectExpr(
        "event_id", *[f"{s} AS {n}" for n, s, _ in _DT_EXPRS]
    )


_NULL_EXPRS = [
    ("nsafe_eq", "CAST((vnull <=> vnull2) AS INT)",
     "CAST((vnull IS NOT DISTINCT FROM vnull2) AS INT)"),
    ("nsafe_ne", "CAST(NOT (vnull <=> 1.0e0) AS INT)",
     "CAST((vnull IS DISTINCT FROM 1.0e0) AS INT)"),
    ("coal", "COALESCE(vnull, vnull2, -1.0e0)",
     "COALESCE(vnull, vnull2, -1.0e0)"),
    ("nif", "NULLIF(event_type, 'view')", "NULLIF(event_type, 'view')"),
    ("nvl2", "CASE WHEN vnull IS NOT NULL THEN 'y' ELSE 'n' END",
     "CASE WHEN vnull IS NOT NULL THEN 'y' ELSE 'n' END"),
    ("and3", "CAST((vnull > 0.5e0) AND (value > 0.0e0) AS INT)",
     "CAST((vnull > 0.5e0) AND (value > 0.0e0) AS INT)"),
    ("or3", "CAST((vnull > 0.5e0) OR (value >= 0.0e0) AS INT)",
     "CAST((vnull > 0.5e0) OR (value >= 0.0e0) AS INT)"),
    ("in3", "CAST(vnull IN (1.0e0, 2.0e0) AS INT)",
     "CAST(vnull IN (1.0e0, 2.0e0) AS INT)"),
]


@query(
    "sql_null_semantics",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        "base AS (SELECT event_id, event_type, value, "
        "CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS vnull, "
        "CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS vnull2 "
        "FROM events_t) "
        "SELECT event_id, "
        + ", ".join(d + f" AS {n}" for n, _, d in _NULL_EXPRS)
        + " FROM base"
    ),
)
def sql_null_semantics(spark, sf_dir):
    """Three-valued-logic battery on injected nulls: null-safe equality
    (Spark's <=> vs standard IS NOT DISTINCT FROM), COALESCE/NULLIF,
    NULL propagation through AND/OR/IN, and CASE-based NVL2. The boolean
    results are cast to INT so a NULL (unknown) survives to the output
    and the hash comparison proves BOTH engines produced unknown — not
    just a falsy value — in every tri-state case."""
    ev = tables.load(spark, sf_dir, "events")
    base = ev.selectExpr(
        "event_id", "event_type", "value",
        "CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS vnull",
        "CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS vnull2",
    )
    return base.selectExpr(
        "event_id", *[f"{s} AS {n}" for n, s, _ in _NULL_EXPRS]
    )


# --- F16+: window-function battery ----------------------------------------

#: every ranking/offset/frame window function over one totally-ordered
#: per-type partition (ORDER BY value-cents DESC, day — unique within a
#: type, so every engine picks identical rows). percent_rank and
#: cume_dist are ratios of exact ints, deterministic in IEEE doubles.
_WF = "OVER (PARTITION BY event_type ORDER BY v_c DESC, day)"
_WF_FULL = (
    "OVER (PARTITION BY event_type ORDER BY v_c DESC, day "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
)
_WINDOW_EXPRS = [
    ("rn", f"ROW_NUMBER() {_WF}"),
    ("rnk", f"RANK() {_WF}"),
    ("drnk", f"DENSE_RANK() {_WF}"),
    ("prnk", f"PERCENT_RANK() {_WF}"),
    ("cume", f"CUME_DIST() {_WF}"),
    ("quartile", f"NTILE(4) {_WF}"),
    ("prev_c", f"LAG(v_c) {_WF}"),
    ("next_c", f"LEAD(v_c, 1, -1) {_WF}"),
    ("top_c", f"FIRST_VALUE(v_c) {_WF}"),
    ("bottom_c", f"LAST_VALUE(v_c) {_WF_FULL}"),
    ("third_c", f"NTH_VALUE(v_c, 3) {_WF_FULL}"),
]

_WINDOW_ORACLE = (
    "WITH " + tables.EVENTS_ORACLE_CTE + ", "
    "c AS (SELECT event_type, CAST(ts AS DATE) AS day, "
    "SUM(CAST(ROUND(value * 100.0e0) AS BIGINT)) AS v_c "
    "FROM events_t GROUP BY event_type, CAST(ts AS DATE)) "
    "SELECT event_type, day, v_c, "
    + ", ".join(f"{s} AS {n}" for n, s in _WINDOW_EXPRS)
    + " FROM c"
)


@query("sql_window_functions", oracle=_WINDOW_ORACLE)
def sql_window_functions(spark, sf_dir):
    """Window-function battery (the F13-F15 batteries' ranking/offset
    sibling): every ranking, distribution, offset, and frame-navigation
    window function in one pass over the per-type daily frame —
    ROW_NUMBER/RANK/DENSE_RANK, PERCENT_RANK/CUME_DIST, NTILE, LAG/LEAD
    (with explicit default), FIRST/LAST/NTH_VALUE with an explicit
    full-partition frame (the default frame stops at CURRENT ROW, a
    classic silent-wrong-answer trap — pinned here identically in both
    engines). ONE exchange on event_type serves all eleven functions."""
    ev = tables.load(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.expr("CAST(ROUND(value * 100.0e0) AS BIGINT)")).alias("v_c")
    )
    return c.selectExpr(
        "event_type", "day", "v_c",
        *[f"{s} AS {n}" for n, s in _WINDOW_EXPRS],
    )


# --- F17+: array / higher-order-function battery --------------------------

#: (name, spark_expr, duck_expr) over `l` = the document's token array.
#: Same VALUES, engine-local spellings (Spark HOF lambdas vs DuckDB
#: list_* functions); list_position returns NULL-when-absent in DuckDB
#: vs 0 in Spark, pinned with COALESCE.
_ARRAY_EXPRS = [
    ("n_tok", "size(l)", "len(l)"),
    (
        "has_data",
        "array_contains(l, 'data')",
        "list_contains(l, 'data')",
    ),
    (
        "pos_data",
        "array_position(l, 'data')",
        "COALESCE(list_position(l, 'data'), 0)",
    ),
    (
        "first3",
        "concat_ws('|', slice(l, 1, 3))",
        "array_to_string(l[1:3], '|')",
    ),
    ("n_distinct_tok", "size(array_distinct(l))", "len(list_distinct(l))"),
    ("last_tok", "element_at(l, -1)", "l[-1]"),
    (
        "n_long",
        "size(filter(l, x -> length(x) > 5))",
        "len(list_filter(l, x -> length(x) > 5))",
    ),
    (
        "total_chars",
        "aggregate(l, 0, (a, x) -> a + length(x))",
        "CAST(list_sum(list_transform(l, x -> length(x))) AS INT)",
    ),
    ("min_tok", "array_min(l)", "list_min(l)"),
    ("max_tok", "array_max(l)", "list_max(l)"),
]

_ARRAY_ORACLE = (
    "WITH base AS (SELECT doc_id, string_split(text, ' ') AS l "
    "FROM documents) "
    "SELECT doc_id, "
    + ", ".join(d + " AS " + n for n, _, d in _ARRAY_EXPRS)
    + " FROM base"
)


@query("sql_array_functions", oracle=_ARRAY_ORACLE)
def sql_array_functions(spark, sf_dir):
    """Array / higher-order-function battery (F17+, sibling of the
    string/datetime/null/window batteries): size, membership, position
    (null-vs-0 semantics pinned), slicing, distinct, negative indexing,
    lambda filter, lambda fold, and min/max over each document's token
    array. All in-row — zero shuffles, one scan of documents — and all
    JVM-side: Spark's HOF lambdas compile to Catalyst expressions, not
    Python."""
    from ..operators import textops as T

    return (
        T.docs(spark, sf_dir)
        .select("doc_id", F.split(F.col("text"), " ").alias("l"))
        .selectExpr(
            "doc_id", *[f"{s} AS {n}" for n, s, _ in _ARRAY_EXPRS]
        )
    )


# --- F18+: aggregate-function battery -------------------------------------

#: (name, spark_expr, duck_expr) per-type aggregates over the daily
#: frame (c: event_type, day, n, v_c — all exact ints, so every result
#: is deterministic under any partition order). max_by/min_by order on
#: `day` (unique within a type) so ties cannot arise.
_AGG_EXPRS = [
    ("n_days", "COUNT(*)", "COUNT(*)"),
    ("busy_days", "count_if(n >= 5)", "count_if(n >= 5)"),
    ("all_active", "bool_and(n > 0)", "bool_and(n > 0)"),
    ("any_heavy", "bool_or(n >= 8)", "bool_or(n >= 8)"),
    ("and_bits", "bit_and(n)", "bit_and(n)"),
    ("or_bits", "bit_or(n)", "bit_or(n)"),
    ("xor_bits", "bit_xor(n)", "bit_xor(n)"),
    ("latest_v_c", "max_by(v_c, day)", "arg_max(v_c, day)"),
    ("earliest_v_c", "min_by(v_c, day)", "arg_min(v_c, day)"),
    (
        "med2_n",
        "2.0e0 * percentile(n, 0.5e0)",
        "2.0e0 * quantile_cont(n, 0.5e0)",
    ),
]

_AGG_ORACLE = (
    "WITH " + tables.EVENTS_ORACLE_CTE + ", "
    "c AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n, "
    "SUM(CAST(ROUND(value * 100.0e0) AS BIGINT)) AS v_c "
    "FROM events_t GROUP BY event_type, CAST(ts AS DATE)) "
    "SELECT event_type, "
    + ", ".join(d + " AS " + nm for nm, _, d in _AGG_EXPRS)
    + " FROM c GROUP BY event_type"
)


@query("sql_agg_functions", oracle=_AGG_ORACLE)
def sql_agg_functions(spark, sf_dir):
    """Aggregate-function battery (F18+): conditional counting
    (count_if), boolean aggregates (bool_and/bool_or), bitwise
    aggregates (bit_and/or/xor), argmin/argmax (max_by/min_by vs
    DuckDB's arg_max/arg_min — ordered on the unique day column so no
    tie ambiguity exists), and the interpolated median in doubled units
    (integer-valued, so exactly representable). Inputs are the exact
    integer daily frame — every aggregate here is partition-order
    invariant by construction, the property the float doctrine
    otherwise has to buy with snapping."""
    ev = tables.load(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(ROUND(value * 100.0e0) AS BIGINT)")).alias("v_c"),
    )
    return c.groupBy("event_type").agg(
        *[F.expr(s).alias(nm) for nm, s, _ in _AGG_EXPRS]
    )


# --- semi-structured schema profiler --------------------------------------

#: three synthetic "producer versions" of the same event doc — the
#: schema-drift shape a real ingest pipeline sees after deploys add and
#: drop fields (S4's JSONPath world, where nobody declared a schema)
_DRIFT_DOC_SPARK = (
    "CASE WHEN event_id % 3 = 0 THEN to_json(named_struct("
    "'id', event_id, 'type', event_type, 'value', value)) "
    "WHEN event_id % 3 = 1 THEN to_json(named_struct("
    "'id', event_id, 'uid', user_id, 'value', value, "
    "'day', to_date(ts))) "
    "ELSE to_json(named_struct('id', event_id)) END"
)

_DRIFT_DOC_DUCK = (
    "CASE WHEN event_id % 3 = 0 THEN to_json(struct_pack("
    "id := event_id, type := event_type, value := value)) "
    "WHEN event_id % 3 = 1 THEN to_json(struct_pack("
    "id := event_id, uid := user_id, value := value, "
    "day := CAST(ts AS DATE))) "
    "ELSE to_json(struct_pack(id := event_id)) END"
)


@query(
    "events_json_schema_profile",
    oracle=(
        "WITH " + tables.EVENTS_ORACLE_CTE + ", "
        f"d AS (SELECT {_DRIFT_DOC_DUCK} AS j FROM events_t), "
        "t AS (SELECT COUNT(*) AS n_docs FROM d), "
        "k AS (SELECT u.k AS key FROM d, unnest(json_keys(j)) AS u(k)) "
        "SELECT key, COUNT(*) AS n_present, n_docs, "
        + rnd("CAST(COUNT(*) AS DOUBLE) / n_docs", 6)
        + " AS presence_rate FROM k CROSS JOIN t GROUP BY key, n_docs"
    ),
)
def events_json_schema_profile(spark, sf_dir):
    """Schema-drift profiler for a semi-structured JSON column: which
    keys exist across the corpus and how often — run it BEFORE
    declaring the StructType a 100 TB ingest will cast with (the
    reference hardcodes its 14-field wire schema,
    ref:spark-apps/weather_streaming.py:28-43; this query is how you
    DISCOVER that schema, and how you catch a deploy that silently
    dropped a field). Docs parse once to a key map in-row
    (from_json -> map_keys -> explode); the aggregate's key space is
    the key vocabulary, not the doc count, so map-side partials
    collapse the fan-out. Profiled here over three synthesized
    producer versions with divergent shapes."""
    ev = tables.load(spark, sf_dir, "events")
    d = ev.select(F.expr(_DRIFT_DOC_SPARK).alias("j"))
    t = d.agg(F.count(F.lit(1)).alias("n_docs"))
    k = d.select(
        F.explode(
            F.map_keys(F.expr("from_json(j, 'map<string,string>')"))
        ).alias("key")
    )
    return (
        k.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_present"))
        .join(F.broadcast(t))
        .select(
            "key",
            "n_present",
            "n_docs",
            F.expr(rnd("CAST(n_present AS DOUBLE) / n_docs", 6)).alias(
                "presence_rate"
            ),
        )
    )


# --- table diff / reconciliation ------------------------------------------

#: deterministic hash bucket for synthesizing "version B" of the table
#: (full-entropy id_mix: BIGINT-safe at any event_id, no mod-2^20 period)
_DIFF_H = f"({id_mix('event_id', 12345)} % 100)"

_DIFF_ORACLE = (
    "WITH " + tables.EVENTS_ORACLE_CTE + ", "
    f"a AS (SELECT event_id, user_id, event_type, value FROM events_t), "
    "b AS ("
    f"SELECT event_id, user_id, event_type, "
    f"CASE WHEN {_DIFF_H} = 1 THEN value + 1.0e0 ELSE value END AS value "
    f"FROM a WHERE {_DIFF_H} <> 0 "
    "UNION ALL "
    "SELECT event_id + 100000000, user_id, event_type, value "
    f"FROM a WHERE {_DIFF_H} = 2), "
    "j AS (SELECT COALESCE(a.event_id, b.event_id) AS k, "
    "CASE WHEN b.event_id IS NULL THEN 'only_a' "
    "WHEN a.event_id IS NULL THEN 'only_b' "
    "WHEN a.user_id = b.user_id AND a.event_type = b.event_type "
    "AND a.value = b.value THEN 'same' ELSE 'changed' END AS status "
    "FROM a FULL OUTER JOIN b ON a.event_id = b.event_id) "
    "SELECT status, COUNT(*) AS n_rows FROM j GROUP BY status"
)


@query("events_table_diff", oracle=_DIFF_ORACLE)
def events_table_diff(spark, sf_dir):
    """Data-diff reconciliation: compare two versions of a table by
    primary key and classify every key as same / changed / only_a
    (deleted) / only_b (added) — the dataset regression test run
    before promoting a pipeline change (did the refactor alter
    anything it shouldn't?), and the verification step after a
    migration or backfill. Version B synthesizes deterministically
    from A (1% deleted, 1% value-bumped, 1% re-keyed additions via the
    LCG bucket) so the diff exercises every class. One full outer join
    on the key with in-row column comparison; at 100 TB both sides
    shuffle once on the key — or zero times if the lake is bucketed by
    it (write_bucketed_table) — and a row-level hash (sha2 of the
    concatenated row) replaces the column list when schemas are
    wide."""
    ev = tables.load(spark, sf_dir, "events")
    a = ev.select("event_id", "user_id", "event_type", "value")
    b = a.filter(F.expr(f"{_DIFF_H} <> 0")).select(
        "event_id",
        "user_id",
        "event_type",
        F.expr(
            f"CASE WHEN {_DIFF_H} = 1 THEN value + 1.0e0 ELSE value END"
        ).alias("value"),
    ).unionByName(
        a.filter(F.expr(f"{_DIFF_H} = 2")).select(
            (F.col("event_id") + 100000000).alias("event_id"),
            "user_id",
            "event_type",
            "value",
        )
    )
    aa = a.alias("a")
    bb = b.alias("b")
    j = aa.join(
        bb, F.col("a.event_id") == F.col("b.event_id"), "full_outer"
    ).select(
        F.expr(
            "CASE WHEN b.event_id IS NULL THEN 'only_a' "
            "WHEN a.event_id IS NULL THEN 'only_b' "
            "WHEN a.user_id = b.user_id AND a.event_type = b.event_type "
            "AND a.value = b.value THEN 'same' ELSE 'changed' END"
        ).alias("status")
    )
    return j.groupBy("status").agg(F.count(F.lit(1)).alias("n_rows"))
