"""Operator-inventory queries + DuckDB oracle SQL.

One entry per operator family from SURVEY.md §2 (the relational surface the
reference exercises — citations inline) plus the beyond-reference
LLM-data-pipeline operators, all expressed over the driver's testdata tables
(region nation customer supplier part orders lineitem events documents
embeddings).

Conventions for oracle hash-matching:
- every computed column is aliased identically in Spark and SQL;
- floating aggregates are rounded (sums -> 2dp, ratios/avgs -> 4dp) so
  FP non-associativity across engines can't flip the value hash;
- LIMIT/top-k queries carry a total deterministic ORDER BY (unique
  tiebreak column) on both sides;
- DuckDB sum(BIGINT) returns HUGEINT — oracle SQL casts to match Spark.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


# Process-local memo of inferred parquet schemas, keyed by full path.
# Relation resolution WITH schema inference costs ~97 ms per table per
# query build (footer read + infer, PROBE_R13_DRIVER.json) vs ~23 ms
# with an explicit schema; the bench pays that for every one of ~32
# table reads per pass. The memo holds only metadata (StructType),
# never rows: every process still infers each table once from the
# parquet inputs, so no result or data state crosses invocations.
_SCHEMAS: dict[str, T.StructType] = {}

# Session-scoped memo of the base relation DATAFRAMES (r13 continuation):
# even with an explicit schema, each spark.read.schema(s).parquet(p)
# call re-resolves the relation (fresh InMemoryFileIndex listing +
# eager Dataset analysis) at ~36-48 ms; building on a memoized base
# DataFrame costs ~12 ms (PROBE_R13_DRIVER.json:rel_memo). The memo
# holds a LAZY logical plan only — no rows, no results; every action
# still scans the parquet inputs. File-listing lifetime matches Spark's
# own per-session catalog relation cache (a catalog table's file index
# is session-cached the same way); the dict lives ON the session object
# so a stopped session's plans can never leak into a new one.
_REL_MEMO_ATTR = "_duckdb_otlp_rel_memo"


def _rel_memo(spark: SparkSession) -> dict:
    memo = getattr(spark, _REL_MEMO_ATTR, None)
    if memo is None:
        memo = {}
        setattr(spark, _REL_MEMO_ATTR, memo)
    return memo


# Persist hygiene (r14, VERDICT "What's wrong" #4): query builders
# persist single-query intermediates that only the CALLER's action
# materializes, so they cannot unpersist in-function (the plan they
# return still reads the persisted node). Each such persist registers
# here so long-lived sessions can release the cache entries between
# queries; bench.py's clearCache() between reps already covers the
# bench/oracle paths, so this changes nothing measured. Builders whose
# function body runs the action (q_dedup_cluster) unpersist in-function
# and do not register.
_PERSISTED: list[DataFrame] = []


def _persist(df: DataFrame, level) -> DataFrame:
    _PERSISTED.append(df.persist(level))
    return df


def release_intermediates() -> int:
    """Unpersist every intermediate a query builder persisted; returns
    the count released. Safe anytime: unpersisting a never-materialized
    plan only drops its CacheManager entry."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped: entry is gone anyway
            pass
    return n


def _read(spark: SparkSession, path: str) -> tuple[DataFrame, T.StructType]:
    memo = _rel_memo(spark)
    got = memo.get(path)
    if got is not None:
        return got
    sch = _SCHEMAS.get(path)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMAS[path] = sch
    df = spark.read.schema(sch).parquet(path)
    memo[path] = (df, sch)
    return df, sch


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    memo = _rel_memo(spark)
    got = memo.get(("t", path))
    if got is not None:
        return got
    df, sch = _read(spark, path)
    # events.ts is parquet TIMESTAMP(NANOS): read as long ns (see session.py)
    # and truncate to µs TimestampNTZ — exact via decimal division.
    if name == "events" and isinstance(sch["ts"].dataType, T.LongType):
        us = F.floor(F.col("ts").cast(T.DecimalType(38, 0)) / 1000).try_cast("long")
        df = df.withColumn("ts", F.timestamp_micros(us).cast(T.TimestampNTZType()))
    memo[("t", path)] = df
    return df


def _events_between(spark: SparkSession, sf_dir: str,
                    lo: str | None = None, hi: str | None = None) -> DataFrame:
    """events with a time-range filter applied on the RAW ns column.

    Filtering after the ns->µs conversion wraps ``ts`` in an expression,
    which blocks parquet predicate pushdown (no PushedFilters on ts). At
    100 TB a time-bounded scan must prune row groups/partitions, so the
    bound is translated to raw int64 ns and pushed BEFORE the
    conversion; tests/test_plans.py asserts the pushdown."""
    from datetime import datetime, timezone
    df, sch = _read(spark, f"{sf_dir}/events.parquet")
    raw_ns = isinstance(sch["ts"].dataType, T.LongType)

    def ns(s):
        dt = datetime.fromisoformat(s).replace(tzinfo=timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000

    if raw_ns:
        if lo is not None:
            df = df.filter(F.col("ts") >= ns(lo))
        if hi is not None:
            df = df.filter(F.col("ts") < ns(hi))
        us = F.floor(F.col("ts").cast(T.DecimalType(38, 0)) / 1000).try_cast("long")
        return df.withColumn("ts", F.timestamp_micros(us).cast(T.TimestampNTZType()))
    if lo is not None:
        df = df.filter(F.col("ts") >= lo)
    if hi is not None:
        df = df.filter(F.col("ts") < hi)
    return df


# ---------------------------------------------------------------------------
# §2B scans / filters / predicates
# ---------------------------------------------------------------------------

def q_tail_topk(spark, sf_dir):
    """L1-style tail: latest error events, top-k by time desc
    (reference: benchmark/otlp-query-probe/probe.py:409-411)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.filter(F.col("event_type") == "error")
            .select("event_id", "ts", "user_id", "value")
            .orderBy(F.col("ts").desc(), F.col("event_id").desc())
            .limit(100))


SQL_TAIL_TOPK = """
SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'error'
ORDER BY ts DESC, event_id DESC LIMIT 100
"""


def q_point_lookup(spark, sf_dir):
    """L2-style point lookup by key within a time range
    (reference: probe.py:413-417). The time bound pushes down on the
    raw ns column (see _events_between)."""
    ev = _events_between(spark, sf_dir, "2024-01-01", "2024-02-01")
    return (ev.filter(F.col("user_id") == 7)
            .select("event_id", "ts", "event_type", "value")
            .orderBy("event_id"))


SQL_POINT_LOOKUP = """
SELECT event_id, ts, event_type, value FROM events
WHERE user_id = 7 AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
ORDER BY event_id
"""


def q_in_list(spark, sf_dir):
    """IN-list predicate (reference: site/.../analyze-telemetry.md:60)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.filter(F.col("event_type").isin("error", "purchase"))
            .groupBy("event_type").agg(F.count("*").alias("n"))
            .orderBy("event_type"))


SQL_IN_LIST = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events
WHERE event_type IN ('error', 'purchase') GROUP BY event_type ORDER BY event_type
"""


def q_like_search(spark, sf_dir):
    """Brute-force LIKE substring search (reference: probe.py:423-424;
    README.md:174 documents no-FTS-by-design)."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.filter(F.col("text").like("%window%"))
            .select("doc_id", "lang", "n_chars").orderBy("doc_id"))


SQL_LIKE_SEARCH = """
SELECT doc_id, lang, n_chars FROM documents WHERE text LIKE '%window%' ORDER BY doc_id
"""


def q_ilike_search(spark, sf_dir):
    """ILIKE case-insensitive search (reference: probe.py:448)."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.filter(F.col("text").ilike("%WINDOW%"))
            .agg(F.count("*").alias("n_docs")))


SQL_ILIKE_SEARCH = "SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents WHERE text ILIKE '%WINDOW%'"


def q_regexp(spark, sf_dir):
    """regexp_matches equivalent (reference: probe.py:356)."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.filter(F.col("text").rlike("scan (merge|join)"))
            .select("doc_id").orderBy("doc_id"))


SQL_REGEXP = """
SELECT doc_id FROM documents WHERE regexp_matches(text, 'scan (merge|join)') ORDER BY doc_id
"""


def q_case_when(spark, sf_dir):
    """CASE WHEN classification (reference: probe.py:125-135)."""
    ev = _t(spark, sf_dir, "events")
    sev = (F.when(F.col("event_type") == "error", "high")
           .when(F.col("event_type").isin("purchase", "signup"), "medium")
           .otherwise("low"))
    return (ev.select(sev.alias("sev"))
            .groupBy("sev").agg(F.count("*").alias("n")).orderBy("sev"))


SQL_CASE_WHEN = """
SELECT CASE WHEN event_type = 'error' THEN 'high'
            WHEN event_type IN ('purchase','signup') THEN 'medium'
            ELSE 'low' END AS sev,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY sev ORDER BY sev
"""


def q_coalesce_cast(spark, sf_dir):
    """COALESCE + CAST (reference: analyze-telemetry.md:93;
    promotion read pattern serve.md:234-236)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.select(
        F.col("event_id"),
        F.coalesce(F.floor("value").cast("int"), F.lit(-1)).alias("value_int"),
        F.col("ts").cast("date").cast("string").alias("day"))
        .orderBy("event_id").limit(500))


SQL_COALESCE_CAST = """
SELECT event_id, COALESCE(CAST(floor(value) AS INT), -1) AS value_int,
       CAST(CAST(ts AS DATE) AS VARCHAR) AS day
FROM events ORDER BY event_id LIMIT 500
"""


def q_null_checks(spark, sf_dir):
    """IS NULL / IS NOT NULL (reference: read_otlp_edge_cases.test:17-53)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.when(F.col("props").isNull(), 1)).alias("null_props"),
        F.count(F.when(F.col("props").isNotNull(), 1)).alias("nonnull_props"),
    )


SQL_NULL_CHECKS = """
SELECT CAST(count(*) FILTER (props IS NULL) AS BIGINT) AS null_props,
       CAST(count(*) FILTER (props IS NOT NULL) AS BIGINT) AS nonnull_props
FROM events
"""


# ---------------------------------------------------------------------------
# §2B JSON / string / date scalar functions
# ---------------------------------------------------------------------------

def q_json_extract(spark, sf_dir):
    """JSON attribute extraction, the promoted-vs-JSON filter pattern
    (reference: analyze-telemetry.md:127; otlp_column_promote.cpp:76).

    Single-parse shape (r13): filtering the derived column BEFORE the
    aggregation made Catalyst push the predicate below the Project, so
    get_json_object — the dominant per-row cost — ran twice per
    surviving row (Filter + Project, guide §4.4's duplication in JVM
    form). Aggregating count per k over ALL rows first and filtering
    the low-cardinality group rows parses each row exactly once. The
    bare k > 50 predicate would be pushed back through the Aggregate
    (it references only grouping attributes); OR-ing an always-false
    condition on the aggregate output (n < 0; count(*) >= 1 by
    construction) keeps it above the agg. Identical results: NULL k
    fails k > 50 in both shapes, and group counts are unchanged.
    Interleaved A/B at sf0.1: 0.666 -> 0.550 s min-of-7
    (PROBE_R13_CONT.json); plan: one get_json_object, was two."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (ev.select(k.alias("k"))
            .groupBy("k").agg(F.count("*").alias("n"))
            .filter((F.col("k") > 50) | (F.col("n") < 0))
            .orderBy("k"))


SQL_JSON_EXTRACT = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, CAST(count(*) AS BIGINT) AS n
FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
GROUP BY k ORDER BY k
"""


def q_string_funcs(spark, sf_dir):
    """length/substr/md5/concat/upper (reference: probe.py:140-167,
    read_otlp_json.test:37-41)."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.select(
        F.col("doc_id"),
        F.length("text").alias("len"),
        F.substring("text", 1, 16).alias("prefix"),
        F.md5(F.col("text")).alias("digest"),
        F.concat(F.upper(F.col("lang")), F.lit(":"), F.col("source")).alias("tag"))
        .orderBy("doc_id").limit(200))


SQL_STRING_FUNCS = """
SELECT doc_id, CAST(length(text) AS INT) AS len, substr(text, 1, 16) AS prefix,
       md5(text) AS digest, upper(lang) || ':' || source AS tag
FROM documents ORDER BY doc_id LIMIT 200
"""


def q_date_trunc(spark, sf_dir):
    """date_trunc time bucketing (reference: analyze-telemetry.md:90)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .orderBy("hour"))


SQL_DATE_TRUNC = """
SELECT date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY hour ORDER BY hour
"""


def q_time_bucket(spark, sf_dir):
    """time_bucket(INTERVAL 5 MINUTE) equivalent via epoch arithmetic
    (reference: probe.py:416, 430)."""
    ev = _t(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp(F.col("ts")) / 300) * 300).cast("long")
    return (ev.filter(F.col("event_type") == "error")
            .groupBy(bucket.alias("bucket_s"))
            .agg(F.count("*").alias("errors"))
            .orderBy("bucket_s"))


SQL_TIME_BUCKET = """
SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_s,
       CAST(count(*) AS BIGINT) AS errors
FROM events WHERE event_type = 'error' GROUP BY bucket_s ORDER BY bucket_s
"""


def q_make_timestamp(spark, sf_dir):
    """make_timestamp + date-part extraction (reference: probe generator
    probe.py:146-147; partition expr probe.py:245)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.select(
        "event_id",
        F.make_timestamp(F.year("ts"), F.month("ts"), F.dayofmonth("ts"),
                         F.hour("ts"), F.lit(0), F.lit(0)).alias("hour_ts"),
        F.hour("ts").alias("h"))
        .orderBy("event_id").limit(300))


SQL_MAKE_TIMESTAMP = """
SELECT event_id,
       make_timestamp(year(ts), month(ts), day(ts), hour(ts), 0, 0) AS hour_ts,
       CAST(hour(ts) AS INT) AS h
FROM events ORDER BY event_id LIMIT 300
"""


def q_hex_roundtrip(spark, sf_dir):
    """hex/unhex + md5 id round-trip — the reference stores ids as
    lowercase hex VARCHAR and documents unhex for byte access
    (reference: schemas.md:180; read_otlp_json.test:37-41)."""
    docs = _t(spark, sf_dir, "documents")
    digest = F.md5(F.col("text"))
    return (docs.select(
        "doc_id",
        F.lower(F.hex(F.unhex(digest))).alias("hex_roundtrip"),
        F.length(F.unhex(digest)).alias("n_bytes"))
        .orderBy("doc_id").limit(300))


SQL_HEX_ROUNDTRIP = """
SELECT doc_id, lower(hex(unhex(md5(text)))) AS hex_roundtrip,
       CAST(octet_length(unhex(md5(text))) AS INT) AS n_bytes
FROM documents ORDER BY doc_id LIMIT 300
"""


def q_array_ops(spark, sf_dir):
    """Array literal + element_at + array equality — the reference
    compares bucket_counts arrays to literals
    (reference: read_otlp_metrics_histogram.test:47-56; probe.py:99-123)."""
    ev = _t(spark, sf_dir, "events")
    arr = F.array(F.col("user_id") % 3, F.col("user_id") % 5, F.col("user_id") % 7)
    return (ev.select("event_id", arr.alias("a"))
            .select(
                "event_id",
                F.element_at("a", 1).alias("first_elem"),
                (F.col("a") == F.array(F.lit(0), F.lit(0), F.lit(0))).alias("all_zero"),
                F.size("a").alias("n"))
            .orderBy("event_id").limit(300))


SQL_ARRAY_OPS = """
SELECT event_id, a[1] AS first_elem, a = [0, 0, 0] AS all_zero,
       CAST(len(a) AS INT) AS n
FROM (SELECT event_id, [user_id % 3, user_id % 5, user_id % 7] AS a FROM events)
ORDER BY event_id LIMIT 300
"""


def q_unnest_struct(spark, sf_dir):
    """Struct build + unnest-to-columns — the reference exposes
    otlp_uri_parser as a STRUCT and tests SELECT unnest(struct)
    (reference: uri.test:9-11; src/otlp_uri.cpp:106-136)."""
    ev = _t(spark, sf_dir, "events")
    s = F.struct(F.col("event_type").alias("etype"),
                 (F.col("user_id") % 100).alias("bucket"))
    return (ev.select("event_id", s.alias("s"))
            .select("event_id", "s.*")
            .orderBy("event_id").limit(300))


SQL_UNNEST_STRUCT = """
SELECT event_id, unnest(s)
FROM (SELECT event_id, {'etype': event_type, 'bucket': user_id % 100} AS s
      FROM events)
ORDER BY event_id LIMIT 300
"""


def q_multimodal_features(spark, sf_dir):
    """Multimodal-column plumbing under the oracle: document text bytes
    as an opaque binary payload run through the Arrow-batched
    mapInPandas feature extractor (operators/multimodal.py). The
    byte-count and digest are SQL-checkable; the deterministic fake
    feature vector is asserted separately in tests/test_operators.py.
    (beyond-reference: BASELINE.json multimodal item)"""
    from duckdb_otlp_spark.operators.multimodal import extract_features

    docs = _t(spark, sf_dir, "documents")
    # top-k BEFORE the expensive per-payload UDF: featurize 300 rows,
    # not the whole table (at 100 TB this is the whole ballgame)
    media = (docs.orderBy("doc_id").limit(300)
             .select(F.col("doc_id").alias("media_id"),
                     F.lit("doc").alias("kind"),
                     F.encode("text", "UTF-8").alias("payload")))
    return (extract_features(media)
            .select("media_id", "kind", "n_bytes", "digest")
            .orderBy("media_id"))


SQL_MULTIMODAL_FEATURES = """
SELECT doc_id AS media_id, 'doc' AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest
FROM documents ORDER BY media_id LIMIT 300
"""


# ---------------------------------------------------------------------------
# §2B aggregation
# ---------------------------------------------------------------------------

def q_agg_stats(spark, sf_dir):
    """Multi-agg GROUP BY: count/avg/min/max/sum/stddev
    (reference: analyze-telemetry.md:22-33, 93-94)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                 F.min("l_shipdate").alias("min_ship"),
                 F.max("l_shipdate").alias("max_ship"),
                 F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"))
            .orderBy("l_returnflag", "l_linestatus"))


SQL_AGG_STATS = """
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 2) AS sum_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
       round(stddev_samp(l_discount), 6) AS sd_disc
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


def q_percentile(spark, sf_dir):
    """percentile_cont(0.95) + median (reference: analyze-telemetry.md:27-28)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.round(F.percentile(F.col("value"), F.lit(0.95)), 4).alias("p95_value"),
                 F.round(F.percentile(F.col("value"), F.lit(0.5)), 4).alias("median_value"))
            .orderBy("event_type"))


SQL_PERCENTILE = """
SELECT event_type,
       round(percentile_cont(0.95) WITHIN GROUP (ORDER BY value), 4) AS p95_value,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4) AS median_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_count_distinct(spark, sf_dir):
    """COUNT(DISTINCT) (reference: read_otlp_concurrent.test:91)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(F.countDistinct("user_id").alias("n_users"),
                  F.countDistinct("event_type").alias("n_types"))


SQL_COUNT_DISTINCT = """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM events
"""


def q_topn_groups(spark, sf_dir):
    """Top-N groups by count (reference: probe L4, probe.py:454-459)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .agg(F.count("*").alias("n_events"))
            .orderBy(F.col("n_events").desc(), F.col("user_id"))
            .limit(10))


SQL_TOPN_GROUPS = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events FROM events
GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# §2B joins / subqueries
# ---------------------------------------------------------------------------

def q_join_inner(spark, sf_dir):
    """Inner equi-join, logs⋈traces analog
    (reference: analyze-telemetry.md:66-79)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue"))
            .orderBy("c_mktsegment"))


SQL_JOIN_INNER = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_join_multi(spark, sf_dir):
    """Three-way join through the star schema (revenue by nation —
    TPC-H Q5 shape; Catalyst broadcasts the dims)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(rev), 2).alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("n_name")))


SQL_JOIN_MULTI = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


def q_scalar_subquery(spark, sf_dir):
    """Scalar-subquery drill-down, slowest-trace analog
    (reference: analyze-telemetry.md:39-48)."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_v")
    return spark.sql("""
        SELECT event_id, ts, user_id, value FROM events_v
        WHERE user_id = (
            SELECT user_id FROM events_v WHERE event_type = 'error'
            ORDER BY value DESC, event_id LIMIT 1)
        ORDER BY event_id
    """)


SQL_SCALAR_SUBQUERY = """
SELECT event_id, ts, user_id, value FROM events
WHERE user_id = (
    SELECT user_id FROM events WHERE event_type = 'error'
    ORDER BY value DESC, event_id LIMIT 1)
ORDER BY event_id
"""


def q_correlated_subquery(spark, sf_dir):
    """Correlated subquery, decorrelated by Catalyst
    (reference: read_otlp_concurrent.test:96-105).

    The `* 50` scale keeps the predicate non-vacuous on the test data
    (no customer's raw balance beats their avg order total, so the bare
    comparison certifies decorrelation on an empty set — r6 verdict)."""
    for n in ("orders", "customer"):
        _t(spark, sf_dir, n).createOrReplaceTempView(f"{n}_v")
    return spark.sql("""
        SELECT c_custkey, c_name FROM customer_v c
        WHERE c_acctbal * 50 > (SELECT avg(o_totalprice) FROM orders_v o
                                WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey
    """)


SQL_CORRELATED_SUBQUERY = """
SELECT c_custkey, c_name FROM customer c
WHERE c_acctbal * 50 > (SELECT avg(o_totalprice) FROM orders o
                        WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


def q_cross_cte(spark, sf_dir):
    """Cross join of aggregated CTEs (reference: read_otlp_concurrent.test:78-87)."""
    ev = _t(spark, sf_dir, "events")
    totals = ev.agg(F.count("*").alias("total"))
    errors = ev.filter(F.col("event_type") == "error").agg(F.count("*").alias("errors"))
    return (errors.crossJoin(totals)
            .select("errors", "total",
                    F.round(F.col("errors") / F.col("total"), 6).alias("error_rate")))


SQL_CROSS_CTE = """
WITH t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events),
     e AS (SELECT CAST(count(*) AS BIGINT) AS errors FROM events WHERE event_type = 'error')
SELECT errors, total, round(errors / CAST(total AS DOUBLE), 6) AS error_rate FROM e, t
"""


# ---------------------------------------------------------------------------
# §2B set operations
# ---------------------------------------------------------------------------

def q_union_all(spark, sf_dir):
    """UNION ALL (reference: read_otlp_concurrent.test:40-48)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select("event_id", "event_type")
    b = ev.filter(F.col("event_type") == "signup").select("event_id", "event_type")
    return a.unionAll(b).orderBy("event_id")


SQL_UNION_ALL = """
SELECT event_id, event_type FROM events WHERE event_type = 'error'
UNION ALL
SELECT event_id, event_type FROM events WHERE event_type = 'signup'
ORDER BY event_id
"""


def q_except(spark, sf_dir):
    """EXCEPT ALL — the reference's own OTAP↔OTLP parity oracle pattern
    (reference: test/sql/read_otap.test:44-79)."""
    ev = _t(spark, sf_dir, "events")
    all_users = ev.select("user_id")
    error_users = ev.filter(F.col("event_type") == "error").select("user_id")
    return all_users.exceptAll(error_users).groupBy("user_id") \
        .agg(F.count("*").alias("n")).orderBy("user_id")


SQL_EXCEPT = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT user_id FROM events
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'error'
) GROUP BY user_id ORDER BY user_id
"""


def q_distinct(spark, sf_dir):
    """DISTINCT (reference: read_otap.test:107)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct().orderBy("user_id", "event_type")


SQL_DISTINCT = """
SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# Window functions (beyond the reference's own surface; SURVEY §2B notes
# Spark's Window covers anything added later)
# ---------------------------------------------------------------------------

def q_window_topk_per_group(spark, sf_dir):
    """Top-3 events per user by value via row_number window."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("user_id", "event_id", "value", "rn")
            .orderBy("user_id", "rn"))


SQL_WINDOW_TOPK = """
SELECT user_id, event_id, value, rn FROM (
    SELECT user_id, event_id, value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS rn
    FROM events)
WHERE rn <= 3 ORDER BY user_id, rn
"""


def q_window_running_sum(spark, sf_dir):
    """Running total per user ordered by time (denormalized-running-totals
    analog; reference: src/include/otlp_server.hpp:117-121)."""
    ev = _t(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, 0))
    return (ev.select("user_id", "event_id",
                      F.round(F.sum("value").over(w), 2).alias("running_value"))
            .orderBy("user_id", "event_id"))


SQL_WINDOW_RUNNING_SUM = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
FROM events ORDER BY user_id, event_id
"""


# ---------------------------------------------------------------------------
# TPC-H-shaped headline queries (bench workload)
# ---------------------------------------------------------------------------

def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary (flagship; SURVEY §7 phase-1 slice)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
                 F.round(F.sum(charge), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecast-revenue filter-and-sum."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_shipdate") >= "1994-01-01")
                      & (F.col("l_shipdate") < "1995-01-01")
                      & (F.col("l_discount").between(0.05, 0.07))
                      & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                 .alias("revenue")))


SQL_TPCH_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping-priority shape (join + agg + top-k)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (cust.filter(F.col("c_mktsegment") == "BUILDING")
            .join(orders, F.col("c_custkey") == F.col("o_custkey"))
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .filter((F.col("o_orderdate") < "1995-03-15") & (F.col("l_shipdate") > "1995-03-15"))
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.round(F.sum(rev), 2).alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10))


SQL_TPCH_Q3 = """
SELECT l_orderkey, o_orderdate, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# Beyond-reference: dedup / text analysis / similarity (BASELINE.json goals)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup by normalized text hash (hash-groupBy; scale path is a
    shuffle on the digest, skew-free because digests are uniform)."""
    docs = _t(spark, sf_dir, "documents")
    digest = F.md5(F.lower(F.trim(F.col("text"))))
    kept = (docs.withColumn("digest", digest)
            .groupBy("digest").agg(F.min("doc_id").alias("keep_doc_id"),
                                   F.count("*").alias("n_copies")))
    return (kept.agg(F.count("*").alias("n_unique"),
                     F.sum(F.col("n_copies") - 1).alias("n_dups")))


SQL_DEDUP_EXACT = """
WITH kept AS (
    SELECT md5(lower(trim(text))) AS digest, min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents GROUP BY digest)
SELECT CAST(count(*) AS BIGINT) AS n_unique,
       CAST(sum(n_copies - 1) AS BIGINT) AS n_dups
FROM kept
"""


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-duplicate removal, keep-first: a vector is a
    duplicate when some earlier vec_id IN ITS LSH BUCKET has cosine
    >= 0.45 (threshold chosen inside this synthetic corpus's similarity
    range). Completes the dedup family: exact, MinHash-LSH, SimHash,
    n-gram Jaccard, embedding-cosine.

    Candidates come from the sign-pattern LSH bucket equi-join (the
    same fixed-hyperplane bucketing as embedding_bucket_ann), so the
    plan is a hash-partitioned join on the bucket key — NO all-pairs
    BroadcastNestedLoopJoin/CartesianProduct anywhere; at 100 TB the
    pairs shuffle by bucket instead of crossing. The DuckDB oracle
    applies the identical bucketing, so the green check certifies this
    scale-safe plan (tests/test_plans.py pins the no-NLJ property).

    Scale note: the 6-bit (64-bucket) sketch here is an
    oracle-expressibility artifact — within-bucket work is O(n^2/64),
    fine at sf0.1 but NOT the corpus-scale shape. At 100 TB use
    operators/dedup.embedding_near_dup_pairs (the recall-oriented
    multi-probe variant) with planes >= 16 so expected occupancy
    n/2^planes stays small, and max_bucket_size set so skewed
    (identical-embedding) buckets fall back to O(d) star candidates —
    that guard is pinned by tests/test_operators.py::
    test_embedding_mega_bucket_cap."""
    emb = (_t(spark, sf_dir, "embeddings")
           .select("vec_id", F.col("embedding").cast("array<double>").alias("v")))
    # Norm hoist (r13, same as q_embedding_bucket_ann): ||v|| once per
    # row before the self-join instead of twice per candidate pair —
    # identical doubles, identical cos, so the >= 0.45 verdicts and the
    # oracle hash are unchanged. Bucket/norm/dot are single-parse SQL
    # twins of the former py4j lambda trees (see _sql_norm).
    e = emb.selectExpr("vec_id", "v", f"{_SQL_SIGN_BUCKET} AS bucket",
                       f"{_sql_norm('v')} AS nrm")
    a, b = e.alias("a"), e.alias("b")
    dups = (a.join(b, F.expr("a.bucket = b.bucket AND a.vec_id < b.vec_id"))
            .filter(F.expr(
                f"{_sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm) >= 0.45D"))
            .select(F.col("b.vec_id").alias("vec_id")).distinct())
    return (emb.join(dups, "vec_id", "left_anti")
            .select("vec_id").orderBy("vec_id"))


SQL_DEDUP_EMBEDDING = """
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           list_aggregate([CASE WHEN embedding[i+1] >= 0 THEN '1' ELSE '0' END
                           for i in range(6)], 'string_agg', '') AS bucket
    FROM embeddings),
dups AS (
    SELECT DISTINCT b.vec_id
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
          >= 0.45)
SELECT vec_id FROM e WHERE vec_id NOT IN (SELECT vec_id FROM dups)
ORDER BY vec_id
"""


def q_token_count(spark, sf_dir):
    """Whitespace token counting per document (text-analysis operator)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    return (docs.select("doc_id", toks.alias("n_tokens"))
            .orderBy("doc_id").limit(500))


SQL_TOKEN_COUNT = """
SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens
FROM documents ORDER BY doc_id LIMIT 500
"""


def q_text_quality(spark, sf_dir):
    """Quality scoring: stopword ratio + mean word length (text-analysis)."""
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), "\\s+")
    n_words = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin("the", "a", "of", "and")))
    return (docs.select(
        "doc_id",
        F.round(stop_hits / n_words, 4).alias("stopword_ratio"),
        F.round(F.length(F.col("text")) / n_words, 4).alias("mean_token_len"))
        .orderBy("doc_id").limit(500))


SQL_TEXT_QUALITY = """
SELECT doc_id,
       round(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             w -> w IN ('the','a','of','and')))
             / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE), 4)
           AS stopword_ratio,
       round(length(text) / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE), 4)
           AS mean_token_len
FROM documents ORDER BY doc_id LIMIT 500
"""


def q_doc_fingerprint(spark, sf_dir):
    """Deterministic document fingerprint (md5 over normalized text),
    grouped to find same-fingerprint clusters."""
    docs = _t(spark, sf_dir, "documents")
    fp = F.substring(F.md5(F.lower(F.trim(F.col("text")))), 1, 16)
    return (docs.select("doc_id", fp.alias("fingerprint"))
            .orderBy("doc_id").limit(500))


SQL_DOC_FINGERPRINT = """
SELECT doc_id, substr(md5(lower(trim(text))), 1, 16) AS fingerprint
FROM documents ORDER BY doc_id LIMIT 500
"""


def q_ngram_jaccard(spark, sf_dir):
    """3-gram (word) Jaccard similarity of each doc against doc 0 —
    n-gram near-dup primitive over set ops on shingles. The target row
    broadcasts; the scan side is repartitioned because the CPU cost is
    in shingling, not IO (locally one parquet file = one split)."""
    docs = _docs_parallel(spark, sf_dir)
    with_sh = docs.select("doc_id", _shingles("text").alias("sh"))
    target = with_sh.filter(F.col("doc_id") == 0).select(F.col("sh").alias("sh0"))
    joined = with_sh.filter(F.col("doc_id") != 0).crossJoin(F.broadcast(target))
    inter = F.size(F.array_intersect(F.col("sh"), F.col("sh0")))
    union = F.size(F.array_union(F.col("sh"), F.col("sh0")))
    return (joined.select("doc_id", F.round(inter / union, 6).alias("jaccard"))
            .orderBy(F.col("jaccard").desc(), F.col("doc_id"))
            .limit(20))


SQL_NGRAM_JACCARD = """
WITH sh AS (
    SELECT doc_id,
           list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                          for i in range(1, len(words) - 1)]) AS sh
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words FROM documents)
), t AS (SELECT sh AS sh0 FROM sh WHERE doc_id = 0)
SELECT doc_id,
       round(CAST(len(list_intersect(sh, sh0)) AS DOUBLE)
             / len(list_distinct(list_concat(sh, sh0))), 6) AS jaccard
FROM sh, t WHERE doc_id <> 0
ORDER BY jaccard DESC, doc_id LIMIT 20
"""


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline over the embedding column.

    Scale path: the query vector broadcasts; the scan is embarrassingly
    parallel; dot products stay JVM-side via zip_with/aggregate."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    target = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("q"))
    joined = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(target))
    # dot/norm folds parse from one SQL string each (see _sql_norm)
    return (joined.selectExpr(
        "vec_id",
        f"round({_sql_dot('v', 'q')} / ({_sql_norm('v')} * {_sql_norm('q')}),"
        " 4) AS cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10))


SQL_ANN_COSINE_TOPK = """
WITH t AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(CAST(embedding AS DOUBLE[]), q)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(q, q))), 4) AS cos_sim
FROM embeddings, t WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


# Oracle-compatible deterministic hash: both engines read the first 15
# md5 hex chars as a 60-bit big-endian integer. (The scale-path operators
# in operators/dedup.py use xxhash64, which is faster but Spark-only.)

def _md5int(c):
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# Spark-SQL text twin of _md5int (single parse, see _shingles) — the
# same Cast(Conv(Substring(Md5(..)))) tree _md5int builds through py4j.
# SPARK syntax only (conv() is a Spark builtin); its DuckDB twin is
# _SQL_MD5INT below — grab the one matching the engine the string is
# headed for (ADVICE r13).
_MD5INT_SQL = "CAST(conv(substring(md5(%s), 1, 15), 16, 10) AS BIGINT)"

# DuckDB syntax only ('0x'||hex literal cast): the oracle-side twin of
# _MD5INT_SQL, embedded in the SQL_* oracle strings.
_SQL_MD5INT = "CAST(('0x' || substr(md5(%s), 1, 15)) AS BIGINT)"


# Single-parse SQL twins of the embedding HOF expressions. A py4j
# lambda tree (F.aggregate / F.zip_with / F.transform with Python
# lambdas) costs 7-14 ms of driver round-trips per Column BUILD
# (PROBE_R13_DRIVER.json:expr_build); one F.expr parse is ~0.4 ms and
# yields the identical Catalyst tree (0.0D/0.45D pin the literals to
# the same doubles F.lit produced), so every score is bitwise-unchanged
# — re-pinned against the DuckDB oracle at sf0.01.
def _sql_norm(c: str) -> str:
    return f"sqrt(aggregate({c}, 0.0D, (acc, x) -> acc + x * x))"


def _sql_dot(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
            "(acc, x) -> acc + x)")


# Hardcodes the embedding column name 'v' (unlike the parameterized
# _sql_norm/_sql_dot): both call sites (q_embedding_bucket_ann,
# q_dedup_embedding's bucket probe) select the vector AS v first —
# a differently-named caller must alias to v or parameterize this.
_SQL_SIGN_BUCKET = ("concat_ws('', transform(slice(v, 1, 6), "
                    "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END))")


def _bind1(col, body):
    """Let-binding for Column expressions: evaluate ``col`` ONCE per row
    and reference it any number of times inside ``body`` as a lambda
    variable.

    Load-bearing at scale (r10 probe finding): higher-order-function
    lambdas are interpreted (CodegenFallback) and get NO common-
    subexpression elimination, so a Column like ``split(text)`` inlined
    into a per-element gram lambda re-evaluates the full split for
    EVERY gram — O(words^2) per document. Invisible on the 5k-doc test
    tables; at 2M generated docs it made the MinHash shingle pass
    ~20x slower than the bound form. ``transform`` over a one-element
    array binds the value to a real lambda variable instead."""
    return F.transform(F.array(col), body)[0]


def _shingles(text_col="text"):
    """Distinct word 3-gram shingles; empty array below 3 words.

    Built from ONE parsed SQL string (``_shingles_sql``) instead of a
    nested py4j Column tree: constructing this expression per-Column
    cost ~250 ms of driver time per MinHash query build
    (PROBE_R13_DRIVER.json, guide §7.3); a single ``F.expr`` parse is
    ~1 ms and yields the identical analyzed expression (the split is
    still let-bound once via transform-over-one-element-array, see
    ``_bind1``)."""
    return F.expr(_shingles_sql(text_col))


def _words_bound_sql(c: str, body: str) -> str:
    """Let-bind ``split(trim(c))`` ONCE as ``words`` and evaluate
    ``body`` over it — the SQL-string form of ``_bind1``'s
    transform-over-one-element-array idiom (HOF lambdas get no CSE, so
    an inlined split is O(L²) per doc). Shared by every word-gram
    builder so the binding trap is written exactly once (ADVICE r13)."""
    return f"transform(array(split(trim({c}), '\\\\s+')), words -> {body})[0]"


def _ngrams_sql(n: int) -> str:
    """Word n-gram array over a bound ``words`` variable (duplicates
    kept, no length guard — callers add their own)."""
    terms = ", ".join(f"words[i + {j}]" if j else "words[i]"
                      for j in range(n))
    return (f"transform(sequence(0, size(words) - {n}), i -> "
            f"concat_ws(' ', {terms}))")


def _distinct_ngrams_sql(c: str, n: int) -> str:
    """Distinct word n-gram shingles as one SQL string; empty array
    below n words."""
    return _words_bound_sql(
        c,
        f"CASE WHEN size(words) >= {n} THEN array_distinct({_ngrams_sql(n)}) "
        "ELSE CAST(array() AS ARRAY<STRING>) END")


def _shingles_sql(c: str = "text") -> str:
    return _distinct_ngrams_sql(c, 3)


_SQL_SHINGLES = """
    SELECT doc_id,
           list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                          for i in range(1, len(words) - 1)]) AS sh
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words FROM documents)
"""

_MINHASH_P = 2147483647
_MINHASH_A = (1103, 12289, 331, 9973, 14341, 32717)
_MINHASH_B = (12345, 6789, 42, 777, 2468, 97531)
_MINHASH_K = 6


def _base_hashes_sql(sh_sql: str) -> str:
    """Shingle array -> 31-bit base-hash array (one md5 per shingle),
    as a SQL expression string (single parse, see ``_shingles``).

    The md5 runs ONCE per shingle; the K seed hashes below are cheap
    affine re-hashes (a*h + b) mod 2^31-1 whose products stay under
    2^62 — overflow-safe in Spark ANSI mode and DuckDB alike."""
    return (f"transform({sh_sql}, s -> "
            "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) "
            f"% {_MINHASH_P})")


def _base_hashes(sh_sql: str | None = None, text: str = "text"):
    return F.expr(_base_hashes_sql(
        sh_sql if sh_sql is not None else _shingles_sql(text)))


def _minhash_cols(hs: str = "hs"):
    """K minhashes from the base-hash array via affine re-hashing.

    r14 recorded negative: fusing the K transform passes into ONE
    aggregate() with a least()-accumulator array (sample-verified
    value-identical) measured NEUTRAL at the 2M tier (interleaved
    noop mins 4.0 s old vs 3.8 s fused, inside the swing) — the
    HOF-invocation count is not the cost, the per-element array
    allocations balance. The pipeline's real floor is the md5 base-hash
    pass (11.2 s of the 25 s 2M pair build), which is oracle-pinned
    (both engines compute identical md5-derived band keys)."""
    return [F.expr(f"array_min(transform({hs}, h -> (h * {_MINHASH_A[i]} "
                   f"+ {_MINHASH_B[i]}) % {_MINHASH_P}))").alias(f"m{i}")
            for i in range(_MINHASH_K)]


_SQL_BASE_HASHES = f"list_transform(sh, s -> {_SQL_MD5INT % 's'} % {_MINHASH_P})"
_SQL_MINHASH_LIST = ", ".join(
    f"list_min(list_transform(hs, h -> (h * {_MINHASH_A[i]} + {_MINHASH_B[i]}) "
    f"% {_MINHASH_P})) AS m{i}" for i in range(_MINHASH_K))


def _est_scan_splits(spark, path: str) -> int:
    """Estimate the scan's split count from os file sizes with the same
    math FilePartition.getFilePartitions uses (maxSplitBytes from
    maxPartitionBytes / openCostInBytes / defaultParallelism, greedy
    packing with the open-cost padding).  Replaces the former
    ``.rdd.getNumPartitions()`` probe, which built a full RDD
    conversion plan per query build (~126 ms each,
    PROBE_R13_DRIVER.json) for a number derivable from the listing."""
    from pathlib import Path as _P

    p = _P(path)
    files = ([f for f in p.iterdir()
              if f.is_file() and not f.name.startswith(("_", "."))]
             if p.is_dir() else [p])
    sizes = sorted((f.stat().st_size for f in files), reverse=True)
    if not sizes:
        return 0
    max_part = int(spark.conf.get("spark.sql.files.maxPartitionBytes",
                                  str(128 * 1024 * 1024)))
    open_cost = int(spark.conf.get("spark.sql.files.openCostInBytes",
                                   str(4 * 1024 * 1024)))
    par = spark.sparkContext.defaultParallelism
    bytes_per_core = (sum(sizes) + open_cost * len(sizes)) / max(par, 1)
    max_split = min(max_part, max(open_cost, int(bytes_per_core)))
    chunks: list[int] = []
    for sz in sizes:
        while sz > max_split:
            chunks.append(max_split)
            sz -= max_split
        chunks.append(sz)
    n, cur = 0, 0
    for c in chunks:
        if cur + c > max_split and cur > 0:
            n, cur = n + 1, 0
        cur += c + open_cost
    return n + (1 if cur > 0 else 0)


def _docs_parallel(spark, sf_dir):
    """documents scan with enough tasks to keep every core busy for the
    CPU-heavy shingle/hash work.  The repartition is CONDITIONAL: it
    only fires when the scan yields fewer splits than cores (the local
    one-small-file case).  At scale the scan already has >= cores
    splits, and an unconditional ``repartition()`` would be a full
    shuffle of the text corpus before every MinHash/SimHash query —
    exactly the shape that dies at 100 TB.  The split count comes from
    the file listing only (no job, no RDD plan)."""
    docs = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    if _est_scan_splits(spark, f"{sf_dir}/documents.parquet") >= par:
        return docs
    return docs.repartition(par)


def q_minhash_signature(spark, sf_dir):
    """MinHash signatures (K=6) over word 3-gram shingles — the
    shuffle-free half of MinHash-LSH dedup; everything stays JVM-side
    (array_min/transform over the shingle array, no UDF, no explode)."""
    docs = _docs_parallel(spark, sf_dir)
    hs = _base_hashes()
    return (docs.select("doc_id", hs.alias("hs"))
            .select("doc_id", *_minhash_cols("hs"))
            .orderBy("doc_id").limit(200))


SQL_MINHASH_SIGNATURE = f"""
WITH sh AS ({_SQL_SHINGLES}),
h AS (SELECT doc_id, {_SQL_BASE_HASHES} AS hs FROM sh)
SELECT doc_id, {_SQL_MINHASH_LIST}
FROM h ORDER BY doc_id LIMIT 200
"""


def _minhash_pairs_unsorted(spark, sf_dir):
    """MinHash-LSH near-duplicate pairs: 3 bands x 2 rows -> band-bucket
    equi-join candidates -> exact-Jaccard verification >= 0.7.

    Scale shape (same as operators/dedup.minhash_lsh_pairs:99-104):
    candidate pairs come from a self-equi-join of the banded signatures
    on (band_idx, key) — a uniform hash-key shuffle. No collect_list
    bucket materialization: a hot bucket of d near-identical docs used
    to emit d(d-1)/2 structs in ONE array on one row; the join shape
    spreads the same pairs across tasks.

    Single-execution of the expensive passes is STRUCTURAL, not
    optimizer-dependent: ``bands`` (the corpus shingle+md5+minhash
    pass) and ``cand``/``cand_sh`` (read by both verification join
    branches) are persisted, so nothing depends on ReuseExchange firing
    across branches. Exact-Jaccard verification shingles only candidate
    docs, AFTER the id join — candidates are orders of magnitude fewer
    than the corpus. The candidate-id join carries no broadcast hint:
    candidate counts are corpus-dependent and an unbounded broadcast
    can exceed the driver; AQE broadcasts it when actually small."""
    from pyspark.storagelevel import StorageLevel

    disk = StorageLevel.MEMORY_AND_DISK
    docs = _docs_parallel(spark, sf_dir)
    # Persist the 31-bit BASE-HASH sets, not the string shingle arrays:
    # a primitive long array is ~7x smaller per element than the shingle
    # strings, which is the difference between the corpus shingle state
    # fitting in executor storage and the 20M-doc spill/evict/recompute
    # cliff the r10 probe measured (dedup_cluster 53x at 10x data —
    # cache eviction re-ran the shingle pipeline per consumer branch).
    # Jaccard verification runs over the SAME hashed sets in both
    # engines (array_distinct here, list_distinct in the twin), so
    # oracle parity is exact; the 31-bit space makes an intra-doc
    # collision a ~1e-5 event that both engines share identically.
    docs_hs = _persist(docs.selectExpr(
        "doc_id",
        f"array_distinct({_base_hashes_sql(_shingles_sql('text'))}) AS hs"),
        disk)
    # persisted: the self-join below otherwise re-derives the md5
    # signature pipeline on BOTH branches (docs_hs caches only the
    # hashed shingles) — tiny rows of cache buy back the second pass.
    # The K minhash columns are inlined into the band structs (each m_i
    # feeds exactly one band key, so no work is duplicated) and
    # ``inline`` flattens the struct array in the same projection: one
    # Dataset op where the former sig->explode->flatten chain paid
    # three rounds of eager JVM analysis (~25 ms each, guide §7.3).
    mh = [f"array_min(transform(hs, h -> (h * {_MINHASH_A[i]} "
          f"+ {_MINHASH_B[i]}) % {_MINHASH_P}))" for i in range(_MINHASH_K)]
    bands = _persist(docs_hs.selectExpr(
        "doc_id",
        "inline(array(" + ", ".join(
            f"struct({b} AS band_idx, concat_ws('_', {mh[2 * b]}, "
            f"{mh[2 * b + 1]}) AS key)" for b in range(3)) + "))"),
        disk)
    # DataFrame-API joins, NOT parameterized spark.sql("{df}"): the
    # {df} substitution re-analyzes the referenced plan under fresh
    # expression ids, which silently defeats CacheManager's sameResult
    # match — the persisted stages above would recompute per consumer
    # branch (measured 3x wall at sf0.1 before this was caught).
    # cand is SINGLE-USE (the verification chain reads it once), so it
    # is not persisted: an r13 A/B measured the persist barrier at
    # ~0.33 s for nothing saved (consumers that fan out — dedup_cluster
    # — persist the returned pairs themselves).
    cand = (bands.alias("a")
            .join(bands.alias("b"),
                  F.expr("a.band_idx = b.band_idx AND a.key = b.key "
                         "AND a.doc_id < b.doc_id"))
            .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b")
            .distinct())
    return (cand
            .join(docs_hs.selectExpr("doc_id AS doc_a", "hs AS hs_a"),
                  "doc_a")
            .join(docs_hs.selectExpr("doc_id AS doc_b", "hs AS hs_b"),
                  "doc_b")
            .selectExpr("doc_a", "doc_b",
                        "round(size(array_intersect(hs_a, hs_b)) "
                        "/ size(array_union(hs_a, hs_b)), 4) AS jaccard")
            .filter("jaccard >= 0.7"))


def q_minhash_lsh_pairs(spark, sf_dir):
    """Presentation wrapper: the gate entry orders for the hash compare.
    Consumers that don't need the order (dedup_cluster) call
    _minhash_pairs_unsorted directly — the global sort would otherwise
    ride into their lineage, costing a range exchange plus the range
    partitioner's extra sampling evaluation of the verification join."""
    return (_minhash_pairs_unsorted(spark, sf_dir)
            .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b"))


SQL_MINHASH_LSH_PAIRS = f"""
WITH sh AS ({_SQL_SHINGLES}),
h AS (SELECT doc_id, list_distinct({_SQL_BASE_HASHES}) AS hs FROM sh),
m AS (SELECT doc_id, hs, {_SQL_MINHASH_LIST} FROM h),
bands AS (
    SELECT doc_id, i AS band_idx,
           CASE i WHEN 0 THEN m0 || '_' || m1
                  WHEN 1 THEN m2 || '_' || m3
                  ELSE m4 || '_' || m5 END AS key
    FROM m, range(3) t(i)),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
             / len(list_distinct(list_concat(sa.hs, sb.hs))), 4) AS jaccard
FROM cand
JOIN m sa ON sa.doc_id = doc_a
JOIN m sb ON sb.doc_id = doc_b
WHERE round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
            / len(list_distinct(list_concat(sa.hs, sb.hs))), 4) >= 0.7
ORDER BY jaccard DESC, doc_a, doc_b
"""


def q_simhash(spark, sf_dir):
    """16-bit SimHash fingerprints: per-bit majority vote over the word
    multiset. The word hash runs once into a hash array, then 16
    bit-filters read it — oracle-compatible variant of
    operators/dedup.simhash_bits."""
    docs = _docs_parallel(spark, sf_dir)
    words = F.split(F.trim(F.col("text")), r"\s+")
    hashed = docs.select(
        "doc_id", F.size(words).alias("n"),
        F.transform(words, lambda w: _md5int(w)).alias("hw"))

    def bit_pred(j):
        return lambda h: F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1

    bits = [
        F.when(2 * F.size(F.filter("hw", bit_pred(j))) > F.col("n"),
               F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(16)]
    simhash = bits[0]
    for b in bits[1:]:
        simhash = simhash + b
    return (hashed.select("doc_id", simhash.cast("int").alias("simhash16"))
            .orderBy("doc_id").limit(500))


_SQL_SIMHASH_BITS = " + ".join(
    "CASE WHEN 2 * len(list_filter(hw, h -> ((h >> %d) & 1) = 1)) > n "
    "THEN %d ELSE 0 END" % (j, 1 << j) for j in range(16))

SQL_SIMHASH = f"""
SELECT doc_id, CAST({_SQL_SIMHASH_BITS} AS INT) AS simhash16
FROM (SELECT doc_id, len(words) AS n,
             list_transform(words, w -> {_SQL_MD5INT % 'w'}) AS hw
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), \'\\s+\') AS words
            FROM documents))
ORDER BY doc_id LIMIT 500
"""


def q_embedding_bucket_ann(spark, sf_dir):
    """LSH-bucketed ANN pairs: sign-pattern of the first 6 dimensions is
    the bucket (a fixed-hyperplane LSH), cosine is computed only within
    buckets — the N^2 cross join becomes a per-bucket join, which is the
    100 TB path (bucket keys shuffle-partition the table).

    Scale note: 6 planes / 64 buckets keeps the DuckDB oracle
    expressible; within-bucket cost is O(n^2/64) and unguarded against
    identical-embedding skew. The corpus-scale entry point is
    operators/dedup.embedding_near_dup_pairs with planes >= 16 and
    max_bucket_size (star-fallback skew guard, pinned by
    tests/test_operators.py::test_embedding_mega_bucket_cap)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    # Norm hoist (r13): ||v|| is a per-VECTOR quantity, so it is computed
    # once per row BEFORE the self-join — the old per-pair norm folds ran
    # O(pairs * d) interpreted HOF work (two extra array folds on every
    # candidate pair); this shape runs them O(n * d). Same expression on
    # the same doubles -> bitwise-identical cos_sim (oracle re-pinned).
    # Bucket/norm/dot parse from one SQL string each (see _sql_norm).
    e = emb.selectExpr("vec_id", "v", f"{_SQL_SIGN_BUCKET} AS bucket",
                       f"{_sql_norm('v')} AS nrm")
    a, b = e.alias("a"), e.alias("b")
    joined = a.join(b, F.expr("a.bucket = b.bucket AND a.vec_id < b.vec_id"))
    return (joined.selectExpr(
        "a.vec_id AS vec_a", "b.vec_id AS vec_b",
        f"round({_sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm), 4) AS cos_sim")
        .orderBy(F.col("cos_sim").desc(), "vec_a", "vec_b")
        .limit(10))


SQL_EMBEDDING_BUCKET_ANN = """
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           list_aggregate([CASE WHEN embedding[i+1] >= 0 THEN '1' ELSE '0' END
                           for i in range(6)], 'string_agg', '') AS bucket
    FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
           AS cos_sim
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
ORDER BY cos_sim DESC, vec_a, vec_b LIMIT 10
"""


# q_ann_ivf_topk's query vector (vec_id=0's embedding), cached per sf_dir.
# Fetched with a driver-local pyarrow read — parquet row-group predicate
# pushdown, one row, NO Spark job — so building the IVF gate entry's plan
# costs zero jobs beyond ivf_search's inherent nprobe centroid fetch
# (pinned by tests/test_plans.py::test_ivf_plan_build_job_budget).  The
# earlier DataFrame .first() here ran a full Spark job per plan build.
_IVF_QUERY_VEC: dict[str, list] = {}


def _ivf_query_vec(sf_dir: str) -> list:
    v = _IVF_QUERY_VEC.get(sf_dir)
    if v is None:
        import pyarrow.dataset as _ds
        tbl = _ds.dataset(f"{sf_dir}/embeddings.parquet").to_table(
            columns=["embedding"], filter=_ds.field("vec_id") == 0)
        v = [float(x) for x in tbl.column("embedding")[0].as_py()]
        _IVF_QUERY_VEC[sf_dir] = v
    return v


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-probed approximate top-k (operators/similarity.build_ivf_index
    + ivf_search): vectors partition by nearest-of-16 deterministic
    md5-seeded centroids; the query probes only the 4 closest partitions
    — the 100 TB layout prunes ~C/nprobe of the scan.

    Fully oracle-checked: seeding is md5-derived (SQL-expressible), and
    the registered query uses iters=0 (seed-vector quantizer, no Lloyd
    refinement) because group-averaged centroid means cannot be
    reproduced bitwise across engines (aggregation order differs); every
    comparison in this pipeline is then a left-to-right fold both
    engines compute identically (verified bitwise vs DuckDB
    list_dot_product).  The Lloyd path (iters>0) stays covered by
    pytest (tests/test_operators.py)."""
    from duckdb_otlp_spark.operators.similarity import build_ivf_index, ivf_search

    emb = _t(spark, sf_dir, "embeddings")
    q = _ivf_query_vec(sf_dir)
    corpus = emb.filter(F.col("vec_id") != 0)
    assigned, centroids = build_ivf_index(corpus, "vec_id", "embedding",
                                          n_centroids=16, iters=0)
    return (ivf_search(assigned, centroids, "vec_id", "embedding", q,
                       k=10, nprobe=4)
            .select("vec_id", F.col("cosine").alias("cos_sim")))


# DuckDB twin of the ENTIRE IVF pipeline: identical md5-hash seeding,
# identical nearest-centroid assignment (cos DESC, centroid_id
# tie-break), identical 4-probe selection, identical final top-10.
# list_dot_product is an ordered left-to-right fold, bitwise-equal to
# the Spark aggregate/zip_with fold over the same doubles.
SQL_ANN_IVF_TOPK = """
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id <> 0
),
q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0
),
seeds AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS centroid_id,
         v AS centroid
  FROM (
    SELECT vec_id, v,
           CAST(('0x' || substr(md5('42:' || CAST(vec_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS h
    FROM corpus ORDER BY h, vec_id LIMIT 16
  )
),
assign AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT c.vec_id, c.v, s.centroid_id,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY list_dot_product(c.v, s.centroid)
                      / (sqrt(list_dot_product(c.v, c.v))
                         * sqrt(list_dot_product(s.centroid, s.centroid))) DESC,
                      s.centroid_id) AS rn
    FROM corpus c CROSS JOIN seeds s)
  WHERE rn = 1
),
probes AS (
  SELECT centroid_id FROM seeds, q
  ORDER BY list_dot_product(centroid, q.v)
           / (sqrt(list_dot_product(centroid, centroid))
              * sqrt(list_dot_product(q.v, q.v))) DESC,
           centroid_id
  LIMIT 4
)
SELECT a.vec_id,
       round(list_dot_product(a.v, q.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(q.v, q.v))), 6) AS cos_sim
FROM assign a JOIN probes p USING (centroid_id), q
ORDER BY cos_sim DESC, a.vec_id
LIMIT 10
"""


def q_embedding_group_stats(spark, sf_dir):
    """Per-label embedding stats: count + mean first-component (array ops)."""
    emb = _t(spark, sf_dir, "embeddings")
    first = F.col("embedding").getItem(0).cast("double")
    return (emb.groupBy("label")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg(first), 6).alias("avg_first"))
            .orderBy("label"))


SQL_EMBEDDING_GROUP_STATS = """
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS avg_first
FROM embeddings GROUP BY label ORDER BY label
"""


def q_lang_id(spark, sf_dir):
    """Language-distribution profile (language-ID bookkeeping over the
    corpus; heuristic n-gram scorer lands in operators/text.py)."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"))
            .orderBy("lang"))


SQL_LANG_ID = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Training-data pipeline: sessionization / sampling / clustering / ranking
# ---------------------------------------------------------------------------

def q_sessionize(spark, sf_dir):
    """Gap-based sessionization of the event stream: a new session
    starts after >6 h of inactivity per user; one row per session with
    start/end/count/value rollups — the classic telemetry -> training
    -sequence step.

    Scale shape: ONE hash shuffle on user_id serves everything. The lag
    window, the running-sum window, and the (user_id, session_idx)
    aggregation all share that partitioning, so Catalyst plans a single
    Exchange (pinned by tests/test_plans.py) — at 100 TB the sort
    within each user partition is the only per-row cost after the
    shuffle. r14: the lag runs on ``ts`` itself and the epoch seconds
    are taken AFTER the window — lagging a derived ``unix_timestamp``
    column made Catalyst pre-project it BELOW the exchange, shuffling
    an extra long per event row (guide §2.3). Rows verified identical;
    sf0.1 walls neutral (0.741 vs 0.737 s interleaved mins) — the win
    is shuffle bytes at scale, not local wall."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp(F.col("ts"))
    lag_sec = F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(sec - lag_sec > 6 * 3600, 1).otherwise(0)
    run = (W.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    sess = (ev.withColumn("new_sess", new_sess)
            .withColumn("session_idx", F.sum("new_sess").over(run)))
    return (sess.groupBy("user_id", "session_idx")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .orderBy("user_id", "session_idx"))


SQL_SESSIONIZE = """
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN floor(epoch(ts)) - lag(floor(epoch(ts)))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) > 21600
                THEN 1 ELSE 0 END AS new_sess
    FROM events
), sess AS (
    SELECT user_id, ts, value,
           CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
    FROM flagged)
SELECT user_id, session_idx, min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 4) AS sum_value
FROM sess GROUP BY user_id, session_idx ORDER BY user_id, session_idx
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling for training-data splits:
    keep 15% of English docs and 40% of every other language, decided
    by a content-stable hash (md5 of lang:doc_id mod 1000), NOT rand()
    — the split is reproducible across runs, engines, and repartitions,
    which is the property a train/eval split actually needs.

    Scale shape: map-only — a per-row hash + comparison, no shuffle
    (the orderBy here is presentation-only; the operator itself is a
    filter). Sampling 100 TB costs one scan."""
    docs = _t(spark, sf_dir, "documents")
    key = _md5int(F.concat_ws(":", F.col("lang"),
                              F.col("doc_id").cast("string"))) % 1000
    rate = F.when(F.col("lang") == "en", F.lit(150)).otherwise(F.lit(400))
    return (docs.filter(key < rate)
            .select("doc_id", "lang", "source")
            .orderBy("doc_id"))


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source FROM documents
WHERE {_SQL_MD5INT % "lang || ':' || CAST(doc_id AS VARCHAR)"} % 1000
      < CASE WHEN lang = 'en' THEN 150 ELSE 400 END
ORDER BY doc_id
"""


# Edge-count threshold for q_dedup_cluster's driver-local fast path —
# the CC analogue of Spark's own broadcast-join threshold. 200k edges
# is a few MB on the driver; tests monkeypatch it to 0 to force (and so
# keep covered) the distributed loop.
_LOCAL_CC_MAX_EDGES = 200_000


def _local_cc_labels(edges):
    """Union-find (union-by-min + path compression) over a collected
    edge list; returns {node: min_id_of_component}."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
        parent.setdefault(ra, ra)
        parent.setdefault(rb, rb)
    return {n: find(n) for n in parent}


def _local_cc_df(spark, edge_list):
    """Materialize union-find labels over a collected (bounded) edge
    list as a single-partition DataFrame.  Explicit schema: an empty
    pandas frame has object dtypes and would otherwise raise
    CANNOT_INFER_EMPTY_SCHEMA when a corpus has zero verified
    near-duplicate pairs (r6 ADVICE)."""
    import pandas as pd

    lab = _local_cc_labels(edge_list)
    pdf = pd.DataFrame(
        [(int(n), int(l), n == l) for n, l in sorted(lab.items())],
        columns=["doc_id", "cluster_id", "is_canonical"])
    pdf = pdf.sort_values(["cluster_id", "doc_id"], ignore_index=True)
    # Arrow-batched local relation (a plain-list createDataFrame
    # parallelizes through Python workers — ~10x slower here)
    out = spark.createDataFrame(
        pdf, "doc_id bigint, cluster_id bigint, is_canonical boolean")
    return out.coalesce(1).sortWithinPartitions("cluster_id", "doc_id")


def q_dedup_cluster(spark, sf_dir):
    """Connected components over the verified MinHash-LSH near-duplicate
    pairs — the 'group duplicates, keep one canonical doc per cluster'
    step after candidate verification. cluster_id = min doc_id in the
    component; is_canonical marks the survivor.

    Scale shape, chosen ADAPTIVELY from the materialized edge count
    (the CC analogue of AQE's broadcast threshold):

    - Small graphs (<= _LOCAL_CC_MAX_EDGES, a few MB): collect the
      edge list and run driver-local union-find — exact, O(E α(E)),
      two Spark jobs total. Near-dup edge lists are tiny relative to
      the corpus (they hold only verified duplicate pairs), so this is
      the common case even on big corpora.
    - Big graphs: min-label propagation with PATH DOUBLING to a
      fixpoint. Each round is one shuffle-join of the label table
      against the (persisted) symmetric edge list + a groupBy min —
      O(E) — plus a label-of-label self-join (label <- min(label,
      label(label))), O(V), which collapses chain-shaped components in
      O(log d) rounds instead of O(d); near-dup components are
      near-cliques, covered in 1-2 rounds either way. The loop stops
      when a round changes nothing (the convergence check is a filter
      over the round's own materialization). Labels persist per round
      so lineage never re-runs the MinHash pipeline, and the symmetric
      edge list is built with one explode pass (a self-union here
      would evaluate the MinHash pipeline once per union branch). This
      is the standard Spark pattern for small-diameter CC
      (large-star/small-star reduces to it when components are
      cliques). Both paths produce identical labels (pinned by
      tests/test_plans.py)."""
    from pyspark.storagelevel import StorageLevel

    disk = StorageLevel.MEMORY_AND_DISK
    # Persist the PAIRS, not the symmetric explode: union-find needs no
    # symmetrization, so the local regime collects half the rows and
    # skips the explode entirely; the distributed loop symmetrizes off
    # the persisted pairs (r13 — the 20M-doc probe showed the local
    # regime holds even there, 49k pairs, PROBE_R13_10X.json).
    pairs = (_minhash_pairs_unsorted(spark, sf_dir)
             .select("doc_a", "doc_b").persist(disk))
    n_pairs = pairs.count()             # materializes the persisted pairs

    if 2 * n_pairs <= _LOCAL_CC_MAX_EDGES:
        out = _local_cc_df(spark, [(r["doc_a"], r["doc_b"])
                                   for r in pairs.collect()])
        pairs.unpersist()
        return out

    sym = (pairs.select(F.explode(F.array(
                F.struct(F.col("doc_a"), F.col("doc_b")),
                F.struct(F.col("doc_b").alias("doc_a"),
                         F.col("doc_a").alias("doc_b")))).alias("e"))
           .select("e.doc_a", "e.doc_b"))
    labels = (sym.select(F.col("doc_a").alias("doc_id")).distinct()
              .withColumn("label", F.col("doc_id")).persist(disk))
    persisted = labels
    for rnd in range(20):
        nbr = (sym.join(labels.select(F.col("doc_id").alias("doc_b"), "label"),
                        "doc_b")
               .groupBy("doc_a").agg(F.min("label").alias("nbr_label")))
        cur = labels.join(nbr, labels["doc_id"] == nbr["doc_a"], "left")
        new_col = F.least(labels["label"],
                          F.coalesce(F.col("nbr_label"), labels["label"]))
        if rnd > 0:
            # path doubling: my label's current label. Label values are
            # node ids and `labels` is total over nodes, so the lookup
            # is total; a no-op in round 0 where label==doc_id, so the
            # hop join is skipped there.
            hop = labels.select(F.col("doc_id").alias("__lid"),
                                F.col("label").alias("hop_label"))
            cur = cur.join(hop, labels["label"] == hop["__lid"], "left")
            new_col = F.least(new_col,
                              F.coalesce(F.col("hop_label"), labels["label"]))
        # carry the old label so the convergence check is a filter over
        # THIS round's materialization — no extra old-vs-new join job
        new_p = (cur.select(labels["doc_id"],
                            labels["label"].alias("__old"),
                            new_col.alias("label"))
                 .persist(disk))
        changed = (new_p.filter(F.col("label") != F.col("__old"))
                   .limit(1).count())
        persisted.unpersist()
        persisted = new_p
        labels = new_p.select("doc_id", "label")
        if changed == 0:
            break
    out = (labels.select("doc_id", F.col("label").alias("cluster_id"),
                         (F.col("doc_id") == F.col("label"))
                         .alias("is_canonical"))
           .orderBy("cluster_id", "doc_id"))
    pairs.unpersist()
    return out


SQL_DEDUP_CLUSTER = f"""
WITH RECURSIVE pairs AS ({SQL_MINHASH_LSH_PAIRS}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(src, node) AS (
    SELECT a, a FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node)
SELECT src AS doc_id, min(node) AS cluster_id,
       src = min(node) AS is_canonical
FROM reach GROUP BY src ORDER BY cluster_id, doc_id
"""


_BM25_TERMS = ("spark", "window", "merge")
_BM25_K1, _BM25_B = 1.2, 0.75


def q_bm25_topk(spark, sf_dir):
    """BM25 relevance ranking of the corpus against a fixed term query
    — the retrieval/quality-scoring primitive of a data pipeline
    (Okapi BM25, k1=1.2 b=0.75, natural-log idf).

    Scale shape (r13: ONE corpus pass, was three): a persisted map-only
    projection keeps (doc_id, dl, query-term tokens) — tiny rows, no
    text — and every downstream branch (corpus stats, tf, document
    frequency) reads it instead of re-scanning and re-splitting the
    corpus. Only query-term tokens ever reach a shuffle; document
    frequency (3 rows) and the corpus stats (1 row) broadcast; nothing
    re-shuffles the documents table itself."""
    from pyspark.storagelevel import StorageLevel

    docs = _t(spark, sf_dir, "documents")
    terms_sql = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"
    base = _persist(docs.selectExpr(
        "doc_id",
        "transform(array(split(trim(lower(text)), '\\\\s+')), words -> "
        f"struct(size(words) AS dl, filter(words, w -> w IN {terms_sql}) "
        "AS qt))[0] AS w")
        .selectExpr("doc_id", "w.dl AS dl", "w.qt AS qt"),
        StorageLevel.MEMORY_AND_DISK)
    # tf feeds both dfreq and the scoring join but is NOT persisted:
    # both derivations read the persisted base (query-term rows only —
    # tiny), and an A/B showed persisting this post-shuffle aggregate
    # costs ~0.9 s in materialization barriers vs ~nothing saved
    # (OPTIMIZATION_r13.md, bm25 section).
    tf = (base.select("doc_id", "dl", F.explode("qt").alias("term"))
          .groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf")))
    stats = base.agg(F.count("*").alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0)
    k1, b = _BM25_K1, _BM25_B
    score = (idf * F.col("tf") * (k1 + 1)
             / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
    return (scored.groupBy("doc_id")
            .agg(F.round(F.sum(score), 4).alias("bm25"))
            .orderBy(F.col("bm25").desc(), "doc_id").limit(15))


SQL_BM25_TOPK = f"""
WITH toks AS (
    SELECT doc_id, len(words) AS dl, unnest(words) AS term
    FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS words
          FROM documents)
), tf AS (
    SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf FROM toks
    WHERE term IN {_BM25_TERMS!r}
    GROUP BY doc_id, dl, term
), stats AS (
    SELECT count(*) AS n_docs,
           avg(len(regexp_split_to_array(trim(lower(text)), '\\s+'))) AS avgdl
    FROM documents
), dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term)
SELECT doc_id,
       round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             * tf * ({_BM25_K1} + 1)
             / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))),
             4) AS bm25
FROM tf JOIN dfreq USING (term), stats
GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 15
"""


def q_asof_join(spark, sf_dir):
    """Point-in-time (as-of) join: each purchase matched to the latest
    click AT OR BEFORE it by the same user — the feature-attribution /
    backfill primitive Spark lacks as a built-in (DuckDB ships ASOF
    JOIN natively; that is the oracle twin).

    Scale shape: delegates to operators.joins.asof_join — ONE window
    pass over the tagged union (a single hash shuffle on user_id, no
    join operator, no range probe; see that module). At equal
    timestamps the right side sorts first, matching the oracle's
    ``p.ts >= c.ts`` inclusive bound. This registration puts the
    general operator itself under the driver's DuckDB-oracle gate."""
    from duckdb_otlp_spark.operators.joins import asof_join as _asof

    ev = _t(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts"))
    return (_asof(purchases, clicks, on="user_id")
            .select("event_id", "user_id", "ts",
                    F.col("ts_right").alias("click_ts"),
                    F.expr("timestampdiff(MICROSECOND, ts_right, ts)")
                    .alias("gap_us"))
            .orderBy("event_id"))


SQL_ASOF_JOIN = """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts,
       date_diff('microseconds', c.ts, p.ts) AS gap_us
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


def _grams5_sql(c: str = "text") -> str:
    """Distinct word 5-gram shingles as a SQL expression string; empty
    array below 5 words. The split stays let-bound once via the
    transform-over-one-element-array form (see _bind1's O(L^2) trap),
    and the single F.expr parse replaces a ~32 ms py4j Column tree
    (PROBE_R13_DRIVER.json:expr_build) — the parsed tree is identical,
    so the gram sets (and everything hashed from them) are unchanged."""
    return _distinct_ngrams_sql(c, 5)


def q_contamination_overlap(spark, sf_dir):
    """Train/eval contamination check: fraction of each training doc's
    distinct word 5-grams that also appear in the held-out eval split
    (doc_id % 17 == 0) — the benchmark-leakage audit every pretraining
    corpus needs; top 25 most-contaminated docs.

    Scale shape: the eval side reduces to a DISTINCT gram set (a small
    fraction of the corpus' distinct grams), and the train side joins
    against it — an equi-join AQE can broadcast when the eval set is
    small, a plain hash join otherwise. The per-doc rollup is a
    partial-aggregated groupBy on doc_id. The shingle projection
    persists so eval and train branches shingle once.

    The join key is the md5-derived 60-bit HASH of the gram, not the
    gram string (r10 scale probe): the shuffle moves O(corpus gram
    instances) rows, and hashing cuts each from ~38 B (doc_id + ~29-char
    gram) to 16 B of fixed-width longs — at 20M docs that is the
    difference between ~45 GB and ~18 GB of shuffle, which decided
    whether the op fit this box's spill disk at all. Both engines
    compute the IDENTICAL hash (the _SQL_MD5INT pattern every minhash
    twin already uses), so any hash collision produces the same
    (deterministic) count on both sides and the oracle stays
    value-exact; a collision inflates one n_hit by 1 with probability
    ~2^-60 per (train-gram, eval-gram) pair — noise far below any
    contamination threshold.

    The PERSISTED projection is hashed too (r11): caching the gram
    STRING arrays (~6 KB/doc) was the same cache-evict cliff the
    minhash family hit at the 20M-doc tier — the long arrays are ~4x
    smaller, transform preserves array length so n_grams (the distinct
    string-gram count) is unchanged, and the twin hashes inside its
    own sh CTE identically."""
    from pyspark.storagelevel import StorageLevel

    docs = _docs_parallel(spark, sf_dir)
    sh = _persist(docs.selectExpr(
        "doc_id",
        f"transform({_grams5_sql('text')}, g -> {_MD5INT_SQL % 'g'}) AS ghs"),
        StorageLevel.MEMORY_AND_DISK)
    # Two-branch shape kept DELIBERATELY (r13 negative result): fusing
    # totals into the hits aggregation via explode + left join + one
    # groupBy reads as one fewer join, but it routes EVERY gram
    # instance through the aggregation hash table where this shape
    # aggregates only join matches and computes totals as a map-only
    # size() — measured 0.95 s -> 1.32 s at sf0.1 on clean brackets,
    # reverted (OPTIMIZATION_r13.md).
    is_eval = F.col("doc_id") % 17 == 0
    eval_grams = (sh.filter(is_eval)
                  .select(F.explode("ghs").alias("gh")).distinct())
    train = sh.filter(~is_eval)
    totals = (train.select("doc_id", F.size("ghs").alias("n_grams"))
              .filter(F.col("n_grams") > 0))
    hits = (train.select("doc_id", F.explode("ghs").alias("gh"))
            .join(eval_grams, "gh")
            .groupBy("doc_id").agg(F.count("*").alias("n_hit")))
    return (totals.join(hits, "doc_id", "left")
            .select("doc_id", "n_grams",
                    F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
                    F.round(F.coalesce(F.col("n_hit"), F.lit(0))
                            / F.col("n_grams"), 4).alias("overlap_frac"))
            .orderBy(F.col("overlap_frac").desc(), "doc_id")
            .limit(25))


SQL_CONTAMINATION_OVERLAP = f"""
WITH sh AS (
    SELECT doc_id,
           list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                          || ' ' || words[i+3] || ' ' || words[i+4]
                          for i in range(1, len(words) - 3)]) AS grams
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
          FROM documents)),
eval_grams AS (
    SELECT DISTINCT {_SQL_MD5INT % 'g'} AS gh
    FROM (SELECT unnest(grams) AS g FROM sh WHERE doc_id % 17 = 0)),
train AS (
    SELECT doc_id, {_SQL_MD5INT % 'g'} AS gh
    FROM (SELECT doc_id, unnest(grams) AS g FROM sh
          WHERE doc_id % 17 <> 0)),
hits AS (
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hit
    FROM train t JOIN eval_grams e ON t.gh = e.gh GROUP BY t.doc_id),
totals AS (
    SELECT doc_id, len(grams) AS n_grams FROM sh
    WHERE doc_id % 17 <> 0 AND len(grams) > 0)
SELECT totals.doc_id, totals.n_grams,
       coalesce(n_hit, 0) AS n_hit,
       round(CAST(coalesce(n_hit, 0) AS DOUBLE) / n_grams, 4) AS overlap_frac
FROM totals LEFT JOIN hits ON totals.doc_id = hits.doc_id
ORDER BY overlap_frac DESC, totals.doc_id LIMIT 25
"""


def q_repetition_ratio(spark, sf_dir):
    """Within-document repetition: fraction of word 3-grams that are
    duplicates of an earlier gram in the SAME doc — the Gopher-style
    'repetitive doc' quality filter (boilerplate, keyword stuffing,
    degenerate generations).

    Scale shape: pure map-only column expressions (split / transform /
    array_distinct) — no data-dependent shuffle, scales linearly with
    the corpus and composes under any downstream filter. The scan goes
    through _docs_parallel: gram-building is CPU-bound, so the local
    one-file-one-split case must still fan out across cores."""
    docs = _docs_parallel(spark, sf_dir)
    # split bound once per gram build (shared _words_bound_sql binding —
    # the inlined form re-evaluates split per gram, O(L^2) per doc), and
    # the gram array materialized through a PROJECTION boundary so the
    # three consumers read one computed column instead of re-running the
    # build per output expression (CollapseProject keeps the boundary:
    # the alias is expensive and referenced more than once). Duplicates
    # KEPT (that is the measurement), so no array_distinct here.
    grams_sql = _words_bound_sql("text", _ngrams_sql(3))
    return (docs.filter(F.expr("size(split(trim(text), '\\\\s+')) >= 3"))
            .selectExpr("doc_id", f"{grams_sql} AS grams")
            .selectExpr("doc_id", "size(grams) AS n_grams",
                        "size(grams) - size(array_distinct(grams)) AS n_dup",
                        "round((size(grams) - size(array_distinct(grams))) "
                        "/ size(grams), 4) AS dup_frac")
            .orderBy("doc_id"))


SQL_REPETITION_RATIO = """
WITH g AS (
    SELECT doc_id,
           [words[i] || ' ' || words[i+1] || ' ' || words[i+2]
            for i in range(1, len(words) - 1)] AS grams
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
          FROM documents)
    WHERE len(words) >= 3)
SELECT doc_id, len(grams) AS n_grams,
       len(grams) - len(list_distinct(grams)) AS n_dup,
       round(CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
             / len(grams), 4) AS dup_frac
FROM g ORDER BY doc_id
"""


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary statistics: top-50 terms by total frequency
    with document frequency — the tokenizer-training / stopword-mining
    pass over a pretraining corpus.

    Scale shape: explode then ONE groupBy on the term — count() partial
    -aggregates map-side, and count(DISTINCT doc_id) expands to the
    standard two-phase distinct aggregate, both shuffling only (term,
    doc_id) pairs, never the text."""
    docs = _t(spark, sf_dir, "documents")
    term = F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    return (docs.select("doc_id", term.alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("tf"),
                 F.countDistinct("doc_id").alias("df"))
            .orderBy(F.col("tf").desc(), "term")
            .limit(50))


SQL_VOCAB_TOPK = """
SELECT term, CAST(count(*) AS BIGINT) AS tf,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
      FROM documents)
GROUP BY term ORDER BY tf DESC, term LIMIT 50
"""


def q_token_budget(spark, sf_dir):
    """Training-budget accounting: total/avg whitespace tokens and doc
    counts per (lang, source) — the rollup that decides how much of
    each slice a training mix can draw.

    Scale shape: map-side token counting (size of split — the text
    never shuffles), then ONE partial-aggregated groupBy on two
    low-cardinality keys."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (docs.select("lang", "source", n_tok.alias("n"))
            .groupBy("lang", "source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n").alias("total_tokens"),
                 F.round(F.avg("n"), 4).alias("avg_tokens"))
            .orderBy("lang", "source"))


SQL_TOKEN_BUDGET = """
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS total_tokens,
       round(avg(len(regexp_split_to_array(trim(text), '\\s+'))), 4)
           AS avg_tokens
FROM documents GROUP BY lang, source ORDER BY lang, source
"""


def q_split_assign(spark, sf_dir):
    """Deterministic train/val/test split assignment: md5(doc_id) % 1000
    buckets into 98/1/1 — reproducible across engines, partitionings,
    and reruns (no RNG state), the property a training pipeline needs
    so a doc never migrates between splits. Returns the per-split
    rollup plus a boundary sample of assignments.

    Scale shape: map-only hash + one low-cardinality groupBy."""
    docs = _t(spark, sf_dir, "documents")
    bucket = _md5int(F.col("doc_id").cast("string")) % 1000
    split = (F.when(bucket < 980, "train")
             .when(bucket < 990, "val").otherwise("test"))
    return (docs.select(split.alias("split"),
                        F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n").alias("n_tokens"))
            .orderBy("split"))


SQL_SPLIT_ASSIGN = f"""
SELECT CASE WHEN b < 980 THEN 'train' WHEN b < 990 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS n_tokens
FROM (SELECT {_SQL_MD5INT % 'CAST(doc_id AS VARCHAR)'} % 1000 AS b, text
      FROM documents)
GROUP BY split ORDER BY split
"""


def q_sequence_pack(spark, sf_dir):
    """Sequence packing: greedily fill fixed 2048-token training
    sequences with whole documents, in deterministic doc_id order
    WITHIN md5-hash shards — the pack-documents-into-context-windows
    step before pretraining. Output: each doc's (shard, seq_id) plus
    its token count; seq_id = which window the doc's cumulative start
    falls into (contiguous-fill packing).

    Scale shape: packing is embarrassingly parallel across shards BY
    DESIGN (a global-order cumsum would be a single-task window — the
    anti-pattern this shape exists to avoid): the window partitions by
    the 32-way hash shard, so each shard's running sum is an
    independent task and adding shards scales out. The shard hash is
    md5-derived so the DuckDB oracle recomputes identical packing."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    shard = _md5int(F.col("doc_id").cast("string")) % 32
    t = docs.select("doc_id", shard.alias("shard"), n_tok.alias("n_tokens"))
    return pack_contiguous(t)


def pack_contiguous(t, seq_len: int = 2048):
    """Contiguous-fill packing over any (doc_id, shard, n_tokens)
    DataFrame — the per-shard cumsum-window core of q_sequence_pack,
    exposed so the hypothesis suite (tests/test_pack_shuffle_properties)
    can drive it on generated populations."""
    w = (W.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return (t.select("doc_id", "shard", "n_tokens",
                     F.floor(start / seq_len).cast("long").alias("seq_id"),
                     (start % seq_len).cast("long").alias("offset_in_seq"))
            .orderBy("shard", "doc_id"))


SQL_SEQUENCE_PACK = f"""
SELECT doc_id, shard, n_tokens,
       CAST(floor(start / 2048) AS BIGINT) AS seq_id,
       CAST(start % 2048 AS BIGINT) AS offset_in_seq
FROM (SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS start
      FROM (SELECT doc_id,
                   {_SQL_MD5INT % 'CAST(doc_id AS VARCHAR)'} % 32 AS shard,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
            FROM documents WHERE doc_id < 2000))
ORDER BY shard, doc_id
"""


_PACK_SEQ_LEN = 2048


def q_sequence_pack_nostraddle(spark, sf_dir):
    """No-straddle (next-fit) sequence packing: whole documents fill
    fixed 2048-token training sequences and a document that does not
    fit in the current window's remainder opens a NEW window instead of
    straddling the boundary — so no document silently spans two context
    windows (the contiguous-fill entry above is the straddling twin).
    A document longer than the window gets a window of its own, marked
    full, for the trainer to truncate.  Emits (shard, seq_id,
    offset_in_seq) per doc.

    Scale shape: next-fit is a per-shard sequential scan BY NATURE (the
    fill state resets on overflow — not a plain window cumsum), so it
    runs as applyInPandas over the md5 shard: ONE shuffle on the shard
    key, O(1) state per shard, and only (doc_id, shard, n_tokens) cross
    the Python boundary — the text column is tokenized JVM-side and
    never shipped.  Adding shards scales out; the 32 here matches the
    contiguous twin.  Oracle: DuckDB recursive CTE replays the same
    recurrence."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    shard = _md5int(F.col("doc_id").cast("string")) % 32
    t = docs.select("doc_id", shard.alias("shard"), n_tok.alias("n_tokens"))
    return pack_nostraddle(t)


def pack_nostraddle(t, seq_len: int = _PACK_SEQ_LEN):
    """Next-fit no-straddle packing over any (doc_id, shard, n_tokens)
    DataFrame — the applyInPandas core of q_sequence_pack_nostraddle,
    exposed so the hypothesis suite (tests/test_pack_shuffle_properties)
    can drive it on generated populations."""
    def pack(pdf):
        pdf = pdf.sort_values("doc_id", ignore_index=True)
        seq = fill = 0
        seqs, offs = [], []
        for i, n in enumerate(pdf["n_tokens"]):
            n = int(n)
            if i == 0:
                seqs.append(0)
                offs.append(0)
            elif fill + n <= seq_len:
                seqs.append(seq)
                offs.append(fill)
                fill += n
                continue
            else:
                seq += 1
                seqs.append(seq)
                offs.append(0)
            fill = seq_len if n >= seq_len else n
        pdf["seq_id"] = seqs
        pdf["offset_in_seq"] = offs
        return pdf

    out = t.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard long, n_tokens int, "
              "seq_id long, offset_in_seq long")
    return (out.select("doc_id", "shard", "n_tokens", "seq_id",
                       "offset_in_seq")
            .orderBy("shard", "doc_id"))


def sql_pack_nostraddle_over(base_sql: str,
                             seq_len: int = _PACK_SEQ_LEN) -> str:
    """DuckDB recursive-CTE replay of the next-fit recurrence over any
    (doc_id, shard, n_tokens) base subquery — the oracle twin for
    pack_nostraddle, reused by the hypothesis suite on generated
    populations (tests/test_pack_shuffle_properties)."""
    return f"""
WITH RECURSIVE base AS (
    SELECT doc_id, shard, n_tokens,
           row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
    FROM ({base_sql})),
pack AS (
    SELECT shard, rn, doc_id, n_tokens,
           CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS offset_in_seq,
           CASE WHEN n_tokens >= {seq_len} THEN {seq_len}
                ELSE n_tokens END AS fill
    FROM base WHERE rn = 1
    UNION ALL
    SELECT b.shard, b.rn, b.doc_id, b.n_tokens,
           CASE WHEN p.fill + b.n_tokens <= {seq_len}
                THEN p.seq_id ELSE p.seq_id + 1 END,
           CASE WHEN p.fill + b.n_tokens <= {seq_len}
                THEN p.fill ELSE 0 END,
           CASE WHEN p.fill + b.n_tokens <= {seq_len}
                THEN p.fill + b.n_tokens
                WHEN b.n_tokens >= {seq_len} THEN {seq_len}
                ELSE b.n_tokens END
    FROM pack p JOIN base b ON b.shard = p.shard AND b.rn = p.rn + 1)
SELECT doc_id, shard, n_tokens, seq_id, offset_in_seq
FROM pack ORDER BY shard, doc_id
"""


SQL_SEQUENCE_PACK_NOSTRADDLE = sql_pack_nostraddle_over(f"""
    SELECT doc_id,
           {_SQL_MD5INT % 'CAST(doc_id AS VARCHAR)'} % 32 AS shard,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT)
               AS n_tokens
    FROM documents WHERE doc_id < 2000""")


def q_feature_hash(spark, sf_dir):
    """Hashing-trick document vectorization (feature hashing): each
    token maps to bucket md5(token) % 64 and the per-doc bucket counts
    are the sparse TF vector — the classic linear-model/embedding-free
    featurizer for corpus-scale text. Output is the sparse COO form
    (doc_id, bucket, weight), the join-friendly shape downstream
    trainers consume.

    Scale shape: explode -> map-side bucket hash -> ONE partial-
    aggregated groupBy on (doc_id, bucket); the text never shuffles
    (only (doc_id, bucket) pairs do) and the hash is md5-derived so the
    DuckDB oracle recomputes the identical vectors."""
    docs = _docs_parallel(spark, sf_dir)
    tok = (docs.filter(F.col("doc_id") < 300)
           .select("doc_id",
                   F.explode(F.split(F.trim(F.col("text")), r"\s+"))
                   .alias("tok"))
           .filter(F.col("tok") != ""))
    return (tok.withColumn("bucket", _md5int(F.col("tok")) % 64)
            .groupBy("doc_id", "bucket")
            .agg(F.count("*").alias("weight"))
            .orderBy("doc_id", "bucket"))


SQL_FEATURE_HASH = f"""
SELECT doc_id, {_SQL_MD5INT % 'tok'} % 64 AS bucket,
       CAST(count(*) AS BIGINT) AS weight
FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents WHERE doc_id < 300)
WHERE tok <> ''
GROUP BY doc_id, bucket ORDER BY doc_id, bucket
"""


_SOURCE_CAP = 15


def q_source_cap(spark, sf_dir):
    """Per-source document cap: keep at most 15 docs per source,
    preferring longer documents (n_chars DESC, doc_id tiebreak) — the
    web-curation step that stops a single crawled domain from
    dominating the training mix.  Output: the kept docs with their
    within-source rank.

    Scale shape: ONE source-hash exchange shared by the row_number
    window and nothing else — text never enters the shuffle (only
    doc_id/source/n_chars are selected before the exchange).  Source
    skew (one domain with millions of docs) is bounded by the cap
    itself at output time; at ingest the rank window for a hot source
    is a single task, so a truly degenerate source would call for the
    same two-phase per-shard pre-cap used by sequence packing — at the
    testdata's source cardinality the single window is the right plan."""
    docs = _t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    return (docs.select("doc_id", "source", "n_chars")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _SOURCE_CAP)
            .orderBy("source", "rk"))


SQL_SOURCE_CAP = f"""
SELECT doc_id, source, n_chars, rk FROM (
    SELECT doc_id, source, n_chars,
           CAST(row_number() OVER (PARTITION BY source
                                   ORDER BY n_chars DESC, doc_id) AS BIGINT)
               AS rk
    FROM documents)
WHERE rk <= {_SOURCE_CAP}
ORDER BY source, rk
"""


_SHUFFLE_SEED = "shuf42:"
_SHUFFLE_BUCKETS_LOG2 = 5          # 32 radix buckets


def q_corpus_shuffle(spark, sf_dir):
    """Deterministic global corpus shuffle: every doc gets its position
    under the seeded pseudo-random permutation ORDER BY
    md5(seed || doc_id) — the fixed training-order shuffle a data
    pipeline materializes once so every epoch / resume / re-run reads
    the same order.

    Scale shape — global enumeration WITHOUT a global-order window
    (row_number over a global ORDER BY is a single task — the
    anti-pattern): the 60-bit md5 sort key is uniform, so its top 5
    bits are 32 equal-width ORDERED range buckets (radix partitioning
    — no range-sampling pass, fully deterministic).  Position = (sum of
    lower buckets' counts) + row_number within the bucket: the
    per-bucket window is parallel, and the bucket offsets come from a
    cumulative sum over the 32-row bucket-count aggregate — that tiny
    global-order window runs on 32 rows, not the corpus, and the
    whole thing is ONE plan (no driver collect, no build-time job —
    the ann_ivf_topk lesson).  Adding buckets scales out; the oracle
    recomputes the identical permutation as one ROW_NUMBER."""
    return corpus_shuffle_positions(_t(spark, sf_dir, "documents"))


def corpus_shuffle_positions(docs, seed: str = _SHUFFLE_SEED):
    """The radix-enumeration core of q_corpus_shuffle over any
    DataFrame with a doc_id column — exposed so the hypothesis suite
    (tests/test_pack_shuffle_properties) can assert bijectivity and
    repartitioning-determinism on generated id populations."""
    key = _md5int(F.concat(F.lit(seed),
                           F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", key.alias("key")).withColumn(
        "bucket", F.shiftright("key", 60 - _SHUFFLE_BUCKETS_LOG2))
    w_off = (W.orderBy("bucket")
             .rowsBetween(W.unboundedPreceding, -1))
    offsets = (keyed.groupBy("bucket").agg(F.count("*").alias("n"))
               .select("bucket",
                       F.coalesce(F.sum("n").over(w_off), F.lit(0))
                       .alias("offset")))
    w = W.partitionBy("bucket").orderBy("key", "doc_id")
    return (keyed.join(F.broadcast(offsets), "bucket")
            .select("doc_id",
                    (F.col("offset") + F.row_number().over(w) - 1)
                    .alias("pos"))
            .orderBy("pos"))


_SQL_SHUFFLE_KEY = _SQL_MD5INT % (
    f"'{_SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR)")
SQL_CORPUS_SHUFFLE = f"""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY k, doc_id) - 1 AS BIGINT) AS pos
FROM (SELECT doc_id, {_SQL_SHUFFLE_KEY} AS k FROM documents)
ORDER BY pos
"""


def _incr_docs_bands(spark, sf_dir):
    """Shared pieces of the incremental-dedup family: the hashed-shingle
    corpus+batch (persisted — feeds both banding and Jaccard verify;
    primitive long sets, ~7x smaller than the string shingle arrays
    that hit the r10 20M-doc cache-evict cliff) and the exploded band
    keys (doc_id, in_corpus, band_idx, key)."""
    from pyspark.storagelevel import StorageLevel

    disk = StorageLevel.MEMORY_AND_DISK
    docs = _docs_parallel(spark, sf_dir)
    in_corpus = _md5int(F.col("doc_id").cast("string")) % 10 < 8
    docs_hs = _persist(docs.select(
        "doc_id", in_corpus.alias("in_corpus"),
        F.array_distinct(_base_hashes())
        .alias("hs")),
        disk)
    # sub-shingle docs (under 3 words) have EMPTY shingle sets: their
    # minhashes are all null and concat_ws renders the same '' key for
    # every one of them, so banding them makes all short docs mutual
    # candidates (quadratic blowup, verified-false anyway — their
    # Jaccard is null). Keep them out of the band stream entirely; the
    # verdict still covers them (is_dup=false via the left join).
    sig = (docs_hs.filter(F.size("hs") > 0)
           .select("doc_id", "in_corpus", *_minhash_cols("hs")))
    bands = _persist(_incr_bands_from_sig(sig, extra=("in_corpus",)), disk)
    return docs_hs, bands


# the incremental-dedup band family: _MINHASH_K minhashes grouped in
# bands of 2 — ONE definition shared by both batch variants, the
# persisted index, and the streaming screen (a drifted copy would
# compute keys that never match the index)
INCR_BANDS = _MINHASH_K // 2


def incr_band_key(b: int, col_name=lambda i: f"m{i}"):
    """The band-b key expression over minhash columns named by
    ``col_name`` (the streaming screen uses prefixed temp names)."""
    return F.concat_ws("_", col_name(2 * b), col_name(2 * b + 1))


def _incr_bands_from_sig(sig, extra: tuple[str, ...] = ()):
    """Explode a 6-minhash signature frame (m0..m5 columns) into the
    3-band (band_idx, key) rows both incremental-dedup variants and the
    persisted index share."""
    return (sig.select(
        "doc_id", *extra,
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_idx"),
                     incr_band_key(b).alias("key"))
            for b in range(INCR_BANDS)])).alias("band"))
        .select("doc_id", *extra, "band.band_idx", "band.key"))


def build_incremental_band_index(spark, sf_dir):
    """The corpus side of the incremental-dedup band index as
    (band_idx, key, corpus_doc) — keys only, no text. Feed to
    operators.dedup.save_band_index to make the persistence executable
    (bucketed+sorted external table; the probe then reads the index
    with NO exchange — see dedup_incremental_from_index).

    Bands ONLY the corpus-filtered docs, with no persist: the build is
    a single pass straight into the index writer — banding the batch
    too (and pinning corpus-scale frames in cache) was an r8 review
    finding."""
    docs = _docs_parallel(spark, sf_dir)
    in_corpus = _md5int(F.col("doc_id").cast("string")) % 10 < 8
    # size > 0 filter: sub-shingle docs would all share the '' key of
    # null minhashes (see _incr_docs_bands) — never index them
    sig = (docs.filter(in_corpus)
           .select("doc_id",
                   _base_hashes().alias("hs"))
           .filter(F.size("hs") > 0)
           .select("doc_id", *_minhash_cols("hs")))
    return (_incr_bands_from_sig(sig)
            .select("band_idx", "key", F.col("doc_id").alias("corpus_doc")))


def _incr_verdict(batch_sh, corpus_sh, cand):
    """Jaccard-verify candidate (batch_doc, corpus_doc) pairs and emit
    every batch doc with its is_dup verdict. ``batch_sh`` carries
    (batch_doc, sh_a), ``corpus_sh`` (corpus_doc, sh_b) — the variants
    differ only in where those shingles come from (in-query: the shared
    persisted frame; from-index: batch-only shingles + post-candidate
    corpus shingling), so the verify/verdict shape lives in exactly one
    place (parity pinned in tests/test_band_index.py)."""
    jac = (F.size(F.array_intersect("sh_a", "sh_b"))
           / F.size(F.array_union("sh_a", "sh_b")))
    dup_ids = (cand
               .join(batch_sh, "batch_doc")
               .join(corpus_sh, "corpus_doc")
               .filter(jac >= 0.7)
               .select(F.col("batch_doc").alias("doc_id")).distinct())
    return (batch_sh.select(F.col("batch_doc").alias("doc_id"))
            .join(dup_ids.withColumn("dup", F.lit(True)), "doc_id", "left")
            .select("doc_id", F.coalesce("dup", F.lit(False)).alias("is_dup"))
            .orderBy("doc_id"))


def q_dedup_incremental(spark, sf_dir):
    """Incremental (cross-corpus) near-dedup: screen a NEW batch of
    documents against an already-indexed corpus — the steady-state
    shape of a production dedup pipeline, where each crawl increment
    is checked against the accumulated index instead of re-running
    all-pairs dedup over everything.  Corpus = docs with
    md5(doc_id)%10 < 8; batch = the rest.  A batch doc is a duplicate
    when an LSH band matches an indexed doc AND exact Jaccard >= 0.7
    confirms.  Output: every batch doc with its verdict.

    Scale shape: the index is the corpus's banded MinHash signatures
    ONLY — (band_idx, key, doc_id), no text. This oracle-twinned entry
    computes the index in-query so DuckDB can replay it; the EXECUTABLE
    persisted form is build_incremental_band_index +
    operators.dedup.save_band_index (bucketed+sorted on (band_idx, key))
    probed by dedup_incremental_from_index, whose sort-merge probe reads
    the index with no exchange and no sort (pinned, parity-tested in
    tests/test_band_index.py). Candidates are keys-only; exact-Jaccard
    verification shingles join by doc_id AFTER candidate pruning, so
    corpus text is touched only for the handful of candidate partners.
    The batch side is orders of magnitude smaller than the corpus —
    AQE broadcasts it."""
    docs_hs, bands = _incr_docs_bands(spark, sf_dir)
    cand = (bands.filter(~F.col("in_corpus"))
            .select(F.col("doc_id").alias("batch_doc"), "band_idx", "key")
            .join(bands.filter("in_corpus")
                  .select(F.col("doc_id").alias("corpus_doc"),
                          "band_idx", "key"),
                  ["band_idx", "key"])
            .select("batch_doc", "corpus_doc").distinct())
    return _incr_verdict(
        docs_hs.filter(~F.col("in_corpus"))
        .select(F.col("doc_id").alias("batch_doc"), F.col("hs").alias("sh_a")),
        docs_hs.select(F.col("doc_id").alias("corpus_doc"),
                       F.col("hs").alias("sh_b")),
        cand)


def dedup_incremental_from_index(spark, sf_dir, index):
    """q_dedup_incremental's steady-state twin: probe a LOADED persisted
    band index (operators.dedup.load_band_index) instead of recomputing
    the corpus bands in-query. Candidate generation joins the batch's
    band keys against the index on (band_idx, key); because the index
    table is bucketed+sorted on exactly those keys, the index side of
    the sort-merge probe plans with NO exchange and NO sort — only the
    increment shuffles.

    The steady-state cost model is enforced, not just described: ONLY
    the batch is shingled/MinHashed/banded (the corpus banding lives in
    the persisted index), and corpus text is shingled AFTER candidate
    pruning — the candidate ids join to the raw documents first, so a
    100 TB corpus contributes only its candidate partners to the
    Jaccard verify (pinned by tests/test_band_index.py: exactly one
    corpus-membership predicate in the plan, the NEGATED batch filter).
    Verdicts are value-identical to the in-query variant (parity
    test)."""
    from pyspark.storagelevel import StorageLevel

    docs = _docs_parallel(spark, sf_dir)
    in_corpus = _md5int(F.col("doc_id").cast("string")) % 10 < 8
    batch_hs = _persist(docs.filter(~in_corpus)
                        .select("doc_id",
                                F.array_distinct(
                                    _base_hashes())
                                .alias("hs")),
                        StorageLevel.MEMORY_AND_DISK)
    sig = (batch_hs.filter(F.size("hs") > 0)
           .select("doc_id", *_minhash_cols("hs")))
    bands = _incr_bands_from_sig(sig)
    cand = (bands.select(F.col("doc_id").alias("batch_doc"),
                         "band_idx", "key")
            .join(index, ["band_idx", "key"])
            .select("batch_doc", "corpus_doc").distinct())
    corpus_hs = (cand.select("corpus_doc").distinct()
                 .join(docs.select(F.col("doc_id").alias("corpus_doc"),
                                   "text"), "corpus_doc")
                 .select("corpus_doc",
                         F.array_distinct(
                             _base_hashes())
                         .alias("sh_b")))
    return _incr_verdict(
        batch_hs.select(F.col("doc_id").alias("batch_doc"),
                        F.col("hs").alias("sh_a")),
        corpus_hs, cand)


SQL_DEDUP_INCREMENTAL = f"""
WITH sh AS ({_SQL_SHINGLES}),
tagged AS (
    SELECT doc_id, sh,
           {_SQL_MD5INT % 'CAST(doc_id AS VARCHAR)'} % 10 < 8 AS in_corpus
    FROM sh),
h AS (SELECT doc_id, in_corpus, list_distinct({_SQL_BASE_HASHES}) AS hs
      FROM tagged),
m AS (SELECT doc_id, in_corpus, hs, {_SQL_MINHASH_LIST} FROM h),
bands AS (
    SELECT doc_id, in_corpus, i AS band_idx,
           CASE i WHEN 0 THEN m0 || '_' || m1
                  WHEN 1 THEN m2 || '_' || m3
                  ELSE m4 || '_' || m5 END AS key
    FROM m, range(3) t(i)),
cand AS (
    SELECT DISTINCT a.doc_id AS batch_doc, b.doc_id AS corpus_doc
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.key = b.key
     AND NOT a.in_corpus AND b.in_corpus),
dups AS (
    SELECT DISTINCT batch_doc AS doc_id
    FROM cand
    JOIN m sa ON sa.doc_id = batch_doc
    JOIN m sb ON sb.doc_id = corpus_doc
    WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.hs, sb.hs))) >= 0.7)
SELECT t.doc_id, EXISTS (SELECT 1 FROM dups d WHERE d.doc_id = t.doc_id)
           AS is_dup
FROM tagged t WHERE NOT in_corpus
ORDER BY doc_id
"""


def q_pii_scrub(spark, sf_dir):
    """PII scrubbing audit: plant deterministic PII (email + IPv4 for
    every doc, SSN for doc_id%3==0, phone for doc_id%4==0) into the
    corpus text, then run operators.text.pii_scrub / pii_counts and
    report the per-category counts plus the scrubbed length.  The
    synthetic corpus carries no real PII, so the plant makes the
    redaction VALUE-checkable instead of vacuously zero; the patterns
    use the Java/RE2-common regex subset so the DuckDB oracle re-runs
    them verbatim (operators/text.py:PII_PATTERNS).

    Scale shape: map-only chained regexp_replace + regexp_extract_all
    counts — no shuffle, no Python; composes with the curation
    pipeline's fused predicate pass."""
    from duckdb_otlp_spark.operators.text import pii_counts, pii_scrub

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.lit(" user"), did.cast("string"), F.lit("@example.com"),
        F.lit(" 10.0."), (did % 256).cast("string"), F.lit(".7"),
        F.when(did % 3 == 0, F.lit(" 123-45-6789")).otherwise(F.lit("")),
        F.when(did % 4 == 0, F.lit(" +1 555-123-4567")).otherwise(F.lit("")))
    counts = pii_counts(planted)
    return (docs.select(
        "doc_id",
        *[counts[c].cast("long").alias(f"pii_{c}")
          for c in ("email", "phone", "ipv4", "ssn")],
        F.length(pii_scrub(planted)).cast("long").alias("scrubbed_len"))
        .orderBy("doc_id"))


def _sql_pii(planted: str) -> str:
    from duckdb_otlp_spark.operators.text import (PII_PATTERNS,
                                                  PII_SCRUB_ORDER)

    def esc(p: str) -> str:
        return p.replace("'", "''")

    # Mirror pii_counts exactly: each category counted on the text AFTER
    # higher-priority categories were replaced (progressive scrub), so
    # counts equal actual redactions even for overlapping patterns.
    count_exprs: dict[str, str] = {}
    scrub = planted
    for c in PII_SCRUB_ORDER:
        pat, rep = PII_PATTERNS[c]
        count_exprs[c] = (
            f"CAST(len(regexp_extract_all({scrub}, '{esc(pat)}')) "
            f"AS BIGINT) AS pii_{c}")
        scrub = f"regexp_replace({scrub}, '{esc(pat)}', '{rep}', 'g')"
    counts = ", ".join(count_exprs[c]
                       for c in ("email", "phone", "ipv4", "ssn"))
    return (f"SELECT doc_id, {counts}, CAST(len({scrub}) AS BIGINT) "
            f"AS scrubbed_len FROM documents ORDER BY doc_id")


SQL_PII_SCRUB = _sql_pii(
    "(text || ' user' || CAST(doc_id AS VARCHAR) || '@example.com'"
    " || ' 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
    " || CASE WHEN doc_id % 3 = 0 THEN ' 123-45-6789' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' +1 555-123-4567' ELSE '' END)")


def q_source_mix_weights(spark, sf_dir):
    """Temperature-based training-mix weights: per source, the sampling
    weight w_s = sqrt(tokens_s) / sum_s sqrt(tokens_s) (temperature
    alpha = 0.5 — the standard up-weight-the-tail move for multilingual
    / multi-source pretraining mixes) plus the per-source repeat factor
    ("epochs") a 10M-token budget implies.  This is the table a data
    pipeline materializes to drive its sampler.

    alpha = 0.5 deliberately: sqrt is correctly rounded under IEEE 754
    in both engines (pow is only within 1 ulp on the JVM), so the twin
    computation is bit-identical before the presentation rounding.

    Scale shape: map-side token count → ONE low-cardinality groupBy
    (sources, not docs); the corpus-total normalizer is a window over
    the per-source aggregate (O(sources) rows, like corpus_shuffle's
    32-row cumsum), so the corpus is touched exactly once and text
    never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    per_src = (docs.select("source", n_tok.alias("n"))
               .groupBy("source")
               .agg(F.count("*").alias("n_docs"),
                    F.sum("n").cast("long").alias("n_tokens")))
    w_all = W.partitionBy()
    scaled = F.sqrt(F.col("n_tokens").cast("double"))
    out = per_src.select(
        "source", "n_docs", "n_tokens",
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(w_all), 6)
        .alias("raw_share"),
        F.round(scaled / F.sum(scaled).over(w_all), 6).alias("mix_weight"),
        F.round(scaled / F.sum(scaled).over(w_all)
                * 10_000_000 / F.col("n_tokens"), 6).alias("epochs_at_10m"))
    return out.orderBy("source")


SQL_SOURCE_MIX_WEIGHTS = """
WITH per_src AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
                AS BIGINT) AS n_tokens
    FROM documents GROUP BY source)
SELECT source, n_docs, n_tokens,
       round(n_tokens / sum(n_tokens) OVER (), 6) AS raw_share,
       round(sqrt(CAST(n_tokens AS DOUBLE))
             / sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER (), 6) AS mix_weight,
       round(sqrt(CAST(n_tokens AS DOUBLE))
             / sum(sqrt(CAST(n_tokens AS DOUBLE))) OVER ()
             * 10000000 / n_tokens, 6) AS epochs_at_10m
FROM per_src ORDER BY source
"""


def q_length_buckets(spark, sf_dir):
    """Length-bucket curriculum stats: docs grouped into power-of-two
    token-length buckets (bucket = floor(log2(n_tokens)) computed via
    integer bit length — never floating log, whose boundary values
    differ across engines), with per-bucket doc/token counts and the
    corpus share — the table behind length-curriculum batch schedules
    and padding-efficiency analyses (batching docs of similar length
    wastes the least padding).

    Scale shape: bucket id is a map-side expression over the token
    count; ONE ~60-bucket groupBy; text never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    # floor(log2(n)) as bit_length(n)-1: bin() renders the bigint's
    # minimal binary string in both engines
    bucket = (F.length(F.bin(F.col("n").cast("long"))) - 1).cast("long")
    per = (docs.select(n_tok.alias("n"))
           .select("n", bucket.alias("len_bucket"))
           .groupBy("len_bucket")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n").cast("long").alias("n_tokens"),
                F.min("n").alias("min_tokens"),
                F.max("n").alias("max_tokens")))
    w_all = W.partitionBy()
    return (per.select(
        "len_bucket", "n_docs", "n_tokens", "min_tokens", "max_tokens",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w_all), 6)
        .alias("doc_share"))
        .orderBy("len_bucket"))


SQL_LENGTH_BUCKETS = """
WITH t AS (
    SELECT CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n
    FROM documents),
per AS (
    SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS len_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(min(n) AS INT) AS min_tokens,
           CAST(max(n) AS INT) AS max_tokens
    FROM t GROUP BY 1)
SELECT len_bucket, n_docs, n_tokens, min_tokens, max_tokens,
       round(n_docs / sum(n_docs) OVER (), 6) AS doc_share
FROM per ORDER BY len_bucket
"""


def q_token_offsets(spark, sf_dir):
    """Global token-offset enumeration: each document's starting token
    offset in the concatenated corpus laid out in the seeded shuffle
    order (corpus_shuffle's permutation) — the byte/token map a trainer
    uses to resume deterministically from "token 3.2 trillion" without
    replaying the stream.

    Scale shape — the WEIGHTED generalization of corpus_shuffle's radix
    trick: a global token cumsum over shuffle order would be one task,
    so instead the md5 key's top 5 bits form 32 ordered range buckets,
    each bucket computes its own (parallel) token cumsum, and a 32-row
    SinglePartition cumsum over per-bucket token totals supplies the
    bucket base offsets.  Token counts are computed map-side; text
    never shuffles — only (doc_id, key, n_tokens) move."""
    docs = _t(spark, sf_dir, "documents")
    key = _md5int(F.concat(F.lit(_SHUFFLE_SEED),
                           F.col("doc_id").cast("string")))
    n_tok = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    keyed = (docs.select("doc_id", key.alias("key"), n_tok.alias("n_tokens"))
             .withColumn("bucket",
                         F.shiftright("key", 60 - _SHUFFLE_BUCKETS_LOG2)))
    w_off = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = (keyed.groupBy("bucket")
               .agg(F.sum("n_tokens").alias("tok")))
    offsets = offsets.select(
        "bucket",
        F.coalesce(F.sum("tok").over(w_off), F.lit(0)).alias("base"))
    w = (W.partitionBy("bucket").orderBy("key", "doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (keyed.join(F.broadcast(offsets), "bucket")
            .select("doc_id", "n_tokens",
                    (F.col("base") + F.sum("n_tokens").over(w)
                     - F.col("n_tokens")).alias("token_offset"))
            .orderBy("token_offset"))


SQL_TOKEN_OFFSETS = f"""
SELECT doc_id, n_tokens,
       CAST(sum(n_tokens) OVER (ORDER BY k, doc_id
                                ROWS UNBOUNDED PRECEDING)
            - n_tokens AS BIGINT) AS token_offset
FROM (SELECT doc_id, {_SQL_SHUFFLE_KEY} AS k,
             CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                  AS BIGINT) AS n_tokens
      FROM documents)
ORDER BY token_offset
"""


def q_unigram_surprisal(spark, sf_dir):
    """Unigram-LM surprisal quality score: per document, the mean
    negative log2-probability of its tokens under the corpus's own
    unigram distribution — low surprisal = boilerplate/repetitive, high
    surprisal = rare-token-dense (OCR noise, codes); the classic cheap
    LM-based quality band-pass a pretraining pipeline runs before any
    neural scorer.

    Scale shape: one (doc_id, token) explode -> token-keyed partial-agg
    groupBy builds the LM (O(vocab) rows, never the corpus), the corpus
    token total is a 1-row broadcast (bm25's corpus-stats pattern —
    not a window over the vocab, which would single-partition it), and
    scoring joins tokens to the LM by token key, aggregating per doc.
    Text itself never shuffles — only (doc_id, token) pairs do."""
    docs = _docs_parallel(spark, sf_dir)
    tok = (docs.select("doc_id",
                       F.explode(F.split(F.trim(F.lower(F.col("text"))),
                                         r"\s+")).alias("tok"))
           .filter(F.col("tok") != ""))
    vocab = tok.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    lm = vocab.crossJoin(F.broadcast(total))
    return (tok.join(lm, "tok")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.round(F.avg(-F.log2(F.col("c") / F.col("t"))), 4)
                 .alias("mean_surprisal_bits"))
            .orderBy("doc_id"))


SQL_UNIGRAM_SURPRISAL = """
WITH tok AS (
    SELECT doc_id, tok FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
        FROM documents)
    WHERE tok <> ''),
vocab AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
total AS (SELECT sum(c) AS t FROM vocab)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-log2(CAST(c AS DOUBLE) / t)), 4) AS mean_surprisal_bits
FROM tok JOIN vocab USING (tok) CROSS JOIN total
GROUP BY doc_id ORDER BY doc_id
"""


def q_tfidf_topk(spark, sf_dir):
    """Per-document top-3 TF-IDF terms — the classic keyword/topic
    signal a curation pipeline attaches before clustering or routing
    documents (the BM25 ranking's document-side dual).

    Scale shape: one (doc_id, token) explode -> (doc_id, token)
    partial-agg groupBy for tf; df is a second partial-agg over the
    ALREADY-reduced tf rows (O(vocab), never the corpus); the document
    count joins as a 1-row broadcast (bm25's corpus-stats pattern);
    ranking re-shuffles only the reduced (doc_id, term, score) rows.
    Raw text never shuffles. Ties rank deterministically (score desc,
    term asc) so results are engine-stable."""
    docs = _docs_parallel(spark, sf_dir)
    tok = (docs.select("doc_id",
                       F.explode(F.split(F.trim(F.lower(F.col("text"))),
                                         r"\s+")).alias("term"))
           .filter(F.col("term") != ""))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n"))
    scored = (tf.join(dfreq, "term").crossJoin(F.broadcast(n_docs))
              .withColumn("score",
                          F.col("tf") * F.log((F.col("n") + 1.0)
                                              / (F.col("df") + 1.0))))
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("doc_id", "term", F.col("tf").cast("long").alias("tf"),
                    F.round("score", 4).alias("tfidf"),
                    F.col("rank").cast("int").alias("rank"))
            .orderBy("doc_id", "rank"))


SQL_TFIDF_TOPK = """
WITH tok AS (
    SELECT doc_id, term FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
        FROM documents)
    WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
    SELECT doc_id, term, tf,
           tf * ln((n + 1.0) / (df + 1.0)) AS score
    FROM tf JOIN df USING (term) CROSS JOIN n),
ranked AS (
    SELECT doc_id, term, tf, score,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, term) AS rank
    FROM scored)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
       round(score, 4) AS tfidf, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
"""


def q_split_leakage(spark, sf_dir):
    """Cross-split exact-duplicate leakage audit: for every non-train
    split of the deterministic 98/1/1 assignment (q_split_assign's
    md5 buckets), how many documents' content digests also appear in
    train — the eval-integrity check a pipeline runs after splitting,
    since leaked duplicates inflate eval scores.

    Scale shape: map-only digest+split, then ONE digest-keyed shuffle:
    the train side reduces to DISTINCT digests (keys only, no text)
    and the eval side left-joins it by digest. Neither side
    broadcasts — train digests are ~the corpus, so the equi-join
    hash-partitions both sides on the digest key; only 32-char
    digests ever move."""
    docs = _t(spark, sf_dir, "documents")
    bucket = _md5int(F.col("doc_id").cast("string")) % 1000
    split = (F.when(bucket < 980, "train")
             .when(bucket < 990, "val").otherwise("test"))
    d = docs.select(split.alias("split"),
                    F.md5(F.lower(F.trim(F.col("text")))).alias("digest"))
    train = (d.filter(F.col("split") == "train")
             .select("digest").distinct()
             .withColumn("__in_train", F.lit(True)))
    return (d.filter(F.col("split") != "train")
            .join(train, "digest", "left")
            .groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.when(F.col("__in_train"), 1).otherwise(0))
                 .cast("long").alias("n_leaked"),
                 F.round(F.avg(F.when(F.col("__in_train"), 1.0)
                               .otherwise(0.0)), 4).alias("leak_rate"))
            .orderBy("split"))


SQL_SPLIT_LEAKAGE = f"""
WITH d AS (
    SELECT CASE WHEN b < 980 THEN 'train' WHEN b < 990 THEN 'val'
                ELSE 'test' END AS split,
           md5(lower(trim(text))) AS digest
    FROM (SELECT {_SQL_MD5INT % 'CAST(doc_id AS VARCHAR)'} % 1000 AS b, text
          FROM documents)),
train AS (SELECT DISTINCT digest FROM d WHERE split = 'train')
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN t.digest IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_leaked,
       round(avg(CASE WHEN t.digest IS NOT NULL THEN 1.0 ELSE 0.0 END), 4)
           AS leak_rate
FROM d LEFT JOIN train t ON d.digest = t.digest
WHERE d.split <> 'train'
GROUP BY split ORDER BY split
"""


def q_latency_quantiles(spark, sf_dir):
    """Per-event-type p50/p95/p99 of the value column — the P99-latency
    rollup every observability dashboard runs against span durations
    (the query-probe family's missing percentile shape; the reference
    delegates it to DuckDB's quantile_cont, here it is Spark's EXACT
    interpolating `percentile`, which computes the same linear
    interpolation so the DuckDB twin is value-identical).

    Scale shape: ONE low-cardinality groupBy; exact percentile holds the
    per-group value multiset, so at true 100 TB scale swap in
    percentile_approx (t-digest, bounded memory, mergeable partial
    aggregation) — the query shape is unchanged, which is why the exact
    variant is the oracle-twinned entry."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 *[F.round(F.expr(f"percentile(value, {q})"), 6)
                   .alias(f"p{int(q * 100)}")
                   for q in (0.5, 0.95, 0.99)])
            .orderBy("event_type"))


SQL_LATENCY_QUANTILES = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(value, 0.5), 6)  AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


_DIVERSITY_K = 6


def q_diversity_sample(spark, sf_dir):
    """Greedy farthest-point (k-center) diversity sample over the
    embedding column: start from the smallest vec_id, then repeatedly
    add the vector whose nearest already-selected neighbor is farthest
    (cosine distance) — the classic coreset/diversity-selection pass a
    training pipeline runs to pick maximally-dissimilar exemplars
    (dedup's complement: keep the spread, not drop the close).

    Scale shape: the algorithm is INHERENTLY k sequential rounds (each
    choice depends on all previous ones); each round is one
    embarrassingly-parallel scan — the k selected vectors broadcast as
    plan literals (k is small by construction) and the round reduces to
    a global top-1, so the driver holds exactly k vectors, never the
    corpus. O(k·n) total work, the standard k-center bound. Ties break
    on vec_id, so selection is engine-deterministic; the DuckDB twin
    replays the same recurrence as a recursive CTE carrying the
    selected list in one accumulator row (the sequence_pack oracle
    pattern)."""
    result_schema = "rank int, vec_id long, min_dist double"
    emb = (_t(spark, sf_dir, "embeddings")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v")))
    seed = emb.orderBy("vec_id").limit(1).collect()
    if not seed:
        # degenerate empty corpus: zero exemplars (the recursive-CTE
        # twin's anchor technically emits one all-NULL row here — a
        # shape no real corpus produces; every non-empty input is
        # parity-exact, pinned by tests/test_queries_oracle.py)
        return spark.createDataFrame([], result_schema)
    sel = [(1, int(seed[0]["vec_id"]), None, list(seed[0]["v"]))]

    def cos_dist(vec):
        lv = F.lit(vec)
        return 1 - _vec_dot(F.col("v"), lv) / (_vec_norm(F.col("v"))
                                               * _vec_norm(lv))

    for rank in range(2, _DIVERSITY_K + 1):
        chosen_ids = [s[1] for s in sel]
        dists = [cos_dist(s[3]) for s in sel]
        min_dist = dists[0] if len(dists) == 1 else F.least(*dists)
        rows = (emb.filter(~F.col("vec_id").isin(chosen_ids))
                .select("vec_id", "v", min_dist.alias("d"))
                .orderBy(F.desc("d"), F.asc("vec_id"))
                .limit(1).collect())
        if not rows:
            # corpus smaller than _DIVERSITY_K: emit however many
            # exemplars exist — the recursive CTE terminates the same
            # way when its LATERAL finds no unchosen row (r9 ADVICE:
            # this used to IndexError instead)
            break
        nxt = rows[0]
        sel.append((rank, int(nxt["vec_id"]), float(nxt["d"]),
                    list(nxt["v"])))
    # round half-AWAY-from-zero like DuckDB's round() (and F.round),
    # not Python's banker's rounding — an exact .5 tie at the sixth
    # decimal would otherwise flake the oracle differential
    from decimal import ROUND_HALF_UP, Decimal

    def r6(d):
        return float(Decimal(repr(d)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))
    return spark.createDataFrame(
        [(r, i, r6(d) if d is not None else None)
         for r, i, d, _ in sel],
        result_schema).orderBy("rank")


def _vec_dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _vec_norm(a):
    return F.sqrt(_vec_dot(a, a))


SQL_DIVERSITY_SAMPLE = f"""
WITH RECURSIVE corpus AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
fp AS (
    SELECT 1 AS rank,
           [(SELECT min(vec_id) FROM corpus)] AS sel_ids,
           [(SELECT v FROM corpus ORDER BY vec_id LIMIT 1)] AS sel_vecs,
           CAST(NULL AS DOUBLE) AS min_dist
    UNION ALL
    SELECT rank + 1,
           list_append(sel_ids, nxt.vec_id),
           list_append(sel_vecs, nxt.v),
           nxt.d
    FROM fp, LATERAL (
        SELECT c.vec_id, c.v,
               list_min(list_transform(fp.sel_vecs, s ->
                   1 - list_dot_product(c.v, s)
                       / (sqrt(list_dot_product(c.v, c.v))
                          * sqrt(list_dot_product(s, s))))) AS d
        FROM corpus c
        WHERE NOT list_contains(fp.sel_ids, c.vec_id)
        ORDER BY d DESC, c.vec_id LIMIT 1) nxt
    WHERE rank < {_DIVERSITY_K})
SELECT rank, sel_ids[rank] AS vec_id, round(min_dist, 6) AS min_dist
FROM fp ORDER BY rank
"""


_SEMDEDUP_K = 8          # clusters (oracle-expressibility scale; see docstring)
_SEMDEDUP_ITERS = 2      # assignment rounds (1 Lloyd mean update between them)
_SEMDEDUP_TAU = 0.45     # within-cluster cosine dup threshold (in-corpus range)


def q_semdedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    cluster the embedding space, then inside each cluster drop every
    vector that has an earlier (lower vec_id) cluster-mate with cosine
    >= tau — pairwise similarity is only ever computed WITHIN a
    cluster, which is the whole trick that makes semantic dedup
    tractable at corpus scale (vs the all-pairs cross join).

    Determinism/parity: centroids init as the K smallest vec_ids'
    vectors; each Lloyd round assigns by squared-L2 rounded to 6dp with
    ties to the lower centroid id, and recomputed centroid means are
    rounded to 6dp per dimension — so both engines walk the identical
    quantized recurrence (the DuckDB twin unrolls the same K/iters).

    Scale shape: every assignment round is MAP-ONLY — the K centroids
    travel as plan literals (K*d doubles), so the corpus scan never
    shuffles for assignment; the mean update is one K-group partial
    agg (K rows to the driver, never vectors). The within-cluster pair
    scan shuffles by cluster id — an equi-join, no NLJ (plan-pinned).
    K=8 here is an oracle-expressibility artifact: real SemDeDup runs
    K ~ n/1000 (so expected cluster size stays O(1000) and the
    within-cluster quadratic term is bounded); the assignment plan is
    K-independent map work and the literal centroids would move to a
    broadcast table at that K."""
    emb = (_t(spark, sf_dir, "embeddings")
           .select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v")))
    seeds = (emb.orderBy("vec_id").limit(_SEMDEDUP_K).collect())
    # (cid, vector) pairs, K x d doubles — bounded driver state
    cents = [(cid, list(r["v"])) for cid, r in enumerate(seeds)]

    def assign(df, cents):
        dists = []
        for cid, c in cents:
            d = F.aggregate(
                F.zip_with(F.col("v"), F.lit(c),
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0.0), lambda acc, x: acc + x)
            dists.append(F.struct(F.round(d, 6).alias("d"),
                                  F.lit(cid).alias("cid")))
        return df.withColumn("cid", F.array_min(F.array(*dists))["cid"])

    dim = len(cents[0][1]) if cents else 0
    for _ in range(_SEMDEDUP_ITERS - 1):
        assigned = assign(emb, cents)
        means = (assigned.groupBy("cid")
                 .agg(*[F.round(F.avg(F.col("v")[i]), 6).alias(f"m{i}")
                        for i in range(dim)])
                 .collect())
        # an emptied cluster disappears, exactly like the twin's mean
        # CTE (GROUP BY cid has no row for it) — surviving cids keep
        # their ORIGINAL ids so both engines' cluster labels agree
        cents = sorted(
            ((r["cid"], [r[f"m{i}"] for i in range(dim)]) for r in means),
            key=lambda t: t[0])
    a = assign(emb, cents).select("vec_id", "v", "cid")
    b = a.select(F.col("vec_id").alias("b_vec_id"),
                 F.col("v").alias("b_v"), F.col("cid").alias("b_cid"))
    cos = _vec_dot(F.col("v"), F.col("b_v")) / (
        _vec_norm(F.col("v")) * _vec_norm(F.col("b_v")))
    dups = (a.join(b, (F.col("cid") == F.col("b_cid"))
                   & (F.col("vec_id") < F.col("b_vec_id")))
            .filter(F.round(cos, 6) >= _SEMDEDUP_TAU)
            .select(F.col("b_vec_id").alias("vec_id")).distinct()
            .withColumn("dup", F.lit(True)))
    return (a.join(dups, "vec_id", "left")
            .select("vec_id", F.col("cid").cast("int").alias("cluster_id"),
                    F.coalesce(~F.col("dup"), F.lit(True)).alias("is_kept"))
            .orderBy("vec_id"))


def _semdedup_sql():
    """Unrolled k-means twin: same init, same 6dp-quantized recurrence."""
    k, tau = _SEMDEDUP_K, _SEMDEDUP_TAU
    dist = ("round(list_sum(list_transform(range(1, len(e.v) + 1), "
            "i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))), 6)")
    assign = """
a{n} AS (SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {dist}, c.cid) AS rn
    FROM e CROSS JOIN c{n} c) WHERE rn = 1)"""
    parts = [f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
       FROM e ORDER BY vec_id LIMIT {k})"""]
    for it in range(_SEMDEDUP_ITERS - 1):
        parts.append(assign.format(n=it, dist=dist) + f""",
c{it + 1} AS (SELECT cid, list(mv ORDER BY i) AS v FROM (
    SELECT cid, i, round(avg(v[i]), 6) AS mv FROM (
        SELECT cid, v, unnest(range(1, len(v) + 1)) AS i FROM a{it})
    GROUP BY cid, i) GROUP BY cid)""")
    last = _SEMDEDUP_ITERS - 1
    parts.append(assign.format(n=last, dist=dist) + f""",
dup AS (SELECT DISTINCT b.vec_id FROM a{last} a JOIN a{last} b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 6) >= {tau})
SELECT a{last}.vec_id, CAST(cid AS INTEGER) AS cluster_id,
       dup.vec_id IS NULL AS is_kept
FROM a{last} LEFT JOIN dup ON a{last}.vec_id = dup.vec_id
ORDER BY a{last}.vec_id""")
    return ",".join(parts)


SQL_SEMDEDUP = _semdedup_sql()


_WINNOW_K = 4      # tokens per k-gram
_WINNOW_W = 5      # winnowing window (guarantee: matches >= k+w-1 tokens)
_WINNOW_MIN_SHARED = 3


def q_winnowing_pairs(spark, sf_dir):
    """MOSS winnowing (Schleimer/Wilkerson/Aiken 2003) overlap detection:
    per document, hash every word 4-gram, slide a w=5 window over the
    hash sequence selecting each window's minimum (rightmost on ties —
    the robust-winnowing rule), dedup the selected fingerprints per
    doc, then self-join fingerprints across documents and report pairs
    sharing >= 3 — the guarantee-bearing local fingerprinting scheme
    (any shared run of k+w-1 = 8 tokens is provably caught) that
    plagiarism/overlap detectors use instead of random MinHash
    sampling.

    Determinism/parity: the rightmost-min tie-break is encoded in the
    window key itself — hash || zero-padded (1e8 - pos) — so a plain
    MIN over the frame is the selection rule in both engines; the hash
    is md5 (identical both sides).

    Scale shape: k-gram hashing is map-only array work on the split
    array (no explode of raw text across the wire — only 12-byte
    hashes + positions shuffle, ONE doc_id exchange for the frame);
    fingerprint density is ~2/(w+1) of k-grams, so the cross-doc join
    input is ~1/3 the token count, keyed by hash (equi-join, AQE
    skew-splittable); the >= MIN_SHARED count is a partial agg over
    pair keys. A corpus-frequency stop-list on hot fingerprints (the
    standard MOSS refinement) would bolt on as one broadcast anti-join
    before the pair join."""
    k, w = _WINNOW_K, _WINNOW_W
    docs = _docs_parallel(spark, sf_dir)
    arr = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    toks = docs.select("doc_id", arr.alias("arr"))
    n = F.size("arr")
    # docs shorter than k tokens yield NO k-grams (the 2003 paper
    # defines none below k) — when() yields NULL, posexplode drops it
    kg = toks.select(
        "doc_id",
        F.posexplode(F.when(n >= k, F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.substring(
                F.md5(F.concat_ws(" ", F.slice(F.col("arr"), i, k))),
                1, 12)))).alias("p0", "h"))
    keyed = (kg.select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
             .withColumn("k", F.concat(
                 F.col("h"),
                 F.lpad((F.lit(100000000) - F.col("pos")).cast("string"),
                        9, "0"))))
    dw = W.partitionBy("doc_id").orderBy("pos")
    m = F.count("*").over(W.partitionBy("doc_id"))
    sel = (keyed
           .withColumn("m", m)
           .withColumn("s", F.min("k").over(dw.rowsBetween(0, w - 1)))
           .filter(F.col("pos") <= F.greatest(F.col("m") - (w - 1),
                                              F.lit(1))))
    fp = sel.select("doc_id", F.substring("s", 1, 12).alias("h")).distinct()
    fb = fp.select(F.col("doc_id").alias("doc_b"), "h")
    return (fp.join(fb, "h")
            .filter(F.col("doc_id") < F.col("doc_b"))
            .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
            .agg(F.count("*").cast("long").alias("shared_fingerprints"))
            .filter(F.col("shared_fingerprints") >= _WINNOW_MIN_SHARED)
            .orderBy("doc_a", "doc_b"))


SQL_WINNOWING_PAIRS = f"""
WITH toks AS (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS arr
              FROM documents),
pg AS (SELECT doc_id, arr,
              unnest(range(1, len(arr) - {_WINNOW_K - 2})) AS pos
       FROM toks WHERE len(arr) >= {_WINNOW_K}),
kg AS (SELECT doc_id, pos,
              substr(md5(array_to_string(
                  list_slice(arr, pos, pos + {_WINNOW_K - 1}), ' ')),
                  1, 12) AS h
       FROM pg),
keyed AS (SELECT doc_id, pos,
              h || lpad(CAST(100000000 - pos AS VARCHAR), 9, '0') AS k,
              count(*) OVER (PARTITION BY doc_id) AS m
          FROM kg),
sel AS (SELECT doc_id, pos, m,
              min(k) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW
                           AND {_WINNOW_W - 1} FOLLOWING) AS s
        FROM keyed),
fp AS (SELECT DISTINCT doc_id, substr(s, 1, 12) AS h
       FROM sel WHERE pos <= greatest(m - {_WINNOW_W - 1}, 1))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS shared_fingerprints
FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {_WINNOW_MIN_SHARED}
ORDER BY doc_a, doc_b
"""


def q_pmi_collocations(spark, sf_dir):
    """Top-20 bigram collocations by pointwise mutual information —
    PMI(x,y) = log2(P(xy) / (P(x)P(y))) with a min-count floor — the
    classic corpus-statistics pass (Church & Hanks 1990) a curation
    pipeline runs to find multiword expressions / boilerplate phrases
    worth treating as units (tokenizer merges, stop-phrase lists).

    Scale shape: adjacent pairs come straight off the (let-bound)
    split array as MAP-ONLY work — no window, so the corpus-sized
    token explode never shuffles by doc_id (the lead()-window
    formulation costs a full 10^8-row doc-keyed exchange at 2M docs —
    measured, then removed; positions are irrelevant to counts).
    The shuffle/agg keys are xxhash64 TOKEN HASHES, not the token
    strings: the bigram aggregate's map-side state and exchange carry
    (h1, h2, partial count) fixed-width longs instead of two text
    columns — the corpus-dominant stream whose string form was the
    documented 20M-doc spill cliff. WHERE the hash runs matters as
    much as which hash (all three variants measured at the 20M tier,
    PROBE_LLM_SCALE.json r12_token_hash_ab): hashing must happen in a
    codegen'd projection AFTER the pair explode — inside the pair
    transform lambda it rides the interpreted HOF path and costs
    +54% at the 2M tier; and the unigram agg stays STRING-keyed (the
    O(vocab) reduced side was never the spill; its token text feeds
    the top-20 display and tie-breaks) with its join hash computed
    POST-agg, O(vocab) times. Net: 648.1 s (r11 strings) -> 224.4 s
    at 20M docs, 2M-doc wall unchanged (28.0 -> 28.25 s). The hash is
    Spark-side ONLY (a JVM intrinsic): contamination's identical-
    hash-both-engines md5 treatment was MEASURED here first and lost
    (826.6 s — crypto cost exceeds agg-state savings because pmi's
    instances never cross a join, unlike contamination where the hash
    shrinks a corpus-sized join shuffle). The oracle keys by the
    token itself; results are identical whenever xxhash64 is
    injective on the corpus vocabulary (any-collision probability <
    vocab^2/2^65: ~5e-6 at a 10M-token vocabulary, ~1e-11 at the
    driver's sf0.01 gate), and a collision fans one survivor row out
    into its two colliding token texts — a one-pair artifact far
    below the >=5 count floor's stability, not a systematic drift. The two corpus totals ride along as a
    1-row broadcast (bm25's corpus-stats pattern); the final top-20
    sorts only the >= min-count survivors. Ranking orders by the
    ROUNDED pmi (then bigram text), so engine-side FP noise below
    1e-4 cannot reorder the cut."""
    from pyspark.storagelevel import StorageLevel

    docs = _docs_parallel(spark, sf_dir)
    arr = F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                   lambda t: t != "")
    toks = docs.select(arr.alias("arr"))
    # pairs extract as STRINGS and hash in a codegen'd projection AFTER
    # the explode: xxhash64 inside the transform lambda runs on the
    # interpreted HOF path (~µs/token — measured +54% at the 2M tier);
    # post-explode it is whole-stage-codegen'd and ~free
    bg = toks.select(F.explode(_bind1(
        F.col("arr"),
        lambda a: F.when(F.size(a) >= 2, F.transform(
            F.sequence(F.lit(0), F.size(a) - 2),
            lambda i: F.struct(a[i].alias("w1"), a[i + 1].alias("w2"))))
        .otherwise(F.array().cast(
            "array<struct<w1:string,w2:string>>")))).alias("p")) \
        .select(F.xxhash64("p.w1").alias("h1"),
                F.xxhash64("p.w2").alias("h2"))
    # PERSIST the two reduced aggregates (r14): bc is consumed by tot
    # and by the final join, uc by tot/u1/u2 — without the persist each
    # consumer re-ran its FULL corpus explode+agg subtree (the sf0.01
    # plan carried 5 documents scans / 5 corpus-sized Generates; no
    # ReusedExchange fires across the branches). Both frames are
    # vocabulary-sized (O(distinct bigrams) / O(distinct tokens)), not
    # corpus-sized, so the cache cannot hit the string-array evict
    # cliff; corpus passes drop 5 -> 2, the two fundamental ones.
    bc = _persist(bg.groupBy("h1", "h2").agg(F.count("*").alias("c_xy")),
                  StorageLevel.MEMORY_AND_DISK)
    # unigram counts stay string-keyed (the O(vocab) reduced side was
    # never the spill) and the hash is computed POST-agg — O(vocab)
    # xxhash64 calls, not O(corpus); the per-instance zip+hash variant
    # measured +60% at the 2M tier for zero 10x benefit
    uc = _persist(docs.select(F.explode(arr).alias("w"))
                  .groupBy("w").agg(F.count("*").alias("c"))
                  .select(F.xxhash64("w").alias("h"), "c", "w"),
                  StorageLevel.MEMORY_AND_DISK)
    tot = (uc.agg(F.sum("c").alias("n_uni"))
           .crossJoin(bc.agg(F.sum("c_xy").alias("n_bi"))))
    u1 = uc.select(F.col("h").alias("h1"), F.col("c").alias("c1"),
                   F.col("w").alias("w1"))
    u2 = uc.select(F.col("h").alias("h2"), F.col("c").alias("c2"),
                   F.col("w").alias("w2"))
    return (bc.filter(F.col("c_xy") >= 5)
            .join(u1, "h1").join(u2, "h2")
            .crossJoin(F.broadcast(tot))
            .select(
                "w1", "w2", F.col("c_xy").cast("long").alias("pair_count"),
                F.round(F.log2((F.col("c_xy") / F.col("n_bi"))
                               / ((F.col("c1") / F.col("n_uni"))
                                  * (F.col("c2") / F.col("n_uni")))),
                        4).alias("pmi"))
            .orderBy(F.desc("pmi"), "w1", "w2")
            .limit(20))


SQL_PMI_COLLOCATIONS = """
WITH toks AS (SELECT list_filter(regexp_split_to_array(trim(lower(text)),
                                                       '\\s+'),
                                 x -> x <> '') AS arr
              FROM documents),
bg AS (SELECT arr[i] AS w1, arr[i + 1] AS w2 FROM (
           SELECT arr, unnest(range(1, len(arr))) AS i FROM toks)),
bc AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
uc AS (SELECT w, count(*) AS c FROM (
           SELECT unnest(arr) AS w FROM toks) GROUP BY 1),
tot AS (SELECT (SELECT sum(c) FROM uc) AS n_uni,
               (SELECT sum(c_xy) FROM bc) AS n_bi)
SELECT w1, w2, CAST(c_xy AS BIGINT) AS pair_count,
       round(log2((c_xy / n_bi)
                  / ((u1.c / n_uni) * (u2.c / n_uni))), 4) AS pmi
FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w CROSS JOIN tot
WHERE c_xy >= 5
ORDER BY pmi DESC, w1, w2 LIMIT 20
"""


def q_bigram_surprisal(spark, sf_dir):
    """Bigram-LM surprisal quality score: per document, the mean
    negative log2 of the Laplace-smoothed conditional bigram
    probability P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1})
    + V) under the corpus's own counts — the classic fluency scorer
    one rung above unigram_surprisal (low = templated/boilerplate
    word order, high = shuffled/garbled text that unigram stats miss).
    Documents with fewer than two tokens have no bigrams and drop out
    (same rule both engines).

    Scale shape: bigram extraction is MAP-ONLY off the let-bound split
    array (pmi_collocations' shape — no window, no doc-keyed exchange
    of the token explode); nothing in the output needs token TEXT, so
    the corpus-sized streams are keyed by the xxhash64 token hash: the
    bigram stream shuffles (doc_id, h1, h2) fixed-width longs and the
    bigram LM table is an (h1, h2)-keyed partial agg
    (O(vocab²-observed)), with the hash in a codegen'd projection
    AFTER the pair explode, never inside the interpreted transform
    lambda (q_pmi_collocations documents the three-variant A/B). The
    unigram LM table stays STRING-keyed with its join hash computed
    POST-agg (O(vocab) hashes, and V = distinct tokens exactly as the
    oracle counts it). Net at the 20M tier: 946.6 s (r11 strings) ->
    546.6 s, 2M wall flat (48.5 -> 51.4 s). The hash is Spark-side
    ONLY — see q_pmi_collocations for the measured md5-both-engines
    negative and the injectivity bound (any-collision p <
    vocab^2/2^65, ~1e-11 at the driver's sf0.01 gate; a collision
    double-matches the c1 lookup for docs containing the merged
    tokens). The oracle keys by the token itself. V rides as a 1-row
    broadcast; scoring joins the per-doc bigram stream to the two LM
    tables by hash and rolls up per doc."""
    from pyspark.storagelevel import StorageLevel

    docs = _docs_parallel(spark, sf_dir)
    arr = F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                   lambda t: t != "")
    toks = docs.select("doc_id", arr.alias("arr"))
    # string pairs, hashed post-explode in codegen — not inside the
    # interpreted transform lambda (see q_pmi_collocations)
    bg_col = _bind1(
        F.col("arr"),
        lambda a: F.when(F.size(a) >= 2, F.transform(
            F.sequence(F.lit(0), F.size(a) - 2),
            lambda i: F.struct(a[i].alias("w1"), a[i + 1].alias("w2"))))
        .otherwise(F.array().cast("array<struct<w1:string,w2:string>>")))
    # An explicit repartition("h1","h2") shared by the aggregate and the
    # scoring join was tried first (one corpus shuffle via
    # ReusedExchange) — column pruning projects doc_id out of the
    # aggregate branch BELOW the exchange, the subtrees stop matching,
    # and the raw instance stream shuffles twice (captured at sf0.01);
    # reverted to the plain shape, where the aggregate branch shuffles
    # partial-aggregated (h1, h2, count) rows instead of raw instances.
    bg = (toks.select("doc_id", F.explode(bg_col).alias("p"))
          .select("doc_id", F.xxhash64("p.w1").alias("h1"),
                  F.xxhash64("p.w2").alias("h2")))
    bc = bg.groupBy("h1", "h2").agg(F.count("*").alias("c_xy"))
    # string-keyed unigram agg + POST-agg hash: O(vocab) xxhash64
    # calls instead of O(corpus) (see q_pmi_collocations); persisted —
    # vocabulary-sized — so the LM-score join and the V total don't
    # each re-run the unigram corpus pass.
    uc = _persist(docs.select(F.explode(arr).alias("w"))
                  .groupBy("w").agg(F.count("*").alias("c1"))
                  .select(F.xxhash64("w").alias("h1"), "c1"),
                  StorageLevel.MEMORY_AND_DISK)
    vocab = uc.agg(F.count("*").alias("v"))
    # r14 shape: score each DISTINCT bigram once on the reduced
    # (h1, h2) table — -log2((c_xy+1)/(c1+V)) depends only on the
    # bigram, so joining the pre-scored table to the instance stream
    # removes the old h1 join exchange of the CORPUS-SIZED joined
    # stream entirely (the uc lookup now runs O(distinct bigrams)
    # times); the per-doc avg aggregates the identical multiset of
    # doubles per doc_id. Corpus-sized exchanges: 3 -> 2 (the scoring
    # SMJ + the doc_id rollup); corpus explodes 4 -> 3 (vocab reads
    # the persisted uc).
    scored = (bc.join(uc, "h1")
              .crossJoin(F.broadcast(vocab))
              .select("h1", "h2",
                      (-F.log2((F.col("c_xy") + 1.0)
                               / (F.col("c1") + F.col("v")))).alias("s")))
    return (bg.join(scored, ["h1", "h2"])
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.round(F.avg("s"), 4).alias("mean_bigram_surprisal"))
            .orderBy("doc_id"))


SQL_BIGRAM_SURPRISAL = """
WITH toks AS (SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(lower(text)),
                                                       '\\s+'),
                                 t -> t <> '') AS arr
              FROM documents),
bg AS (SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2 FROM (
           SELECT doc_id, arr, unnest(range(1, len(arr))) AS i FROM toks)),
bc AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
uc AS (SELECT w1, count(*) AS c1 FROM (
           SELECT unnest(arr) AS w1 FROM toks) GROUP BY 1),
vocab AS (SELECT count(*) AS v FROM uc)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-log2((c_xy + 1.0) / (c1 + v))), 4)
           AS mean_bigram_surprisal
FROM bg JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN vocab
GROUP BY doc_id ORDER BY doc_id
"""


_PASSAGE_TOKENS = 16


def q_passage_dedup(spark, sf_dir):
    """Sub-document (passage-level) duplication audit: split each
    document's token stream into fixed 16-token chunks, hash each
    chunk, count corpus-wide occurrences, and report per document how
    many of its chunks are duplicated ANYWHERE in the corpus — the
    boilerplate/repeated-passage detector that document-level dedup
    (exact or MinHash) is blind to, and the usual precursor to
    passage-granular removal.

    Scale shape: chunking + hashing is map-only array work (transform
    over the split array — raw text never shuffles; only 32-char chunk
    digests do); the global occurrence count is a digest-keyed partial
    agg (O(distinct chunks)); the per-doc rollup re-shuffles only
    (doc_id, digest, n) rows. Equi-joins throughout, no NLJ."""
    p = _PASSAGE_TOKENS
    docs = _docs_parallel(spark, sf_dir)
    arr = F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                   lambda t: t != "")
    toks = docs.select("doc_id", arr.alias("arr"))
    n_chunks = F.ceil(F.size("arr") / p).cast("int")
    chunks = toks.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
            lambda c: F.md5(F.concat_ws(
                " ", F.slice(F.col("arr"), c * p + 1, p)))))
        .alias("chunk_idx", "ph"))
    gc = chunks.groupBy("ph").agg(F.count("*").alias("n"))
    return (chunks.join(gc, "ph")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_chunks"),
                 F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
                 .cast("long").alias("dup_chunks"),
                 F.round(F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
                         / F.count("*"), 4).alias("dup_ratio"))
            .orderBy("doc_id"))


SQL_PASSAGE_DEDUP = f"""
WITH toks AS (SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(lower(text)),
                                                       '\\s+'),
                                 t -> t <> '') AS arr
              FROM documents),
ch AS (SELECT doc_id, arr,
              unnest(range(0, greatest(CAST(ceil(len(arr) / {_PASSAGE_TOKENS}.0)
                                            AS BIGINT), 1))) AS chunk_idx
       FROM toks),
pass AS (SELECT doc_id, chunk_idx,
              md5(array_to_string(
                  list_slice(arr, chunk_idx * {_PASSAGE_TOKENS} + 1,
                             (chunk_idx + 1) * {_PASSAGE_TOKENS}), ' ')) AS ph
         FROM ch),
gc AS (SELECT ph, count(*) AS n FROM pass GROUP BY 1)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
       round(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
           AS dup_ratio
FROM pass JOIN gc USING (ph)
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# Registration order matters: the driver's hard correctness gate snapshots
# exactly the FIRST 50 entries of queries().  All §2A reader-layer entries
# (the OTLP/OTAP decode paths) must sit inside that window, so they are
# registered first alongside the distinctive relational / LLM-pipeline
# operators.  Seven trivial scalar variants whose semantics are redundantly
# covered by siblings inside the window (and by the full pytest DuckDB-oracle
# differential over ALL entries, tests/test_queries_oracle.py) are registered
# last, past the snapshot boundary.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tail_topk": q_tail_topk,
    # point_lookup / regexp / time_bucket / except_all rotated past the
    # window in round 11 to admit winnowing_pairs / pmi_collocations /
    # passage_dedup / bigram_surprisal to the driver hard gate (r10
    # VERDICT #1).  In-window family coverage: point_lookup's
    # filter+sort scan shape via tail_topk (same events table) with the
    # raw-ns time-range pushdown separately pinned by
    # tests/test_plans.py::test_time_range_pushdown_on_raw_ns; regexp's
    # java-regex expression family via pii_scrub (chained
    # regexp_replace over the same documents.text column); time_bucket's
    # floor(unix_timestamp/N) epoch bucketing via sessionize (same
    # unix_timestamp arithmetic) and its groupBy-count via tpch_q1;
    # except_all's EXCEPT ALL rewrite (tag/count/replicate Generate +
    # Union) via asof_join (Union), passage_dedup (Generate), and
    # split_leakage (the anti-join set-difference semantics).  Overlap
    # pinned by the window-coverage gate (tests/test_plans.py); all four
    # keep their pytest DuckDB oracle differential.
    "ilike_search": q_ilike_search,
    "json_extract": q_json_extract,
    "multimodal_features": q_multimodal_features,
    "dedup_embedding": q_dedup_embedding,
    # agg_stats / percentile rotated past the window in round 10 to admit
    # tfidf_topk / latency_quantiles to the driver hard gate (r9 VERDICT
    # #2): percentile's exact-percentile aggregate family is strictly
    # subsumed by latency_quantiles (same `percentile` physical aggregate,
    # three quantiles per group instead of one), and agg_stats'
    # count/avg/sum groupBy family stays in-window via tpch_q1.  Overlap
    # pinned by the window-coverage gate (tests/test_plans.py); both keep
    # their pytest DuckDB oracle differential.
    "tfidf_topk": q_tfidf_topk,
    "latency_quantiles": q_latency_quantiles,
    "join_multi": q_join_multi,
    "correlated_subquery": q_correlated_subquery,
    "asof_join": q_asof_join,
    "contamination_overlap": q_contamination_overlap,
    # repetition_ratio / vocab_topk rotated past the window in round 13
    # to admit feature_hash / length_buckets (with source_cap /
    # source_mix_weights below — the four entries never
    # driver-certified in rounds 1-12, r12 VERDICT #2).  In-window
    # family coverage: repetition_ratio's split(trim(text)) tokenizer
    # expression runs verbatim inside the incoming feature_hash plan
    # (and in sequence_pack/token_offsets' n_tokens map side);
    # vocab_topk's explode -> groupBy-count shape is exactly
    # feature_hash's aggregate (explode + groupBy + count) and its
    # sort+limit tail stays in-window via tail_topk.  Map-only text
    # expression coverage continues via pii_scrub.  Overlap pinned by
    # the window-coverage gate (tests/test_plans.py); both keep their
    # pytest DuckDB oracle differential.
    "window_topk_per_group": q_window_topk_per_group,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    # tpch_q6 / dedup_exact / stratified_sample / embedding_bucket_ann
    # rotated past the window in round 12 to admit the packing/budget
    # family (token_budget / split_assign / sequence_pack /
    # sequence_pack_nostraddle — the one registry family never
    # driver-certified in rounds 1-11, r11 VERDICT #3).  In-window
    # family coverage: tpch_q6's scan+filter+agg via tpch_q1 (same
    # lineitem aggregate, heavier) and tail_topk (filter+sort);
    # dedup_exact's md5-digest groupBy via split_leakage (digest
    # equi-join over the same md5(text) expression) and passage_dedup
    # (chunk-digest partial-agg counts); stratified_sample's map-only
    # md5-mod-threshold filter via the incoming split_assign (the
    # identical _md5int % N bucketing expression family);
    # embedding_bucket_ann's sign-LSH bucket equi-join via
    # dedup_embedding (same one-sided multi-probe bucket join).
    # Overlap pinned by the window-coverage gate
    # (tests/test_plans.py); all four keep their pytest DuckDB oracle
    # differential.
    # minhash_signature rotated past the window in round 10 to admit
    # split_leakage (r9 VERDICT #2): the signature computation runs
    # verbatim inside the in-window minhash_lsh_pairs plan (same
    # shingle → murmur-permutation → array_min pipeline, which then
    # continues into banding), so the eviction trades redundancy only.
    # split_leakage adds a distinct shape the window lacked: a digest
    # equi-join where the build side is a DISTINCT'd train split.
    "split_leakage": q_split_leakage,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    # simhash rotated past the window in round 10 to admit semdedup (the
    # round's flagship: SemDeDup-style k-means + within-cluster cosine
    # dedup, unrolled-CTE oracle).  simhash is a map-only text-expression
    # plan (scan -> project -> limit) whose family stays in-window via
    # repetition_ratio / pii_scrub / vocab_topk, and whose md5-derived
    # hashing expressions run in-window inside dedup_exact and
    # split_leakage; its sketch-bucket JOIN variant (simhash_pairs) was
    # never the window entry.  semdedup adds a shape the window lacked:
    # literal-centroid iterative assignment + cluster-keyed self-join.
    # Overlap pinned by the window-coverage gate; simhash keeps its
    # pytest DuckDB oracle differential like every past-window entry.
    "semdedup": q_semdedup,
    # Packing/budget family rotated INTO the window in round 12 (r11
    # VERDICT #3 — never driver-certified before): training-budget
    # rollup, deterministic md5 split assignment, per-shard cumsum
    # contiguous packing, and the applyInPandas next-fit no-straddle
    # packer (the registry's only Python-stateful entry — its
    # recursive-CTE oracle makes the driver gate certify the Python
    # path end-to-end).  corpus_shuffle stays past-window: its radix
    # enumeration + 32-row SinglePartition cumsum runs in-window as
    # the core of token_offsets (the weighted generalization,
    # driver-green since r9).
    # token_budget / split_assign rotated past the window in round 13
    # (driver-certified green in CORRECTNESS_r12) to admit source_cap /
    # source_mix_weights: token_budget's map-side n_tokens + one
    # low-cardinality groupBy is exactly the incoming
    # source_mix_weights / length_buckets shape (same
    # size(split(trim(text))) expression, same small-key aggregate),
    # and split_assign's md5-mod bucketing expression family runs
    # in-window inside sequence_pack (32-way md5 shard key) and
    # feature_hash (md5-bucket hashing).  Both keep their pytest
    # DuckDB oracle differential; overlap pinned by the
    # window-coverage gate (tests/test_plans.py).
    "sequence_pack": q_sequence_pack,
    "sequence_pack_nostraddle": q_sequence_pack_nostraddle,
    # The last four never-driver-certified registry entries rotated
    # INTO the window in round 13 (r12 VERDICT #2 — finishing 92/92
    # lifetime certification): hashing-trick featurization
    # (explode -> md5-bucket -> (doc_id, bucket) partial-agg counts),
    # per-source rank cap (one source-hash exchange, text never
    # shuffles), temperature-based training-mix weights (one
    # low-cardinality groupBy + O(sources)-row normalizer window), and
    # power-of-two length-bucket curriculum stats (bit-length bucket
    # expression + ~60-bucket groupBy).
    "feature_hash": q_feature_hash,
    "source_cap": q_source_cap,
    "source_mix_weights": q_source_mix_weights,
    "length_buckets": q_length_buckets,
    # text_quality / doc_fingerprint / lang_id / ngram_jaccard rotated past
    # the window in round 9 to admit the four flagship LLM-pipeline
    # operators below (r8 VERDICT #1): the three map-only text-expression
    # entries were one family (in-window coverage continues via
    # repetition_ratio, pii_scrub, and vocab_topk), and ngram_jaccard's
    # broadcast-small-target join shape stays in-window via bm25_topk and
    # contamination_overlap.  The overlap is pinned by the window-coverage
    # gate (tests/test_plans.py) and all four keep their pytest oracle.
    "dedup_incremental": q_dedup_incremental,
    "pii_scrub": q_pii_scrub,
    "token_offsets": q_token_offsets,
    "unigram_surprisal": q_unigram_surprisal,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_ivf_topk": q_ann_ivf_topk,       # fully oracle-checked (see SQL twin)
    # embedding_group_stats rotated past the window in round 10 to admit
    # diversity_sample (r9 VERDICT #2): its per-group aggregate family
    # stays in-window via tpch_q1/dedup_embedding and its embedding
    # array expressions via ann_cosine_topk.  diversity_sample adds the
    # k-center greedy scan-with-literal-exemplars shape (recursive-CTE
    # oracle) the window lacked.
    "diversity_sample": q_diversity_sample,
    "sessionize": q_sessionize,
    "dedup_cluster": q_dedup_cluster,
    "bm25_topk": q_bm25_topk,
    # Round-10 operators rotated INTO the window in round 11 (r10
    # VERDICT #1): MOSS winnowing overlap pairs (window-min fingerprint
    # selection + hash-keyed pair join), PMI collocation mining
    # (map-only bigram extraction + corpus-stats broadcast), passage-
    # level duplication audit (16-token chunk digests + corpus counts),
    # and bigram-LM surprisal (Laplace-smoothed conditional bigram
    # probability) — donors and family coverage documented at the top
    # of this dict.
    "winnowing_pairs": q_winnowing_pairs,
    "pmi_collocations": q_pmi_collocations,
    "passage_dedup": q_passage_dedup,
    "bigram_surprisal": q_bigram_surprisal,
}

# Reader-layer differential gate (§2A readers under the driver's hard
# check — see reader_gate.py): the real read_otlp_*/read_otap_* pipeline vs
# typed VALUES from an independent row-wise flattener.  Registered here —
# inside the driver's 50-entry snapshot window.
from duckdb_otlp_spark.reader_gate import (  # noqa: E402
    READER_GATE_QUERIES,
    READER_GATE_SQL,
)

QUERIES.update(READER_GATE_QUERIES)

# Past the driver's 50-entry snapshot boundary from here on: trivial scalar
# variants (IN-list, LIKE, CASE, IS NULL, scalar string/date/array functions,
# make_timestamp, hex codec, set ops, simple subqueries) whose behaviour is
# redundantly exercised by in-window siblings (ilike/json_extract/
# correlated_subquery cover the same expression families) and by the pytest
# oracle differential over every registered entry.
QUERIES.update({
    # point_lookup / regexp / time_bucket / except_all rotated past the
    # window in round 11 to admit the four round-10 operators (see the
    # in-window comment at the top of QUERIES for the family argument);
    # each keeps its pytest DuckDB oracle differential and its dedicated
    # plan pins (point_lookup's raw-ns pushdown gate stays in
    # tests/test_plans.py).
    "point_lookup": q_point_lookup,
    "regexp": q_regexp,
    "time_bucket": q_time_bucket,
    "except_all": q_except,
    # unnest_struct moved past the window in round 6 to make room for
    # read_otap_traces (second OTAP signal under the driver hard gate);
    # its struct-explode family stays covered in-window by
    # multimodal_features and the reader structs, and by the pytest
    # oracle differential like every past-window entry.
    "unnest_struct": q_unnest_struct,
    # join_inner / token_count moved past the window in round 7 to make
    # room for read_otap_metrics_gauge / read_otap_metrics_sum (third and
    # fourth OTAP signals under the driver hard gate).  Inner equi-join
    # coverage stays in-window via join_multi, tpch_q3, and asof_join;
    # map-only text-expression coverage stays in-window via text_quality,
    # doc_fingerprint, repetition_ratio, and lang_id.  The family overlap
    # is pinned by tests/test_plans.py (window-coverage gate) and every
    # past-window entry keeps its pytest DuckDB oracle differential.
    "join_inner": q_join_inner,
    "token_count": q_token_count,
    # topn_groups / window_running_sum moved past the window in round 7 to
    # make room for read_otap_metrics_histogram / _exp_histogram (fifth and
    # sixth OTAP signals — all six read_otap_* readers now under the driver
    # hard gate).  Ranked-window coverage stays in-window via
    # window_topk_per_group (same rank-then-filter shape) and tail_topk;
    # running-aggregate window coverage stays in-window via sessionize,
    # whose plan contains the same unbounded-preceding running-sum window.
    # The family overlap is pinned by tests/test_plans.py (window-coverage
    # gate) and both keep their pytest DuckDB oracle differential.
    "topn_groups": q_topn_groups,
    "window_running_sum": q_window_running_sum,
    # text_quality / doc_fingerprint / lang_id / ngram_jaccard rotated past
    # the window in round 9 to admit dedup_incremental / pii_scrub /
    # token_offsets / unigram_surprisal to the driver hard gate (r8 VERDICT
    # #1).  Map-only text-expression coverage stays in-window via
    # repetition_ratio (same split(trim()) tokenizer), pii_scrub (chained
    # regexp_replace), and vocab_topk; ngram_jaccard's broadcast-small-
    # target join stays in-window via bm25_topk and contamination_overlap.
    # Overlap pinned by tests/test_plans.py; pytest oracles retained.
    "text_quality": q_text_quality,
    "doc_fingerprint": q_doc_fingerprint,
    "lang_id": q_lang_id,
    "ngram_jaccard": q_ngram_jaccard,
    "like_search": q_like_search,
    "count_distinct": q_count_distinct,
    "scalar_subquery": q_scalar_subquery,
    "cross_cte": q_cross_cte,
    "in_list": q_in_list,
    "case_when": q_case_when,
    "coalesce_cast": q_coalesce_cast,
    "null_checks": q_null_checks,
    "string_funcs": q_string_funcs,
    "date_trunc": q_date_trunc,
    "make_timestamp": q_make_timestamp,
    "hex_roundtrip": q_hex_roundtrip,
    "array_ops": q_array_ops,
    "union_all": q_union_all,
    "distinct": q_distinct,
    # feature_hash / source_cap / source_mix_weights / length_buckets
    # rotated INTO the window in round 13 (registered in the in-window
    # section above — r12 VERDICT #2).  corpus_shuffle stays
    # past-window: its radix enumeration + 32-row SinglePartition
    # cumsum runs in-window as the core of token_offsets.
    "corpus_shuffle": q_corpus_shuffle,
    # token_budget / split_assign / repetition_ratio / vocab_topk
    # rotated past the window in round 13 to admit the four entries
    # above (see the in-window comments for the family-coverage
    # arguments); each keeps its pytest DuckDB oracle differential.
    "token_budget": q_token_budget,
    "split_assign": q_split_assign,
    "repetition_ratio": q_repetition_ratio,
    "vocab_topk": q_vocab_topk,
    # tpch_q6 / dedup_exact / stratified_sample / embedding_bucket_ann
    # rotated past the window in round 12 to admit the four
    # packing/budget entries (see the in-window comment above tpch_q3
    # for the family-coverage argument); each keeps its pytest DuckDB
    # oracle differential and any dedicated plan pins.
    "tpch_q6": q_tpch_q6,
    "dedup_exact": q_dedup_exact,
    "stratified_sample": q_stratified_sample,
    "embedding_bucket_ann": q_embedding_bucket_ann,
    # agg_stats / percentile / minhash_signature / embedding_group_stats
    # rotated past the window in round 10 to admit the four r9 operators
    # tfidf_topk / split_leakage / diversity_sample / latency_quantiles
    # to the driver hard gate (r9 VERDICT #2).  In-window family coverage:
    # percentile's exact-percentile aggregate is strictly subsumed by
    # latency_quantiles; agg_stats' count/avg/sum groupBy by tpch_q1;
    # minhash_signature runs verbatim inside minhash_lsh_pairs; and
    # embedding_group_stats' agg + embedding-array expressions by
    # tpch_q1/dedup_embedding/ann_cosine_topk.  Overlap pinned by the
    # window-coverage gate (tests/test_plans.py); all four keep their
    # pytest DuckDB oracle differential.
    "agg_stats": q_agg_stats,
    "percentile": q_percentile,
    "minhash_signature": q_minhash_signature,
    "embedding_group_stats": q_embedding_group_stats,
    # simhash rotated past the window in round 10 to admit semdedup
    # (see the in-window comment at the semdedup entry for the family
    # argument); it keeps its pytest DuckDB oracle differential.
    "simhash": q_simhash,
})

ORACLE_SQL: dict[str, str] = {
    "tail_topk": SQL_TAIL_TOPK,
    "point_lookup": SQL_POINT_LOOKUP,
    "in_list": SQL_IN_LIST,
    "like_search": SQL_LIKE_SEARCH,
    "ilike_search": SQL_ILIKE_SEARCH,
    "regexp": SQL_REGEXP,
    "case_when": SQL_CASE_WHEN,
    "coalesce_cast": SQL_COALESCE_CAST,
    "null_checks": SQL_NULL_CHECKS,
    "json_extract": SQL_JSON_EXTRACT,
    "string_funcs": SQL_STRING_FUNCS,
    "date_trunc": SQL_DATE_TRUNC,
    "time_bucket": SQL_TIME_BUCKET,
    "make_timestamp": SQL_MAKE_TIMESTAMP,
    "hex_roundtrip": SQL_HEX_ROUNDTRIP,
    "array_ops": SQL_ARRAY_OPS,
    "unnest_struct": SQL_UNNEST_STRUCT,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "dedup_embedding": SQL_DEDUP_EMBEDDING,
    "agg_stats": SQL_AGG_STATS,
    "percentile": SQL_PERCENTILE,
    "count_distinct": SQL_COUNT_DISTINCT,
    "topn_groups": SQL_TOPN_GROUPS,
    "join_inner": SQL_JOIN_INNER,
    "join_multi": SQL_JOIN_MULTI,
    "scalar_subquery": SQL_SCALAR_SUBQUERY,
    "correlated_subquery": SQL_CORRELATED_SUBQUERY,
    "cross_cte": SQL_CROSS_CTE,
    "union_all": SQL_UNION_ALL,
    "except_all": SQL_EXCEPT,
    "distinct": SQL_DISTINCT,
    "window_topk_per_group": SQL_WINDOW_TOPK,
    "window_running_sum": SQL_WINDOW_RUNNING_SUM,
    "tpch_q1": SQL_TPCH_Q1,
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q6": SQL_TPCH_Q6,
    "dedup_exact": SQL_DEDUP_EXACT,
    "minhash_signature": SQL_MINHASH_SIGNATURE,
    "minhash_lsh_pairs": SQL_MINHASH_LSH_PAIRS,
    "simhash": SQL_SIMHASH,
    "embedding_bucket_ann": SQL_EMBEDDING_BUCKET_ANN,
    "token_count": SQL_TOKEN_COUNT,
    "text_quality": SQL_TEXT_QUALITY,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "embedding_group_stats": SQL_EMBEDDING_GROUP_STATS,
    "lang_id": SQL_LANG_ID,
    "sessionize": SQL_SESSIONIZE,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "dedup_cluster": SQL_DEDUP_CLUSTER,
    "bm25_topk": SQL_BM25_TOPK,
    "asof_join": SQL_ASOF_JOIN,
    "contamination_overlap": SQL_CONTAMINATION_OVERLAP,
    "repetition_ratio": SQL_REPETITION_RATIO,
    "vocab_topk": SQL_VOCAB_TOPK,
    "token_budget": SQL_TOKEN_BUDGET,
    "feature_hash": SQL_FEATURE_HASH,
    "split_assign": SQL_SPLIT_ASSIGN,
    "sequence_pack": SQL_SEQUENCE_PACK,
    "sequence_pack_nostraddle": SQL_SEQUENCE_PACK_NOSTRADDLE,
    "source_cap": SQL_SOURCE_CAP,
    "corpus_shuffle": SQL_CORPUS_SHUFFLE,
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
    "pii_scrub": SQL_PII_SCRUB,
    "source_mix_weights": SQL_SOURCE_MIX_WEIGHTS,
    "length_buckets": SQL_LENGTH_BUCKETS,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "split_leakage": SQL_SPLIT_LEAKAGE,
    "diversity_sample": SQL_DIVERSITY_SAMPLE,
    "latency_quantiles": SQL_LATENCY_QUANTILES,
    "token_offsets": SQL_TOKEN_OFFSETS,
    "unigram_surprisal": SQL_UNIGRAM_SURPRISAL,
    "semdedup": SQL_SEMDEDUP,
    "winnowing_pairs": SQL_WINNOWING_PAIRS,
    "pmi_collocations": SQL_PMI_COLLOCATIONS,
    "passage_dedup": SQL_PASSAGE_DEDUP,
    "bigram_surprisal": SQL_BIGRAM_SURPRISAL,
}

ORACLE_SQL.update(READER_GATE_SQL)
