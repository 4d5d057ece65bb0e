"""Oracle-checked query registry: the reference operator surface
(SURVEY.md §2 ✓ rows) expressed over the driver's synthetic tables.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with the
equivalent ANSI SQL for the DuckDB oracle. Conventions that keep the
order-insensitive value hash stable across engines (see
tools/oracle_check.py and .claude/skills/verify/SKILL.md):

- identical column aliases on both sides (driver sorts columns by name);
- no ROUND on computed doubles — integral measures + single IEEE division;
- deterministic tie-breaks inside every window (SURVEY.md §2.5);
- explicit casts where Spark and DuckDB default types differ
  (row_number int32 vs int64; ns timestamps).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators import kpi, kv_projection, skew, topk, validate
from .sources import catalog, io

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn
    return deco


def _streams_songs(spark: SparkSession, sf_dir: str):
    streams = catalog.streams_from_lineitem(catalog.load_table(spark, sf_dir, "lineitem"))
    songs = catalog.songs_from_part(catalog.load_table(spark, sf_dir, "part"))
    return streams, songs


def _joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    streams, songs = _streams_songs(spark, sf_dir)
    return kpi.join_streams_songs(kpi.with_listen_date(streams), songs)


# The songs-dim stand-in (part) in SQL, shared by several oracles — mirrors
# sources.catalog.songs_from_part (duration = exact integer cents).
_SONGS_SQL = """
    SELECT p_partkey AS track_id, p_name AS track_name, p_type AS track_genre,
           CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS duration_ms
    FROM part
"""

_JOINED_SQL = f"""
    SELECT CAST(l_shipdate AS DATE) AS listen_date, s.*
    FROM lineitem JOIN ({_SONGS_SQL}) s ON l_partkey = s.track_id
"""


# --------------------------------------------------------------------------
# Flagship: daily genre KPIs (S2/S3, F1-F3, J1, A1, A4 — transform.py:13-36)
# --------------------------------------------------------------------------

@register("daily_genre_kpis", f"""
    SELECT listen_date, track_genre, unique_listeners, total_listening_time,
           listen_count,
           CAST(total_listening_time AS DOUBLE) / NULLIF(unique_listeners, 0)
               AS avg_listening_time_per_user
    FROM (
      SELECT CAST(l_shipdate AS DATE)                        AS listen_date,
             s.track_genre,
             count(DISTINCT l_suppkey)                       AS unique_listeners,
             CAST(SUM(s.duration_ms) AS BIGINT)              AS total_listening_time,
             count(*)                                        AS listen_count
      FROM lineitem JOIN ({_SONGS_SQL}) s ON l_partkey = s.track_id
      GROUP BY 1, 2
    )
""")
def daily_genre_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    streams, songs = _streams_songs(spark, sf_dir)
    return kpi.genre_kpi_pipeline(streams, songs)


def _daily_genre_kpis_hll_sql() -> str:
    """Oracle for the portable-HLL approx KPI: exact sums in plain SQL,
    the uniques estimate through pyref.hll_estimate_cte (same
    driver-injected literals as the Spark plan, DuckDB-side md5/bin)."""
    from .operators.pyref import hll_estimate_cte
    return f"""
    WITH j AS (
        SELECT CAST(l_shipdate AS DATE) AS listen_date, s.track_genre,
               s.duration_ms, l_suppkey AS user_id
        FROM lineitem JOIN ({_SONGS_SQL}) s ON l_partkey = s.track_id),
    exact AS (
        SELECT listen_date, track_genre,
               CAST(SUM(duration_ms) AS BIGINT) AS total_listening_time,
               count(*) AS listen_count
        FROM j GROUP BY 1, 2),
    vals AS (
        SELECT DISTINCT listen_date, track_genre,
               CAST(user_id AS VARCHAR) AS v
        FROM j WHERE user_id IS NOT NULL),
    {hll_estimate_cte(['listen_date', 'track_genre'])}
    SELECT e.listen_date, e.track_genre, h.est AS unique_listeners_est,
           e.total_listening_time, e.listen_count,
           CAST(e.total_listening_time AS DOUBLE) / h.est
               AS avg_listening_time_per_user
    FROM exact e LEFT JOIN hll_est h
         ON e.listen_date = h.listen_date
         AND e.track_genre = h.track_genre
    """


@register("daily_genre_kpis_approx", _daily_genre_kpis_hll_sql)
def daily_genre_kpis_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale variant of A1: the distinct-expand double shuffle is
    replaced by a cardinality sketch (SURVEY.md §2.4). PROMOTED to
    oracle-exact in round 11 (VERDICT r10 item 2) by routing the
    estimate through the portable register-table HLL
    (operators/sketches.py §HLL-as-a-table; kpi.
    daily_genre_kpis_portable_approx). The engine-native
    approx_count_distinct path stays available via
    genre_kpi_pipeline(approx=True), error-bounded in
    tests/test_kpi.py::test_approx_kpis_within_rsd."""
    streams, songs = _streams_songs(spark, sf_dir)
    joined = kpi.join_streams_songs(kpi.with_listen_date(streams), songs)
    return kpi.daily_genre_kpis_portable_approx(joined)


# --------------------------------------------------------------------------
# Top-k windows (W1/W2, F6, A2/A3, O2 — transform.py:39-50)
# --------------------------------------------------------------------------

@register("top_songs_per_genre", f"""
    SELECT listen_date, track_genre, track_name, listen_count,
           CAST(rnk AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
          PARTITION BY listen_date, track_genre
          ORDER BY listen_count DESC, track_name) AS rnk
      FROM (
        SELECT listen_date, track_genre, track_name, count(*) AS listen_count
        FROM ({_JOINED_SQL}) GROUP BY 1, 2, 3
      )
    ) WHERE rnk <= 3
""")
def top_songs_per_genre(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.top_songs_per_genre(_joined(spark, sf_dir))


@register("top_genres_per_day", f"""
    SELECT listen_date, track_genre, listen_count, CAST(rnk AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
          PARTITION BY listen_date
          ORDER BY listen_count DESC, track_genre) AS rnk
      FROM (
        SELECT listen_date, track_genre, count(*) AS listen_count
        FROM ({_JOINED_SQL}) GROUP BY 1, 2
      )
    ) WHERE rnk <= 5
""")
def top_genres_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.top_genres_per_day(_joined(spark, sf_dir))


# --------------------------------------------------------------------------
# Validation split (F4/F5 — validate.py:34-45). The synthetic tables have no
# nulls, so both engines inject the same deterministic nulls first.
# --------------------------------------------------------------------------

_EV_REQUIRED = ["event_id", "user_id", "ts", "event_type"]

_EV_WITH_NULLS_SQL = """
    SELECT event_id,
           CAST(ts AS TIMESTAMP) AS ts,
           CASE WHEN event_id % 97 = 0 THEN NULL ELSE user_id END AS user_id,
           CASE WHEN event_id % 101 = 0 THEN NULL ELSE event_type END AS event_type,
           value, props
    FROM events
"""


def _events_with_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", "ts",
        F.when(F.col("event_id") % 97 == 0, None).otherwise(F.col("user_id")).alias("user_id"),
        F.when(F.col("event_id") % 101 == 0, None).otherwise(F.col("event_type")).alias("event_type"),
        "value", "props",
    )


@register("validate_split_good", f"""
    SELECT * FROM ({_EV_WITH_NULLS_SQL})
    WHERE event_id IS NOT NULL AND user_id IS NOT NULL
      AND ts IS NOT NULL AND event_type IS NOT NULL
""")
def validate_split_good(spark: SparkSession, sf_dir: str) -> DataFrame:
    good, _ = validate.split_valid_invalid(_events_with_nulls(spark, sf_dir), _EV_REQUIRED)
    return good


@register("validate_split_bad", f"""
    SELECT * FROM ({_EV_WITH_NULLS_SQL})
    WHERE NOT (event_id IS NOT NULL AND user_id IS NOT NULL
               AND ts IS NOT NULL AND event_type IS NOT NULL)
""")
def validate_split_bad(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, bad = validate.split_valid_invalid(_events_with_nulls(spark, sf_dir), _EV_REQUIRED)
    return bad


# --------------------------------------------------------------------------
# KV projections (F7-F9, S10 keying — load_dynamo.py:121-153)
# --------------------------------------------------------------------------

_KPIS_SQL = REGISTRY["daily_genre_kpis"][1]


@register("kv_genre_kpi_items", f"""
    SELECT CAST(listen_date AS VARCHAR)                  AS date,
           track_genre                                   AS genre,
           listen_count,
           unique_listeners,
           CAST(total_listening_time AS DOUBLE)          AS total_listening_time,
           COALESCE(avg_listening_time_per_user, 0.0)    AS avg_listen_time_per_user
    FROM ({_KPIS_SQL})
    WHERE listen_date IS NOT NULL AND track_genre IS NOT NULL
      AND CAST(track_genre AS VARCHAR) <> ''
""")
def kv_genre_kpi_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kv_projection.genre_kpi_items(daily_genre_kpis(spark, sf_dir))


@register("kv_top_song_items", f"""
    SELECT CAST(listen_date AS VARCHAR)                      AS date,
           track_genre || '#' || track_name                  AS genre_track,
           track_genre                                       AS genre,
           track_name,
           CAST(listen_count AS BIGINT)                      AS play_count,
           CAST(rank AS BIGINT)                              AS rank
    FROM ({REGISTRY["top_songs_per_genre"][1]})
    WHERE listen_date IS NOT NULL AND track_genre <> '' AND track_name <> ''
""")
def kv_top_song_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kv_projection.top_song_items(top_songs_per_genre(spark, sf_dir))


@register("kv_top_genre_items", f"""
    SELECT CAST(listen_date AS VARCHAR)    AS date,
           track_genre                     AS genre,
           CAST(listen_count AS BIGINT)    AS listen_count,
           CAST(rank AS BIGINT)            AS rank
    FROM ({REGISTRY["top_genres_per_day"][1]})
    WHERE listen_date IS NOT NULL AND track_genre <> ''
""")
def kv_top_genre_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kv_projection.top_genre_items(top_genres_per_day(spark, sf_dir))


# --------------------------------------------------------------------------
# Latest-partition selection (S5/A5 — load_dynamo.py:27-39): on a
# date-partitioned lake this is a metadata-only max + partition-pruned scan.
# --------------------------------------------------------------------------

@register("latest_day_kpis", f"""
    SELECT * FROM ({_KPIS_SQL})
    WHERE listen_date = (SELECT max(CAST(l_shipdate AS DATE)) FROM lineitem)
""")
def latest_day_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max date comes from the RAW fact's date column (a column-pruned scan
    + max — metadata-only on a date-partitioned lake), and it filters the
    fact BEFORE the join/aggregate, so the KPI chain runs over one day's
    rows instead of aggregating everything twice and joining the results."""
    streams, songs = _streams_songs(spark, sf_dir)
    dated = kpi.with_listen_date(streams)
    latest = dated.agg(F.max("listen_date").alias("_latest"))
    on_latest = dated.join(F.broadcast(latest),
                           dated["listen_date"] == F.col("_latest")
                           ).drop("_latest")
    return kpi.daily_genre_kpis(kpi.join_streams_songs(on_latest, songs))


# --------------------------------------------------------------------------
# CSV scan (S1/S2 — REF/glue_jobs/validate.py:19-23, transform.py:16) +
# corrupt-record routing (PERMISSIVE, sources.io.read_csv). The testdata is
# parquet, so the queries materialize a deterministic CSV fixture from the
# documents table once per sf (Spark CSV writer for the clean rows + two
# hand-planted malformed lines), then drive the real scan path over it.
# --------------------------------------------------------------------------

_CSV_DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
])

# one fails long-coercion on doc_id, one is short a few columns — the two
# malformed shapes PERMISSIVE must route to _corrupt_record (probed: both do)
_CSV_BAD_LINES = ["not_a_number,en,web,12,hello world", "123,en"]

_CSV_FIXTURE_VERSION = "v1"


def _csv_fixture(spark: SparkSession, sf_dir: str) -> list[str]:
    """Materialize the CSV fixture for ``sf_dir`` (idempotent, marker-gated).

    Layout: ``<fix>/good/part-*.csv`` (Spark-written, header per file) +
    ``<fix>/bad/planted.csv`` (header + the malformed lines). Returns the
    two CONCRETE directories (one scan covers both) rather than a glob:
    Spark's FileStreamSink metadata probe stat()s the raw path string and
    logs a full FileNotFoundException stack trace for every glob — noise
    that buried real errors in the round-4 oracle log (VERDICT item 2).
    Integer/string columns only — CSV round-trips them bit-exactly (no
    float/timestamp formatting trap).
    """
    fix = os.path.join(tempfile.gettempdir(), "spark_graft_fixtures",
                       f"csv_docs_{_CSV_FIXTURE_VERSION}",
                       os.path.basename(os.path.normpath(sf_dir)))
    marker = os.path.join(fix, "_READY")
    if not os.path.exists(marker):
        docs = catalog.load_table(spark, sf_dir, "documents")
        io.write_csv(docs.select(*[f.name for f in _CSV_DOCS_SCHEMA.fields]),
                     os.path.join(fix, "good"))
        os.makedirs(os.path.join(fix, "bad"), exist_ok=True)
        with open(os.path.join(fix, "bad", "planted.csv"), "w") as fh:
            fh.write("doc_id,lang,source,n_chars,text\n")
            fh.writelines(ln + "\n" for ln in _CSV_BAD_LINES)
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return [os.path.join(fix, "good"), os.path.join(fix, "bad")]


@register("csv_scan_roundtrip", """
    SELECT doc_id, lang, source, n_chars, text FROM documents
""")
def csv_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 clean path: documents → CSV → PERMISSIVE scan → validation
    split; the good side must equal the original projection bit-for-bit
    (the planted malformed lines route to the bad side)."""
    raw = io.read_csv(spark, _csv_fixture(spark, sf_dir), _CSV_DOCS_SCHEMA)
    good, _ = validate.split_valid_invalid(raw, ["doc_id", "text"])
    return good.drop(io.CORRUPT_COL)


@register("csv_scan_corrupt_routing", """
    SELECT * FROM (VALUES
        ('not_a_number,en,web,12,hello world',
         CAST(NULL AS BIGINT), 'en', 'web', CAST(12 AS BIGINT), 'hello world'),
        ('123,en',
         CAST(123 AS BIGINT), 'en', CAST(NULL AS VARCHAR),
         CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)))
        AS t(_corrupt_record, doc_id, lang, source, n_chars, text)
""")
def csv_scan_corrupt_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9-side of the CSV scan: the planted malformed lines surface with
    their raw text in ``_corrupt_record`` plus whatever fields PERMISSIVE
    salvaged (failed long-coercion → null doc_id; short row → parsed
    prefix). The FULL row is projected deliberately: CSV column pruning
    only flags under-length rows when every schema column is parsed, and
    Spark disallows corrupt-only projections from raw CSV anyway."""
    raw = io.read_csv(spark, _csv_fixture(spark, sf_dir), _CSV_DOCS_SCHEMA)
    _, bad = validate.split_valid_invalid(raw, ["doc_id", "text"])
    return bad.select(io.CORRUPT_COL, "doc_id", "lang", "source",
                      "n_chars", "text")


# --------------------------------------------------------------------------
# Scan + projection + predicate pushdown (S3, F1 — transform.py:13,20)
# --------------------------------------------------------------------------

@register("scan_project_filter", """
    SELECT p_partkey, p_name, p_size, p_retailprice
    FROM part WHERE p_size < 15
""")
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = catalog.load_table(spark, sf_dir, "part")
    return part.select("p_partkey", "p_name", "p_size", "p_retailprice").filter(
        F.col("p_size") < 15)


# --------------------------------------------------------------------------
# Daily tumbling aggregation over the events stream table (§2.9: the
# reference's daily grouping ≡ 1-day tumbling window in batch mode).
# min/max instead of sum(value): order-exact under parallel aggregation.
# --------------------------------------------------------------------------

@register("events_daily_agg", """
    SELECT CAST(ts AS DATE)              AS event_date,
           event_type,
           count(*)                      AS n_events,
           count(DISTINCT user_id)       AS unique_users,
           min(value)                    AS min_value,
           max(value)                    AS max_value
    FROM events GROUP BY 1, 2
""")
def events_daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date("ts").alias("event_date"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("unique_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# --------------------------------------------------------------------------
# Skew-robust aggregation variants (operators.skew; SURVEY.md §7 Phase 4).
# Same answers as the direct plans — the point is the exchange layout.
# --------------------------------------------------------------------------

@register("lineitem_agg_salted", """
    SELECT l_returnflag,
           count(*)                                  AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           min(l_extendedprice)                      AS min_price,
           max(l_extendedprice)                      AS max_price
    FROM lineitem GROUP BY 1
""")
def lineitem_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (hot-key spreading); integral-cast sum
    keeps the value associative-exact for the oracle hash."""
    li = catalog.load_table(spark, sf_dir, "lineitem")
    return skew.salted_agg(li, ["l_returnflag"], {
        "n_rows": ("count", F.lit(1)),
        "total_qty": ("sum", F.col("l_quantity").cast("long")),
        "min_price": ("min", "l_extendedprice"),
        "max_price": ("max", "l_extendedprice"),
    }, buckets=16)


@register("events_unique_users_skew_robust", """
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           count(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY 1, 2
""")
def events_unique_users_skew_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count via the (key, value) shuffle rewrite — no
    distinct-expand, hot keys spread by value cardinality."""
    ev = catalog.load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("event_date"), "event_type", "user_id")
    return skew.two_phase_count_distinct(
        ev, ["event_date", "event_type"], "user_id")


# --------------------------------------------------------------------------
# JSON property extraction (extension E4 seed: events.props is a JSON doc)
# --------------------------------------------------------------------------

@register("events_props_extract", """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
""")
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("prop_k")).filter(F.col("prop_k") >= 50)
