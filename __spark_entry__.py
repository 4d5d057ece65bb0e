"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark``;
this module only wires operators to the driver contract. Computed doubles are
rounded on BOTH sides (Spark and oracle SQL) so parallel-summation order
can't flip the value hash; ranks get deterministic tie-breaks mirrored in the
oracle (SURVEY.md §2.5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import kpi
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog


def _streams_songs(spark: SparkSession, sf_dir: str):
    streams = catalog.streams_from_lineitem(catalog.load_table(spark, sf_dir, "lineitem"))
    songs = catalog.songs_from_part(catalog.load_table(spark, sf_dir, "part"))
    return streams, songs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §3.2) on /root/testdata/sf0.001."""
    streams, songs = _streams_songs(spark, "/root/testdata/sf0.001")
    return kpi.genre_kpi_pipeline(streams, songs)


# --------------------------------------------------------------------------
# queries() / oracle_sql() registry. Each operator registers itself as a
# (callable, sql) pair; keys match between the two dicts unless the op is not
# SQL-expressible (then sql is None and the driver records a rows-only check).
# --------------------------------------------------------------------------

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def _register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None) -> None:
    _REGISTRY[name] = (fn, sql)


def _q_daily_genre_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    streams, songs = _streams_songs(spark, sf_dir)
    return kpi.genre_kpi_pipeline(streams, songs)


_register(
    "daily_genre_kpis",
    _q_daily_genre_kpis,
    # duration stand-in = p_retailprice in exact integer cents (see
    # sources/catalog.songs_from_part): integer sums are order-exact, and the
    # derived avg is one IEEE division → bitwise-identical across engines.
    """
    SELECT listen_date, track_genre, unique_listeners, total_listening_time,
           listen_count,
           CAST(total_listening_time AS DOUBLE) / NULLIF(unique_listeners, 0)
               AS avg_listening_time_per_user
    FROM (
      SELECT CAST(l_shipdate AS DATE)                          AS listen_date,
             p_type                                            AS track_genre,
             count(DISTINCT l_suppkey)                         AS unique_listeners,
             CAST(SUM(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT)
                                                               AS total_listening_time,
             count(*)                                          AS listen_count
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    )
    """,
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}
