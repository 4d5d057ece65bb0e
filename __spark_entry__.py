"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark``;
this module only wires operators to the driver contract. Hash-parity
convention for computed doubles: NEVER ROUND them — Spark rounds decimal
strings HALF_UP while DuckDB rounds binary doubles, and they disagree at .5
boundaries. Instead every registered query computes exact integer measures
and derives at most ONE IEEE division (bit-identical across engines); ranks
get deterministic tie-breaks mirrored in the oracle (SURVEY.md §2.5,
.claude/skills/verify/SKILL.md gotchas).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark import (
    queries_extensions,  # noqa: F401  (imports populate the shared registry)
    queries_reference,
)
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import kpi
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §3.2) on /root/testdata/sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    streams = catalog.streams_from_lineitem(catalog.load_table(spark, sf_dir, "lineitem"))
    songs = catalog.songs_from_part(catalog.load_table(spark, sf_dir, "part"))
    return kpi.genre_kpi_pipeline(streams, songs)


def _registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    reg: dict = {}
    reg.update(queries_reference.REGISTRY)
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _registry().items() if sql is not None}
