"""PySpark-native analytics engine with the query semantics of the reference
Music-Streaming ETL Pipeline (Kwame842/Music-Streaming-ETL-Pipeline-with-AWS-Glue-DynamoDB-MWAA).

The reference (at /root/reference/Music-Streaming-ETL-Pipeline) is an AWS
Glue + DynamoDB + MWAA pipeline specification; this package re-expresses its
data model, operators and pipeline semantics as first-class, reusable PySpark
operators (DataFrame/SQL-first, Catalyst-optimized), plus the LLM-data-pipeline
extension surface (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE, UTC, dynamic partition overwrite)
- ``schemas``    explicit StructTypes for the music domain + synthetic testdata
- ``sources``    csv/parquet/file-stream sources and sinks
- ``operators``  validation split, KPI aggregation, top-k windows, KV
                 projection, dedup, similarity search, text analysis,
                 multimodal plumbing
- ``functions``  reusable column expressions (safe division, composite keys,
                 shingles, minhash/simhash)
- ``plans``      the batch pipeline driver, processing ledger, local KV store
- ``streaming``  Structured Streaming file-source ingest (Trigger.AvailableNow)
"""

__version__ = "0.1.0"
