"""CDC changelog application: fold an insert/update/delete log into a
snapshot — the lakehouse MERGE-from-CDC pattern (Delta's ``APPLY CHANGES``,
Debezium→Hudi ingestion, Iceberg upsert feeds).

The reference's closest surface is the per-run KV overwrite
(``REF/glue_jobs/load_dynamo.py`` — last write wins, no ordering, deletes
impossible). This operator gives the real semantics: a TOTALLY ORDERED
changelog (sequence number / LSN / commit ts per key) replayed onto a base
snapshot, where only each key's LATEST entry decides survival and a
tombstone (``op = delete``) removes the key.

Spark-first shape — NO join: base rows and change rows are union'd with a
sequence sentinel (base sorts before every change), then one rank-1 window
per key keeps the winner and a filter drops tombstones. That is ONE hash
exchange keyed by the key columns, and Spark ≥3.5 plans the rank-1 as
WindowGroupLimit (per-map-task partial top-1), so the shuffle carries ~one
row per key per map task — the same shape as ``operators/merge.py``'s
SCD-1 upsert, extended with ordering + deletes. At 100 TB the cost is the
min possible for the semantics: every surviving key's bytes cross the wire
once; a skewed hot key is a non-issue (top-1 partials collapse it map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(snapshot: DataFrame, changes: DataFrame, keys: list[str],
                  seq_col: str, *, op_col: str = "op",
                  delete_op: str = "D") -> DataFrame:
    """New snapshot after replaying ``changes`` over ``snapshot``.

    ``changes`` must carry the snapshot's columns plus ``seq_col`` (a
    per-key total order; duplicate (key, seq) pairs are a caller contract
    violation — they resolve deterministically by ``op_col`` descending,
    so replays stay stable, but which data row wins is then unspecified)
    and ``op_col`` with ``delete_op`` marking tombstones (any other value
    upserts the row).

    Base snapshot rows rank BELOW every change for the same key (NULL
    sentinel, ``desc_nulls_last``), so a key untouched by the log survives
    unchanged, an upserted key takes its latest change row, and a deleted
    key vanishes. Output schema == snapshot schema.
    """
    data_cols = snapshot.columns
    seq_type = dict(changes.dtypes)[seq_col]
    base = snapshot.select(
        *data_cols,
        F.lit(None).cast(seq_type).alias("_seq"),
        F.lit("U").alias("_op"))
    chg = changes.select(
        *data_cols,
        F.col(seq_col).cast(seq_type).alias("_seq"),
        F.col(op_col).alias("_op"))
    w = Window.partitionBy(*keys).orderBy(
        F.col("_seq").desc_nulls_last(), F.col("_op").desc())
    return (base.unionByName(chg)
            .withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col("_op") != delete_op))
            .select(*data_cols))


def change_counts(changes: DataFrame, keys: list[str], seq_col: str, *,
                  op_col: str = "op") -> DataFrame:
    """Per-key replay summary — (keys..., n_changes, first_seq, last_seq,
    last_op): the audit frame an ingestion job logs next to the applied
    snapshot. One hash agg; ``max_by`` picks the final op without a second
    window pass."""
    return changes.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.min(seq_col).alias("first_seq"),
        F.max(seq_col).alias("last_seq"),
        F.max_by(op_col, F.col(seq_col)).alias("last_op"))
