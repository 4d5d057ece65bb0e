"""Local KV sink with a DynamoDB-shaped interface (SURVEY.md §2.1 S10/S11).

Mirrors the observable surface of the reference's DynamoDB layer —
``create_table_if_not_exists`` (``REF/glue_jobs/load_dynamo.py:41-55``, DDL at
:83-117), ``put_item`` via 25-item batch writer (:69-78), ``get_item`` /
``update_item`` ledger calls (``REF/dags/music_etl_pipeline.py:34-56``) — over
an embedded sqlite file, so the whole pipeline runs hermetically.

The Spark-facing write path is ``write_dataframe``: ``df.foreachPartition``
with a connection per partition and 25-item transactional batches — the same
shape as a real DynamoDB ``batch_writer`` loader on a cluster, and the fix
for the reference's driver-side full materialization
(``load_dynamo.py:61-62``). Swapping sqlite for boto3 changes only
``_PartitionWriter``.

Items are stored as JSON documents keyed by (hash_key, range_key), with
DynamoDB put_item upsert semantics.
"""

from __future__ import annotations

import json
import os
import sqlite3
from dataclasses import dataclass

from pyspark.sql import DataFrame

_SCHEMA = """
CREATE TABLE IF NOT EXISTS kv_tables (
    name TEXT PRIMARY KEY, hash_key TEXT NOT NULL, range_key TEXT
);
CREATE TABLE IF NOT EXISTS kv_items (
    tbl TEXT NOT NULL, hk TEXT NOT NULL, rk TEXT NOT NULL DEFAULT '',
    item TEXT NOT NULL, PRIMARY KEY (tbl, hk, rk)
);
"""


def _connect(path: str) -> sqlite3.Connection:
    con = sqlite3.connect(path, timeout=60)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA busy_timeout=60000")
    return con


@dataclass
class KVStore:
    path: str

    def __post_init__(self) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        with _connect(self.path) as con:
            con.executescript(_SCHEMA)

    # -- DDL (S11) ---------------------------------------------------------
    def ensure_table(self, name: str, hash_key: str, range_key: str | None = None) -> None:
        """CREATE TABLE IF NOT EXISTS semantics (REF/glue_jobs/load_dynamo.py:41-55)."""
        with _connect(self.path) as con:
            con.execute(
                "INSERT OR IGNORE INTO kv_tables(name, hash_key, range_key) VALUES (?,?,?)",
                (name, hash_key, range_key),
            )

    def table_keys(self, name: str) -> tuple[str, str | None]:
        with _connect(self.path) as con:
            row = con.execute(
                "SELECT hash_key, range_key FROM kv_tables WHERE name=?", (name,)
            ).fetchone()
        if row is None:
            raise KeyError(f"KV table not declared: {name}")
        return row[0], row[1]

    # -- item ops ----------------------------------------------------------
    def put_item(self, table: str, item: dict) -> None:
        hk_col, rk_col = self.table_keys(table)
        hk, rk = str(item[hk_col]), str(item[rk_col]) if rk_col else ""
        with _connect(self.path) as con:
            con.execute(
                "INSERT OR REPLACE INTO kv_items(tbl, hk, rk, item) VALUES (?,?,?,?)",
                (table, hk, rk, json.dumps(item, default=str)),
            )

    def put_item_if_absent(self, table: str, item: dict) -> bool:
        """Conditional put — DynamoDB's ``attribute_not_exists(pk)`` guard.
        One atomic statement (INSERT OR IGNORE + rowcount), so two racing
        writers can never both win: exactly one sees True."""
        hk_col, rk_col = self.table_keys(table)
        hk, rk = str(item[hk_col]), str(item[rk_col]) if rk_col else ""
        with _connect(self.path) as con:
            cur = con.execute(
                "INSERT OR IGNORE INTO kv_items(tbl, hk, rk, item) VALUES (?,?,?,?)",
                (table, hk, rk, json.dumps(item, default=str)),
            )
            return cur.rowcount == 1

    def get_item(self, table: str, hash_value, range_value=None) -> dict | None:
        with _connect(self.path) as con:
            row = con.execute(
                "SELECT item FROM kv_items WHERE tbl=? AND hk=? AND rk=?",
                (table, str(hash_value), str(range_value) if range_value is not None else ""),
            ).fetchone()
        return json.loads(row[0]) if row else None

    def update_item(self, table: str, hash_value, updates: dict, range_value=None) -> None:
        """Atomic merge-upsert (ledger status transitions,
        REF/dags/music_etl_pipeline.py:47-56): one ``ON CONFLICT DO UPDATE``
        with ``json_patch`` — concurrent updaters can interleave but never
        lose each other's disjoint fields (a read-modify-write would)."""
        hk_col, rk_col = self.table_keys(table)
        hk = str(hash_value)
        rk = str(range_value) if (rk_col and range_value is not None) else ""
        patch = dict(updates)
        patch[hk_col] = hk
        if rk_col and range_value is not None:
            patch[rk_col] = rk
        with _connect(self.path) as con:
            con.execute(
                "INSERT INTO kv_items(tbl, hk, rk, item) VALUES (?,?,?,json(?)) "
                "ON CONFLICT(tbl, hk, rk) DO UPDATE SET item=json_patch(item, excluded.item)",
                (table, hk, rk, json.dumps(patch, default=str)),
            )

    def scan(self, table: str) -> list[dict]:
        with _connect(self.path) as con:
            rows = con.execute("SELECT item FROM kv_items WHERE tbl=?", (table,)).fetchall()
        return [json.loads(r[0]) for r in rows]

    def count(self, table: str) -> int:
        with _connect(self.path) as con:
            return con.execute("SELECT count(*) FROM kv_items WHERE tbl=?", (table,)).fetchone()[0]


def write_dataframe(df: DataFrame, store_path: str, table: str, *,
                    batch_size: int = 25) -> None:
    """S10: distributed KV load — one writer per partition, 25-item batches
    (mirroring boto3 batch_writer, REF/glue_jobs/load_dynamo.py:69-78).

    Rows arrive already item-shaped (operators.kv_projection) so the per-row
    work is a dict dump, not the reference's per-row build/guard/cast chain.
    """
    columns = df.columns

    def _write_partition(rows) -> None:
        con = _connect(store_path)
        try:
            batch = []
            for row in rows:
                batch.append(dict(zip(columns, row)))
                if len(batch) >= batch_size:
                    _flush(con, table, batch)
                    batch = []
            if batch:
                _flush(con, table, batch)
        finally:
            con.close()

    def _flush(con, tbl, batch) -> None:
        keys = con.execute(
            "SELECT hash_key, range_key FROM kv_tables WHERE name=?", (tbl,)
        ).fetchone()
        if keys is None:
            raise KeyError(f"KV table not declared: {tbl}")
        hk_col, rk_col = keys
        con.executemany(
            "INSERT OR REPLACE INTO kv_items(tbl, hk, rk, item) VALUES (?,?,?,?)",
            [
                (tbl, str(it[hk_col]), str(it[rk_col]) if rk_col else "",
                 json.dumps(it, default=str))
                for it in batch
            ],
        )
        con.commit()

    df.foreachPartition(_write_partition)
