"""Registry contract guards: every oracle pairs with a query, and the two
sides agree on column NAMES before any value comparison — catches alias
drift instantly (the driver hashes name-sorted columns, so a rename fails
correctness even with identical values)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

from .conftest import SF_SMOKE

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def test_every_oracle_has_a_query():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 35


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_SMOKE}/{t}.parquet')")
    return con


def test_spark_and_oracle_columns_agree(spark, duck):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    mismatches = {}
    for name, sql in oracles.items():
        spark_cols = sorted(qs[name](spark, SF_SMOKE).columns)  # plan only
        duck_cols = sorted(r[0] for r in
                           duck.execute("DESCRIBE " + sql).fetchall())
        if spark_cols != duck_cols:
            mismatches[name] = (spark_cols, duck_cols)
    assert not mismatches, mismatches
