"""Versioned table layout: snapshot writes + time-travel reads + retention,
on plain parquet — the Delta/Iceberg access pattern without a table format
dependency.

Layout::

    <root>/v=<N>/part-*.parquet     one immutable directory per version
    <root>/_manifest.json           {"versions": [N, ...], "latest": N}

Write protocol (crash-safe without a transaction log): the snapshot
directory writes COMPLETELY first, then the manifest swaps in atomically
(os.replace of a temp file). Readers resolve versions only through the
manifest, so a half-written snapshot directory is invisible — the same
"commit = atomic pointer swap" idea Delta's _delta_log/ serves, reduced to
one JSON pointer because versions here are whole snapshots, not file
deltas.

Scale notes: each version is an independent parquet directory → reads are
ordinary pruned columnar scans; storage is O(snapshot) per version (this
is the SNAPSHOT pattern — for high-frequency small changes, compose with
operators/cdc.apply_changelog to materialize a new version from a
changelog instead of rewriting unchanged data upstream); ``vacuum`` drops
versions beyond a retention count, never the latest.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _manifest_path(root: str) -> str:
    return os.path.join(root, _MANIFEST)


def _read_manifest(root: str) -> dict:
    p = _manifest_path(root)
    if not os.path.exists(p):
        return {"versions": [], "latest": None}
    with open(p) as fh:
        return json.load(fh)


def _swap_manifest(root: str, manifest: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=root, prefix="._manifest_")
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(root))   # atomic on POSIX


def write_snapshot(df: DataFrame, root: str) -> int:
    """Write ``df`` as the next version; returns the new version number.

    The data lands fully before the manifest advances — a crash mid-write
    leaves an orphan directory that readers never see (and vacuum sweeps).
    """
    os.makedirs(root, exist_ok=True)
    m = _read_manifest(root)
    version = (m["latest"] or 0) + 1
    df.write.mode("overwrite").parquet(os.path.join(root, f"v={version}"))
    m["versions"] = sorted(set(m["versions"]) | {version})
    m["latest"] = version
    _swap_manifest(root, m)
    return version


def read_snapshot(spark: SparkSession, root: str, *,
                  version: int | None = None) -> DataFrame:
    """Time travel: the table as of ``version`` (default: latest). A
    requested version must exist in the manifest — orphan or vacuumed
    directories are not readable state."""
    m = _read_manifest(root)
    if m["latest"] is None:
        raise ValueError(f"no committed versions under {root}")
    v = m["latest"] if version is None else version
    if v not in m["versions"]:
        raise ValueError(f"version {v} not in manifest "
                         f"(have {m['versions']})")
    return spark.read.parquet(os.path.join(root, f"v={v}"))


def versions(root: str) -> list[int]:
    return list(_read_manifest(root)["versions"])


def vacuum(root: str, *, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` versions (manifest first —
    a reader holding an old manifest in memory may still race the
    directory delete, the documented retention trade every lake format
    shares) plus any orphan ``v=`` directories no manifest references.
    Returns the removed version numbers.

    Multi-table roots (``write_snapshot_multi``) vacuum consistently: each
    table's manifest entry prunes to the kept set AND each
    ``<table>/v=N`` directory deletes, so ``versions()``/``read_table``
    never disagree with on-disk state and storage is actually reclaimed.
    """
    if keep_last < 1:
        raise ValueError("keep_last >= 1 (never vacuum the latest)")
    m = _read_manifest(root)
    keep = set(sorted(m["versions"])[-keep_last:])
    drop = [v for v in m["versions"] if v not in keep]
    m["versions"] = sorted(keep)
    tables = m.get("tables", {})
    if tables:
        m["tables"] = {name: [v for v in vs if v in keep]
                       for name, vs in tables.items()}
    _swap_manifest(root, m)

    def _sweep(dirpath: str, referenced: set[int]) -> None:
        """Remove dropped versions and orphans under one version dir."""
        if not os.path.isdir(dirpath):
            return
        for entry in os.listdir(dirpath):
            if not entry.startswith("v="):
                continue
            try:
                n = int(entry[2:])
            except ValueError:
                continue
            if n not in referenced:
                shutil.rmtree(os.path.join(dirpath, entry),
                              ignore_errors=True)

    _sweep(root, keep)                       # single-table layout + orphans
    for name in tables:                      # multi-table layout
        _sweep(os.path.join(root, name), keep)
    return drop


def write_snapshot_multi(dfs: dict[str, DataFrame], root: str) -> int:
    """Atomically commit a consistent snapshot of SEVERAL tables as one
    version: every table's directory writes completely, then ONE manifest
    swap publishes them together — readers can never observe table A at
    v2 with table B still at v1 (the cross-table transaction Delta/
    Iceberg need a catalog for, served here by the shared pointer).

    Layout: ``<root>/<table>/v=<N>/``, one manifest at the root. Table
    sets may grow across versions; a table absent from a version simply
    has no directory there (``read_table`` raises for it).
    """
    if not dfs:
        raise ValueError("need at least one table")
    os.makedirs(root, exist_ok=True)
    m = _read_manifest(root)
    version = (m["latest"] or 0) + 1
    for name, df in sorted(dfs.items()):
        df.write.mode("overwrite").parquet(
            os.path.join(root, name, f"v={version}"))
    tables = m.get("tables", {})
    for name in dfs:
        tables[name] = sorted(set(tables.get(name, [])) | {version})
    m["tables"] = tables
    m["versions"] = sorted(set(m["versions"]) | {version})
    m["latest"] = version
    _swap_manifest(root, m)
    return version


def read_table(spark: SparkSession, root: str, table: str, *,
               version: int | None = None) -> DataFrame:
    """The named table as of ``version`` (default latest committed)."""
    m = _read_manifest(root)
    if m["latest"] is None:
        raise ValueError(f"no committed versions under {root}")
    v = m["latest"] if version is None else version
    have = m.get("tables", {}).get(table, [])
    if v not in have:
        raise ValueError(
            f"table {table!r} has no version {v} (have {have})")
    return spark.read.parquet(os.path.join(root, table, f"v={v}"))
