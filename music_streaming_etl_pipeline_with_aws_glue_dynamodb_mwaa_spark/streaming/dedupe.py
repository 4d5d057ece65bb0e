"""Streaming deduplication and stream-static enrichment — the two
remaining Structured Streaming primitives a file-fed pipeline needs
between ingestion (filestream.py) and stateful aggregation (windowed.py /
stateful.py).

- **Dedup**: at-least-once sources (retried file drops, replayed batches)
  need exactly-once ROWS. Batch mode is a plain ``dropDuplicates``; stream
  mode uses ``dropDuplicatesWithinWatermark`` so the dedup state is
  EVICTABLE — an unbounded ``dropDuplicates`` on a stream grows state
  forever, the classic streaming leak. Rows whose event time falls behind
  the watermark are already handled upstream (dropped by the watermark
  itself); within the horizon, re-deliveries collapse to the first-seen
  row.
- **Enrichment**: joining a stream against a small dimension table is a
  stream-STATIC join — no watermark on the static side, no state at all;
  Spark re-plans the static side per micro-batch, and a broadcast hint
  keeps it a map-side hash join (the dimension is re-broadcast per batch,
  which is exactly what you want for slowly-refreshed dims read from a
  lake path).

Batch ≡ stream equivalence for the dedup is asserted in
tests/test_streaming.py (same function, same inputs, both modes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_events(df: DataFrame, keys: list[str], *, ts_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """First-seen-wins dedup on ``keys``. Streaming input → watermarked
    ``dropDuplicatesWithinWatermark`` (bounded state); batch input → plain
    ``dropDuplicates`` (identical result set when all duplicates of a key
    arrive within the watermark horizon — the at-least-once contract)."""
    if df.isStreaming:
        return (df.withWatermark(ts_col, watermark)
                  .dropDuplicatesWithinWatermark(keys))
    return df.dropDuplicates(keys)


def enrich_with_dim(stream: DataFrame, dim: DataFrame,
                    on: str | list[str], *, how: str = "left") -> DataFrame:
    """Stream-static (or batch-batch) enrichment join against a broadcast
    dimension. Left join by default: an event whose dim key is missing
    must survive with NULLs (drop it and the fact stream silently
    under-counts — route such rows to quarantine downstream instead)."""
    return stream.join(F.broadcast(dim), on, how)
