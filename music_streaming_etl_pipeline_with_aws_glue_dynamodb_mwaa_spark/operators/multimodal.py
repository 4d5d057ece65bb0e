"""Multimodal column plumbing (SURVEY.md §7 E4).

Media payloads ride as opaque ``binary`` columns with typed metadata beside
them (schemas.MEDIA): the payload stays compressed/columnar, metadata prunes
partitions without touching bytes — the only layout that survives 100 TB.

The decode step is STUBBED: image/audio libraries are not in this
environment, so ``decode`` raises ``NotImplementedError`` unless
``fake=True`` substitutes a deterministic byte-derived feature vector. What
IS real and tested is the Spark-side machinery every real decoder would ride
on: the schema, the ``mapInPandas`` Arrow-batch iterator (bounded memory —
batches stream, payloads never accumulate), the UDF signature, and the
byte-level metadata extraction (pure JVM expressions).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

_FEATURES_SCHEMA = (
    "media_id long, kind string, byte_len long, content_md5 string, "
    "feature array<double>"
)


def decode(payload: bytes, kind: str):
    """Real decode hook. Plug PIL/torchaudio/av here when available."""
    raise NotImplementedError(
        f"no decoder for kind={kind!r} in this environment; "
        "use extract_media_features(..., fake=True) for the plumbing path"
    )


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature: first FEATURE_DIM bytes scaled to
    [0,1). Clearly fake; exists so batching/schema/partitioning are testable
    without media libs."""
    buf = np.frombuffer(payload[:FEATURE_DIM].ljust(FEATURE_DIM, b"\0"), dtype=np.uint8)
    return buf.astype(np.float64) / 255.0


def extract_media_features(media: DataFrame, *, fake: bool = False,
                           batch_size_hint: int = 1024) -> DataFrame:
    """Per-payload feature extraction via ``mapInPandas``.

    Arrow streams record batches through the iterator: memory is bounded by
    one batch of payloads per task, independent of partition size — the
    shape any real image/audio decoder needs. Payload column is pruned from
    the output (features only), so downstream stages never shuffle bytes.
    """
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                data = bytes(payload) if payload is not None else b""
                if fake:
                    feats.append(_fake_feature(data))
                else:
                    feats.append(np.asarray(decode(data, kind), dtype=np.float64))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "byte_len": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                "content_md5": pdf["payload"].map(
                    lambda p: hashlib.md5(bytes(p) if p is not None else b"").hexdigest()),
                "feature": feats,
            })

    return media.mapInPandas(fn, _FEATURES_SCHEMA)


def resize_images(media: DataFrame, *, width: int, height: int,
                  fake: bool = False) -> DataFrame:
    """Image resize via ``mapInPandas`` — 1:1 rows, new dims, re-encoded
    payload. Real path plugs a decoder into ``decode``; the ``fake`` path
    passes payload bytes through untouched and stamps the target dims, so
    schema/batching/partitioning are testable without PIL."""
    out_schema = ("media_id long, kind string, payload binary, mime string, "
                  "width int, height int")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                for payload, kind in zip(pdf["payload"], pdf["kind"]):
                    decode(bytes(payload or b""), kind)   # raises: no decoder here
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": pdf["payload"],
                "mime": pdf["mime"],
                "width": np.full(len(pdf), width, dtype=np.int32),
                "height": np.full(len(pdf), height, dtype=np.int32),
            })

    return media.mapInPandas(fn, out_schema)


def sample_frames(media: DataFrame, *, frame_interval_ms: int,
                  fake: bool = False) -> DataFrame:
    """Video/audio frame sampling via ``mapInPandas`` — the 1:N exploding
    UDF shape (one payload row → one row per sampled timestamp, from
    ``duration_ms`` metadata; rows without a duration yield one frame at 0).

    The frame-extraction itself is stubbed like ``decode``; the ``fake``
    path emits a deterministic pseudo-frame per timestamp —
    ``md5(HEX(payload) ":" idx)`` over the uppercase hex STRING, an
    engine-portable derivation (DuckDB can reproduce it: hex + md5 are
    varchar-native there, md5-over-blob is not), which is what makes the
    registered ``media_frame_sample`` query oracle-checkable. The
    Spark-relevant parts are real: metadata-driven fan-out inside the Arrow
    iterator, bounded memory, payloads pruned after sampling.
    """
    import hashlib

    out_schema = "media_id long, frame_idx int, ts_ms long, frame string"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, payload, kind, dur in zip(pdf["media_id"], pdf["payload"],
                                               pdf["kind"], pdf["duration_ms"]):
                data = bytes(payload) if payload is not None else b""
                if not fake:
                    decode(data, kind)                    # raises: no decoder here
                n = 1 if pd.isna(dur) else int(dur) // frame_interval_ms + 1
                hx = data.hex().upper()
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * frame_interval_ms)
                    frames.append(hashlib.md5(
                        f"{hx}:{i}".encode()).hexdigest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "ts_ms": tss, "frame": frames})

    return media.mapInPandas(fn, out_schema)


def media_byte_stats(media: DataFrame, group_col: str = "kind") -> DataFrame:
    """Pure-JVM metadata pass: byte accounting per media kind without
    deserializing any payload (octet_length + md5 are native expressions)."""
    return media.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.min(F.octet_length("payload")).alias("min_bytes"),
        F.max(F.octet_length("payload")).alias("max_bytes"),
    )


def media_binary_fixture(docs: DataFrame) -> DataFrame:
    """Deterministic MULTI-KIND MEDIA frame with genuinely binary payloads,
    derived from ``documents`` by pure JVM expressions (no Python, no files).

    - kind cycles image/audio/video on ``doc_id % 3``;
    - payload is 1-4 concatenated ``unhex(md5(text ':' i))`` 16-byte chunks
      (chunk count ``doc_id % 4 + 1``) — arbitrary bytes, NOT valid UTF-8,
      so every consumer must treat it as a true blob;
    - images carry width/height, audio/video carry duration_ms, each a
      doc_id-derived modulus.

    Every derivation is expressible in ANSI-ish SQL (DuckDB: %, md5, unhex,
    list indexing), which is what lets the media queries be oracle-checked
    over real binary columns rather than utf-8 text bytes.
    """
    did = F.col("doc_id")
    hex_payload = F.concat(*[
        F.when(F.pmod(did, F.lit(4)) >= i,
               F.md5(F.concat(F.col("text"), F.lit(f":{i}"))))
        .otherwise(F.lit(""))
        for i in range(4)
    ])
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                        (F.pmod(did, F.lit(3)) + 1).cast("int"))
    is_img = kind == F.lit("image")
    return docs.select(
        did.alias("media_id"),
        kind.alias("kind"),
        F.unhex(hex_payload).alias("payload"),
        F.when(kind == "image", F.lit("image/png"))
         .when(kind == "audio", F.lit("audio/wav"))
         .otherwise(F.lit("video/mp4")).alias("mime"),
        F.when(is_img, ((F.pmod(did, F.lit(16)) + 1) * 64).cast("int"))
         .otherwise(F.lit(None).cast("int")).alias("width"),
        F.when(is_img, ((F.pmod(did, F.lit(9)) + 1) * 64).cast("int"))
         .otherwise(F.lit(None).cast("int")).alias("height"),
        F.when(~is_img, ((F.pmod(did, F.lit(7)) + 1) * 1000).cast("long"))
         .otherwise(F.lit(None).cast("long")).alias("duration_ms"),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a MEDIA-shaped frame from the documents table (payload =
    utf-8 bytes of the text) — deterministic test/demo input for the
    plumbing above, in lieu of real image/audio test assets."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
