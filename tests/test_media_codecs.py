"""Real media codecs (BMP/WAV, struct+numpy) and the real decode path:
round-trip identity, resize exactness, Spark mapInPandas integration."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.operators import multimodal as M
from music_streaming_etl_pipeline_with_aws_glue_dynamodb_mwaa_spark.sources import catalog

from .conftest import SF_SMOKE


@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_bmp_roundtrip_any_dims(w, h, seed):
    px = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
    out = M.bmp_decode(M.bmp_encode(px))
    assert out.shape == (h, w, 3)
    assert (out == px).all()


@given(st.integers(0, 400), st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_wav_roundtrip_any_length(n, seed):
    smp = np.random.RandomState(seed).randint(
        -32768, 32767, size=n, dtype=np.int64).astype(np.int16)
    out, rate = M.wav_decode(M.wav_encode(smp, rate=16000))
    assert rate == 16000
    assert (out == smp).all()


def test_bmp_row_padding_is_real():
    # w=3 → 9 row bytes → 3 pad bytes per row; the file must carry them
    px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    blob = M.bmp_encode(px)
    assert len(blob) == 54 + 3 * 12
    assert (M.bmp_decode(blob) == px).all()


def test_resize_nearest_checkerboard_exact():
    base = np.array([[[0, 0, 0], [255, 255, 255]],
                     [[255, 255, 255], [0, 0, 0]]], dtype=np.uint8)
    up = M.resize_nearest(base, 4, 4)
    # 2x upscale of a checkerboard: each source pixel becomes a 2x2 block
    assert (up[:2, :2] == 0).all() and (up[:2, 2:] == 255).all()
    assert (up[2:, :2] == 255).all() and (up[2:, 2:] == 0).all()
    # identity resize is a no-op
    assert (M.resize_nearest(base, 2, 2) == base).all()


def test_decode_media_dispatch():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert M.decode_media(M.bmp_encode(px), "image").shape == (2, 2, 3)
    smp, rate = M.decode_media(M.wav_encode(np.zeros(4, np.int16)), "audio")
    assert len(smp) == 4
    with pytest.raises(NotImplementedError):
        M.decode_media(b"\x89PNG\r\n\x1a\n....", "image")


def test_real_fixture_decodes_and_featurizes(spark):
    docs = catalog.load_table(spark, SF_SMOKE, "documents").limit(20)
    media = M.real_media_fixture(docs)
    rows = {r["media_id"]: r for r in media.collect()}
    assert len(rows) == 20
    # every payload is a genuinely decodable file
    for r in rows.values():
        decoded = M.decode_media(bytes(r["payload"]), r["kind"])
        if r["kind"] == "image":
            assert decoded.shape == (r["height"], r["width"], 3)
        else:
            smp, rate = decoded
            assert len(smp) == 256 and rate == 8000

    feats = {r["media_id"]: r
             for r in M.extract_media_features_real(media).collect()}
    assert len(feats) == 20
    # numpy parity on one image and one audio row
    for mid, r in rows.items():
        f = np.array(feats[mid]["feature"])
        assert len(f) == M.FEATURE_DIM
        decoded = M.decode_media(bytes(r["payload"]), r["kind"])
        if r["kind"] == "image":
            px = decoded.astype(np.float64) / 255.0
            assert abs(f[0] - px[..., 0].mean()) < 1e-12
            assert abs(f[3] - px.std()) < 1e-12
        else:
            x = decoded[0].astype(np.float64) / 32768.0
            assert abs(f[0] - x.mean()) < 1e-12
            assert abs(f[2] - np.sqrt((x * x).mean())) < 1e-12


def test_real_resize_changes_pixels_and_size(spark):
    docs = catalog.load_table(spark, SF_SMOKE, "documents").limit(10)
    media = M.real_media_fixture(docs)
    out = {r["media_id"]: r
           for r in M.resize_images_real(media, width=8, height=6).collect()}
    src = {r["media_id"]: r for r in media.collect()}
    for mid, r in out.items():
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (8, 6)
            px = M.bmp_decode(bytes(r["payload"]))
            assert px.shape == (6, 8, 3)
            # parity with the local resample of the source pixels
            ref = M.resize_nearest(
                M.bmp_decode(bytes(src[mid]["payload"])), 8, 6)
            assert (px == ref).all()
            # 8*3=24 row bytes, no pad → 54 + 6*24 = 198
            assert len(bytes(r["payload"])) == 198
        else:
            assert r["width"] is None
            assert bytes(r["payload"]) == bytes(src[mid]["payload"])
