"""Multimodal plumbing: the decode_fn injection point takes a REAL
(trivial) decoder — a PPM P6 header/pixel parser — through the same
mapInPandas plan as the stub, proving the interface carries an actual
codec, not just the deterministic fake."""

from __future__ import annotations

import numpy as np

from lucene_spark.pipeline import multimodal as MM


def _make_ppm(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    header = f"P6\n{w} {h}\n255\n".encode()
    return header + bytes(rgb) * (w * h)


def _make_decode_ppm():
    """A real (if minimal) image decoder: parse the PPM P6 header, read
    the pixel plane, emit [w, h, meanR, meanG, meanB] padded to
    FEATURE_DIM. Raises on non-PPM bytes like a real codec would.
    Built as a closure so cloudpickle ships it BY VALUE (a test module
    isn't importable on executors — exactly how a user-supplied lambda
    or notebook-defined decoder travels)."""
    dim = MM.FEATURE_DIM

    def decode_ppm(payload: bytes):
        import numpy as _np

        if payload is None or not payload.startswith(b"P6"):
            raise ValueError("not a PPM payload")
        parts = payload.split(b"\n", 3)
        w, h = map(int, parts[1].split())
        px = _np.frombuffer(parts[3], dtype=_np.uint8)[: w * h * 3].reshape(-1, 3)
        out = _np.zeros(dim, dtype=_np.float32)
        out[0], out[1] = w, h
        out[2:5] = px.mean(axis=0) / 255.0
        return out

    return decode_ppm


def test_decode_fn_injection(spark):
    rows = [(i, "image", "image/x-portable-pixmap",
             _make_ppm(4 + i, 3, (10 * i % 256, 20, 30)), 4 + i, 3, None)
            for i in range(12)]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA).repartition(3)
    feats = {r["media_id"]: r["feature"]
             for r in MM.extract_features(df, decode_fn=_make_decode_ppm()).collect()}
    assert len(feats) == 12
    for i in range(12):
        f = feats[i]
        assert f[0] == 4 + i and f[1] == 3           # parsed dimensions
        assert abs(f[2] - (10 * i % 256) / 255.0) < 1e-6   # mean R channel
    # stub path unchanged (default argument)
    stub = MM.extract_features(df).collect()
    assert len(stub) == 12 and len(stub[0]["feature"]) == MM.FEATURE_DIM


def test_decode_fn_errors_surface(spark):
    """A decoder failure propagates as a task error (real codec
    semantics), not silent zeros."""
    import pytest

    df = MM.make_fake_media(spark, 6)   # sha256 payloads — not PPM
    with pytest.raises(Exception):
        MM.extract_features(df, decode_fn=_make_decode_ppm()).collect()
