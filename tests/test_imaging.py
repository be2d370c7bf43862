"""Codec + pixel-parity tests (PSNR gate per BASELINE.json input_hint)."""

import numpy as np

from pgsql2osm_spark.functions import imaging as I
from pgsql2osm_spark.sources import fixtures as FX

rng = np.random.default_rng(3)


def test_png_roundtrip_exact():
    for shape in [(16, 16, 3), (33, 47, 3), (64, 64, 3), (1, 5, 3)]:
        px = rng.integers(0, 256, shape).astype(np.uint8)
        assert (I.png_decode(I.png_encode(px)) == px).all()


def test_png_decode_all_filters():
    """Decoder handles filter types 1-4 (hand-built streams)."""
    import struct
    import zlib

    px = rng.integers(0, 256, (6, 8, 3)).astype(np.uint8)
    # re-encode with per-row filters 1..4 applied manually
    h, w, _ = px.shape
    flat = px.reshape(h, w * 3).astype(np.int32)
    lines = []
    for r in range(h):
        f = (r % 4) + 1
        prev = flat[r - 1] if r > 0 else np.zeros(w * 3, dtype=np.int32)
        cur = flat[r]
        enc = np.zeros(w * 3, dtype=np.int32)
        for i in range(w * 3):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (cur[i] - pred) & 0xFF
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + I._chunk(b"IHDR", ihdr)
        + I._chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + I._chunk(b"IEND", b"")
    )
    assert (I.png_decode(data) == px).all()


def test_lossy_psnr_gate():
    px = rng.integers(0, 256, (48, 48, 3)).astype(np.uint8)
    dec = I.lossy_decode(I.lossy_encode(px))
    assert I.psnr_db(px, dec) >= 40.0
    assert not (dec == px).all()  # it is genuinely lossy


def test_unknown_fmt_raises():
    import pytest

    with pytest.raises(NotImplementedError):
        I.decode_image(b"xxxx", "webp")


def test_phash_properties():
    px = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    h = I.phash64(px)
    assert h == I.phash64(px)  # deterministic
    noisy = np.clip(px.astype(int) + rng.integers(-2, 3, px.shape), 0, 255).astype(np.uint8)
    assert I.hamming64(h, I.phash64(noisy)) <= 12  # robust to tiny noise
    other = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    assert I.hamming64(h, I.phash64(other)) >= 10  # separates unrelated images


def test_fixture_pixel_parity():
    """Decode every fixture row: png exact vs regenerated pixels, jpeg PSNR>=40,
    caption format, phash consistency — the golden parity gate."""
    pdf = FX.gen_images_pandas(32, with_pixels=True)
    for _, row in pdf.iterrows():
        dec = I.decode_image(row["bytes"], row["fmt"])
        assert dec.shape == (row["h"], row["w"], 3)
        src = row["pixels"]
        if row["fmt"] == "png":
            assert (dec == src).all()
        else:
            assert I.psnr_db(src, dec) >= 40.0
        assert row["caption"].startswith("caption ")
        assert I.phash64(dec) == row["phash"]
