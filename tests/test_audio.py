"""Audio plumbing: fakepcm round-trip, numpy feature parity, decoder seam."""

import numpy as np
import pytest

from pgsql2osm_spark.operators import audio as AU


def _mk_rows(n_clips=6, seed=3):
    rng = np.random.default_rng(seed)
    rows, raw = [], {}
    for i in range(n_clips):
        n = int(rng.integers(2000, 9000))
        s = (rng.standard_normal(n) * 3000).astype(np.int16)
        aid = f"a{i:03d}"
        raw[aid] = s
        rows.append((aid, AU.pack_fakepcm(s), 16000, n, "fakepcm"))
    return rows, raw


def test_audio_features_match_numpy(spark):
    rows, raw = _mk_rows()
    df = spark.createDataFrame(
        rows, "audio_id string, bytes binary, sr int, n_samples int, fmt string"
    )
    got = AU.audio_features(df, window=1024).collect()
    by_key = {(r["audio_id"], r["win"]): r for r in got}
    n_expected = 0
    for aid, s in raw.items():
        f = s.astype(np.float64) / 32768.0
        n_win = len(f) // 1024
        n_expected += n_win
        for w in range(n_win):
            seg = f[w * 1024 : (w + 1) * 1024]
            r = by_key[(aid, w)]
            assert r["rms"] == pytest.approx(np.sqrt((seg * seg).mean()), rel=1e-12)
            assert r["zcr"] == pytest.approx(
                (np.diff(np.signbit(seg)) != 0).mean(), rel=1e-12
            )
            assert r["peak"] == pytest.approx(np.abs(seg).max(), rel=1e-12)
    assert len(got) == n_expected


def test_audio_decoder_seam_raises(spark):
    df = spark.createDataFrame(
        [("x", b"\x00\x00\x00\x00", 16000, 0, "mp3")],
        "audio_id string, bytes binary, sr int, n_samples int, fmt string",
    )
    with pytest.raises(Exception, match="NotImplementedError|real audio decoder"):
        AU.audio_features(df).collect()
