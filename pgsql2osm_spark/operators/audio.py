"""Multimodal audio column handling — the audio leg of the image/audio/video
triad (builder brief: treat media as opaque binary + typed metadata; decode
behind a clearly-marked seam, Spark plumbing real and tested).

Schema convention (mirrors the image input_hint shape):
    (audio_id string, bytes binary, sr int, n_samples int, fmt string)

Decode seam: fmt='fakepcm' payloads — a 4-byte big-endian sample count
followed by int16 little-endian PCM — decode for real, so windowing, feature
math, Arrow batching and output schema are all exercised end to end; any
other fmt raises NotImplementedError where a real codec (ffmpeg/soundfile)
would plug in. No audio library ships in this container.

Features are classic frame-level descriptors (RMS energy, zero-crossing
rate, peak) over fixed windows — pure numpy per Arrow batch, one mapInPandas
stage, samples never cross a shuffle (the same 100 TB shape as image decode:
pixels/samples stay inside their input partition; only small feature rows
move — operators/tiling.py:31).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "audio_id string, win int, rms double, zcr double, peak double"
)


def pack_fakepcm(samples: np.ndarray) -> bytes:
    """Build a deterministic 'fakepcm' payload from int16 samples."""
    s = np.asarray(samples, dtype=np.int16)
    return struct.pack(">I", len(s)) + s.tobytes()


def decode_fakepcm(buf: bytes) -> np.ndarray:
    (n,) = struct.unpack(">I", buf[:4])
    return np.frombuffer(buf, dtype="<i2", count=n, offset=4)


def audio_features(audio: DataFrame, window: int = 1024) -> DataFrame:
    """Per-window RMS / zero-crossing-rate / peak for every audio row.

    The trailing partial window is dropped (fixed-size frames only) so the
    output is a pure function of (payload, window) — deterministic under any
    partitioning (SURVEY.md O1)."""

    def run(pdf_iter):
        for pdf in pdf_iter:
            ids, wins, rms, zcr, peak = [], [], [], [], []
            for aid, data, fmt in zip(pdf["audio_id"], pdf["bytes"], pdf["fmt"]):
                if fmt != "fakepcm":
                    raise NotImplementedError(
                        f"fmt={fmt!r}: plug a real audio decoder in here; only the "
                        "deterministic 'fakepcm' payload decodes in this sandbox"
                    )
                s = decode_fakepcm(bytes(data)).astype(np.float64) / 32768.0
                n_win = len(s) // window
                if n_win == 0:
                    continue
                m = s[: n_win * window].reshape(n_win, window)
                ids.extend([aid] * n_win)
                wins.extend(range(n_win))
                rms.extend(np.sqrt((m * m).mean(axis=1)))
                zcr.extend((np.diff(np.signbit(m), axis=1) != 0).mean(axis=1))
                peak.extend(np.abs(m).max(axis=1))
            yield pd.DataFrame(
                {
                    "audio_id": ids,
                    "win": np.asarray(wins, dtype=np.int32),
                    "rms": rms,
                    "zcr": zcr,
                    "peak": peak,
                }
            )

    return audio.select("audio_id", "bytes", "fmt").mapInPandas(run, FEATURE_SCHEMA)
