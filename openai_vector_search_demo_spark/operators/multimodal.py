"""Multimodal columns for training-data pipelines (north star extension).

Convention: media travel as opaque ``binary`` columns plus typed metadata —
the schema Parquet/Arrow already handle at scale (no base64, no file-path
indirection inside the row).  Decode / feature-extract / resize / frame-
sample run as Arrow-batched ``mapInPandas`` stages: per-partition, zero
driver involvement, and the Python boundary is paid once per batch.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment, so
decode stages are **stubbed two ways**:

- ``*_real``: import-gated, raising a clear ImportError naming the missing
  package — the production slot.
- deterministic fakes over a tiny synthetic format (`SyntheticImage`):
  header-parsed width/height + raw grayscale bytes.  They make the
  Spark-side plumbing — schema, batch shape, partitioning, null handling —
  real and testable, which is the part that belongs to this engine.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Synthetic image format (test stand-in): b'SIMG' | u16 w | u16 h | w*h bytes
# ---------------------------------------------------------------------------

MAGIC = b"SIMG"


def encode_synthetic_image(w: int, h: int, pixels: np.ndarray) -> bytes:
    assert pixels.shape == (h, w)
    return MAGIC + struct.pack("<HH", w, h) + pixels.astype(np.uint8).tobytes()


def decode_synthetic_image(data: bytes) -> tuple[int, int, np.ndarray]:
    if data[:4] != MAGIC:
        raise ValueError("not a synthetic image")
    w, h = struct.unpack("<HH", data[4:8])
    px = np.frombuffer(data[8:8 + w * h], dtype=np.uint8).reshape(h, w)
    return w, h, px


def decode_image_real(data: bytes):  # pragma: no cover
    """Production slot: decode real formats via PIL — not installed here."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as e:
        raise ImportError(
            "decode_image_real needs Pillow (not installed in this "
            "environment); the pipeline is exercised via the synthetic "
            "format instead") from e
    import io  # noqa: PLC0415
    return Image.open(io.BytesIO(data))


# ---------------------------------------------------------------------------
# Distributed stages
# ---------------------------------------------------------------------------

IMAGE_META_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("ok", StringType()),
])

FEATURE_DIM = 16

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("features", ArrayType(FloatType())),
])


def image_metadata(df: DataFrame, id_col: str = "media_id",
                   bytes_col: str = "data") -> DataFrame:
    """Decode stage: header-parse dimensions per image.  Corrupt rows yield
    ok='error' instead of failing the task — at 100 TB a bad row is data,
    not an exception."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, oks = [], [], [], []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                ids.append(mid)
                try:
                    w, h, _ = decode_synthetic_image(bytes(data))
                    ws.append(w); hs.append(h); oks.append("ok")
                except Exception:
                    ws.append(None); hs.append(None); oks.append("error")
            yield pd.DataFrame({"media_id": ids, "width": ws,
                                "height": hs, "ok": oks})

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        run, IMAGE_META_SCHEMA)


def image_features(df: DataFrame, id_col: str = "media_id",
                   bytes_col: str = "data") -> DataFrame:
    """Feature-extract stage: 16-bin normalized intensity histogram per
    image (deterministic stand-in for a vision-encoder embedding — same
    shape contract: fixed-dim float vector per row, vectorized over the
    Arrow batch).  Corrupt rows are skipped (null-filter contract as E1)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    _, _, px = decode_synthetic_image(bytes(data))
                except Exception:
                    continue
                hist, _ = np.histogram(px, bins=FEATURE_DIM, range=(0, 256))
                total = hist.sum() or 1
                ids.append(mid)
                feats.append([float(np.float32(x / total)) for x in hist])
            # dtype=object: an empty batch would otherwise infer float64 and
            # break Arrow's list<float> conversion
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="object"),
                                "features": pd.Series(feats, dtype="object")})

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        run, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  id_col: str = "media_id", bytes_col: str = "data") -> DataFrame:
    """Resize stage (nearest-neighbor on the synthetic format — the real
    slot would call PIL's resampler with identical plumbing)."""
    import pandas as pd
    from pyspark.sql.types import BinaryType

    schema = StructType([StructField("media_id", StringType()),
                         StructField("data", BinaryType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    w, h, px = decode_synthetic_image(bytes(data))
                except Exception:
                    continue
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                ids.append(mid)
                outs.append(encode_synthetic_image(out_w, out_h, px[np.ix_(yi, xi)]))
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="object"),
                                "data": pd.Series(outs, dtype="object")})

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(run, schema)


def sample_frames(df: DataFrame, every_n: int = 2,
                  id_col: str = "media_id", frames_col: str = "frames") -> DataFrame:
    """Frame-sample stage for video-shaped rows (``array<binary>`` frames):
    keep every n-th frame.  Pure JVM-side (no decode needed) — sampling by
    position is metadata-level work and stays in codegen."""
    return df.select(
        F.col(id_col),
        F.filter(F.col(frames_col),
                 lambda _, i: i % every_n == 0).alias("sampled_frames"))


# ---------------------------------------------------------------------------
# Audio — REAL, stdlib-only: PCM WAV needs no external codec (`wave` parses
# the RIFF header, numpy handles the samples).  Unlike the image stages
# there is no stub here; this is the production path for uncompressed audio.
# Compressed formats (mp3/flac) would slot in behind the same mapInPandas
# signatures via an import-gated decoder, exactly like decode_image_real.
# ---------------------------------------------------------------------------

def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """Mono 16-bit PCM WAV bytes (fixture builder AND a real encoder)."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """→ (sample_rate, channels, mono float samples in [-1, 1])."""
    import io
    import wave
    with wave.open(io.BytesIO(data), "rb") as w:
        sr, ch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, got width {width}")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)  # downmix
    return sr, ch, x


AUDIO_META_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("ok", StringType()),
    StructField("sample_rate", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("duration_s", FloatType()),
])


def audio_metadata(df: DataFrame, id_col: str = "media_id",
                   data_col: str = "data") -> DataFrame:
    """Header probe per clip; corrupt clips become ``ok='error'`` rows —
    data, not task failures."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                try:
                    sr, ch, x = _decode_wav(bytes(data))
                    rows.append((mid, "ok", sr, ch, len(x), len(x) / sr))
                except Exception:
                    rows.append((mid, "error", None, None, None, None))
            yield pd.DataFrame(rows, columns=AUDIO_META_SCHEMA.names)

    return df.select(id_col, data_col).mapInPandas(run, AUDIO_META_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("rms_windows", ArrayType(FloatType())),
    StructField("peak", FloatType()),
])


def audio_features(df: DataFrame, window_ms: int = 250,
                   id_col: str = "media_id",
                   data_col: str = "data") -> DataFrame:
    """Windowed RMS-energy profile + peak per clip (the cheap universal
    audio feature: silence/clipping detection, energy fingerprints).
    Corrupt clips are skipped like failed embeds (E2 semantics)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                try:
                    sr, _, x = _decode_wav(bytes(data))
                except Exception:
                    continue
                win = max(1, int(sr * window_ms / 1000))
                n = max(1, len(x) // win)
                rms = [float(np.sqrt(np.mean(x[i * win:(i + 1) * win] ** 2)))
                       for i in range(n)]
                rows.append((mid, rms, float(np.max(np.abs(x)) if len(x) else 0.0)))
            yield pd.DataFrame(rows, columns=AUDIO_FEATURES_SCHEMA.names)

    return df.select(id_col, data_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def resample_audio(df: DataFrame, target_sr: int,
                   id_col: str = "media_id",
                   data_col: str = "data") -> DataFrame:
    """Linear resample to ``target_sr`` — re-encoded as 16-bit PCM WAV so
    the output column stays the same opaque-binary convention.  Real
    arithmetic (np.interp), not a stub; a polyphase filter would slot into
    the same signature."""
    import pandas as pd
    schema = StructType([StructField("media_id", StringType()),
                         StructField("data", df.schema[data_col].dataType)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[data_col]):
                try:
                    sr, _, x = _decode_wav(bytes(data))
                except Exception:
                    continue
                n_out = max(1, int(round(len(x) * target_sr / sr)))
                t_out = np.linspace(0.0, len(x) - 1, n_out)
                y = np.interp(t_out, np.arange(len(x)), x)
                out = encode_wav(target_sr,
                                 np.clip(y * 32768.0, -32768, 32767))
                rows.append((mid, bytearray(out)))
            yield pd.DataFrame(rows, columns=["media_id", "data"])

    return df.select(id_col, data_col).mapInPandas(run, schema)
