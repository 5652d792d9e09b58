"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata structs;
the decode / feature-extract / resize / frame-sample stages run as
Arrow-batched ``mapInPandas`` so each python worker streams record batches
without materializing a partition. The actual codecs (PIL/ffmpeg/librosa)
are NOT in this container, so the decode step is pluggable:

- ``decoder='fake'`` (default) — deterministic synthetic decode derived
  from the payload bytes: real schema, real batching, fake pixels. Keeps
  the whole pipeline testable end-to-end.
- ``decoder=<callable bytes → np.ndarray>`` — a REAL codec plugged in by
  the caller (e.g. ``lambda b: np.asarray(PIL.Image.open(io.BytesIO(b)))``)
  ships to the workers via cloudpickle and runs inside the same
  mapInPandas batches; metadata (width/height) and features are derived
  from the DECODED array, so payload sizes and dtypes flow through the
  seam for real (contract-tested with a binary image format in
  test_spark_trainops).
- ``decoder='pil'`` etc. — raise NotImplementedError with a clear message
  until the library is installed; the Spark-side plumbing is identical.

Schemas are the contract: partitioning, UDF signatures and batch shapes
are production-real even where the codec is stubbed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = ('id long, media_type string, byte_len long, '
                     'width int, height int, n_frames int, '
                     'sample_rate int, duration_ms long')

FEATURE_SCHEMA = 'id long, feature array<float>'


def _fake_decode_meta(payload: bytes) -> dict:
    """Deterministic pseudo-decode: metadata derived from payload bytes."""
    n = len(payload)
    head = int.from_bytes(payload[:8].ljust(8, b'\0'), 'little')
    return {
        'byte_len': n,
        'width': 160 + (head % 480),
        'height': 120 + ((head >> 16) % 360),
        'n_frames': 1 + ((head >> 32) % 32),
        'sample_rate': 8000 + ((head >> 40) % 40000),
        'duration_ms': n,  # 1 byte ≈ 1 ms in the fake codec
    }


def _check_decoder(decoder):
    if decoder == 'fake' or callable(decoder):
        return
    raise NotImplementedError(
        f'decoder={decoder!r}: real codec libraries (PIL/ffmpeg/librosa) '
        'are not available in this environment — pass a callable '
        '(bytes → np.ndarray) instead; the Spark plumbing (schema, '
        'batching) is unchanged.')


def decode_media_meta(df: DataFrame, payload_col: str = 'payload',
                      id_col: str = 'id', media_type: str = 'image',
                      decoder='fake') -> DataFrame:
    """binary payload → typed metadata row per media item. With a callable
    ``decoder`` (bytes → np.ndarray of shape (h, w[, c]) or (frames, h, w,
    c)), width/height/n_frames come from the DECODED array."""
    _check_decoder(decoder)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload)
                if callable(decoder):
                    arr = np.asarray(decoder(buf))
                    frames = arr.shape[0] if arr.ndim == 4 else 1
                    h, w = (arr.shape[1:3] if arr.ndim == 4
                            else arr.shape[:2])
                    meta = {
                        'byte_len': len(buf),
                        'width': int(w), 'height': int(h),
                        'n_frames': int(frames),
                        'sample_rate': 0,
                        'duration_ms': 0,
                    }
                else:
                    meta = _fake_decode_meta(buf)
                meta['id'] = int(i)
                meta['media_type'] = media_type
                out.append(meta)
            yield pd.DataFrame(out)

    return (df.select(id_col, payload_col)
            .mapInPandas(_decode, MEDIA_META_SCHEMA))


def extract_features(df: DataFrame, payload_col: str = 'payload',
                     id_col: str = 'id', dim: int = 16,
                     decoder='fake') -> DataFrame:
    """binary payload → fixed-dim float feature vector: histogram of the
    decoded pixel values projected through a fixed random matrix —
    deterministic, vectorized numpy per Arrow batch. ``decoder='fake'``
    histograms the raw payload bytes; a callable decoder histograms the
    DECODED uint8 array, so a real codec's output drives the features."""
    _check_decoder(decoder)

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.RandomState(123)
        proj = rng.randn(256, dim).astype(np.float32)
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                buf = bytes(payload)
                if callable(decoder):
                    arr = np.asarray(decoder(buf), dtype=np.uint8).ravel()
                else:
                    arr = np.frombuffer(buf, dtype=np.uint8)
                hist = np.bincount(arr, minlength=256)[:256].astype(np.float32)
                norm = np.linalg.norm(hist)
                if norm > 0:
                    hist = hist / norm
                feats.append(hist @ proj)
            yield pd.DataFrame({'id': pdf[id_col].astype('int64'),
                                'feature': [f.tolist() for f in feats]})

    return df.select(id_col, payload_col).mapInPandas(_feat, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, payload_col: str = 'payload',
                  id_col: str = 'id', every_n: int = 8,
                  decoder='fake') -> DataFrame:
    """video payload → one row per sampled frame. ``decoder='fake'`` emits
    fixed-stride byte windows standing in for decoded frames; a callable
    decoder (bytes → (n_frames, h, w[, c]) array) emits the REAL decoded
    frame bytes at the sampling stride."""
    _check_decoder(decoder)

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload)
                if callable(decoder):
                    arr = np.asarray(decoder(buf))
                    for fi in range(0, arr.shape[0], every_n):
                        ids.append(int(i))
                        idxs.append(fi)
                        blobs.append(arr[fi].tobytes())
                    continue
                n_frames = _fake_decode_meta(buf)['n_frames']
                for fi in range(0, n_frames, every_n):
                    ids.append(int(i))
                    idxs.append(fi)
                    lo = (fi * 97) % max(1, len(buf))
                    blobs.append(buf[lo:lo + 64])
            yield pd.DataFrame({'id': ids, 'frame_idx': idxs,
                                'frame': blobs})

    return (df.select(id_col, payload_col)
            .mapInPandas(_frames, 'id long, frame_idx int, frame binary'))
