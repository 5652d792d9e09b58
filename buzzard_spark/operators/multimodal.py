"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata structs;
the decode / feature-extract / resize / frame-sample stages run as
Arrow-batched ``mapInPandas`` so each python worker streams record batches
without materializing a partition. The actual codecs (PIL/ffmpeg/librosa)
are NOT in this container, so the decode step is pluggable:

- ``decoder='fake'`` (default) — deterministic synthetic decode derived
  from the payload bytes: real schema, real batching, fake pixels. Keeps
  the whole pipeline testable end-to-end.
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


def decode_media_meta(df: DataFrame, payload_col: str = 'payload',
                      id_col: str = 'id', media_type: str = 'image',
                      decoder: str = 'fake') -> DataFrame:
    """binary payload → typed metadata row per media item."""
    if decoder != 'fake':
        raise NotImplementedError(
            f'decoder={decoder!r}: real codecs (PIL/ffmpeg/librosa) are not '
            'available in this environment — plug them in here; the Spark '
            'plumbing (schema, batching) is unchanged.')

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                meta = _fake_decode_meta(bytes(payload))
                meta['id'] = int(i)
                meta['media_type'] = media_type
                out.append(meta)
            yield pd.DataFrame(out)

    return (df.select(id_col, payload_col)
            .mapInPandas(_decode, MEDIA_META_SCHEMA))


def extract_features(df: DataFrame, payload_col: str = 'payload',
                     id_col: str = 'id', dim: int = 16,
                     decoder: str = 'fake') -> DataFrame:
    """binary payload → fixed-dim float feature vector (fake: byte-histogram
    projection — deterministic, vectorized numpy per Arrow batch)."""
    if decoder != 'fake':
        raise NotImplementedError(
            f'decoder={decoder!r} unavailable offline; see module docstring.')

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.RandomState(123)
        proj = rng.randn(256, dim).astype(np.float32)
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
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
                  decoder: str = 'fake') -> DataFrame:
    """video payload → one row per sampled frame (fake: fixed-stride byte
    windows standing in for decoded frames)."""
    if decoder != 'fake':
        raise NotImplementedError(
            f'decoder={decoder!r} unavailable offline; see module docstring.')

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload)
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
