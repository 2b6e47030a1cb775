"""Multimodal (image/audio/video) column plumbing for a training-data
pipeline: opaque ``binary`` payload columns with typed metadata, processed
by Arrow-batched pandas UDFs over ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libraries ship in this
environment — see the build brief): :func:`decode_image_batch` raises
``NotImplementedError`` unless given the deterministic fake codec used by
tests. Everything Spark-side — schema, batch shape, partitioning, UDF
signatures — is real and tested, so swapping in a real codec is a one-
function change.

Fake codec format (deterministic, dependency-free): payload =
``b"FAKEIMG:" + width:4 bytes BE + height:4 bytes BE + raw grayscale bytes``.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, width int, height int, n_bytes long, mean_intensity double, "
    "phash long"
)

_MAGIC = b"FAKEIMG:"


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image payload for tests/fixtures."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return _MAGIC + struct.pack(">II", width, height) + pixels.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Decode one payload to an (h, w) uint8 array.

    Real codecs (PIL/libjpeg/ffmpeg) are not available in this environment;
    only the deterministic fake codec is implemented. Any other payload
    raises ``NotImplementedError`` — the marker the brief asks for.
    """
    if payload is None or not payload.startswith(_MAGIC):
        raise NotImplementedError(
            "real image decoding requires an image library not present in "
            "this environment; only the FAKEIMG test codec is implemented"
        )
    w, h = struct.unpack(">II", payload[len(_MAGIC): len(_MAGIC) + 8])
    pixels = np.frombuffer(payload, dtype=np.uint8, offset=len(_MAGIC) + 8)
    return pixels[: w * h].reshape(h, w)


def _phash64(img: np.ndarray) -> int:
    """Tiny perceptual hash: downsample to 8x8 by block means, threshold at
    the overall mean, pack 64 bits. Deterministic, pure numpy."""
    h, w = img.shape
    ys = (np.linspace(0, h, 9)).astype(int)
    xs = (np.linspace(0, w, 9)).astype(int)
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = img[ys[i]: max(ys[i + 1], ys[i] + 1),
                               xs[j]: max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > blocks.mean()).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # map to signed 64-bit for LongType
    return out - (1 << 64) if out >= (1 << 63) else out


def image_features(
    docs: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Extract typed metadata + perceptual hash from binary image payloads.

    One ``mapInPandas`` pass; per Arrow batch the work is a python loop over
    payloads (codec calls are inherently per-item) with numpy per item —
    the structure a real decoder would use (batch in, batch out).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "n_bytes": [],
                "mean_intensity": [], "phash": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(payload)
                out["doc_id"].append(int(doc_id))
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["n_bytes"].append(len(payload))
                out["mean_intensity"].append(float(img.mean()))
                out["phash"].append(_phash64(img))
            yield pd.DataFrame(out)

    return docs.select(id_col, payload_col).mapInPandas(
        extract, IMAGE_META_SCHEMA
    )


def resize_images(
    docs: DataFrame,
    target: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize (nearest-neighbor) each fake image to target x target and
    re-encode — the shape of a thumbnailing stage. Returns
    (doc_id, payload binary)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(payload)
                h, w = img.shape
                yi = (np.arange(target) * h // target)
                xi = (np.arange(target) * w // target)
                small = img[np.ix_(yi, xi)]
                ids.append(int(doc_id))
                payloads.append(
                    _MAGIC + struct.pack(">II", target, target) + small.tobytes()
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select(id_col, payload_col).mapInPandas(
        resize, "doc_id long, payload binary"
    )


def generate_fake_images(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fixture table (doc_id, payload) of fake images."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype(int)
            payloads = [
                encode_fake_image(16 + (i % 17), 16 + (i % 13), seed + i)
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return spark.range(n).mapInPandas(gen, "doc_id long, payload binary")
