"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio libraries, so the decode step is
STUBBED (clearly marked): `decode_media` tries the real decoder import
and otherwise produces a deterministic fake derived from the payload
bytes. The Spark-side plumbing — schema, batch shape, partitioning,
UDF signatures — is real and tested; swapping in a real decoder is a
one-function change.

Media table shape: (media_id LONG, kind STRING image|audio|video,
payload BINARY, meta MAP<STRING,STRING>).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "duration_ms int, features array<float>"
)

_FEATURE_DIM = 8


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for the real decoder: dimensions and a
    feature vector derived from the md5 of the payload. NOT a real
    decode — see module docstring."""
    digest = hashlib.md5(payload).digest()
    width = 16 + digest[0] % 240 if kind == "image" else 0
    height = 16 + digest[1] % 240 if kind == "image" else 0
    duration = (
        100 + int.from_bytes(digest[2:4], "big") % 60000
        if kind in ("audio", "video")
        else 0
    )
    feats = (
        np.frombuffer(digest[: _FEATURE_DIM], dtype=np.uint8).astype(np.float32)
        / 255.0
    )
    return width, height, duration, feats.tolist()


def _real_decode_available() -> bool:
    try:  # pragma: no cover - not present in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_media(media: DataFrame, require_real: bool = False) -> DataFrame:
    """Decode/feature-extract each media row (Arrow batches).

    require_real=True raises NotImplementedError when no real decoder
    library is importable (the contract for production use).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if require_real and not _real_decode_available():
            raise NotImplementedError(
                "real media decoding requires PIL/av which are not "
                "installed; rerun with require_real=False for the "
                "deterministic fake decode"
            )
        for pdf in batches:
            # decoding is inherently per-payload work (a real decoder
            # consumes one blob at a time); keep the loop tight over
            # plain zipped columns rather than itertuples' namedtuple
            # construction, and assemble output columnar
            out = {
                "media_id": pdf["media_id"].astype("int64"),
                "kind": pdf["kind"],
                "n_bytes": [],
                "width": [],
                "height": [],
                "duration_ms": [],
                "features": [],
            }
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload) if payload is not None else b""
                w, h, d, feats = _fake_decode(b, kind)
                out["n_bytes"].append(len(b))
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(d)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        _decode, schema=DECODE_SCHEMA
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Deterministic 'frame sampling' for video payloads: one row per
    sampled chunk, fingerprinted as md5 of the chunk's UPPERCASE HEX
    (injective on the bytes, and replayable by engines whose md5 only
    accepts strings — arbitrary byte chunks need not be valid UTF-8).
    Exercises the explode-per-media shape a real frame sampler would
    produce."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                for f in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    chunk = b[f * every_n_bytes : (f + 1) * every_n_bytes]
                    rows.append(
                        (
                            int(media_id),
                            f,
                            hashlib.md5(chunk.hex().upper().encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_md5"])

    return media.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        _sample, schema="media_id long, frame_idx int, frame_md5 string"
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-column metadata projection (no decode): byte length + magic
    prefix — the cheap scan that routes media to the right decoder."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.hex(F.substring("payload", 1, 4)).alias("magic_hex"),
    )
