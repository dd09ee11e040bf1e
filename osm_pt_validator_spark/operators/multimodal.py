"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns with typed metadata, processed via Arrow-batched mapInPandas.

Decode tiers:
  1. REAL header parsing with stdlib ``struct`` alone — PNG IHDR
     width/height, JPEG SOF width/height (marker walk), WAV fmt/data
     duration. No external library needed; these are the true values.
  2. For payloads in no known header format: the container has no
     image/audio libraries, so full decode is STUBBED (clearly
     marked) — a deterministic fake derived from the payload md5.
     ``require_real=True`` raises instead of faking.
Feature vectors are md5-derived in both tiers (a real embedding model
is out of scope for this container); the Spark-side plumbing — schema,
batch shape, partitioning, UDF signatures — is real and tested.

Media table shape: (media_id LONG, kind STRING image|audio|video,
payload BINARY, meta MAP<STRING,STRING>).
"""

from __future__ import annotations

import hashlib
import struct
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _parse_png(b: bytes) -> tuple[int, int] | None:
    """True width/height from the IHDR chunk (always first, offset 8;
    fields at 16..24 big-endian — PNG spec 11.2.2)."""
    if len(b) >= 24 and b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return int(w), int(h)
    return None


def _parse_jpeg(b: bytes) -> tuple[int, int] | None:
    """True width/height from the first SOFn marker (0xC0-0xCF minus
    the non-frame C4/C8/CC): walk the marker stream, each non-RST
    segment carries a big-endian length; SOF payload is
    precision(1) height(2) width(2) — JPEG/JFIF spec B.2.2."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > len(b):
            return None
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(b):
                return None
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            return int(w), int(h)
        i += 2 + seg_len
    return None


def _parse_wav(b: bytes) -> int | None:
    """True duration (ms) from the RIFF chunk walk: byte_rate is at
    offset 8 of the fmt chunk payload; duration = data size /
    byte_rate (RIFF WAVE spec)."""
    if len(b) < 28 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    byte_rate = None
    data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 20 <= len(b):
            byte_rate = struct.unpack("<I", b[i + 16 : i + 20])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if byte_rate and data_size is not None:
        return int(data_size * 1000 // byte_rate)
    return None


def _parse_headers(b: bytes) -> tuple[int, int, int] | None:
    """(width, height, duration_ms) via real stdlib header parsing, or
    None when the payload matches no known container format."""
    png = _parse_png(b)
    if png is not None:
        return png[0], png[1], 0
    jpg = _parse_jpeg(b)
    if jpg is not None:
        return jpg[0], jpg[1], 0
    wav = _parse_wav(b)
    if wav is not None:
        return 0, 0, wav
    return None


def _md5_features(payload: bytes) -> list[float]:
    digest = hashlib.md5(payload).digest()
    return (
        np.frombuffer(digest[:_FEATURE_DIM], dtype=np.uint8).astype(np.float32)
        / 255.0
    ).tolist()


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

    PNG/JPEG dimensions and WAV durations are parsed for REAL from the
    container headers (stdlib struct — no library needed). Payloads in
    no known header format fall back to the documented deterministic
    fake; require_real=True raises NotImplementedError for those
    instead (the contract for production use, where a full decoder
    library must be installed).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
                parsed = _parse_headers(b)
                if parsed is not None:
                    w, h, d = parsed
                    feats = _md5_features(b)
                elif require_real and not _real_decode_available():
                    raise NotImplementedError(
                        "payload matches no parseable header format "
                        "(PNG/JPEG/WAV) and full media decoding requires "
                        "PIL/av which are not installed; rerun with "
                        "require_real=False for the deterministic fake "
                        "decode"
                    )
                else:
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


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec 9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties a > b > c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _decode_png_pixels(b: bytes) -> "np.ndarray | None":
    """REAL full PNG pixel decode with stdlib only (zlib inflate +
    per-scanline unfiltering of all five filter types — PNG spec 9).
    Supports 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), non-interlaced. Returns a
    (height, width, channels) uint8 array (palette expanded to RGB),
    or None for non-PNG payloads and unsupported variants (16-bit,
    interlaced, sub-byte palette) — callers route those to the
    require_real contract.

    Filter 1 (Sub) is a per-channel prefix sum (vectorized cumsum mod
    256); filters 3/4 (Average/Paeth) are inherently sequential in x
    and run as a per-byte loop — fine for the fixture scale this
    container decodes; a production cluster installs a native decoder
    and this function becomes the header-verified fallback."""
    if len(b) < 8 or b[:8] != _PNG_SIG:
        return None
    import zlib

    w = h = bitd = ct = interlace = None
    idat = bytearray()
    plte = None
    i = 8
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i : i + 4])
        cid = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        if len(data) < length:
            return None
        if cid == b"IHDR" and length >= 13:
            w, h, bitd, ct, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
        elif cid == b"PLTE":
            plte = data
        elif cid == b"IDAT":
            idat += data
        elif cid == b"IEND":
            break
        i += 12 + length
    if not idat or w is None or w == 0 or h == 0 or bitd != 8 or interlace != 0:
        return None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ct)
    if channels is None:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) < h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int32
        )
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: per-channel prefix sum mod 256
            cur = line.reshape(w, channels).cumsum(axis=0).reshape(stride) & 0xFF
        elif ftype in (3, 4):  # Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - channels]) if x >= channels else 0
                up = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                pred = (a + up) // 2 if ftype == 3 else _paeth(a, up, c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, channels)
    if ct == 3:
        if plte is None or len(plte) % 3 != 0 or len(plte) == 0:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            return None
        px = pal[idx]
    return px


RESAMPLE_SCHEMA = (
    "media_id long, src_w int, src_h int, dst_w int, dst_h int, "
    "channels int, resampled_md5 string, real_decode boolean"
)


def resample_images(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    require_real: bool = False,
) -> DataFrame:
    """REAL pixel resample for image payloads: PNG pixels are decoded
    for real (:func:`_decode_png_pixels` — stdlib zlib + full
    unfiltering), fit into the aspect-preserving box with the SAME
    integer arithmetic as :func:`resize_plan`
    (scale_ppm = min(tw*1e6 div w, th*1e6 div h)), and resampled
    nearest-neighbor on the exact midpoint grid
    src_idx = (2*dst_idx + 1) * src_len div (2 * dst_len) — all
    integer, so the resampled bytes (and their md5, the output key a
    writer would store the blob under) are engine-reproducible.

    JPEG payloads parse headers for real but have no stdlib DCT
    decoder: with ``require_real=True`` they raise NotImplementedError
    (install a real decoder in production); otherwise they fall back to
    the documented md5 fake tier (real_decode=false marks those rows).
    Arrow-batched mapInPandas; map-only, zero shuffle.
    """

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                px = _decode_png_pixels(b)
                if px is not None:
                    h, w, ch = px.shape
                    scale_ppm = min(
                        target_w * 1_000_000 // w, target_h * 1_000_000 // h
                    )
                    dw = max(1, w * scale_ppm // 1_000_000)
                    dh = max(1, h * scale_ppm // 1_000_000)
                    ys = [(2 * y + 1) * h // (2 * dh) for y in range(dh)]
                    xs = [(2 * x + 1) * w // (2 * dw) for x in range(dw)]
                    resampled = px[np.ix_(ys, xs)]
                    digest = hashlib.md5(resampled.tobytes()).hexdigest()
                    rows.append(
                        (int(media_id), w, h, dw, dh, ch, digest, True)
                    )
                    continue
                parsed = _parse_png(b) or _parse_jpeg(b)
                if require_real and not _real_decode_available():
                    raise NotImplementedError(
                        "image payload has no stdlib-decodable pixel data "
                        "(full PNG required; JPEG needs a DCT decoder such "
                        "as PIL, which is not installed); rerun with "
                        "require_real=False for the deterministic fake tier"
                    )
                if parsed is not None:
                    w, h = parsed
                else:
                    w, h, _d, _f = _fake_decode(b, "image")
                if w <= 0 or h <= 0:
                    continue
                scale_ppm = min(
                    target_w * 1_000_000 // w, target_h * 1_000_000 // h
                )
                dw = max(1, w * scale_ppm // 1_000_000)
                dh = max(1, h * scale_ppm // 1_000_000)
                digest = hashlib.md5(
                    f"{b.hex().upper()}|{dw}x{dh}".encode()
                ).hexdigest()
                rows.append((int(media_id), w, h, dw, dh, 0, digest, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "src_w", "src_h", "dst_w", "dst_h",
                    "channels", "resampled_md5", "real_decode",
                ],
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(_resample, schema=RESAMPLE_SCHEMA)


FEATURES_SCHEMA = (
    "media_id long, bucket int, cnt long, ppm long, entropy_ubits long"
)


def byte_stats_features(media: DataFrame, buckets: int = 16) -> DataFrame:
    """REAL feature extraction needing no decoder library: per-payload
    byte-bucket histogram (high nibble -> 16 buckets) and Shannon
    entropy over the buckets — the compressibility/format signal media
    curation pipelines filter on (e.g. drop near-zero-entropy padding
    blobs, flag ciphertext-high entropy).

    Determinism contract: counts are exact integers; each bucket's
    entropy term (cnt/n)*log2(n/cnt) is quantized to MICRO-BITS with
    floor(x*1e6 + 0.5) BEFORE summation, so the per-payload total is an
    integer sum — order-independent and engine-replayable (same ulp
    caveat as every libm-based oracle here: a term would have to sit
    within ~1e-9 of a rounding boundary to flip). numpy bincount per
    payload inside Arrow batches; empty payloads yield no rows.

    Output (exploded per occupied bucket): media_id, bucket, cnt,
    ppm = cnt*1e6 div n, entropy_ubits (same value on each of the
    payload's rows).
    """
    shift = 8 - (buckets - 1).bit_length()

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n = len(b)
                if n == 0:
                    continue
                cnts = np.bincount(
                    np.frombuffer(b, dtype=np.uint8) >> shift,
                    minlength=buckets,
                )
                nz = np.nonzero(cnts)[0]
                c = cnts[nz].astype(np.float64)
                terms = (c / n) * np.log2(n / c) * 1e6
                ubits = int(np.floor(terms + 0.5).astype(np.int64).sum())
                for bkt in nz:
                    cnt = int(cnts[bkt])
                    rows.append(
                        (int(media_id), int(bkt), cnt, cnt * 1_000_000 // n, ubits)
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "bucket", "cnt", "ppm", "entropy_ubits"],
            )

    return media.select("media_id", "payload").mapInPandas(
        _feats, schema=FEATURES_SCHEMA
    )


RESIZE_SCHEMA = (
    "media_id long, src_w int, src_h int, dst_w int, dst_h int, "
    "scale_ppm long, resized_key string"
)


def resize_plan(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    require_real: bool = False,
) -> DataFrame:
    """Aspect-preserving resize planning for image payloads.

    The SOURCE dimensions are REAL (stdlib PNG/JPEG header parse —
    _parse_headers); the fit box is exact integer arithmetic:
    scale_ppm = min(target_w*1e6 div w, target_h*1e6 div h), dst =
    max(1, src*scale_ppm div 1e6) — replayable in any engine. Only the
    pixel resample itself needs a decoder the container lacks, so the
    output carries `resized_key` — the deterministic cache key
    (md5 of payload hex + the target box) the resampled blob WOULD be
    stored under — instead of resampled bytes; require_real=True raises
    for payloads whose headers cannot be parsed (same contract as
    decode_media).
    """

    def _plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                parsed = _parse_png(b) or _parse_jpeg(b)
                if parsed is not None:
                    w, h = parsed
                elif require_real and not _real_decode_available():
                    raise NotImplementedError(
                        "image payload has no parseable PNG/JPEG header and "
                        "full decoding requires PIL, which is not installed"
                    )
                else:
                    w, h, _d, _f = _fake_decode(b, str(kind))
                if w <= 0 or h <= 0:
                    continue
                scale_ppm = min(
                    target_w * 1_000_000 // w, target_h * 1_000_000 // h
                )
                dw = max(1, w * scale_ppm // 1_000_000)
                dh = max(1, h * scale_ppm // 1_000_000)
                key = hashlib.md5(
                    f"{b.hex().upper()}|{dw}x{dh}".encode()
                ).hexdigest()
                rows.append((int(media_id), w, h, dw, dh, scale_ppm, key))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "src_w", "src_h", "dst_w", "dst_h",
                    "scale_ppm", "resized_key",
                ],
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "kind", "payload"
    ).mapInPandas(_plan, schema=RESIZE_SCHEMA)
