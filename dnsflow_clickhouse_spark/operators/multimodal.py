"""Multimodal column plumbing (engine extension): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.

The Spark-side machinery — schemas, batch iteration, partition sizing,
output contracts — is real and tested. Decoding:

- ``decode_stub=True`` — deterministic fake decoder (dims derived from
  the content hash) so tests exercise the full plumbing for ANY format.
- ``decode_stub=False`` — REAL decoding for binary PNM images (P5
  grayscale / P6 RGB), parsed with pure numpy (:func:`decode_pnm`) and
  resized with deterministic nearest-neighbor sampling
  (:func:`resize_nearest`). Formats that need external codecs
  (JPEG/PNG/audio/video — PIL/ffmpeg are not bundled here) raise
  ``NotImplementedError`` at the plug-in point.

Scale notes: mapInPandas streams Arrow record batches — payload bytes
never materialize as Python lists; ``spark.sql.execution.arrow
.maxRecordsPerBatch`` bounds batch memory. Repartition by ``asset_id``
before heavy decode stages so work spreads evenly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feat_width", T.IntegerType()),
        T.StructField("feat_height", T.IntegerType()),
        T.StructField("frames_sampled", T.IntegerType()),
    ]
)


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Deterministic stand-in for a real decoder: derives fake
    (width, height, frames) from the content hash."""
    h = hashlib.sha256(payload or b"").digest()
    return 16 + h[0] % 64, 16 + h[1] % 64, 1 + h[2] % 8


def decode_pnm(payload: bytes):
    """Decode a binary PNM image (P5 grayscale / P6 RGB) with numpy
    only: returns an ndarray of shape (h, w) or (h, w, 3), dtype uint8
    (uint16 rasters for maxval > 255, big-endian per spec). Raises
    ``ValueError`` for anything that is not binary PNM."""
    import numpy as np

    if not payload or payload[:1] != b"P" or payload[1:2] not in (b"5", b"6"):
        raise ValueError("not a binary PNM payload")
    channels = 1 if payload[1:2] == b"5" else 3

    # header tokenizer: whitespace-separated ints, '#' comments to EOL
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then the raster
    width, height, maxval = fields
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    n = width * height * channels
    raster = np.frombuffer(payload, dtype=dtype, count=n, offset=pos)
    shape = (height, width) if channels == 1 else (height, width, 3)
    return raster.reshape(shape)


def decode_wav(payload: bytes):
    """Decode a PCM WAV payload with numpy only: returns
    (samples ndarray of shape (n, channels), sample_rate). Supports
    8-bit unsigned and 16/32-bit signed little-endian PCM (format tag
    1). Raises ``ValueError`` for anything else."""
    import struct

    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _, _, bits = fmt
    if tag != 1 or bits not in (8, 16, 32):
        raise ValueError(f"unsupported WAV encoding tag={tag} bits={bits}")
    if channels <= 0:
        # malformed fmt chunk: fail with a typed error, not the
        # ZeroDivisionError the sample-count division would raise
        raise ValueError(f"malformed WAV fmt chunk: channels={channels}")
    dtype = {8: np.dtype("u1"), 16: np.dtype("<i2"), 32: np.dtype("<i4")}[bits]
    n = len(data) // dtype.itemsize // channels * channels
    samples = np.frombuffer(data, dtype=dtype, count=n).reshape(-1, channels)
    return samples, rate


def resize_nearest(img, target: tuple[int, int]):
    """Deterministic nearest-neighbor resize to (width, height): output
    pixel (y, x) samples source pixel (floor(y*h/th), floor(x*w/tw)) —
    pure integer index math, bit-identical on any platform."""
    import numpy as np

    tw, th = target
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(th, dtype=np.int64) * h) // th
    xs = (np.arange(tw, dtype=np.int64) * w) // tw
    return img[ys][:, xs]


def extract_features(
    assets: DataFrame,
    decode_stub: bool = True,
    target_size: tuple[int, int] = (32, 32),
    frame_stride: int = 2,
) -> DataFrame:
    """Decode/resize/frame-sample feature extraction over binary assets.

    Input: ASSET_SCHEMA frames. Output: FEATURE_SCHEMA. The pandas UDF
    body receives Arrow batches of (asset_id, kind, payload).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                if decode_stub:
                    w, h, fr = _fake_decode(payload, r["kind"])
                    fw, fh = min(w, target_size[0]), min(h, target_size[1])
                    frames = (fr + frame_stride - 1) // frame_stride
                elif not payload:
                    # empty/NULL payload: emit a zero-feature row instead
                    # of failing the whole Spark stage for one bad asset
                    # (the stub path already treats b'' this way)
                    fw = fh = frames = 0
                elif payload[:2] in (b"P5", b"P6"):
                    resized = resize_nearest(decode_pnm(payload), target_size)
                    fh, fw = resized.shape[0], resized.shape[1]
                    frames = 1  # still image
                elif payload[:4] == b"RIFF":
                    samples, rate = decode_wav(payload)
                    # audio mapping onto the feature contract: width =
                    # channels, height = sample rate in kHz, frames =
                    # 1-second windows sampled every frame_stride seconds
                    fw, fh = samples.shape[1], rate // 1000
                    secs = samples.shape[0] / rate if rate else 0.0
                    frames = max(1, int(-(-secs // frame_stride)))
                else:
                    raise NotImplementedError(
                        "real decoding beyond binary PNM images and PCM "
                        "WAV audio requires PIL/ffmpeg; not bundled — "
                        "plug a decoder in here"
                    )
                rows.append(
                    {
                        "asset_id": r["asset_id"],
                        "kind": r["kind"],
                        "byte_len": len(payload),
                        "content_sha": hashlib.sha256(payload).hexdigest(),
                        "feat_width": fw,
                        "feat_height": fh,
                        "frames_sampled": frames,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash) + near-duplicate image pairs
# ---------------------------------------------------------------------------

DHASH_W, DHASH_H = 9, 8  # 9x8 luma grid -> 8x8 = 64 difference bits


def dhash64_expr(pixels, width: int = DHASH_W, height: int = DHASH_H):
    """64-bit difference hash from a row-major luma grid (width x
    height = ``width*height`` pixels): bit ``r*(width-1)+c`` is set iff
    ``p[r][c] < p[r][c+1]``. The standard perceptual hash for image
    near-dup detection — robust to re-encoding/resizing because it keys
    on luminance GRADIENTS, not bytes (an exact-md5 pass cannot see a
    re-encoded copy). Pure integer column expressions: any engine
    computes the identical signature, and banded_hamming_pairs
    (operators.dedup) gives the no-all-pairs join.

    ``pixels``: either an ``array<int>`` Column, or a LIST of ``width*
    height`` integer Columns. Prefer the list form when pixels are
    derived expressions — element_at over a live ``transform(...)``
    array re-evaluates the whole lambda per access (the repo's
    generate-input rule), while a list of scalar expressions stays in
    whole-stage codegen with no re-evaluation.

    Bits combine with bitwise OR (not addition): bit 63 is the sign
    bit, carried as the min-long literal — addition would overflow
    under ANSI, OR cannot.
    """
    from pyspark.sql import functions as F

    if isinstance(pixels, list):
        at = lambda i: pixels[i]  # noqa: E731
    else:
        at = lambda i: F.element_at(pixels, i + 1)  # noqa: E731
    out = F.lit(0).cast("long")
    for r in range(height):
        for c in range(width - 1):
            bit = r * (width - 1) + c
            mask = (1 << bit) if bit < 63 else -(1 << 63)
            lt = at(r * width + c) < at(r * width + c + 1)
            out = out.bitwiseOR(
                F.when(lt, F.lit(mask).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            )
    return out


def dhash_from_image(payload: bytes) -> int:
    """Reference path: REAL decode (PNM via numpy) -> grayscale ->
    nearest-neighbor resize to the 9x8 grid -> the same 64 difference
    bits as :func:`dhash64_expr`. Used by the pixel-source-agnostic
    tests to prove the expression and the decoded path agree."""
    import numpy as np

    img = decode_pnm(payload)
    if img.ndim == 3:  # P6 RGB -> integer luma (exact, no float weights)
        img = (
            img[:, :, 0].astype(np.int64)
            + img[:, :, 1].astype(np.int64)
            + img[:, :, 2].astype(np.int64)
        ) // 3
    small = resize_nearest(img.astype(np.int64), (DHASH_W, DHASH_H))  # target is (w, h)
    h = 0
    for r in range(DHASH_H):
        for c in range(DHASH_W - 1):
            if small[r, c] < small[r, c + 1]:
                h |= 1 << (r * (DHASH_W - 1) + c)
    return h - (1 << 64) if h >= (1 << 63) else h  # signed, matches the column


def image_near_dup_pairs(
    sig: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-duplicate image pairs over a dHash column: the banded
    hamming self-join shared with SimHash text dedup (lossless for
    ``max_hamming < n_bands``; see dedup.banded_hamming_pairs)."""
    from dnsflow_clickhouse_spark.operators.dedup import banded_hamming_pairs

    return banded_hamming_pairs(sig, id_col, hash_col, 64, n_bands, max_hamming)
