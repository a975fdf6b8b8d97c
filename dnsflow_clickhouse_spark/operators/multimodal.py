"""Multimodal column plumbing (engine extension): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.

The Spark-side machinery — schemas, batch iteration, partition sizing,
output contracts — is real and tested. The actual media decoding is
STUBBED (the image/audio libraries are not available in this
environment): ``decode_stub=True`` swaps in a deterministic fake decoder
so tests can exercise the full plumbing; passing ``decode_stub=False``
raises ``NotImplementedError`` at the point a real decoder (PIL/ffmpeg)
would be plugged in.

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
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg; not bundled — "
                    "plug a decoder in here"
                )
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                w, h, fr = _fake_decode(payload, r["kind"])
                rows.append(
                    {
                        "asset_id": r["asset_id"],
                        "kind": r["kind"],
                        "byte_len": len(payload),
                        "content_sha": hashlib.sha256(payload).hexdigest(),
                        "feat_width": min(w, target_size[0]),
                        "feat_height": min(h, target_size[1]),
                        "frames_sampled": (fr + frame_stride - 1) // frame_stride,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )
