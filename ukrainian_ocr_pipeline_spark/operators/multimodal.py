"""Multimodal column operators — image/audio/video as opaque binary.

The container has no image/audio codecs, so the DECODE step is stubbed
behind a deterministic fake (and a clearly-marked NotImplementedError
for the real path), while the Spark-side plumbing — schema, batch shape,
mapInPandas signature, partitioning — is real and tested.

At 100 TB the pattern is: binary column + typed metadata struct; decode /
feature-extract in Arrow-batched mapInPandas (bounded by
arrow.maxRecordsPerBatch so a batch of 10 MB blobs can't pin executor
memory); everything downstream operates on the extracted features, never
re-reading the blob.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "doc_id bigint, n_bytes int, header_hex string, "
    "fake_width int, fake_height int"
)

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_hash string"

REAL_CODECS_AVAILABLE = False  # no PIL/cv2/ffmpeg in this container


def _fake_decode(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image decode: derives a fake (w, h)
    from the payload length. The real implementation would be
    PIL.Image.open(io.BytesIO(blob)).size."""
    if REAL_CODECS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real codec path requires PIL/cv2")
    n = len(blob)
    return 64 + n % 512, 64 + (n * 7) % 512


def media_metadata(df: DataFrame, blob_col: str = "blob",
                   id_col: str = "doc_id") -> DataFrame:
    """Extract typed metadata from a binary column via mapInPandas
    (Arrow-batched; one pass over the blobs)."""
    cols = [id_col, blob_col]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            blobs = [bytes(b) if b is not None else b"" for b in pdf[blob_col]]
            dims = [_fake_decode(b) for b in blobs]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": [len(b) for b in blobs],
                "header_hex": [hashlib.md5(b).hexdigest()[:8] for b in blobs],
                "fake_width": [d[0] for d in dims],
                "fake_height": [d[1] for d in dims],
            })

    return df.select(*cols).mapInPandas(extract, MEDIA_META_SCHEMA)


def frame_sample(df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id",
                 n_frames: int = 3) -> DataFrame:
    """Video-style frame sampling stub: emits n_frames deterministic
    'frame' rows per blob (a row-expanding mapInPandas — the UDTF shape a
    real frame sampler has)."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                for i in range(n_frames):
                    out["doc_id"].append(int(did))
                    out["frame_idx"].append(i)
                    out["frame_hash"].append(hashlib.md5(b + bytes([i])).hexdigest()[:12])
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(sample, FRAME_SCHEMA)
