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


RESIZE_SCHEMA = ("doc_id bigint, orig_w int, orig_h int, "
                 "out_w int, out_h int, scale_r double")

FEATURE_SCHEMA = "doc_id bigint, dim_idx int, value_r double"


def resize_plan(df: DataFrame, target: int = 256, blob_col: str = "blob",
                id_col: str = "doc_id") -> DataFrame:
    """Aspect-preserving resize plumbing: decode dims (stubbed), compute
    the fit-to-target output size and scale factor.  The real path would
    hand (blob, out_w, out_h) to PIL/cv2 inside the same batch loop; the
    geometry math and the Arrow-batched shape are the real engineering."""
    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "orig_w", "orig_h", "out_w", "out_h", "scale_r")}
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                w, h = _fake_decode(b)
                scale = target / max(w, h)
                out["doc_id"].append(int(did))
                out["orig_w"].append(w)
                out["orig_h"].append(h)
                out["out_w"].append(int(w * scale))
                out["out_h"].append(int(h * scale))
                out["scale_r"].append(round(scale, 6))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(plan, RESIZE_SCHEMA)


def feature_extract(df: DataFrame, dim: int = 8, blob_col: str = "blob",
                    id_col: str = "doc_id") -> DataFrame:
    """Feature-extraction plumbing: one deterministic pseudo-feature
    vector per blob, emitted EXPLODED as (doc_id, dim_idx, value_r) — the
    row-expanding shape a real embedding extractor feeding the similarity
    operators has.  Component i = md5(blob + ascii('0'+i))[:4] / 0xffff;
    the real path would run the vision/audio encoder over the same
    Arrow batches."""
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            out = {"doc_id": [], "dim_idx": [], "value_r": []}
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                for i in range(dim):
                    out["doc_id"].append(int(did))
                    out["dim_idx"].append(i)
                    out["value_r"].append(round(
                        int(hashlib.md5(b + bytes([48 + i])).hexdigest()[:4], 16)
                        / 65535.0, 6))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(extract, FEATURE_SCHEMA)


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
