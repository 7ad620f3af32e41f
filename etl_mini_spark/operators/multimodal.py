"""Multimodal-column conventions: image/audio/video as opaque ``binary``
columns plus a typed metadata struct, processed via Arrow-batched
``mapInPandas`` so the (real, heavy) decoders stream batch-by-batch and
never materialize a partition in memory.

The container has no image/audio libraries, so the decode kernel is a
clearly-marked deterministic fake (`_fake_decode`) behind the same
batch-shape/schema plumbing a real Pillow/torchaudio kernel would use —
swap `_fake_decode` for the real library call in production. Metadata
derivation (size/sha256) is JVM-side.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Encode a string column to a binary payload column — stands in for
    reading real media bytes (`spark.read.format("binaryFile")` in
    production)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(data: bytes) -> tuple[int, int, int]:
    """STUB decoder: deterministic dimensions derived from byte length.

    Replace with e.g. PIL.Image.open(io.BytesIO(data)).size — the
    surrounding plumbing (batch iteration, schema, null handling) is the
    real, tested part."""
    n = len(data)
    return n % 640 + 1, (n * 7) % 480 + 1, n % 16 + 1


def decode_media(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """mapInPandas media decode: (id, n_bytes, sha256, width, height,
    n_frames). Batches arrive as Arrow; one Python roundtrip per batch,
    not per row."""
    from etl_mini_spark.session import spread

    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + list(MEDIA_META_SCHEMA.fields)
    )
    df = spread(df)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [_fake_decode(bytes(p)) if p is not None else (None, None, None) for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [len(bytes(p)) if p is not None else None for p in payloads],
                    "sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(process, out_schema)


def resize_media(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    target_w: int = 224,
    target_h: int = 224,
) -> DataFrame:
    """STUB resize: returns (id, width, height, resized binary) where the
    'resized' payload is a deterministic fake (sha256-derived bytes of
    fixed length ∝ target area). Real impl swaps the kernel for
    PIL resize inside the same mapInPandas shape — schema, Arrow batch
    handling, and null passthrough are the tested contract."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("resized", T.BinaryType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, payloads = [], [], [], []
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(rid)
                if p is None:
                    ws.append(None); hs.append(None); payloads.append(None)
                    continue
                digest = hashlib.sha256(bytes(p)).digest()
                # fake pixel buffer: digest tiled to target_w*target_h//64 bytes
                reps = max(1, (target_w * target_h) // (64 * len(digest)))
                ws.append(target_w); hs.append(target_h); payloads.append(digest * reps)
            yield pd.DataFrame({id_col: ids, "width": ws, "height": hs, "resized": payloads})

    return df.select(id_col, payload_col).mapInPandas(process, out_schema)


def extract_features(
    df: DataFrame, id_col: str, payload_col: str = "payload", dim: int = 16
) -> DataFrame:
    """STUB feature extractor: payload → dense float vector (array<float>).

    Deterministic fake: sha256 digest bytes → [0,1) floats. A real model
    (CLIP/wav2vec) drops into the same mapInPandas kernel; downstream
    similarity operators (operators/similarity.py) consume the output
    column unchanged — this is the decode→embed→ANN pipeline shape."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(rid)
                if p is None:
                    feats.append(None)
                    continue
                digest = hashlib.sha256(bytes(p)).digest()
                while len(digest) < dim:
                    digest += hashlib.sha256(digest).digest()
                feats.append([b / 255.0 for b in digest[:dim]])
            yield pd.DataFrame({id_col: ids, "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(process, out_schema)


def frame_sample(df: DataFrame, id_col: str, payload_col: str = "payload", every: int = 4) -> DataFrame:
    """STUB frame sampler: emits one row per sampled 'frame' (deterministic
    fake: frame index + a byte-slice hash). Real impl would demux video
    via PyAV inside the same mapInPandas shape."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_sha", T.StringType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                data = bytes(p)
                n_frames = len(data) % 16 + 1
                for i in range(0, n_frames, every):
                    ids.append(rid)
                    idxs.append(i)
                    shas.append(hashlib.sha256(data[i : i + 32]).hexdigest())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_sha": shas})

    return df.select(id_col, payload_col).mapInPandas(process, out_schema)
