"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
small typed metadata struct. The Spark-side machinery here is real and
tested — schema, Arrow batch shape, ``mapInPandas`` partition streaming —
while the actual codec work is stubbed: the decode libraries (PIL/ffmpeg)
are not in this container, so ``decode_image_meta(fake=False)`` raises
``NotImplementedError`` and the default is a deterministic fake decoder
(pure arithmetic on the byte payload) that exercises the identical
dataflow.

Scale notes: ``mapInPandas`` streams Arrow record batches through one
Python worker per task — per-batch (not per-row) overhead, and the binary
column never round-trips through the JVM row format. Batch size is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch``; for multi-MB blobs
set it low (e.g. 64) to cap worker memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = ("doc_id bigint, n_bytes bigint, width int, height int, "
               "fmt string, ok boolean")


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of a text
    column; in production: the raw image/audio blob as ingested)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def _fake_decode(n_bytes: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for a real image decode: metadata is pure
    arithmetic on payload length, so tests and the DuckDB oracle can verify
    the full pipeline bit-for-bit."""
    return pd.DataFrame({
        "n_bytes": n_bytes.astype("int64"),
        "width": (64 + n_bytes % 512).astype("int32"),
        "height": (64 + (n_bytes * 7) % 512).astype("int32"),
        "fmt": pd.Series(["png", "jpg"]).iloc[(n_bytes % 2).astype(int)].reset_index(drop=True),
        "ok": n_bytes > 0,
    })


def decode_image_meta(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """Decode image metadata from a binary column via ``mapInPandas``.

    ``fake=True`` (default in this container) uses the deterministic fake
    decoder; ``fake=False`` is the real-codec seam and raises until a codec
    library is available.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode needs PIL/libvips, not present in this "
            "container; the mapInPandas plumbing below is codec-agnostic")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[payload_col].map(len).astype("int64")
            meta = pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": n,
                "width": (64 + n % 512).astype("int32"),
                "height": (64 + (n * 7) % 512).astype("int32"),
            })
            meta["fmt"] = (n % 2).map({0: "png", 1: "jpg"})
            meta["ok"] = n > 0
            yield meta

    return df.select(id_col, payload_col).mapInPandas(decode, META_SCHEMA)


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling stub: emit one row per sampled 'frame' (1 -> N rows
    through mapInPandas — the UDTF-style fan-out shape used for video).
    Frames are deterministic byte-offset slices of the payload."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "offset": [], "frame_len": []}
            for did, blob in zip(pdf[id_col], pdf[payload_col]):
                n = len(blob)
                for i, off in enumerate(range(0, n, every_n_bytes)):
                    out["doc_id"].append(int(did))
                    out["frame_no"].append(i)
                    out["offset"].append(off)
                    out["frame_len"].append(min(every_n_bytes, n - off))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        sample, "doc_id bigint, frame_no int, offset int, frame_len int")


def resize_payload(df: DataFrame, payload_col: str = "payload",
                   id_col: str = "doc_id", target: int = 256) -> DataFrame:
    """Resize stub: downsample the binary payload by a deterministic byte
    stride so the 'image' fits ``target`` width (the real seam would call a
    codec's resample; the Spark-side shape — binary in, binary + new
    metadata out through one Arrow-batched pass — is identical). Stride =
    ceil(width / target); resized payload = every stride-th byte."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[payload_col].map(len).astype("int64")
            width = (64 + n % 512).astype("int64")       # fake-decoder width
            height = (64 + (n * 7) % 512).astype("int64")
            stride = ((width + target - 1) // target).clip(lower=1)
            resized = [bytes(b[::s]) for b, s in zip(pdf[payload_col], stride)]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "orig_bytes": n,
                "stride": stride.astype("int32"),
                "resized": resized,
                "resized_bytes": pd.Series([len(r) for r in resized], dtype="int64"),
                "out_w": (width // stride).astype("int32"),
                "out_h": (height // stride).astype("int32"),
            })

    return df.select(id_col, payload_col).mapInPandas(
        resize, "doc_id bigint, orig_bytes bigint, stride int, resized binary, "
                "resized_bytes bigint, out_w int, out_h int")


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "doc_id", dim: int = 8) -> DataFrame:
    """Feature-extraction stub: binary payload -> ``array<float>`` embedding
    through an Arrow-batched pandas pass (the real seam would run a vision
    encoder per batch; batch shape, schema and partitioning are what the
    engine owns). Deterministic features: a keyed arithmetic hash of the
    byte length, so the DuckDB oracle can recompute them exactly."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[payload_col].map(len).astype("int64")
            emb = [[float(((int(nb) * (k + 1) * 31) % 997) / 997.0)
                    for k in range(dim)] for nb in n]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": n,
                "embedding": emb,
            })

    return df.select(id_col, payload_col).mapInPandas(
        feats, "doc_id bigint, n_bytes bigint, embedding array<double>")
