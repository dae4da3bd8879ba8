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
