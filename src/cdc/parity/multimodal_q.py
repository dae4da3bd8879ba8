"""Multimodal parity queries: binary payload column + mapInPandas decode
stub + frame sampling. The fake decoder is pure arithmetic on byte length,
so DuckDB can verify the whole pipeline (octet_length of the utf-8 payload
== the bytes seen by the Python worker)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc.mm import decode_image_meta, sample_frames, with_binary_payload
from cdc.parity.common import load

QUERIES: dict = {}
ORACLES: dict = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


@q("mm_decode_meta", """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
       CAST(64 + n % 512 AS INT) AS width,
       CAST(64 + (n * 7) % 512 AS INT) AS height,
       CASE WHEN n % 2 = 0 THEN 'png' ELSE 'jpg' END AS fmt,
       n > 0 AS ok
FROM b
""")
def mm_decode_meta(spark, sf_dir):
    """Binary payload -> mapInPandas metadata decode (Arrow-batched; the
    image-decode seam with the deterministic fake codec)."""
    d = load(spark, sf_dir, "documents")
    return decode_image_meta(with_binary_payload(d))


@q("mm_decode_ppm", """
WITH m AS (
  SELECT doc_id,
         CAST(doc_id % 24 + 8 AS INT) AS width,
         CAST((doc_id * 7) % 24 + 8 AS INT) AS height,
         length(text) % 256 AS base
  FROM documents
), n AS (
  SELECT doc_id, width, height, base,
         width * height * 3 AS n_px FROM m
)
SELECT doc_id,
       CAST(3 + length(CAST(width AS VARCHAR)) + 1
              + length(CAST(height AS VARCHAR)) + 5 + n_px AS BIGINT) AS n_bytes,
       width, height, CAST(255 AS INT) AS maxval, 'ppm' AS fmt, true AS ok,
       CAST(base AS INT) AS px_first,
       CAST((base + n_px - 1) % 256 AS INT) AS px_last
FROM n
""")
def mm_decode_ppm(spark, sf_dir):
    """REAL image-byte decode: each document becomes an actual binary P6
    PPM file (header + RGB raster, built JVM-side), and
    ``cdc.mm.decode_ppm_meta`` parses those bytes back through the Arrow
    ``mapInPandas`` seam — magic, dimensions, maxval from the text
    header; first/last pixel values from the raster itself. The oracle
    predicts every field arithmetically from (doc_id, text), so any
    parser shortcut (fabricated dims, unread raster) hash-mismatches."""
    from cdc.mm import decode_image_meta, with_ppm_payload
    d = load(spark, sf_dir, "documents")
    return decode_image_meta(with_ppm_payload(d), fake=False)


@q("mm_decode_png", """
WITH m AS (
  SELECT doc_id,
         CAST(doc_id % 24 + 8 AS INT) AS width,
         CAST((doc_id * 7) % 24 + 8 AS INT) AS height,
         length(text) % 256 AS base
  FROM documents
), n AS (
  SELECT doc_id, width, height, base, width * height * 3 AS n_px FROM m
)
SELECT doc_id, width, height, CAST(255 AS INT) AS maxval, 'png' AS fmt,
       true AS ok,
       CAST(base AS INT) AS px_first,
       CAST((base + n_px - 1) % 256 AS INT) AS px_last
FROM n
""")
def mm_decode_png(spark, sf_dir):
    """REAL COMPRESSED image decode, no codec library: each document
    becomes an actual zlib-compressed PNG (8-bit RGB, per-row filter
    types cycling through None/Sub/Up/Average/Paeth), and
    ``cdc.mm.decode_png_meta`` walks the chunks, inflates the IDAT
    stream and UNFILTERS every scanline to recover true pixels. The
    oracle predicts the decoded dims and the first/last raster byte
    arithmetically — a decoder that skips inflation or fakes any of the
    five filters hash-mismatches. (The compressed byte COUNT is the one
    non-arithmetic field, so n_bytes is dropped from the compare.)"""
    from cdc.mm import decode_png_meta, with_png_payload
    d = load(spark, sf_dir, "documents")
    return decode_png_meta(with_png_payload(d)).drop("n_bytes")


@q("mm_resize_ppm", """
WITH m AS (
  SELECT doc_id,
         doc_id % 24 + 8 AS w,
         (doc_id * 7) % 24 + 8 AS h,
         length(text) % 256 AS base
  FROM documents
), s AS (
  SELECT doc_id, w, h, base, CAST(ceil(w / 8.0) AS BIGINT) AS st FROM m
), o AS (
  SELECT doc_id, w, h, base, st,
         (w + st - 1) // st AS ow, (h + st - 1) // st AS oh,
         ((h - 1) // st) * st AS rmax, ((w - 1) // st) * st AS cmax
  FROM s
)
SELECT doc_id,
       CAST(3 + length(CAST(ow AS VARCHAR)) + 1
              + length(CAST(oh AS VARCHAR)) + 5 + ow * oh * 3 AS BIGINT)
         AS n_bytes,
       CAST(ow AS INT) AS width, CAST(oh AS INT) AS height,
       CAST(255 AS INT) AS maxval, 'ppm' AS fmt, true AS ok,
       CAST(base AS INT) AS px_first,
       CAST((base + (rmax * w + cmax) * 3 + 2) % 256 AS INT) AS px_last
FROM o
""")
def mm_resize_ppm(spark, sf_dir):
    """HONEST image resize (round-4 #5 closed): real P6 payloads are
    stride-downsampled over their PARSED raster (every ceil(w/target)-th
    pixel of every such row, numpy-sliced) and re-encoded as valid P6 —
    verified by feeding ``resize_payload``'s binary output back through
    the real decoder. The oracle predicts the resized file's every field
    from (doc_id, text) alone: output dims are the sampled-column/row
    counts, px_first is the surviving (0,0) pixel, px_last the LAST
    SAMPLED pixel's blue channel — wrong stride geometry, an unparsed
    header, or fake-tier width arithmetic on a real payload all
    hash-mismatch."""
    from cdc.mm import decode_ppm_meta, resize_payload, with_ppm_payload
    d = load(spark, sf_dir, "documents")
    r = resize_payload(with_ppm_payload(d), target=8)
    return decode_ppm_meta(r.select("doc_id",
                                    F.col("resized").alias("payload")))


@q("mm_resize_png", """
WITH m AS (
  SELECT doc_id,
         doc_id % 24 + 8 AS w,
         (doc_id * 7) % 24 + 8 AS h,
         length(text) % 256 AS base
  FROM documents
), s AS (
  SELECT doc_id, w, h, base, CAST(ceil(w / 8.0) AS BIGINT) AS st FROM m
), o AS (
  SELECT doc_id, w, h, base, st,
         (w + st - 1) // st AS ow, (h + st - 1) // st AS oh,
         ((h - 1) // st) * st AS rmax, ((w - 1) // st) * st AS cmax
  FROM s
)
SELECT doc_id,
       CAST(3 + length(CAST(ow AS VARCHAR)) + 1
              + length(CAST(oh AS VARCHAR)) + 5 + ow * oh * 3 AS BIGINT)
         AS n_bytes,
       CAST(ow AS INT) AS width, CAST(oh AS INT) AS height,
       CAST(255 AS INT) AS maxval, 'ppm' AS fmt, true AS ok,
       CAST(base AS INT) AS px_first,
       CAST((base + (rmax * w + cmax) * 3 + 2) % 256 AS INT) AS px_last
FROM o
""")
def mm_resize_png(spark, sf_dir):
    """HONEST resize of COMPRESSED payloads: every document becomes a
    real zlib-compressed PNG, ``resize_payload`` inflates + unfilters it
    (``_parse_png``) before the 2-D pixel stride, and the output is a
    valid P6 re-verified through the real PPM decoder. The oracle is the
    same arithmetic as ``mm_resize_ppm`` (identical raster generator) —
    a resize that falls back to the fake byte-stride tier on compressed
    input hash-mismatches on every field."""
    from cdc.mm import decode_ppm_meta, resize_payload, with_png_payload
    d = load(spark, sf_dir, "documents")
    r = resize_payload(with_png_payload(d), target=8)
    return decode_ppm_meta(r.select("doc_id",
                                    F.col("resized").alias("payload")))


@q("mm_sample_frames", """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
f AS (
  SELECT doc_id, n, unnest(generate_series(0, CAST(ceil(n / 256.0) AS BIGINT) - 1)) AS i
  FROM b WHERE n > 0
)
SELECT doc_id, CAST(i AS INT) AS frame_no, CAST(i * 256 AS INT) AS "offset",
       CAST(least(256, n - i * 256) AS INT) AS frame_len
FROM f
""")
def mm_sample_frames(spark, sf_dir):
    """Frame sampling: 1 -> N row fan-out through mapInPandas (the video
    frame-extraction shape)."""
    d = load(spark, sf_dir, "documents")
    return sample_frames(with_binary_payload(d), every_n_bytes=256)


@q("mm_resize_meta", """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
m AS (
  SELECT doc_id, n, 64 + n % 512 AS w, 64 + (n * 7) % 512 AS h,
         greatest(1, CAST(ceil((64 + n % 512) / 256.0) AS BIGINT)) AS stride
  FROM b
)
SELECT doc_id, CAST(n AS BIGINT) AS orig_bytes, CAST(stride AS INT) AS stride,
       CAST(CASE WHEN n = 0 THEN 0 ELSE (n + stride - 1) // stride END AS BIGINT) AS resized_bytes,
       CAST(w // stride AS INT) AS out_w, CAST(h // stride AS INT) AS out_h
FROM m
""")
def mm_resize_meta(spark, sf_dir):
    """Resize stub through mapInPandas: byte-stride downsample + new
    metadata (the binary output column is dropped for the oracle compare —
    its LENGTH is the verified invariant: ceil(n / stride) bytes)."""
    from cdc.mm import resize_payload
    d = load(spark, sf_dir, "documents")
    return resize_payload(with_binary_payload(d)).drop("resized")


@q("mm_feature_extract", """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
       list_transform(generate_series(1, 8),
                      k -> CAST((n * k * 31) % 997 AS DOUBLE) / 997.0) AS embedding
FROM b
""")
def mm_feature_extract(spark, sf_dir):
    """Feature extraction: binary payload -> array<double> embedding via an
    Arrow-batched pandas pass (vision-encoder seam, deterministic fake)."""
    from cdc.mm import extract_features
    d = load(spark, sf_dir, "documents")
    return extract_features(with_binary_payload(d))
