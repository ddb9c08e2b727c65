"""Multimodal columns — image/audio/video as opaque ``binary`` content with
typed metadata, plus decode / feature-extract / frame-sample operators.

The 100 TB pattern: media rides in parquet as a BinaryType column next to
a typed metadata struct; all *structural* work (routing by media_type,
frame/window offsets, byte ranges, content hashing) is native and
column-level, and only the actual decode runs Python — one Arrow-batched
``mapInPandas`` stage with a per-executor backend singleton (same harness
discipline as operators/embedding.py).

Decode backends, import-gated where the lib is absent:

- ``fake`` — deterministic md5-based feature extractor, bit-identical to
  the native expression twin, so the plumbing itself is oracle-checked.
- ``png`` — a REAL decoder with no third-party deps: stdlib-zlib PNG
  decode (8-bit gray/RGB/RGBA, non-interlaced, all 5 scanline filters —
  public spec, RFC 2083) → integer luma → nearest-neighbor resample →
  per-column mean luminance.  This path executes end-to-end in any
  container and pins the real decode contract (bytes → pixels →
  features) that ``pil`` fulfils with Pillow installed.
- ``wav`` — a REAL audio decoder with no third-party deps: RIFF/WAVE
  chunk walk (public spec), 8/16-bit PCM, channel-mean downmix →
  per-segment RMS energy features.  Cross-validated in tests against
  the stdlib ``wave`` module's reader on the same bytes.
- ``pil`` — implemented against the public Pillow API (open → grayscale
  → thumbnail → column-mean features); raises NotImplementedError only
  when Pillow is absent — the branch is exercised in tests via a
  mock-injected PIL module wrapping the stdlib decoder on real PNG bytes.

Batch shape, schema, and partitioning are real in every backend.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"

MEDIA_TYPES = ("image", "audio", "video")


def _nib(h: Column, j: int) -> Column:
    return F.instr(F.lit(HEX), F.substring(h, j, 1)) - 1


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a media corpus from a text table: UTF-8 bytes as the
    opaque ``content`` blob + a typed ``meta`` struct (media_type routed by
    id, fake-but-deterministic dimensions from the content hash).  In
    production this is the parquet schema written by the media ingestion
    job; everything downstream only sees (id, content, meta)."""
    content = F.encode(F.col(text_col), "UTF-8")
    h = F.md5(content)
    mtype = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]), (F.col(id_col) % 3 + 1).cast("int")
    )
    meta = F.struct(
        mtype.alias("media_type"),
        (_nib(h, 1) * 64 + 256).cast("int").alias("width"),
        (_nib(h, 2) * 64 + 256).cast("int").alias("height"),
        (_nib(h, 3) * 1000 + 1000).cast("int").alias("duration_ms"),
        F.length(content).cast("long").alias("n_bytes"),
    )
    return df.select(F.col(id_col).alias("media_id"), content.alias("content"), meta.alias("meta"))


def media_corpus(spark, sf_dir: str) -> DataFrame:
    """The ONE synthetic media-corpus construction every media query
    starts from: the documents table, spread for parallelism, through
    :func:`attach_media`.  Single definition so the multimodal pack and
    the q33 frame_pairs graft host can never silently diverge on the
    media synthesis (r15 review finding)."""
    from briefly_spark.catalog import load_table, spread

    return attach_media(spread(load_table(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# feature extraction (decode stub) — native twin + Arrow harness
# ---------------------------------------------------------------------------
def fake_features_expr(content: Column, dims: int = 8) -> Column:
    """Deterministic 'decoded' feature vector from the raw bytes, fully
    native: dim d = int(md5(content ⧺ ':d')[:4], 16) / 65536 − 0.5.  The
    stand-in for image-embedding/audio-fingerprint output, byte-identical
    to the fake Python backend."""
    def dim_val(d: Column) -> Column:
        h = F.md5(F.concat(content, F.encode(F.concat(F.lit(":"), d.cast("string")), "UTF-8")))
        scaled = _nib(h, 1) * 4096 + _nib(h, 2) * 256 + _nib(h, 3) * 16 + _nib(h, 4)
        return scaled / F.lit(65536.0) - F.lit(0.5)

    return F.transform(F.sequence(F.lit(0), F.lit(dims - 1)), dim_val)


def fake_features_py(content: bytes, dims: int = 8) -> list[float]:
    out = []
    for d in range(dims):
        h = hashlib.md5(content + f":{d}".encode()).hexdigest()
        out.append(int(h[:4], 16) / 65536.0 - 0.5)
    return out


def png_decode_gray(blob: bytes) -> tuple[int, int, list[int]]:
    """Pure-stdlib PNG decode to grayscale pixels (row-major), for 8-bit
    gray / RGB / RGBA non-interlaced images — chunk walk, zlib inflate,
    all five scanline filters reversed per the public spec (RFC 2083 §6),
    integer luma (299/587/114 per mille) for color.  Returns (width,
    height, pixels).  This is the real decode the ``pil`` backend performs
    via Pillow, runnable with no third-party libs at all."""
    import struct
    import zlib

    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG byte stream")
    pos, idat = 8, b""
    w = h = nch = None
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if ctag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype not in (0, 2, 6) or interlace != 0:
                raise ValueError(
                    "unsupported PNG variant (need 8-bit gray/RGB/RGBA, "
                    "non-interlaced)"
                )
            nch = {0: 1, 2: 3, 6: 4}[ctype]
        elif ctag == b"IDAT":
            idat += data
        elif ctag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    stride = w * nch
    pixels: list[int] = []
    prev = bytearray(stride)
    pos = 0
    for _y in range(h):
        ft = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        prev = line
        if nch == 1:
            pixels.extend(line)
        else:
            for x in range(w):
                r, g, b2 = line[x * nch], line[x * nch + 1], line[x * nch + 2]
                pixels.append((r * 299 + g * 587 + b2 * 114) // 1000)
    return w, h, pixels


def png_features(blob: bytes, dims: int) -> list[float]:
    """Column-mean luminance features from a real PNG decode: nearest-
    neighbor resample to dims×dims, then the same mean-luminance formula
    as the ``pil`` backend (mean/255 − 0.5 per column)."""
    w, h, px = png_decode_gray(blob)
    feats = []
    for cx in range(dims):
        sx = (cx * w) // dims
        s = 0
        for cy in range(dims):
            sy = (cy * h) // dims
            s += px[sy * w + sx]
        feats.append(s / (255.0 * dims) - 0.5)
    return feats


def wav_decode_pcm(blob: bytes) -> tuple[int, int, list[int]]:
    """Pure-stdlib WAV decode for 8/16-bit PCM (RIFF/WAVE chunk walk per
    the public spec): returns (sample_rate, n_channels, samples) where
    ``samples`` is the channel-mean mono downmix, one signed 16-bit-range
    int per frame.  8-bit PCM (unsigned per spec) is recentered and
    scaled to the 16-bit range so both depths land on one scale.  This is
    the real decode the stdlib ``wave`` module performs — the tests
    cross-check both readers frame-for-frame on the same bytes."""
    import struct

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE byte stream")
    pos = 12
    rate = nch = depth = None
    data = None
    while pos + 8 <= len(blob):
        ctag = blob[pos : pos + 4]
        (length,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if ctag == b"fmt ":
            fmt_code, nch, rate = struct.unpack("<HHI", body[:8])
            (depth,) = struct.unpack("<H", body[14:16])
            if fmt_code != 1 or depth not in (8, 16):
                raise ValueError(
                    "unsupported WAV variant (need integer PCM, 8- or 16-bit)"
                )
        elif ctag == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if depth == 16:
        n = len(data) // (2 * nch) * nch
        raw = struct.unpack(f"<{n}h", data[: 2 * n])
    else:  # 8-bit PCM is unsigned, midpoint 128
        n = len(data) // nch * nch
        raw = [(b - 128) * 256 for b in data[:n]]
    samples = [
        sum(raw[i : i + nch]) // nch for i in range(0, len(raw), nch)
    ]
    return rate, nch, samples


def wav_features(blob: bytes, dims: int) -> list[float]:
    """Per-segment RMS energy from a real WAV decode: the mono downmix is
    split into ``dims`` contiguous segments and each contributes
    sqrt(mean(sample²))/32768 − 0.5 — the same feature scale as the image
    backends, so a mixed media table lands in one features column."""
    import math

    _rate, _nch, samples = wav_decode_pcm(blob)
    n = len(samples)
    feats = []
    for d in range(dims):
        lo, hi = (d * n) // dims, ((d + 1) * n) // dims
        seg = samples[lo:hi]
        if not seg:
            feats.append(-0.5)
            continue
        rms = math.sqrt(sum(s * s for s in seg) / len(seg))
        feats.append(rms / 32768.0 - 0.5)
    return feats


def _load_decoder(backend: str, dims: int):
    if backend == "fake":
        return lambda blobs: [fake_features_py(b, dims) for b in blobs]
    if backend == "png":
        return lambda blobs: [png_features(b, dims) for b in blobs]
    if backend == "wav":
        return lambda blobs: [wav_features(b, dims) for b in blobs]
    if backend == "pil":
        try:
            from PIL import Image  # type: ignore
        except ImportError as exc:
            raise NotImplementedError(
                "pil backend needs Pillow on executors; use backend='fake' for tests"
            ) from exc
        import io

        def decode(blobs: list[bytes]) -> list[list[float]]:
            out = []
            for b in blobs:
                # grayscale thumbnail → per-column mean luminance in [-0.5, 0.5)
                img = Image.open(io.BytesIO(b)).convert("L").resize((dims, dims))
                px = list(img.getdata())  # row-major, dims×dims
                out.append(
                    [sum(px[c::dims]) / (255.0 * dims) - 0.5 for c in range(dims)]
                )
            return out

        return decode
    raise ValueError(f"unknown decode backend {backend!r}")


def decode_features(
    df: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "media_id",
    dims: int = 8,
    backend: str = "fake",
) -> DataFrame:
    """Arrow-batched decode/feature-extract: (id, content) → (id, features).
    One mapInPandas stage; parallelism = partition count, batch size =
    spark.sql.execution.arrow.maxRecordsPerBatch — the real shape of a GPU
    decode stage (route partitions to GPU executors, batch into the model)."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        fn = _load_decoder(backend, dims)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "features": fn(list(pdf[content_col]))}
            )

    return df.select(id_col, content_col).mapInPandas(
        gen, schema=f"`{id_col}` long, features array<double>"
    )


# ---------------------------------------------------------------------------
# frame sampling (video/audio windowing) — native byte-range algebra
# ---------------------------------------------------------------------------
def sample_frames(
    df: DataFrame,
    *,
    n_frames: int = 4,
    frame_bytes: int = 32,
    content_col: str = "content",
) -> DataFrame:
    """Evenly-spaced frame sampling as byte-range extraction: n offsets over
    the blob, a ``substring`` slice per frame, and a content hash per frame
    — all native (the blob is never shipped to Python).  Output one row per
    (media_id, frame_idx) with the frame bytes and their md5; a real
    pipeline hands ``frame`` to :func:`decode_features`."""
    content = F.col(content_col)
    n = F.length(content)
    stride = F.greatest((n - frame_bytes) / F.lit(max(n_frames - 1, 1)), F.lit(1.0))
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: (i * stride).cast("long"),
    )
    framed = df.select("*", F.posexplode(offsets).alias("frame_idx", "off"))
    frame = F.expr(f"substring({content_col}, off + 1, {frame_bytes})")
    return framed.select(
        "media_id",
        "frame_idx",
        "off",
        frame.alias("frame"),
        F.md5(frame).alias("frame_md5"),
    )


def frame_fingerprints(
    df: DataFrame,
    *,
    frame_bytes: int = 32,
    n_frames: int = 16,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """FIXED-STRIDE frame fingerprints for media near-dup detection: hash
    the blob's k-th ``frame_bytes`` block for k < n_frames, keeping only
    fully-inside frames.  Fixed offsets (unlike :func:`sample_frames`'s
    length-proportional spacing) are what make fingerprints COMPARABLE
    across blobs: two media sharing a long prefix or identical regions at
    the same offsets share those frame hashes regardless of total length,
    while length-scaled offsets would shift every frame on a one-byte
    edit.  The validity guard matters: a frame past the blob's end would
    hash the empty string — shared by everything — and drown the signal
    (measured: the unguarded form marks ALL pairs related).  Returns
    (id, frame_idx, frame_md5), all native byte math."""
    content = F.col(content_col)
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda k: (k * frame_bytes).cast("long"),
    )
    framed = df.select(
        F.col(id_col), content.alias("__c"), F.posexplode(offsets).alias("frame_idx", "off")
    ).filter(F.col("off") + frame_bytes <= F.length("__c"))
    return framed.select(
        id_col,
        "frame_idx",
        F.md5(F.expr(f"substring(__c, off + 1, {frame_bytes})")).alias("frame_md5"),
    )
