"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark plumbing (binary column handling, metadata schema, Arrow
batch shape through mapInPandas, partitioning) is real and tested for
all three kinds, plus a deterministic sha256-derived fake feature
extractor with a DuckDB oracle.

Decode status per kind at ``real=True``:

  * audio — REAL pure-numpy decoder: RIFF/WAVE chunk walk, PCM16
    ``data`` chunk to int16 samples (no external library).
  * image — REAL pure-numpy+zlib decoder: PNG (8-bit, non-interlaced,
    gray/RGB/(+alpha)) — IHDR/IDAT chunk parse, zlib inflate, full
    scanline unfiltering (None/Sub/Up/Average/Paeth).
  * video — REAL pure-numpy decoder for UNCOMPRESSED payloads:
    YUV4MPEG2 (Y4M) stream parse, per-frame planar reads (C444/Cmono
    native, C420 family via nearest chroma upsample). Compressed
    codecs (h264 etc.) still raise NotImplementedError — they
    genuinely need PIL/av-class libraries absent from this
    environment; the deterministic fake path remains oracle-checked.

``encode_wav_pcm16`` / ``encode_png`` / ``encode_y4m`` are the
matching pure-numpy encoders used to synthesize valid payloads for
round-trip tests.

Asset table schema:
  asset_id long, kind string (image|audio|video), payload binary,
  meta struct<width int, height int, sample_rate int,
              duration_ms int, codec string>
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ("audio", "image", "video")  # alphabetical — index = hash mod 3

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "meta struct<width int, height int, sample_rate int, duration_ms int, codec string>"
)


def synth_assets(docs: DataFrame) -> DataFrame:
    """Deterministic asset table derived from the documents table:
    payload = utf-8 bytes of text (a stand-in blob), kind/meta derived
    from doc_id. Fully JVM-side (oracle-expressible)."""
    kind_idx = F.pmod(F.col("doc_id"), F.lit(3)).cast("int")
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), kind_idx + 1)
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.when(kind == "image", (F.pmod(F.col("doc_id"), F.lit(4)) + 1) * 256)
            .otherwise(F.lit(None)).cast("int").alias("width"),
            F.when(kind == "image", (F.pmod(F.col("doc_id"), F.lit(3)) + 1) * 256)
            .otherwise(F.lit(None)).cast("int").alias("height"),
            F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(None)).cast("int").alias("sample_rate"),
            F.when(kind != "image", (F.pmod(F.col("doc_id"), F.lit(30)) + 1) * 1000)
            .otherwise(F.lit(None)).cast("int").alias("duration_ms"),
            F.when(kind == "image", F.lit("png"))
            .when(kind == "audio", F.lit("pcm16")).otherwise(F.lit("h264")).alias("codec"),
        ).alias("meta"),
    )


def asset_features(assets: DataFrame, n_features: int = 4) -> DataFrame:
    """Deterministic fake feature vector per asset: byte length plus
    sha256-derived pseudo-features in [0, 1). JVM-side — this is the
    oracle-checkable stand-in wired where a real encoder would go.

    Returns (asset_id, kind, byte_len, f0..f{n-1} rounded to 6)."""
    cols = [
        F.col("asset_id"), F.col("kind"),
        F.length("payload").alias("byte_len"),
    ]
    for i in range(n_features):
        hex_slice = F.substring(F.sha2(F.col("payload"), 256), 1 + 8 * i, 8)
        val = F.conv(hex_slice, 16, 10).cast("double") / F.lit(float(1 << 32))
        cols.append(F.round(val, 6).alias(f"f{i}"))
    return assets.select(*cols)


def asset_features_sql(n_features: int = 4) -> str:
    """DuckDB oracle for synth_assets |> asset_features over the
    ``documents`` view (recomputes the derivation end-to-end)."""
    kinds = ", ".join(f"'{k}'" for k in KINDS)
    # DuckDB sha256 takes VARCHAR; hashing the text hashes its UTF-8
    # bytes — exactly the payload bytes Spark's sha2(binary) hashes
    feats = ",\n       ".join(
        f"ROUND(CAST(('0x' || substr(sha256(text), {1 + 8 * i}, 8)) AS BIGINT)"
        f" / {float(1 << 32)}, 6) AS f{i}"
        for i in range(n_features)
    )
    return f"""
SELECT doc_id AS asset_id,
       [{kinds}][CAST(doc_id % 3 AS INT) + 1] AS kind,
       octet_length(encode(text)) AS byte_len,
       {feats}
FROM documents
"""


# ----------------------------------------------- pure-numpy codecs

def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE writer: mono PCM16. ``samples`` int16 array."""
    s = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(s)) + s
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(b: bytes) -> tuple[np.ndarray, int, int]:
    """RIFF/WAVE chunk walk -> (int16 samples interleaved, sample_rate,
    n_channels). PCM (format 1), 16-bit only."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off, rate, channels, bits, fmt_code, data = 12, None, None, None, None, None
    while off + 8 <= len(b):
        cid, size = b[off : off + 4], struct.unpack("<I", b[off + 4 : off + 8])[0]
        chunk = b[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack("<HHI", chunk[:8])
            bits = struct.unpack("<H", chunk[14:16])[0]
        elif cid == b"data":
            data = chunk
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or fmt_code is None:
        raise ValueError("missing fmt /data chunk")
    if fmt_code != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (format={fmt_code}, bits={bits})")
    return np.frombuffer(data, dtype="<i2"), int(rate), int(channels)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG writer: 8-bit, non-interlaced, filter 0 scanlines.
    ``arr``: (h, w) gray or (h, w, {2,3,4}) uint8."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, data: bytes) -> bytes:
        raw = tag + data
        return struct.pack(">I", len(data)) + raw + struct.pack(">I", zlib.crc32(raw))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    scan = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(b: bytes) -> np.ndarray:
    """Pure numpy+zlib PNG decoder: 8-bit depth, non-interlaced,
    color types 0/2/4/6. Full scanline unfiltering (filters 0-4).
    Returns (h, w, channels) uint8."""
    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    off, idat, meta = 8, [], None
    while off + 8 <= len(b):
        size = struct.unpack(">I", b[off : off + 4])[0]
        tag = b[off + 4 : off + 8]
        data = b[off + 8 : off + 8 + size]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            meta = (w, h, depth, ctype, interlace)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        off += 12 + size  # len + tag + data + crc
    if meta is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, interlace = meta
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth}, color={ctype}, interlace={interlace})")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.intp)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up — vectorized
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — sequential
            rec = np.zeros(stride, dtype=np.intp)
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                up = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ftype == 1:
                    rec[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    rec[i] = (line[i] + (a + up) // 2) & 0xFF
                else:
                    rec[i] = (line[i] + _paeth(a, up, c)) & 0xFF
        else:
            raise ValueError(f"bad filter byte {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, ch)


_Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), colorspace: str = "C444"
) -> bytes:
    """Minimal YUV4MPEG2 (Y4M) writer — the uncompressed video format
    (public spec: mjpegtools yuv4mpeg(5)). ``frames``: (n, h, w, 3)
    uint8 planar-encodable YUV for C444, or (n, h, w) for Cmono."""
    a = np.asarray(frames, dtype=np.uint8)
    if colorspace == "Cmono":
        if a.ndim != 3:
            raise ValueError("Cmono frames must be (n, h, w)")
        n, h, w = a.shape
    elif colorspace == "C444":
        if a.ndim != 4 or a.shape[3] != 3:
            raise ValueError("C444 frames must be (n, h, w, 3)")
        n, h, w, _ = a.shape
    else:
        raise ValueError(f"unsupported colorspace {colorspace}")
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n".encode()
    parts = [head]
    for i in range(n):
        parts.append(b"FRAME\n")
        if colorspace == "Cmono":
            parts.append(a[i].tobytes())
        else:
            # planar: full Y plane, then U, then V
            parts.append(a[i, :, :, 0].tobytes())
            parts.append(a[i, :, :, 1].tobytes())
            parts.append(a[i, :, :, 2].tobytes())
    return b"".join(parts)


def decode_y4m(b: bytes) -> tuple[np.ndarray, int, tuple[int, int]]:
    """Pure-numpy YUV4MPEG2 decoder: stream header parse (W/H/F/C
    tags), per-frame FRAME markers (parameters after the marker are
    skipped per spec), planar plane reads. Supports C444 and Cmono
    natively and the C420 family (C420, C420jpeg, C420mpeg2,
    C420paldv) via nearest-neighbor chroma upsampling.

    Returns (frames, n_frames, (w, h)) with frames shaped
    (n, h, w, 3) for color or (n, h, w) for Cmono."""
    if not b.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = b.index(b"\n")
    w = h = None
    cspace = "C420jpeg"  # spec default when the C tag is absent
    for tok in b[len(_Y4M_MAGIC):nl].split(b" "):
        tok = tok.decode("ascii", "replace")
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("C"):
            cspace = tok
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    mono = cspace == "Cmono"
    if cspace == "C444":
        fsize, c_sub = 3 * w * h, 1
    elif mono:
        fsize, c_sub = w * h, 0
    elif cspace.startswith("C420"):
        if w % 2 or h % 2:
            raise ValueError("C420 needs even dimensions")
        fsize, c_sub = w * h + 2 * (w // 2) * (h // 2), 2
    else:
        raise ValueError(f"unsupported Y4M colorspace {cspace}")
    off = nl + 1
    frames = []
    while off < len(b):
        if b[off : off + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {off}")
        off = b.index(b"\n", off) + 1  # frame parameters are skippable
        raw = np.frombuffer(b, dtype=np.uint8, count=fsize, offset=off)
        if raw.size != fsize:
            raise ValueError("truncated Y4M frame")
        off += fsize
        if mono:
            frames.append(raw.reshape(h, w))
            continue
        y = raw[: w * h].reshape(h, w)
        if c_sub == 1:
            u = raw[w * h : 2 * w * h].reshape(h, w)
            v = raw[2 * w * h :].reshape(h, w)
        else:
            cw, chh = w // 2, h // 2
            u = raw[w * h : w * h + cw * chh].reshape(chh, cw)
            v = raw[w * h + cw * chh :].reshape(chh, cw)
            u = u.repeat(2, axis=0).repeat(2, axis=1)
            v = v.repeat(2, axis=0).repeat(2, axis=1)
        frames.append(np.stack([y, u, v], axis=-1))
    return np.stack(frames) if frames else np.zeros(
        (0, h, w) if mono else (0, h, w, 3), dtype=np.uint8
    ), len(frames), (w, h)


def _luma(px: np.ndarray) -> float:
    """Mean luma of decoded pixels: Rec.601 for color, raw for gray
    (alpha ignored)."""
    ch = px.shape[2]
    if ch >= 3:
        p = px.astype(np.float64)
        return float((0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]).mean())
    return float(px[..., 0].astype(np.float64).mean())


# ------------------------------------------------------------ decode

def decode_media(
    assets: DataFrame,
    kind: str,
    real: bool = False,
    thumb_bytes: int = 64,
    frames: int = 4,
) -> DataFrame:
    """Decode/feature-extract a media kind via mapInPandas.

    real=True decodes the actual payload bytes on the pure-numpy
    decoders above (no external library): WAV/PCM16 for audio, PNG for
    image, YUV4MPEG2 (Y4M) for video — ``frames`` evenly-spaced frames
    are sampled from the decoded stream and fingerprinted. Compressed
    video codecs raise NotImplementedError (they need libraries absent
    from this environment).
    real=False runs the deterministic fake decoder through the SAME
    Spark plumbing (schema, Arrow batch shape, partitioning) — the
    oracle-checkable path. Output schemas are identical either way:

      image -> (asset_id, thumb binary, mean_luma double)
               real: thumb = first bytes of the DECODED pixel buffer,
               mean_luma = Rec.601 luma mean (raw mean for grayscale)
      audio -> (asset_id, n_samples long, rms double)
               real: int16 sample count and RMS of samples / 32768
      video -> (asset_id, frame_idx long, frame_sig string), one row
               per sampled frame (UDTF-shaped: 1 row in, k rows out)
    """
    sub = assets.filter(F.col("kind") == kind).select("asset_id", "payload", "meta")

    if kind == "image":
        schema = "asset_id long, thumb binary, mean_luma double"

        def k_img(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                thumbs, lumas = [], []
                for p in pdf["payload"]:
                    b = bytes(p)
                    if real:
                        px = decode_png(b)
                        thumbs.append(px.tobytes()[:thumb_bytes])
                        lumas.append(_luma(px))
                    else:
                        thumbs.append(b[:thumb_bytes])
                        arr = np.frombuffer(b, dtype=np.uint8)
                        lumas.append(float(arr.mean()) if arr.size else 0.0)
                yield pd.DataFrame(
                    {"asset_id": pdf["asset_id"], "thumb": thumbs, "mean_luma": lumas}
                )

        return sub.mapInPandas(k_img, schema=schema)

    if kind == "audio":
        schema = "asset_id long, n_samples long, rms double"

        def k_aud(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                ns, rms = [], []
                for p in pdf["payload"]:
                    if real:
                        samples, _rate, _ch = decode_wav_pcm16(bytes(p))
                        ns.append(samples.size)
                        x = samples.astype(np.float64) / 32768.0
                        rms.append(float(np.sqrt((x ** 2).mean())) if x.size else 0.0)
                    else:
                        arr = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.float64)
                        ns.append(arr.size)
                        rms.append(float(np.sqrt((arr ** 2).mean())) if arr.size else 0.0)
                yield pd.DataFrame({"asset_id": pdf["asset_id"], "n_samples": ns, "rms": rms})

        return sub.mapInPandas(k_aud, schema=schema)

    if kind == "video":
        schema = "asset_id long, frame_idx long, frame_sig string"

        def k_vid(batches):
            # frame_sig = sha256 of the chunk's lowercase-hex encoding
            # (not of the raw bytes): hex is injective, so it is an
            # equally good deterministic fingerprint of the byte
            # slice, and it is cross-engine verifiable — DuckDB has no
            # sha256(BLOB)/blob-substring, but char-slicing
            # lower(hex(payload)) at 2x byte offsets reproduces the
            # chunking exactly (video_frames_sql).
            for pdf in batches:
                out_id, out_idx, out_sig = [], [], []
                for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                    b = bytes(p)
                    if real:
                        # uncompressed Y4M decodes pure-numpy like
                        # WAV/PNG; compressed codecs genuinely need an
                        # av-class library absent from this environment
                        if not b.startswith(_Y4M_MAGIC):
                            raise NotImplementedError(
                                "real video decoding supports uncompressed "
                                "YUV4MPEG2 (Y4M) payloads only; compressed "
                                "codecs need an av-class library not "
                                "available in this environment"
                            )
                        fr, n, _wh = decode_y4m(b)
                        # evenly spaced over the FULL stream incl. the
                        # last frame (n//frames stepping clusters at
                        # the head and never samples the tail)
                        k = min(frames, n)
                        for fi in range(k):
                            idx = round(fi * (n - 1) / (k - 1)) if k > 1 else 0
                            frame = fr[idx]
                            out_id.append(aid)
                            out_idx.append(fi)
                            out_sig.append(
                                hashlib.sha256(
                                    frame.tobytes().hex().encode()
                                ).hexdigest()[:16]
                            )
                        continue
                    step = max(1, len(b) // frames)
                    for fi in range(frames):
                        chunk = b[fi * step: (fi + 1) * step]
                        out_id.append(aid)
                        out_idx.append(fi)
                        out_sig.append(
                            hashlib.sha256(chunk.hex().encode()).hexdigest()[:16]
                        )
                if out_id:
                    yield pd.DataFrame(
                        {"asset_id": out_id, "frame_idx": out_idx, "frame_sig": out_sig}
                    )

        return sub.mapInPandas(k_vid, schema=schema)

    raise ValueError(f"unknown kind {kind!r}")


def video_frames_sql(frames: int = 4) -> str:
    """DuckDB oracle for synth_assets |> decode_media(kind='video'):
    recomputes the video subset (doc_id % 3 == 2), the byte-boundary
    chunking (step = max(len//frames, 1)) and the hex-based frame
    signature over the ``documents`` view. Byte slicing is done in
    hex-string space (2 chars per byte) because this DuckDB build has
    no blob substring — identical chunks by construction."""
    return f"""
WITH vids AS (
  SELECT doc_id AS asset_id,
         lower(hex(encode(text))) AS hexpay,
         octet_length(encode(text)) AS blen
  FROM documents WHERE doc_id % 3 = 2),
s AS (
  SELECT asset_id, unnest(range({frames})) AS frame_idx,
         GREATEST(blen // {frames}, 1) AS step, hexpay
  FROM vids)
SELECT asset_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       substr(sha256(substr(hexpay, frame_idx * step * 2 + 1, step * 2)), 1, 16)
         AS frame_sig
FROM s
"""


# ------------------------------------------------- perceptual hashing

def image_ahash(assets: DataFrame, real: bool = False) -> DataFrame:
    """64-bit average-hash (aHash) per asset as a 64-char '0'/'1'
    string — the classic perceptual image fingerprint: downsample to
    an 8x8 grid, threshold each cell against the mean.

    real=True decodes PNG payloads (decode_png) and takes true 8x8
    block means — the perceptual path, pytest-round-trip-tested.
    real=False (default, oracle-checkable) derives the "pixel" grid
    by sampling 64 byte positions of the payload text and taking
    ascii%16 — unlike a sha-derived stand-in this PRESERVES LOCALITY
    (a small edit moves few sampled cells), so near-duplicate payloads
    get near-equal hashes, which is the property the banding join
    exploits. Thresholding is integer-exact (64*pix > sum(pix)):
    no float mean crosses the engine boundary.
    """
    if real:
        import pyspark.sql.types as T

        out_schema = T.StructType([
            T.StructField("asset_id", T.LongType()),
            T.StructField("bits", T.StringType()),
        ])

        def k_ahash(batches):
            for pdf in batches:
                ids, bits = [], []
                for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                    arr = decode_png(bytes(payload))
                    if arr.ndim == 3:
                        arr = arr.mean(axis=2)
                    h, w = arr.shape
                    ys = (np.arange(9) * h) // 8
                    xs = (np.arange(9) * w) // 8
                    cells = np.array([
                        arr[ys[r]:max(ys[r + 1], ys[r] + 1),
                            xs[c]:max(xs[c + 1], xs[c] + 1)].mean()
                        for r in range(8) for c in range(8)
                    ])
                    b = cells > cells.mean()
                    ids.append(int(aid))
                    bits.append("".join("1" if x else "0" for x in b))
                yield pd.DataFrame({"asset_id": ids, "bits": bits})

        return assets.select("asset_id", "payload").mapInPandas(
            k_ahash, schema=out_schema
        )

    # CHARACTER-based positions on both engines (payload decodes as
    # utf-8; length()/substr() on the decoded string are char-based in
    # Spark and DuckDB alike)
    s = F.col("payload").cast("string")
    pix = F.expr(
        "transform(sequence(0, 63), i -> "
        "ascii(substr(CAST(payload AS STRING), "
        "1 + CAST(floor(i * length(CAST(payload AS STRING)) / 64) AS INT), 1)) % 16)"
    )
    return (
        assets.filter(F.length(s) >= 64)
        .select("asset_id", pix.alias("px"))
        .select(
            "asset_id",
            F.expr(
                "concat_ws('', transform(px, p -> "
                "CASE WHEN 64 * p > aggregate(px, 0, (a, x) -> a + x) "
                "THEN '1' ELSE '0' END))"
            ).alias("bits"),
        )
    )


def image_ahash_sql(table: str = "documents") -> str:
    """DuckDB twin of the fake-path aHash over synth_assets(documents):
    payload == utf-8 text, the same sampled ascii%16 grid and the same
    integer threshold."""
    return f"""
WITH px AS (
  SELECT doc_id AS asset_id,
         [ascii(substr(text, 1 + CAST(floor(i * length(text) / 64) AS INT), 1)) % 16
          for i in range(0, 64)] AS px
  FROM {table} WHERE length(text) >= 64)
SELECT asset_id,
       list_aggregate(
         [CASE WHEN 64 * p > list_sum(px) THEN '1' ELSE '0' END for p in px],
         'string_agg', '') AS bits
FROM px
"""


def ahash_pairs(
    hashes: DataFrame, max_hamming: int = 3, id_col: str = "asset_id"
) -> DataFrame:
    """Near-duplicate pairs by Hamming distance over 64-bit aHash
    strings: band the hash into 4 x 16-bit chunks (pigeonhole: any
    pair within Hamming <= 3 shares at least one exact chunk), join on
    chunk collisions, verify the exact distance — the simhash_pairs
    machinery applied to perceptual image hashes. Returns
    (a1, a2, hamming) with a1 < a2.
    """
    n_chunks = 4
    assert max_hamming < n_chunks, "pigeonhole needs max_hamming < n_chunks"
    chunks = F.explode(
        F.array(*[
            F.struct(
                F.lit(c).alias("c"),
                F.substring("bits", 1 + 16 * c, 16).alias("chunk"),
            )
            for c in range(n_chunks)
        ])
    )
    banded = hashes.select(
        F.col(id_col).alias("id"), "bits", chunks.alias("ck")
    ).select("id", "bits", F.col("ck.c").alias("c"), F.col("ck.chunk").alias("chunk"))
    x = banded.select(F.col("id").alias("a1"), F.col("bits").alias("b1"), "c", "chunk")
    y = banded.select(F.col("id").alias("a2"), F.col("bits").alias("b2"), "c", "chunk")
    cand = (
        x.join(y, ["c", "chunk"])
        .filter(F.col("a1") < F.col("a2"))
        .select("a1", "a2", "b1", "b2")
        .distinct()
    )
    ham = F.expr(
        "aggregate(transform(sequence(1, 64), i -> "
        "CASE WHEN substr(b1, i, 1) = substr(b2, i, 1) THEN 0 ELSE 1 END), "
        "0, (a, x) -> a + x)"
    )
    return (
        cand.select("a1", "a2", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def ahash_pairs_sql(max_hamming: int = 3, table: str = "documents") -> str:
    ah = image_ahash_sql(table).strip()
    chunk_rows = "\n  UNION ALL\n".join(
        f"  SELECT asset_id, bits, {c} AS c, substr(bits, {1 + 16 * c}, 16) AS chunk FROM h"
        for c in range(4)
    )
    return f"""
WITH h AS MATERIALIZED ({ah}),
banded AS (
{chunk_rows}),
cand AS (
  SELECT DISTINCT x.asset_id AS a1, y.asset_id AS a2,
                  x.bits AS b1, y.bits AS b2
  FROM banded x JOIN banded y
    ON x.c = y.c AND x.chunk = y.chunk AND x.asset_id < y.asset_id),
scored AS (
  SELECT a1, a2,
         CAST(list_sum([CASE WHEN substr(b1, i, 1) = substr(b2, i, 1)
                             THEN 0 ELSE 1 END
                        for i in range(1, 65)]) AS BIGINT) AS hamming
  FROM cand)
SELECT a1, a2, hamming FROM scored WHERE hamming <= {max_hamming}
"""
