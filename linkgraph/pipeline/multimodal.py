"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this
environment, so the DECODE step is stubbed (``decode_media(real=True)``
raises NotImplementedError with the intended library contract), while
everything Spark-side is real and tested: binary column handling,
metadata schema, Arrow batch shape through mapInPandas, deterministic
fake feature extraction (sha256-derived — so it has a DuckDB oracle),
and partitioning.

Asset table schema:
  asset_id long, kind string (image|audio|video), payload binary,
  meta struct<width int, height int, sample_rate int,
              duration_ms int, codec string>
"""

from __future__ import annotations

import hashlib

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


# ------------------------------------------------------------ decode

def decode_media(
    assets: DataFrame,
    kind: str,
    real: bool = False,
    thumb_bytes: int = 64,
    frames: int = 4,
) -> DataFrame:
    """Decode/feature-extract a media kind via mapInPandas.

    real=True is the production contract — decode with PIL/librosa/
    pyav and emit true features; those libraries are absent here, so
    it raises NotImplementedError. real=False runs the deterministic
    fake decoder through the SAME Spark plumbing (schema, Arrow batch
    shape, partitioning), which is what the tests pin down:

      image -> (asset_id, thumb binary, mean_luma double)
      audio -> (asset_id, n_samples long, rms double)
      video -> (asset_id, frame_idx long, frame_sig string), one row
               per sampled frame (UDTF-shaped: 1 row in, k rows out)
    """
    if real:
        raise NotImplementedError(
            "real media decoding needs PIL/librosa/av, not available in "
            "this environment; wire the real decoder into _fake_* below"
        )

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
