"""Perceptual average-hash (linkgraph/pipeline/multimodal.py)."""

import numpy as np

from linkgraph.pipeline.multimodal import (
    ahash_pairs,
    ahash_pairs_sql,
    encode_png,
    image_ahash,
    image_ahash_sql,
)


def _hamming(a, b):
    return sum(1 for x, y in zip(a, b) if x != y)


def test_real_png_ahash_perceptual_locality(spark):
    rng = np.random.default_rng(5)
    # structured gradient image: half dark, half bright
    base = np.zeros((64, 64), dtype=np.uint8)
    base[:, 32:] = 200
    noisy = np.clip(
        base.astype(int) + rng.integers(-8, 9, base.shape), 0, 255
    ).astype(np.uint8)
    inverted = (255 - base).astype(np.uint8)
    rows = [
        (0, bytearray(encode_png(base))),
        (1, bytearray(encode_png(noisy))),
        (2, bytearray(encode_png(inverted))),
    ]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r.asset_id: r.bits for r in image_ahash(assets, real=True).collect()}
    assert len(got[0]) == 64 and set(got[0]) <= {"0", "1"}
    # small pixel noise barely moves the hash; inversion flips it all
    assert _hamming(got[0], got[1]) <= 3
    assert _hamming(got[0], got[2]) == 64


def test_fake_path_locality_and_duckdb_twin(spark):
    import duckdb

    base = "the quick brown fox jumps over the lazy dog " * 3  # >= 64 chars
    edited = base[:20] + "X" + base[21:]  # same-length substitution
    rows = [(0, base), (1, edited), (2, "z" * 80)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from pyspark.sql import functions as F

    assets = docs.select(
        F.col("doc_id").alias("asset_id"), F.encode("text", "UTF-8").alias("payload")
    )
    h = image_ahash(assets)
    got = {r.asset_id: r.bits for r in h.collect()}
    assert _hamming(got[0], got[1]) <= 3  # locality under substitution
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = dict(con.execute(image_ahash_sql("documents")).fetchall())
    assert got == want
    gp = {(r.a1, r.a2, r.hamming) for r in ahash_pairs(h, max_hamming=3).collect()}
    wp = {tuple(r) for r in con.execute(ahash_pairs_sql(3, "documents")).fetchall()}
    assert gp == wp and (0, 1) in {(a, b) for a, b, _ in gp}
