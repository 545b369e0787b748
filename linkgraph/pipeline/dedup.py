"""Deduplication operators over a document table.

All operators work on DataFrame(doc_id: long, text: string, ...).
Each deterministic operator ships a companion ``*_SQL``/``*_sql()``
DuckDB oracle over a registered ``documents`` view.

Scale design (100TB): the exact path is a hash groupBy (shuffle on a
64-bit digest — uniformly distributed, no skew). The pairwise paths
never materialize the O(n^2) pair space: MinHash/LSH buckets candidate
pairs by band collision (shuffle keyed on (band, band_hash) — planted
near-dups collide, unrelated docs don't), SimHash buckets by signature
chunks (pigeonhole-exact for small Hamming radii). Only the tiny
candidate set reaches the verification join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.checkpoint import attach_caches
from linkgraph.pipeline.hashing import stable_hash64, stable_hash64_sql


# ----------------------------------------------------------------- exact

def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Map every doc to the min doc_id among byte-identical texts.

    Returns DataFrame(doc_id, canonical_id, is_duplicate). Hash-groupBy
    on the md5 digest (never on raw text — a 100TB shuffle of full
    documents vs 16 bytes per row).
    """
    digest = F.md5(F.col(text_col)).alias("_d")
    keyed = docs.select(F.col(id_col).alias("doc_id"), digest)
    canon = keyed.groupBy("_d").agg(F.min("doc_id").alias("canonical_id"))
    return (
        keyed.join(canon, "_d")
        .select(
            "doc_id",
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
        )
    )


EXACT_DEDUP_SQL = """
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       doc_id != MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
FROM documents
"""


# ------------------------------------------------------- word-shingles

def _word_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams per document.

    Documents with fewer than n tokens emit NO shingles (matching
    `_shingles_sql`'s ``len(w) >= n`` guard exactly — without the
    filter, Spark's slice() would emit a partial (<n)-gram for 1..n-1
    token docs that the SQL twin never sees)."""
    toks = F.split(F.col("text"), " ")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return (
        docs.filter(F.size(toks) >= n)
        .select(F.col("doc_id"), F.explode(sh).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def _shingles_sql(n: int = 3) -> str:
    # DuckDB list comprehension; n=3 word-grams, distinct per doc
    assert n == 3, "oracle SQL is written for n=3"
    return """
SELECT doc_id, unnest(list_distinct(
         [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          for i in range(1, greatest(len(w) - 1, 1))])) AS shingle
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
WHERE len(w) >= 3
"""


# --------------------------------------------------- n-gram Jaccard

def jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """All document pairs with word-n-gram Jaccard >= threshold.

    Brute-force (shingle equi-join) — the correctness baseline the LSH
    path is verified against. Returns (d1, d2, jaccard) with d1 < d2,
    jaccard rounded to 6 decimals.
    """
    sh = _word_shingles(docs, n).persist()
    card = sh.groupBy("doc_id").agg(F.count("*").alias("c"))
    a = sh.select(F.col("doc_id").alias("d1"), "shingle")
    b = sh.select(F.col("doc_id").alias("d2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("i"))
    )
    out = (
        inter.join(card.select(F.col("doc_id").alias("d1"), F.col("c").alias("c1")), "d1")
        .join(card.select(F.col("doc_id").alias("d2"), F.col("c").alias("c2")), "d2")
        .select(
            "d1", "d2",
            F.round(F.col("i") / (F.col("c1") + F.col("c2") - F.col("i")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def jaccard_pairs_sql(n: int = 3, threshold: float = 0.8) -> str:
    return f"""
WITH sh AS ({_shingles_sql(n)}),
card AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT d1, d2,
       ROUND(i / (c1.c + c2.c - i), 6) AS jaccard
FROM inter JOIN card c1 ON c1.doc_id = d1 JOIN card c2 ON c2.doc_id = d2
WHERE ROUND(i / (c1.c + c2.c - i), 6) >= {threshold}
"""


def jaccard_pairs_df_capped(
    docs: DataFrame, n: int = 3, threshold: float = 0.8, df_cap: int = 50
) -> DataFrame:
    """Jaccard near-dup pairs with document-frequency-capped candidate
    generation — the production fix for the brute shingle equi-join's
    scale defect: a shingle shared by f documents fans out f^2/2
    candidate rows, so one hyper-common shingle ("the end", a license
    header line) explodes the join at corpus scale.

    Candidates come only from shingles with document frequency
    <= df_cap; the Jaccard VERIFICATION still uses the full shingle
    sets (exact values). Semantics: a qualifying pair is emitted iff it
    shares at least one sub-cap shingle — at threshold >= 0.8 a missed
    pair would need every shared shingle to be hyper-common, i.e. two
    documents assembled entirely from boilerplate; the companion SQL
    oracle mirrors the same contract, and the cross-path test pins
    equality to the uncapped operator on the test corpus.

    Scale shape (100TB): candidate-join fan-out is bounded by
    df_cap^2/2 rows per shingle; the df filter is one extra map-side
    combinable aggregation over the shingle table.
    """
    sh = _word_shingles(docs, n).persist()
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("shingle")
    )
    sh_rare = sh.join(rare, "shingle")
    a = sh_rare.select(F.col("doc_id").alias("d1"), "shingle")
    b = sh_rare.select(F.col("doc_id").alias("d2"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    # exact verification over FULL shingle sets (not just rare ones)
    fa = sh.select(F.col("doc_id").alias("d1"), "shingle")
    fb = sh.select(F.col("doc_id").alias("d2"), "shingle")
    inter = (
        cand.join(fa, "d1").join(fb, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("i"))
    )
    card = sh.groupBy("doc_id").agg(F.count("*").alias("c"))
    return (
        inter.join(card.select(F.col("doc_id").alias("d1"), F.col("c").alias("c1")), "d1")
        .join(card.select(F.col("doc_id").alias("d2"), F.col("c").alias("c2")), "d2")
        .select(
            "d1", "d2",
            F.round(F.col("i") / (F.col("c1") + F.col("c2") - F.col("i")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_df_capped_sql(
    n: int = 3, threshold: float = 0.8, df_cap: int = 50
) -> str:
    """Exact oracle of the df-capped contract (same candidate rule)."""
    return f"""
WITH sh AS ({_shingles_sql(n)}),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {df_cap}),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM sh a JOIN rare r ON r.shingle = a.shingle
  JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id),
card AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.d1, c.d2, COUNT(*) AS i
  FROM cand c JOIN sh a ON a.doc_id = c.d1 JOIN sh b
    ON b.doc_id = c.d2 AND b.shingle = a.shingle
  GROUP BY 1, 2)
SELECT d1, d2, ROUND(i / (c1.c + c2.c - i), 6) AS jaccard
FROM inter JOIN card c1 ON c1.doc_id = d1 JOIN card c2 ON c2.doc_id = d2
WHERE ROUND(i / (c1.c + c2.c - i), 6) >= {threshold}
"""


def jaccard_prefix_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """EXACT Jaccard near-dup pairs via prefix filtering (the
    AllPairs / PPJoin candidate rule — Bayardo et al., WWW 2007;
    Xiao et al., WWW 2008).

    Same output contract as ``jaccard_pairs`` — EVERY pair with
    word-n-gram Jaccard >= threshold, (d1, d2, jaccard), d1 < d2,
    6-decimal rounding — so the companion oracle IS the brute-force
    SQL: the driver check proves the prefix filter loses nothing.
    Unlike ``jaccard_pairs_df_capped`` (which weakens the contract to
    "shares a sub-cap shingle") this path is lossless at any corpus.

    Candidate rule: order every document's shingle set by GLOBAL
    rarity (document frequency asc, shingle asc — a total order) and
    equi-join only each document's first ``|x| - ceil(t|x|) + 1``
    shingles in that order. Guarantee: J(x,y) >= t implies
    |x∩y| >= t·|x∪y| >= t·|x|, i.e. |x∩y| >= ceil(t|x|); if the two
    prefixes were disjoint under a shared total order, the doc whose
    prefix ends EARLIER in the order would have all shared shingles
    among its last ceil(t|x|)-1 — fewer than the required overlap.
    A size filter (t·|x| <= |y| <= |x|/t, forced by J >= t) prunes
    candidates in the join itself. All threshold arithmetic runs in
    the exact integer micro-domain so ceil() never drifts a float ulp
    in either direction — and because the OUTPUT contract keeps pairs
    by ROUND(J, 6) >= threshold (the brute contract), the candidate
    rule uses the slightly lower effective bound
    t_eff = (floor(t*1e6) - 1)/1e6: any pair whose ROUNDED Jaccard
    passes has true J >= t - 5e-7 >= t_eff, so the lemma applies at
    t_eff and no rounding-boundary pair can be lost.

    Scale shape (100TB): the equi-join touches ONLY prefix tokens,
    and the rarity order makes those the lowest-df shingles in the
    corpus — boilerplate shingles (license headers, "the end") sort
    LAST and never generate candidates at realistic thresholds, which
    is exactly the fan-out the brute join dies on. Cost: one df agg
    (map-side combinable), one per-doc sort agg, a rare-token
    equi-join, then exact verification over full shingle sets.
    """
    import math

    # candidate-rule threshold: one micro-unit BELOW floor(t*1e6) so
    # the prefix lemma covers every pair the ROUNDED output filter can
    # keep (true J may sit up to 5e-7 below t and still round in)
    th_micro = max(1, math.floor(threshold * 1_000_000) - 1)
    sh = _word_shingles(docs, n).persist()
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    per_doc = (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("arr"),
            F.count("*").alias("c"),
        )
    )
    # required overlap ceil(t*c) and prefix length, exact in int64:
    # ceil(t*c) = (c*TH + 1e6-1) div 1e6 for t = TH/1e6
    required = F.expr(f"(c * {th_micro}L + 999999L) div 1000000L")
    prefix_len = (F.col("c") - required + 1).cast("int")
    prefix = per_doc.select(
        "doc_id",
        "c",
        F.explode(F.slice("arr", F.lit(1), prefix_len)).alias("s"),
    ).select("doc_id", "c", F.col("s.shingle").alias("shingle"))
    a = prefix.select(
        F.col("doc_id").alias("d1"), F.col("c").alias("c1"), "shingle"
    )
    b = prefix.select(
        F.col("doc_id").alias("d2"), F.col("c").alias("c2"), "shingle"
    )
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("d1") < F.col("d2"))
            # size filter: t*c1 <= c2 and t*c2 <= c1 (integer-exact)
            & (F.col("c2") * 1_000_000 >= F.col("c1") * th_micro)
            & (F.col("c1") * 1_000_000 >= F.col("c2") * th_micro)
        )
        .select("d1", "d2")
        .distinct()
    )
    # exact verification over FULL shingle sets (same as the brute path)
    fa = sh.select(F.col("doc_id").alias("d1"), "shingle")
    fb = sh.select(F.col("doc_id").alias("d2"), "shingle")
    inter = (
        cand.join(fa, "d1")
        .join(fb, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("i"))
    )
    card = sh.groupBy("doc_id").agg(F.count("*").alias("c"))
    return (
        inter.join(card.select(F.col("doc_id").alias("d1"), F.col("c").alias("c1")), "d1")
        .join(card.select(F.col("doc_id").alias("d2"), F.col("c").alias("c2")), "d2")
        .select(
            "d1", "d2",
            F.round(F.col("i") / (F.col("c1") + F.col("c2") - F.col("i")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_prefix_pairs_sql(n: int = 3, threshold: float = 0.8) -> str:
    """The prefix filter is lossless, so its oracle IS the brute
    contract — passing the driver check against this SQL proves the
    candidate rule misses nothing on the corpus."""
    return jaccard_pairs_sql(n, threshold)


# ------------------------------------------------------- MinHash + LSH

def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs via MinHash signatures + LSH banding + exact
    verification. Same output contract as jaccard_pairs — for pairs
    well above/below threshold the two coincide (miss probability for
    a 0.98-similar pair at 32 hashes / 8 bands is ~1e-9), which is the
    cross-path test.

    Scale path: shingles shuffle once for the signature aggregation
    (num_hashes min-aggregates, map-side combined); candidates come
    from equi-joining band keys, so the pair space is never enumerated.
    """
    r = num_hashes // bands
    sh = _word_shingles(docs, n).persist()
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(stable_hash64(F.col("shingle"), salt=i)).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    # band key: md5 of the concatenated signature slice. ALL band keys
    # come out of ONE pass over the signature aggregate — an explode of
    # a struct array (the simhash_pairs shape), never a bands-way union
    # of selects that would re-evaluate the num_hashes-min aggregate
    # subtree once per band in the candidate join.
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"h{i}").cast("string") for i in range(b * r, (b + 1) * r)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *cols)).alias("bkey"),
            )
        )
    # persist BEFORE the self-join: without it the two sides only share
    # the num_hashes-min aggregate via ReuseExchange, which AQE breaks
    # when it broadcasts the build side; the cache makes the signature
    # aggregation run exactly once under ANY join strategy. Tiny table:
    # (doc_id, band, bkey) x bands rows per doc.
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    ).persist()
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bkey"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .distinct()
    )
    # exact verification on the candidate set only
    a = sh.select(F.col("doc_id").alias("d1"), "shingle")
    b2 = sh.select(F.col("doc_id").alias("d2"), "shingle")
    inter = (
        cand.join(a, "d1").join(b2, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("i"))
    )
    card = sh.groupBy("doc_id").agg(F.count("*").alias("c"))
    out = (
        inter.join(card.select(F.col("doc_id").alias("d1"), F.col("c").alias("c1")), "d1")
        .join(card.select(F.col("doc_id").alias("d2"), F.col("c").alias("c2")), "d2")
        .select(
            "d1", "d2",
            F.round(F.col("i") / (F.col("c1") + F.col("c2") - F.col("i")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # shingle + banded caches stay live for the returned lazy plan
    # (LRU-evictable); loop callers free them with release_caches(out)
    return attach_caches(out, [sh, banded])


# -------------------------------------------------- near-dup clustering

def near_dup_clusters(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """Collapse near-dup PAIRS into clusters: every document maps to
    the minimum doc_id of its connected component in the pair graph
    (transitive closure — if A~B and B~C, all three share a canonical
    id even when A~C was never emitted).

    This is the composition point between the dedup pipeline and the
    graph engine: the pair table IS an edge table, so clustering is
    connected_components() (min-id propagation, O(diameter) rounds —
    near-dup clusters are shallow). Returns
    (doc_id, canonical_id, is_duplicate) for EVERY input document
    (singletons are their own canonical id).
    """
    from linkgraph.components import connected_components

    edges = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
    ids = docs.select(F.col("doc_id").alias("id"))
    comp = connected_components(edges, nodes=ids).components
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("canonical_id"),
        (F.col("id") != F.col("comp")).alias("is_duplicate"),
    )


def near_dup_clusters_sql(pairs_sql: str) -> str:
    """Recursive-reach oracle over the same pair graph (components =
    min reachable doc_id), over ALL documents."""
    return f"""
WITH RECURSIVE
p AS ({pairs_sql}),
und AS (SELECT d1 AS src, d2 AS dst FROM p UNION ALL SELECT d2, d1 FROM p),
reach(id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT u.dst, r.comp FROM reach r JOIN und u ON u.src = r.id
)
SELECT id AS doc_id, MIN(comp) AS canonical_id,
       id != MIN(comp) AS is_duplicate
FROM reach GROUP BY id
"""


# ------------------------------------------------------------- SimHash

def simhash_table(docs: DataFrame, bits: int = 32) -> DataFrame:
    """Per-doc SimHash fingerprint over word tokens (term-frequency
    weighted). Returns (doc_id, simhash: long). Fully JVM-side.
    """
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") > 0)
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("double").alias("w"))
        .withColumn("h", stable_hash64(F.col("tok"), salt="simhash"))
    )
    per_bit = (
        tf.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("i"),
            "h", "w",
        )
        .withColumn(
            "v",
            F.when(F.expr("(h >> i) & 1") == 1, F.col("w")).otherwise(-F.col("w")),
        )
        .groupBy("doc_id", "i")
        .agg(F.sum("v").alias("s"))
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), i)")).otherwise(0)
        ).alias("simhash")
    )


def simhash_table_sql(bits: int = 32) -> str:
    h = stable_hash64_sql("tok", salt="simhash")
    return f"""
WITH tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS w, {h} AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE len(tok) > 0
  GROUP BY doc_id, tok),
per_bit AS (
  SELECT doc_id, i,
         SUM(CASE WHEN (h >> i) & 1 = 1 THEN w ELSE -w END) AS s
  FROM tf CROSS JOIN (SELECT unnest(range(0, {bits})) AS i)
  GROUP BY doc_id, i)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS BIGINT) AS simhash
FROM per_bit GROUP BY doc_id
"""


def auto_simhash_params(
    n_docs: int, max_hamming: int = 3, max_bits: int = 64
) -> tuple[int, int]:
    """(bits, chunks) scaled to corpus size while preserving the
    pigeonhole-exactness invariant max_hamming < chunks.

    Chunk width is the bucket key width: in-bucket candidate generation
    is quadratic per bucket, so width must track log2(n) (bucket count
    ~n). Exactness requires chunks > max_hamming, so scaling raises the
    TOTAL bit budget bits = chunks * width (capped at 64 — a bigint
    signature) rather than stealing width from the chunk count.
    """
    import math

    width = max(8, int(math.ceil(math.log2(max(n_docs, 2)))))
    chunks = max_hamming + 1
    bits = min(max_bits, chunks * width)
    return bits, chunks


def simhash_pairs(
    docs: DataFrame,
    bits: int | None = 32,
    max_hamming: int = 3,
    chunks: int | None = 4,
) -> DataFrame:
    """Pairs of docs with SimHash Hamming distance <= max_hamming.

    EXACT via pigeonhole banding: with ``chunks`` signature chunks and
    max_hamming < chunks, any qualifying pair agrees on at least one
    full chunk, so the chunk equi-join has perfect recall — no
    probabilistic miss, hence a strong brute-force SQL oracle.

    bits/chunks None => derived from the corpus size via
    auto_simhash_params (bucket-key width tracks log2(n) so in-bucket
    candidate generation stays O(1) per doc at any scale).
    """
    if bits is None or chunks is None:
        bits, chunks = auto_simhash_params(docs.count(), max_hamming)
    assert max_hamming < chunks
    width = bits // chunks
    sh = simhash_table(docs, bits).persist()
    chunked = sh.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftright(F.col("simhash"), c * width)
                    .bitwiseAND(F.lit((1 << width) - 1)).alias("ckey"),
                )
                for c in range(chunks)
            ])
        ).alias("b"),
    ).select("doc_id", "simhash", "b.chunk", "b.ckey")
    cand = (
        chunked.alias("x")
        .join(chunked.alias("y"), ["chunk", "ckey"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"),
            F.col("x.simhash").alias("s1"), F.col("y.simhash").alias("s2"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )


def simhash_pairs_sql(bits: int = 32, max_hamming: int = 3) -> str:
    return f"""
WITH sh AS ({simhash_table_sql(bits)})
SELECT a.doc_id AS d1, b.doc_id AS d2,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# -------------------------------------------- canonical representative

def pick_canonical(
    clusters: DataFrame,
    docs: DataFrame,
    prefer: str = "n_chars",
) -> DataFrame:
    """Representative selection — the decision step every dedup
    pipeline needs after clustering: per near-dup cluster KEEP exactly
    one document (the one that maximizes ``prefer``, default the
    longest by ``n_chars`` — the common keep-the-longest heuristic;
    ties break to the lowest doc_id) and mark the rest for drop.

    Input ``clusters`` is the (doc_id, canonical_id, ...) table from
    near_dup_clusters; output is (doc_id, canonical_id, keep) for
    EVERY input document — singletons keep themselves.

    Scale shape (100TB): one shuffle keyed by canonical_id (the window
    partition). Near-dup clusters are small (bounded by the pair
    graph's components), so no skew path is needed; a pathological
    giant cluster would indicate upstream threshold misconfiguration,
    not a partitioning problem.
    """
    joined = clusters.select("doc_id", "canonical_id").join(
        docs.select("doc_id", prefer), "doc_id"
    )
    w = Window.partitionBy("canonical_id").orderBy(
        F.desc(prefer), F.asc("doc_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .select("doc_id", "canonical_id", (F.col("rn") == 1).alias("keep"))
    )


def pick_canonical_sql(pairs_sql: str, prefer: str = "n_chars") -> str:
    """Oracle: the recursive-reach cluster oracle + the same
    (prefer DESC, doc_id ASC) row_number pick."""
    return f"""
WITH clusters AS ({near_dup_clusters_sql(pairs_sql)}),
j AS (
  SELECT c.doc_id, c.canonical_id, d.{prefer} AS prefer_v
  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id)
SELECT doc_id, canonical_id,
       (ROW_NUMBER() OVER (PARTITION BY canonical_id
                           ORDER BY prefer_v DESC, doc_id ASC)) = 1 AS keep
FROM j
"""


# -------------------------------------------------- containment dedup

def containment_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Asymmetric shingle containment C(d1 ⊆ d2) = |S(d1) ∩ S(d2)| /
    |S(d1)| over word n-gram shingle sets — the subset-duplicate
    detector symmetric Jaccard misses: a short document quoted whole
    inside a long one has low Jaccard (union is large) but containment
    ~1.0. The standard complement to Jaccard in dedup pipelines
    (Broder's containment, from the original shingling paper).

    Brute shingle equi-join baseline (same candidate shape as
    jaccard_pairs; the DF-capped candidate generation composes
    identically for the production path). Returns (d1, d2,
    containment) for ORDERED pairs d1 != d2 with round(C, 6) >=
    threshold — asymmetric, so both directions can appear.

    Scale shape (100TB): one shuffle keyed by shingle for candidates
    (bounded by document-frequency capping upstream), one keyed by
    (d1, d2) for the intersection count; cardinalities broadcast-join
    back. Shingle text never leaves the candidate join.
    """
    sh = _word_shingles(docs, n).persist()
    card = sh.groupBy("doc_id").agg(F.count("*").alias("c"))
    a = sh.select(F.col("doc_id").alias("d1"), "shingle")
    b = sh.select(F.col("doc_id").alias("d2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("d1") != F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("i"))
    )
    out = (
        inter.join(card.select(F.col("doc_id").alias("d1"), F.col("c").alias("c1")), "d1")
        .select(
            "d1", "d2",
            F.round(F.col("i") / F.col("c1"), 6).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )
    return attach_caches(out, [sh])


def containment_pairs_sql(n: int = 3, threshold: float = 0.8) -> str:
    return f"""
WITH sh AS ({_shingles_sql(n)}),
card AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT d1, d2, ROUND(CAST(i AS DOUBLE) / c.c, 6) AS containment
FROM inter JOIN card c ON c.doc_id = d1
WHERE ROUND(CAST(i AS DOUBLE) / c.c, 6) >= {threshold}
"""


def fuzzy_dup_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 8,
    max_dist: int = 8,
    fp_cap: int | None = 64,
) -> DataFrame:
    """Edit-distance near-duplicates with winnowing candidates: pairs
    sharing a winnowing fingerprint (guaranteed for any common
    substring of length >= w+k-1 — `text.winnow_fingerprints`) are
    verified with EXACT Levenshtein distance and kept at
    ``edit_distance <= max_dist``.

    Returns (doc1 < doc2, edit_distance). This is the character-level
    complement of `jaccard_pairs_df_capped` (token sets): small edits
    anywhere in the document keep most fingerprints intact, so true
    near-dups always reach the verify stage, while the verify itself
    is exact — no banding false negatives inside the candidate set.

    Scale shape (the module's standard two-phase discipline):
    candidate generation shuffles only 16-byte (doc_id, fp) rows;
    ``fp_cap`` drops fingerprints shared by more than that many docs
    BEFORE the self-join (a fingerprint common to thousands of docs is
    boilerplate, not signal — the hyper-common-shingle rule), bounding
    the fan-out at fp_cap²/2 per fingerprint. Only the surviving
    candidate pairs join the raw text back for the O(len²)
    Levenshtein verify. Both engines' levenshtein agree exactly
    (integer DP; verified 0/500 divergence on random strings).
    """
    from linkgraph.pipeline.text import winnow_fingerprints

    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    fps = winnow_fingerprints(docs, k=k, w=w)
    if fp_cap is not None:
        keep = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("fan"))
            .filter(F.col("fan") <= fp_cap)
            .select("fp")
        )
        fps = fps.join(keep, "fp")
    a = fps.select(F.col("doc_id").alias("doc1"), "fp")
    b = fps.select(F.col("doc_id").alias("doc2"), "fp")
    cand = (
        a.join(b, "fp")
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )
    t1 = docs.select(F.col("doc_id").alias("doc1"), F.col("text").alias("t1"))
    t2 = docs.select(F.col("doc_id").alias("doc2"), F.col("text").alias("t2"))
    return (
        cand.join(t1, "doc1")
        .join(t2, "doc2")
        # length-difference lower bound: |len1-len2| <= edit_distance,
        # so the O(len^2) DP only runs on pairs that can still qualify
        .filter(
            F.abs(F.length("t1") - F.length("t2")) <= max_dist
        )
        .select(
            "doc1",
            "doc2",
            F.levenshtein("t1", "t2").cast("long").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= max_dist)
    )


def fuzzy_dup_pairs_sql(
    k: int = 5, w: int = 8, max_dist: int = 8, fp_cap: int | None = 64,
    table: str = "documents",
) -> str:
    """DuckDB twin of `fuzzy_dup_pairs` (exact: integer hashes +
    integer edit distance)."""
    from linkgraph.pipeline.text import winnow_fingerprints_sql

    cap = (
        f"JOIN (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {fp_cap}) c USING (fp)"
        if fp_cap is not None
        else ""
    )
    return f"""
WITH fps AS MATERIALIZED ({winnow_fingerprints_sql(k=k, w=w, table=table)}),
capped AS (SELECT fps.* FROM fps {cap}),
cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id)
SELECT doc1, doc2,
       CAST(levenshtein(d1.text, d2.text) AS BIGINT) AS edit_distance
FROM cand JOIN {table} d1 ON d1.doc_id = doc1
          JOIN {table} d2 ON d2.doc_id = doc2
WHERE abs(len(d1.text) - len(d2.text)) <= {max_dist}
  AND levenshtein(d1.text, d2.text) <= {max_dist}
"""


# -------------------------------------------------- duplicate token spans

def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_occ: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr-style duplicated-span detection (Lee et al. 2022,
    arXiv:2107.06499): every k-token window whose exact token sequence
    occurs at >= ``min_occ`` positions corpus-wide (suffix-array
    semantics approximated at window granularity) is duplicated;
    per-document runs of overlapping duplicated windows merge into
    maximal spans.

    Returns DataFrame(doc_id, span_start, span_end, n_windows) with
    token-index bounds (end inclusive): the removal set a training
    pipeline would cut, without mutating the text (compose with
    substring surgery downstream).

    Scale shape (100 TB): windows shuffle as 60-bit md5 hashes (never
    window text); the occurrence count is one map-side-combinable
    groupBy; the duplicated-window filter is a semi join on the hash;
    span merging is a per-document window function over only the
    duplicated positions (a tiny fraction of the corpus). Window
    explosion is ~n_tokens rows per doc — the same fan as shingling,
    bounded per partition by input split size.
    """
    toks = F.split(F.col(text_col), " ", -1)
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).filter(
        F.size("toks") >= k
    )
    wins = base.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(toks) - {k}),"
                f" p -> array_join(slice(toks, p + 1, {k}), chr(31)))"
            )
        ).alias("p", "wtext"),
    ).select("doc_id", "p", stable_hash64(F.col("wtext")).alias("h"))
    common = (
        wins.groupBy("h")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_occ)
        .select("h")
    )
    dup = wins.join(common, "h", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("p")
    flagged = dup.withColumn(
        "brk",
        F.when(
            F.lag("p").over(w).isNull() | (F.col("p") - F.lag("p").over(w) > k),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("doc_id", "island")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") + F.lit(k - 1)).cast("long").alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
    )


def duplicate_spans_sql(
    k: int = 8, min_occ: int = 2, table: str = "documents"
) -> str:
    """DuckDB twin: identical tokenization (literal single-space
    split), window construction (1-based inclusive list slice), md5
    window hash, occurrence gate, and gaps-and-islands merge."""
    h = stable_hash64_sql("wtext")
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM {table}
  WHERE len(string_split(text, ' ')) >= {k}),
w AS (
  SELECT doc_id, g.p AS p,
         array_to_string(toks[g.p + 1 : g.p + {k}], chr(31)) AS wtext
  FROM t, UNNEST(generate_series(0, len(toks) - {k})) AS g(p)),
hashed AS (SELECT doc_id, p, {h} AS h FROM w),
common AS (SELECT h FROM (SELECT h, COUNT(*) AS occ FROM hashed GROUP BY h)
           WHERE occ >= {min_occ}),
dup AS (SELECT hashed.* FROM hashed SEMI JOIN common USING (h)),
flagged AS (
  SELECT doc_id, p,
         CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > {k}
              THEN 1 ELSE 0 END AS brk
  FROM dup),
isl AS (
  SELECT doc_id, p,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged)
SELECT doc_id,
       CAST(MIN(p) AS BIGINT) AS span_start,
       CAST(MAX(p) + {k} - 1 AS BIGINT) AS span_end,
       COUNT(*) AS n_windows
FROM isl GROUP BY doc_id, island
"""


# ----------------------------------------- cross-corpus fuzzy contamination

def cross_minhash_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Fuzzy train/eval contamination: every (doc_id, bench_id) pair
    with word-n-gram Jaccard >= threshold, found via MinHash banding
    across TWO corpora instead of a self-join — the near-duplicate
    complement of curate.decontaminate's exact n-gram gate (a light
    paraphrase or whitespace change defeats exact n-grams; it barely
    moves Jaccard).

    Scale shape: both corpora shingle once; band keys equi-join so the
    training side never fans out beyond colliding buckets, and only
    candidates reach the exact verification join. The benchmark side
    is typically tiny — Catalyst broadcasts it on its own. Identity
    rows (same id in both tables) are excluded.
    """
    r = num_hashes // bands

    def _banded(sh: DataFrame, id_out: str) -> DataFrame:
        sig = sh.groupBy("doc_id").agg(
            *[
                F.min(stable_hash64(F.col("shingle"), salt=i)).alias(f"h{i}")
                for i in range(num_hashes)
            ]
        )
        band_structs = []
        for b in range(bands):
            cols = [F.col(f"h{i}").cast("string") for i in range(b * r, (b + 1) * r)]
            band_structs.append(
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws(",", *cols)).alias("bkey"),
                )
            )
        return sig.select(
            F.col("doc_id").alias(id_out),
            F.explode(F.array(*band_structs)).alias("bk"),
        ).select(
            id_out, F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
        ).persist()

    sh_d = _word_shingles(docs, n).persist()
    sh_b = _word_shingles(benchmark, n).persist()
    bd = _banded(sh_d, "doc_id")
    bb = _banded(sh_b, "bench_id")
    cand = (
        bd.join(bb, ["band", "bkey"])
        .filter(F.col("doc_id") != F.col("bench_id"))
        .select("doc_id", "bench_id")
        .distinct()
    )
    a = sh_d.select("doc_id", "shingle")
    b2 = sh_b.select(F.col("doc_id").alias("bench_id"), "shingle")
    inter = (
        cand.join(a, "doc_id")
        .join(b2, ["bench_id", "shingle"])
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("i"))
    )
    cd = sh_d.groupBy("doc_id").agg(F.count("*").alias("c1"))
    cb = sh_b.groupBy("doc_id").agg(F.count("*").alias("c2")).withColumnRenamed(
        "doc_id", "bench_id"
    )
    out = (
        inter.join(cd, "doc_id")
        .join(cb, "bench_id")
        .select(
            "doc_id", "bench_id",
            F.round(
                F.col("i") / (F.col("c1") + F.col("c2") - F.col("i")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return attach_caches(out, [sh_d, sh_b, bd, bb])


def fuzzy_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    **lsh_kwargs,
) -> DataFrame:
    """Documents surviving the fuzzy contamination gate: anti-join on
    :func:`cross_minhash_pairs` hits."""
    pairs = cross_minhash_pairs(
        docs, benchmark, n=n, threshold=threshold, **lsh_kwargs
    )
    hits = pairs.select("doc_id").distinct()
    out = docs.join(hits, "doc_id", "left_anti")
    # re-attach the pair stage's persisted intermediates so callers
    # can still free them through THIS result
    return attach_caches(out, getattr(pairs, "_linkgraph_caches", []))


def cross_jaccard_sql(
    bench_where: str, n: int = 3, threshold: float = 0.8
) -> str:
    """Brute-force cross-corpus oracle (the same role jaccard_pairs_sql
    plays for the self-join LSH path: at 32 hashes / 8 bands a
    >=0.8-similar pair misses with probability ~1e-9, so brute force
    and LSH agree on the driver fixtures)."""
    assert n == 3, "oracle SQL is written for n=3"
    shingles = _shingles_sql(n).strip()
    return f"""
WITH
sd AS MATERIALIZED ({shingles}),
sb AS MATERIALIZED (
  SELECT * FROM sd WHERE doc_id IN (SELECT doc_id FROM documents WHERE {bench_where})),
inter AS (
  SELECT sd.doc_id AS doc_id, sb.doc_id AS bench_id, COUNT(*) AS i
  FROM sd JOIN sb ON sd.shingle = sb.shingle AND sd.doc_id != sb.doc_id
  GROUP BY 1, 2),
card AS (SELECT doc_id, COUNT(*) AS c FROM sd GROUP BY doc_id)
SELECT i.doc_id, i.bench_id,
       ROUND(CAST(i.i AS DOUBLE) / (cd.c + cb.c - i.i), 6) AS jaccard
FROM inter i JOIN card cd ON cd.doc_id = i.doc_id
             JOIN card cb ON cb.doc_id = i.bench_id
WHERE CAST(i.i AS DOUBLE) / (cd.c + cb.c - i.i) >= {threshold}
"""


# ------------------------------------------- cross-source overlap

def source_overlap(docs: DataFrame, n: int = 3) -> DataFrame:
    """Pairwise n-gram overlap between corpus SOURCES — the
    "which feeds leak into which" audit a training-data pipeline runs
    before mixing: per source the distinct word n-gram set, per source
    pair the intersection size, Jaccard, and containment
    (inter / min set size — the asymmetric-subset detector).

    Returns (source_a, source_b, inter, jaccard, containment) for
    pairs with inter > 0, source_a < source_b, floats rounded 6.

    Scale notes (100TB): shingles are hashed to 60-bit keys
    IMMEDIATELY (raw text never shuffles — the exact_dedup
    discipline; the twin hashes identically so the comparison is
    value-exact including any collision); one distinct over
    (source, gram-hash), one gram-keyed self-join whose per-gram
    fan-out is bounded by #sources²/2 (sources are few by
    construction), one pair aggregate. Set sizes broadcast back."""
    sh = _word_shingles(docs, n)
    src = docs.select("doc_id", "source")
    sg = (
        sh.join(src, "doc_id")
        .select("source", stable_hash64(F.col("shingle")).alias("g"))
        .distinct()
    )
    sizes = sg.groupBy("source").agg(F.count("*").cast("long").alias("sz"))
    a = sg.select(F.col("source").alias("source_a"), "g")
    b = sg.select(F.col("source").alias("source_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("sz").alias("za"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("sz").alias("zb"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a", "source_b", "inter",
            F.round(
                F.col("inter").cast("double")
                / (F.col("za") + F.col("zb") - F.col("inter")).cast("double"),
                6,
            ).alias("jaccard"),
            F.round(
                F.col("inter").cast("double")
                / F.least("za", "zb").cast("double"),
                6,
            ).alias("containment"),
        )
    )


def source_overlap_sql(n: int = 3) -> str:
    """DuckDB twin of `source_overlap` (same 60-bit gram hashes)."""
    h = stable_hash64_sql("shingle")
    return f"""
WITH sh AS MATERIALIZED ({_shingles_sql(n).strip()}),
sg AS MATERIALIZED (
  SELECT DISTINCT d.source, {h} AS g
  FROM sh JOIN documents d USING (doc_id)),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS sz FROM sg GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2)
SELECT i.source_a, i.source_b, i.inter,
       ROUND(CAST(i.inter AS DOUBLE)
             / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 6) AS jaccard,
       ROUND(CAST(i.inter AS DOUBLE)
             / CAST(LEAST(sa.sz, sb.sz) AS DOUBLE), 6) AS containment
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
"""


def dedup_report(
    pairs: DataFrame, docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus-level deduplication report over a near-dup pair table —
    the summary a curation run actually publishes: how many documents
    and bytes the dedup pass removes, and the cluster-size histogram
    (power-law cluster tails are the boilerplate signature).

    Composes ``near_dup_clusters`` (min-id components over the pair
    graph). Returns ONE row:

      n_docs, n_clusters, n_duplicates (docs dropped keeping one
      canonical per cluster), dup_frac (rounded 6), chars_total,
      chars_removed (characters of non-canonical docs — the storage
      the pass saves), max_cluster, singleton_clusters.

    All counts are integer-exact; replayed by ``dedup_report_sql``.
    Scale shape: the component run + TWO map-combined aggregates over
    the (doc_id, canonical_id) frame joined once against doc lengths —
    no new shuffles beyond the clustering itself.
    """
    clusters = near_dup_clusters(pairs, docs)
    lens = docs.select("doc_id", F.length(text_col).alias("n"))
    j = clusters.join(lens, "doc_id")
    per_cluster = j.groupBy("canonical_id").agg(F.count("*").alias("sz"))
    agg1 = j.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("is_duplicate").cast("long")).alias("n_duplicates"),
        F.sum("n").alias("chars_total"),
        F.sum(F.when(F.col("is_duplicate"), F.col("n")).otherwise(0))
        .alias("chars_removed"),
    )
    agg2 = per_cluster.agg(
        F.count("*").alias("n_clusters"),
        F.max("sz").alias("max_cluster"),
        F.sum(F.when(F.col("sz") == 1, 1).otherwise(0))
        .alias("singleton_clusters"),
    )
    return agg1.crossJoin(agg2).select(
        "n_docs", "n_clusters", "n_duplicates",
        F.round(F.col("n_duplicates") / F.col("n_docs"), 6).alias("dup_frac"),
        "chars_total", "chars_removed", "max_cluster", "singleton_clusters",
    )


def dedup_report_sql(pairs_sql: str, table: str = "documents") -> str:
    """Oracle: the same one-row report over the recursive-reach
    cluster oracle."""
    return f"""
WITH clusters AS ({near_dup_clusters_sql(pairs_sql)}),
j AS (SELECT c.doc_id, c.canonical_id, c.is_duplicate, length(d.text) AS n
      FROM clusters c JOIN {table} d ON d.doc_id = c.doc_id),
pc AS (SELECT canonical_id, COUNT(*) AS sz FROM j GROUP BY canonical_id),
a1 AS (SELECT COUNT(*) AS n_docs,
              SUM(CASE WHEN is_duplicate THEN 1 ELSE 0 END) AS n_duplicates,
              SUM(n) AS chars_total,
              SUM(CASE WHEN is_duplicate THEN n ELSE 0 END) AS chars_removed
       FROM j),
a2 AS (SELECT COUNT(*) AS n_clusters, MAX(sz) AS max_cluster,
              SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS singleton_clusters
       FROM pc)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_clusters AS BIGINT) AS n_clusters,
       CAST(n_duplicates AS BIGINT) AS n_duplicates,
       ROUND(CAST(n_duplicates AS DOUBLE) / n_docs, 6) AS dup_frac,
       CAST(chars_total AS BIGINT) AS chars_total,
       CAST(chars_removed AS BIGINT) AS chars_removed,
       CAST(max_cluster AS BIGINT) AS max_cluster,
       CAST(singleton_clusters AS BIGINT) AS singleton_clusters
FROM a1, a2
"""
