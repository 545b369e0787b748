"""Corpus-curation operators a training-data run needs AFTER dedup:
benchmark decontamination, stratified / quota sampling, deterministic
corpus shuffling, and concat-then-chunk sequence packing.

All five are pure DataFrame compositions (zero UDFs) with exact DuckDB
SQL oracles. Determinism everywhere comes from the cross-engine
md5-prefix hash (linkgraph.pipeline.hashing) — never from Spark's
partition-order-dependent rand()/monotonically_increasing_id().

Scale shapes (100TB):
  * decontaminate — benchmark n-gram table is tiny (a test set, not a
    corpus) -> distinct once, broadcast; the corpus side explodes
    n-gram hashes map-side, probes the broadcast, and aggregates per
    doc. ONE shuffle (the per-doc groupBy), no corpus self-join.
  * stratified_sample — shuffle-free map+filter (hash threshold).
  * quota_sample / corpus_shuffle / pack_sequences — one shuffle each
    (window partitioned by the group / shard key). Shard count is the
    knob: pick n_shards so a shard's rows fit one task's sort buffer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.pipeline.hashing import stable_hash64, stable_hash64_sql

_M = 1_000_000  # hash-bucket resolution for rate thresholds


def _token_ngrams(toks: Column, k: int) -> Column:
    """Array of space-joined token k-grams (empty when < k tokens)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.when(F.size(toks) >= k, grams).otherwise(F.array().cast("array<string>"))


def _token_ngrams_sql(k: int) -> str:
    """The same k-gram list over a `toks` column, DuckDB list syntax."""
    parts = " || ' ' || ".join(f"toks[i + {j}]" for j in range(k))
    return f"[{parts} for i in range(1, greatest(len(toks) - {k - 1}, 0) + 1)]"


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8) -> DataFrame:
    """Flag corpus documents sharing any token ``n``-gram with a
    benchmark/test set — the standard pre-training decontamination
    pass (n-gram overlap against eval sets).

    Returns one row per corpus document:
    (doc_id, n_hits, contaminated) where n_hits counts DISTINCT
    benchmark n-grams present in the document.

    Both sides reduce n-grams to the 60-bit cross-engine hash before
    the join, so only 8-byte keys (never gram text) cross the wire;
    the benchmark side is distinct-ed and broadcast.
    """
    def grams(df: DataFrame) -> DataFrame:
        toks = F.split(F.col("text"), " ")
        return df.select(
            "doc_id", F.explode(_token_ngrams(toks, n)).alias("gram")
        ).select("doc_id", stable_hash64("gram").alias("gh"))

    bench = F.broadcast(grams(benchmark).select("gh").distinct())
    hits = (
        grams(docs)
        .join(bench, "gh")
        .groupBy("doc_id")
        .agg(F.count_distinct("gh").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_sql(benchmark_where: str, n: int = 8) -> str:
    """Oracle: same n-gram hash overlap with the benchmark defined as
    ``SELECT ... FROM documents WHERE {benchmark_where}``."""
    g = _token_ngrams_sql(n)
    h = stable_hash64_sql("g")
    return f"""
WITH bt AS (SELECT string_split(text, ' ') AS toks FROM documents WHERE {benchmark_where}),
bg AS (SELECT DISTINCT {h} AS gh FROM (SELECT unnest({g}) AS g FROM bt)),
dt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
dg AS (SELECT doc_id, {h} AS gh FROM (SELECT doc_id, unnest({g}) AS g FROM dt)),
hits AS (SELECT doc_id, COUNT(DISTINCT dg.gh) AS n_hits
         FROM dg JOIN bg ON bg.gh = dg.gh GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(hits.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id
"""


def _doc_hash(seed: int) -> Column:
    return stable_hash64(F.col("doc_id").cast("string"), salt=seed)


def _doc_hash_sql(seed: int) -> str:
    return stable_hash64_sql("CAST(doc_id AS VARCHAR)", salt=seed)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-language sampling: keep a document iff its
    seeded hash bucket (0..1e6) falls below lang's rate threshold.

    The per-group mixing-weights primitive (sample 50% of en, 25% of
    zh, ...). Hash-threshold sampling is reproducible across runs,
    engines, and cluster sizes — unlike df.sample(), whose output
    depends on partitioning. Shuffle-free: pure map + filter, so at
    100TB it rides the scan. Returns (doc_id, lang, bucket).
    """
    bucket = F.pmod(_doc_hash(seed), F.lit(_M))
    # round, don't truncate: int(0.000498 * 1e6) == 497 under binary
    # floating point — the effective rate would be off by one bucket
    thresh = F.lit(int(round(default_rate * _M)))
    for lang, r in sorted(rates.items()):
        thresh = F.when(F.col("lang") == lang, F.lit(int(round(r * _M)))).otherwise(thresh)
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < thresh)
    )


def stratified_sample_sql(
    rates: dict[str, float], default_rate: float = 0.0, seed: int = 0
) -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {int(round(r * _M))}"
        for lang, r in sorted(rates.items())
    )
    return f"""
SELECT doc_id, lang, {_doc_hash_sql(seed)} % {_M} AS bucket
FROM documents
WHERE {_doc_hash_sql(seed)} % {_M} < (CASE {whens} ELSE {int(round(default_rate * _M))} END)
"""


def quota_sample(docs: DataFrame, quota: int, by: str = "lang", seed: int = 0) -> DataFrame:
    """Keep at most ``quota`` documents per group, picked by seeded
    hash order — a deterministic per-group reservoir (cap any one
    domain/language's contribution to the mix).

    One shuffle: a window partitioned by the group key; rank order is
    the total order (hash, doc_id), so ties are impossible and the
    result is engine-independent. Returns (doc_id, group, rk).
    """
    h = _doc_hash(seed)
    w = Window.partitionBy("grp").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", F.col(by).alias("grp"), h.alias("h"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= quota)
        .select("doc_id", "grp", "rk")
    )


def quota_sample_sql(quota: int, by: str = "lang", seed: int = 0) -> str:
    h = _doc_hash_sql(seed)
    return f"""
SELECT doc_id, grp, rk FROM (
  SELECT doc_id, {by} AS grp,
         CAST(ROW_NUMBER() OVER (PARTITION BY {by} ORDER BY {h} ASC, doc_id ASC) AS BIGINT) AS rk
  FROM documents)
WHERE rk <= {quota}
"""


def corpus_shuffle(docs: DataFrame, n_shards: int = 8, seed: int = 0) -> DataFrame:
    """Deterministic global shuffle for training order: shard by
    seeded hash, position within shard by (hash, doc_id).

    The writer's `repartition(n).sortWithinPartitions(...)` shape with
    a reproducible order — rerunning on different cluster sizes yields
    byte-identical shard files. Returns (doc_id, shard, pos).
    """
    h = _doc_hash(seed)
    shard = F.pmod(h, F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", h.alias("h"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", F.col("shard").cast("long").alias("shard"), "pos")
    )


def corpus_shuffle_sql(n_shards: int = 8, seed: int = 0) -> str:
    h = _doc_hash_sql(seed)
    return f"""
SELECT doc_id, CAST({h} % {n_shards} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY {h} % {n_shards}
            ORDER BY {h} ASC, doc_id ASC) AS BIGINT) AS pos
FROM documents
"""


def pack_sequences(
    docs: DataFrame, seq_len: int = 128, n_shards: int = 8, seed: int = 0
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are laid out in
    deterministic shuffle order per shard, token counts accumulate,
    and every ``seq_len`` tokens starts a new training sequence.

    Returns (doc_id, shard, seq_id, offset, n_tokens): the document's
    shard, the sequence its FIRST token lands in, the offset within
    that sequence, and its whitespace token count — exactly the
    placement map a packed-example writer needs (a document may span
    sequences; the map is by construction gap-free within a shard).

    One shuffle (window per shard); the running sum is a streaming
    window frame (ROWS UNBOUNDED PRECEDING), not a re-scan.
    """
    h = _doc_hash(seed)
    shard = F.pmod(h, F.lit(n_shards))
    n_tok = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start")
    return (
        docs.select(
            "doc_id", h.alias("h"), shard.alias("shard"),
            n_tok.cast("long").alias("n_tokens"),
        )
        .withColumn("start", start)
        .select(
            "doc_id",
            F.col("shard").cast("long").alias("shard"),
            F.floor(F.col("start") / seq_len).cast("long").alias("seq_id"),
            F.pmod(F.col("start"), F.lit(seq_len)).cast("long").alias("offset"),
            "n_tokens",
        )
    )


def pack_sequences_sql(seq_len: int = 128, n_shards: int = 8, seed: int = 0) -> str:
    h = _doc_hash_sql(seed)
    return f"""
WITH laid AS (
  SELECT doc_id, {h} % {n_shards} AS shard,
         len(string_split(text, ' ')) AS n_tokens,
         SUM(len(string_split(text, ' '))) OVER (
           PARTITION BY {h} % {n_shards}
           ORDER BY {h} ASC, doc_id ASC
           ROWS UNBOUNDED PRECEDING) - len(string_split(text, ' ')) AS start
  FROM documents)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST(FLOOR(CAST(start AS DOUBLE) / {seq_len}) AS BIGINT) AS seq_id,
       CAST(start % {seq_len} AS BIGINT) AS offset,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM laid
"""


def line_dedup(
    docs: DataFrame,
    max_df: int = 1,
    sep: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style repeated-span removal (Raffel et al. 2020,
    arXiv:1910.10683 §2.2): drop every line that occurs verbatim in
    more than ``max_df`` distinct documents — license headers,
    navigation boilerplate, cookie banners — and reassemble each
    document from its surviving lines in original order. Documents
    whose lines are all boilerplate disappear entirely.

    ``sep`` picks the span granularity: ``"\\n"`` for real corpora
    (the C4 contract), ``" "`` for token-granular stopword-style
    removal (what the single-line driver fixture exercises). The
    separator is split LITERALLY on both engines, so runs of
    separators round-trip (empty spans count like any other).

    Scale shape (100 TB): the document-frequency count and the
    common-span anti-join both shuffle the 60-bit md5 span hash, never
    the span text (same discipline as exact_dedup); reassembly is one
    doc-keyed aggregation with array_sort in place of a window sort.
    Returns (id, text, n_kept, n_dropped).
    """
    import re as _re

    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep), -1)).alias(
            "pos", "line"
        ),
    ).withColumn("h", stable_hash64(F.col("line")))
    common = (
        lines.select("h", id_col)
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("h")
    )
    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_total"))
    kept = lines.join(common, "h", "left_anti")
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                sep,
            ).alias(text_col),
            F.count("*").alias("n_kept"),
        )
        .join(totals, id_col)
        .select(
            id_col,
            text_col,
            "n_kept",
            (F.col("n_total") - F.col("n_kept")).alias("n_dropped"),
        )
    )


def line_dedup_sql(max_df: int = 1, sep: str = "\n", table: str = "documents") -> str:
    """DuckDB twin: literal string_split + parallel unnest ordinality,
    the same md5 span hash, string_agg reassembly in position order."""
    h = stable_hash64_sql("line")
    s = sep.replace("'", "''")
    sep_expr = "chr(10)" if sep == "\n" else f"'{s}'"
    return f"""
WITH l AS (
  SELECT doc_id,
         unnest(string_split(text, {sep_expr})) AS line,
         unnest(generate_series(1, len(string_split(text, {sep_expr})))) AS pos
  FROM {table}),
k AS (SELECT doc_id, pos, line, {h} AS h FROM l),
common AS (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS df FROM k GROUP BY h)
           WHERE df > {max_df}),
tot AS (SELECT doc_id, COUNT(*) AS n_total FROM k GROUP BY doc_id),
kept AS (SELECT k.* FROM k ANTI JOIN common USING (h))
SELECT kept.doc_id,
       string_agg(kept.line, {sep_expr} ORDER BY kept.pos) AS text,
       COUNT(*) AS n_kept,
       ANY_VALUE(tot.n_total) - COUNT(*) AS n_dropped
FROM kept JOIN tot ON kept.doc_id = tot.doc_id
GROUP BY kept.doc_id
"""


def chunk_documents(
    docs: DataFrame, chunk_len: int = 128, stride: int = 128, min_tokens: int = 1
) -> DataFrame:
    """Within-document token chunking — the sliding-window companion to
    `pack_sequences` (that operator places whole docs into packed
    sequences; this one splits LONG docs into training-sized windows,
    the standard long-context preprocessing step).

    Whitespace tokens, windows starting every ``stride`` tokens
    (stride < chunk_len = overlapping windows), tail window kept when
    it still has >= ``min_tokens`` tokens. Returns
    (doc_id, chunk_id, start, n_tokens, chunk): 0-based chunk index,
    0-based start-token offset, the window's token count, and the
    reassembled chunk text.

    Shuffle-free: one per-row transform + posexplode, entirely inside
    whole-stage codegen — at 100 TB this is a map-only stage that
    composes with the scan (no exchange before or after; downstream
    packers shuffle the CHUNKS, which is the point: chunk rows are
    bounded by chunk_len regardless of document length, so no
    straggler task ever holds a whole mega-document).
    """
    if chunk_len < 1:
        raise ValueError(f"chunk_len must be >= 1, got {chunk_len}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(0), F.floor((F.size(toks) - 1) / stride).cast("int") * stride, F.lit(stride)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"), F.slice(toks, s + 1, chunk_len).alias("ctoks")
        ),
    )
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_id", "c"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("c.start").cast("long").alias("start"),
            F.size("c.ctoks").cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.col("c.ctoks")).alias("chunk"),
        )
        .filter(F.col("n_tokens") >= min_tokens)
    )


def chunk_documents_sql(
    chunk_len: int = 128, stride: int = 128, min_tokens: int = 1,
    table: str = "documents",
) -> str:
    """DuckDB twin of `chunk_documents` (exact: integer offsets and
    string reassembly only)."""
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {table}),
ex AS (
  SELECT doc_id,
         unnest([{{'chunk_id': i, 'start': i * {stride},
                   'ctoks': toks[i * {stride} + 1 : i * {stride} + {chunk_len}]}}
                 for i in range(0, CAST(FLOOR(CAST(len(toks) - 1 AS DOUBLE) / {stride}) AS BIGINT) + 1)],
                recursive := true)
  FROM t)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(start AS BIGINT) AS start,
       CAST(len(ctoks) AS BIGINT) AS n_tokens,
       array_to_string(ctoks, ' ') AS chunk
FROM ex
WHERE len(ctoks) >= {min_tokens}
"""


def _dsir_bucket(gram: Column, buckets: int) -> Column:
    return F.pmod(stable_hash64(gram), F.lit(buckets)).cast("long")


def _dsir_bucket_sql(gram_expr: str, buckets: int) -> str:
    return f"({stable_hash64_sql(gram_expr)}) % {buckets}"


def dsir_scores(
    docs: DataFrame,
    target: DataFrame,
    n: int = 2,
    buckets: int = 10007,
    k: float = 1.0,
) -> DataFrame:
    """Hashed n-gram importance weights for data selection (DSIR —
    Xie et al. 2023, arXiv:2302.03169, public): score every corpus
    document by how much more likely its features are under a TARGET
    distribution (a high-quality subset) than under the RAW corpus
    distribution.

    Features are word ``n``-grams hashed into ``buckets`` bins; both
    distributions are add-``k``-smoothed bucket unigram models. The
    per-document importance log-weight is

        score(d) = sum over gram occurrences g in d of
                   [ ln p_target(bucket(g)) - ln p_raw(bucket(g)) ]

    Returns (doc_id, n_feats, logratio_e7, logratio): ``logratio_e7``
    is the score in EXACT 1e-7 fixed point — each per-bucket ln is
    rounded to 7 decimals (Java vs libm ln differ by 1 ulp on ~7% of
    inputs; at 7 decimals they agree — measured 0/200000), the bucket
    weight becomes an integer w7 = round((ln_t - ln_r) * 1e7), and the
    document score is a pure BIGINT sum — order-independent and
    bit-identical to the DuckDB oracle. ``logratio`` = e7 / 1e7.

    Scale shape (100TB): the two distribution estimates are B-row
    aggregates (one corpus scan, one target scan); the B-row weight
    table is BROADCAST, so scoring is one corpus scan with a map-side
    probe and ONE shuffle (the per-doc sum, map-side combinable). No
    self-joins, no gram text past the hash.
    """
    def gram_buckets(df: DataFrame) -> DataFrame:
        toks = F.split(F.col("text"), " ")
        return df.select(
            "doc_id", F.explode(_token_ngrams(toks, n)).alias("gram")
        ).select("doc_id", _dsir_bucket(F.col("gram"), buckets).alias("b"))

    dg = gram_buckets(docs)
    raw = dg.groupBy("b").agg(F.count("*").alias("cr"))
    tgt = gram_buckets(target).groupBy("b").agg(F.count("*").alias("ct"))

    w = Window.partitionBy()
    ln_t = F.round(
        F.log((F.col("ct") + F.lit(k)) / (F.col("t_tot") + F.lit(k * buckets))), 7
    )
    ln_r = F.round(
        F.log((F.col("cr") + F.lit(k)) / (F.col("r_tot") + F.lit(k * buckets))), 7
    )
    weights = (
        raw.join(tgt, "b", "left")
        .select(
            "b",
            F.col("cr"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.sum("cr").over(w).alias("r_tot"),
            F.sum(F.coalesce("ct", F.lit(0))).over(w).alias("t_tot"),
        )
        .select(
            "b", F.round((ln_t - ln_r) * F.lit(1e7), 0).cast("long").alias("w7")
        )
    )
    scored = (
        dg.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("w7").alias("s7"))
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("s7", F.lit(0)).cast("long").alias("logratio_e7"),
            F.round(F.coalesce("s7", F.lit(0)) / F.lit(1e7), 6).alias("logratio"),
        )
    )


def dsir_scores_sql(
    target_where: str,
    n: int = 2,
    buckets: int = 10007,
    k: float = 1.0,
    table: str = "documents",
) -> str:
    """Oracle twin of ``dsir_scores`` with the target defined as
    ``SELECT ... FROM {table} WHERE {target_where}`` (same fixed-point
    ln discipline — value-exact, not approximate)."""
    g = _token_ngrams_sql(n)
    b = _dsir_bucket_sql("g", buckets)
    kb = f"{k} * {buckets}"
    return f"""
WITH dg AS (
  SELECT doc_id, {b} AS b
  FROM (SELECT doc_id, unnest({g}) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM {table}))),
tg AS (
  SELECT {b} AS b
  FROM (SELECT unnest({g}) AS g
        FROM (SELECT string_split(text, ' ') AS toks
              FROM {table} WHERE {target_where}))),
raw AS (SELECT b, COUNT(*) AS cr FROM dg GROUP BY b),
tc AS (SELECT b, COUNT(*) AS ct FROM tg GROUP BY b),
wt AS (
  SELECT raw.b, raw.cr, COALESCE(tc.ct, 0) AS ct,
         SUM(raw.cr) OVER () AS r_tot,
         SUM(COALESCE(tc.ct, 0)) OVER () AS t_tot
  FROM raw LEFT JOIN tc ON tc.b = raw.b),
w AS (
  SELECT b,
         CAST(ROUND((ROUND(LN((ct + {k}) / (t_tot + {kb})), 7)
                   - ROUND(LN((cr + {k}) / (r_tot + {kb})), 7)) * 1e7, 0)
              AS BIGINT) AS w7
  FROM wt),
sc AS (
  SELECT dg.doc_id, COUNT(*) AS n_feats, SUM(w.w7) AS s7
  FROM dg JOIN w ON w.b = dg.b GROUP BY dg.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(sc.n_feats, 0) AS BIGINT) AS n_feats,
       CAST(COALESCE(sc.s7, 0) AS BIGINT) AS logratio_e7,
       ROUND(COALESCE(sc.s7, 0) / 1e7, 6) AS logratio
FROM {table} d LEFT JOIN sc ON sc.doc_id = d.doc_id
"""


def dsir_sample(
    docs: DataFrame,
    target: DataFrame,
    n_keep: int,
    n: int = 2,
    buckets: int = 10007,
    k: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """DSIR selection: keep ``n_keep`` documents sampled WITHOUT
    replacement with probability proportional to exp(score) via the
    Gumbel-top-k trick (key = score + Gumbel noise; the top-k keys are
    exactly a weighted sample — Vieira 2014, public), with the Gumbel
    draw derived DETERMINISTICALLY from the seeded document hash so
    the selection replays bit-identically in the SQL oracle.

    u = (hash(doc_id, seed) % 2^53 + 0.5) / 2^53 is an exact dyadic
    double in (0,1); g = -ln(-ln(u)) with both ln's rounded to 7
    decimals (cross-engine ln discipline) and the inner value clamped
    to >= 1e-7 so u ~ 1 can't reach ln(0). The sort key is pure 1e-7
    FIXED POINT (logratio_e7 + round(gumbel*1e7) — a BIGINT; a rounded
    DOUBLE key can land on a .5 boundary where Spark's BigDecimal
    HALF_UP and DuckDB's double rounding disagree) with doc_id as the
    tiebreak, so the top-k frontier is engine-independent.

    Returns (doc_id, logratio, key_e7) for the kept rows. Scale: the
    ranking is a global top-k (TakeOrdered — map-side partial heaps,
    no full sort shuffle).
    """
    m = F.pmod(
        stable_hash64(F.col("doc_id").cast("string"), salt=seed),
        F.lit(1 << 53),
    )
    u = (m + F.lit(0.5)) / F.lit(float(1 << 53))
    inner = F.greatest(F.round(-F.log(u), 7), F.lit(1e-7))
    gumbel = F.round(-F.log(inner), 7)
    scored = dsir_scores(docs, target, n=n, buckets=buckets, k=k)
    keyed = scored.select(
        "doc_id",
        "logratio",
        (
            F.col("logratio_e7")
            + F.round(gumbel * F.lit(1e7), 0).cast("long")
        ).alias("key_e7"),
    )
    return keyed.orderBy(F.col("key_e7").desc(), F.col("doc_id")).limit(n_keep)


def dsir_sample_sql(
    target_where: str,
    n_keep: int,
    n: int = 2,
    buckets: int = 10007,
    k: float = 1.0,
    seed: int = 0,
    table: str = "documents",
) -> str:
    """Oracle twin of ``dsir_sample`` (exact: same hash-derived Gumbel
    draw, same integer fixed-point key + doc_id ordering)."""
    scores = dsir_scores_sql(
        target_where, n=n, buckets=buckets, k=k, table=table
    )
    h = stable_hash64_sql("CAST(doc_id AS VARCHAR)", salt=seed)
    two53 = 1 << 53
    return f"""
WITH scores AS ({scores}),
keyed AS (
  SELECT doc_id, logratio,
         logratio_e7
         + CAST(ROUND(ROUND(-LN(GREATEST(
               ROUND(-LN((({h}) % {two53} + 0.5) / {float(two53)}), 7),
               1e-7)), 7) * 1e7, 0) AS BIGINT) AS key_e7
  FROM scores)
SELECT doc_id, logratio, key_e7
FROM keyed ORDER BY key_e7 DESC, doc_id LIMIT {n_keep}
"""


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """`decontaminate` with the benchmark n-gram set compressed into a
    Bloom filter — the shape that still works when the "benchmark" is
    itself large (a held-out shard, a sibling corpus) and the exact
    distinct-hash broadcast would not fit: m_bits bits + k_hashes
    probes replace the full hash set, at ~(1-e^(-kn/m))^k false-
    positive rate and ZERO false negatives (every truly contaminated
    doc is flagged).

    Same output contract as `decontaminate` (doc_id, n_hits,
    contaminated), where n_hits counts distinct n-grams that pass ALL
    k probes — a deterministic superset of the exact operator's hits.
    Because probe positions derive from the cross-engine md5 hash
    (never a JVM-private hash), even the false positives are
    engine-identical, so the SQL oracle is value-exact.

    Scale shape (100TB): the filter is a (word_idx, word) table of at
    most m_bits/32 int64 rows (2^20 bits = 32k rows ~ 0.5 MB) built
    with one bit_or aggregate and BROADCAST; the corpus side dedups
    (doc, gram-hash) pairs once, fans out k probe rows map-side, and
    probes the broadcast — one |corpus-grams| shuffle (the distinct),
    one per-doc count. Words use 32 bits of each int64 so no shift
    ever reaches bit 63 (Spark wraps there, DuckDB errors — the
    dangalchev finding).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if m_bits < 32 or m_bits % 32:
        raise ValueError(f"m_bits must be a positive multiple of 32, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")

    def gram_hashes(df: DataFrame) -> DataFrame:
        toks = F.split(F.col("text"), " ")
        return df.select(
            "doc_id", F.explode(_token_ngrams(toks, n)).alias("gram")
        ).select("doc_id", stable_hash64("gram").alias("gh"))

    def positions(col: str) -> Column:
        # k probe positions derived from the GRAM HASH's decimal string
        # (not the gram text), so both sides can dedup to 8-byte keys
        # before the fan-out
        return F.array(
            *[
                F.pmod(
                    stable_hash64(F.col(col).cast("string"), salt=j), F.lit(m_bits)
                )
                for j in range(k_hashes)
            ]
        )

    bits = (
        gram_hashes(benchmark)
        .select("gh")
        .distinct()
        .select(F.explode(positions("gh")).alias("pos"))
        .distinct()
    )
    words = bits.groupBy(F.expr("pos DIV 32").alias("widx")).agg(
        F.bit_or(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod("pos", F.lit(32)).cast("int")
            )
        ).alias("word")
    )
    probes = (
        gram_hashes(docs)
        .distinct()
        .select("doc_id", "gh", F.explode(positions("gh")).alias("pos"))
        .withColumn("widx", F.expr("pos DIV 32"))
    )
    tested = probes.join(F.broadcast(words), "widx", "left").select(
        "doc_id",
        "gh",
        (
            F.call_function(
                "shiftright",
                F.coalesce(F.col("word"), F.lit(0).cast("long")),
                F.pmod("pos", F.lit(32)).cast("int"),
            )
            % F.lit(2)
        ).alias("is_set"),
    )
    hits = (
        tested.groupBy("doc_id", "gh")
        .agg(F.sum("is_set").alias("nset"))
        .filter(F.col("nset") == k_hashes)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def bloom_decontaminate_sql(
    benchmark_where: str, n: int = 8, m_bits: int = 1 << 20, k_hashes: int = 4
) -> str:
    """Oracle for `bloom_decontaminate` — the identical filter build
    and probes in DuckDB (value-exact including false positives)."""
    g = _token_ngrams_sql(n)
    h = stable_hash64_sql("g")
    pos_rows = " UNION ALL ".join(
        f"SELECT *, {stable_hash64_sql('CAST(gh AS VARCHAR)', salt=j)} % {m_bits} AS pos FROM {{src}}"
        for j in range(k_hashes)
    )
    return f"""
WITH bt AS (SELECT string_split(text, ' ') AS toks FROM documents WHERE {benchmark_where}),
bg AS (SELECT DISTINCT {h} AS gh FROM (SELECT unnest({g}) AS g FROM bt)),
bpos AS (SELECT DISTINCT pos FROM ({pos_rows.format(src="bg")})),
words AS (SELECT pos // 32 AS widx,
                 BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS word
          FROM bpos GROUP BY 1),
dt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
dg AS (SELECT DISTINCT doc_id, {h} AS gh
       FROM (SELECT doc_id, unnest({g}) AS g FROM dt)),
dpos AS (SELECT doc_id, gh, pos FROM ({pos_rows.format(src="dg")})),
tested AS (SELECT d.doc_id, d.gh,
                  (COALESCE(w.word, 0) >> CAST(d.pos % 32 AS INTEGER)) % 2 AS is_set
           FROM dpos d LEFT JOIN words w ON w.widx = d.pos // 32),
hits AS (SELECT doc_id, COUNT(*) AS n_hits FROM (
           SELECT doc_id, gh FROM tested GROUP BY doc_id, gh
           HAVING SUM(is_set) = {k_hashes}) GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(hits.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id
"""


def contamination_report(
    docs: DataFrame, benchmark: DataFrame, n: int = 8
) -> DataFrame:
    """Per-source contamination report card — the summary a curation
    run publishes after the decontamination pass: for every ``source``
    feed, how many documents share any token n-gram with the
    benchmark, the contaminated fraction, and the total distinct-gram
    hit mass (a leak-severity proxy).

    Composes ``decontaminate`` (broadcast benchmark gram hashes) with
    one source-keyed aggregate — no shuffles beyond the pass itself.
    Returns (source, n_docs, contaminated, contam_frac, total_hits)
    sorted deterministically by source; replayed by
    ``contamination_report_sql``.
    """
    flags = decontaminate(docs, benchmark, n=n)
    return (
        docs.select("doc_id", "source")
        .join(flags, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("contaminated").cast("long")).alias("contaminated"),
            F.sum("n_hits").alias("total_hits"),
        )
        .select(
            "source", "n_docs", "contaminated",
            F.round(F.col("contaminated") / F.col("n_docs"), 6)
            .alias("contam_frac"),
            "total_hits",
        )
    )


def contamination_report_sql(benchmark_where: str, n: int = 8) -> str:
    """Oracle: the same per-source rollup over the decontamination
    oracle."""
    return f"""
WITH flags AS ({decontaminate_sql(benchmark_where, n=n)})
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN f.contaminated THEN 1 ELSE 0 END) AS BIGINT)
         AS contaminated,
       ROUND(CAST(SUM(CASE WHEN f.contaminated THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS contam_frac,
       CAST(SUM(f.n_hits) AS BIGINT) AS total_hits
FROM documents d JOIN flags f ON f.doc_id = d.doc_id
GROUP BY d.source
"""


def mixing_plan(docs: DataFrame, targets: dict[str, float]) -> DataFrame:
    """Data-mixing plan: given target source proportions (by token
    mass), compute the per-source downsampling rates that hit them —
    the "data mixture" step of pre-training curation (DoReMi/Pile-style
    recipes pick the proportions; this operator turns them into
    executable sampling rates against the actual corpus).

    Semantics (downsample-only): with T_s tokens observed and target
    fraction f_s (renormalized over ``targets``), the binding budget
    is B = min over targeted sources of T_s / f_s; every source keeps
    ``rate_s = f_s·B / T_s`` (=1 for the binding source, 0 for
    sources without a target). Tokens are whitespace tokens (the
    token_stats convention), counted as exact integers; the fractions
    are inlined literals, so the single float division per source is
    engine-identical. Returns
    (source, n_docs, tokens, target_frac, sample_rate,
    expected_tokens) rounded 6; replayed by ``mixing_plan_sql``.
    """
    if not targets or any(f <= 0 for f in targets.values()):
        raise ValueError(
            f"targets must be a non-empty dict of positive fractions, got {targets!r}"
        )
    spark = docs.sparkSession
    norm = float(sum(targets.values()))
    tgt = spark.createDataFrame(
        [(s, float(f) / norm) for s, f in sorted(targets.items())],
        "source string, target_frac double",
    )
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        ).cast("long").alias("tokens"),
    )
    j = stats.join(F.broadcast(tgt), "source", "left").select(
        "source", "n_docs", "tokens",
        F.coalesce("target_frac", F.lit(0.0)).alias("target_frac"),
    )
    budget = j.filter(F.col("target_frac") > 0).agg(
        F.min(F.col("tokens") / F.col("target_frac")).alias("b")
    )
    return (
        j.crossJoin(F.broadcast(budget))
        .select(
            "source", "n_docs", "tokens",
            F.round("target_frac", 6).alias("target_frac"),
            F.round(
                F.when(F.col("target_frac") > 0,
                       F.col("target_frac") * F.col("b") / F.col("tokens"))
                .otherwise(F.lit(0.0)), 6,
            ).alias("sample_rate"),
            F.round(
                F.when(F.col("target_frac") > 0,
                       F.col("target_frac") * F.col("b"))
                .otherwise(F.lit(0.0)), 6,
            ).alias("expected_tokens"),
        )
    )


def mixing_plan_sql(targets: dict[str, float], table: str = "documents") -> str:
    """Oracle: identical token census, inlined normalized fractions,
    min-budget and rates."""
    if not targets or any(f <= 0 for f in targets.values()):
        raise ValueError(
            f"targets must be a non-empty dict of positive fractions, got {targets!r}"
        )
    norm = float(sum(targets.values()))
    vals = ", ".join(
        f"('{s}', {float(f) / norm!r})" for s, f in sorted(targets.items())
    )
    return f"""
WITH tgt AS (SELECT * FROM (VALUES {vals}) t(source, target_frac)),
stats AS (SELECT source, COUNT(*) AS n_docs,
                 SUM(len(list_filter(string_split(text, ' '),
                                     x -> x <> ''))) AS tokens
          FROM {table} GROUP BY source),
j AS (SELECT s.source, s.n_docs, CAST(s.tokens AS BIGINT) AS tokens,
             COALESCE(t.target_frac, 0.0) AS target_frac
      FROM stats s LEFT JOIN tgt t ON t.source = s.source),
b AS (SELECT MIN(tokens / target_frac) AS b FROM j WHERE target_frac > 0)
SELECT source, n_docs, tokens,
       ROUND(target_frac, 6) AS target_frac,
       ROUND(CASE WHEN target_frac > 0
                  THEN target_frac * (SELECT b FROM b) / tokens
                  ELSE 0.0 END, 6) AS sample_rate,
       ROUND(CASE WHEN target_frac > 0
                  THEN target_frac * (SELECT b FROM b)
                  ELSE 0.0 END, 6) AS expected_tokens
FROM j
"""
