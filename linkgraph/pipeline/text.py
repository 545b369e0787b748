"""Text-analysis operators: token stats, quality scoring, language id,
document fingerprinting.

All fully JVM-side (Catalyst expressions over split/regexp/aggregate)
with exact DuckDB SQL oracles. Regex patterns are kept in the common
subset of Java regex and RE2 so both engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.pipeline.hashing import stable_hash64, stable_hash64_sql

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Deliberately small and hardcoded: the operator contract is
# "deterministic function of text", not linguistic accuracy.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "en", "por"],
}

_WORD_RE = "[a-z0-9]+"


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_word_tokens, avg_token_len, uniq_ratio).

    n_tokens: whitespace tokens; n_word_tokens: BPE-ish regex tokens
    ([a-z0-9]+ runs); avg_token_len over whitespace tokens;
    uniq_ratio: distinct/total whitespace tokens.
    """
    toks = F.split(F.col("text"), " ")
    words = F.regexp_extract_all(F.col("text"), F.lit(_WORD_RE), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(words).alias("n_word_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("avg_token_len"),
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("uniq_ratio"),
    )


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(regexp_extract_all(text, '{_WORD_RE}')) AS n_word_tokens,
       ROUND(list_sum([CAST(len(t) AS DOUBLE) for t in string_split(text, ' ')])
             / greatest(len(string_split(text, ' ')), 1), 6) AS avg_token_len,
       ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / greatest(len(string_split(text, ' ')), 1), 6) AS uniq_ratio
FROM documents
"""


def _stopword_hits(lang: str):
    toks = F.split(F.col("text"), " ")
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(toks), arr))


def _quality_exprs():
    """The quality-score component expressions (per-row, over `text`),
    shared by quality_scores and source_mix."""
    toks = F.split(F.col("text"), " ")
    n = F.greatest(F.size(toks), F.lit(1))
    len_score = F.least(F.lit(1.0), F.length("text") / F.lit(400.0))
    stop_ratio = _stopword_hits("en") / n
    uniq = F.size(F.array_distinct(toks)) / n
    quality = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * F.least(F.lit(1.0), F.lit(10.0) * stop_ratio)
        + F.lit(0.3) * uniq
    )
    return len_score, stop_ratio, uniq, quality


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, len_score, stop_ratio, uniq_ratio, quality).

    quality = 0.4*len_score + 0.3*min(1, 10*stop_ratio) + 0.3*uniq_ratio
    where len_score = min(1, n_chars/400); stop_ratio = distinct
    English stopwords present / whitespace token count. Deterministic,
    order-free — a representative heuristic quality gate for corpus
    filtering at scale (pure map, no shuffle).
    """
    len_score, stop_ratio, uniq, quality = _quality_exprs()
    return docs.select(
        "doc_id",
        F.round(len_score, 6).alias("len_score"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(uniq, 6).alias("uniq_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def _sw_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_intersect(list_distinct(string_split(text, ' ')), [{lst}]))"
    )


QUALITY_SCORES_SQL = f"""
SELECT doc_id,
       ROUND(least(1.0, len(text) / 400.0), 6) AS len_score,
       ROUND({_sw_sql('en')} / greatest(len(string_split(text, ' ')), 1), 6) AS stop_ratio,
       ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / greatest(len(string_split(text, ' ')), 1), 6) AS uniq_ratio,
       ROUND(0.4 * least(1.0, len(text) / 400.0)
           + 0.3 * least(1.0, 10.0 * {_sw_sql('en')} / greatest(len(string_split(text, ' ')), 1))
           + 0.3 * CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / greatest(len(string_split(text, ' ')), 1), 6) AS quality
FROM documents
"""


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang): argmax of per-language stopword hits, tie
    and zero-hit fall back deterministic ('und' when no list matches;
    ties break on language code ascending)."""
    hits = [
        F.struct(_stopword_hits(lg).alias("h"), F.lit(lg).alias("lg"))
        for lg in sorted(STOPWORDS)
    ]
    best = F.array_max(F.array(*hits))
    return docs.select(
        "doc_id",
        F.when(best["h"] > 0, best["lg"]).otherwise(F.lit("und")).alias("pred_lang"),
    )


def _langid_sql() -> str:
    # array_max over structs picks max h, then (because DuckDB compares
    # struct fields in order) the LARGEST lg on ties — mirror Spark's
    # array_max semantics (greatest struct). Both engines compare
    # (h, lg) lexicographically, so ties resolve to max lg in BOTH.
    rows = ", ".join(
        f"{{'h': {_sw_sql(lg)}, 'lg': '{lg}'}}" for lg in sorted(STOPWORDS)
    )
    return f"""
SELECT doc_id,
       CASE WHEN list_max([{rows}]).h > 0
            THEN list_max([{rows}]).lg ELSE 'und' END AS pred_lang
FROM documents
"""


LANGUAGE_ID_SQL = _langid_sql()


def fingerprints(docs: DataFrame, k: int = 16) -> DataFrame:
    """(doc_id, fingerprint): min stable hash over character
    k-shingles — a winnowing-style rolling-window document signature
    (one representative hash per doc; identical docs collide, edits
    move it with probability ~edits/len)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length("text") - (k - 1), F.lit(1)))
    return docs.select(
        "doc_id",
        F.array_min(
            F.transform(
                idx,
                lambda i: F.conv(
                    F.substring(F.md5(F.col("text").substr(i, F.lit(k))), 1, 15), 16, 10
                ).cast("long"),
            )
        ).alias("fingerprint"),
    )


def fingerprints_sql(k: int = 16) -> str:
    return f"""
SELECT doc_id,
       list_min([CAST(('0x' || substr(md5(substr(text, i, {k})), 1, 15)) AS BIGINT)
                 for i in range(1, greatest(len(text) - {k - 1}, 1) + 1)]) AS fingerprint
FROM documents
"""


def repetition_scores(docs: DataFrame, min_tokens: int = 20) -> DataFrame:
    """(doc_id, top_token_frac, top_bigram_frac, top_trigram_frac,
    repetitive) — repetition-based quality signals in the style of the
    Gopher data-preparation rules (Rae et al. 2021, arXiv:2112.11446,
    public): the fraction of the document covered by its single most
    frequent OVERLAPPING occurrence count of a token / 2-gram / 3-gram
    (the n-gram fractions can exceed 1.0 for degenerate repeats, e.g.
    "a a a a" -> bigram frac 1.5 — a deliberate repetition amplifier,
    not a coverage ratio). A document dominated by one repeated n-gram
    is boilerplate or spam; `repetitive` applies the published-style
    gates (top 2-gram > 0.18 or top 3-gram > 0.16 or top token > 0.30)
    ONLY at or above ``min_tokens`` whitespace tokens — below it the
    2/n floor alone exceeds the gate for every short document (any
    unique-bigram doc with <= 11 tokens has top_bigram_frac >= 0.18),
    matching Gopher's minimum-word-count precondition.

    Pure per-row JVM map (no shuffle, no UDF): the n-gram tables are
    built with sequence/transform and the mode count via a
    distinct×occurrence scan — O(len²) in the document's token count,
    bounded by per-document length, embarrassingly parallel at 100TB.
    """
    toks = F.split(F.col("text"), " ")
    n = F.greatest(F.size(toks), F.lit(1))

    def mode_count(arr):
        return F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda t: F.size(F.filter(arr, lambda x: x == t)),
            )
        )

    def grams(k: int):
        idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )

    top1 = mode_count(toks) / n
    top2 = F.when(
        F.size(toks) >= 2, F.lit(2.0) * mode_count(grams(2)) / n
    ).otherwise(F.lit(0.0))
    top3 = F.when(
        F.size(toks) >= 3, F.lit(3.0) * mode_count(grams(3)) / n
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        F.round(top1, 6).alias("top_token_frac"),
        F.round(top2, 6).alias("top_bigram_frac"),
        F.round(top3, 6).alias("top_trigram_frac"),
        (
            (F.size(toks) >= min_tokens)
            & (
                (F.round(top2, 6) > 0.18)
                | (F.round(top3, 6) > 0.16)
                | (F.round(top1, 6) > 0.30)
            )
        ).alias("repetitive"),
    )


def _mode_sql(arr: str) -> str:
    return (
        f"list_max([len(list_filter({arr}, y -> y = t)) "
        f"for t in list_distinct({arr})])"
    )


def _grams_sql(k: int) -> str:
    parts = " || ' ' || ".join(f"toks[i + {j}]" for j in range(k))
    return f"[{parts} for i in range(1, len(toks) - {k - 1} + 1)]"


REPETITION_SCORES_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, len(toks) AS n_toks,
         ROUND(CAST({_mode_sql('toks')} AS DOUBLE)
               / greatest(len(toks), 1), 6) AS top_token_frac,
         ROUND(CASE WHEN len(toks) >= 2
               THEN 2.0 * {_mode_sql(_grams_sql(2))} / greatest(len(toks), 1)
               ELSE 0.0 END, 6) AS top_bigram_frac,
         ROUND(CASE WHEN len(toks) >= 3
               THEN 3.0 * {_mode_sql(_grams_sql(3))} / greatest(len(toks), 1)
               ELSE 0.0 END, 6) AS top_trigram_frac
  FROM t)
SELECT doc_id, top_token_frac, top_bigram_frac, top_trigram_frac,
       (n_toks >= 20 AND (top_bigram_frac > 0.18 OR top_trigram_frac > 0.16
        OR top_token_frac > 0.30)) AS repetitive
FROM s
"""


def duplicate_structure_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_lines, n_paras, dup_line_frac, dup_line_char_frac,
    dup_para_frac, dup_para_char_frac) — the structural half of the
    Gopher repetition rules (Rae et al. 2021 §A1.1; the n-gram half is
    ``repetition_scores``): what fraction of a document's lines /
    paragraphs are repeats of an earlier one, by count and by
    character mass. Lines split on newline, paragraphs on a blank
    line; empty segments dropped. A repeat is any occurrence beyond
    the first, so dup_frac = (n − n_distinct)/n and char_frac =
    (Σlen(all) − Σlen(distinct))/Σlen(all) — integer numerators, one
    IEEE division, ROUND 6 (value-exact DuckDB twin).

    Pure per-row JVM map (split/array_distinct/aggregate) — no
    shuffle, no UDF; embarrassingly parallel at 100TB.
    """
    zero = F.lit(0).cast("long")

    def clean_split(sep: str):
        return F.filter(F.split(F.col("text"), sep), lambda x: x != F.lit(""))

    def chars(arr):
        return F.aggregate(arr, zero, lambda acc, x: acc + F.length(x))

    def fracs(arr, prefix: str):
        n = F.size(arr)
        nd = F.size(F.array_distinct(arr))
        tot = chars(arr)
        dup_c = tot - chars(F.array_distinct(arr))
        return [
            F.round(
                F.when(n > 0, (n - nd).cast("double") / n.cast("double"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias(f"dup_{prefix}_frac"),
            F.round(
                F.when(tot > 0, dup_c.cast("double") / tot.cast("double"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias(f"dup_{prefix}_char_frac"),
        ]

    lines = clean_split("\n")
    paras = clean_split("\n\n")
    return docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(paras).cast("long").alias("n_paras"),
        *fracs(lines, "line"),
        *fracs(paras, "para"),
    )


def _dup_fracs_sql(arr: str, prefix: str) -> str:
    n = f"len({arr})"
    nd = f"len(list_distinct({arr}))"
    tot = f"list_sum(list_transform({arr}, x -> CAST(len(x) AS BIGINT)))"
    dtot = (
        f"list_sum(list_transform(list_distinct({arr}),"
        f" x -> CAST(len(x) AS BIGINT)))"
    )
    return f"""
       ROUND(CASE WHEN {n} > 0
             THEN CAST({n} - {nd} AS DOUBLE) / CAST({n} AS DOUBLE)
             ELSE 0.0 END, 6) AS dup_{prefix}_frac,
       ROUND(CASE WHEN coalesce({tot}, 0) > 0
             THEN CAST({tot} - {dtot} AS DOUBLE) / CAST({tot} AS DOUBLE)
             ELSE 0.0 END, 6) AS dup_{prefix}_char_frac"""


DUPLICATE_STRUCTURE_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines,
         list_filter(string_split(text, chr(10) || chr(10)), x -> x <> '')
           AS paras
  FROM documents)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(paras) AS BIGINT) AS n_paras,
       {_dup_fracs_sql('lines', 'line')},
       {_dup_fracs_sql('paras', 'para')}
FROM t
"""


def c4_clean(
    docs: DataFrame,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4-style page cleaning (Raffel et al. 2020 §2.2, public):
    retain only lines that end in terminal punctuation (. ! ? "),
    have >= ``min_words_per_line`` whitespace words, and don't mention
    "javascript" (case-insensitive); then gate the page on >=
    ``min_sentences`` sentence-final marks in the cleaned text, no
    "lorem ipsum", and no curly brace (the code-page heuristic).

    Returns (doc_id, clean_text, n_lines_kept, n_sentences, kept).
    Lines are trimmed in the output; the three page gates test the
    ORIGINAL text (a dropped line can still poison the page — C4's
    published behavior). Pure per-row JVM map — split/filter/
    regexp_extract_all, no shuffle, no UDF; the 100TB shape is a
    single scan.
    """

    def keep(x):
        xt = F.trim(x)
        words = F.filter(F.split(xt, "\\s+"), lambda w: w != F.lit(""))
        return (
            (F.size(words) >= min_words_per_line)
            & xt.substr(F.length(xt), F.lit(1)).isin(".", "!", "?", '"')
            & ~F.lower(xt).contains("javascript")
        )

    kept_lines = F.transform(
        F.filter(F.split(F.col("text"), "\n"), keep), lambda x: F.trim(x)
    )
    clean = F.array_join(kept_lines, "\n")
    n_sent = F.size(F.regexp_extract_all(clean, F.lit("[.!?]"), F.lit(0)))
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size(kept_lines).cast("long").alias("n_lines_kept"),
        n_sent.cast("long").alias("n_sentences"),
        (
            (n_sent >= min_sentences)
            & ~F.lower(F.col("text")).contains("lorem ipsum")
            & ~F.col("text").contains("{")
        ).alias("kept"),
    )


def c4_clean_sql(min_words_per_line: int = 5, min_sentences: int = 3) -> str:
    """DuckDB twin of ``c4_clean`` — same line predicate, same gates."""
    keep = (
        f"len(list_filter(regexp_split_to_array(trim(x), '\\s+'),"
        f" w -> w <> '')) >= {min_words_per_line}"
        " AND substr(trim(x), length(trim(x)), 1) IN ('.', '!', '?', '\"')"
        " AND NOT contains(lower(trim(x)), 'javascript')"
    )
    return f"""
WITH t AS (
  SELECT doc_id, text,
         list_transform(
           list_filter(string_split(text, chr(10)), x -> {keep}),
           x -> trim(x)) AS kept_lines
  FROM documents),
s AS (
  -- array_to_string([]) is NULL in DuckDB, '' in Spark: coalesce
  SELECT doc_id, text,
         coalesce(array_to_string(kept_lines, chr(10)), '') AS clean_text,
         CAST(len(kept_lines) AS BIGINT) AS n_lines_kept,
         CAST(len(regexp_extract_all(
           coalesce(array_to_string(kept_lines, chr(10)), ''),
           '[.!?]')) AS BIGINT) AS n_sentences
  FROM t)
SELECT doc_id, clean_text, n_lines_kept, n_sentences,
       (n_sentences >= {min_sentences}
        AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{{')) AS kept
FROM s
"""


def gopher_quality(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality gates (Rae et al. 2021 §A1.1, the rule set
    FineWeb re-uses): per-doc (n_words, mean_word_len,
    symbol_word_ratio, bullet_frac, ellipsis_frac, alpha_word_frac,
    n_stop_hits, kept). Words = non-empty whitespace tokens; symbols
    = '#' plus '...'/'…' ellipses; bullet lines start with -, *, or
    •; alpha words contain at least one ASCII letter; stop hits =
    DISTINCT English stopwords present (the engine's standing list).
    Every ratio is an integer pair divided once and ROUND 6 — the
    DuckDB twin is value-exact. Pure per-row JVM map, shuffle-free.
    """
    words = F.filter(F.split(F.col("text"), "\\s+"), lambda w: w != F.lit(""))
    nw = F.size(words)
    nwd = F.greatest(nw, F.lit(1)).cast("double")
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_hash = F.length("text") - F.length(F.replace("text", F.lit("#")))
    n_ell = (
        (F.length("text") - F.length(F.replace("text", F.lit("...")))) / F.lit(3)
        + F.length("text")
        - F.length(F.replace("text", F.lit("…")))
    ).cast("long")
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    nl = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet = F.size(
        F.filter(lines, lambda x: x.substr(1, 1).isin("-", "*", "•"))
    )
    ellip = F.size(
        F.filter(
            lines,
            lambda x: x.substr(F.length(x) - 2, F.lit(3)).eqNullSafe("...")
            | x.substr(F.length(x), F.lit(1)).eqNullSafe("…"),
        )
    )
    alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    stop_hits = _stopword_hits("en")
    mean_wl = F.round(word_chars.cast("double") / nwd, 6)
    sym_ratio = F.round((n_hash + n_ell).cast("double") / nwd, 6)
    bullet_frac = F.round(bullet.cast("double") / nl, 6)
    ellipsis_frac = F.round(ellip.cast("double") / nl, 6)
    alpha_frac = F.round(alpha.cast("double") / nwd, 6)
    kept = (
        (nw >= min_words)
        & (nw <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (sym_ratio <= max_symbol_word_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (stop_hits >= min_stop_hits)
    )
    return docs.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("long").alias("n_stop_hits"),
        kept.alias("kept"),
    )


def gopher_quality_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> str:
    """DuckDB twin of ``gopher_quality`` — same integer pairs, same
    single divisions, same thresholds on the ROUNDED values."""
    return f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')
           AS words,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x)), x -> x <> '') AS lines
  FROM documents),
m AS (
  SELECT doc_id,
         len(words) AS nw,
         CAST(greatest(len(words), 1) AS DOUBLE) AS nwd,
         coalesce(list_sum(list_transform(words,
                  x -> CAST(len(x) AS BIGINT))), 0) AS word_chars,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3
           + (length(text) - length(replace(text, '…', ''))) AS n_sym,
         CAST(greatest(len(lines), 1) AS DOUBLE) AS nld,
         len(list_filter(lines, x -> substr(x, 1, 1) IN ('-', '*', '•')))
           AS n_bullet,
         len(list_filter(lines, x -> substr(x, length(x) - 2, 3) = '...'
                                   OR substr(x, length(x), 1) = '…'))
           AS n_ellip,
         len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))
           AS n_alpha,
         {_sw_sql('en')} AS stop_hits
  FROM t)
SELECT doc_id,
       CAST(nw AS BIGINT) AS n_words,
       ROUND(CAST(word_chars AS DOUBLE) / nwd, 6) AS mean_word_len,
       ROUND(CAST(n_sym AS DOUBLE) / nwd, 6) AS symbol_word_ratio,
       ROUND(CAST(n_bullet AS DOUBLE) / nld, 6) AS bullet_frac,
       ROUND(CAST(n_ellip AS DOUBLE) / nld, 6) AS ellipsis_frac,
       ROUND(CAST(n_alpha AS DOUBLE) / nwd, 6) AS alpha_word_frac,
       CAST(stop_hits AS BIGINT) AS n_stop_hits,
       (nw >= {min_words} AND nw <= {max_words}
        AND ROUND(CAST(word_chars AS DOUBLE) / nwd, 6) >= {min_mean_word_len}
        AND ROUND(CAST(word_chars AS DOUBLE) / nwd, 6) <= {max_mean_word_len}
        AND ROUND(CAST(n_sym AS DOUBLE) / nwd, 6) <= {max_symbol_word_ratio}
        AND ROUND(CAST(n_bullet AS DOUBLE) / nld, 6) <= {max_bullet_frac}
        AND ROUND(CAST(n_ellip AS DOUBLE) / nld, 6) <= {max_ellipsis_frac}
        AND ROUND(CAST(n_alpha AS DOUBLE) / nwd, 6) >= {min_alpha_word_frac}
        AND stop_hits >= {min_stop_hits}) AS kept
FROM m
"""


def normalize_text(docs: DataFrame) -> DataFrame:
    """(doc_id, norm_text, n_chars_norm): the canonicalization pass
    that runs BEFORE hashing/dedup so cosmetic variants collide —
    lowercase, control characters (tabs/newlines included) mapped to
    spaces, whitespace runs collapsed to single spaces, ends trimmed.
    Mapping controls to spaces (not deleting them) keeps "foo\\nbar"
    == "foo bar" — the most common cosmetic variant — while never
    merging adjacent words.

    Pure per-row JVM map (two regexp_replace + lower), shuffle-free;
    patterns are kept in the common Java-regex/RE2 subset so the
    DuckDB oracle is exact. Unicode NFC is intentionally out of scope
    (no JVM-side builtin; a Pandas-UDF variant would be the hook)."""
    t = F.lower(F.col("text"))
    t = F.regexp_replace(t, "[\\x00-\\x1f\\x7f ]+", " ")
    t = F.trim(t)
    return docs.select(
        "doc_id",
        t.alias("norm_text"),
        F.length(t).cast("long").alias("n_chars_norm"),
    )


NORMALIZE_TEXT_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '[\x00-\x1f\x7f ]+', ' ', 'g')) AS norm_text,
       CAST(len(trim(regexp_replace(lower(text), '[\x00-\x1f\x7f ]+', ' ', 'g'))) AS BIGINT) AS n_chars_norm
FROM documents
"""


def source_mix(docs: DataFrame) -> DataFrame:
    """Per-source training-mix report: (source, n_docs, n_tokens,
    token_share, avg_quality) — what a mixture-weight planner reads
    to set per-domain sampling rates.

    Scale shape: quality/token scoring are shuffle-free maps; then ONE
    groupBy(source) with map-side partial aggregation; the corpus
    total rides the grouped table (no second scan)."""
    # quality and token count are per-row functions of `text`, so they
    # are computed INLINE in one projection — no doc_id re-joins. The
    # rounded quality is scaled to integer micro-units so the
    # per-source SUM is exact integer arithmetic (order-free in BOTH
    # engines; a float AVG would accumulate in engine-specific order
    # and can flip the 6th decimal).
    _, _, _, quality = _quality_exprs()
    per_row = docs.select(
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("nt"),
        F.round(F.round(quality, 6) * 1_000_000).cast("long").alias("q_micro"),
    )
    per = per_row.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
        F.sum("q_micro").alias("q_sum"),
    )
    # corpus total as a whole-table window over the GROUPED table
    # (#sources rows -> one SinglePartition exchange), not a self-agg
    # crossJoin, which would re-run the corpus scan + groupBy
    tot = F.sum("n_tokens").over(Window.partitionBy())
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / tot, 6).alias("token_share"),
        F.round(F.col("q_sum") / (F.col("n_docs") * 1_000_000.0), 6).alias("avg_quality"),
    )


_QUALITY_EXPR_SQL = f"""ROUND(0.4 * least(1.0, len(text) / 400.0)
           + 0.3 * least(1.0, 10.0 * {_sw_sql('en')} / greatest(len(string_split(text, ' ')), 1))
           + 0.3 * CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / greatest(len(string_split(text, ' ')), 1), 6)"""

SOURCE_MIX_SQL = f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(ROUND({_QUALITY_EXPR_SQL} * 1000000) AS BIGINT)) AS BIGINT) AS q_sum
  FROM documents
  GROUP BY source)
SELECT source, n_docs, n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / (SELECT SUM(n_tokens) FROM per), 6) AS token_share,
       ROUND(q_sum / (n_docs * 1000000.0), 6) AS avg_quality
FROM per
"""


def vocab_stats(docs: DataFrame, k: int = 20) -> DataFrame:
    """Corpus-level vocabulary profile: the k most frequent whitespace
    tokens with count and corpus frequency — the first thing a
    tokenizer-budget or stopword audit looks at. Returns (token, cnt,
    frac, rank), rank by (cnt DESC, token ASC) — deterministic.

    Scale shape (100TB): ONE shuffle (token groupBy with map-side
    partial aggregation — the distinct token table, not the corpus,
    crosses the wire), then a TakeOrdered top-k; the total-token count
    rides as a second aggregate of the same grouped table, never a
    second corpus scan.
    """
    tok = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    total = tok.agg(F.sum("cnt").alias("t"))
    # top-k via orderBy().limit() -> TakeOrderedAndProject (no global
    # sort materialization); the rank window then runs over <= k rows
    top = tok.orderBy(F.desc("cnt"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(total)
        .select(
            "token", "cnt",
            F.round(F.col("cnt") / F.col("t"), 6).alias("frac"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def vocab_stats_sql(k: int = 20) -> str:
    return f"""
WITH tok AS (
  SELECT t AS token, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE len(t) > 0 GROUP BY t),
total AS (SELECT SUM(cnt) AS t FROM tok),
ranked AS (
  SELECT token, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank
  FROM tok)
SELECT token, cnt, ROUND(CAST(cnt AS DOUBLE) / (SELECT t FROM total), 6) AS frac,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# PII patterns chosen for the Java-regex / RE2 common subset (no
# backreferences, no lookaround) so Spark and DuckDB match the exact
# same spans. Replacement order: email -> ipv4 -> phone, so an
# address's digit run is gone before the phone pattern scans; the
# counts are computed per-pattern on the ORIGINAL text (independent
# detectors — a digit-heavy email can count as both, disclosed).
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}(\.\d{1,3}){3}\b",
    "phone": r"\+?\d[\d\- ()]{6,}\d",
}
_PII_MARKERS = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def redact_pii(docs: DataFrame, kinds: tuple[str, ...] = ("email", "ipv4", "phone")) -> DataFrame:
    """Scrub emails / IPv4 addresses / phone numbers from the text
    column — the privacy pass a training-data pipeline runs before
    packing (e.g. the C4/RefinedWeb-style preparation steps).

    Returns (doc_id, text redacted with <EMAIL>/<IP>/<PHONE> markers,
    n_<kind> match counts). Pure per-row JVM regexp map: no shuffle,
    no UDF, whole-stage codegen end to end.
    """
    unknown = [k for k in kinds if k not in _PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; have {sorted(_PII_PATTERNS)}")
    red = F.col("text")
    counts = []
    for k in kinds:
        counts.append(
            F.regexp_count(F.col("text"), F.lit(_PII_PATTERNS[k]))
            .cast("long")
            .alias(f"n_{k}")
        )
    for k in ("email", "ipv4", "phone"):
        if k in kinds:
            red = F.regexp_replace(red, _PII_PATTERNS[k], _PII_MARKERS[k])
    return docs.select("doc_id", red.alias("text"), *counts)


def redact_pii_sql(
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"), text_expr: str = "text"
) -> str:
    """DuckDB twin (regexp_replace needs the explicit 'g' flag)."""
    red = text_expr
    for k in ("email", "ipv4", "phone"):
        if k in kinds:
            red = f"regexp_replace({red}, '{_PII_PATTERNS[k]}', '{_PII_MARKERS[k]}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all({text_expr}, '{_PII_PATTERNS[k]}')) AS n_{k}"
        for k in kinds
    )
    return f"SELECT doc_id, {red} AS text, {counts} FROM documents"


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF (the sklearn
    formulation: idf = ln((N+1)/(df+1)) + 1, score = tf · idf) — the
    classic keyword-extraction / doc-representation pass.

    Returns (doc_id, token, tf, df, tfidf rounded 6, rank). Ranking
    orders by the ROUNDED score (desc) then token (asc): rounding
    first means both engines rank the identical values they will
    also emit — an unrounded sort key could flip a rank on a 1-ulp
    ln() difference while the emitted scores still matched.

    Scale: tokenize map-side, one (doc, token) shuffle for tf, a
    partial-aggregated token shuffle for df (|vocab| rows), the
    corpus size N as a 1-row broadcast, and a per-doc window whose
    sort is local after the doc-keyed shuffle. At 100 TB the df
    frame joins back by token hash-partitioned; no global sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    tok = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD_RE), 0)).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    sc = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        sc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "df", "tfidf", "rank")
    )


def tfidf_topk_sql(k: int = 5, table: str = "documents") -> str:
    """DuckDB twin — same tokenizer, same smoothed idf, same
    rounded-score ranking."""
    return f"""
WITH tok AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '{_WORD_RE}')) AS token
             FROM {table}),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
idf AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM {table}),
sc AS (SELECT tf.doc_id, tf.token, tf.tf, idf.df,
              ROUND(tf.tf * (ln((n.n + 1.0) / (idf.df + 1.0)) + 1.0), 6) AS tfidf
       FROM tf JOIN idf USING (token) CROSS JOIN n),
rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, token ASC) AS rank
       FROM sc)
SELECT doc_id, token, tf, df, tfidf, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {k}
"""


def bm25_search(
    docs: DataFrame,
    query: str,
    top_n: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson & Zaragoza 2009, the
    Okapi/Lucene formulation): score the corpus against a free-text
    query, return the ``top_n`` docs.

    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)); per-term weight
    tf·(k1+1)/(tf + k1·(1 − b + b·len/avglen)). ``avglen`` is an
    integer token-count sum over N — exact as a double. Returns
    (doc_id, n_terms_matched, score rounded 6); ties order by doc_id.

    Scale: the token stream is FILTERED to query terms before any
    shuffle (the filter runs map-side against a literal array), so
    the tf aggregation shuffles only matching (doc, term) pairs; df
    and the corpus stats are tiny broadcast frames; the final top-n
    is a distributed TakeOrdered, never a global sort.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    import re as _re

    terms = sorted(set(_re.findall(_WORD_RE, query.lower())))
    if not terms:
        raise ValueError(f"query has no tokens under {_WORD_RE!r}: {query!r}")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD_RE), 0)
        ).alias("token"),
    )
    lens = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = lens.agg(
        F.count("*").alias("n"), F.sum("dl").alias("total_dl")
    )
    tf = (
        tok.filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (
                        1.0
                        - b
                        + b
                        * F.col("dl")
                        / (
                            F.col("total_dl").cast("double")
                            / F.col("n").cast("double")
                        )
                    )
                )
            ).alias("w"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_matched"),
            F.round(F.sum("w"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(top_n)
    )


def bm25_search_sql(
    query: str,
    top_n: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """DuckDB twin of `bm25_search` (float literals via repr —
    shortest round-trip form parses to the identical double)."""
    import re as _re

    terms = sorted(set(_re.findall(_WORD_RE, query.lower())))
    lst = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH tok AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '{_WORD_RE}')) AS token
             FROM {table}),
lens AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS total_dl FROM lens),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
       WHERE token IN ({lst}) GROUP BY 1, 2),
idf AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
w AS (SELECT tf.doc_id,
             ln(1.0 + (s.n - idf.df + 0.5) / (idf.df + 0.5))
             * (tf.tf * ({k1!r} + 1.0))
             / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * lens.dl
                / (CAST(s.total_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))) AS w
      FROM tf JOIN idf USING (token) JOIN lens USING (doc_id) CROSS JOIN stats s)
SELECT doc_id, COUNT(*) AS n_terms_matched, ROUND(SUM(w), 6) AS score
FROM w GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {top_n}
"""


def ngram_lm(
    docs: DataFrame,
    n: int = 2,
    min_count: int = 1,
) -> DataFrame:
    """Count-based n-gram language model table: every corpus n-gram
    with its count, its (n−1)-gram prefix count, and the maximum-
    likelihood conditional probability P(w_n | prefix) — the
    count-ratio LM used for data-quality perplexity proxies and
    classic backoff models.

    Returns (gram, prefix, count, prefix_count, p rounded 6).
    ``p`` divides two INTEGER counts, so the oracle is exact with no
    float-sum tolerance. For n = 1 the prefix is the empty string and
    ``prefix_count`` is the corpus token total.

    Scale: tokenize map-side, one gram-keyed count shuffle (map-side
    combine), one prefix-keyed count over the same token stream, and
    a gram→prefix hash join. The gram key is the string itself
    (output needs it); a production census at 100 TB would pre-hash
    to 8-byte keys and join the strings back for the surviving rows
    only (the `decontaminate` discipline).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD_RE), 0)
    grams = docs.select(
        F.explode(
            F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(toks, i + j) for j in range(n)]
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram")
    )
    gc = grams.groupBy("gram").agg(F.count("*").alias("count"))
    if n == 1:
        total = gc.agg(F.sum("count").alias("prefix_count"))
        return (
            gc.crossJoin(F.broadcast(total))
            .filter(F.col("count") >= min_count)
            .select(
                "gram",
                F.lit("").alias("prefix"),
                "count",
                "prefix_count",
                F.round(F.col("count") / F.col("prefix_count"), 6).alias("p"),
            )
        )
    prefixes = docs.select(
        F.explode(
            F.when(
                F.size(toks) >= n - 1,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 2)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(toks, i + j) for j in range(n - 1)]
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("prefix")
    )
    pc = prefixes.groupBy("prefix").agg(F.count("*").alias("prefix_count"))
    withp = gc.withColumn(
        "prefix",
        F.substring_index(F.col("gram"), " ", n - 1),
    )
    return (
        withp.join(pc, "prefix")
        .filter(F.col("count") >= min_count)
        .select(
            "gram",
            "prefix",
            "count",
            "prefix_count",
            F.round(F.col("count") / F.col("prefix_count"), 6).alias("p"),
        )
    )


def ngram_lm_sql(n: int = 2, min_count: int = 1, table: str = "documents") -> str:
    """DuckDB twin of `ngram_lm` (n >= 2 form; n = 1 degenerates to a
    unigram frequency table)."""
    tok = f"regexp_extract_all(lower(text), '{_WORD_RE}')"

    def grams_of(k: int) -> str:
        join = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
        return (
            f"SELECT unnest([{join} for i in range(1, len(t) - {k - 1} + 1)]) AS g "
            f"FROM (SELECT {tok} AS t FROM {table}) WHERE len(t) >= {k}"
        )

    if n == 1:
        return f"""
WITH gc AS (SELECT g AS gram, COUNT(*) AS count FROM ({grams_of(1)}) GROUP BY g),
tot AS (SELECT CAST(SUM(count) AS BIGINT) AS prefix_count FROM gc)
SELECT gram, '' AS prefix, count, tot.prefix_count,
       ROUND(count / tot.prefix_count, 6) AS p
FROM gc CROSS JOIN tot WHERE count >= {min_count}
"""
    return f"""
WITH gc AS (SELECT g AS gram, COUNT(*) AS count FROM ({grams_of(n)}) GROUP BY g),
pc AS (SELECT g AS prefix, COUNT(*) AS prefix_count FROM ({grams_of(n - 1)}) GROUP BY g),
wp AS (SELECT gram, count,
              array_to_string((string_split(gram, ' '))[1:{n - 1}], ' ') AS prefix
       FROM gc)
SELECT wp.gram, wp.prefix, wp.count, pc.prefix_count,
       ROUND(wp.count / pc.prefix_count, 6) AS p
FROM wp JOIN pc USING (prefix)
WHERE wp.count >= {min_count}
"""


def perplexity_scores(docs: DataFrame, n: int = 2, k: float = 1.0) -> DataFrame:
    """Per-document cross-entropy under the corpus's own add-k
    smoothed n-gram LM (the CCNet-style perplexity quality signal,
    Wenzek et al. 2020, with the `ngram_lm` census as the model):

        p(w | prefix) = (c(gram) + k) / (c(prefix) + k * V)
        cross_entropy(d) = -(1/G) * sum_i ln p(gram_i)      [nats]

    with V the corpus unigram vocabulary size and G the doc's gram
    count. Perplexity = exp(cross_entropy) — left to the caller: a
    final exp() would re-introduce a cross-engine 1-ulp hazard the
    rounding below just removed, and every downstream use (filtering,
    bucketing) is monotone in the entropy anyway.

    Returns (doc_id, n_grams, cross_entropy). Docs with fewer than n
    tokens emit no row (no gram to score). EXACTNESS CONTRACT: each
    per-gram ln is rounded to 7 decimals BEFORE the per-doc fold —
    Java's Math.log and libm disagree by 1 ulp on ~7% of inputs
    (measured on this host: 14586/200000 raw, 0/200000 after
    round-7), and the fold then accumulates the identical doubles in
    token order on both engines (array_sort + left fold here,
    list(... ORDER BY pos) + list_reduce in the oracle).

    Scale: the gram/prefix censuses are the `ngram_lm` shuffles; the
    per-doc score adds one (doc_id)-keyed aggregation whose rows are
    (doc, pos, logp) triples. The gram->count join keys on the gram
    string (pre-hash to 8 bytes at 100 TB, the `decontaminate`
    discipline).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD_RE), 0)

    def gram_array(width: int):
        return F.when(
            F.size(toks) >= width,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (width - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(width)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    doc_grams = docs.select(
        "doc_id", F.posexplode(gram_array(n)).alias("pos", "gram")
    )
    gc = doc_grams.groupBy("gram").agg(F.count("*").alias("c"))
    vocab = docs.select(F.explode(gram_array(1)).alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    if n == 1:
        denom_frame = gc.agg(F.sum("c").alias("cp"))
        scored = doc_grams.join(gc, "gram").crossJoin(F.broadcast(denom_frame))
    else:
        prefixes = docs.select(F.explode(gram_array(n - 1)).alias("prefix"))
        pc = prefixes.groupBy("prefix").agg(F.count("*").alias("cp"))
        scored = (
            doc_grams.withColumn(
                "prefix", F.substring_index(F.col("gram"), " ", n - 1)
            )
            .join(gc, "gram")
            .join(pc, "prefix")
        )
    scored = scored.crossJoin(F.broadcast(vocab)).select(
        "doc_id",
        "pos",
        F.round(
            F.log(
                (F.col("c") + F.lit(k))
                / (F.col("cp") + F.lit(k) * F.col("v"))
            ),
            7,
        ).alias("logp"),
    )
    per = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.array_sort(F.collect_list(F.struct("pos", "logp"))).alias("series"),
    )
    fold = F.aggregate(
        "series", F.lit(0.0), lambda acc, x: acc + x["logp"]
    )
    return per.select(
        "doc_id",
        "n_grams",
        F.round((-fold) / F.col("n_grams"), 6).alias("cross_entropy"),
    )


def perplexity_scores_sql(n: int = 2, k: float = 1.0, table: str = "documents") -> str:
    """DuckDB twin of `perplexity_scores` — identical round-7 per-gram
    logs folded in the identical token order."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    tok = f"regexp_extract_all(lower(text), '{_WORD_RE}')"

    def gram_expr(width: int) -> str:
        return " || ' ' || ".join(f"t[i + {j}]" for j in range(width))

    def grams_of(width: int) -> str:
        return (
            f"SELECT unnest([{gram_expr(width)} for i in range(1, len(t) - {width - 1} + 1)]) AS g "
            f"FROM (SELECT {tok} AS t FROM {table}) WHERE len(t) >= {width}"
        )

    if n == 1:
        denom = "(SELECT CAST(SUM(c) AS BIGINT) AS cp FROM gc)"
        joins = "JOIN gc USING (gram) CROSS JOIN pc"
        pc_cte = f"pc AS {denom}"
    else:
        pc_cte = (
            f"pc AS (SELECT g AS prefix, COUNT(*) AS cp FROM ({grams_of(n - 1)}) GROUP BY g)"
        )
        joins = (
            "JOIN gc USING (gram) "
            f"JOIN pc ON pc.prefix = array_to_string((string_split(gram, ' '))[1:{n - 1}], ' ')"
        )
    return f"""
WITH dg AS (
  SELECT doc_id, unnest([{{'pos': i - 1, 'gram': {gram_expr(n)}}} for i in range(1, len(t) - {n - 1} + 1)],
                        recursive := true)
  FROM (SELECT doc_id, {tok} AS t FROM {table}) WHERE len(t) >= {n}
),
gc AS (SELECT g AS gram, COUNT(*) AS c FROM ({grams_of(n)}) GROUP BY g),
{pc_cte},
vocab AS (SELECT COUNT(DISTINCT g) AS v FROM ({grams_of(1)})),
scored AS (
  SELECT doc_id, pos,
         ROUND(ln((c + {k}) / (cp + {k} * v)), 7) AS logp
  FROM dg {joins} CROSS JOIN vocab
),
per AS (SELECT doc_id, COUNT(*) AS n_grams, list(logp ORDER BY pos) AS l
        FROM scored GROUP BY doc_id)
SELECT doc_id, n_grams,
       ROUND((-list_reduce(l, (a, b) -> a + b)) / n_grams, 6) AS cross_entropy
FROM per
"""


def winnow_fingerprints(docs: DataFrame, k: int = 5, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS scheme): hash every character k-gram, slide
    a window of ``w`` consecutive hashes, keep each window's MINIMUM —
    the guaranteed-coverage local fingerprint set (any match of length
    >= w+k-1 shares a fingerprint; density ~2/(w+1)).

    Returns DISTINCT (doc_id, fp) rows — the selected-hash set a
    copy-detection join runs on (`fp`-keyed self-join, the same
    bucket-join discipline as `dedup.minhash_lsh_pairs`; the full
    `fingerprints` single-min signature above is the degenerate
    w = len(text) case).

    Shuffle story: the k-gram hashing + window minima are one per-row
    JVM map (arrays in whole-stage codegen, no UDF); the only shuffle
    is the final DISTINCT on (doc_id, fp) — 16 bytes a row, never raw
    text. Ties pick the plain minimum (60-bit md5 hashes collide with
    probability ~n²/2^60, and min is position-free), so the selection
    is deterministic and engine-independent.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    n_grams = F.greatest(F.length("text") - (k - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(
            F.substring(F.md5(F.col("text").substr(i, F.lit(k))), 1, 15), 16, 10
        ).cast("long"),
    )
    n_windows = F.greatest(F.size(F.col("h")) - (w - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(F.col("h"), i, w)),
    )
    return (
        docs.select("doc_id", hashes.alias("h"))
        .select("doc_id", F.explode(mins).alias("fp"))
        .distinct()
    )


def winnow_fingerprints_sql(k: int = 5, w: int = 4, table: str = "documents") -> str:
    """DuckDB twin of `winnow_fingerprints` (exact: integer hashes)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    gram_hash = f"CAST(('0x' || substr(md5(substr(text, i, {k})), 1, 15)) AS BIGINT)"
    return f"""
WITH h AS (
  SELECT doc_id,
         [{gram_hash} for i in range(1, greatest(len(text) - {k - 1}, 1) + 1)] AS hs
  FROM {table})
SELECT DISTINCT doc_id,
       unnest([list_min(hs[i : i + {w - 1}])
               for i in range(1, greatest(len(hs) - {w - 1}, 1) + 1)]) AS fp
FROM h
"""


def pmi_collocations(
    docs: DataFrame, top_k: int = 20, min_count: int = 5
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information
    (Church & Hanks 1990, Comp. Ling. 16(1) — the classic collocation
    statistic):

        PMI(x, y) = ln( p(xy) / (p(x) p(y)) )
                  = ln( (c_xy * N * N) / (B * c_x * c_y) )

    with c_xy the bigram count over B corpus bigrams and c_x/c_y
    unigram counts over N tokens. ``min_count`` drops rare bigrams
    (raw PMI is maximized by hapaxes — the standard guard).

    Returns (gram, count, pmi, rank), rank 1..top_k by
    (pmi DESC, gram ASC). Every input to the ln is an exact integer
    count so the argument is one fixed double expression tree;
    the ln itself differs Java-vs-libm by 1 ulp on ~7% of inputs
    (the perplexity finding), so pmi is ROUNDED to 6 and the rank
    window orders by the ROUNDED value with the gram tie-break —
    rank is engine-stable (the bm25 contract).

    Scale: tokenize map-side, two count shuffles (bigrams, unigrams —
    both map-side combinable), two hash joins of the bigram table
    against the unigram counts, 1-row totals broadcast. min_count
    filters BEFORE the global top-k window, so the single-partition
    window sees only the surviving head, not the hapax tail.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_WORD_RE), 0)
    bigrams = docs.select(
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram")
    )
    unigrams = docs.select(F.explode(toks).alias("tok"))
    gc = bigrams.groupBy("gram").agg(F.count("*").alias("count"))
    uc = unigrams.groupBy("tok").agg(F.count("*").alias("c1"))
    totals = gc.agg(F.sum("count").alias("b_total")).crossJoin(
        uc.agg(F.sum("c1").alias("n_total"))
    )
    scored = (
        gc.filter(F.col("count") >= min_count)
        .withColumn("x", F.substring_index("gram", " ", 1))
        .withColumn("y", F.substring_index("gram", " ", -1))
        .join(uc.select(F.col("tok").alias("x"), F.col("c1").alias("cx")), "x")
        .join(uc.select(F.col("tok").alias("y"), F.col("c1").alias("cy")), "y")
        .crossJoin(F.broadcast(totals))
        .select(
            "gram",
            "count",
            F.round(
                F.log(
                    (
                        F.col("count").cast("double")
                        * F.col("n_total").cast("double")
                        * F.col("n_total").cast("double")
                    )
                    / (
                        F.col("b_total").cast("double")
                        * F.col("cx").cast("double")
                        * F.col("cy").cast("double")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("gram"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("gram", "count", "pmi", F.col("rank").cast("long").alias("rank"))
    )


def pmi_collocations_sql(
    top_k: int = 20, min_count: int = 5, table: str = "documents"
) -> str:
    """DuckDB twin of `pmi_collocations` (value-exact: integer counts
    into one fixed double tree, ln rounded to 6, rank on the rounded
    score)."""
    tok = f"regexp_extract_all(lower(text), '{_WORD_RE}')"
    return f"""
WITH bigrams AS (
  SELECT unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS gram
  FROM (SELECT {tok} AS t FROM {table}) WHERE len(t) >= 2),
unigrams AS (
  SELECT unnest(t) AS tok FROM (SELECT {tok} AS t FROM {table})),
gc AS (SELECT gram, COUNT(*) AS count FROM bigrams GROUP BY gram),
uc AS (SELECT tok, COUNT(*) AS c1 FROM unigrams GROUP BY tok),
totals AS (SELECT (SELECT SUM(count) FROM gc) AS b_total,
                  (SELECT SUM(c1) FROM uc) AS n_total),
scored AS (
  SELECT g.gram, g.count,
         ROUND(ln((CAST(g.count AS DOUBLE) * CAST(t.n_total AS DOUBLE)
                   * CAST(t.n_total AS DOUBLE))
                  / (CAST(t.b_total AS DOUBLE) * CAST(ux.c1 AS DOUBLE)
                     * CAST(uy.c1 AS DOUBLE))), 6) AS pmi
  FROM gc g
  JOIN uc ux ON ux.tok = string_split(g.gram, ' ')[1]
  JOIN uc uy ON uy.tok = string_split(g.gram, ' ')[2]
  CROSS JOIN totals t
  WHERE g.count >= {min_count})
SELECT gram, count, pmi, CAST(rank AS BIGINT) AS rank FROM (
  SELECT gram, count, pmi,
         ROW_NUMBER() OVER (ORDER BY pmi DESC, gram ASC) AS rank
  FROM scored) WHERE rank <= {top_k}
"""


# --------------------------------------------------- n-gram novelty

def ngram_novelty(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-document novelty: the fraction of its distinct word
    n-grams that occur in NO other document (corpus df == 1) — the
    memorization-risk complement of the dedup operators: a low score
    means the document is mostly assembled from corpus-repeated
    phrasing even when no single near-duplicate exists.

    Returns (doc_id, n_grams, novel_frac). Scale shape: one shingle
    explode, one map-side-combinable df count on the shingle hash, one
    semi-join-shaped aggregation back per doc — the exact_dedup
    shuffle discipline (never raw shingle text beyond the first
    groupBy key, which is itself bounded by n words).
    """
    from linkgraph.pipeline.dedup import _word_shingles

    sh = _word_shingles(docs, n)
    df = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    return (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(
                F.avg((F.col("df") == 1).cast("double")), 6
            ).alias("novel_frac"),
        )
    )


def ngram_novelty_sql(n: int = 3) -> str:
    from linkgraph.pipeline.dedup import _shingles_sql

    return f"""
WITH sh AS MATERIALIZED ({_shingles_sql(n).strip()}),
df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
SELECT sh.doc_id, COUNT(*) AS n_grams,
       ROUND(AVG(CASE WHEN df.df = 1 THEN 1.0 ELSE 0.0 END), 6) AS novel_frac
FROM sh JOIN df ON df.shingle = sh.shingle
GROUP BY sh.doc_id
"""


# ---------------------------------------------------- BPE merge learning

def bpe_learn(
    docs: DataFrame,
    n_merges: int = 8,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> DataFrame:
    """Distributed byte-pair-encoding merge learning (Sennrich et al.,
    ACL 2016) — the tokenizer-training census step of an LLM data
    pipeline, run over the corpus vocabulary.

    Pre-tokenize on whitespace, keep the word-frequency vocabulary
    (the ONLY state — corpus text never reappears after the first
    census), split every word into characters plus a terminal '</w>'
    marker symbol, then ``n_merges`` rounds of: count every adjacent
    symbol pair weighted by word frequency (overlapping occurrences
    count, Sennrich's get_stats), pick the max-count pair (ties:
    lexicographic (lhs, rhs) — deterministic), and merge it greedily
    left-to-right in every word (a merged occurrence consumes its
    symbols, so of overlapping candidates ('a','a' in "a a a") only
    the leftmost of each consecutive run merges — the reference
    semantics). Returns (step, lhs, rhs, pair_count): the learned
    merge table in order.

    Exactness: counts are integers; the greedy application is
    implemented as a shuffle-free ``aggregate`` fold over each word's
    symbol array (accumulator = (emitted, pending) — pending merges
    with the next symbol or is flushed), which the SQL twin
    (``bpe_learn_sql``) reproduces exactly through an island/parity
    window formulation: candidate positions at consecutive offsets
    (only possible in same-symbol runs) merge at odd in-run ranks.
    Both compute the identical merge table.

    Scale shape (100TB): the corpus is touched ONCE (word census —
    map-side-combinable groupBy); every round then runs on the
    |vocab|-row state: one pair census (map-side combinable, keys are
    symbol pairs), ONE 1-row argmax collect (the size-gated-collect
    pattern), and a JVM-codegen fold per word — no per-round shuffle
    of the vocabulary itself, no Python in the loop. Stops early when
    no pair remains.
    """
    merges, state = _bpe_run(
        docs, n_merges, checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every, resume=resume,
    )
    state.unpersist()
    return docs.sparkSession.createDataFrame(
        merges, "step long, lhs string, rhs string, pair_count long"
    )


def _bpe_run(
    docs: DataFrame,
    n_merges: int,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
):
    """Shared BPE loop: returns (merge list, final MATERIALIZED vocab
    state (cnt, syms)) — the caller owns the state's release. Every
    superstep is pinned eagerly (SuperstepLoop), so the corpus census
    runs exactly once and callers can release parents freely.

    Resumability (the realistic-scale story: a 32k-merge tokenizer
    training is the longest loop in this repo): with ``checkpoint_dir``
    every ``checkpoint_every``-th merge writes the vocab state AND the
    cumulative merge table (manifest metrics) durably; ``resume=True``
    re-enters at the last durable merge — including to EXTEND a
    finished run to a larger ``n_merges``. The manifest context
    records a vocabulary fingerprint (bit_xor of per-word xxhash64 +
    word count); resuming against a different corpus raises instead of
    silently merging mismatched vocabularies.
    """
    import json as _json

    from linkgraph.checkpoint import SuperstepLoop

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    census = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    context = {}
    if checkpoint_dir:
        fp = census.agg(
            F.expr("bit_xor(xxhash64(word))").alias("fp"),
            F.count("*").alias("n_words"),
        ).first()
        context = {"vocab_fp": fp["fp"], "n_words": fp["n_words"]}
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="bpe",
        context=context, max_steps=n_merges,
    )
    merges: list[tuple[int, str, str, int]] = []
    start = 0
    state = None
    if resume and checkpoint_dir:
        resumed = loop.resume()
        if resumed is not None:
            start, state = resumed
            if loop.last_context and context and loop.last_context != context:
                raise ValueError(
                    "bpe resume mismatch: the corpus vocabulary differs from "
                    f"the checkpointed one ({loop.last_context} != {context})"
                )
            merges = [tuple(x) for x in _json.loads(loop.last_metrics["merges_json"])]
    if state is None:
        vocab = census.select(
            "cnt",
            F.concat(
                F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
                F.array(F.lit("</w>")),
            ).alias("syms"),
        )
        state = loop.advance(
            0, vocab, force_checkpoint=bool(checkpoint_dir),
            metrics={"merges_json": "[]"},
        )
    for step in range(start, n_merges):
        adj = state.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.expr("slice(syms, 1, greatest(size(syms) - 1, 0))"),
                    F.expr("slice(syms, 2, greatest(size(syms) - 1, 0))"),
                    lambda x, y: F.struct(x.alias("lhs"), y.alias("rhs")),
                )
            ).alias("p"),
        )
        top = (
            adj.groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("lhs"), F.asc("rhs"))
            .first()
        )
        if top is None:
            break
        a, b = top["lhs"], top["rhs"]
        merges.append((step, a, b, top["c"]))
        la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
        nul = F.lit(None).cast("string")
        empty = F.expr("CAST(array() AS array<string>)")

        def _flush(acc):
            return F.when(
                acc["pend"].isNull(), acc["out"]
            ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))

        folded = F.aggregate(
            "syms",
            F.struct(empty.alias("out"), nul.alias("pend")),
            lambda acc, s: F.when(
                (acc["pend"] == la) & (s == lb),
                F.struct(
                    F.concat(acc["out"], F.array(lab)).alias("out"),
                    nul.alias("pend"),
                ),
            ).otherwise(
                F.struct(_flush(acc).alias("out"), s.alias("pend"))
            ),
            _flush,
        )
        merges_json = _json.dumps(merges)
        state = loop.advance(
            step + 1,
            state.select("cnt", folded.alias("syms")),
            metrics={"merges_json": merges_json},
        )
    return merges, state


def bpe_token_census(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """Token-frequency census of the corpus vocabulary AFTER
    ``n_merges`` learned BPE merges — the "what does the tokenizer's
    unit inventory look like" readout (subword list + how much corpus
    mass each unit covers). Returns (token, n_occurrences) where
    n_occurrences sums word frequency over every occurrence of the
    token in the segmented vocabulary.

    Same exactness and scale shape as ``bpe_learn`` (it IS the same
    loop — one corpus census, then |vocab|-row rounds), plus one final
    map-side-combinable explode-count.
    """
    _, state = _bpe_run(docs, n_merges)
    out = (
        state.select("cnt", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("n_occurrences"))
    )
    out = out.localCheckpoint()  # materialize before releasing the state
    state.unpersist()
    return out


def bpe_token_census_sql(n_merges: int = 8, table: str = "documents") -> str:
    """DuckDB twin of ``bpe_token_census``: the ``bpe_learn_sql`` CTE
    chain with a census over the final vocabulary state."""
    ctes, _picks = _bpe_sql_parts(n_merges, table)
    return (
        ctes
        + f"\nSELECT token, CAST(SUM(cnt) AS BIGINT) AS n_occurrences FROM ("
        f"SELECT cnt, unnest(syms) AS token FROM v{n_merges}) GROUP BY token"
    )


def bpe_learn_sql(n_merges: int = 8, table: str = "documents") -> str:
    """Unrolled DuckDB twin of ``bpe_learn``. Greedy application per
    round: candidate positions (sym, next) = the chosen pair form
    consecutive-offset islands only inside same-symbol runs; the fold
    merges the 1st, 3rd, ... candidate of each island (odd in-island
    rank) and consumes the following position."""
    ctes, picks = _bpe_sql_parts(n_merges, table)
    return ctes + "\n" + "\nUNION ALL ".join(picks)


def _bpe_sql_parts(n_merges: int, table: str) -> tuple[str, list[str]]:
    """Shared CTE chain + per-step pick selects for the BPE twins
    (the census/tokenize twins reuse the chain with their own final
    SELECT instead of splicing generated SQL text)."""
    ctes = [
        (
            "v0 AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY word) AS wid, cnt, "
            "list_concat(list_transform(range(1, length(word) + 1), "
            "i -> substr(word, i, 1)), ['</w>']) AS syms "
            "FROM (SELECT word, COUNT(*) AS cnt FROM ("
            f"SELECT unnest(string_split(text, ' ')) AS word FROM {table}"
            ") WHERE length(word) > 0 GROUP BY word))"
        )
    ]
    picks = []
    for r in range(n_merges):
        p, n = f"v{r}", f"v{r + 1}"
        # windows ONLY in layers above the unnest (evaluation order)
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT wid, cnt, sym, pos, "
            "LEAD(sym) OVER (PARTITION BY wid ORDER BY pos) AS nxt FROM ("
            "SELECT wid, cnt, unnest(syms) AS sym, "
            f"unnest(generate_series(1, len(syms))) AS pos FROM {p}))"
        )
        ctes.append(
            f"m{r} AS MATERIALIZED (SELECT sym AS lhs, nxt AS rhs, SUM(cnt) AS c "
            f"FROM e{r} WHERE nxt IS NOT NULL GROUP BY 1, 2 "
            "ORDER BY c DESC, lhs ASC, rhs ASC LIMIT 1)"
        )
        # candidate positions -> islands (consecutive offsets, i.e.
        # same-symbol runs) -> odd in-island ranks merge
        ctes.append(
            f"g{r} AS MATERIALIZED (SELECT wid, pos FROM ("
            "SELECT wid, pos, ROW_NUMBER() OVER ("
            "PARTITION BY wid, pos - crk ORDER BY pos) AS irk FROM ("
            "SELECT wid, pos, ROW_NUMBER() OVER (PARTITION BY wid ORDER BY pos) AS crk "
            f"FROM e{r} JOIN m{r} ON sym = lhs AND nxt = rhs)) WHERE irk % 2 = 1)"
        )
        ctes.append(
            f"{n} AS MATERIALIZED (SELECT e.wid AS wid, cnt, list("
            "CASE WHEN g1.pos IS NOT NULL THEN e.sym || e.nxt ELSE e.sym END "
            "ORDER BY e.pos) AS syms "
            f"FROM e{r} e "
            f"LEFT JOIN g{r} g1 ON g1.wid = e.wid AND g1.pos = e.pos "
            f"LEFT JOIN g{r} g2 ON g2.wid = e.wid AND g2.pos = e.pos - 1 "
            "WHERE g2.pos IS NULL GROUP BY e.wid, cnt)"
        )
        picks.append(
            f"SELECT CAST({r} AS BIGINT) AS step, lhs, rhs, CAST(c AS BIGINT) AS pair_count FROM m{r}"
        )
    return "WITH " + ",\n".join(ctes), picks


def bpe_tokenize(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """Per-document token census under the ``n_merges``-step learned
    BPE — the "what does a document look like to the tokenizer"
    readout and the unit count that drives packing/pricing. Returns
    (doc_id, token, n) where n counts the token's occurrences in the
    document after whitespace pre-tokenization and greedy merge
    application.

    The segmentation is computed ONCE on the |vocab|-row state (the
    ``bpe_learn`` loop), then joined back onto the (doc_id, word)
    occurrences — documents are never re-segmented row by row, so the
    corpus-scale cost after the two censuses is a single word-keyed
    hash join (the word table is the natural broadcast side when the
    vocabulary fits).
    """
    _, state = _bpe_run(docs, n_merges)
    # reconstruct each word from its symbols (strip the terminal
    # marker) so the segmented vocab can key back onto occurrences
    # the terminal '</w>' marker may have MERGED into the last token
    # (e.g. 'at</w>'), so strip it from the concatenated string, not
    # from the symbol array
    seg = state.select(
        F.expr(
            "substring(array_join(syms, ''), 1, length(array_join(syms, '')) - 4)"
        ).alias("word"),
        F.explode("syms").alias("token"),
    )
    seg = seg.localCheckpoint()  # materialize before releasing the state
    state.unpersist()
    words = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
    )
    return (
        words.join(seg, "word")
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("n"))
    )


def bpe_tokenize_sql(n_merges: int = 8, table: str = "documents") -> str:
    """DuckDB twin of ``bpe_tokenize`` (same CTE chain; the vocab
    state keys back onto word occurrences by reconstructed word)."""
    ctes, _picks = _bpe_sql_parts(n_merges, table)
    return (
        ctes
        + f""",
seg AS (SELECT substr(array_to_string(syms, ''), 1,
                      length(array_to_string(syms, '')) - 4) AS word,
               unnest(syms) AS token
        FROM v{n_merges}),
occ AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM {table})
SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS n
FROM occ JOIN seg USING (word)
WHERE length(occ.word) > 0
GROUP BY doc_id, token"""
    )


# ----------------------------------------------------- count-min sketch

def countmin_sketch(
    docs: DataFrame, d: int = 4, w: int = 1024
) -> DataFrame:
    """Count-min sketch of the corpus token-frequency distribution
    (Cormode & Muthukrishnan 2005): a d x w grid of counters; token t
    increments cell (r, h_r(t) mod w) for each of d independent
    hashes. Any token's frequency is then upper-bounded by the MIN of
    its d cells (``countmin_estimate``) with error <= 2N/w at
    probability 1 - 2^-d — frequency stats in FIXED memory when the
    vocabulary itself is too large to census.

    Returns (sketch_row, sketch_col, n) — at most d*w rows regardless
    of corpus size.

    Exactness: counters are plain integer sums over md5-derived cells
    — order-free and engine-identical, so the sketch (and every
    estimate) is value-exact cross-engine, not just approximate-equal.

    Scale shape (100TB): ONE map-side-combinable groupBy whose key
    space is d*w cells — partial aggregation collapses each partition
    to <= d*w rows before the (tiny) shuffle; no token ever shuffles
    raw. The d cell indexes are computed in one generated JVM
    expression per token (no joins, no Python).
    """
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got d={d}, w={w}")
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.length("token") > 0)
    return (
        toks.select(F.explode(_cm_cells(d, w)).alias("c"))
        .groupBy(
            F.col("c.sketch_row").alias("sketch_row"),
            F.col("c.sketch_col").alias("sketch_col"),
        )
        .agg(F.count("*").alias("n"))
    )


def _cm_cells(d: int, w: int):
    """The d (sketch_row, sketch_col) probe cells of a token — ONE
    expression shared by sketch build and estimate probe (a salt or
    layout change can never desynchronize the two sides)."""
    return F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("sketch_row"),
                F.pmod(stable_hash64(F.col("token"), salt=f"cm-{r}"), F.lit(w))
                .cast("long")
                .alias("sketch_col"),
            )
            for r in range(d)
        ]
    )


def countmin_sketch_sql(d: int = 4, w: int = 1024, table: str = "documents") -> str:
    rows = " UNION ALL ".join(
        f"SELECT {r} AS sketch_row, "
        f"{stable_hash64_sql('token', salt=f'cm-{r}')} % {w} AS sketch_col "
        "FROM t2"
        for r in range(d)
    )
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM {table}
), t2 AS (SELECT token FROM toks WHERE length(token) > 0),
cells AS ({rows})
SELECT sketch_row, sketch_col, CAST(COUNT(*) AS BIGINT) AS n
FROM cells GROUP BY 1, 2
"""


def countmin_estimate(
    docs: DataFrame, k: int = 20, d: int = 4, w: int = 1024
) -> DataFrame:
    """Count-min frequency estimates for the corpus's exact top-k
    tokens (by true count DESC, token ASC — deterministic): returns
    (token, n_exact, n_est) with the sketch's min-of-d-cells
    upper bound alongside the truth. The composition showcases the
    guarantee (n_est >= n_exact always; equality unless the token
    collides in all d rows).
    """
    sketch = countmin_sketch(docs, d=d, w=w)
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.length("token") > 0)
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("token"))
        .limit(k)
    )
    probes = top.select(
        "token", "n_exact", F.explode(_cm_cells(d, w)).alias("c")
    ).select("token", "n_exact", "c.sketch_row", "c.sketch_col")
    return (
        probes.join(F.broadcast(sketch), ["sketch_row", "sketch_col"])
        .groupBy("token", "n_exact")
        .agg(F.min("n").alias("n_est"))
    )


def countmin_estimate_sql(
    k: int = 20, d: int = 4, w: int = 1024, table: str = "documents"
) -> str:
    probes = " UNION ALL ".join(
        f"SELECT token, n_exact, {r} AS sketch_row, "
        f"{stable_hash64_sql('token', salt=f'cm-{r}')} % {w} AS sketch_col "
        "FROM top"
        for r in range(d)
    )
    return f"""
WITH sk AS MATERIALIZED ({countmin_sketch_sql(d, w, table)}),
toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM {table}),
top AS MATERIALIZED (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM toks WHERE length(token) > 0 GROUP BY token
  ORDER BY n_exact DESC, token ASC LIMIT {k}),
probes AS ({probes})
SELECT token, n_exact, CAST(MIN(n) AS BIGINT) AS n_est
FROM probes JOIN sk USING (sketch_row, sketch_col)
GROUP BY token, n_exact
"""


# ------------------------------------------------- HyperLogLog distinct

_HLL_RHO_MAX = 40  # register clamp: keeps the dyadic sum exact in int64


def _hll_rho_sql(h: str) -> str:
    """rho(h) = (trailing zeros of the 60-bit hash) + 1, clamped to
    _HLL_RHO_MAX — pure integer ops (lowest set bit via h & -h, then a
    generated power-of-two CASE), identical on both engines."""
    lsb = f"(({h}) & -({h}))"
    whens = " ".join(
        f"WHEN {1 << t}{'' if t < 31 else ''} THEN {min(t + 1, _HLL_RHO_MAX)}"
        for t in range(60)
    )
    # h == 0 (never: md5-derived 60-bit value 0 has probability 2^-60)
    # falls through to the clamp
    return f"(CASE {lsb} {whens} ELSE {_HLL_RHO_MAX} END)"


def hll_distinct(docs: DataFrame, by: str = "lang", b: int = 9) -> DataFrame:
    """HyperLogLog distinct-token count per group (Flajolet et al.
    2007) next to the exact truth: returns (grp, n_exact, n_est) —
    the fixed-memory cardinality sketch for when the per-group
    vocabulary is too large to census (2^b int registers per group vs
    the full distinct set).

    Engine-exact, not just approximate-equal: bucket = low b bits of
    the 60-bit md5 hash, rho = trailing zeros of the remaining bits +
    1 CLAMPED at 40, registers combine by MAX (order-free), and the
    harmonic sum is computed as the INTEGER sum of 2^(40-rho) (every
    term an exact dyadic; <= 2^49 for b <= 9, no float accumulation),
    so the raw estimate alpha*m^2*2^40/sum — including the
    small-range linear-counting branch, driven by integer zeros — is
    one exact-input float expression rounded to 6 decimals. The clamp
    changes nothing observable below ~2^40 distinct values.

    Scale shape (100TB): one map-side-combinable (grp, bucket) MAX
    aggregate (token duplicates collapse in the partials — HLL is
    insertion-count-insensitive), then a |groups|x2^b-row combine.
    The exact side (for the comparison contract) is the only
    vocabulary-sized aggregate; drop it when using the sketch alone.
    """
    if not 4 <= b <= 14:
        raise ValueError(f"b must be in [4, 14], got {b}")
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)  # the standard large-m constant
    toks = (
        docs.select(F.col(by).alias("grp"), F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
    )
    h = stable_hash64(F.col("token"), salt="hll")
    keyed = toks.select(
        "grp",
        F.pmod(h, F.lit(m)).alias("bucket"),
        F.expr(_hll_rho_sql(f"(({stable_hash64_sql_spark('token', 'hll')}) div {m})")).alias("rho"),
    )
    regs = keyed.groupBy("grp", "bucket").agg(F.max("rho").alias("rho"))
    exact = toks.groupBy("grp").agg(
        F.countDistinct("token").alias("n_exact")
    )
    est = hll_estimate_from_registers(regs, b=b)
    return (
        exact.join(est, "grp")
        .select("grp", "n_exact", "n_est")
    )


def hll_estimate_from_registers(regs: DataFrame, b: int = 9) -> DataFrame:
    """THE HLL finisher — (grp, bucket, rho) registers -> (grp, n_est)
    with the exact dyadic-integer harmonic sum, linear-counting
    branch, and 6-decimal round. The single shared implementation
    behind `hll_distinct` and the streaming register grid
    (`linkgraph.streaming.streaming_hll_registers`): both paths MUST
    produce bit-identical estimates, so the arithmetic lives once."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    sums = regs.groupBy("grp").agg(
        F.sum(F.expr(f"CAST(POW(2, {_HLL_RHO_MAX} - rho) AS BIGINT)")).alias("s"),
        F.count("*").alias("nonzero"),
    )
    est_raw = (
        F.lit(alpha) * F.lit(float(m)) * F.lit(float(m))
        * F.lit(float(1 << _HLL_RHO_MAX))
        / (F.col("s") + (F.lit(m) - F.col("nonzero"))
           * F.lit(float(1 << _HLL_RHO_MAX)))
    )
    zeros = F.lit(m) - F.col("nonzero")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.round(
        F.when((est_raw <= 2.5 * m) & (zeros > 0), F.round(linear, 7))
        .otherwise(est_raw),
        6,
    )
    return sums.select("grp", est.alias("n_est"))


def stable_hash64_sql_spark(col: str, salt) -> str:
    """The stable_hash64 expression as a Spark SQL string (for
    embedding inside generated integer expressions)."""
    return f"CAST(conv(substring(md5(concat({col}, '#{salt}')), 1, 15), 16, 10) AS BIGINT)"


def hll_distinct_sql(by: str = "lang", b: int = 9, table: str = "documents") -> str:
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    h = stable_hash64_sql("token", salt="hll")
    rho = _hll_rho_sql(f"(({h}) // {m})")
    big = float(1 << _HLL_RHO_MAX)
    return f"""
WITH toks AS (
  SELECT {by} AS grp, unnest(string_split(text, ' ')) AS token FROM {table}
), t2 AS (SELECT grp, token FROM toks WHERE length(token) > 0),
regs AS (
  SELECT grp, ({h}) % {m} AS bucket, MAX({rho}) AS rho
  FROM t2 GROUP BY 1, 2),
sums AS (
  SELECT grp, CAST(SUM(CAST(POW(2, {_HLL_RHO_MAX} - rho) AS BIGINT)) AS BIGINT) AS s,
         COUNT(*) AS nonzero
  FROM regs GROUP BY grp),
exact AS (SELECT grp, COUNT(DISTINCT token) AS n_exact FROM t2 GROUP BY grp)
SELECT e.grp AS grp, CAST(e.n_exact AS BIGINT) AS n_exact,
       ROUND(CASE WHEN (CAST({alpha!r} AS DOUBLE) * CAST({float(m)} AS DOUBLE)
                        * CAST({float(m)} AS DOUBLE) * CAST({big} AS DOUBLE)
                   / (s + ({m} - nonzero) * CAST({big} AS DOUBLE))) <= CAST({2.5 * m} AS DOUBLE)
                  AND ({m} - nonzero) > 0
             THEN ROUND(CAST({float(m)} AS DOUBLE) * LN(CAST({float(m)} AS DOUBLE) / ({m} - nonzero)), 7)
             ELSE CAST({alpha!r} AS DOUBLE) * CAST({float(m)} AS DOUBLE)
                  * CAST({float(m)} AS DOUBLE) * CAST({big} AS DOUBLE)
                  / (s + ({m} - nonzero) * CAST({big} AS DOUBLE)) END, 6) AS n_est
FROM exact e JOIN sums USING (grp)
"""


# ------------------------------------------------ length quantile sketch

def _log2_bucket_sql(x: str, max_bits: int = 31) -> str:
    """floor(log2(x+1)) via a generated integer CASE — engine-exact."""
    whens = " ".join(
        f"WHEN ({x}) < {1 << (b + 1)} THEN {b}" for b in range(max_bits)
    )
    return f"(CASE {whens} ELSE {max_bits} END)"


def length_quantiles(
    docs: DataFrame,
    by: str = "lang",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group document-length percentiles two ways: the EXACT
    order-statistic next to a log2-bucket histogram sketch's upper
    bound — the fixed-memory quantile shape for 100TB (the histogram
    is <= 32 int64 counters per group however big the group; the
    exact side exists for the comparison contract and is the only
    length-cardinality-sized aggregate).

    Quantile definition (both paths, both engines): the q-quantile is
    the smallest value v with #(len <= v) >= ceil(q * n), the
    threshold computed in the exact integer micro-domain
    ((n * round(q*1e6) + 999999) div 1e6 — float q*n can misround at
    exact-integer crossings). The sketch reports its bucket's upper
    bound 2^(b+1) - 1, so sketch >= exact and sketch < 2*exact + 2 by
    construction (pytest-pinned).

    Returns (grp, q, exact_len, sketch_hi).
    """
    lens = docs.select(
        F.col(by).alias("grp"), F.length("text").cast("long").alias("x")
    )
    per_len = lens.groupBy("grp", "x").agg(F.count("*").alias("c"))
    wcum = Window.partitionBy("grp").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_len.select(
        "grp", "x", F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(Window.partitionBy("grp")).alias("n"),
    )
    hist = lens.select("grp", F.expr(_log2_bucket_sql("x")).alias("b")).groupBy(
        "grp", "b"
    ).agg(F.count("*").alias("c"))
    hcum = hist.select(
        "grp", "b", F.sum("c").over(
            Window.partitionBy("grp").orderBy("b").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("cum"),
        F.sum("c").over(Window.partitionBy("grp")).alias("n"),
    )
    outs = []
    for q in qs:
        qk = int(round(q * 1_000_000))
        thr = F.expr(f"(n * {qk}L + 999999L) div 1000000L")
        exact = (
            cum.filter(F.col("cum") >= thr)
            .groupBy("grp")
            .agg(F.min("x").alias("exact_len"))
        )
        sk = (
            hcum.filter(F.col("cum") >= thr)
            .groupBy("grp")
            .agg(F.min("b").alias("b"))
            .select("grp", (F.pow(F.lit(2.0), F.col("b") + 1).cast("long") - 1).alias("sketch_hi"))
        )
        outs.append(
            exact.join(sk, "grp").select(
                "grp", F.lit(q).alias("q"), "exact_len", "sketch_hi"
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res


def length_quantiles_sql(
    by: str = "lang",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    table: str = "documents",
) -> str:
    bucket = _log2_bucket_sql("x")
    picks = []
    for q in qs:
        qk = int(round(q * 1_000_000))
        picks.append(f"""
SELECT c.grp AS grp, CAST({q!r} AS DOUBLE) AS q,
       MIN(c.x) AS exact_len, s.sketch_hi
FROM cum c
JOIN (SELECT grp, CAST(POW(2, MIN(b) + 1) AS BIGINT) - 1 AS sketch_hi
      FROM hcum WHERE cum >= (n * {qk} + 999999) // 1000000
      GROUP BY grp) s ON s.grp = c.grp
WHERE c.cum >= (c.n * {qk} + 999999) // 1000000
GROUP BY c.grp, s.sketch_hi""")
    return f"""
WITH lens AS (SELECT {by} AS grp, CAST(length(text) AS BIGINT) AS x FROM {table}),
per_len AS (SELECT grp, x, COUNT(*) AS c FROM lens GROUP BY 1, 2),
cum AS (SELECT grp, x,
               SUM(c) OVER (PARTITION BY grp ORDER BY x
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER (PARTITION BY grp) AS n
        FROM per_len),
hist AS (SELECT grp, {bucket} AS b, COUNT(*) AS c FROM lens GROUP BY 1, 2),
hcum AS (SELECT grp, b,
                SUM(c) OVER (PARTITION BY grp ORDER BY b
                             ROWS UNBOUNDED PRECEDING) AS cum,
                SUM(c) OVER (PARTITION BY grp) AS n
         FROM hist)
{" UNION ALL ".join(picks)}
"""


def zipf_fit(docs: DataFrame, top_ranks: int = 1000) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: least-squares regression
    of ln(freq) on ln(rank) over the ``top_ranks`` most frequent
    whitespace tokens — slope ≈ -1 is the classic Zipf signature; the
    deviation and r² are the standard corpus-health probe (a slope far
    from -1 or a poor fit flags boilerplate-heavy or templated feeds).

    Returns ONE row (n_ranks, slope, intercept, r2), floats rounded 6.

    Cross-engine exactness: ln(rank) and ln(cnt) are ROUND(ln(x), 7)
    (the rounded-ln discipline removing Java-vs-libm 1-ulp drift) then
    scaled to 1e7-integer x7/y7; every regression moment is an
    order-free INTEGER sum (squares through DECIMAL(38,0)); the
    closed-form slope/intercept/r² are shared-shape double divisions.
    DuckDB twin: `zipf_fit_sql`.

    Scale shape (100TB): the vocab_stats shuffle (one token groupBy,
    map-side combined) + a TakeOrdered of top_ranks rows; the
    regression runs over those <= top_ranks rows."""
    if top_ranks < 2:
        raise ValueError(f"top_ranks must be >= 2: got {top_ranks}")
    tok = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    top = tok.orderBy(F.desc("cnt"), F.asc("token")).limit(top_ranks)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    pts = top.withColumn("rank", F.row_number().over(w)).select(
        F.expr("CAST(ROUND(ln(CAST(rank AS DOUBLE)) * 1e7) AS BIGINT)")
        .alias("x7"),
        F.expr("CAST(ROUND(ln(CAST(cnt AS DOUBLE)) * 1e7) AS BIGINT)")
        .alias("y7"),
    )
    dec = "decimal(38,0)"
    m = pts.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x7").cast(dec).alias("sx"),
        F.sum("y7").cast(dec).alias("sy"),
        F.sum(F.col("x7").cast(dec) * F.col("x7").cast(dec)).alias("sxx"),
        F.sum(F.col("x7").cast(dec) * F.col("y7").cast(dec)).alias("sxy"),
        F.sum(F.col("y7").cast(dec) * F.col("y7").cast(dec)).alias("syy"),
    )
    n = F.col("n").cast(dec)
    cov = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = cov / varx
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double") / F.lit(1e7)
    r2 = (cov * cov) / (varx * vary)
    return m.select(
        F.col("n").alias("n_ranks"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def zipf_fit_sql(top_ranks: int = 1000) -> str:
    """DuckDB twin of `zipf_fit` (same rounded-ln integer moments and
    division shapes)."""
    return f"""
WITH tok AS (
  SELECT t AS token, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE len(t) > 0 GROUP BY t),
top AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank
        FROM (SELECT * FROM tok ORDER BY cnt DESC, token ASC
              LIMIT {int(top_ranks)})),
pts AS (SELECT
  CAST(ROUND(ln(CAST(rank AS DOUBLE)) * 1e7) AS BIGINT) AS x7,
  CAST(ROUND(ln(CAST(cnt AS DOUBLE)) * 1e7) AS BIGINT) AS y7 FROM top),
m AS (SELECT
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(x7) AS DECIMAL(38,0)) AS sx,
  CAST(SUM(y7) AS DECIMAL(38,0)) AS sy,
  CAST(SUM(CAST(x7 AS DECIMAL(38,0)) * CAST(x7 AS DECIMAL(38,0)))
       AS DECIMAL(38,0)) AS sxx,
  CAST(SUM(CAST(x7 AS DECIMAL(38,0)) * CAST(y7 AS DECIMAL(38,0)))
       AS DECIMAL(38,0)) AS sxy,
  CAST(SUM(CAST(y7 AS DECIMAL(38,0)) * CAST(y7 AS DECIMAL(38,0)))
       AS DECIMAL(38,0)) AS syy
  FROM pts)
SELECT n AS n_ranks,
  ROUND(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
        / CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE), 6)
    AS slope,
  ROUND((CAST(sy AS DOUBLE)
         - (CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
            / CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE))
           * CAST(sx AS DOUBLE))
        / CAST(n AS DOUBLE) / 1e7, 6) AS intercept,
  ROUND((CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
         * CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE))
        / (CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
           * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)), 6)
    AS r2
FROM m
"""
