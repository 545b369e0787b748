"""Trained quality classifier — full-batch logistic regression over
deterministic text statistics, the learned step of a curation
pipeline (fastText/CCNet-style quality filters — public method; the
heuristic gates live in pipeline/text.py, this module LEARNS a
weighting of the same signal family).

Training discipline (the SGNS recipe, embeddings.py:555): features
and weights live in 1e-6 integer micro-units; per epoch the logit is
an int64 dot (exact as a double below 2^53), the sigmoid is computed
once and ROUNDed to 7 decimals (absorbing any sub-1e-8 cross-engine
exp() drift), the per-row gradient coefficient is ROUND(lr*(y-σ)*1e9)
as int64, and every aggregation is an order-free int64 SUM of half-up
integer divisions — so the trained weights, per-document
probabilities and predictions are value-exact between Spark, the
unrolled DuckDB twin (``train_quality_classifier_sql``) and a pure
Python replay. The logit is clipped at ±6 (word2vec's MAX_EXP guard)
and weights clamp at ±8.0.

Features (per document, all cross-engine-exact expressions over the
``documents`` schema): bias; capped length ``least(n_chars,2000)/
2000``; space ratio; period ratio — the module is a TRAINER, the
feature list is deliberately small and legible (extend by appending
expressions to ``_FEATURES``). Weak labels come from a caller-chosen
deterministic SQL predicate (default ``lang = 'en'``) — the
distant-supervision setup of real quality classifiers.

Scale notes (100TB): one narrow pinned feature frame (docs scanned
once, text dropped after feature extraction); per epoch ONE map-side-
combinable aggregate of 4 int64 sums (the gradient) with the 4
weights broadcast as literals — no shuffle of document rows at all,
the cheapest possible distributed-training shape. Epochs are driver
rounds; the weight state is 4 numbers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CLAMP = 8_000_000  # ±8.0 in micro-units
_U = 1_000_000


def _features(length_fn: str = "length") -> list[str]:
    """Quantized feature expressions (identical text in Spark SQL and
    DuckDB): bias, capped length, space ratio, period ratio."""
    return [
        f"CAST({_U} AS BIGINT)",
        f"CAST(ROUND(LEAST(n_chars, 2000) / 2000.0 * {_U}, 0) AS BIGINT)",
        (
            f"CAST(ROUND(({length_fn}(text) - {length_fn}(replace(text, ' ', ''))) "
            f"* {_U}.0 / GREATEST({length_fn}(text), 1), 0) AS BIGINT)"
        ),
        (
            f"CAST(ROUND(({length_fn}(text) - {length_fn}(replace(text, '.', ''))) "
            f"* {_U}.0 / GREATEST({length_fn}(text), 1), 0) AS BIGINT)"
        ),
    ]


N_FEATURES = len(_features())


def halfup_div_spark_sql(num: str, den: int | str) -> str:
    """Half-up integer division, sign-correct — the SGNS rounding."""
    return (
        f"(2 * ({num}) + CASE WHEN ({num}) >= 0 THEN {den} ELSE -({den}) END) "
        f"DIV (2 * ({den}))"
    )


def _logit_sigma(wcols: list[int | str], xcols: list[str]) -> tuple[str, str]:
    """(z, sigma7) SQL snippets from weight/feature column names or
    literal micro-unit values."""
    dot = " + ".join(f"({w}) * ({x})" for w, x in zip(wcols, xcols))
    z = f"GREATEST(LEAST((0 + {dot}) / 1e12, 6.0), -6.0)"
    return z, f"ROUND(1.0 / (1.0 + exp(-({z}))), 7)"


@dataclass
class ClassifierResult:
    scores: DataFrame  # (doc_id, prob, pred)
    weights: list[float]
    epochs: int
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        from linkgraph.checkpoint import release_state

        for c in self._caches:
            release_state(c)
        self._caches = []


def train_quality_classifier(
    docs: DataFrame,
    epochs: int = 8,
    lr: float = 0.5,
    label_predicate: str = "lang = 'en'",
) -> ClassifierResult:
    """Train the logistic quality classifier (module docstring) and
    score every document. Returns (doc_id, prob, pred) plus the
    trained weights (float units). Value-exact vs
    ``train_quality_classifier_sql``."""
    from linkgraph.checkpoint import pin_table

    if epochs < 0:
        raise ValueError(f"epochs must be >= 0, got {epochs}")
    if lr <= 0 or lr > 2.0:
        raise ValueError(f"lr must be in (0, 2], got {lr}")
    feats = _features()
    xcols = [f"x{i}" for i in range(len(feats))]
    base = pin_table(
        docs.selectExpr(
            "doc_id",
            f"CAST(CASE WHEN {label_predicate} THEN 1 ELSE 0 END AS BIGINT) AS y",
            *[f"{e} AS x{i}" for i, e in enumerate(feats)],
        )
    )
    n = base.count()
    if n == 0:
        raise ValueError("cannot train on an empty document table")
    w = [0] * len(feats)  # micro-units
    lr9 = float(lr)
    for _ep in range(epochs):
        z, sig7 = _logit_sigma([str(x) for x in w], xcols)
        coef9 = f"CAST(ROUND({lr9!r} * (y - {sig7}) * 1e9, 0) AS BIGINT)"
        aggs = [
            F.expr(
                f"SUM({halfup_div_spark_sql(f'({coef9}) * {x}', 10**9)})"
            ).cast("long").alias(f"g{i}")
            for i, x in enumerate(xcols)
        ]
        g = base.agg(*aggs).first()
        w = [
            max(-_CLAMP, min(_CLAMP, wi + int_halfup(g[f"g{i}"] or 0, n)))
            for i, wi in enumerate(w)
        ]
    z, sig7 = _logit_sigma([str(x) for x in w], xcols)
    scores = base.selectExpr(
        "doc_id",
        f"ROUND({sig7}, 6) AS prob",
        f"CAST(({sig7}) >= 0.5 AS BOOLEAN) AS pred",
    )
    return ClassifierResult(
        scores=scores,
        weights=[wi / _U for wi in w],
        epochs=epochs,
        stats={"n_docs": n, "lr": lr, "label_predicate": label_predicate},
        _caches=[base],
    )


def int_halfup(num: int, den: int) -> int:
    """Python replica of ``halfup_div_spark_sql`` (den > 0): TRUNC toward zero
    of (2*num ± den) / (2*den) — Python's // floors, so negate-floor-
    negate for negative numerators."""
    q = 2 * num + (den if num >= 0 else -den)
    d = 2 * den
    return q // d if q >= 0 else -((-q) // d)


def train_quality_classifier_sql(
    epochs: int = 8,
    lr: float = 0.5,
    label_predicate: str = "lang = 'en'",
    table: str = "documents",
) -> str:
    """Oracle: the training epochs unrolled into DuckDB SQL — the same
    integer gradients, clamps and rounding as the engine."""
    if epochs < 0:
        raise ValueError(f"epochs must be >= 0, got {epochs}")
    if lr <= 0 or lr > 2.0:
        raise ValueError(f"lr must be in (0, 2], got {lr}")
    feats = _features()
    xcols = [f"x{i}" for i in range(len(feats))]
    ctes = [
        (
            f"base AS (SELECT doc_id, CAST(CASE WHEN {label_predicate} "
            "THEN 1 ELSE 0 END AS BIGINT) AS y, "
            + ", ".join(f"{e} AS x{i}" for i, e in enumerate(feats))
            + f" FROM {table})"
        ),
        "nn AS (SELECT COUNT(*) AS n FROM base)",
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0 AS BIGINT) AS w{i}" for i in range(len(feats)))
        + ")",
    ]
    # DuckDB's // floors toward -inf while Spark's DIV truncates
    # toward zero, so the twin spells the half-up division via
    # CAST(trunc(...)) (halfup_div_duck_sql) — same value on both engines.
    for e in range(epochs):
        wl = [f"w.w{i}" for i in range(len(feats))]
        z, sig7 = _logit_sigma(wl, [f"b.{x}" for x in xcols])
        coef9 = f"CAST(ROUND({float(lr)!r} * (b.y - {sig7}) * 1e9, 0) AS BIGINT)"
        gsel = ", ".join(
            f"CAST(SUM({halfup_div_duck_sql(f'({coef9}) * b.{x}', 10**9)}) AS BIGINT)"
            f" AS g{i}"
            for i, x in enumerate(xcols)
        )
        ctes.append(
            f"g{e} AS MATERIALIZED (SELECT {gsel} FROM base b, w{e} w)"
        )
        wsel = ", ".join(
            "GREATEST(LEAST(w.w{i} + {d}, {c}), -{c}) AS w{i}".format(
                i=i,
                c=_CLAMP,
                d=halfup_div_duck_sql(f"g.g{i}", "(SELECT n FROM nn)"),
            )
            for i in range(len(feats))
        )
        ctes.append(f"w{e + 1} AS MATERIALIZED (SELECT {wsel} FROM w{e} w, g{e} g)")
    wl = [f"w.w{i}" for i in range(len(feats))]
    z, sig7 = _logit_sigma(wl, [f"b.{x}" for x in xcols])
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT b.doc_id, ROUND({sig7}, 6) AS prob, "
        f"({sig7}) >= 0.5 AS pred FROM base b, w{epochs} w"
    )


def halfup_div_duck_sql(num: str, den: int | str) -> str:
    """DuckDB spelling of the half-up division — sign-split HUGEINT
    floor division (for a non-negative numerator floor == trunc, so
    this matches Spark's DIV exactly at ANY magnitude; a float-trunc
    spelling would silently lose exactness above 2^53)."""
    return (
        f"(CASE WHEN ({num}) >= 0 THEN "
        f"CAST((2 * CAST(({num}) AS HUGEINT) + ({den})) "
        f"// (2 * CAST(({den}) AS HUGEINT)) AS BIGINT) "
        f"ELSE -CAST((2 * CAST(-({num}) AS HUGEINT) + ({den})) "
        f"// (2 * CAST(({den}) AS HUGEINT)) AS BIGINT) END)"
    )


def calibration_report(
    docs: DataFrame,
    epochs: int = 8,
    lr: float = 0.5,
    label_predicate: str = "lang = 'en'",
    bins: int = 10,
) -> DataFrame:
    """Calibration report for the trained quality classifier: train,
    score, then bucket documents by predicted probability and compare
    the mean prediction against the observed label rate per bucket —
    the reliability-diagram table every deployed filter ships with.

    Returns (bin, n_docs, mean_prob, label_rate) with
    ``bin = floor(prob * bins)`` clamped to bins-1 (prob = 1.0 joins
    the top bucket); ratios rounded 6. One extra groupBy over the
    scored frame; replayed by ``calibration_report_sql``. The
    trainer's pinned feature frame rides on the returned DataFrame —
    free with ``checkpoint.release_caches`` when consumed.
    """
    from linkgraph.checkpoint import attach_caches

    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    res = train_quality_classifier(docs, epochs=epochs, lr=lr,
                                   label_predicate=label_predicate)
    labeled = docs.selectExpr(
        "doc_id",
        f"CAST(CASE WHEN {label_predicate} THEN 1 ELSE 0 END AS BIGINT) AS y",
    )
    return attach_caches(
        res.scores.join(labeled, "doc_id")
        .select(
            F.least(F.floor(F.col("prob") * bins).cast("long"),
                    F.lit(bins - 1)).alias("bin"),
            "prob", "y",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("prob"), 6).alias("mean_prob"),
            F.round(F.avg("y"), 6).alias("label_rate"),
        ),
        res._caches,
    )


def calibration_report_sql(
    epochs: int = 8,
    lr: float = 0.5,
    label_predicate: str = "lang = 'en'",
    bins: int = 10,
    table: str = "documents",
) -> str:
    """Oracle: the same bucket rollup over the unrolled training
    twin."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    return f"""
WITH scores AS ({train_quality_classifier_sql(epochs, lr, label_predicate, table)}),
lab AS (SELECT doc_id, CAST(CASE WHEN {label_predicate} THEN 1 ELSE 0 END
        AS BIGINT) AS y FROM {table})
SELECT LEAST(CAST(FLOOR(s.prob * {bins}) AS BIGINT), {bins - 1}) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(s.prob), 6) AS mean_prob,
       ROUND(AVG(y), 6) AS label_rate
FROM scores s JOIN lab ON lab.doc_id = s.doc_id
GROUP BY 1
"""
