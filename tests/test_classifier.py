"""Logistic quality classifier: DuckDB twin exactness, separable-data
accuracy, zero-epoch baseline, parameter guards."""

import duckdb
import pytest

from linkgraph.pipeline.classifier import (
    train_quality_classifier,
    train_quality_classifier_sql,
)

# long docs (many periods+spaces) labelled by length; clearly separable
DOCS = [
    (i,
     ("the quick brown fox. " * (2 + 8 * (i % 2)))[: 40 + 300 * (i % 2)],
     "en" if i % 2 else "de",
     f"src{i % 3}")
    for i in range(40)
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {t!r}, '{lg}', '{s}', {len(t)})" for i, t, lg, s in DOCS
        )
        + ") t(doc_id, text, lang, source, n_chars)"
    )
    return con


def test_duckdb_twin_exact(spark):
    res = train_quality_classifier(_docs(spark), epochs=6, lr=0.5)
    got = sorted(map(tuple, res.scores.collect()))
    res.release()
    want = sorted(map(tuple, _duck().execute(
        train_quality_classifier_sql(epochs=6, lr=0.5)
    ).fetchall()))
    assert got == want


def test_separable_labels_learned(spark):
    res = train_quality_classifier(_docs(spark), epochs=12, lr=1.0)
    rows = res.scores.collect()
    res.release()
    acc = sum((r["pred"] is True) == (r["doc_id"] % 2 == 1) for r in rows) / len(rows)
    assert acc >= 0.9
    assert len(res.weights) == 4 and any(w != 0 for w in res.weights)


def test_zero_epochs_is_coin_flip(spark):
    res = train_quality_classifier(_docs(spark), epochs=0)
    rows = res.scores.collect()
    res.release()
    assert all(r["prob"] == 0.5 for r in rows)
    assert res.weights == [0.0] * 4


def test_bad_params(spark):
    d = _docs(spark)
    with pytest.raises(ValueError):
        train_quality_classifier(d, epochs=-1)
    with pytest.raises(ValueError):
        train_quality_classifier(d, lr=0.0)
    with pytest.raises(ValueError):
        train_quality_classifier_sql(lr=3.0)
    with pytest.raises(ValueError):
        train_quality_classifier(d.filter("doc_id < 0"))


def test_calibration_report_twin_and_mass(spark):
    from linkgraph.pipeline.classifier import (
        calibration_report,
        calibration_report_sql,
    )

    rep = calibration_report(_docs(spark), epochs=6, lr=0.5, bins=5)
    rows = rep.collect()
    assert sum(r["n_docs"] for r in rows) == len(DOCS)
    assert all(0 <= r["bin"] < 5 for r in rows)
    got = sorted(map(tuple, rows))
    want = sorted(map(tuple, _duck().execute(
        calibration_report_sql(epochs=6, lr=0.5, bins=5)
    ).fetchall()))
    assert got == want
    import pytest as _pytest
    with _pytest.raises(ValueError):
        calibration_report(_docs(spark), bins=1)
