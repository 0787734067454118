"""Distributed logistic-regression training (r9): twin parity,
hand-computed first step, and learning direction on separable data."""
from __future__ import annotations

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_classifier_train_twin_parity(spark, duck):
    """Spark's driver-looped GD equals the twin's unrolled CTE chain
    bit-for-bit — including the exact-rational features (a bare
    `/256.0` literal is DECIMAL in Spark SQL and silently truncated
    x2 to 6 digits until this test caught it)."""
    from var_elasticnet_bigdata_spark.operators.text import (
        duck_classifier_train_sql,
        train_quality_classifier,
    )

    rows = [
        (i, "hello world few tok" + "x" * (i % 7) + str(i),
         "en" if i % 3 == 0 else "de")
        for i in range(60)
    ]
    got = sorted(
        (r.pos, r.weight)
        for r in train_quality_classifier(_docs(spark, rows)).collect()
    )
    duck.execute(
        "CREATE OR REPLACE TABLE ct_docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}', '{g}')" for i, t, g in rows)
        + ") t(doc_id, text, lang)"
    )
    want = sorted(
        duck.execute(duck_classifier_train_sql(table="ct_docs")).fetchall()
    )
    assert got == want


def test_classifier_train_first_step_is_exact_rational(spark):
    """With w=0 the sigmoid is exactly 1/2, so step 1's bias gradient
    is (n/2 − n_positive) and the bias weight is the hand-computed
    rational — no libm anywhere in step 1."""
    from var_elasticnet_bigdata_spark.operators.text import (
        train_quality_classifier,
    )

    rows = [(i, "a b", "en" if i < 10 else "fr") for i in range(40)]
    w = {
        r.pos: r.weight
        for r in train_quality_classifier(
            _docs(spark, rows), steps=1, lr=0.5
        ).collect()
    }
    # g0 = sum(0.5 - y) = 40*0.5 - 10 = 10; w0 = -0.5 * 10/40 = -0.125
    assert w[0] == -0.125


def test_classifier_train_learns_separable_direction(spark):
    """On linearly separable data (en docs long, others short) the
    trained margin orders every en doc above every non-en doc."""
    from var_elasticnet_bigdata_spark.operators.text import (
        train_quality_classifier,
    )

    rows = []
    for i in range(60):
        en = i % 2 == 0
        text = " ".join("tok" for _ in range(40 if en else 4))
        rows.append((i, text, "en" if en else "zh"))
    df = _docs(spark, rows)
    w = {
        r.pos: r.weight
        for r in train_quality_classifier(df, steps=3, lr=0.5).collect()
    }
    def margin(n_tok, n_char, n_sp):
        return (
            w[0]
            + w[1] * (n_tok / 256.0)
            + w[2] * (n_char / 4096.0)
            + w[3] * (n_sp / 256.0)
        )

    long_text = " ".join("tok" for _ in range(40))
    short_text = " ".join("tok" for _ in range(4))
    m_en = margin(40, len(long_text), long_text.count(" "))
    m_zh = margin(4, len(short_text), short_text.count(" "))
    assert m_en > m_zh


def test_classifier_train_empty_corpus_friendly_error(spark):
    from var_elasticnet_bigdata_spark.operators.text import (
        train_quality_classifier,
    )

    with pytest.raises(ValueError, match="empty corpus"):
        train_quality_classifier(_docs(spark, []).filter("doc_id > 0"))
