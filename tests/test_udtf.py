"""Python UDTF surface (SURVEY §2.10 category list): registered
table functions usable standalone and in LATERAL joins.

UDTFs are the escape hatch for row→rows expansions that built-in
generators can't express; the engine's production paths never need
one (explode/posexplode + HOFs cover every §2 operator), so this is a
category-coverage demonstration, kept OUT of hot paths — plan-audit's
BatchEvalPython rule does not apply to declared queries because no
declared query uses a UDTF."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, tok string")
class _Tokenize:
    def eval(self, text: str):
        for i, t in enumerate((text or "").split()):
            yield i, t


def test_udtf_standalone_and_lateral(spark):
    spark.udtf.register("tokenize_udtf", _Tokenize)
    out = spark.sql("SELECT * FROM tokenize_udtf('a b c')").collect()
    assert [(r.pos, r.tok) for r in out] == [(0, "a"), (1, "b"), (2, "c")]

    spark.createDataFrame(
        [(1, "x y"), (2, "z"), (3, None)], "id long, text string"
    ).createOrReplaceTempView("udtf_tv")
    rows = spark.sql(
        "SELECT id, t.pos, t.tok FROM udtf_tv, LATERAL tokenize_udtf(text) AS t"
        " ORDER BY id, pos"
    ).collect()
    assert [(r.id, r.pos, r.tok) for r in rows] == [
        (1, 0, "x"),
        (1, 1, "y"),
        (2, 0, "z"),
    ]


def test_udtf_equivalent_native_form(spark):
    """The same expansion stays JVM-side with posexplode(split()) —
    the form production paths use; UDTF output must agree."""
    spark.udtf.register("tokenize_udtf2", _Tokenize)
    spark.createDataFrame(
        [(1, "a b"), (2, "c d e")], "id long, text string"
    ).createOrReplaceTempView("udtf_tv2")
    via_udtf = spark.sql(
        "SELECT id, t.pos, t.tok FROM udtf_tv2, LATERAL tokenize_udtf2(text) AS t"
    ).collect()
    native = spark.sql(
        "SELECT id, posexplode(split(text, ' ')) AS (pos, tok) FROM udtf_tv2"
    ).collect()
    assert sorted(map(tuple, via_udtf)) == sorted(map(tuple, native))
