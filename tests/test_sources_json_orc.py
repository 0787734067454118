"""JSON-lines and ORC source/sink round trips — the remaining
built-in formats beyond parquet/CSV/Excel covered elsewhere. Both are
exercised write→read with schema pinned (JSON) and pushdown asserted
(ORC supports predicate pushdown like parquet)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    from var_elasticnet_bigdata_spark.sources import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents")


def test_jsonl_round_trip(spark, tmp_path):
    p = str(tmp_path / "docs_jsonl")
    src = _docs(spark)
    src.write.mode("overwrite").json(p)
    # explicit schema: JSON inference would widen ints and reorder
    back = spark.read.schema(src.schema).json(p)
    assert back.schema == src.schema
    assert back.count() == src.count()
    assert src.exceptAll(back).count() == 0


def test_jsonl_handles_corrupt_lines(spark, tmp_path):
    import os

    p = str(tmp_path / "bad_jsonl")
    os.makedirs(p)
    with open(p + "/part-0.json", "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write("THIS IS NOT JSON\n")
        f.write('{"doc_id": 2, "text": "also ok"}\n')
    df = spark.read.schema(
        "doc_id long, text string, _corrupt_record string"
    ).json(p)
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.doc_id for r in good} == {1, 2}
    assert len(bad) == 1  # PERMISSIVE mode keeps, not kills, the task


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    p = str(tmp_path / "docs_orc")
    src = _docs(spark)
    src.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert back.count() == src.count()
    assert src.exceptAll(back).count() == 0
    filtered = back.filter(F.col("doc_id") < 10).select("doc_id", "lang")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(doc_id,10)" in plan
    # column pruning reaches the scan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan
