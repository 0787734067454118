"""The plan-audit tool's detectors must actually catch scale-killers
(a sweep that can't fail is decoration): negative tests for each rule
plus a clean-pass check on a representative production query."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools.plan_audit import audit
from var_elasticnet_bigdata_spark import queries as Q
from var_elasticnet_bigdata_spark.sources import load_table

from .conftest import SF_ORACLE


def test_detects_global_window(spark):
    c = load_table(spark, SF_ORACLE, "customer")
    bad = c.withColumn("rn", F.row_number().over(Window.orderBy("c_custkey")))
    violations, _ = audit("not_allowed", bad)
    assert any("un-partitioned Window" in v for v in violations)


def test_partitioned_windows_pass(spark):
    c = load_table(spark, SF_ORACLE, "customer")
    g1 = c.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("c_mktsegment").orderBy("c_custkey")
        ),
    )
    assert audit("x", g1) == ([], [])
    g2 = c.withColumn(
        "mn", F.min("c_acctbal").over(Window.partitionBy("c_mktsegment"))
    )
    assert audit("x", g2) == ([], [])


def test_detects_cartesian_product(spark):
    c = load_table(spark, SF_ORACLE, "customer")
    n = load_table(spark, SF_ORACLE, "nation").hint("shuffle_replicate_nl")
    violations, _ = audit("x", c.crossJoin(n))
    assert any("CartesianProduct" in v for v in violations)


def test_detects_python_udf(spark):
    from pyspark.sql.functions import udf

    c = load_table(spark, SF_ORACLE, "customer")
    f = udf(lambda x: x + 1)
    violations, _ = audit("x", c.select(f("c_custkey")))
    assert any("BatchEvalPython" in v for v in violations)


def test_production_queries_sample_clean(spark):
    for name in ("w1_diff", "dedup_ngram_jaccard", "pipeline_corpus_curation"):
        df = Q.QUERIES[name](spark, SF_ORACLE)
        violations, _ = audit(name, df)
        assert violations == [], (name, violations)


def test_stress_family_subset_of_registry():
    """Every stress-harness query name must exist in the registry —
    a rename can't silently turn a SCALING.md row into a no-op."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.stress_scale import FAMILY

    from var_elasticnet_bigdata_spark.queries import QUERIES

    missing = [q for q in FAMILY if q not in QUERIES]
    assert not missing, missing
