"""Registry-wide GATE-SHAPE guard (VERDICT r6 item 2): the driver's
correctness canonicalizer sorts raw result columns, which crashes on
unhashable complex values — `ann_pq_encode`'s `codes array<int>`
column shipped driver-red in r6 exactly this way while the local
checker's object-column stringify masked it. Every gated query must
therefore emit ONLY scalar (atomic) columns; complex library outputs
(code arrays, signature arrays) flatten to scalar columns inside the
gated query, keeping the richer shape for the library API.

Built at sf0.001 — schemas don't depend on scale, and the eager
driver-side fits some queries run at plan-construction time are
cheapest there.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from pyspark.sql.types import ArrayType, MapType, StructType

from tests.conftest import SF_SMALL


def test_no_complex_typed_output_columns(spark, monkeypatch):
    from var_elasticnet_bigdata_spark import queries as Q

    monkeypatch.setenv("SPARK_GRAFT_NO_STAGED_CACHE", "1")
    bad: dict[str, list[str]] = {}
    for name, fn in sorted(Q.QUERIES.items()):
        spark.catalog.clearCache()
        df = fn(spark, SF_SMALL)
        complex_cols = [
            f"{f.name}: {f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, (
        "gated queries must emit only scalar columns (the driver "
        f"canonicalizer cannot hash complex values): {bad}"
    )
