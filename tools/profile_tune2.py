"""r10 drift decomposition: phase-times ml_tune_best the way
retime.py measures it (clearCache between runs), separating the
shared-frame rebuild cost from the grid work."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from var_elasticnet_bigdata_spark.session import get_spark  # noqa: E402
from var_elasticnet_bigdata_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.time()
    r = fn()
    print(f"{label}: {time.time() - t0:.3f}s", flush=True)
    return r


def main() -> None:
    spark = get_spark("profile_tune2")
    spark.sparkContext.setLogLevel("ERROR")
    Q.flagship_quarterly_revenue_growth(spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).write.format("noop").mode("overwrite").save()
    Q.QUERIES["w4_lag_embed"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    for rep in range(3):
        wide = Q._quarterly_pair(spark, SF)
        print("storageLevel:", wide.storageLevel, flush=True)
        t(f"rep{rep} quarterly_pair count", lambda: wide.count())
        t(f"rep{rep} quarterly_pair count AGAIN", lambda: wide.count())
        t(
            f"rep{rep} ml_tune_best (frame warm)",
            lambda: Q.QUERIES["ml_tune_best"](spark, SF)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        spark.catalog.clearCache()
        t(
            f"rep{rep} ml_tune_best (cold, retime-style)",
            lambda: Q.QUERIES["ml_tune_best"](spark, SF)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
