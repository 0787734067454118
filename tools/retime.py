"""Clean-session re-time of specific queries: bench.py's warmups +
3-run medians, for only the queries named on the CLI — the tool the
pin discipline uses when a query needs a (re-)pin without paying a
full 140-query bench session.

    python tools/retime.py text_kn_perplexity [more...]

Prints one JSON line {query: median_sec} plus per-query spread.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: retime.py <query> [query...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from var_elasticnet_bigdata_spark import queries as Q
    from var_elasticnet_bigdata_spark.session import get_spark
    from var_elasticnet_bigdata_spark.sources import load_table

    spark = get_spark("retime")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's warmup set, abbreviated: JVM/codegen + Arrow pools +
    # page cache for the tables the named queries touch
    Q.flagship_quarterly_revenue_growth(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).write.format("noop").mode("overwrite").save()
    tiny = spark.createDataFrame([(1, 1.0)], "k int, v double")
    tiny.groupBy("k").applyInPandas(
        lambda pdf: pdf, "k int, v double"
    ).write.format("noop").mode("overwrite").save()
    for t in ("documents", "embeddings", "events"):
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()
    Q.QUERIES["w4_lag_embed"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    out, spread = {}, {}
    for name in names:
        samples = []
        for _ in range(runs):
            t0 = time.time()
            Q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        samples.sort()
        out[name] = samples[len(samples) // 2]
        spread[name] = [samples[0], samples[-1]]
    print(json.dumps({"sf_dir": sf_dir, "medians": out, "spread": spread}))


if __name__ == "__main__":
    main()
