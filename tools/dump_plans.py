"""Dump ``explain("formatted")`` for named queries to files —
the before/after plan evidence the optimization rounds commit under
``plans/rNN/``.

    python tools/dump_plans.py <outdir> <suffix> <query> [more...]

Writes ``<outdir>/<query>_<suffix>.txt``. Plans are built in the
canonical uncached mode (SPARK_GRAFT_NO_STAGED_CACHE=1) so staged
persists don't hide subtree structure, at sf0.01 (plan shape is
scale-free; some query plans execute driver-side fits at build time,
and sf0.01 keeps that cheap).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# default: canonical uncached shape. SPARK_GRAFT_DUMP_CACHED=1 keeps
# the staged persists live instead — the mode the bench executes in,
# which is where staged-reuse optimizations (normalize-once etc.) are
# visible as InMemoryTableScan nodes replacing repeated subtrees.
if not os.environ.get("SPARK_GRAFT_DUMP_CACHED"):
    os.environ.setdefault("SPARK_GRAFT_NO_STAGED_CACHE", "1")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from var_elasticnet_bigdata_spark import queries as Q
    from var_elasticnet_bigdata_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = Q.QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
