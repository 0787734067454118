"""Cell-budget stress for the incremental SemDeDup store (VERDICT r6
item 5): `dedup_semantic_incremental` grew 3.4× at 10× with nlist
FIXED at 16 — per-cell occupancy grows 10×, so the in-cell pair
verification does 100× work. The operator's contract says: size
nlist with `kmeans_train` so cells hold ~constant occupancy. This
measures exactly that: the 2-batch incremental flow at sf0.1/nlist=16
vs the 10× replica at BOTH nlist=16 (the uncontrolled shape) and
nlist=160 (occupancy held constant), showing the growth is
cell-budget-controlled, not intrinsic.

    python tools/stress_semantic_store.py [k]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_flow(spark, emb, nlist: int, label: str) -> float:
    from pyspark.sql import functions as F

    from var_elasticnet_bigdata_spark.operators.similarity import (
        incremental_semantic_dedup_bucketed,
        seed_centroids,
    )

    store = f"stress_sem_{label}".replace(".", "_")
    spark.sql(f"DROP TABLE IF EXISTS {store}__vecs")
    path = tempfile.mkdtemp(prefix="stress_sem_store_")
    try:
        mid = [r[0] for r in emb.selectExpr(
            "percentile_approx(vec_id, 0.5)").collect()][0]
        C = seed_centroids(emb, nlist)
        t0 = time.time()
        s1 = incremental_semantic_dedup_bucketed(
            emb.filter(F.col("vec_id") < mid), store, C, eps=0.4,
            buckets=32, path=path,
        )
        s1.write.format("noop").mode("overwrite").save()
        s2 = incremental_semantic_dedup_bucketed(
            emb.filter(F.col("vec_id") >= mid), store, C, eps=0.4,
            buckets=32, path=path,
        )
        s2.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {store}__vecs")
        shutil.rmtree(path, ignore_errors=True)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from tools.stress_scale import SRC, build_replica

    from var_elasticnet_bigdata_spark.session import get_spark
    from var_elasticnet_bigdata_spark.sources import load_table

    replica = build_replica(k)
    spark = get_spark("stress-sem-store")
    spark.sparkContext.setLogLevel("ERROR")
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).write.format("noop").mode("overwrite").save()

    emb1 = load_table(spark, SRC, "embeddings")
    embk = load_table(spark, replica, "embeddings")
    for e in (emb1, embk):
        e.write.format("noop").mode("overwrite").save()
    out = {
        "sf0.1_nlist16": run_flow(spark, emb1, 16, "base16"),
        f"x{k}_nlist16_uncontrolled": run_flow(spark, embk, 16, "big16"),
        f"x{k}_nlist{16 * k}_budgeted": run_flow(
            spark, embk, 16 * k, f"big{16 * k}"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
