"""Multi-iteration `kmeans_train` stress (VERDICT r6 item 8): measure
the iterate-by-refeed Lloyd loop at sf0.1 and on the 10× replica —
per-iteration wall and the convergence trace (max |Δcomponent| per
iteration) — proving the loop holds the single-step shape: each
iteration is one narrow full-corpus pass + a combinable
groupBy(cell, pos); only the (nlist × d) centroid frame ever reaches
the driver, so iteration wall should track the single-step wall and
the trace should be monotone-ish toward the tol floor.

    python tools/stress_kmeans.py [k] [iters] [nlist]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace(df, nlist: int, iters: int) -> list[dict]:
    import numpy as np

    from var_elasticnet_bigdata_spark.operators.similarity import (
        kmeans_refine,
        seed_centroids,
    )

    C = seed_centroids(df, nlist)
    out = []
    for it in range(iters):
        t0 = time.time()
        rows = kmeans_refine(df, nlist, centroids=C).collect()
        C_new = C.copy()
        for r in rows:
            C_new[r["cell"], r["pos"]] = r["c"]
        delta = float(np.max(np.abs(C_new - C)))
        C = C_new
        out.append(
            {"iter": it + 1, "sec": round(time.time() - t0, 2),
             "max_delta": round(delta, 8)}
        )
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from tools.stress_scale import SRC, build_replica

    from var_elasticnet_bigdata_spark.session import get_spark
    from var_elasticnet_bigdata_spark.sources import load_table

    replica = build_replica(k)
    spark = get_spark("stress-kmeans")
    spark.sparkContext.setLogLevel("ERROR")
    # Arrow/JIT warm
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).write.format("noop").mode("overwrite").save()

    res = {}
    for label, d in (("sf0.1", SRC), (f"x{k}", replica)):
        emb = load_table(spark, d, "embeddings")
        emb.write.format("noop").mode("overwrite").save()  # page-cache warm
        res[label] = trace(emb, nlist, iters)
    print(json.dumps({"nlist": nlist, "k": k, "trace": res}))


if __name__ == "__main__":
    main()
