"""Sampled-audit growth measurement (VERDICT r8 item 4's SCALING row):
time the IVF-PQ recall audit at 1x and 10x corpus, full
(sample_mod=1) vs sampled (sample_mod=4), on the SAME planted corpus
the gated `ann_ivfpq_recall` query audits. The claim to verify: the
audit's corpus-growing cost is the exact arm (corpus x n_probes, and
probes grow with the corpus under probe_mod), and probe sampling caps
that multiplier — the knob that keeps the audit affordable at 100x.

The audit runs in SERVING form (the pinned ivfpq artifacts, via the
r9 centroids/codebook passthrough): with in-query Lloyd training in
the loop, training cost dominates both modes at local scales and
masks the exact-arm saving this tool exists to measure (measured
before the passthrough: 44.9 s full vs 43.0 s sampled at x10 — a
train-dominated non-result).

    python tools/audit_sampling_scale.py [k] [sample_mod]

Reuses stress_scale's replica builder (exact-copy x k with shifted
ids). Prints one JSON line: wall seconds and probe counts per
(scale, mode), plus the sampled-vs-full recall agreement at both
scales.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.stress_scale import SRC, build_replica  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sample_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    probe_mod = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    import numpy as np

    from var_elasticnet_bigdata_spark.operators.similarity import (
        ivfpq_recall_top1,
    )
    from var_elasticnet_bigdata_spark.queries import _planted_embeddings
    from var_elasticnet_bigdata_spark.session import get_spark

    art_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "var_elasticnet_bigdata_spark", "pinned", "ivfpq_artifacts.json",
    )
    art = json.load(open(art_path))
    centroids = np.array(art["centroids"], dtype=np.float64)
    codebook = np.array(art["codebook"], dtype=np.float64)

    replica = build_replica(k)
    spark = get_spark("audit-sampling-scale")
    spark.sparkContext.setLogLevel("ERROR")
    # warm Arrow pools untimed (stress_scale's pattern)
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).count()

    out: dict[str, dict] = {}
    for label, sf_dir in (("1x", SRC), (f"x{k}", replica)):
        out[label] = {}
        for mode, sm in (("full", 1), (f"sampled_{sample_mod}", sample_mod)):
            t0 = time.time()
            rows = ivfpq_recall_top1(
                _planted_embeddings(spark, sf_dir),
                nlist=16, m=4, k=16, nprobe=2, probe_mod=probe_mod,
                max_probes=65536, sample_mod=sm,
                centroids=centroids, codebook=codebook,
            ).select("qid", "hit").collect()
            wall = round(time.time() - t0, 2)
            n = len(rows)
            recall = round(sum(r["hit"] for r in rows) / max(n, 1), 4)
            out[label][mode] = {
                "wall_sec": wall, "n_probes": n, "recall": recall,
            }
            spark.catalog.clearCache()

    print(json.dumps({"k": k, "sample_mod": sample_mod, "probe_mod": probe_mod, "runs": out}))
    f1, s1 = out["1x"]["full"], out["1x"][f"sampled_{sample_mod}"]
    fk, sk = out[f"x{k}"]["full"], out[f"x{k}"][f"sampled_{sample_mod}"]
    print(
        f"full:    {f1['wall_sec']:7.2f}s ({f1['n_probes']} probes) -> "
        f"{fk['wall_sec']:7.2f}s ({fk['n_probes']} probes)  "
        f"({fk['wall_sec'] / max(f1['wall_sec'], 0.01):.1f}x)"
    )
    print(
        f"sampled: {s1['wall_sec']:7.2f}s ({s1['n_probes']} probes) -> "
        f"{sk['wall_sec']:7.2f}s ({sk['n_probes']} probes)  "
        f"({sk['wall_sec'] / max(s1['wall_sec'], 0.01):.1f}x)"
    )
    print(
        f"recall full vs sampled: 1x {f1['recall']} vs {s1['recall']}, "
        f"x{k} {fk['recall']} vs {sk['recall']}"
    )


if __name__ == "__main__":
    main()
