"""One-off r10 profiling harness for the tuner-family drift
(VERDICT r9 next-round item 1): counts Spark jobs and phase times of
ml_tune_best / ml_tune_ridge / ml_lag_select / ml_acf_selection in a
warmed session, so the many-small-jobs hypothesis is measured, not
guessed."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from var_elasticnet_bigdata_spark.session import get_spark  # noqa: E402
from var_elasticnet_bigdata_spark import queries as Q  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NAMES = sys.argv[2:] or [
    "ml_tune_best",
    "ml_tune_ridge",
    "ml_lag_select",
    "ml_acf_selection",
]


def main() -> None:
    spark = get_spark("profile_tune")
    st = spark.sparkContext.statusTracker()

    # warm the shared frames + executors the way bench.py's suite does
    Q.QUERIES["ml_enet_var_coefs"](spark, SF).collect()

    for name in NAMES:
        fn = Q.QUERIES[name]
        for rep in range(3):
            j0 = max(st.getJobIdsForGroup() or [0])
            ids0 = set(st.getJobIdsForGroup())
            t0 = time.time()
            fn(spark, SF).collect()
            dt = time.time() - t0
            jobs = [j for j in st.getJobIdsForGroup() if j > j0]
            print(
                f"{name} rep{rep}: {dt:.2f}s  jobs={len(jobs)}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
