"""var_elasticnet_bigdata_spark — a PySpark-native analytics engine.

A from-scratch Spark-first re-expression of the capabilities of the
reference project ``Gotcha17/VAR_ElasticNet_BigData`` (an R seminar
project forecasting US GDP growth from 146 FRED monthly series with
VAR + elastic-net shrinkage, evaluated by rolling-origin
pseudo-out-of-sample experiments).

Everything is built on the public PySpark DataFrame/SQL API:

- ``sources``    — parquet scans of the canonical tables, schema registry
- ``operators``  — relational + time-series operators (diffs, lag
                   embedding, ACF, roll-ups, top-N, dedup, similarity,
                   text analysis, multimodal plumbing)
- ``functions``  — statistical functions (Newey-West, Clark-West,
                   Diebold-Mariano, Ljung-Box, ADF)
- ``ml``         — elastic-net VAR estimation (Gram-matrix distributed
                   path + local pathwise coordinate descent), IC,
                   variable/lag selection, rolling-origin tuning
- ``harness``    — the rolling-origin OOS evaluation pipeline
                   (the reference's ``modeltrain``)
- ``streaming``  — Structured Streaming ingestion of the events table
- ``plans``      — plan inspection / explain helpers

Design notes (100 TB-readiness) live in each module's docstring; the
operator inventory they implement is SURVEY.md §2.
"""

import os as _os

# single-threaded BLAS per worker (see session.py): must be set
# before numpy initializes in any process importing the package
for _v in (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
):
    _os.environ.setdefault(_v, "1")

__version__ = "0.1.0"
