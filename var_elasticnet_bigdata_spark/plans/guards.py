"""Driver-materialization guards.

A handful of operators deliberately collect a DataFrame to the driver
— the rolling-origin tuner's embedded estimation frame (post-
aggregation, ~hundreds of rows), ezlasso's frame, and the EXACT
cosine paths that broadcast the whole corpus. Those docstrings claim
"the frontier is small"; these guards make the claim enforced: a
mis-use at 100 TB scale fails fast with a pointer to the scale path
instead of OOMing the driver (VERDICT r1 item 7).

The ceiling is configurable per call or globally via the
``SPARK_GRAFT_MAX_DRIVER_ROWS`` environment variable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

DEFAULT_MAX_DRIVER_ROWS = 2_000_000


class DriverMaterializationError(RuntimeError):
    """Raised when a driver-side collect would exceed the ceiling."""


def max_driver_rows() -> int:
    v = os.environ.get("SPARK_GRAFT_MAX_DRIVER_ROWS")
    return int(v) if v else DEFAULT_MAX_DRIVER_ROWS


def guard_driver_collect(
    df: DataFrame,
    what: str,
    scale_path: str,
    max_rows: int | None = None,
) -> None:
    """Fail fast if ``df`` has more than ``max_rows`` rows.

    Uses ``limit(n+1).count()`` so the check never scans past the
    ceiling. ``what`` names the collect site; ``scale_path`` tells
    the caller which distributed alternative to use instead.
    """
    limit = max_rows if max_rows is not None else max_driver_rows()
    n = df.limit(limit + 1).count()
    if n > limit:
        raise DriverMaterializationError(
            f"{what} would materialize more than {limit:,} rows on the "
            f"driver. This path is for post-aggregation estimation "
            f"frontiers; at this size use {scale_path}, or raise "
            f"SPARK_GRAFT_MAX_DRIVER_ROWS explicitly."
        )


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the executor-storage blocks behind a ``localCheckpoint``-ed
    DataFrame (ADVICE r3: iterative operators that checkpoint each
    round would otherwise accumulate every round's blocks for the
    session lifetime — ``DataFrame.unpersist()`` is a no-op for
    checkpoint blocks because they bypass the cache manager).

    The frame's analyzed plan is a ``LogicalRDD`` holding the
    checkpointed RDD; unpersisting THAT RDD drops its blocks. The
    frame must not be read again afterwards (the blocks are gone, by
    design). Best-effort: any reflection failure on a future Spark
    version degrades to the old keep-until-session-end behavior
    rather than breaking the operator.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # pragma: no cover - version-drift fallback
        pass
