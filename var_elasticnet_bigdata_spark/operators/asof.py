"""Scale-correct as-of (last-observation temporal) join.

The reference aligns series on exact shared dates with ``merge.zoo``
(Main.R:96 — J1, `operators/timeseries.align_join`); an as-of join is
the generalization a time-series engine needs when the two clocks
don't tick together (trade/quote, event/feature-snapshot, sensor
alignment). Spark has no built-in, and the naive formulation — a
range join followed by a per-row argmax — degenerates into a
cartesian range explosion that AQE cannot save at scale.

This operator uses the union-merge formulation instead: tag both
sides, union them on the shared key space, and run ONE window pass
per key ordered by event time in which every left row picks up the
most recent right-side payload via ``last(..., ignorenulls=True)``.
Cost: a single hash-partition shuffle on the join keys plus a per-key
sort — the exact plan shape of a sort-merge join, with zero payload
duplication. At 100 TB it parallelizes by key like every other
window operator in this package; skewed keys are handled by AQE the
same way a sort-merge join's would be.

Semantics match ``pandas.merge_asof`` (inclusive match, backward /
forward directions, optional tolerance), which the tests use as the
local oracle; the declared query `j2_asof_join` is hash-checked
against DuckDB's native ``ASOF JOIN``.

Determinism: if several right rows share the same (key, timestamp)
the winner is sort-order dependent. Pre-deduplicate the right side
(e.g. keep the max sequence number per (key, ts)) when that can
happen; the driver-gate query's right side is proven tie-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_ISL = "__asof_is_left"
_PKT = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    how: str = "left",
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    largest ``right_ts <= left_ts`` (``direction="backward"``) or the
    smallest ``right_ts >= left_ts`` (``"forward"``) within the same
    ``on`` key group.

    ``tolerance`` (same units as ``ts`` after a double cast — seconds
    for timestamps) discards matches further away than the bound.
    ``how="left"`` keeps unmatched left rows with NULL payloads;
    ``"inner"`` drops them. Right-side columns whose names collide
    with left-side ones are renamed with ``suffix``; the matched
    right timestamp is always emitted as ``{right_ts}{suffix}``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts

    reserved = {_TS, _ISL, _PKT}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"inputs may not contain reserved columns {sorted(clash)}")

    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rtypes = {f.name: f.dataType for f in right.schema.fields}

    def _family(dt) -> str:
        n = type(dt).__name__
        if n in ("ByteType", "ShortType", "IntegerType", "LongType",
                 "FloatType", "DoubleType", "DecimalType"):
            return "numeric"
        if n in ("TimestampType", "TimestampNTZType", "DateType"):
            return "datetime"
        return n

    # the right side is cast to the left's key/ts types below; a cast
    # ACROSS type families yields NULLs silently (every row unmatched)
    # instead of an error — refuse it here
    for k, lt in [(k, ltypes[k]) for k in keys] + [(rts, ltypes[left_ts])]:
        rt = rtypes[k if k != rts else rts]
        if _family(rt) != _family(lt):
            raise ValueError(
                f"incompatible join column types for {k!r}: left "
                f"{lt.simpleString()} vs right {rt.simpleString()} — the "
                "implicit cast would null out every right row"
            )
    lpay = [c for c in left.columns if c not in keys and c != left_ts]
    rpay = [c for c in right.columns if c not in keys and c != rts]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rpay}
    rts_out = rts + suffix
    outs = [rts_out, *out_names.values()]
    if len(set(outs)) != len(outs) or set(outs) & set(left.columns):
        raise ValueError(
            f"output name collision after suffixing with {suffix!r}: "
            f"{sorted(outs)} vs left columns {sorted(left.columns)}"
        )

    # the matched right row travels as ONE struct so every payload
    # column (and the matched ts) comes from the SAME row — per-column
    # last(ignorenulls) would stitch values from different rows
    # whenever a right payload value is NULL
    pkt = F.struct(
        F.col(rts).alias("__rts"),
        *[F.col(c).alias(out_names[c]) for c in rpay],
    )
    pkt_type = right.select(pkt.alias(_PKT)).schema[0].dataType

    lrows = left.select(
        *keys,
        F.col(left_ts).alias(_TS),
        F.lit(True).alias(_ISL),
        *[F.col(c) for c in lpay],
        F.lit(None).cast(pkt_type).alias(_PKT),
    )
    # a right row with a NULL timestamp can never be the most-recent
    # (or next) observation — keeping it would let the window attach
    # it as a fabricated match under NULLS FIRST/LAST ordering
    rrows = right.filter(F.col(rts).isNotNull()).select(
        *[F.col(k).cast(ltypes[k]).alias(k) for k in keys],
        F.col(rts).cast(ltypes[left_ts]).alias(_TS),
        F.lit(False).alias(_ISL),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lpay],
        pkt.alias(_PKT),
    )

    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    # right rows sort before left rows at equal ts → inclusive match,
    # in BOTH directions (merge_asof semantics).
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col(_ISL).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    # a left row with a NULL timestamp has no as-of position — force
    # its match to NULL (under forward/desc ordering NULLS sort last
    # and would otherwise accumulate an arbitrary packet)
    res = lrows.unionByName(rrows).select(
        *keys,
        F.col(_TS),
        F.col(_ISL),
        *[F.col(c) for c in lpay],
        F.when(
            F.col(_TS).isNotNull(),
            F.last(_PKT, ignorenulls=True).over(w),
        ).alias(_PKT),
    ).filter(F.col(_ISL))

    if tolerance is not None:
        from pyspark.sql.types import TimestampNTZType

        def _secs(c):
            # TIMESTAMP_NTZ has no direct double cast (same workaround
            # as rangejoin.py) — route through TIMESTAMP first
            if isinstance(ltypes[left_ts], TimestampNTZType):
                c = c.cast("timestamp")
            return c.cast("double")

        gap = F.abs(_secs(F.col(_TS)) - _secs(F.col(f"{_PKT}.__rts")))
        ok = F.col(_PKT).isNotNull() & (gap <= F.lit(float(tolerance)))
        res = res.select(
            *keys, _TS, _ISL, *lpay, F.when(ok, F.col(_PKT)).alias(_PKT)
        )

    if how == "inner":
        res = res.filter(F.col(_PKT).isNotNull())

    return res.select(
        *keys,
        F.col(_TS).alias(left_ts),
        *lpay,
        F.col(f"{_PKT}.__rts").alias(rts_out),
        *[F.col(f"{_PKT}.{out_names[c]}").alias(out_names[c]) for c in rpay],
    )
