"""Stream-stream event-time interval join (keyed attribution).

The batch engine's as-of/range joins (`operators/asof.py`,
`operators/rangejoin.py`) have a streaming counterpart: attribute
each purchase to the clicks of the same user within a lookback
window, computed continuously. Structured Streaming supports this as
a stream-stream inner join PROVIDED the join condition bounds event
time on both sides and both sides carry watermarks — that is what
lets the state store evict: a buffered click can be dropped once the
watermark passes ``click_ts + lookback`` because no future purchase
can match it. Without the time bound the state grows without limit;
with it, state size is O(events within the watermark horizon), not
O(stream length).

The SAME builder serves batch and stream (watermarks are applied only
when the input is streaming), so the tests can assert
stream-under-availableNow ≡ batch, and the batch form is hash-gated
against DuckDB (`j5_interval_attribution`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_click_attribution(
    events: DataFrame,
    lookback_minutes: int = 360,
    watermark: str = "2 hours",
) -> DataFrame:
    """Rows ``(purchase_id, user_id, p_ts, click_id, c_ts)`` — one per
    (purchase, prior-click-within-lookback) pair for the same user.
    ``events`` may be a batch frame or a stream from
    ``stream_events``; the join condition is identical."""
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    if events.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.col("c_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {int(lookback_minutes)} MINUTES")
        )
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", "user_id", "p_ts", "click_id", "c_ts"
    )
