"""Watermarked stream-stream interval join: click -> purchase attribution.

The missing quadrant of the streaming family (windows/sessions/state/
sinks are covered elsewhere): joining two UNBOUNDED sides. Spark buffers
both sides in join state; what makes that bounded is the pair of
constraints expressed here — an event-time interval on the join condition
(a purchase only matches clicks at most ``horizon`` before it) plus
watermarks on both sides, which together let the engine evict any
buffered row older than watermark - horizon. Without either constraint a
stream-stream join grows state forever — this operator always declares
both.

The batch twin (`attribute_purchases` over static frames — same function,
Spark compiles it to an ordinary join) is the correctness oracle: the
test drives the streaming form microbatch-by-microbatch and asserts the
result set equals the batch run, and the `click_attribution` registry
query hash-checks the batch form against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(user_id, click_id, purchase_id, click_ts, purchase_ts, value):
    every purchase joined to each of the user's clicks in the preceding
    ``horizon``. Works on streaming AND static frames — withWatermark is
    a no-op in batch, so one definition serves both the live query and
    its batch oracle."""
    c = clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (c["user_id"] == p["p_user"])
        & (p["purchase_ts"] >= c["click_ts"])
        & (p["purchase_ts"] <= c["click_ts"] + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts", "value"
    )
