"""Stream-stream interval join: purchases joined to prior-hour views.

The last streaming join type the surface needed (stream-static is in
windows.py): BOTH sides are unbounded, so each must carry a watermark
and the join condition must bound event-time distance -- that pair of
constraints is what lets the state store expire buffered rows (state ~
rows within the interval horizon per user, not history).  Inner joins
emit as matches arrive; outer variants additionally wait for the
watermark before emitting nulls.

Batch twin: the inner form of ``range_join_purchase_views_1h``
(temporal.py); pytest drains the stream and compares exact row sets.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .windows import events_stream as _event_stream  # noqa: F401 - shared reader


def streaming_purchase_view_join_query(spark: SparkSession, sf_dir: str):
    """readStream x readStream inner join: same user, view within the
    hour before the purchase.  Returns the unstarted stream DataFrame."""
    p = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", "2 hours")
    )
    v = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("v_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    cond = (
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("ts"))
    )
    return p.join(v, cond, "inner").select("event_id", "v_id")
