"""Stream-stream interval join: the watermarked streaming execution
must produce exactly the batch join's rows (inner interval join is
deterministic; the watermark only bounds state/late data, which a
drained fixture never exceeds).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from puregraphdb_spark.sources.registry import load_table
from puregraphdb_spark.streaming import windows as sw
from puregraphdb_spark.streaming.joins import interval_join
from tests.conftest import SF_DIR


def test_stream_interval_join_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    p_path, c_path = str(tmp_path / "p"), str(tmp_path / "c")
    purchases.write.parquet(p_path)
    clicks.write.parquet(c_path)

    p_stream = sw.read_parquet_stream(spark, p_path, purchases.schema)
    c_stream = sw.read_parquet_stream(spark, c_path, clicks.schema)
    q = (
        interval_join(p_stream, c_stream, on="user_id",
                      before="1 hour", after="0 seconds")
        .writeStream.format("memory")
        .queryName("t_attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r) for r in spark.table("t_attrib").collect()
    )

    want = sorted(
        tuple(r)
        for r in interval_join(
            purchases, clicks, on="user_id",
            before="1 hour", after="0 seconds",
        ).collect()
    )
    assert got == want and len(got) > 0
    # every attribution is a same-user click in the hour before the buy
    bad = (
        spark.table("t_attrib")
        .filter(
            (F.col("r_ts") > F.col("ts"))
            | (F.col("r_ts") < F.col("ts") - F.expr("interval 1 hour"))
        )
        .count()
    )
    assert bad == 0
