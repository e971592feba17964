"""applyInPandasWithState: state must accumulate across micro-batches and
the final emitted profile must equal the batch ground truth."""

from pyspark.sql import functions as F

from mallarddv_spark.streaming.stateful import running_user_profile
from mallarddv_spark.suite import read_events

SF = "/root/testdata/sf0.001"


def test_running_profile_accumulates_across_batches(spark, tmp_path):
    events = read_events(spark, SF).filter("user_id < 20")
    src = str(tmp_path / "src")
    # two separate files → two micro-batches with maxFilesPerTrigger=1
    events.filter("event_id % 2 = 0").coalesce(1).write.parquet(f"{src}/b0")
    events.filter("event_id % 2 = 1").coalesce(1).write.parquet(f"{src}/b1")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        running_user_profile(stream)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.table("profiles")
    assert emitted.count() > 0
    # last emission per user == ground-truth batch aggregate
    final = {
        r.user_id: (r.total_events, r.total_purchases)
        for r in emitted.groupBy("user_id")
        .agg(
            F.max("total_events").alias("total_events"),
            F.max("total_purchases").alias("total_purchases"),
        )
        .collect()
    }
    truth = {
        r.user_id: (r.n, r.p)
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("p"),
        )
        .collect()
    }
    assert final == truth
