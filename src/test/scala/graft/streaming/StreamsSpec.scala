package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed windowed aggregation equals the batch equivalent on the same files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // two hours of events, ts in nanos (as the driver's events table stores them)
    def ns(h: Int, m: Int): Long = (h * 3600L + m * 60L) * 1000000000L
    Seq(
      (1L, ns(0, 5), 1L, "click", 1.0, "{}"),
      (2L, ns(0, 40), 1L, "click", 2.0, "{}"),
      (3L, ns(0, 50), 2L, "view", 3.0, "{}"),
      (4L, ns(1, 10), 2L, "click", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)

    val streamed = Streams.windowedEventCounts(spark, dir)
      .select(col("window_start").cast("long").as("w"), col("event_type"), col("cnt"), col("sum_value"))

    val batch = spark.read.schema(Streams.eventsSchema).parquet(dir)
      .withColumn("event_ts", Streams.eventTime)
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").cast("long").as("w"), col("event_type"), col("cnt"), col("sum_value"))

    assert(TestSpark.rows(streamed) === TestSpark.rows(batch))
    assert(streamed.count() === 3) // (h0,click), (h0,view), (h1,click)
  }
}
