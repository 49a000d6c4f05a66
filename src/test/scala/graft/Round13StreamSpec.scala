package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CusumStream, IngestPipeline, TopKStream}

/** Round-13 soak (VERDICT r12 item 3): the two new streaming MONITORING
  * operators — CUSUM drift detector and top-k leaderboard — under live
  * `Trigger.ProcessingTime` queries with files landing mid-run, the
  * same drill the stateful sinks got in rounds 11/12. Final state must
  * equal the batch formulation computed a DIFFERENT way (prefix-min
  * closed form for the clipped CUSUM fold; window ranking for top-k).
  */
class Round13StreamSpec extends AnyFunSuite {
  import TestSession._

  private val eventCols = Seq("user_id", "event_id", "event_type", "value", "ts")
  private lazy val ev = Tables.events(spark, sf).select(eventCols.map(col): _*)

  /** Time-ordered quartile waves (the arrival contract the CUSUM state
    * machine requires; top-k is arrival-order-free but shares them).
    */
  private def waves(): Seq[org.apache.spark.sql.DataFrame] = {
    import spark.implicits._
    val ts = ev.select(col("ts").cast("long")).orderBy("ts").as[Long].collect()
    val cuts = Seq(Long.MinValue, ts(ts.length / 4), ts(ts.length / 2),
      ts(3 * ts.length / 4), Long.MaxValue)
    (0 to 3).map(i => ev.filter(
      col("ts").cast("long") > cuts(i) && col("ts").cast("long") <= cuts(i + 1)))
  }

  test("streaming CUSUM under a live ProcessingTime trigger equals the closed-form batch fold") {
    val dir = TestSession.tempDir("graft_cusum_soak")
    val (src, cp) = (s"$dir/src", s"$dir/cp")
    val ws = waves()
    ws.head.coalesce(1).write.mode("append").parquet(src)

    val daily = ev.groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
    val refs = daily.groupBy("event_type")
      .agg(expr("sum(c) div count(1)").as("rf"))
    val refMap = refs.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val enc = org.apache.spark.sql.Encoders.product[CusumStream.CEv]
    val stream = IngestPipeline.boundedFileStream(spark, src, ev.schema)
      .select(col("event_type").as("key"), unix_micros(col("ts")).as("tsMicros"))
      .as(enc)
    val q = CusumStream.detect(stream, refMap).writeStream
      .queryName("cusum_soak").format("memory").outputMode("update")
      .option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      ws.tail.foreach { w =>
        w.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("cusum_soak")
      .groupBy(col("key").as("event_type"))
      .agg(max(struct(col("n_days"), col("final_cusum"), col("max_cusum"),
        col("peak_day"))).as("m"))
      .select(col("event_type"), col("m.n_days").as("n_days"),
        col("m.final_cusum").as("final_cusum"),
        col("m.max_cusum").as("max_cusum"), col("m.peak_day").as("peak_day"))

    // the batch twin, via the prefix-min closed form (a DIFFERENT
    // algebra than the stream's sequential fold)
    val lastd = daily.groupBy("event_type").agg(max("day").as("last_day"))
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val closed = daily.join(refs, "event_type").join(lastd, "event_type")
      .filter(col("day") < col("last_day"))
      .select(col("event_type"), col("day"), (col("c") - col("rf")).as("dd"))
      .withColumn("cum", sum("dd").over(wOrd))
      .withColumn("s", col("cum") - least(lit(0L), min("cum").over(wOrd)))
    val expected = closed.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        max(struct(col("day"), col("s"))).as("fm"),
        max(struct(col("s"), (-col("day")).as("nd"))).as("pm"))
      .select(col("event_type"), col("n_days"),
        col("fm.s").as("final_cusum"), col("pm.s").as("max_cusum"),
        (-col("pm.nd")).as("peak_day"))

    assert(got.count() > 0)
    assert(got.except(expected).count() == 0 &&
      expected.except(got).count() == 0,
      "live-trigger CUSUM state diverged from the closed-form batch fold")
  }

  test("streaming top-k under a live ProcessingTime trigger equals the batch window ranking") {
    val dir = TestSession.tempDir("graft_topk_soak")
    val (src, cp) = (s"$dir/src", s"$dir/cp")
    val ws = waves()
    ws.head.coalesce(1).write.mode("append").parquet(src)

    val k = 5
    val enc = org.apache.spark.sql.Encoders.product[TopKStream.TEv]
    val stream = IngestPipeline.boundedFileStream(spark, src, ev.schema)
      .select(col("event_type").as("key"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("v"),
        col("event_id").as("id"))
      .as(enc)
    val q = TopKStream.track(stream, k).writeStream
      .queryName("topk_soak").format("memory").outputMode("update")
      .option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      ws.tail.foreach { w =>
        w.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
      }
    } finally q.stop()

    val w = Window.partitionBy("key").orderBy(col("v").desc, col("id"))
    val got = spark.table("topk_soak").select("key", "v", "id").distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val expected = ev
      .select(col("event_type").as("key"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("v"),
        col("event_id").as("id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)

    assert(got.count() > 0)
    assert(got.except(expected).count() == 0 &&
      expected.except(got).count() == 0,
      "live-trigger top-k state diverged from the batch window ranking")
  }
}
