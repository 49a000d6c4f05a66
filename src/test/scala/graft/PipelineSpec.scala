package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Medallion
import graft.pipeline.Medallion.TableSpec

/** The config-driven medallion runner: watermark-bounded extraction,
  * silver cleaning, gold SCD merges — across two incremental runs.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSession._

  private val eventCols = Seq("user_id", "event_id", "event_type", "value", "ts")

  test("two-run medallion pipeline converges and extracts each slice once") {
    val state = Files.createTempDirectory("graft_medallion").toString
    val ev = Tables.events(spark, sf).select(eventCols.map(col): _*)
    val specs = Seq(
      TableSpec("events_scd1", keys = Seq("user_id"), seqCol = "ts",
        tieCols = Seq("event_id"), scdType = 1),
      TableSpec("events_scd2", keys = Seq("user_id"), seqCol = "ts",
        tieCols = Seq("event_id"), scdType = 2))
    val source = (_: String) => ev

    val mid = new java.sql.Timestamp(
      java.time.LocalDateTime.parse(Queries.SplitTs.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    val end = new java.sql.Timestamp(4102444800000L) // 2100-01-01: beyond all data

    val r1 = Medallion.run(spark, specs, source, state, mid)
    val half1Count = ev.filter(col("ts") <= lit(mid)).count()
    assert(r1.forall(_.extracted == half1Count), "first run extracts the full first slice")

    val r2 = Medallion.run(spark, specs, source, state, end)
    val half2Count = ev.filter(col("ts") > lit(mid)).count()
    assert(r2.forall(_.extracted == half2Count),
      "second run extracts ONLY rows beyond the stored watermark")

    // gold converges to the direct batch operators over the full changelog
    val scd1 = spark.read.parquet(s"$state/gold/events_scd1")
      .select(eventCols.map(col): _*)
    val expScd1 = Queries.scd1Latest(spark, sf).select(eventCols.map(col): _*)
    assert(scd1.except(expScd1).count() == 0 && expScd1.except(scd1).count() == 0)

    val scd2Cols = Seq("user_id", "event_id", "event_type", "value",
      "effective_from", "effective_to", "is_current")
    val scd2 = spark.read.parquet(s"$state/gold/events_scd2")
      .select(scd2Cols.map(col): _*)
    val expScd2 = Queries.scd2Build(spark, sf).select(scd2Cols.map(col): _*)
    assert(scd2.except(expScd2).count() == 0 && expScd2.except(scd2).count() == 0)

    // a third run with the same high watermark is a no-op extraction
    val r3 = Medallion.run(spark, specs, source, state, end)
    assert(r3.forall(_.extracted == 0), "same-watermark rerun extracts nothing")
    val scd1b = spark.read.parquet(s"$state/gold/events_scd1")
      .select(eventCols.map(col): _*)
    assert(scd1b.except(expScd1).count() == 0 && expScd1.except(scd1b).count() == 0)
  }

  test("DQ rules quarantine rows before they reach gold") {
    val state = Files.createTempDirectory("graft_medallion_dq").toString
    val ev = Tables.events(spark, sf).select(eventCols.map(col): _*)
    val specs = Seq(TableSpec("ev", keys = Seq("user_id"), seqCol = "ts",
      tieCols = Seq("event_id"), scdType = 1,
      rules = Seq(operators.Quality.Rule("value_positive", col("value") < 0))))
    val end = new java.sql.Timestamp(4102444800000L)
    Medallion.run(spark, specs, (_: String) => ev, state, end)
    val gold = spark.read.parquet(s"$state/gold/ev")
    assert(gold.filter(col("value") < 0).count() == 0)
  }
}
