package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOf, AsOfNative, Dedup}

/** The native as-of exec (plans/AsOfJoinPlan.scala) against the
  * union+window reference implementation and hand-computed edges: the
  * two encodings must agree row-for-row in every mode, and the physical
  * plan must actually be the custom operator (not a fallback).
  */
class NativeAsOfSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def sides() = {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "value", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val views = Dedup.latestByKey(
      ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "event_id", "value"),
      keys = Seq("user_id", "ts"), orderCols = Seq("event_id"))
    (purchases, views)
  }

  private def assertSame(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.toSeq == b.columns.toSeq)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("native backward as-of equals the union+window encoding on the fixture") {
    val (p, v) = sides()
    assertSame(
      AsOfNative.asOfJoin(p, v, Seq("user_id"), "ts", Seq("value", "event_id"), "view_"),
      AsOf.asOfJoin(p, v, Seq("user_id"), "ts", Seq("value", "event_id"), "view_"))
  }

  test("native tolerance equals the union+window tolerance") {
    val (p, v) = sides()
    val tol = Some(3L * 86400 * 1000000L)
    assertSame(
      AsOfNative.asOfJoin(p, v, Seq("user_id"), "ts", Seq("value", "event_id"),
        "view_", toleranceMicros = tol),
      AsOf.asOfJoin(p, v, Seq("user_id"), "ts", Seq("value", "event_id"),
        "view_", toleranceMicros = tol))
  }

  test("native forward as-of equals the union+window forward") {
    val (p, v) = sides()
    val tol = Some(7L * 86400 * 1000000L)
    assertSame(
      AsOfNative.asOfJoin(v, p, Seq("user_id"), "ts", Seq("event_id"),
        "next_", toleranceMicros = tol, forward = true),
      AsOf.asOfJoin(v, p, Seq("user_id"), "ts", Seq("event_id"),
        "next_", toleranceMicros = tol, forward = true))
  }

  test("the plan contains AsOfJoinExec and neither a window nor a union") {
    val (p, v) = sides()
    val df = AsOfNative.asOfJoin(p, v, Seq("user_id"), "ts", Seq("value"), "view_")
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), "native exec must not plan a window")
    assert(!plan.contains("Union"), "native exec must not union the sides")
  }

  test("hand-computed edges: boundaries, inclusivity, no-match, null keys") {
    def ts(us: Long) = timestamp_micros(lit(us))
    val left = Seq((1L, 100L, 10L), (1L, 200L, 20L), (2L, 300L, 5L),
        (3L, 400L, 50L))
      .toDF("k", "lid", "us")
      .select(col("k"), col("lid"), timestamp_micros(col("us")).as("ts"))
    val right = Seq((1L, 900L, 10L), (1L, 901L, 15L), (2L, 902L, 6L),
        (9L, 903L, 1L))
      .toDF("k", "rid", "us")
      .select(col("k"), col("rid"), timestamp_micros(col("us")).as("ts"))
    val out = AsOfNative.asOfJoin(left, right, Seq("k"), "ts", Seq("rid"), "m_")
      .select("lid", "m_rid").as[(Long, Option[Long])].collect().toMap
    // lid=100: rts=10 <= 10 inclusive; lid=200: latest of {10,15} = 15;
    // lid=300: right ts 6 > 5 -> no match; lid=400: no key-3 right rows
    assert(out == Map(100L -> Some(900L), 200L -> Some(901L),
      300L -> None, 400L -> None), s"got $out")
    // forward: lid=300 (ts 5) matches rts 6; lid=200 (ts 20) has none ahead
    val fwd = AsOfNative.asOfJoin(left, right, Seq("k"), "ts", Seq("rid"),
        "m_", forward = true)
      .select("lid", "m_rid").as[(Long, Option[Long])].collect().toMap
    assert(fwd == Map(100L -> Some(900L), 200L -> None,
      300L -> Some(902L), 400L -> None), s"got $fwd")
    // tolerance: backward match at distance 5 dies under tol=4
    val tight = AsOfNative.asOfJoin(left, right, Seq("k"), "ts", Seq("rid"),
        "m_", toleranceMicros = Some(4L))
      .select("lid", "m_rid").as[(Long, Option[Long])].collect().toMap
    assert(tight(200L).isEmpty && tight(100L).contains(900L), s"got $tight")
  }

  test("null keys and null timestamps never match") {
    val left = Seq((Some(1L), 1L, Some(10L)), (None, 2L, Some(10L)),
        (Some(1L), 3L, None))
      .toDF("k", "lid", "us")
      .select(col("k"), col("lid"), timestamp_micros(col("us")).as("ts"))
    val right = Seq((Some(1L), 9L, Some(5L)), (None, 8L, Some(5L)))
      .toDF("k", "rid", "us")
      .select(col("k"), col("rid"), timestamp_micros(col("us")).as("ts"))
    val out = AsOfNative.asOfJoin(left, right, Seq("k"), "ts", Seq("rid"), "m_")
      .select("lid", "m_rid").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(9L), 2L -> None, 3L -> None), s"got $out")
  }

  test("self as-of (both sides from one relation) resolves without attribute conflicts") {
    val ev = Tables.events(spark, sf).select("user_id", "event_id", "ts")
    val out = AsOfNative.asOfJoin(
      ev, Dedup.latestByKey(ev, Seq("user_id", "ts"), Seq("event_id")),
      Seq("user_id"), "ts", Seq("event_id"), "prev_")
    assert(out.count() == ev.count())
  }
}
