package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine's assumptions about the driver-generated fixtures in
  * one loud place.
  *
  * Round 8 proved the need: the driver regenerated /root/testdata with
  * `events.ts` as TIMESTAMP(MICROS) where previous generations used
  * TIMESTAMP(NANOS), and the then-single-format read silently collapsed
  * every event timestamp to ~1970 — 19 oracle queries and 4 specs went
  * red with no error anywhere. This spec turns any future format drift
  * into ONE failing test that names the contract, instead of a scatter
  * of wrong answers.
  *
  * The contract is intentionally about the LOGICAL table `Tables.events`
  * exposes (post unit-detection), plus the physical-unit detection
  * itself, plus the row-shape facts the query surface relies on.
  */
class TestdataContractSpec extends AnyFunSuite {
  import TestSession._

  test("events: Tables.events exposes the canonical logical schema") {
    val schema = Tables.events(spark, sf).schema
    val expected = Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    assert(schema.fields.map(f => f.name -> f.dataType).toSeq === expected,
      s"events schema drifted: $schema — update Tables.events unit handling")
  }

  test("events: timestamps land in the generated 2024 window, not 1970") {
    // The generator writes one month of 2024 events. A unit mismatch
    // (micros read as nanos, or vice versa) lands every instant decades
    // away — so a coarse year-window assertion catches any unit error.
    val row = Tables.events(spark, sf)
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .head()
    val lo = row.getTimestamp(0).toInstant
    val hi = row.getTimestamp(1).toInstant
    val y2023 = java.time.Instant.parse("2023-01-01T00:00:00Z")
    val y2026 = java.time.Instant.parse("2026-01-01T00:00:00Z")
    assert(lo.isAfter(y2023) && hi.isBefore(y2026),
      s"events.ts range [$lo, $hi] is outside the generated window — " +
        "the physical timestamp unit was misread (see Tables.eventsTsUnit)")
  }

  test("events: detected physical unit matches the parquet footer") {
    // eventsTsUnit memoizes per path; this pins that detection still
    // agrees with what a native Spark read reports for the current files.
    val unit = Tables.eventsTsUnit(spark, sf)
    val nativeTs =
      try Some(spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType)
      catch { case _: Exception => None }
    nativeTs match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        assert(unit === Tables.TsMicros)
      case _ =>
        assert(unit === Tables.TsNanos)
    }
  }

  test("star schema: key columns and types the query surface relies on") {
    def fieldTypes(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
      df.schema.fields.map(f => f.name -> f.dataType).toMap

    val li = fieldTypes(Tables.lineitem(spark, sf))
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey"))
      assert(li.get(c).contains(LongType), s"lineitem.$c drifted: ${li.get(c)}")
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount"))
      assert(li.get(c).contains(DoubleType), s"lineitem.$c drifted: ${li.get(c)}")

    val ord = fieldTypes(Tables.orders(spark, sf))
    assert(ord.get("o_orderkey").contains(LongType))
    assert(ord.get("o_custkey").contains(LongType))
    // Currently TIMESTAMP(MICROS, NTZ) in the fixtures; date_trunc /
    // month-key logic works on any temporal type, but a string or long
    // here would silently change grouping semantics — pin the family.
    assert(ord.get("o_orderdate").exists {
      case DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }, s"orders.o_orderdate drifted to a non-temporal type: ${ord.get("o_orderdate")}")

    val doc = fieldTypes(Tables.documents(spark, sf))
    assert(doc.get("doc_id").contains(LongType))
    assert(doc.get("text").contains(StringType))

    val emb = fieldTypes(Tables.embeddings(spark, sf))
    assert(emb.get("vec_id").contains(LongType))
    assert(emb.get("embedding").exists {
      case ArrayType(FloatType, _) => true
      case _ => false
    }, s"embeddings.embedding drifted: ${emb.get("embedding")}")
  }

  test("documents: content contract the text/dedup query family relies on") {
    // Same one-loud-failure treatment events got: if the generator ever
    // reshapes documents (nullable text, changed word alphabet, new
    // source naming, n_chars drift), this names the contract instead of
    // scattering hash mismatches across q20-q126.
    val doc = Tables.documents(spark, sf)
    val row = doc.agg(
      count(lit(1)).as("n"),
      count(col("text")).as("n_text"),
      min(length(col("text")) === col("n_chars")).as("lenOk"),
      min(col("lang").isin("de", "en", "es", "fr", "zh")).as("langOk"),
      min(col("source").rlike("^src[0-9]+$")).as("srcOk"),
      min(size(split(col("text"), " "))).as("minWords")).head()
    assert(row.getLong(0) === row.getLong(1),
      "documents.text became nullable — q125/q126 filter semantics and the " +
        "text-family oracles assume no nulls at the fixture SFs; re-check both")
    assert(row.getBoolean(2), "n_chars != length(text) — n_chars contract broke")
    assert(row.getBoolean(3), "lang domain drifted beyond {de,en,es,fr,zh}")
    assert(row.getBoolean(4), "source naming drifted from src<N>")
    assert(row.getInt(5) >= 2,
      "documents shorter than 2 words appeared — shingle guards assume >=2")
  }

  test("embeddings: fixed vector width and label domain") {
    val emb = Tables.embeddings(spark, sf)
    val row = emb.agg(
      min(size(col("embedding"))).as("minDim"),
      max(size(col("embedding"))).as("maxDim"),
      min(col("label")).as("minLabel"),
      max(col("label")).as("maxLabel")).head()
    assert(row.getInt(0) === 64 && row.getInt(1) === 64,
      s"embedding width drifted from 64: [${row.getInt(0)}, ${row.getInt(1)}] — " +
        "IVF/LSH geometry and the q124 dim-health oracle assume a fixed 64")
    assert(row.getInt(2) >= 0 && row.getInt(3) <= 63,
      s"label domain [${row.getInt(2)}, ${row.getInt(3)}] left the expected small range")
  }

  test("fixture scale sanity: each table is non-empty at the spec SF") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings"))
      assert(spark.read.parquet(s"$sf/$t.parquet").limit(1).count() === 1L,
        s"$t.parquet is empty or unreadable")
    assert(Tables.events(spark, sf).limit(1).count() === 1L)
  }
}
