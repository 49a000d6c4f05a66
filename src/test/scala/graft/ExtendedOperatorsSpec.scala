package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, NearDup}

/** LLM-data operators checked against engine-independent ground truth. */
class ExtendedOperatorsSpec extends AnyFunSuite {
  import TestSession._

  test("minhash LSH candidates achieve full recall of exact-jaccard pairs") {
    val exact = NearDup.ngramJaccardPairs(Tables.documents(spark, sf),
      "doc_id", "text", Queries.JaccardN, Queries.JaccardThreshold)
      .select("doc_a", "doc_b")
    val cand = NearDup.minHashLshPairs(Tables.documents(spark, sf),
      "doc_id", "text", Queries.JaccardN)
      .select("doc_a", "doc_b")
    assert(exact.count() > 0, "corpus should contain planted near-dups")
    assert(exact.except(cand).count() == 0, "LSH missed an exact near-dup pair")
  }

  test("simhash pairs are mostly true near-dups with good planted-pair recall") {
    // A 32-bit SimHash admits rare hamming<=3 collisions between unrelated
    // docs (measured: 1 in ~125k pairs on this corpus), so the contract is
    // precision/recall, not zero false positives.
    val sim = NearDup.simHashPairs(Tables.documents(spark, sf),
      "doc_id", "text", Queries.JaccardN, Queries.SimHammingMax)
      .select("doc_a", "doc_b")
    val exact = NearDup.ngramJaccardPairs(Tables.documents(spark, sf),
      "doc_id", "text", Queries.JaccardN, 0.5)
      .select("doc_a", "doc_b")
    val nSim = sim.count()
    val truePos = nSim - sim.except(exact).count()
    val nExact = exact.count()
    assert(nSim > 0 && nExact > 0)
    assert(truePos.toDouble / nSim >= 0.9, s"precision $truePos/$nSim < 0.9")
    assert(truePos.toDouble / nExact >= 0.6, s"recall $truePos/$nExact < 0.6")
  }

  test("ann lsh returns a subset of each query's candidates, ranked correctly") {
    val out = Queries.annLsh(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      // cosine non-increasing with rank
      val cs = sorted.map(_.getDouble(2)).toSeq
      assert(cs.zip(cs.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  test("batched media decode matches the columnar metadata path") {
    val media = Multimodal.payloadTable(Tables.documents(spark, sf)).repartition(6)
    val decoded = Multimodal.decodeBatched(media)(Multimodal.decodeStub)
      .toDF().select("doc_id", "width", "height", "n_bytes")
    val meta = Multimodal.extractMeta(media)
      .select(col("doc_id"), col("width"), col("height"),
        col("byte_len").cast("long").as("n_bytes"))
    assert(decoded.except(meta).count() == 0 && meta.except(decoded).count() == 0)
  }

  test("scd2Merge rebuilds only touched keys and matches a full rebuild") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "value", "ts")
    val h1 = ev.filter(col("ts") <= Cols.utcTs(Queries.SplitTs))
    val h2 = ev.filter(col("ts") > Cols.utcTs(Queries.SplitTs))
    val merged = operators.Scd.scd2Merge(
      operators.Scd.scd2FromChangelog(h1, Seq("user_id"), "ts", Seq("event_id")),
      h2, Seq("user_id"), "ts", Seq("event_id"))
    val full = operators.Scd.scd2FromChangelog(ev, Seq("user_id"), "ts", Seq("event_id"))
    assert(merged.except(full).count() == 0 && full.except(merged).count() == 0)
  }
}
