package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Lsh
import graft.operators.{Components, Dedup, Scd}

/** Randomized property checks with a fixed seed: custom kernels are
  * compared bit-exactly against plain-Scala reference folds (covering
  * both the interpreted and codegen evaluation paths), and operator
  * invariants are checked on generated data far messier than the
  * testdata corpus (ties, empties, collisions).
  */
class RandomizedSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def randWord(): String =
    (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  private def randText(maxWords: Int): String =
    (0 until rnd.nextInt(maxWords)).map(_ => randWord()).mkString(" ")

  private def refFp(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31 + b) % 1000000007L)

  test("PolyFingerprint matches the reference fold on random strings") {
    val cases = (0 until 300).map(_ => randText(30)) :+ "" :+ "a"
    val df = cases.map(s => (s, refFp(s))).toDF("s", "expected")
    val bad = df.select(
      graft.plans.VectorExprs.polyFingerprint(col("s")).as("got"), col("expected"))
      .filter(col("got") =!= col("expected")).count()
    assert(bad == 0)
  }

  test("runningSums matches a driver-side reference prefix on random weights") {
    import graft.operators.PrefixSum
    // SIGNED weights (a −3..3 mix and a ±1 balance sweep), clustered
    // buckets, duplicate order keys: negative weights are the round-7
    // advice case — bucket totals read as max() of the inclusive running
    // sum are only correct for counting weights, so the totals must be
    // order-independent sums for this to pass.
    val rows = (0 until 2000).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(500).toLong, i.toLong,
        rnd.nextInt(7).toLong - 3L, if (rnd.nextBoolean()) 1L else -1L)
    }
    val df = rows.toDF("bucket_raw", "ord", "id", "w1", "w2")
      // bucket must be monotone in the global order: derive it FROM ord
      .withColumn("bucket", floor(col("ord") / 16).cast("long"))
    val got = PrefixSum.runningSums(df, "bucket",
        Seq(col("ord"), col("id")), Seq(col("w1") -> "c1", col("w2") -> "c2"))
      .select("id", "c1", "c2").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // reference: one sequential pass over the globally sorted rows
    var (a, b) = (0L, 0L)
    val expected = rows.sortBy(r => (r._2 / 16, r._2, r._3)).map { r =>
      a += r._4; b += r._5
      r._3 -> (a, b)
    }.toMap
    assert(got == expected)
  }

  test("NfcCaseFold matches the Java reference pipeline on mixed-script strings") {
    val pieces = Seq("WORT", "Grüße", "ÉCOLE", "Café", "ПРИВЕТ", "数据",
      "ärger", "mixed ASCII 123", "", "ümläut́s")
    val cases = (0 until 200).map { _ =>
      (0 until rnd.nextInt(6)).map(_ =>
        if (rnd.nextBoolean()) pieces(rnd.nextInt(pieces.size)) else randWord())
        .mkString(" ")
    } ++ pieces
    def ref(s: String): String = java.text.Normalizer.normalize(
      s.toLowerCase(java.util.Locale.ROOT), java.text.Normalizer.Form.NFC)
    val df = cases.map(s => (s, ref(s))).toDF("s", "expected")
    val bad = df.select(
      graft.plans.TextExprs.nfcCaseFold(col("s")).as("got"), col("expected"))
      .filter(col("got") =!= col("expected")).count()
    assert(bad == 0)
    // the decomposed accent really composes: both spellings hash together
    val two = Seq("Café", "Café").toDF("s")
      .select(graft.plans.TextExprs.nfcCaseFold(col("s")).as("n"))
      .distinct().count()
    assert(two == 1, "NFC must unify precomposed and decomposed accents")
  }

  test("MinHashSig matches a reference implementation on random shingle sets") {
    def refSig(shingles: Seq[String]): Seq[Long] =
      (0 until Lsh.K).map { i =>
        shingles.map(s => (Lsh.A(i) * refFp(s) + Lsh.B(i)) % Lsh.P)
          .foldLeft(Long.MaxValue)(math.min)
      }
    val cases = (0 until 100).map(_ => (1 to 1 + rnd.nextInt(40)).map(_ => randWord()))
    val df = cases.map(sh => (sh, refSig(sh))).toDF("sh", "expected")
    val bad = df.select(
      graft.plans.SignatureExprs.minHashSig(col("sh"), Lsh.A, Lsh.B, Lsh.P).as("got"),
      col("expected"))
      .filter(col("got") =!= col("expected")).count()
    assert(bad == 0)
  }

  test("SimHashWords matches a reference implementation at both geometries") {
    def refWords(shingles: Seq[String], gas: Seq[Long], gbs: Seq[Long]): Seq[Long] =
      gas.indices.map { w =>
        val gs = shingles.map(s => (gas(w) * refFp(s) + gbs(w)) % Lsh.TwoPow32)
        (0 until 32).foldLeft(0L) { (sim, j) =>
          val ones = gs.count(g => ((g >>> j) & 1L) == 1L)
          if (2 * ones >= gs.size) sim | (1L << j) else sim
        }
      }
    val cases = (0 until 100).map(_ => (1 to 1 + rnd.nextInt(40)).map(_ => randWord()))
    for (geom <- Seq(Lsh.Sim32, Lsh.Sim64)) {
      val df = cases.map(sh => (sh, refWords(sh, geom.gas, geom.gbs))).toDF("sh", "expected")
      val bad = df.select(
        graft.plans.SignatureExprs.simHashWords(col("sh"),
          geom.gas, geom.gbs, Lsh.TwoPow32).as("got"),
        col("expected"))
        .filter(col("got") =!= col("expected")).count()
      assert(bad == 0, s"geometry ${geom.bits}/${geom.bands}")
    }
  }

  test("band keys and hamming agree with reference math across geometries") {
    // simWordBands: key t must equal the bit-slice of the fingerprint
    def refSimBands(words: Seq[Long], geom: Lsh.SimGeometry): Seq[Long] =
      (0 until geom.bands).map { t =>
        val w = words(t / geom.bandsPerWord)
        (w >>> ((t % geom.bandsPerWord) * geom.width)) & ((1L << geom.width) - 1)
      }
    // minhash bandKeys: mod-P base-31 fold of each row slice
    def refMhBands(sig: Seq[Long], geom: Lsh.MinHashGeometry): Seq[Long] =
      (0 until geom.bands).map { t =>
        sig.slice(t * geom.rowsPerBand, (t + 1) * geom.rowsPerBand)
          .foldLeft(0L)((acc, v) => (acc * 31 + v) % Lsh.P)
      }
    val words = (0 until 50).map(_ =>
      Seq(rnd.nextLong(1L << 32), rnd.nextLong(1L << 32)))
    for (geom <- Seq(Lsh.Sim64, Lsh.Sim64Radius)) {
      val df = words.map(ws => (ws, refSimBands(ws, geom))).toDF("sim", "expected")
      val bad = df.select(Lsh.simWordBands(col("sim"), geom).as("bk"), col("expected"))
        .select(transform(col("bk"), b => b("key")).as("got"), col("expected"))
        .filter(col("got") =!= col("expected")).count()
      assert(bad == 0, s"sim geometry ${geom.bits}/${geom.bands}")
    }
    val sigs = (0 until 50).map(_ => (1 to 64).map(_ => rnd.nextLong(Lsh.P)))
    for (geom <- Seq(Lsh.Mh16, Lsh.Mh64)) {
      val df = sigs.map(s => (s.take(geom.k), refMhBands(s.take(geom.k), geom)))
        .toDF("sig", "expected")
      val bad = df.select(Lsh.bandKeys(col("sig"), geom).as("bk"), col("expected"))
        .select(transform(col("bk"), b => b("key")).as("got"), col("expected"))
        .filter(col("got") =!= col("expected")).count()
      assert(bad == 0, s"minhash geometry ${geom.k}/${geom.bands}")
    }
    // hammingWords ≡ Long.bitCount over XORed words
    val pairs = (0 until 50).map(_ =>
      (Seq(rnd.nextLong(1L << 32), rnd.nextLong(1L << 32)),
        Seq(rnd.nextLong(1L << 32), rnd.nextLong(1L << 32))))
    val hdf = pairs.map { case (a, b) =>
      (a, b, a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum)
    }.toDF("a", "b", "expected")
    val badH = hdf.select(
      Lsh.hammingWords(col("a"), col("b"), 2).cast("int").as("got"), col("expected"))
      .filter(col("got") =!= col("expected")).count()
    assert(badH == 0)
  }

  test("VecDot matches a reference sequential fold bit-exactly") {
    val cases = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(80)
      ((0 until n).map(_ => rnd.nextFloat() - 0.5f),
        (0 until n).map(_ => rnd.nextFloat() - 0.5f))
    }
    val df = cases.map { case (a, b) =>
      val exp = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      (a, b, exp)
    }.toDF("a", "b", "expected")
    val bad = df.select(
      graft.plans.VectorExprs.dot(col("a"), col("b")).as("got"), col("expected"))
      .filter(col("got") =!= col("expected")).count()
    assert(bad == 0)
  }

  test("SCD2 invariants hold on a random changelog with ties") {
    // keys with colliding sequence values exercise the tie columns
    val rows = (0 until 2000).map { i =>
      (rnd.nextInt(120).toLong, i.toLong, rnd.nextInt(50).toLong, rnd.nextDouble())
    }
    val df = rows.toDF("k", "uid", "seq", "v")
    val scd2 = Scd.scd2FromChangelog(df, Seq("k"), "seq", Seq("uid"))
    // exactly one current row per key
    assert(scd2.filter(col("is_current")).groupBy("k").count()
      .filter(col("count") =!= 1).count() == 0)
    // every non-current row's effective_to equals some row's effective_from
    // for the same key, and intervals never go backwards
    assert(scd2.filter(col("effective_to") < col("effective_from")).count() == 0)
    val n = df.count()
    assert(scd2.count() == n, "scd2 preserves every changelog row as a version")
  }

  test("folding scd1 merges equals one global latest-wins") {
    val batches = (0 until 3).map { b =>
      (0 until 500).map { i =>
        (rnd.nextInt(80).toLong, (b * 1000 + i).toLong, rnd.nextInt(40).toLong, rnd.nextDouble())
      }.toDF("k", "uid", "seq", "v")
    }
    val folded = batches.tail.foldLeft(
      Dedup.latestByKey(batches.head, Seq("k"), Seq("seq", "uid")))(
      (acc, b) => Scd.scd1Merge(acc, b, Seq("k"), Seq("seq", "uid")))
    val global = Dedup.latestByKey(batches.reduce(_ unionByName _), Seq("k"), Seq("seq", "uid"))
    assert(folded.except(global).count() == 0 && global.except(folded).count() == 0)
  }

  test("connected components agree with a union-find reference on a random graph") {
    val n = 120
    val edges = (0 until 90).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    // union-find reference
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val refLabel = (0 until n).map { i =>
      // canonical = min member; path-compress via repeated find
      var r = find(i); i.toLong -> r.toLong
    }.toMap
    // min-id canonicalization of the union-find labels
    val members = refLabel.toSeq.groupBy(_._2).flatMap { case (_, m) =>
      val minId = m.map(_._1).min
      m.map { case (id, _) => id -> minId }
    }
    val got = Components.connectedComponents(
      spark.range(n).select(col("id")),
      edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == members)
  }

  test("components result materializes without recomputing the edge source") {
    // Regression guard: ccWithRounds persists its (possibly very
    // expensive) edge input during the rounds and unpersists it before
    // returning. The returned frame must reference only checkpointed
    // leaves — if the isolated-node anti-join still points at the
    // unpersisted caches, the caller's first action replays the whole
    // edge pipeline one extra time. Count evaluations of the edge source
    // with an accumulator planted in its lineage.
    val acc = spark.sparkContext.longAccumulator("edgeEvals")
    val parts = 4
    val edgeRdd = spark.sparkContext
      .parallelize((0 until 60).map(i => (i.toLong, (i + 1).toLong)), parts)
      .mapPartitions { it => acc.add(1L); it }
    val edges = spark.createDataFrame(edgeRdd).toDF("src", "dst")
    val nodes = spark.range(200).select(col("id"))
    val result = Components.connectedComponents(nodes, edges)
    val during = acc.value
    assert(during >= parts, "edge source must have been evaluated in the rounds")
    assert(result.count() == 200)
    assert(acc.value == during,
      s"materializing the result re-evaluated the edge source " +
        s"(${acc.value - during} extra partition evals) — the isolated-node " +
        "side must be checkpointed before the caches are dropped")
  }

  test("funnel chain matches a driver-side reference on adversarial tie soups") {
    import spark.implicits._
    // heavy timestamp collisions: every step type can land on the same
    // microsecond, the exact patterns the strict-inequality chain must
    // resolve identically to the reference fold
    val types = Seq("view", "click", "purchase", "error")
    val rows = (0 until 4000).map { i =>
      (rnd.nextInt(120).toLong, types(rnd.nextInt(types.size)), i.toLong,
        (1000 + rnd.nextInt(40)).toLong)
    }
    val got = Queries.funnelFrom(rows.toDF("user_id", "event_type", "event_id", "us"))
      .select("user_id", "stage", "view_ts", "click_ts", "purchase_ts")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1),
        Option(r.getTimestamp(2)).map(_.getTime),
        Option(r.getTimestamp(3)).map(_.getTime),
        Option(r.getTimestamp(4)).map(_.getTime))).toMap
    val expected = rows.groupBy(_._1).map { case (u, evs) =>
      val tView = evs.filter(_._2 == "view").map(_._4).minOption
      val tClick = tView.flatMap(v =>
        evs.filter(e => e._2 == "click" && e._4 > v).map(_._4).minOption)
      val tPurchase = tClick.flatMap(c =>
        evs.filter(e => e._2 == "purchase" && e._4 > c).map(_._4).minOption)
      val stage =
        if (tPurchase.isDefined) 3 else if (tClick.isDefined) 2
        else if (tView.isDefined) 1 else 0
      // us is micros; Timestamp.getTime is millis
      u -> (stage, tView.map(_ / 1000), tClick.map(_ / 1000), tPurchase.map(_ / 1000))
    }
    assert(got == expected)
  }

  test("as-of joins match a driver-side reference in all direction/tolerance corners") {
    import spark.implicits._
    import graft.operators.AsOf
    val ts = (s: Long) => new java.sql.Timestamp(s)
    val leftRows = (0 until 600).map(i =>
      (rnd.nextInt(25).toLong, (1000 + rnd.nextInt(50)).toLong * 1000, i.toLong))
    // right side unique per (k, ts) — the operator's documented precondition
    val rightRows = (0 until 600).map(i =>
      (rnd.nextInt(25).toLong, (1000 + rnd.nextInt(50)).toLong * 1000, i.toLong * 10))
      .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
    val left = leftRows.map(r => (r._1, ts(r._2), r._3)).toDF("k", "ts", "lid")
    val right = rightRows.map(r => (r._1, ts(r._2), r._3)).toDF("k", "ts", "v")
    for (forward <- Seq(false, true); tolMs <- Seq(None, Some(7000L))) {
      val got = AsOf.asOfJoin(left, right, Seq("k"), "ts", Seq("v"), "m_",
          toleranceMicros = tolMs.map(_ * 1000), forward = forward)
        .select("lid", "m_v").as[(Long, Option[Long])].collect().toMap
      val expected = leftRows.map { case (k, lts, lid) =>
        val cand = rightRows.filter(r => r._1 == k &&
          (if (forward) r._2 >= lts else r._2 <= lts) &&
          tolMs.forall(t => math.abs(r._2 - lts) <= t))
        val pick =
          if (forward) cand.sortBy(_._2).headOption else cand.sortBy(_._2).lastOption
        lid -> pick.map(_._3)
      }.toMap
      assert(got == expected, s"forward=$forward tol=$tolMs")
    }
  }

  test("interval joins match naive inequality joins on random interval soups") {
    import graft.operators.RangeJoin
    // random intervals with lengths from zero to many buckets, clustered
    // starts (ties guaranteed), plus random points
    val b = 1000L
    val iv = (1 to 200).map { i =>
      val s = rnd.nextInt(50) * 500L // start on half-bucket grid: edge ties
      (i.toLong, s, s + (rnd.nextInt(8) match {
        case 0 => 0L                      // zero-length
        case k => k * 700L                // up to ~5 buckets
      }))
    }
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextInt(30000).toLong))
    val ivDf = iv.toDF("iv_id", "s_us", "e_us")
      .select(col("iv_id"), timestamp_micros(col("s_us")).as("s"),
        timestamp_micros(col("e_us")).as("e"))
    val ptDf = pts.toDF("p_id", "p_us")
      .select(col("p_id"), timestamp_micros(col("p_us")).as("p"))

    val gotP = RangeJoin.intervalPointJoin(ivDf, ptDf, "s", "e", "p", b)
      .select("iv_id", "p_id").as[(Long, Long)].collect().toSeq.sorted
    val naiveP = (for ((id, s, e) <- iv; (pid, p) <- pts if p >= s && p <= e)
      yield (id, pid)).sorted
    assert(gotP == naiveP, "intervalPointJoin != naive")

    // salting spreads hot buckets but must not change the pair set
    val salted = RangeJoin.intervalPointJoin(ivDf, ptDf, "s", "e", "p", b,
        saltShards = 3)
      .select("iv_id", "p_id").as[(Long, Long)].collect().toSeq
    assert(salted.sorted == naiveP, "salted join changed the pair set")
    assert(salted.size == salted.toSet.size, "salting duplicated a pair")

    val other = iv.map { case (id, s, e) => (id + 1000, s, e) }
    val oDf = other.toDF("b_id", "bs_us", "be_us")
      .select(col("b_id"), timestamp_micros(col("bs_us")).as("bs"),
        timestamp_micros(col("be_us")).as("be"))
    val gotO = RangeJoin.intervalOverlapJoin(ivDf, oDf, "s", "e", "bs", "be", b)
      .select("iv_id", "b_id").as[(Long, Long)].collect().toSeq
    val naiveO = (for ((a, as_, ae) <- iv; (bId, bs, be) <- other
      if as_ <= be && bs <= ae) yield (a, bId)).sorted
    assert(gotO.sorted == naiveO, "intervalOverlapJoin != naive")
    assert(gotO.size == gotO.toSet.size, "an overlapping pair was claimed twice")
  }

  test("pointer jumping converges in O(log d) rounds on a deep chain") {
    // A 100-hop chain is the worst case for plain neighbor-min propagation
    // (one hop per round => ~100 rounds, silently wrong at maxIter=25);
    // with path halving the label distance shrinks geometrically.
    val n = 100
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val (labels, rounds) = Components.ccWithRounds(
      spark.range(n).select(col("id")), chain, maxIter = 25)
    assert(labels.filter(col("label") =!= 0L).count() == 0,
      "every chain node must resolve to the minimum id")
    assert(rounds <= 12, s"expected O(log d) convergence, took $rounds rounds")
  }
}
