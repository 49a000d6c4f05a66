package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Temporary diagnostic main: jumped backward min-label with AQE off.
object SccProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val aqe = args.lift(1).getOrElse("true")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.constraintPropagation.enabled",
        args.lift(2).getOrElse("true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for { s0 <- si.submissionTime; c <- si.completionTime } yield c - s0
        if (dur.exists(_ > 400))
          println(f"SLOWSTAGE id=${si.stageId} dur=${dur.getOrElse(-1L)}ms exec=${si.taskMetrics.executorRunTime}ms cpu=${si.taskMetrics.executorCpuTime/1000000}ms tasks=${si.numTasks} name=${si.name.take(60)}")
      }
    })
    val li = Tables.lineitem(spark, dir)
      .filter(pmod(col("l_orderkey"), lit(Queries.SccOrderMod.toLong)) === 0)
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val a = li.alias("a")
    val b = li.alias("b")
    val ed = a.join(b, col("a.l_orderkey") === col("b.l_orderkey") &&
        col("b.l_linenumber") === col("a.l_linenumber") + 1)
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    val remE = ed.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    val remN = remE.select(col("src").as("n"))
      .unionByName(remE.select(col("dst").as("n"))).distinct()
      .localCheckpoint(true)
    println(s"aqe=$aqe nodes=${remN.count()} edges=${remE.count()}")
    // forward fixpoint to get colors
    var lab = remN.select(col("n"), col("n").as("c")).localCheckpoint(true)
    var prevSum = BigDecimal(lab.agg(coalesce(sum("c"), lit(0L))).head().getLong(0))
    var converged = false
    var round = 0
    def step(edges: org.apache.spark.sql.DataFrame): Unit = {
      round += 1
      val t0 = System.nanoTime()
      val upd = edges.join(lab, edges("src") === lab("n"))
        .groupBy(edges("dst").as("n2")).agg(min("c").as("cin"))
      val stepped = lab.join(upd, lab("n") === upd("n2"), "left")
        .select(lab("n"),
          least(col("c"), coalesce(col("cin"), col("c"))).as("step"))
      val parents = lab.select(col("n").as("p_id"), col("c").as("p_c"))
      val ck = stepped.join(parents, stepped("step") === parents("p_id"), "left")
        .select(stepped("n"),
          least(col("step"), coalesce(col("p_c"), col("step"))).as("c"))
        .localCheckpoint(true)
      // strip: rebuild the leaf from the materialized rows, losing
      // whatever plan metadata LogicalRDD.fromDataset carried over
      val next = spark.createDataFrame(ck.rdd, ck.schema)
      val s = BigDecimal(next.agg(coalesce(sum("c"), lit(0L))).head().getLong(0))
      println(f"round $round sum=$s dt=${(System.nanoTime()-t0)/1e9}%.2f")
      lab = next
      converged = s == prevSum
      prevSum = s
    }
    while (!converged && round < 20) step(remE)
    println("forward done")
    val color = lab
    val cs = color.select(col("n").as("src"), col("c").as("cs"))
    val cd = color.select(col("n").as("dst"), col("c").as("cd"))
    val ecRev = remE.join(cs, "src").join(cd, "dst")
      .filter(col("cs") === col("cd"))
      .select(col("dst").as("src"), col("src").as("dst"))
      .localCheckpoint(true)
    println(s"ecRev edges=${ecRev.count()}")
    lab = remN.select(col("n"), col("n").as("c")).localCheckpoint(true)
    prevSum = BigDecimal(lab.agg(coalesce(sum("c"), lit(0L))).head().getLong(0))
    converged = false
    round = 0
    while (!converged && round < 6) step(ecRev)
    println("backward done")
    spark.stop()
  }
}
