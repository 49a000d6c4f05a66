package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val dict = Tables.part(spark, dir)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_rows"), min("p_partkey").as("id"))
    time("dict")(dict)
    val blockOf = (nm: org.apache.spark.sql.Column) => element_at(split(nm, " "), -1)
    def pairs(thresh: Boolean): DataFrame = {
      val a = dict.select(col("name").as("name_a"), col("n_rows").as("n_rows_a"),
        blockOf(col("name")).as("__blk"))
      val b = dict.select(col("name").as("name_b"), col("n_rows").as("n_rows_b"),
        blockOf(col("name")).as("__blk"))
      val j = a.join(b, Seq("__blk")).filter(col("name_a") < col("name_b"))
      if (thresh)
        j.filter(abs(length(col("name_a")) - length(col("name_b"))) <= 2)
          .withColumn("edit_dist",
            levenshtein(col("name_a"), col("name_b"), 2).cast("long"))
          .filter(col("edit_dist") >= 0 && col("edit_dist") <= 2)
          .drop("__blk")
      else
        j.withColumn("edit_dist",
            levenshtein(col("name_a"), col("name_b")).cast("long"))
          .filter(col("edit_dist") <= 2)
          .drop("__blk")
    }
    println("block join size: " + dict.select(blockOf(col("name")).as("b"))
      .groupBy("b").count().agg(sum(col("count") * col("count"))).head())
    time("pairs plain")(pairs(false))
    time("pairs thresh")(pairs(true))
    time("full q153")(Queries.entityClusters(spark, dir))
    spark.stop()
  }
}
