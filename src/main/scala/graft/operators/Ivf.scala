package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Similarity

/** IVF-style approximate nearest neighbor: a coarse quantizer partitions
  * the corpus into inverted lists; queries probe only the `nprobe` most
  * promising lists and run exact search there.
  *
  * The coarse layer here uses the corpus's partition label as the list id
  * and represents each list by its element-wise SUM vector in exact
  * decimal: decimal sums are order-independent (bit-identical on any
  * partitioning and in the DuckDB oracle), and cosine similarity is
  * invariant to positive scaling, so the sum vector ranks lists exactly
  * like the mean centroid would. In production the labels come from a
  * k-means pass; everything downstream is unchanged.
  *
  * Scale shape: centroids are tiny (lists × dim) and broadcast; the
  * corpus is scanned once; only probed lists pay the exact-distance
  * kernel — the classic IVF cost model, expressed as two joins.
  */
object Ivf {

  private val SumDec: DecimalType = DecimalType(20, 10)

  /** Element-wise exact-decimal sum vector per list label, emitted as
    * array<double>. Deterministic: decimal addition is exact, and the
    * array is rebuilt in position order.
    */
  def centroids(emb: DataFrame, vecCol: String, labelCol: String): DataFrame =
    emb.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(labelCol), col("pos"))
      .agg(sum(col("v").cast(SumDec)).as("s"))
      .groupBy(col(labelCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("s")))),
        x => x.getField("s").cast("double")).as("centroid"))

  /** Top-k cosine neighbors per query, searching only the `nprobe` lists
    * whose centroid is most cosine-similar to the query.
    */
  def annIvfTopK(emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
                 queryMaxId: Long, nprobe: Int, k: Int): DataFrame = {
    val e = NearDup.withNorm(emb, idCol, vecCol)
      .join(emb.select(col(idCol), col(labelCol)), idCol)
    val q = e.filter(col(idCol) < queryMaxId)
      .select(col(idCol).as("query_id"), col(vecCol).as("qe"), col("nrm").as("qn"))
    val corpus = e.filter(col(idCol) >= queryMaxId)
      .select(col(idCol).as("neighbor_id"), col(labelCol),
        col(vecCol).as("ce"), col("nrm").as("cn"))
    val cents = centroids(emb.filter(col(idCol) >= queryMaxId), vecCol, labelCol)

    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("ccos").desc, col(labelCol))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("ccos",
        Similarity.dot(col("qe"), col("centroid")) /
          (col("qn") * sqrt(Similarity.dot(col("centroid"), col("centroid")))))
      .withColumn("lr", row_number().over(wProbe))
      .filter(col("lr") <= nprobe)
      .select("query_id", "qe", "qn", labelCol)

    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(corpus, labelCol)
      .withColumn("cos",
        Similarity.cosineFrom(Similarity.dot(col("qe"), col("ce")), col("qn"), col("cn")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }
}
