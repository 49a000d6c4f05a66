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

  /** List assignment against a trained quantizer: argmax cosine over the
    * unit-normalized centroids, first-wins ties. The centroids are plan
    * literals (k × dim doubles), so assignment is a pure codegen
    * projection — no broadcast variable, no shuffle, one VecDot per list.
    */
  def assignList(vec: Column, cents: Seq[Seq[Double]]): Column = {
    val unit = cents.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0.0) c else c.map(_ / n)
    }
    val scores = array(unit.map(c =>
      graft.plans.VectorExprs.dot(typedLit(c), vec)): _*)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** Deterministic sampled k-means for the coarse quantizer (the training
    * pass the label-based `annIvfTopK` delegates to production).
    *
    * - '''sample''': a hash-threshold slice of the corpus — at 100 TB the
    *   quantizer trains on a bounded sample, never the full table;
    * - '''seeds''': the k vectors smallest in `xxhash64(id)` order — a
    *   fixed pseudo-random draw, reproducible on any cluster;
    * - '''Lloyd iterations''': assignment is the distributed literal-
    *   centroid projection above; new centroids are exact-decimal means
    *   (order-independent sums → the trained quantizer is bit-identical
    *   under any partitioning); a list that loses all members keeps its
    *   previous centroid.
    *
    * Driver state is k × dim doubles per iteration — the same bounded
    * footprint MLlib's k-means keeps; nothing corpus-sized ever collects.
    */
  def trainKMeans(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                  iters: Int, sampleFraction: Double = 1.0): Seq[Seq[Double]] = {
    val train = (if (sampleFraction >= 1.0) emb
      else emb.filter(pmod(xxhash64(col(idCol)), lit(1000000L)) <
        lit((sampleFraction * 1000000L).toLong)))
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    var cents: Seq[Seq[Double]] = train
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toSeq).toSeq
    for (_ <- 1 to iters) {
      val refined = train
        .withColumn("list", assignList(col("v"), cents))
        .select(col("list"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("list", "pos")
        .agg(sum(col("x").cast(SumDec)).as("s"), count(lit(1)).as("n"))
        .groupBy("list")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("s") / col("n")).cast("double").as("m")))),
          x => x.getField("m")).as("centroid"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      cents = cents.indices.map(i => refined.getOrElse(i, cents(i)))
    }
    cents
  }

  /** IVF over a TRAINED quantizer: k-means on a corpus sample, literal-
    * centroid list assignment, then the unchanged probe/search shape of
    * `annIvfTopK` on the trained labels.
    */
  def annIvfTrainedTopK(emb: DataFrame, idCol: String, vecCol: String,
                        queryMaxId: Long, lists: Int, iters: Int, nprobe: Int,
                        k: Int, sampleFraction: Double = 1.0): DataFrame = {
    val cents = trainKMeans(emb.filter(col(idCol) >= queryMaxId), idCol, vecCol,
      lists, iters, sampleFraction)
    val labeled = emb.withColumn("kmeans_list", assignList(col(vecCol), cents))
    annIvfTopK(labeled, idCol, vecCol, "kmeans_list", queryMaxId, nprobe, k)
  }
}
