package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven star-schema query composition.
  *
  * Reference analog: the Jinja notebook builds an analytical SQL join from
  * a list of {table, alias, cols, condition} dicts — fact table first, each
  * dimension joined to it (reference: local_spotify_dab/Jinja/
  * jinja_notebook.py:43-107). Here the same composition is expressed over
  * DataFrames so Catalyst plans it (join reorder, broadcast selection,
  * column pruning through the joins).
  */
object StarSchema {

  /** One dimension of a star query: the dimension frame, the columns to
    * surface from it, and the equi-join keys (factKey = dimKey). Equi-keys
    * (rather than a free-form condition) keep every join hash/broadcast
    * plannable at scale. `joinType` is `inner` or `left` — the reference's
    * composer emits LEFT JOINs specifically so a fact row with a
    * late-arriving or missing dimension key is never dropped (reference:
    * local_spotify_dab/Jinja/jinja_notebook.py:208-220); its dim columns
    * come back null instead.
    */
  final case class Dim(df: DataFrame, cols: Seq[String], factKey: String,
                       dimKey: String, broadcastHint: Boolean = false,
                       joinType: String = "inner",
                       filter: Option[Column] = None) {
    require(normalizeJoinType(joinType).nonEmpty,
      s"star dim join type must be inner or left, got '$joinType'")
  }

  private def normalizeJoinType(t: String): Option[String] =
    t.toLowerCase.replace("_", "") match {
      case "inner" => Some("inner")
      case "left" | "leftouter" => Some("left")
      case _ => None
    }

  /** Compose fact ⋈ dims, projecting `factCols` + each dim's columns.
    * Dimensions marked `broadcastHint` are broadcast explicitly (bounded
    * lookup tables); others are left to Catalyst/AQE, which broadcasts
    * them when they fit and shuffles otherwise — the right behaviour when
    * the same query runs at 1000x the data. LEFT dims stay broadcastable:
    * Spark plans a broadcast-hash LEFT OUTER join with the dim on the
    * build side, so the null-preserving semantics cost no extra shuffle.
    *
    * `where` is the run-time fact filter the reference's composer
    * parameterizes (`WHERE date >= '{{ parameters.start_date }}'` —
    * reference: local_spotify_dab/Jinja/jinja_notebook.py:270): applied to
    * the fact BEFORE the joins so it reaches the fact scan as a pushed
    * filter (and prunes partitions on a date-partitioned fact — at 100 TB
    * the difference between reading a month and reading the table).
    * A `Dim.filter` restricts the dimension itself (e.g. one market
    * segment); it is applied to the dim side before the join, which for a
    * LEFT dim preserves the null-padding contract — fact rows whose dim
    * row was filtered away survive with null dim columns, exactly as if
    * the key were missing.
    */
  def compose(fact: DataFrame, factCols: Seq[String], dims: Seq[Dim],
              where: Option[Column] = None): DataFrame = {
    val base = where.fold(fact)(fact.filter)
    val joined = dims.foldLeft(base) { (acc, d) =>
      val dim0 = d.df.select((d.dimKey +: d.cols).distinct.map(col): _*)
      val dim = d.filter.fold(dim0)(dim0.filter)
      val side = if (d.broadcastHint) broadcast(dim) else dim
      acc.join(side, acc(d.factKey) === dim(d.dimKey),
        normalizeJoinType(d.joinType).get)
    }
    joined.select((factCols ++ dims.flatMap(_.cols)).map(col): _*)
  }

  /** A dimension by TABLE NAME, for the SQL-text form of the same config.
    * `filter` is a SQL predicate over the dim's columns; it is rendered
    * into the join's ON clause (not the WHERE), which is the only
    * placement that preserves LEFT-join null-padding semantics — a WHERE
    * on a left dim's column would silently turn the join inner.
    */
  final case class DimRef(table: String, cols: Seq[String], factKey: String,
                          dimKey: String, joinType: String = "inner",
                          filter: Option[String] = None) {
    require(normalizeJoinType(joinType).nonEmpty,
      s"star dim join type must be inner or left, got '$joinType'")
  }

  /** Render the star config as ANSI SQL text — the reference renders its
    * config to a SQL string before running it (reference: local_spotify_dab/
    * Jinja/jinja_notebook.py:203-296), and SQL-surface users (the
    * `graft_*` function audience) want that text for inspection, review,
    * or execution elsewhere. Semantically identical to `compose` over the
    * same tables: `spark.sql(renderSql(...))` and the DataFrame path
    * produce the same rows (asserted in InfraSpec).
    */
  def renderSql(factTable: String, factCols: Seq[String], dims: Seq[DimRef],
                where: Option[String] = None): String = {
    val select = (factCols ++ dims.flatMap(_.cols)).mkString(", ")
    val joins = dims.map { d =>
      val kw = if (normalizeJoinType(d.joinType).get == "left") "LEFT JOIN" else "JOIN"
      val cond = s"${d.factKey} = ${d.dimKey}" +
        d.filter.map(f => s" AND ($f)").getOrElse("")
      s"$kw ${d.table} ON $cond"
    }
    val tail = where.map(w => s"WHERE $w").toSeq
    ((s"SELECT $select" +: s"FROM $factTable" +: joins) ++ tail).mkString("\n")
  }
}
