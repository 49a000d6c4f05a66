package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations.
  *
  * Reference analogs: gold DLT expectations that drop rows failing named
  * SQL rules (reference: local_spotify_dab/src/gold/spotify_etl/
  * transformations/DimUser.py:44-47 `{"rule 1": "user_id IS NOT NULL"}` +
  * `expect_all_or_drop`) and the regex email validator UDF (reference:
  * local_spotify_dab/utils/transformations.py:6-16 `is_valid_email`).
  *
  * Scale design: all rules are evaluated in ONE pass over the table (one
  * aggregate with a conditional count per rule), then the single result row
  * is exploded into a per-rule report — no per-rule rescans.
  */
object Quality {

  /** A named expectation: `violation` is true when the row FAILS. */
  final case class Rule(name: String, violation: Column)

  /** Per-rule violation counts in a single scan: (rule, violations, total). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val counters = rules.map(r => count(when(r.violation, lit(1))).as(s"__v_${r.name}"))
    val agg = df.agg(counters.head, counters.tail :+ count(lit(1)).as("__total"): _*)
    val rows = rules.map { r =>
      struct(lit(r.name).as("rule"), col(s"__v_${r.name}").as("violations"),
        col("__total").as("total"))
    }
    agg.select(explode(array(rows: _*)).as("r")).select("r.rule", "r.violations", "r.total")
  }

  /** Keep only rows passing every rule (DLT `expect_all_or_drop` analog). */
  def enforce(df: DataFrame, rules: Seq[Rule]): DataFrame =
    rules.foldLeft(df)((d, r) => d.filter(!coalesce(r.violation, lit(false))))

  /** Split into (clean, quarantine): quarantined rows carry a
    * `failed_rules` array naming every rule they violate, so the
    * quarantine sink is debuggable without re-running the rules — the DLT
    * quarantine-table pattern next to `expect_all_or_drop`. All rules are
    * evaluated once in a shared projection; both sides are filters over
    * it (one scan each, or one total if the caller persists).
    */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val failed = filter(
      array(rules.map(r =>
        when(coalesce(r.violation, lit(false)), lit(r.name))): _*),
      c => c.isNotNull)
    val tagged = df.withColumn("failed_rules", failed)
    (tagged.filter(size(col("failed_rules")) === 0).drop("failed_rules"),
      tagged.filter(size(col("failed_rules")) > 0))
  }

  /** Regex-validity flag (reference `is_valid_email` analog) as a codegen'd
    * expression, not a UDF. Pattern kept to the Java-regex ∩ RE2 subset.
    */
  def matchesFormat(c: Column, pattern: String): Column = c.rlike(pattern)
}
