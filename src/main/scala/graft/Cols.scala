package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared by operators.
  *
  * Money math policy (oracle parity at any scale): cast parquet doubles to
  * DECIMAL(18,2) before arithmetic so sums are exact and independent of
  * partitioning / summation order, then cast the final aggregate back to
  * DOUBLE (a deterministic conversion) for output. This keeps results
  * bit-identical between a 32-thread local run, a 1000-executor cluster,
  * and the DuckDB oracle.
  */
object Cols {
  val Dec2: DecimalType = DecimalType(18, 2)
  val Dec4: DecimalType = DecimalType(18, 4)

  /** Exact 2-dp money column. */
  def dec2(c: Column): Column = c.cast(Dec2)

  /** Exact 4-dp factor column (e.g. (1-discount)*(1+tax)). */
  def dec4(c: Column): Column = c.cast(Dec4)

  /** Exact revenue term: price * (1 - discount). */
  def discounted(price: Column, discount: Column): Column =
    dec2(price) * dec2(lit(1.0) - discount)

  /** SUM(...) of an exact decimal term, emitted as DOUBLE. */
  def moneySum(term: Column): Column = sum(term).cast("double")

  /** A timestamp literal pinned to UTC regardless of the session timezone:
    * the wall-clock string is resolved to epoch micros at plan-build time
    * and embedded via `timestamp_micros`, so `SparkEntry.queries` produce
    * identical windows under any caller session config (the DuckDB oracle
    * side always parses literals as naive UTC).
    */
  /** Wall-clock timestamp literal for comparisons against parquet
    * TIMESTAMP-without-timezone columns (orders/lineitem dates): Spark
    * reads NTZ parquet values by interpreting the stored wall-clock in the
    * SESSION timezone, so the instants shift with the caller's session —
    * and a pinned-UTC literal (utcTs) then selects different rows per
    * session (measured: q10 admitted 528 vs 526 rows under UTC vs
    * America/New_York). Parsing the literal in the session timezone makes
    * literal and data shift together: the comparison happens in the
    * wall-clock domain, exactly like DuckDB's naive TIMESTAMP compare.
    * Constant-folded, so pushdown is preserved.
    */
  def ntzTs(s: String): Column = to_timestamp(lit(s))

  /** Calendar DATE of a timestamp in UTC regardless of the session
    * timezone: `to_date(ts)` reads `spark.sql.session.timeZone`, so the
    * same query returns different days under different caller sessions
    * (measured: q67/q74 shifted a day under America/New_York). Integer
    * epoch-day arithmetic pins the UTC reading — exactly DuckDB's naive
    * `CAST(ts AS DATE)`.
    */
  def utcDate(ts: Column): Column =
    date_add(to_date(lit("1970-01-01")),
      floor(unix_micros(ts) / lit(86400000000L)).cast("int"))

  def utcTs(s: String): Column = {
    val inst = java.time.LocalDateTime
      .parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
    timestamp_micros(lit(inst.getEpochSecond * 1000000L + inst.getNano / 1000L))
  }
}
