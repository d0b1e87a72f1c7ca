package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One engine operator: a Spark DataFrame builder plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * `build` takes (session, sfDir) and must be fully declarative — no
  * `.collect()`, no driver-side loops — so Catalyst/AQE stay in charge of
  * the physical plan at any scale.
  */
final case class Q(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** Determinism helpers: make Spark results bit-identical to the DuckDB
  * oracle so the driver's value-hash comparison passes.
  *
  * - Money/quantity columns in the test data carry exactly 2 decimals, so
  *   aggregating them as DECIMAL is exact and order-independent; the final
  *   cast back to DOUBLE is then deterministic on both engines.
  * - Arbitrary doubles are summed in fixed point (floor(x*2^20) as BIGINT)
  *   — floor of an IEEE double is exact, integer sums are order-free.
  * - Anything transcendental (trig for geo math) is rounded well below the
  *   libm disagreement threshold before comparison/aggregation.
  */
object Det {
  val P: DecimalType = DecimalType(12, 2) // money / quantity (2-decimal data)
  val R: DecimalType = DecimalType(4, 2)  // rate factors like (1 - discount)

  def decP(c: Column): Column = c.cast(P)
  def decR(c: Column): Column = c.cast(R)
  /** Exact sum of a 2-decimal column, emitted as DOUBLE. */
  def dsum(c: Column): Column = sum(decP(c)).cast(DoubleType)
  /** Exact average of a 2-decimal column (exact sum / count). */
  def davg(c: Column): Column = sum(decP(c)).cast(DoubleType) / count(c)
  /** Order-independent fixed-point sum for arbitrary doubles. */
  def qsum(c: Column): Column =
    sum(floor(c * lit(1048576d)).cast(LongType)).cast(DoubleType) / lit(1048576d)

  // Matching DuckDB SQL fragments.
  def DSUM(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(12,2))) AS DOUBLE)"
  def DAVG(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(12,2))) AS DOUBLE)/COUNT($x)"
  def QSUM(x: String): String = s"CAST(SUM(CAST(FLOOR(($x)*1048576) AS BIGINT)) AS DOUBLE)/1048576"
}

/** Schema'd loaders for the driver-generated test tables.
  *
  * ALL event-time math runs on floored epoch seconds (`ts_sec` BIGINT),
  * which DuckDB reproduces exactly via floor(epoch(ts)). The driver has
  * shipped `events.ts` in two physical forms across rounds —
  * nanosecond-precision INT64 (which Spark's vectorized reader only
  * accepts as raw nanos via legacy.parquet.nanosAsLong) and plain
  * timestamp[us] (TIMESTAMP_NTZ) — so the loader derives `ts_sec` from
  * whichever type the file actually carries.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts_sec` (epoch seconds, BIGINT) derived from `ts`. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => // raw nanos (nanosAsLong)
        df.withColumn("ts_sec", expr("ts div 1000000000"))
      case _ => // TIMESTAMP / TIMESTAMP_NTZ: session TZ is UTC everywhere
        df.withColumn("ts_sec",
          expr("unix_micros(cast(ts as timestamp)) div 1000000"))
    }
  }
}
