package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §4 scale patterns as reusable library ops: bucketed co-located joins
  * (no shuffle at query time) and salted joins for skewed keys. These are
  * the levers that keep the §2 operators viable at 100 TB; specs assert
  * the physical-plan properties.
  */
object Scale {

  /** Write both sides bucketed+sorted by the join key so subsequent joins
    * are exchange-free. The 100 TB pattern: bucket the fact table once,
    * amortize across every downstream join/agg on that key.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", s"spark-warehouse/$table")
      .saveAsTable(table)

  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Salted join for skewed build keys: explode the small side into
    * `salt` replicas, scatter the big side's hot keys across them. AQE
    * skew-join handles this adaptively; the explicit form documents the
    * mechanism and works when AQE can't see the skew (e.g. custom nodes).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val smallSalted = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    bigSalted.join(smallSalted, Seq(key, "__salt")).drop("__salt")
  }
}
