package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions for the scale-critical operators: the properties
  * that decide whether a query survives a 100x scale-up.
  */
class ScalePlanSpec extends SparkSpecBase {

  private def planOf(name: String): String = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try run(name).queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ts_interval_join: bucket replication avoids nested-loop join") {
    val p = planOf("ts_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"keyless interval join fell back to nested loop:\n$p")
  }

  test("ts_asof_native: only key/time columns reach the merge inputs") {
    val p = planOf("ts_asof_native")
    assert(p.contains("AsOfJoin"))
    // column pruning: the scans must not read events.props or event_type
    assert(!p.contains("props"), "as-of join reads unused payload columns")
  }

  test("doc_incremental_dedup: anti join shuffles on the hash, no broadcast of corpus")  {
    val p = planOf("doc_incremental_dedup")
    assert(p.contains("LeftAnti"), p)
  }

  test("emb_near_dup: blocked join is an equi join on the block key") {
    val p = planOf("emb_near_dup")
    assert(!p.contains("CartesianProduct"),
      s"near-dup degenerated to a cartesian product:\n$p")
  }

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    import spark.implicits._
    // 95% of left rows share one key: the pathological feed shape (one
    // hot sensor) that must not serialize onto a single task at scale
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val left = spark.range(0, 200000)
        .select((when(rand(7) < 0.95, 0L).otherwise(pmod($"id", lit(100L)))).as("k"),
          $"id".as("payload"))
      val dim = spark.range(0, 100).select($"id".as("k"), ($"id" * 2).as("attr"))
      val joined = left.join(dim, "k")
      assert(joined.collect().length == 200000) // finalize THIS plan's AQE
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
