package graft

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
}
