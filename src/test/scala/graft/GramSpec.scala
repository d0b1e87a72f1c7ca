package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class GramSpec extends SparkSpecBase {

  test("emb_gram: aggregator matches the explode-based formulation exactly") {
    val byAgg = run("emb_gram").select("i", "j", "qsum").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byExplode = Tables.t(spark, sf, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("p1", "x1")), col("embedding"))
      .select(col("p1"), col("x1"), posexplode(col("embedding")).as(Seq("p2", "x2")))
      .groupBy((col("p1") + 1).cast(LongType).as("i"),
        (col("p2") + 1).cast(LongType).as("j"))
      .agg(sum(floor(col("x1").cast(DoubleType) * col("x2").cast(DoubleType)
        * lit(67108864.0)).cast(LongType)).as("qsum"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byAgg.size == 64 * 64)
    assert(byAgg == byExplode)
  }

  test("emb_gram: matrix is symmetric and diagonal non-negative") {
    val m = run("emb_gram").select("i", "j", "qsum").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    (1L to 64L).foreach { i =>
      assert(m((i, i)) >= 0L, s"negative diagonal at $i")
      (1L to 64L).foreach { j =>
        // fixed-point floor is applied to the same product both ways
        assert(m((i, j)) == m((j, i)), s"asymmetry at ($i,$j)")
      }
    }
  }

  test("emb_gram: plan shuffles buffers, not exploded rows") {
    val plan = run("emb_gram").queryExecution.executedPlan.toString
    // the aggregation happens before any explode in the plan: the only
    // Generate (posexplode) sits above the aggregate, unpacking the final
    // 4096-cell buffer — input rows are never multiplied by d²
    val genIdx = plan.indexOf("Generate")
    val aggIdx = plan.lastIndexOf("Aggregate")
    assert(genIdx >= 0 && aggIdx >= 0)
    assert(genIdx < aggIdx, // plan prints top-down: explode ABOVE the agg
      s"explode should consume the aggregated buffer, not feed it:\n$plan")
  }
}
