package graft

import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpecBase {

  test("emb_ivf_topk: valid structure and measurable recall vs brute force") {
    val ivf = run("emb_ivf_topk").collect()
    assert(ivf.nonEmpty)
    // per query: ranks contiguous from 1, sims descending
    ivf.groupBy(_.getAs[Long]("q_vec_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      val sims = sorted.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(sorted.map(_.getAs[Int]("rn")).toSeq == (1 to sorted.length))
    }
    // recall@5 vs the exact brute-force top-5 (reported, sanity-bounded)
    val brute = run("emb_cosine_topk").collect()
      .groupBy(_.getAs[Long]("q_vec_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_vec_id")).toSet).toMap
    val got = ivf.groupBy(_.getAs[Long]("q_vec_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_vec_id")).toSet).toMap
    val recalls = got.map { case (q, ids) =>
      brute.get(q).map(b => ids.intersect(b).size.toDouble / b.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // nprobe=1 over near-random vectors: recall is naturally partial, but
    // the probe must return *some* true neighbors across the query set
    assert(mean > 0.0, s"IVF found no true neighbors at all (mean recall $mean)")
  }
}

class SemDedupPlanSpec extends SparkSpecBase {

  test("emb_semantic_dedup: pair stage is keyed on the IVF cell, not label") {
    // the shipped pair join must shuffle on the coarse-quantizer cell id —
    // the SemDeDup scale contract (cells stay bounded as the corpus grows).
    // (the full query's executed plan is truncated by the CC checkpoint,
    // so assert on the exposed candidate stage directly)
    val pairs = graft.operators.Similarity.semanticPairs(spark, sf)
    assert(pairs.collect().nonEmpty)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(cell"),
      s"pair join not shuffle-keyed on cell:\n$plan")
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      "semantic dedup must not contain a cartesian product")
    assert(run("emb_semantic_dedup").collect().nonEmpty)
  }
}
