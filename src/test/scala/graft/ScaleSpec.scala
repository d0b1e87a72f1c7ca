package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpecBase {

  test("bucketed join is exchange-free") {
    val orders = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val li = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Scale.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    Scale.writeBucketed(li, "lineitem_b", "o_orderkey", 8)
    val joined = Scale.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
    assert(shuffles == 0, s"bucketed join should not shuffle:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() == Tables.t(spark, sf, "lineitem").count())
  }

  test("salted join returns identical results to the plain join") {
    val li = Tables.t(spark, sf, "lineitem").select("l_partkey", "l_quantity")
    val small = Tables.t(spark, sf, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = li.join(small, "l_partkey")
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
    val salted = Scale.saltedJoin(li, small, "l_partkey", 4)
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }
}
