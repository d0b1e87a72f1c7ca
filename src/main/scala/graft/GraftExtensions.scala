package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.plans.AsOfJoinStrategy
import graft.functions.HaversineKm

/** Session-extension registration: enables graft's planner strategy and
  * SQL functions on any session via
  *   spark.sql.extensions=graft.GraftExtensions
  * (the per-call registration in AsOf.join / GeoFunctions.register remains
  * for sessions created without the config).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("haversine_km"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HaversineKm].getName, "haversine_km"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.GeoFunctions.ofAny(exprs)))
  }
}
