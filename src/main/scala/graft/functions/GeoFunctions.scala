package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftops.GraftInternal
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Scalar math shared by interpreted eval and generated code. Mirrors
  * odin_common/src/geo.rs:167 `haversine_distance` (same asin-form
  * great-circle formula, Math.pow kept so results bit-match the composed
  * `functions._` expression tree used by the DuckDB oracles).
  */
object GeoMath {
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val rl1 = Math.toRadians(lat1)
    val rl2 = Math.toRadians(lat2)
    val a = Math.min(1.0,
      Math.pow(Math.sin((rl2 - rl1) / 2), 2)
        + Math.cos(rl1) * Math.cos(rl2)
        * Math.pow(Math.sin((Math.toRadians(lon2) - Math.toRadians(lon1)) / 2), 2))
    12742.0 * Math.asin(Math.sqrt(a))
  }
}

/** Codegen-native haversine: one fused call inside whole-stage codegen
  * instead of a 15-node expression tree. Null-intolerant quaternary.
  */
case class HaversineKm(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable
  override def prettyName: String = "haversine_km"

  override protected def nullSafeEval(lat1: Any, lon1: Any, lat2: Any, lon2: Any): Any =
    GeoMath.haversineKm(lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lon2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.GeoMath.haversineKm($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): HaversineKm =
    copy(first = a, second = b, third = c, fourth = d)
}

object GeoFunctions {
  /** Coerce any numeric input (SQL literals parse as Decimal). */
  def ofAny(exprs: Seq[Expression]): HaversineKm = {
    val d = exprs.map { e =>
      if (e.dataType == DoubleType) e else Cast(e, DoubleType)
    }
    HaversineKm(d(0), d(1), d(2), d(3))
  }

  /** Column-API form. */
  def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    GraftInternal.column(ofAny(Seq(lat1, lon1, lat2, lon2).map(GraftInternal.expr)))

  /** SQL registration: SELECT haversine_km(lat1, lon1, lat2, lon2). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "haversine_km", ofAny, "scala_udf")
}
