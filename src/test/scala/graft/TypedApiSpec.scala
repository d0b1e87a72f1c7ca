package graft

import graft.api.Typed
import org.apache.spark.sql.functions._

class TypedApiSpec extends SparkSpecBase {

  test("typed latestPerUser equals the windowed ts_latest_per_key query") {
    val typed = Typed.latestPerUser(Typed.events(spark, sf))
      .toDF().select("user_id", "event_id")
    val windowed = run("ts_latest_per_key").select("user_id", "event_id")
    assert(typed.exceptAll(windowed).count() == 0
      && windowed.exceptAll(typed).count() == 0)
  }

  test("typed reduce plans a partial (map-side) aggregate, not a window") {
    val plan = Typed.latestPerUser(Typed.events(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan)
    assert(plan.contains("Aggregate") || plan.contains("aggregate"), plan)
  }

  test("peakPerUser picks the max-value reading with id tiebreak") {
    val got = Typed.peakPerUser(Typed.events(spark, sf)).collect()
    val brute = Tables.events(spark, sf)
      .groupBy("user_id").agg(max("value").as("vmax")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("vmax")).toMap
    assert(got.nonEmpty)
    got.foreach(e => assert(e.value == brute(e.user_id)))
  }
}
