package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.streaming.Streams.{Crossing, FenceSeg, FixEv}

/** stream_fence: live geofence crossing alerts (streaming twin of
  * geo_fence_crossings). Pins: a segment that properly crosses a fence
  * alarms once with the from/to event ids; same-side movement and
  * beyond-the-endpoints passes stay silent; the orientation decision
  * matches the batch operator's SQL predicate case-by-case; state
  * survives across micro-batches.
  */
class StreamFenceSpec extends SparkSpecBase {

  // vertical fence x = 10.0 deg (batch convention: x = lon*1e5, y = lat*1e5)
  private val fence = FenceSeg(7, ax = 1000000L, ay = -500000L,
    bx = 1000000L, by = 500000L)

  test("proper crossing alarms once; non-crossings stay silent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixes = MemoryStream[FixEv]
    val q = Streams.fenceStream(fixes.toDS(), Seq(fence))
      .writeStream.format("memory").queryName("fence_out")
      .outputMode("append").start()
    fixes.addData(
      FixEv(1L, 100L, 1000L, 0.0, 9.5),  // west of fence
      FixEv(1L, 101L, 1100L, 0.0, 10.5), // east -> crossing 100->101
      FixEv(2L, 200L, 1000L, 0.0, 9.1),
      FixEv(2L, 201L, 1100L, 0.0, 9.9),  // stays west -> silent
      FixEv(3L, 300L, 1000L, 30.0, 9.5),
      FixEv(3L, 301L, 1100L, 30.0, 10.5)) // passes beyond fence ends -> silent
    q.processAllAvailable()
    // batch 2: user 1 crosses BACK (state carried across batches)
    fixes.addData(FixEv(1L, 102L, 1200L, 0.1, 9.4))
    q.processAllAvailable()
    val rows = spark.table("fence_out").as[Crossing].collect()
    q.stop()
    assert(rows.toSet == Set(
      Crossing(1L, 100L, 101L, 7, 1000L),
      Crossing(1L, 101L, 102L, 7, 1100L)), rows.mkString("; "))
  }

  test("orientation decision matches the batch SQL predicate, 300 cases") {
    import spark.implicits._
    // whole-degree coordinates (exact in the 1e-5 fixed point); fence at
    // lon 5, lat -15..15 — same units on both sides
    val rnd = new scala.util.Random(7)
    val cases = (0 until 300).map { _ =>
      (rnd.nextInt(41) - 20, rnd.nextInt(41) - 20,
        rnd.nextInt(41) - 20, rnd.nextInt(41) - 20)
    }
    val S = 100000L
    val df = cases.toDF("pxd", "pyd", "qxd", "qyd")
      .selectExpr(s"pxd*${S}L AS px", s"pyd*${S}L AS py",
        s"qxd*${S}L AS qx", s"qyd*${S}L AS qy")
      .withColumn("ax", lit(5 * S)).withColumn("ay", lit(-15 * S))
      .withColumn("bx", lit(5 * S)).withColumn("by", lit(15 * S))
    def o(a: String, b: String, c: String, d: String, e: String, f: String) =
      s"sign(($c-$a)*($f-$b) - ($d-$b)*($e-$a))"
    val sqlDecision = df.withColumn("x", expr(
      s"${o("px", "py", "qx", "qy", "ax", "ay")} * ${o("px", "py", "qx", "qy", "bx", "by")} < 0 AND " +
        s"${o("ax", "ay", "bx", "by", "px", "py")} * ${o("ax", "ay", "bx", "by", "qx", "qy")} < 0"))
      .select("x").collect().map(_.getBoolean(0))
    // run the stream op itself over the same cases (one entity per case)
    implicit val sqlCtx = spark.sqlContext
    val f = FenceSeg(0, 5 * S, -15 * S, 5 * S, 15 * S)
    val fixes = MemoryStream[FixEv]
    val q = Streams.fenceStream(fixes.toDS(), Seq(f))
      .writeStream.format("memory").queryName("fence_par")
      .outputMode("append").start()
    fixes.addData(cases.zipWithIndex.map { case ((px, py, _, _), i) =>
      FixEv(i.toLong, 1L, 1000L, py.toDouble, px.toDouble)
    }: _*)
    fixes.addData(cases.zipWithIndex.map { case ((_, _, qx, qy), i) =>
      FixEv(i.toLong, 2L, 2000L, qy.toDouble, qx.toDouble)
    }: _*)
    q.processAllAvailable()
    val crossed = spark.table("fence_par").select("user_id")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    cases.indices.foreach { i =>
      assert(crossed.contains(i.toLong) == sqlDecision(i),
        s"case $i: stream=${crossed.contains(i.toLong)} sql=${sqlDecision(i)}")
    }
  }

  test("late fix older than stored state is ignored (event-time guard)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixes = MemoryStream[FixEv]
    val q = Streams.fenceStream(fixes.toDS(), Seq(fence))
      .writeStream.format("memory").queryName("fence_late")
      .outputMode("append").start()
    // batch 1: west -> east, proper crossing at ts 1000->1100
    fixes.addData(
      FixEv(1L, 100L, 1000L, 0.0, 9.5),
      FixEv(1L, 101L, 1100L, 0.0, 10.5))
    q.processAllAvailable()
    // batch 2: a LATE fix (ts 1050, west side) arrives after state moved
    // to ts 1100. Without the guard it would regress state and emit a
    // time-backwards 101->99 "crossing"; with it, state stays at 101.
    fixes.addData(FixEv(1L, 99L, 1050L, 0.0, 9.7))
    q.processAllAvailable()
    // batch 3: a genuinely newer fix back west -> one more crossing FROM
    // event 101 (proving state was not regressed by the late fix)
    fixes.addData(FixEv(1L, 102L, 1200L, 0.0, 9.6))
    q.processAllAvailable()
    val rows = spark.table("fence_late").as[Crossing].collect()
    q.stop()
    assert(rows.toSet == Set(
      Crossing(1L, 100L, 101L, 7, 1000L),
      Crossing(1L, 101L, 102L, 7, 1100L)), rows.mkString("; "))
  }
}
