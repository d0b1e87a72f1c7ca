package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Direct validation of Det.rankPrefix — the one shared distributed
  * exact-rank / exclusive-prefix-sum idiom (q53 global rank,
  * TextOps.groupRank, doc_token_budget's allocation frame, the
  * Multimodal corpus median, doc_shard_plan, doc_upsample_plan all ride
  * it) — against the plain window-function reference on frames small
  * enough to window safely. Shapes chosen to stress the offset table:
  * one giant group, many singleton groups, more partitions than rows,
  * ties broken only by the tie column.
  */
class RankPrefixSpec extends SparkSpecBase {

  private def mk(n: Int, groups: Int) = {
    import spark.implicits._
    // deterministic pseudo-random payload; xxhash64 keeps it shuffled
    (0 until n).map { i =>
      val g = s"g${math.abs((i * 2654435761L) % groups)}"
      (i.toLong, g, (i * 37 % 101).toLong)
    }.toDF("id", "grp", "v")
  }

  private def check(n: Int, groups: Int, globalForm: Boolean): Unit = {
    val df = mk(n, groups)
    val grpCols = if (globalForm) Seq.empty else Seq(col("grp"))
    val got = Det.rankPrefix(df, grpCols, Seq(col("v"), col("id")),
      Some(col("v")))
    val w = if (globalForm) Window.orderBy(col("v"), col("id"))
      else Window.partitionBy(col("grp")).orderBy(col("v"), col("id"))
    val wAll = if (globalForm)
      Window.partitionBy().rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    else Window.partitionBy(col("grp"))
    val exp = df
      .withColumn("rn", row_number().over(w))
      .withColumn("prefix", coalesce(sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_grp", count(lit(1)).over(wAll))
      .withColumn("gtot", sum(col("v")).over(wAll))
    val cols = Seq("id", "grp", "v", "rn", "n_grp", "prefix", "gtot")
    val a = got.select(cols.map(col): _*).orderBy(col("id")).collect()
    val b = exp.select(cols.map(col): _*).orderBy(col("id")).collect()
    assert(a.length == n && b.length == n)
    a.zip(b).foreach { case (x, y) =>
      assert(x == y, s"n=$n groups=$groups global=$globalForm: $x vs $y")
    }
  }

  test("grouped rank+prefix matches the window reference") {
    check(500, 7, globalForm = false)
  }

  test("global rank+prefix matches the window reference") {
    check(500, 1, globalForm = true)
  }

  test("one giant group (the skew case groupRank exists for)") {
    check(400, 1, globalForm = false)
  }

  test("singleton groups (offset table = one row per group-partition)") {
    check(64, 64, globalForm = false)
  }

  test("fewer rows than shuffle partitions") {
    check(5, 2, globalForm = false)
    check(3, 1, globalForm = true)
  }

  test("rank without a value column omits prefix/gtot") {
    val got = Det.rankPrefix(mk(50, 3), Seq(col("grp")),
      Seq(col("v"), col("id")))
    assert(got.columns.contains("rn") && got.columns.contains("n_grp"))
    assert(!got.columns.contains("prefix") && !got.columns.contains("gtot"))
  }
}
