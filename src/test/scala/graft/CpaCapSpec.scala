package graft

import org.apache.spark.sql.functions._

/** geo_cpa's per-cell density cap (r9): members of a (time-bucket, cell)
  * whose latest-fix count exceeds CpaCellCap (64) are excluded from the
  * pair join and surface in geo_cpa_overflow instead; every other cell's
  * output is byte-identical to the uncapped query. Pinned on a synthetic
  * corpus with one 80-entity hub cell and one 3-entity sparse cell:
  * user ids are chosen by residue (mod 8·5·7·17·23) so the hub position
  * formula puts each group at ONE exact point with zero drift velocity.
  */
class CpaCapSpec extends SparkSpecBase {

  // all users in a class share hub, per-user offsets, and zero drift
  // (u%5==2, u%7==3) => identical positions, same 1-degree cell
  private def usersOf(hubRes: Int, n: Int): Seq[Long] =
    Iterator.iterate(1L)(_ + 1).filter(u =>
      u % 8 == hubRes && u % 5 == 2 && u % 17 == 9 &&
        u % 23 == 12 && u % 7 == 3).take(n).toSeq

  private def writeCorpus(users: Seq[Long]): String = {
    import spark.implicits._
    // two fixes per user inside one 30-min bucket (lag needs a prev row)
    val rows = users.zipWithIndex.flatMap { case (u, i) =>
      Seq((i * 2L + 1, 1000L, u), (i * 2L + 2, 1600L, u))
    }
    val dir = java.nio.file.Files.createTempDirectory("cpacap").toString
    rows.toDF("event_id", "ts_raw", "user_id")
      .withColumn("ts", timestamp_seconds(col("ts_raw"))).drop("ts_raw")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val dense = usersOf(0, 80) // > CpaCellCap
  private val sparse = usersOf(1, 3)

  test("overdense cell is excluded from pairs and reported as capped") {
    val dir = writeCorpus(dense ++ sparse)
    val pairs = SparkEntry.queries("geo_cpa")(spark, dir).collect()
    val denseSet = dense.toSet
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => !denseSet(r.getAs[Long]("user_a"))
      && !denseSet(r.getAs[Long]("user_b"))),
      "capped-cell entity leaked into the pair join")
    // the 3 co-located sparse users yield C(3,2)=3 zero-distance pairs
    assert(pairs.length == 3)
    assert(pairs.forall(_.getAs[Double]("d_cpa_km") == 0.0))

    val ovf = SparkEntry.queries("geo_cpa_overflow")(spark, dir).collect()
    val capped = ovf.filter(_.getAs[Boolean]("capped"))
    assert(capped.length == 1)
    assert(capped.head.getAs[Long]("n_entities") == 80L)
    val uncapped = ovf.filter(!_.getAs[Boolean]("capped"))
    assert(uncapped.exists(_.getAs[Long]("n_entities") == 3L))
  }

  test("uncapped cells' output is unchanged by the cap") {
    val full = writeCorpus(dense ++ sparse)
    val sparseOnly = writeCorpus(sparse)
    val a = SparkEntry.queries("geo_cpa")(spark, full).collect()
      .map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b"),
        r.getAs[Long]("tb"), r.getAs[Double]("t_cpa_min"),
        r.getAs[Double]("d_cpa_km"))).toSet
    val b = SparkEntry.queries("geo_cpa")(spark, sparseOnly).collect()
      .map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b"),
        r.getAs[Long]("tb"), r.getAs[Double]("t_cpa_min"),
        r.getAs[Double]("d_cpa_km"))).toSet
    assert(a == b, "sparse-cell pairs differ between capped run and " +
      "dense-free corpus")
  }

  test("sf corpus is nowhere near the cap (gate outputs uncapped)") {
    val ovf = SparkEntry.queries("geo_cpa_overflow")(spark, sf).collect()
    assert(ovf.forall(!_.getAs[Boolean]("capped")))
    assert(ovf.map(_.getAs[Long]("n_entities")).max <= 16L)
  }
}
