package graft

import org.apache.spark.sql.functions._

/** geo_proximity_capped's per-cell density cap (r11): events in a
  * (10-min bucket, 1°-cell) whose event count exceeds CpaCellCap (64) are
  * excluded from the pair join wholesale and surface in
  * geo_proximity_overflow with capped=true; every other cell's output is
  * byte-identical to the uncapped geo_proximity_pairs. Pinned on a
  * synthetic corpus with one 80-event hub cell and one 3-event sparse
  * cell — the CpaCapSpec pattern, applied to the proximity family.
  *
  * Position formula (Geo.evPts): lat = user_id*37 % 140 - 70 + value/1000,
  * lon = event_id*73 % 360 - 180 + value/2000. With value = 0 a residue
  * class (u*37 % 140 == r, e*73 % 360 == r') pins every event of a group
  * to ONE exact point, so cell density is chosen purely by counting ids.
  */
class ProximityCapSpec extends SparkSpecBase {

  private def userIds(latRes: Int, n: Int): Seq[Long] =
    Iterator.iterate(1L)(_ + 1).filter(_ * 37 % 140 == latRes).take(n).toSeq
  private def eventIds(lonRes: Int, n: Int): Seq[Long] =
    Iterator.iterate(1L)(_ + 1).filter(_ * 73 % 360 == lonRes).take(n).toSeq

  /** cells: (latRes, lonRes, count). All events share tb = 1 (ts 1000 s);
    * distinct lonRes keeps event_id classes (and cells) disjoint.
    */
  private def writeCorpus(cells: Seq[(Int, Int, Int)]): (String, Map[Int, Set[Long]]) = {
    import spark.implicits._
    val perCell = cells.map { case (latRes, lonRes, n) =>
      lonRes -> (userIds(latRes, n), eventIds(lonRes, n))
    }
    val rows = perCell.flatMap { case (_, (us, es)) =>
      us.zip(es).map { case (u, e) => (e, 1000L, u, "x", 0.0, "{}") }
    }
    val dir = java.nio.file.Files.createTempDirectory("proxcap").toString
    rows.toDF("event_id", "ts_raw", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("ts_raw"))).drop("ts_raw")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    (dir, perCell.map { case (lonRes, (_, es)) => lonRes -> es.toSet }.toMap)
  }

  // hub: 80 co-located events (> CpaCellCap) at (35, 65);
  // sparse: 3 co-located events at (-50, -80)
  private val hub = (105, 245, 80)
  private val sparse = (20, 100, 3)

  test("overdense cell is excluded from capped pairs; uncapped twin keeps it") {
    val (dir, ids) = writeCorpus(Seq(hub, sparse))
    val hubEvents = ids(245)

    val capped = SparkEntry.queries("geo_proximity_capped")(spark, dir).collect()
    assert(capped.nonEmpty, "cap must not empty the output")
    assert(capped.length == 3, "sparse cell yields C(3,2) = 3 pairs")
    assert(capped.forall(r => !hubEvents(r.getAs[Long]("event_a"))
      && !hubEvents(r.getAs[Long]("event_b"))),
      "capped-cell event leaked into the pair join")
    assert(capped.forall(_.getAs[Double]("dist_km") == 0.0))

    // excluded-pair parity: uncapped pairs minus hub-touching pairs ==
    // capped output, as exact tuples
    val pairs = SparkEntry.queries("geo_proximity_pairs")(spark, dir).collect()
    assert(pairs.length == 80 * 79 / 2 + 3, "uncapped twin lists the hub")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("event_a"), r.getAs[Long]("event_b"),
        r.getAs[Long]("tb"), r.getAs[Double]("dist_km"))
    val survivors = pairs.filter(r => !hubEvents(r.getAs[Long]("event_a"))
      && !hubEvents(r.getAs[Long]("event_b"))).map(key).toSet
    assert(capped.map(key).toSet == survivors,
      "capped output must equal uncapped-minus-hub, tuple for tuple")
  }

  test("overflow audit reports the hub as capped, the sparse cell as not") {
    val (dir, _) = writeCorpus(Seq(hub, sparse))
    val ovf = SparkEntry.queries("geo_proximity_overflow")(spark, dir).collect()
    val cappedRows = ovf.filter(_.getAs[Boolean]("capped"))
    assert(cappedRows.length == 1)
    assert(cappedRows.head.getAs[Long]("n_events") == 80L)
    assert(cappedRows.head.getAs[Long]("cl") == 35L)
    assert(cappedRows.head.getAs[Long]("cn") == 65L)
    val uncapped = ovf.filter(!_.getAs[Boolean]("capped"))
    assert(uncapped.exists(r => r.getAs[Long]("n_events") == 3L
      && r.getAs[Long]("cl") == -50L && r.getAs[Long]("cn") == -80L))
  }

  test("uncapped cells' output is unchanged by the hub's presence") {
    val (full, _) = writeCorpus(Seq(hub, sparse))
    val (sparseOnly, _) = writeCorpus(Seq(sparse))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("event_a"), r.getAs[Long]("event_b"),
        r.getAs[Long]("tb"), r.getAs[Double]("dist_km"))
    val a = SparkEntry.queries("geo_proximity_capped")(spark, full)
      .collect().map(key).toSet
    val b = SparkEntry.queries("geo_proximity_pairs")(spark, sparseOnly)
      .collect().map(key).toSet
    assert(a == b, "sparse-cell pairs differ between capped run and " +
      "hub-free uncapped corpus")
  }

  test("sf corpus is nowhere near the cap (gate outputs uncapped)") {
    // the driver's uniform synthetic never co-locates two events in one
    // (10-min, 1°) cell at gate SFs — the overflow table is empty, the
    // cap provably inert (all gate pairs come from NEIGHBOR cells)
    val ovf = SparkEntry.queries("geo_proximity_overflow")(
      spark, "/root/testdata/sf0.01").collect()
    assert(ovf.forall(!_.getAs[Boolean]("capped")))
    assert(ovf.isEmpty)
  }
}
