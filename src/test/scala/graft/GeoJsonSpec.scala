package graft

import graft.sources.GeoJson
import org.apache.spark.sql.functions._

class GeoJsonSpec extends SparkSpecBase {

  private val fc =
    """{"type":"FeatureCollection","features":[
      |{"type":"Feature","properties":{"fid":"7","name":"probe"},
      | "geometry":{"type":"Point","coordinates":[1.5,2.5]}},
      |{"type":"Feature","properties":{"fid":"8"},
      | "geometry":{"type":"LineString","coordinates":[[0.0,0.0],[1.0,1.0],[2.0,0.5]]}},
      |{"type":"Feature","properties":{"fid":"9"},
      | "geometry":{"type":"Polygon","coordinates":[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,0.0]],
      |                                             [[1.0,1.0],[2.0,1.0],[1.0,2.0],[1.0,1.0]]]}},
      |{"type":"Feature","properties":{"fid":"10"},
      | "geometry":{"type":"MultiPolygon","coordinates":[[[[10.0,10.0],[11.0,10.0],[10.0,11.0],[10.0,10.0]]],
      |                                                  [[[20.0,20.0],[21.0,20.0],[20.0,21.0],[20.0,20.0]]]]}}
      |]}""".stripMargin.replace("\n", "")

  test("parse: all geometry types explode to the right vertex rows") {
    import spark.implicits._
    val rows = GeoJson.parse(Seq(fc).toDF("g"), col("g"))
      .select("feature_pos", "geom_type", "part_idx", "ring_idx", "pt_idx", "lon", "lat")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getDouble(5), r.getDouble(6)))
    // point: one vertex at part 0 / ring 0 / pt 0
    assert(rows.filter(_._1 == 0) sameElements
      Array((0, "Point", 0, 0, 0, 1.5, 2.5)))
    // linestring: 3 vertices in order
    assert(rows.filter(_._1 == 1).map(t => (t._5, t._6, t._7)).toSeq ==
      Seq((0, 0.0, 0.0), (1, 1.0, 1.0), (2, 2.0, 0.5)))
    // polygon: outer ring 4 + hole ring 4, ring_idx distinguishes
    val poly = rows.filter(_._1 == 2)
    assert(poly.count(_._4 == 0) == 4 && poly.count(_._4 == 1) == 4)
    assert(poly.forall(_._2 == "Polygon"))
    // multipolygon: two parts
    val mp = rows.filter(_._1 == 3)
    assert(mp.count(_._3 == 0) == 4 && mp.count(_._3 == 1) == 4)
  }

  test("parse: properties map and malformed features survive") {
    import spark.implicits._
    val feats = GeoJson.features(Seq(fc).toDF("g"), col("g")).collect()
    assert(feats.length == 4)
    val p0 = feats(0).getAs[Map[String, String]]("properties")
    assert(p0("fid") == "7" && p0("name") == "probe")
    // unknown geometry type surfaces as ONE sentinel vertex row (null
    // lon/lat, geom_type preserved) — visible downstream, not a crash and
    // not a silent drop
    val odd = """{"type":"FeatureCollection","features":[
      |{"type":"Feature","properties":{},"geometry":{"type":"Weird","coordinates":[1.0]}}]}"""
      .stripMargin.replace("\n", "")
    val sent = GeoJson.parse(Seq(odd).toDF("g"), col("g")).collect()
    assert(sent.length == 1)
    assert(sent(0).getAs[String]("geom_type") == "Weird")
    assert(sent(0).isNullAt(sent(0).fieldIndex("lon")))
  }

  test("parsed polygon rings drive point-in-polygon: station centers inside") {
    // closes the loop with geo_polygon: the pentagon rings recovered by the
    // reader contain their generating station point (winding test on the
    // parsed vertices, not the source offsets)
    val rows = run("geo_geojson")
      .filter(col("geom_type") === "Polygon").collect()
    val rings = rows.groupBy(_.getAs[String]("fid")).map { case (fid, vs) =>
      fid -> vs.sortBy(_.getAs[Int]("pt_idx")).map(r =>
        (r.getAs[Double]("lat"), r.getAs[Double]("lon")))
    }
    assert(rings.nonEmpty)
    rings.foreach { case (fid, ring) =>
      val key = fid.toLong
      val (cLat, cLon) = ((key * 53 % 140 - 70).toDouble, (key * 97 % 360 - 180).toDouble)
      // counterclockwise pentagon: center must be left of every edge
      val inside = ring.dropRight(1).zip(ring.tail).forall { case ((y1, x1), (y2, x2)) =>
        (x2 - x1) * (cLat - y1) - (y2 - y1) * (cLon - x1) >= 0.0
      } || ring.dropRight(1).zip(ring.tail).forall { case ((y1, x1), (y2, x2)) =>
        (x2 - x1) * (cLat - y1) - (y2 - y1) * (cLon - x1) <= 0.0
      }
      assert(inside, s"station $fid not inside its parsed pentagon")
    }
  }

  test("geo_geojson query is non-empty and round-trips station points") {
    val rows = run("geo_geojson").collect()
    assert(rows.nonEmpty)
    val pts = rows.filter(_.getAs[String]("geom_type") == "Point")
    val polys = rows.filter(_.getAs[String]("geom_type") == "Polygon")
    assert(pts.nonEmpty && polys.length == 6 * pts.length)
  }
}
