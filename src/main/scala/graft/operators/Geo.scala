package graft.operators

import graft.{Det, Q, Tables}
import graft.Det._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** §2.C geospatial ops — odin_common/src/geo.rs re-expressed as codegen'd
  * column math: haversine_distance (geo.rs:167), bearing_from (geo.rs:102),
  * GeoRect containment (geo.rs:216), polygon contains (geo.rs:409), plus
  * the grid binning the GOES-R/HRRR stores imply.
  *
  * The synthetic tables carry no coordinates, so positions derive
  * deterministically from integer columns (identical formula on the DuckDB
  * side — integer modular arithmetic plus IEEE +,-,*,/ is bit-exact across
  * engines). Trig outputs are rounded to 3 decimals, far above libm
  * cross-implementation disagreement (~1e-11 rel).
  */
object Geo {

  // -- position derivation (Spark side) --
  private def evPts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("lat", (col("user_id") * 37 % 140 - 70).cast(DoubleType)
        + col("value") / lit(1000.0))
      .withColumn("lon", (col("event_id") * 73 % 360 - 180).cast(DoubleType)
        + col("value") / lit(2000.0))

  // -- position derivation (DuckDB side; identical op order) --
  private val LAT = "(CAST(user_id*37 % 140 - 70 AS DOUBLE) + value/1000.0)"
  private val LON = "(CAST(event_id*73 % 360 - 180 AS DOUBLE) + value/2000.0)"

  /** Haversine km via the codegen-native graft.functions.HaversineKm —
    * same formula as the DuckDB oracle (rounded to 3 decimals at use).
    */
  private def havC(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    graft.functions.GeoFunctions.haversine_km(lat1, lon1, lat2, lon2)

  private def havS(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"""12742.0*asin(sqrt(least(1.0,
       pow(sin((radians($lat2)-radians($lat1))/2),2)
       + cos(radians($lat1))*cos(radians($lat2))
         *pow(sin((radians($lon2)-radians($lon1))/2),2))))"""

  /** Initial bearing in degrees [0,360), rounded to 3 decimals. */
  private def bearC(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val b = degrees(atan2(
      sin(radians(lon2) - radians(lon1)) * cos(radians(lat2)),
      cos(radians(lat1)) * sin(radians(lat2))
        - sin(radians(lat1)) * cos(radians(lat2)) * cos(radians(lon2) - radians(lon1))))
    (b + 360.0) % 360.0
  }

  private def bearS(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"""(degrees(atan2(
        sin(radians($lon2)-radians($lon1))*cos(radians($lat2)),
        cos(radians($lat1))*sin(radians($lat2))
        - sin(radians($lat1))*cos(radians($lat2))*cos(radians($lon2)-radians($lon1)))) + 360.0) % 360.0"""

  // station positions from supplier keys (10 fixed "ground stations")
  private def stations(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "supplier").select(col("s_suppkey"),
      (col("s_suppkey") * 53 % 140 - 70).cast(DoubleType).as("s_lat"),
      (col("s_suppkey") * 97 % 360 - 180).cast(DoubleType).as("s_lon"))

  private val SLAT = "CAST(s_suppkey*53 % 140 - 70 AS DOUBLE)"
  private val SLON = "CAST(s_suppkey*97 % 360 - 180 AS DOUBLE)"

  private val wTrack = Window.partitionBy(col("user_id"))
    .orderBy(col("ts_sec"), col("event_id"))

  /** WGS84 → UTM forward projection (Krüger series), mirroring
    * odin_common/src/utm.rs. Adds utm_zone / utm_easting / utm_northing
    * columns; pure codegen'd column arithmetic.
    */
  def withUtm(df: DataFrame, lat: Column, lon: Column): DataFrame = {
    val a = 6378137.0
    val f = 1.0 / 298.257223563
    val k0 = 0.9996
    val e2 = f * (2 - f)
    val ep2 = e2 / (1 - e2)
    val e4 = e2 * e2
    val e6 = e4 * e2
    val zone = (floor((lon + 180.0) / 6.0) + 1).cast(LongType)
    val lam0 = radians((zone - 1) * 6.0 - 180.0 + 3.0)
    val phi = radians(lat)
    val lam = radians(lon)
    val sinP = sin(phi); val cosP = cos(phi); val tanP = tan(phi)
    val nN = lit(a) / sqrt(lit(1.0) - lit(e2) * sinP * sinP)
    val t = tanP * tanP
    val c = lit(ep2) * cosP * cosP
    val bigA = cosP * (lam - lam0)
    val m = lit(a) * (
      lit(1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - lit(3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * sin(phi * 2)
        + lit(15 * e4 / 256 + 45 * e6 / 1024) * sin(phi * 4)
        - lit(35 * e6 / 3072) * sin(phi * 6))
    val a2 = bigA * bigA; val a3 = a2 * bigA; val a4 = a3 * bigA
    val a5 = a4 * bigA; val a6 = a5 * bigA
    val easting = lit(500000.0) + lit(k0) * nN * (bigA
      + (lit(1.0) - t + c) * a3 / 6.0
      + (lit(5.0) - t * 18.0 + t * t + c * 72.0 - lit(58 * ep2)) * a5 / 120.0)
    val northingRaw = lit(k0) * (m + nN * tanP * (a2 / 2.0
      + (lit(5.0) - t + c * 9.0 + c * c * 4.0) * a4 / 24.0
      + (lit(61.0) - t * 58.0 + t * t + c * 600.0 - lit(330 * ep2)) * a6 / 720.0))
    val northing = when(lat >= 0.0, northingRaw).otherwise(northingRaw + 10000000.0)
    df.withColumn("utm_zone", zone)
      .withColumn("utm_easting", easting)
      .withColumn("utm_northing", northing)
  }

  val defs: Seq[(String, Q)] = Seq(

    // ----- geo_bbox: GeoRect containment filter --------------------------
    "geo_bbox" -> Q(
      build = (s, d) =>
        evPts(s, d)
          .filter(col("lat") >= -20.0 && col("lat") <= 40.0
            && col("lon") >= -60.0 && col("lon") <= 60.0)
          .select(col("event_id"), col("user_id"), col("lat"), col("lon"))
          .orderBy(col("event_id")),
      oracle = Some(s"""
        SELECT event_id, user_id, $LAT AS lat, $LON AS lon FROM events
        WHERE $LAT >= -20.0 AND $LAT <= 40.0 AND $LON >= -60.0 AND $LON <= 60.0
        ORDER BY event_id""")),

    // ----- geo_haversine: per-track segment lengths ----------------------
    "geo_haversine" -> Q(
      build = (s, d) =>
        evPts(s, d)
          .withColumn("plat", lag(col("lat"), 1).over(wTrack))
          .withColumn("plon", lag(col("lon"), 1).over(wTrack))
          .filter(col("plat").isNotNull)
          .select(col("user_id"), col("event_id"),
            round(havC(col("plat"), col("plon"), col("lat"), col("lon")), 3)
              .as("seg_km"))
          .orderBy(col("user_id"), col("event_id")),
      oracle = Some(s"""
        SELECT user_id, event_id,
               round(${havS("plat", "plon", "lat", "lon")}, 3) AS seg_km
        FROM (
          SELECT user_id, event_id, lat, lon,
                 LAG(lat,1) OVER w AS plat, LAG(lon,1) OVER w AS plon
          FROM (SELECT user_id, event_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
                       $LAT AS lat, $LON AS lon FROM events)
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
        WHERE plat IS NOT NULL
        ORDER BY user_id, event_id"""),
      bench = true),

    // ----- geo_bearing: course between consecutive positions -------------
    "geo_bearing" -> Q(
      build = (s, d) =>
        evPts(s, d)
          .withColumn("plat", lag(col("lat"), 1).over(wTrack))
          .withColumn("plon", lag(col("lon"), 1).over(wTrack))
          .filter(col("plat").isNotNull)
          .select(col("user_id"), col("event_id"),
            round(bearC(col("plat"), col("plon"), col("lat"), col("lon")), 3)
              .as("bearing_deg"))
          .orderBy(col("user_id"), col("event_id")),
      oracle = Some(s"""
        SELECT user_id, event_id,
               round(${bearS("plat", "plon", "lat", "lon")}, 3) AS bearing_deg
        FROM (
          SELECT user_id, event_id, lat, lon,
                 LAG(lat,1) OVER w AS plat, LAG(lon,1) OVER w AS plon
          FROM (SELECT user_id, event_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
                       $LAT AS lat, $LON AS lon FROM events)
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
        WHERE plat IS NOT NULL
        ORDER BY user_id, event_id""")),

    // ----- geo_grid_agg: 5°-cell binning + per-cell aggregation ----------
    "geo_grid_agg" -> Q(
      build = (s, d) =>
        evPts(s, d)
          .withColumn("cell_lat", floor(col("lat") / 5.0).cast(LongType))
          .withColumn("cell_lon", floor(col("lon") / 5.0).cast(LongType))
          .groupBy(col("cell_lat"), col("cell_lon"))
          .agg(count(lit(1)).as("n_points"), qsum(col("value")).as("val_sum"))
          .orderBy(col("cell_lat"), col("cell_lon")),
      oracle = Some(s"""
        SELECT CAST(floor($LAT/5.0) AS BIGINT) AS cell_lat,
               CAST(floor($LON/5.0) AS BIGINT) AS cell_lon,
               COUNT(*) AS n_points, ${QSUM("value")} AS val_sum
        FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
      bench = true),

    // ----- geo_hotspot_cells: top-density cells (hotspot map ranking) ----
    // The "where is it burning most" rollup over the gridded hotspot store
    // (odin_goesr gridding + display ranking): rank 5-degree cells by point
    // count, keep the top 10 with rank and share-of-total. Partial (map-
    // side) agg then a tiny global top-k — TakeOrdered, no full sort.
    "geo_hotspot_cells" -> Q(
      build = (s, d) => {
        val cells = evPts(s, d)
          .withColumn("cell_lat", floor(col("lat") / 5.0).cast(LongType))
          .withColumn("cell_lon", floor(col("lon") / 5.0).cast(LongType))
          .groupBy(col("cell_lat"), col("cell_lon"))
          .agg(count(lit(1)).as("n_points"))
        val total = cells.agg(sum(col("n_points")).as("n_total"))
        val w = Window.orderBy(col("n_points").desc, col("cell_lat"), col("cell_lon"))
        cells.crossJoin(broadcast(total))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select(col("rank"), col("cell_lat"), col("cell_lon"), col("n_points"),
            (col("n_points").cast(DoubleType) / col("n_total")).as("share"))
          .orderBy(col("rank"))
      },
      oracle = Some(s"""
        WITH cells AS (
          SELECT CAST(floor($LAT/5.0) AS BIGINT) AS cell_lat,
                 CAST(floor($LON/5.0) AS BIGINT) AS cell_lon,
                 COUNT(*) AS n_points
          FROM events GROUP BY 1, 2),
        total AS (SELECT CAST(SUM(n_points) AS BIGINT) AS n_total FROM cells)
        SELECT rank, cell_lat, cell_lon, n_points,
               CAST(n_points AS DOUBLE) / n_total AS share
        FROM (
          SELECT c.*, t.n_total,
                 CAST(ROW_NUMBER() OVER (ORDER BY n_points DESC, cell_lat, cell_lon)
                      AS INT) AS rank
          FROM cells c, total t)
        WHERE rank <= 10 ORDER BY rank""")),

    // ----- geo_nearest: nearest ground station per sampled point ---------
    // Broadcast the tiny station table; at scale the same op grid-buckets
    // both sides first (see SURVEY §4).
    "geo_nearest" -> Q(
      build = (s, d) => {
        val pts = evPts(s, d).filter(col("event_id") % 97 === 0)
          .select(col("event_id"), col("lat"), col("lon"))
        val joined = pts.crossJoin(broadcast(stations(s, d)))
          .withColumn("dist_km",
            round(havC(col("lat"), col("lon"), col("s_lat"), col("s_lon")), 3))
        // argmin as a struct-min aggregate: lexicographic (dist, station)
        // min equals the window row_number ordering, but partial-aggregates
        // map-side — no per-event sort, no window shuffle of all candidates
        joined.groupBy(col("event_id"))
          .agg(min(struct(col("dist_km"), col("s_suppkey"))).as("m"))
          .select(col("event_id"), col("m.s_suppkey").as("nearest_station"),
            col("m.dist_km").as("dist_km"))
          .orderBy(col("event_id"))
      },
      oracle = Some(s"""
        SELECT event_id, nearest_station, dist_km FROM (
          SELECT e.event_id, s.s_suppkey AS nearest_station,
                 round(${havS("e.lat", "e.lon", "s.s_lat", "s.s_lon")}, 3) AS dist_km,
                 ROW_NUMBER() OVER (PARTITION BY e.event_id
                   ORDER BY round(${havS("e.lat", "e.lon", "s.s_lat", "s.s_lon")}, 3),
                            s.s_suppkey) AS rn
          FROM (SELECT event_id, $LAT AS lat, $LON AS lon FROM events
                WHERE event_id % 97 = 0) e
          CROSS JOIN (SELECT s_suppkey, $SLAT AS s_lat, $SLON AS s_lon FROM supplier) s)
        WHERE rn = 1 ORDER BY event_id""")),

    // ----- geo_closest_point: closest point on segment (geo.rs:179) ------
    // ClosestGeoPoint re-expressed: project each event onto a fixed
    // planar segment, clamp to the segment, report the foot point and
    // distance. Pure +,-,*,/,sqrt — bit-identical across engines, no
    // rounding needed.
    "geo_closest_point" -> Q(
      build = (s, d) => {
        val (aLat, aLon, bLat, bLon) = (-30.0, -60.0, 40.0, 60.0)
        val num = (col("lat") - aLat) * (bLat - aLat) + (col("lon") - aLon) * (bLon - aLon)
        val den = lit((bLat - aLat) * (bLat - aLat) + (bLon - aLon) * (bLon - aLon))
        val t = least(lit(1.0), greatest(lit(0.0), num / den))
        val cLat = t * (bLat - aLat) + aLat
        val cLon = t * (bLon - aLon) + aLon
        evPts(s, d)
          .select(col("event_id"), t.as("t"),
            cLat.as("c_lat"), cLon.as("c_lon"),
            sqrt((col("lat") - cLat) * (col("lat") - cLat)
              + (col("lon") - cLon) * (col("lon") - cLon)).as("planar_dist"))
          .orderBy(col("event_id"))
      },
      oracle = Some(s"""
        SELECT event_id, t, t*70.0 + -30.0 AS c_lat, t*120.0 + -60.0 AS c_lon,
               sqrt((lat - (t*70.0 + -30.0))*(lat - (t*70.0 + -30.0))
                    + (lon - (t*120.0 + -60.0))*(lon - (t*120.0 + -60.0))) AS planar_dist
        FROM (
          SELECT event_id, lat, lon,
                 least(1.0, greatest(0.0,
                   ((lat - -30.0)*70.0 + (lon - -60.0)*120.0) / 19300.0)) AS t
          FROM (SELECT event_id, $LAT AS lat, $LON AS lon FROM events))
        ORDER BY event_id""")),

    // ----- geo_utm: WGS84 → UTM projection (odin_common/src/utm.rs) ------
    // Standard Krüger series, all codegen'd column math (no UDF). Rows-
    // only: transcendental chains are too long for cross-engine hash
    // equality; the spec pins known geodetic fixtures to ±1 m instead.
    "geo_utm" -> Q(
      build = (s, d) => {
        val pts = evPts(s, d).filter(col("lat") > -80.0 && col("lat") < 84.0)
        Geo.withUtm(pts, col("lat"), col("lon"))
          .select(col("event_id"), col("utm_zone"), col("utm_easting"),
            col("utm_northing"))
          .orderBy(col("event_id"))
      },
      oracle = None),

    // ----- geo_polygon: point-in-convex-polygon --------------------------
    // Winding test per odin_common/src/geo.rs:409 `contains`; a convex
    // pentagon, all cross products <= 0 going clockwise. Pure arithmetic →
    // hash-checked against the identical predicate in DuckDB.
    "geo_polygon" -> Q(
      build = (s, d) => {
        // clockwise convex pentagon
        val poly = Seq((0.0, -40.0), (30.0, -10.0), (20.0, 30.0), (-20.0, 30.0), (-30.0, -10.0))
        val edges = poly.zip(poly.tail :+ poly.head)
        val inside = edges.map { case ((y1, x1), (y2, x2)) =>
          ((lit(x2) - lit(x1)) * (col("lat") - lit(y1))
            - (lit(y2) - lit(y1)) * (col("lon") - lit(x1))) <= 0.0
        }.reduce(_ && _)
        evPts(s, d)
          .filter(inside)
          .select(col("event_id"), col("lat"), col("lon"))
          .orderBy(col("event_id"))
      },
      oracle = {
        val poly = Seq((0.0, -40.0), (30.0, -10.0), (20.0, 30.0), (-20.0, 30.0), (-30.0, -10.0))
        val edges = poly.zip(poly.tail :+ poly.head)
        val pred = edges.map { case ((y1, x1), (y2, x2)) =>
          s"(($x2 - $x1)*(lat - $y1) - ($y2 - $y1)*(lon - $x1)) <= 0.0"
        }.mkString(" AND ")
        Some(s"""
          SELECT event_id, lat, lon
          FROM (SELECT event_id, $LAT AS lat, $LON AS lon FROM events)
          WHERE $pred
          ORDER BY event_id""")
      }),

    // ----- geo_dem_bilinear: grid lookup + bilinear interpolation --------
    // The odin_dem / odin_wind probe: sample a raster (here a synthetic
    // 1-degree DEM realized as a 50k-row grid TABLE, the post-GDAL-decode
    // shape) at each event position via bilinear interpolation of the 4
    // surrounding cells. The probe explodes to its 4 corner keys and
    // equi-joins the grid — the co-partitionable O(4n) shape that scales to
    // a continental 1-arcsecond raster, vs. the driver-side array lookup a
    // native engine does. Pure +,-,*,/ arithmetic: bit-identical, no
    // rounding.
    "geo_dem_bilinear" -> Q(
      build = (s, d) => {
        // synthetic DEM: elev(i,j) deterministic from the cell indices
        val grid = s.range(-70, 71).select(col("id").as("gi"))
          .crossJoin(s.range(-180, 181).select(col("id").as("gj")))
          .select(col("gi"), col("gj"),
            (((col("gi") * 31 + col("gj") * 17) % 500 + 500) % 500 + lit(100.0))
              .as("elev"))
        val probes = evPts(s, d)
          .select(col("event_id"), col("lat"), col("lon"),
            floor(col("lat")).cast(LongType).as("i"),
            floor(col("lon")).cast(LongType).as("j"))
          .withColumn("di", col("lat") - col("i"))
          .withColumn("dj", col("lon") - col("j"))
        val corners = probes
          .withColumn("ci", explode(array(lit(0L), lit(1L))))
          .withColumn("cj", explode(array(lit(0L), lit(1L))))
        val weighted = corners
          .join(grid, corners("i") + corners("ci") === grid("gi")
            && corners("j") + corners("cj") === grid("gj"))
          .withColumn("w",
            (when(col("ci") === 0L, lit(1.0) - col("di")).otherwise(col("di")))
              * (when(col("cj") === 0L, lit(1.0) - col("dj")).otherwise(col("dj"))))
          // fixed summand order (ci,cj): (0,0),(0,1),(1,0),(1,1) via 2*ci+cj
          .withColumn("ord", col("ci") * 2 + col("cj"))
        weighted
          .groupBy(col("event_id"), col("lat"), col("lon"))
          .agg(sum(when(col("ord") === 0, col("w") * col("elev")).otherwise(0.0))
            .as("t00"),
            sum(when(col("ord") === 1, col("w") * col("elev")).otherwise(0.0)).as("t01"),
            sum(when(col("ord") === 2, col("w") * col("elev")).otherwise(0.0)).as("t10"),
            sum(when(col("ord") === 3, col("w") * col("elev")).otherwise(0.0)).as("t11"))
          .select(col("event_id"), col("lat"), col("lon"),
            (col("t00") + col("t01") + col("t10") + col("t11")).as("elev_m"))
          .orderBy(col("event_id"))
      },
      oracle = Some(s"""
        WITH grid AS (
          SELECT gi.i AS gi, gj.j AS gj,
                 CAST(((gi.i*31 + gj.j*17) % 500 + 500) % 500 AS DOUBLE) + 100.0 AS elev
          FROM generate_series(-70, 70) AS gi(i),
               generate_series(-180, 180) AS gj(j)),
        probes AS (
          SELECT event_id, lat, lon,
                 CAST(floor(lat) AS BIGINT) AS i, CAST(floor(lon) AS BIGINT) AS j,
                 lat - CAST(floor(lat) AS BIGINT) AS di,
                 lon - CAST(floor(lon) AS BIGINT) AS dj
          FROM (SELECT event_id, $LAT AS lat, $LON AS lon FROM events)),
        corners AS (
          SELECT p.*, ci.c AS ci, cj.c AS cj
          FROM probes p, generate_series(0, 1) AS ci(c), generate_series(0, 1) AS cj(c)),
        weighted AS (
          SELECT c.event_id, c.lat, c.lon, c.ci*2 + c.cj AS ord,
                 (CASE WHEN c.ci = 0 THEN 1.0 - c.di ELSE c.di END)
                 * (CASE WHEN c.cj = 0 THEN 1.0 - c.dj ELSE c.dj END) * g.elev AS we
          FROM corners c JOIN grid g ON c.i + c.ci = g.gi AND c.j + c.cj = g.gj)
        SELECT event_id, lat, lon,
               SUM(CASE WHEN ord = 0 THEN we ELSE 0.0 END)
               + SUM(CASE WHEN ord = 1 THEN we ELSE 0.0 END)
               + SUM(CASE WHEN ord = 2 THEN we ELSE 0.0 END)
               + SUM(CASE WHEN ord = 3 THEN we ELSE 0.0 END) AS elev_m
        FROM weighted
        GROUP BY event_id, lat, lon
        ORDER BY event_id""")),

    // ----- geo_ecef: geodetic -> ECEF cartesian --------------------------
    // WGS84 ellipsoid conversion (odin_common/src/cartesian3.rs:595
    // `From<&Cartographic> for Cartesian3`, constants geo_constants.rs:24),
    // the transform every Cesium-facing track needs. Trig -> rounded to
    // 3 decimals (mm). Narrow map over the scan, no shuffle except the
    // deterministic output order.
    "geo_ecef" -> Q(
      build = (s, d) => {
        val a2 = 6378137.0 * 6378137.0
        val b2 = 6356752.3142451793 * 6356752.3142451793
        val phi = radians(col("lat"))
        val lam = radians(col("lon"))
        val h = col("value") // reading as height-above-ellipsoid meters
        val n = lit(a2) / sqrt(lit(a2) * cos(phi) * cos(phi)
          + lit(b2) * sin(phi) * sin(phi))
        evPts(s, d)
          .withColumn("x", round((n + h) * cos(phi) * cos(lam), 3))
          .withColumn("y", round((n + h) * cos(phi) * sin(lam), 3))
          .withColumn("z", round((lit(b2) / lit(a2) * n + h) * sin(phi), 3))
          .select(col("event_id"), col("lat"), col("lon"), col("x"), col("y"),
            col("z"))
          .orderBy(col("event_id"))
      },
      oracle = Some(s"""
        SELECT event_id, lat, lon,
               round((n + value)*cos(radians(lat))*cos(radians(lon)), 3) AS x,
               round((n + value)*cos(radians(lat))*sin(radians(lon)), 3) AS y,
               round((${6356752.3142451793 * 6356752.3142451793}/${6378137.0 * 6378137.0}*n + value)*sin(radians(lat)), 3) AS z
        FROM (
          SELECT event_id, lat, lon, value,
                 ${6378137.0 * 6378137.0} / sqrt(${6378137.0 * 6378137.0}*cos(radians(lat))*cos(radians(lat))
                   + ${6356752.3142451793 * 6356752.3142451793}*sin(radians(lat))*sin(radians(lat))) AS n
          FROM (SELECT event_id, value, $LAT AS lat, $LON AS lon FROM events))
        ORDER BY event_id""")),

    // ----- geo_proximity_pairs: grid-bucketed proximity join -------------
    // Conflict/encounter detection (the adsb "close aircraft" query): pairs
    // of events in the same 10-min frame within 25 km. The self-join is
    // keyed on (time bucket, 1-degree grid cell) with the probe side
    // replicated to its 3x3 neighborhood — O(n·9) shuffle rows instead of
    // O(n^2) pairs, the only shape that survives 100 TB of track data. At
    // this data's |lat| <= 70, 25 km never spans more than one 1-degree
    // cell boundary, so the candidate set is exact (antimeridian pairs
    // excepted, as in any grid index).
    "geo_proximity_pairs" -> Q(
      build = (s, d) => {
        val pts = evPts(s, d)
          .select(col("event_id"), expr("ts_sec div 600").as("tb"),
            col("lat"), col("lon"),
            floor(col("lat")).cast(LongType).as("cl"),
            floor(col("lon")).cast(LongType).as("cn"))
        val probe = pts
          .withColumn("dlat", explode(array(lit(-1L), lit(0L), lit(1L))))
          .withColumn("dlon", explode(array(lit(-1L), lit(0L), lit(1L))))
          .select(col("event_id"), col("tb"), col("lat"), col("lon"),
            (col("cl") + col("dlat")).as("cl"), (col("cn") + col("dlon")).as("cn"))
        pts.as("a").join(probe.as("b"),
            col("a.tb") === col("b.tb")
              && col("a.cl") === col("b.cl") && col("a.cn") === col("b.cn")
              && col("a.event_id") < col("b.event_id"))
          .withColumn("dist_km",
            round(havC(col("a.lat"), col("a.lon"), col("b.lat"), col("b.lon")), 3))
          .filter(col("dist_km") <= 25.0)
          .select(col("a.event_id").as("event_a"), col("b.event_id").as("event_b"),
            col("a.tb").as("tb"), col("dist_km"))
          .orderBy(col("event_a"), col("event_b"))
      },
      oracle = Some(s"""
        WITH pts AS (
          SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) // 600 AS tb,
                 $LAT AS lat, $LON AS lon,
                 CAST(floor($LAT) AS BIGINT) AS cl,
                 CAST(floor($LON) AS BIGINT) AS cn
          FROM events),
        probe AS (
          SELECT event_id, tb, lat, lon, cl + g1.d AS cl, cn + g2.d AS cn
          FROM pts, generate_series(-1, 1) AS g1(d), generate_series(-1, 1) AS g2(d))
        SELECT a.event_id AS event_a, b.event_id AS event_b, a.tb AS tb,
               round(${havS("a.lat", "a.lon", "b.lat", "b.lon")}, 3) AS dist_km
        FROM pts a JOIN probe b
          ON a.tb = b.tb AND a.cl = b.cl AND a.cn = b.cn
         AND a.event_id < b.event_id
        WHERE round(${havS("a.lat", "a.lon", "b.lat", "b.lon")}, 3) <= 25.0
        ORDER BY event_a, event_b""")),

    // ----- geo_track_envelope: per-track bounding rect (GeoRect) ---------
    // GeoRect::from_min_max over each entity's track (geo.rs:216) plus the
    // diagonal extent — the viewport query every track display needs.
    "geo_track_envelope" -> Q(
      build = (s, d) =>
        evPts(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_points"),
            min(col("lat")).as("south"), max(col("lat")).as("north"),
            min(col("lon")).as("west"), max(col("lon")).as("east"))
          .withColumn("diag_km",
            round(havC(col("south"), col("west"), col("north"), col("east")), 3))
          // spherical rect area (GeoRect::area, geo.rs:232):
          // R^2 (sin N - sin S) dLon
          .withColumn("rect_area_km2",
            round(lit(6371.0 * 6371.0)
              * (sin(radians(col("north"))) - sin(radians(col("south"))))
              * radians(col("east") - col("west")), 3))
          .orderBy(col("user_id")),
      oracle = Some(s"""
        SELECT user_id, n_points, south, north, west, east,
               round(${havS("south", "west", "north", "east")}, 3) AS diag_km,
               round(${6371.0 * 6371.0}
                     * (sin(radians(north)) - sin(radians(south)))
                     * radians(east - west), 3) AS rect_area_km2
        FROM (
          SELECT user_id, COUNT(*) AS n_points,
                 MIN(lat) AS south, MAX(lat) AS north,
                 MIN(lon) AS west, MAX(lon) AS east
          FROM (SELECT user_id, $LAT AS lat, $LON AS lon FROM events)
          GROUP BY 1)
        ORDER BY user_id""")),

    // ----- geo_cell_transitions: grid-cell flow matrix -------------------
    // Mobility rollup over the gridded world (where do tracks move next?):
    // consecutive fixes per track mapped to 5-degree cells, transitions
    // counted. The flow matrix behind movement prediction / corridor maps.
    // One lag window keyed on the entity + one partial agg.
    "geo_cell_transitions" -> Q(
      build = (s, d) =>
        evPts(s, d)
          .withColumn("cl", floor(col("lat") / 5.0).cast(LongType))
          .withColumn("cn", floor(col("lon") / 5.0).cast(LongType))
          .withColumn("pcl", lag(col("cl"), 1).over(wTrack))
          .withColumn("pcn", lag(col("cn"), 1).over(wTrack))
          .filter(col("pcl").isNotNull
            && (col("pcl") =!= col("cl") || col("pcn") =!= col("cn")))
          .groupBy(col("pcl"), col("pcn"), col("cl"), col("cn"))
          .agg(count(lit(1)).as("n_transitions"))
          .orderBy(col("pcl"), col("pcn"), col("cl"), col("cn")),
      oracle = Some(s"""
        SELECT pcl, pcn, cl, cn, COUNT(*) AS n_transitions
        FROM (
          SELECT cl, cn,
                 LAG(cl, 1) OVER w AS pcl, LAG(cn, 1) OVER w AS pcn
          FROM (SELECT user_id, event_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
                       CAST(floor($LAT/5.0) AS BIGINT) AS cl,
                       CAST(floor($LON/5.0) AS BIGINT) AS cn
                FROM events)
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
        WHERE pcl IS NOT NULL AND (pcl <> cl OR pcn <> cn)
        GROUP BY 1, 2, 3, 4
        ORDER BY pcl, pcn, cl, cn""")),

    // ----- geo_speed: track speed + GPS-glitch flag ----------------------
    // Track QC every ingest needs (gpshub/adsb position updates): segment
    // speed from consecutive fixes; speeds beyond a physical bound flag
    // the fix as a glitch (teleporting sensor = bad decode / id collision).
    // Same single window shuffle as geo_haversine.
    "geo_speed" -> Q(
      build = (s, d) =>
        evPts(s, d)
          .withColumn("plat", lag(col("lat"), 1).over(wTrack))
          .withColumn("plon", lag(col("lon"), 1).over(wTrack))
          .withColumn("pts", lag(col("ts_sec"), 1).over(wTrack))
          .filter(col("plat").isNotNull && col("ts_sec") > col("pts"))
          .withColumn("speed_kmh",
            round(havC(col("plat"), col("plon"), col("lat"), col("lon"))
              / (col("ts_sec") - col("pts")) * 3600.0, 3))
          .select(col("user_id"), col("event_id"), col("speed_kmh"),
            (col("speed_kmh") > 1000.0).as("glitch"))
          .orderBy(col("user_id"), col("event_id")),
      oracle = Some(s"""
        SELECT user_id, event_id,
               round(${havS("plat", "plon", "lat", "lon")}
                     / (ts_sec - pts) * 3600.0, 3) AS speed_kmh,
               round(${havS("plat", "plon", "lat", "lon")}
                     / (ts_sec - pts) * 3600.0, 3) > 1000.0 AS glitch
        FROM (
          SELECT user_id, event_id, ts_sec, lat, lon,
                 LAG(lat, 1) OVER w AS plat, LAG(lon, 1) OVER w AS plon,
                 LAG(ts_sec, 1) OVER w AS pts
          FROM (SELECT user_id, event_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
                       $LAT AS lat, $LON AS lon FROM events)
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
        WHERE plat IS NOT NULL AND ts_sec > pts
        ORDER BY user_id, event_id""")),

    // ----- geo_closing_rate: range-rate tracking (adsb.rs) ---------------
    // The closing-rate state ODIN keeps per aircraft update
    // (odin_adsb/src/adsb.rs:126,144 AirborneVelocity -> groundspeed /
    // vertical_rate merge): rate of change of the distance to a
    // reference point (station 1 at (-17,-83), derived like geo_nearest's
    // stations) between consecutive fixes. Negative = approaching. One
    // window shuffle keyed on the entity. Determinism: the lag-difference
    // of two haversines amplifies the ~ulp cross-engine trig disagreement
    // by 3600/dt, so quantize the distance to fixed-point BIGINT (1/1024
    // km ~ 1 m) BEFORE the lag — the subtraction is then integer-exact
    // and the trailing /1024.0 /dt *3600.0 chain is bit-identical.
    "geo_closing_rate" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        evPts(s, d)
          .withColumn("dist_km", havC(col("lat"), col("lon"), lit(-17.0), lit(-83.0)))
          .withColumn("dist_q", floor(col("dist_km") * 1024.0).cast("long"))
          .withColumn("prev_q", lag(col("dist_q"), 1).over(w))
          .withColumn("prev_ts", lag(col("ts_sec"), 1).over(w))
          .filter(col("prev_ts").isNotNull && col("ts_sec") > col("prev_ts"))
          .withColumn("closing_kmh",
            round((col("dist_q") - col("prev_q")) / 1024.0
              / (col("ts_sec") - col("prev_ts")) * 3600.0, 3))
          .select(col("user_id"), col("event_id"), col("ts_sec"),
            round(col("dist_km"), 3).as("dist_km"), col("closing_kmh"),
            (col("closing_kmh") < 0.0).as("approaching"))
          .orderBy(col("user_id"), col("event_id"))
      },
      oracle = Some(s"""
        SELECT user_id, event_id, ts_sec,
               round(dist_km, 3) AS dist_km,
               round((dist_q - prev_q) / 1024.0 / (ts_sec - prev_ts) * 3600.0, 3) AS closing_kmh,
               round((dist_q - prev_q) / 1024.0 / (ts_sec - prev_ts) * 3600.0, 3) < 0.0 AS approaching
        FROM (
          SELECT user_id, event_id, ts_sec, dist_km, dist_q,
                 LAG(dist_q, 1) OVER w AS prev_q,
                 LAG(ts_sec, 1) OVER w AS prev_ts
          FROM (
            SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
                   dist_km, CAST(FLOOR(dist_km * 1024.0) AS BIGINT) AS dist_q
            FROM (
              SELECT user_id, event_id, ts,
                     ${havS(LAT, LON, "-17.0", "-83.0")} AS dist_km
              FROM events))
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
        WHERE prev_ts IS NOT NULL AND ts_sec > prev_ts
        ORDER BY user_id, event_id"""))
  )
}
