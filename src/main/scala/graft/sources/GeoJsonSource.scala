package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GeoJSON FeatureCollection ingest — the geometry reader the reference
  * ships as odin_geolayer (odin_geolayer/src/lib.rs): GeoJSON text in,
  * typed (feature, geometry-part, ring, vertex) rows out.
  *
  * All parsing is schema'd `from_json` column work (no UDFs, stays in
  * codegen). GeoJSON nests coordinates differently per geometry type
  * (Point [x,y] … MultiPolygon [[[[x,y]]]]), which a single schema cannot
  * express — so each feature is first captured as its raw JSON text
  * (ARRAY<STRING> schema keeps object subtrees verbatim), then the
  * coordinates are parsed per-type and normalized to the MultiPolygon
  * nesting before one posexplode chain emits vertices.
  */
object GeoJson {

  /** One row per feature: adds feature_pos, geom_type, properties
    * (MAP<STRING,STRING>) and the raw feature JSON in `__feat`.
    */
  def features(df: DataFrame, fc: Column): DataFrame =
    df.withColumn("__fc", fc)
      .select(col("*"), posexplode(expr(
        "from_json(__fc, 'STRUCT<features: ARRAY<STRING>>').features"))
        .as(Seq("feature_pos", "__feat")))
      .withColumn("geom_type",
        expr("from_json(__feat, 'STRUCT<geometry: STRUCT<type: STRING>>').geometry.type"))
      .withColumn("properties",
        expr("from_json(__feat, 'STRUCT<properties: MAP<STRING,STRING>>').properties"))
      .drop("__fc")

  /** Explode each feature's coordinates to one row per vertex:
    * (part_idx, ring_idx, pt_idx, lon, lat). Points sit at part 0 / ring 0
    * / pt 0; LineStrings at part 0 / ring 0; Polygons at part 0.
    */
  def explodeCoordinates(feats: DataFrame): DataFrame = {
    def c(depth: Int): String = {
      val t = (1 to depth).foldLeft("DOUBLE")((acc, _) => s"ARRAY<$acc>")
      s"from_json(__feat, 'STRUCT<geometry: STRUCT<coordinates: $t>>').geometry.coordinates"
    }
    feats
      .withColumn("__norm", expr(s"""
        CASE geom_type
          WHEN 'Point'           THEN array(array(array(${c(1)})))
          WHEN 'MultiPoint'      THEN array(array(${c(2)}))
          WHEN 'LineString'      THEN array(array(${c(2)}))
          WHEN 'Polygon'         THEN array(${c(3)})
          WHEN 'MultiLineString' THEN array(${c(3)})
          WHEN 'MultiPolygon'    THEN ${c(4)}
          -- unsupported geometry types surface as one sentinel vertex row
          -- (null lon/lat, geom_type preserved) instead of silently
          -- vanishing from the posexplode
          ELSE array(array(array(array(CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)))))
        END"""))
      .select(col("*"), posexplode(col("__norm")).as(Seq("part_idx", "__rings")))
      .select(col("*"), posexplode(col("__rings")).as(Seq("ring_idx", "__ring")))
      .select(col("*"), posexplode(col("__ring")).as(Seq("pt_idx", "__pt")))
      .withColumn("lon", col("__pt")(0))
      .withColumn("lat", col("__pt")(1))
      .drop("__norm", "__rings", "__ring", "__pt", "__feat")
  }

  /** Full pipeline: FeatureCollection text column → vertex rows. */
  def parse(df: DataFrame, fc: Column): DataFrame =
    explodeCoordinates(features(df, fc))
}
