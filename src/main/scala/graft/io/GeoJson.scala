package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S13 — GeoJSON FeatureCollection scan (the reference's `st_read` of
  * region polygons, `dwd_bus_route_info_mf & other 2.R:338`), built on
  * `spark.read.json(multiLine)` + expression-level WKT conversion — no
  * geo library (SURVEY.md §1.1: geometries are WKT strings + double
  * columns in this engine).
  *
  * Scope: Polygon features with an outer ring (the region-dimension
  * use case). Properties are surfaced as columns; the outer ring is
  * rendered to `POLYGON ((x y, ...))` WKT consumable by
  * [[graft.ops.Geo.parseWktPolygonRing]] / [[graft.ops.Geo.assignRegion]].
  */
object GeoJson {

  /** Read a FeatureCollection of Polygon features: one row per feature,
    * columns = feature properties + `wkt`. */
  def readPolygons(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val feats = raw.select(explode(col("features")).as("f"))
      .where(col("f.geometry.type") === "Polygon")
    // outer ring = coordinates[0]: array of [lon, lat] pairs
    feats.select(
      col("f.properties.*"),
      concat(lit("POLYGON (("),
        array_join(transform(element_at(col("f.geometry.coordinates"), 1),
          p => concat(element_at(p, 1).cast("string"), lit(" "),
                      element_at(p, 2).cast("string"))), ", "),
        lit("))")).as("wkt"))
  }

  /** Collect a polygon FeatureCollection to the (region_id, wkt) pairs
    * [[graft.ops.Geo.assignRegion]] broadcasts — dimension data, tiny
    * by contract. */
  def polygonDim(spark: SparkSession, path: String,
                 idProperty: String): Seq[(String, String)] =
    readPolygons(spark, path)
      .select(col(idProperty).cast("string"), col("wkt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
}
