package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S13 — GeoJSON FeatureCollection scan (the reference's `st_read` of
  * region polygons, `dwd_bus_route_info_mf & other 2.R:338`), built on
  * `spark.read.json(multiLine)` + expression-level WKT conversion — no
  * geo library (SURVEY.md §1.1: geometries are WKT strings + double
  * columns in this engine).
  *
  * Scope: Polygon AND MultiPolygon features with any number of rings
  * per polygon — interior rings (holes) and island parts included,
  * matching what real region files carry (the reference's emirate dim
  * covers coastal geometry). Properties are surfaced as columns; the
  * geometry is rendered to `POLYGON ((...), (...))` /
  * `MULTIPOLYGON (((...)), ((...)))` WKT consumable by
  * [[graft.ops.Geo.parseWktRings]] / [[graft.ops.Geo.assignRegion]].
  *
  * Mixed-type files are the reason for the two-pass read: Polygon
  * coordinates nest 3 deep and MultiPolygon 4 deep, so one inferred
  * schema cannot hold both. Pass 1 infers only the PROPERTIES schema;
  * pass 2 re-reads with coordinates declared StringType (Spark's JSON
  * reader preserves a non-string value as its raw JSON text), and the
  * depth-matched `from_json` is picked per feature by geometry type.
  */
object GeoJson {

  private val ring = ArrayType(ArrayType(DoubleType))   // [[x,y], ...]
  private val poly = ArrayType(ring)                    // rings
  private val multi = ArrayType(poly)                   // polygons

  private def ringTxt(r: Column): Column =
    array_join(transform(r, p =>
      concat(element_at(p, 1).cast("string"), lit(" "),
             element_at(p, 2).cast("string"))), ", ")

  private def ringsTxt(rings: Column): Column =
    array_join(transform(rings, r =>
      concat(lit("("), ringTxt(r), lit(")"))), ", ")

  /** Read a FeatureCollection of Polygon/MultiPolygon features: one
    * row per feature, columns = feature properties + `wkt`. */
  def readPolygons(spark: SparkSession, path: String): DataFrame = {
    // pass 1: infer the properties struct only
    val inferred = spark.read.option("multiLine", "true").json(path)
      .select(explode(col("features")).as("f"))
      .select(col("f.properties")).schema.head.dataType
    val schema = StructType(Seq(StructField("features", ArrayType(StructType(Seq(
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", StringType)))),
      StructField("properties", inferred.asInstanceOf[StructType])))))))
    // pass 2: coordinates as raw JSON text, parsed at the right depth
    val feats = spark.read.option("multiLine", "true").schema(schema).json(path)
      .select(explode(col("features")).as("f"))
      .where(col("f.geometry.type").isin("Polygon", "MultiPolygon"))
    feats.select(
      col("f.properties.*"),
      when(col("f.geometry.type") === "Polygon",
        concat(lit("POLYGON ("),
          ringsTxt(from_json(col("f.geometry.coordinates"), poly)),
          lit(")")))
      .otherwise(
        concat(lit("MULTIPOLYGON ("),
          array_join(transform(
            from_json(col("f.geometry.coordinates"), multi),
            p => concat(lit("("), ringsTxt(p), lit(")"))), ", "),
          lit(")"))).as("wkt"))
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
