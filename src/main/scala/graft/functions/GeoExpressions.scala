package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Point-in-region ray casting as a native codegen'd kernel — the F24
  * predicate (`sf::st_within`, `dwd_bus_route_info_mf & other
  * 2.R:338-340`) promoted from a boxed Scala UDF to the same
  * reference-object Expression shape as
  * [[VectorKernels.nearest_centroid]]: the whole region set (every
  * ring of every polygon, holes and multipolygon parts alike) rides
  * along as four flat primitive arrays, so a fact-side point stream
  * stays inside WholeStageCodegen with zero boxing and zero
  * per-region plan growth.
  *
  * Region layout (the [[GeoKernels.RegionIndex]] builder produces it
  * from parsed WKT rings):
  *  - `xs`/`ys`: every ring's vertices, concatenated;
  *  - `ringStarts`: vertex offset of ring r (length nRings+1);
  *  - `regionRings`: first ring of region g (length nRegions+1) —
  *    region g owns rings regionRings(g) until regionRings(g+1).
  *
  * Containment is EVEN-ODD across all of a region's rings (crossing
  * parity XORs over rings), which uniformly handles outer rings,
  * interior rings (holes), and disjoint multipolygon parts without
  * caring about ring orientation or role. First containing region (in
  * input order) wins; -1 = no region — matching the UDF twin
  * [[graft.ops.Geo.assignRegionUdf]] `collectFirst` semantics, which
  * CodegenParitySpec pins against this kernel.
  */
object GeoKernels {

  /** Flattened region set: see [[GeoKernels]] layout. */
  final case class RegionIndex(ids: Array[String], xs: Array[Double],
                               ys: Array[Double], ringStarts: Array[Int],
                               regionRings: Array[Int])

  /** Flatten parsed per-region ring lists into a [[RegionIndex]]. */
  def buildIndex(
      regions: Seq[(String, Array[(Array[Double], Array[Double])])])
      : RegionIndex = {
    val ids = regions.map(_._1).toArray
    val allRings = regions.flatMap(_._2)
    val ringStarts = allRings.scanLeft(0)(_ + _._1.length).toArray
    val regionRings = regions.scanLeft(0)(_ + _._2.length).toArray
    RegionIndex(ids,
      allRings.flatMap(_._1.toSeq).toArray,
      allRings.flatMap(_._2.toSeq).toArray,
      ringStarts, regionRings)
  }

  /** Even-odd crossing parity of one ring slice [from, until). */
  private def ringParity(lon: Double, lat: Double, xs: Array[Double],
                         ys: Array[Double], from: Int, until: Int): Boolean = {
    var inside = false
    var i = from
    var j = until - 1
    while (i < until) {
      val intersects = ((ys(i) > lat) != (ys(j) > lat)) &&
        (lon < (xs(j) - xs(i)) * (lat - ys(i)) / (ys(j) - ys(i)) + xs(i))
      if (intersects) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Index of the first region containing (lon, lat), else -1. */
  def regionOf(lon: Double, lat: Double, xs: Array[Double],
               ys: Array[Double], ringStarts: Array[Int],
               regionRings: Array[Int]): Int = {
    var g = 0
    val nRegions = regionRings.length - 1
    while (g < nRegions) {
      var inside = false
      var r = regionRings(g)
      while (r < regionRings(g + 1)) {
        inside ^= ringParity(lon, lat, xs, ys, ringStarts(r),
          ringStarts(r + 1))
        r += 1
      }
      if (inside) return g
      g += 1
    }
    -1
  }

  /** Column API: first-containing-region index of a (lon, lat) pair
    * against `idx`, -1 when no region contains it. */
  def region_index(lon: Column, lat: Column, idx: RegionIndex): Column =
    GraftSqlBridge.column(PointRegionIndex(
      GraftSqlBridge.expression(lon), GraftSqlBridge.expression(lat),
      idx.xs, idx.ys, idx.ringStarts, idx.regionRings))
}

/** Even-odd point-in-region over a flattened multi-ring region set
  * (see [[GeoKernels]]); reference-object arrays, same plan-size
  * rationale as [[NearestCentroid]]. */
case class PointRegionIndex(left: Expression, right: Expression,
                            xs: Array[Double], ys: Array[Double],
                            ringStarts: Array[Int], regionRings: Array[Int])
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"expected (DOUBLE, DOUBLE), got ($l, $r)")
    }
  override def nullSafeEval(lon: Any, lat: Any): Any =
    GeoKernels.regionOf(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      xs, ys, ringStarts, regionRings)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xsRef = ctx.addReferenceObj("geoXs", xs, "double[]")
    val ysRef = ctx.addReferenceObj("geoYs", ys, "double[]")
    val rsRef = ctx.addReferenceObj("geoRingStarts", ringStarts, "int[]")
    val rrRef = ctx.addReferenceObj("geoRegionRings", regionRings, "int[]")
    defineCodeGen(ctx, ev, (lon, lat) =>
      s"graft.functions.GeoKernels.regionOf($lon, $lat, $xsRef, $ysRef, $rsRef, $rrRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
