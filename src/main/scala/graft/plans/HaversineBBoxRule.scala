package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.{GeodesicKm, HaversineKm}

/** Optimizer rule: derive a sargable bounding box from a haversine
  * radius predicate.
  *
  * `haversine_km(lat, lon, LATC, LONC) <= R` cannot reach a parquet scan
  * — it is an opaque expression, so the reader scans every row group of
  * a 100 TB track archive to answer a 50 km radius query. This rule adds
  * the CONSERVATIVE range conjuncts the predicate implies —
  * `lat BETWEEN latc ± dlat AND lon BETWEEN lonc ± dlon` — which ARE
  * sargable: they push to parquet min/max stats, prune partitions, and
  * cut a Z-ordered layout (sources.writeZOrdered) to a handful of files,
  * while the exact haversine test still runs on the survivors. This is
  * the standard geo-index rewrite (PostGIS `&&` + ST_DWithin, GDAL
  * spatial filters) expressed as a Catalyst `Rule[LogicalPlan]`.
  *
  * Soundness: the box must contain the disk. dlat uses 110.0 km/deg
  * (below the true minimum 110.574, so the box over-covers); dlon uses
  * 110.0 * cos(max |lat| in the box) — the cosine at the latitude where
  * meridians are tightest in the box. Near the poles (box touching
  * |lat| >= 89) the longitude bound is dropped; if the box would cross
  * the antimeridian, the longitude bound is dropped too (the latitude
  * bound alone is still sound). The rule is idempotent: conjuncts that
  * are already present (semantically) are not re-added, so the
  * fixed-point optimizer batch terminates.
  */
object HaversineBBoxRule extends Rule[LogicalPlan] with PredicateHelper {

  private def bbox(lat: Expression, lon: Expression, latC: Double,
      lonC: Double, r: Double): Seq[Expression] = {
    if (r < 0.0 || !lat.deterministic || !lon.deterministic) return Nil
    val dLat = r / 110.0
    val lo = latC - dLat
    val hi = latC + dLat
    val latBounds = Seq[Expression](
      GreaterThanOrEqual(lat, Literal(lo, DoubleType)),
      LessThanOrEqual(lat, Literal(hi, DoubleType)))
    val maxAbsLat = math.max(math.abs(lo), math.abs(hi))
    if (maxAbsLat >= 89.0) return latBounds // meridian convergence: lat only
    val dLon = r / (110.0 * math.cos(math.toRadians(maxAbsLat)))
    val wlo = lonC - dLon
    val whi = lonC + dLon
    if (wlo < -180.0 || whi > 180.0) latBounds // antimeridian wrap: lat only
    else latBounds ++ Seq[Expression](
      GreaterThanOrEqual(lon, Literal(wlo, DoubleType)),
      LessThanOrEqual(lon, Literal(whi, DoubleType)))
  }

  private def fromDist(args: (Expression, Expression, Expression, Expression),
      r: Double): Seq[Expression] =
    args match {
      case (lat, lon, Literal(latC: Double, DoubleType),
          Literal(lonC: Double, DoubleType))
          if !lat.isInstanceOf[Literal] && !lon.isInstanceOf[Literal] =>
        bbox(lat, lon, latC, lonC, r)
      case (Literal(latC: Double, DoubleType),
          Literal(lonC: Double, DoubleType), lat, lon)
          if !lat.isInstanceOf[Literal] && !lon.isInstanceOf[Literal] =>
        bbox(lat, lon, latC, lonC, r)
      case _ => Nil
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // both spherical and ellipsoidal distances: the 110.0 km/deg
      // constant under-states every WGS84 degree length, so one bbox
      // derivation is conservative for either metric
      def argsOf(e: Expression): Option[(Expression, Expression, Expression, Expression)] =
        e match {
          case h: HaversineKm => Some((h.first, h.second, h.third, h.fourth))
          case g: GeodesicKm => Some((g.first, g.second, g.third, g.fourth))
          case _ => None
        }
      val extra = conjuncts.flatMap {
        case LessThanOrEqual(d, Literal(r: Double, DoubleType)) =>
          argsOf(d).toSeq.flatMap(fromDist(_, r))
        case LessThan(d, Literal(r: Double, DoubleType)) =>
          argsOf(d).toSeq.flatMap(fromDist(_, r))
        case GreaterThanOrEqual(Literal(r: Double, DoubleType), d) =>
          argsOf(d).toSeq.flatMap(fromDist(_, r))
        case GreaterThan(Literal(r: Double, DoubleType), d) =>
          argsOf(d).toSeq.flatMap(fromDist(_, r))
        case _ => Nil
      }.filterNot(p => conjuncts.exists(_.semanticEquals(p)))
        .foldLeft(Seq.empty[Expression]) { (acc, p) => // dedup within batch
          if (acc.exists(_.semanticEquals(p))) acc else acc :+ p
        }
      if (extra.isEmpty) f
      else Filter((conjuncts ++ extra).reduce(And), child)
  }
}
