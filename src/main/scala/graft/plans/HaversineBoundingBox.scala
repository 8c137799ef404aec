package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.HaversineMeters

/** Optimizer rule: derive sargable lat/lon range predicates from a
  * radius filter over the native haversine expression.
  *
  * `haversine_meters(lat, lon, clat, clon) <= r` (with a constant center
  * and radius — the reference's POI-radius idiom,
  * `cal_subarea_portion.py:83-92,142-149`) is a black box to every scan:
  * the trig runs for all rows and nothing reaches parquet row-group
  * statistics. This rule conjoins the spherical cap's exact bounding box
  *
  *   lat  ∈ [clat − δ°, clat + δ°]               (δ = r / R)
  *   lon  ∈ [clon − asin(sin δ / cos clat)°, …]  (cap not touching a pole)
  *
  * ahead of the original predicate. The bounds are plain comparisons on
  * whatever expressions occupy the lat/lon argument slots, so
  *
  *   - when those are stored columns, Catalyst pushes them into the scan
  *     (`PushedFilters` → parquet min/max row-group skipping — at 100 TB
  *     the difference between a full scan and reading one city's worth);
  *   - when they are derived expressions, codegen's short-circuit `&&`
  *     still skips the sin/cos/atan2 for every row outside the box.
  *
  * Semantics are unchanged: the box strictly contains the cap (the lat
  * extent of a cap of angular radius δ is exactly ±δ; the lon extent is
  * the tangent-meridian formula asin(sin δ / cos clat), both widened by
  * a relative slack far above haversine's float error), and a NULL
  * coordinate makes both the original predicate and the added bounds
  * NULL, so the filter drops the row either way. Caps touching a pole or
  * crossing the antimeridian keep only the bounds that stay rectangular
  * (none / lat-only). All-constant calls are left to constant folding.
  *
  * Coordinate contract: inputs are assumed normalized to [-90, 90] /
  * [-180, 180] — the same contract the engine's geohash encode declares
  * (out-of-range values clamp, `GeoFunctions.cellIndex`). Haversine
  * itself is invariant under ±360° longitude shifts, so a row carrying
  * an unnormalized longitude (0–360 convention) could satisfy the radius
  * predicate yet fall outside the box; such data must be normalized
  * before filtering, as it must be before any geohash call.
  *
  * Runs inside the operator-optimization fixed point
  * (`injectOptimizerRule` in [[graft.functions.GraftExtensions]]);
  * idempotence: a bound that already appears as a conjunct
  * (semanticEquals) is not re-added, so the second pass is a no-op.
  */
object HaversineBoundingBox extends Rule[LogicalPlan] {

  /** Must equal GeoFunctions.haversineMeters's Earth radius. */
  private val EarthRadiusM = 6372800.0
  /** Angular widening: haversine's double-precision error is ~1e-9
    * relative; 1e-6 relative + 1e-12 rad absolute is orders beyond it. */
  private def widen(rad: Double): Double = rad * (1 + 1e-6) + 1e-12

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val conjuncts = split(cond)
      val added = conjuncts.flatMap(boundsFor).foldLeft(Seq.empty[Expression]) {
        (acc, b) =>
          if ((conjuncts ++ acc).exists(_.semanticEquals(b))) acc else acc :+ b
      }
      if (added.isEmpty) f
      else f.copy(condition = (added ++ conjuncts).reduceLeft(And))
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(a, b) => split(a) ++ split(b)
    case other     => Seq(other)
  }

  private def boundsFor(p: Expression): Seq[Expression] = p match {
    case LessThan(h: HaversineMeters, r)           => bbox(h, r)
    case LessThanOrEqual(h: HaversineMeters, r)    => bbox(h, r)
    case GreaterThan(r, h: HaversineMeters)        => bbox(h, r)
    case GreaterThanOrEqual(r, h: HaversineMeters) => bbox(h, r)
    case _                                         => Nil
  }

  /** Constant-fold a DoubleType expression, if it is one. */
  private def evalD(e: Expression): Option[Double] =
    if (e.foldable && e.dataType == DoubleType)
      Option(e.eval(null)).map(_.asInstanceOf[Double])
    else None

  /** (centerLat, centerLon, latExpr, lonExpr) when exactly one endpoint
    * of the haversine call is constant. */
  private def constSide(h: HaversineMeters)
      : Option[(Double, Double, Expression, Expression)] = {
    def pick(latC: Expression, lonC: Expression,
             latV: Expression, lonV: Expression) =
      if (latV.foldable || lonV.foldable ||
          !latV.deterministic || !lonV.deterministic ||
          latV.dataType != DoubleType || lonV.dataType != DoubleType) None
      else for { la <- evalD(latC); lo <- evalD(lonC) } yield (la, lo, latV, lonV)
    if (h.third.foldable && h.fourth.foldable)
      pick(h.third, h.fourth, h.first, h.second)
    else if (h.first.foldable && h.second.foldable)
      pick(h.first, h.second, h.third, h.fourth)
    else None
  }

  private def bbox(h: HaversineMeters, rExpr: Expression): Seq[Expression] = {
    val out = for {
      r <- evalD(rExpr) if r >= 0
      (clat, clon, latE, lonE) <- constSide(h)
      if math.abs(clat) <= 90.0 && math.abs(clon) <= 180.0
      delta = widen(r / EarthRadiusM) if delta < math.Pi / 2
    } yield {
      val dLatDeg = math.toDegrees(delta)
      val latLo = clat - dLatDeg
      val latHi = clat + dLatDeg
      if (latLo <= -90.0 + 1e-9 || latHi >= 90.0 - 1e-9) {
        // cap touches a pole: every longitude is inside → no rectangle
        Seq.empty[Expression]
      } else {
        val latBounds = Seq[Expression](
          GreaterThanOrEqual(latE, Literal(latLo)),
          LessThanOrEqual(latE, Literal(latHi)))
        // tangent-meridian longitude extent; cos(clat) > sin(delta) is
        // guaranteed by the pole guard, the min() is numeric belt+braces
        val x = math.min(math.sin(delta) / math.cos(math.toRadians(clat)), 1.0)
        val dLonDeg = math.toDegrees(widen(math.asin(x)))
        val lonLo = clon - dLonDeg
        val lonHi = clon + dLonDeg
        if (lonLo < -180.0 + 1e-9 || lonHi > 180.0 - 1e-9) latBounds // wraps
        else latBounds ++ Seq[Expression](
          GreaterThanOrEqual(lonE, Literal(lonLo)),
          LessThanOrEqual(lonE, Literal(lonHi)))
      }
    }
    out.getOrElse(Nil)
  }
}
