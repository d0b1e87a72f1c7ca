package graft

import graft.operators.TimeSeries
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check of the alpha-beta tracker tap unroll: the fixed
  * 9-coefficient linear map must equal the direct stateful recursion for
  * ANY window of integer-cent measurements (exactly what the windowed
  * query computes), not just the impulse vectors it was derived from.
  */
object AlphaBetaProps extends Properties("AlphaBetaK") {

  private val window: Gen[List[Long]] =
    Gen.listOfN(9, Gen.chooseNum(-1000000L, 1000000L))

  private def direct(z: Seq[Long]): (Double, Double, Double) = {
    val alpha = 0.5; val beta = 0.1
    var x = z.head.toDouble; var v = 0.0; var r = 0.0
    z.tail.foreach { m =>
      val xp = x + v
      r = m - xp
      x = xp + alpha * r
      v = v + beta * r
    }
    (x, v, r)
  }

  private def dot(c: Seq[Double], z: Seq[Long]): Double =
    // taps are indexed by LAG (0 = newest); z is oldest-first
    (0 to 8).map(i => z(8 - i) * c(i)).sum

  property("tap dot product equals the direct recursion") = forAll(window) { z =>
    val (xT, vT, rT) = TimeSeries.AlphaBetaK.taps
    val (x, v, r) = direct(z)
    math.abs(dot(xT, z) - x) <= 1e-6 * (1.0 + math.abs(x)) &&
      math.abs(dot(vT, z) - v) <= 1e-6 * (1.0 + math.abs(v)) &&
      math.abs(dot(rT, z) - r) <= 1e-6 * (1.0 + math.abs(r))
  }

  property("constant window: estimate exact, velocity and innovation zero") =
    forAll(Gen.chooseNum(-1000000L, 1000000L)) { k =>
      val z = List.fill(9)(k)
      val (xT, vT, rT) = TimeSeries.AlphaBetaK.taps
      math.abs(dot(xT, z) - k) <= 1e-9 * (1.0 + math.abs(k.toDouble)) &&
        math.abs(dot(vT, z)) <= 1e-9 * (1.0 + math.abs(k.toDouble)) &&
        math.abs(dot(rT, z)) <= 1e-9 * (1.0 + math.abs(k.toDouble))
    }

  property("linear ramp: velocity recovers the slope") =
    forAll(Gen.chooseNum(-10000L, 10000L)) { m =>
      val z = (0 to 8).map(i => i * m)
      val (_, vT, rT) = TimeSeries.AlphaBetaK.taps
      // after 8 steps of a clean ramp the filter has locked on: the
      // velocity estimate is within 15% of the true slope (v = 0.860m at
      // these gains) and the last innovation stays below one step
      // (r = 0.567m)
      val v = dot(vT, z)
      val r = dot(rT, z)
      math.abs(v - m) <= 0.15 * math.abs(m.toDouble) + 1e-9 &&
        math.abs(r) <= 0.6 * math.abs(m.toDouble) + 1e-9
    }
}
