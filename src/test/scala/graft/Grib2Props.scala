package graft

import graft.sources.Grib2
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the GRIB2 codec and the Lambert projection —
  * pure JVM (no Spark session), driven by generated grids, so the
  * encode/decode pair is exercised across packings, bitmaps, grid
  * geometries, and value ranges far beyond the fixture specs.
  */
object Grib2Props extends Properties("Grib2") {

  private val dims: Gen[(Int, Int)] = for {
    ni <- Gen.chooseNum(2, 40)
    nj <- Gen.chooseNum(2, 25)
  } yield (ni, nj)

  // 2-decimal-quantized values (the codec's exact-round-trip contract),
  // with optional NaN holes for the bitmap path
  private def gridGen(withHoles: Boolean): Gen[(Int, Int, Array[Double])] =
    for {
      (ni, nj) <- dims
      vals <- Gen.listOfN(ni * nj, for {
        q <- Gen.chooseNum(-32000, 32000)
        hole <- if (withHoles) Gen.prob(0.1) else Gen.const(false)
      } yield if (hole) Double.NaN else q / 100.0)
    } yield (ni, nj, vals.toArray)

  private def field(ni: Int, nj: Int, vals: Array[Double], packing: Int) =
    Grib2.Field(discipline = 0, category = 2, parameter = 2,
      levelType = 103, level = 10,
      year = 2026, month = 8, day = 12, hour = 6, forecastHour = 1,
      ni = ni, nj = nj, la1Deg = 44.0, lo1Deg = -124.0,
      diDeg = 0.05, djDeg = 0.05, values = vals, packing = packing)

  private def roundTrip(ni: Int, nj: Int, vals: Array[Double],
      packing: Int): Boolean = {
    val f = java.nio.file.Files.createTempFile("grib-prop", ".grib2")
    try {
      Grib2.write(f.toString, Seq(field(ni, nj, vals, packing)))
      val m = Grib2.scanMessages(f.toString).head
      val d = Grib2.decodeMessage(f.toString, m.offset, m.length)
      var vi = 0
      vals.zipWithIndex.forall { case (v, i) =>
        if (v.isNaN) !d.present(i)
        else {
          val ok = d.present(i) && d.values(vi) == v
          vi += 1
          ok
        }
      }
    } finally java.nio.file.Files.delete(f)
  }

  property("simple packing round-trips exactly (incl. bitmap holes)") =
    forAll(gridGen(withHoles = true)) { case (ni, nj, vals) =>
      roundTrip(ni, nj, vals, 0)
    }

  property("complex packing 5.2 round-trips exactly") =
    forAll(gridGen(withHoles = false)) { case (ni, nj, vals) =>
      roundTrip(ni, nj, vals, 2)
    }

  property("spatial differencing 5.3 round-trips exactly") =
    forAll(gridGen(withHoles = false)) { case (ni, nj, vals) =>
      roundTrip(ni, nj, vals, 3)
    }

  property("PNG packing 5.41 round-trips exactly (incl. bitmap holes)") =
    forAll(gridGen(withHoles = true)) { case (ni, nj, vals) =>
      roundTrip(ni, nj, vals, 41)
    }

  // narrow ranges exercise the 8-bit PNG depth arm
  property("PNG packing 5.41 at depth 8 round-trips") =
    forAll(for {
      (ni, nj) <- dims
      vals <- Gen.listOfN(ni * nj, Gen.chooseNum(0, 255).map(_ / 100.0))
    } yield (ni, nj, vals.toArray)) { case (ni, nj, vals) =>
      val f = java.nio.file.Files.createTempFile("grib-prop8", ".grib2")
      try {
        Grib2.write(f.toString, Seq(field(ni, nj, vals, 41).copy(nBits = 8)))
        val m = Grib2.scanMessages(f.toString).head
        val d = Grib2.decodeMessage(f.toString, m.offset, m.length)
        d.values.toSeq == vals.toSeq
      } finally java.nio.file.Files.delete(f)
    }

  // Lambert conformal: inverse is the left inverse of forward across
  // tangent and secant cones, for points within the cone's longitude span
  private val lccGen: Gen[(Grib2.Lcc, Double, Double)] = for {
    latin1 <- Gen.chooseNum(25.0, 55.0)
    secant <- Gen.chooseNum(0.0, 10.0)
    lov <- Gen.chooseNum(200.0, 300.0)
    lat <- Gen.chooseNum(15.0, 65.0)
    dlon <- Gen.chooseNum(-40.0, 40.0)
  } yield (Grib2.Lcc(latin1, latin1 + secant, lov, 3000.0, 3000.0),
    lat, lov - 360.0 + dlon)

  property("LCC inverse . forward = identity") = forAll(lccGen) {
    case (p, lat, lon) =>
      val c = Grib2.LccMath.cone(p)
      val (x, y) = Grib2.LccMath.forward(c, lat, lon)
      val (lat2, lon2) = Grib2.LccMath.inverse(c, x, y)
      math.abs(lat2 - lat) < 1e-9 &&
        math.abs((lon2 - lon + 540.0) % 360.0 - 180.0) < 1e-9
  }
}
