package graft

import graft.functions.TextHashKernels
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the text hash kernels (no Spark session —
  * pure JVM kernels, so these run on arbitrary generated corpora).
  */
object TextKernelProps extends Properties("TextHashKernels") {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text: Gen[String] =
    Gen.chooseNum(5, 60).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def u(s: String) = UTF8String.fromString(s)
  private def longs(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[Long] =
    a.toLongArray().toSeq

  property("winnow output is sorted and distinct") = forAll(text) { t =>
    val fps = longs(TextHashKernels.winnow(u(t), 20, 5))
    fps == fps.sorted && fps.distinct == fps
  }

  property("winnow is deterministic") = forAll(text) { t =>
    longs(TextHashKernels.winnow(u(t), 20, 5)) ==
      longs(TextHashKernels.winnow(u(t), 20, 5))
  }

  property("minhash signature has fixed arity and appending only lowers entries") =
    forAll(text, word) { (t, extra) =>
      val base = longs(TextHashKernels.minhash(u(t), 20, 4, 32))
      val ext = longs(TextHashKernels.minhash(u(t + " " + extra + " tailtailtail"), 20, 4, 32))
      base.length == 32 && ext.length == 32 &&
        base.zip(ext).forall { case (b, e) => e <= b }
    }

  property("simhash ignores duplicate runs of separators") = forAll(text) { t =>
    TextHashKernels.simhash64(u(t)) == TextHashKernels.simhash64(u(t.replace(" ", "  ")))
  }

  property("simhash is invariant to token order (votes commute)") = forAll(text) { t =>
    val reversed = t.split(" ").reverse.mkString(" ")
    TextHashKernels.simhash64(u(t)) == TextHashKernels.simhash64(u(reversed))
  }
}
