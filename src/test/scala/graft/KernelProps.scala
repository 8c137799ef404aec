package graft

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{TextFunctions, VectorFunctions}

/** Property suites for the native codegen kernels: each kernel must be
  * EXACTLY equal (not approximately) to an independently-written
  * reference fold, on arbitrary inputs — the fixture-data parity queries
  * (v06/t11) prove engine agreement, these prove the kernels against the
  * math directly. */
object KernelProps extends Properties("NativeKernels") {

  private val floats = Gen.containerOf[Array, Float](
    Gen.chooseNum(-100.0f, 100.0f))

  property("dotFold = sequential double fold in index order") =
    Prop.forAll(floats, floats) { (a, b) =>
      val n = math.min(a.length, b.length)
      var expect = 0.0
      var i = 0
      while (i < n) { expect += a(i).toDouble * b(i).toDouble; i += 1 }
      VectorFunctions.dotFold(
        UnsafeArrayData.fromPrimitiveArray(a),
        UnsafeArrayData.fromPrimitiveArray(b)) == expect
    }

  property("planeDot = deterministic hyperplane fold") =
    Prop.forAll(floats, Gen.choose(0, 16)) { (e, j) =>
      var expect = 0.0
      var i = 1
      while (i <= e.length) {
        expect += e(i - 1).toDouble * ((j * 37 + i * 101) % 97 - 48).toDouble
        i += 1
      }
      VectorFunctions.planeDot(UnsafeArrayData.fromPrimitiveArray(e), j) == expect
    }

  private val word = Gen.stringOf(Gen.alphaNumChar)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  private val cand = Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(0L, 50L))
    .map { case (p, k) => graft.functions.TopKIn(p, k) }
  private val cands = Gen.listOf(cand)
  private def ref(xs: List[graft.functions.TopKIn], k: Int) =
    xs.sortBy(t => (-t.price, t.key)).take(k).toVector

  property("TopKAggregator reduce+merge = sort-take reference") =
    Prop.forAll(cands, cands, Gen.choose(1, 5)) { (xs, ys, k) =>
      val agg = new graft.functions.TopKAggregator(k)
      val a = xs.foldLeft(agg.zero)(agg.reduce)
      val b = ys.foldLeft(agg.zero)(agg.reduce)
      agg.merge(a, b) == ref(xs ++ ys, k) && a == ref(xs, k)
    }

  property("fingerprintWords = hex-string portable hash fold") =
    Prop.forAll(text) { t =>
      // independent reference path: md5 HEX STRING -> first 15 digits
      // parsed base-16 (exactly Portable.portableHash's SQL semantics)
      val md = java.security.MessageDigest.getInstance("MD5")
      val expect = t.split(" ", -1).foldLeft(0L) { (acc, w) =>
        md.reset()
        val hex = md.digest(w.getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        (acc * 31 + h % 1000L) % 2147483647L
      }
      TextFunctions.fingerprintWords(UTF8String.fromString(t)) == expect
    }
}
