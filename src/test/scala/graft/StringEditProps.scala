package graft

import graft.functions.StringEditOps
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** [[StringEditOps.within1]] must agree with `levenshtein(a, b) <= 1`
  * EVERYWHERE — the linkage oracle's DuckDB side computes the generic
  * distance, so any divergence is a silent pair-set mismatch. Checked
  * against a direct DP reference over adversarial inputs: near-identical
  * serial strings (the fixture's regime), single-edit mutations by
  * construction, and multi-byte codepoints that break byte≡char scans. */
object StringEditProps extends Properties("string-edit") {

  /** Classic full-matrix Levenshtein over codepoints — the reference. */
  private def lev(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to x.length; j <- 1 to y.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
    d(x.length)(y.length)
  }

  private def w1(a: String, b: String): Boolean =
    StringEditOps.within1(UTF8String.fromString(a), UTF8String.fromString(b))

  // ASCII + multi-byte codepoints, incl. a supplementary-plane char
  private val genChar: Gen[String] =
    Gen.oneOf("a", "b", "0", "1", "é", "π", "😀")

  private val genStr: Gen[String] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, genChar).map(_.mkString))

  property("agrees with the DP on arbitrary pairs") =
    Prop.forAll(genStr, genStr) { (a, b) => w1(a, b) == (lev(a, b) <= 1) }

  property("accepts every single-edit mutation by construction") =
    Prop.forAll(genStr, genChar, Gen.choose(0, 100)) { (s, c, posSeed) =>
      val cps = s.codePoints().toArray
      val pos = if (cps.isEmpty) 0 else posSeed % (cps.length + 1)
      def str(xs: Array[Int]) = new String(xs, 0, xs.length)
      val inserted = str(cps.take(pos) ++ c.codePoints().toArray ++ cps.drop(pos))
      val deleted = if (cps.isEmpty) s else str(cps.take(pos % cps.length) ++ cps.drop(pos % cps.length + 1))
      val substituted = if (cps.isEmpty) s
        else str(cps.updated(pos % cps.length, c.codePointAt(0)))
      w1(s, inserted) && w1(s, deleted) && w1(s, substituted) && w1(s, s)
    }

  property("rejects any two-substitution mutation") =
    Prop.forAll(Gen.choose(2, 9).flatMap(n => Gen.listOfN(n, genChar).map(_.mkString))) { s =>
      val cps = s.codePoints().toArray
      // flip first and last codepoints to something not occurring there
      def other(cp: Int) = if (cp == 'z') 'y'.toInt else 'z'.toInt
      val mutated = cps.updated(0, other(cps(0))).updated(cps.length - 1, other(cps(cps.length - 1)))
      val m = new String(mutated, 0, mutated.length)
      w1(s, m) == (lev(s, m) <= 1) && !w1(s, m)
    }
}
