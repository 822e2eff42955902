package graft.dedup

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Properties of the D33 deletion-neighborhood kernel under arbitrary
  * strings — the completeness/soundness pair the planted DedupSpec
  * cases illustrate but can't prove. Small alphabet on purpose: 'a-c'
  * over lengths 0-8 makes variant collisions and every edit class
  * common instead of astronomically rare.
  */
object FuzzyPropertySpec extends Properties("fuzzy-kernels") {

  /** Pure mirror of the SQL deletion-variant scheme: position i
    * removed for i in 0..len-1, plus the identity.
    */
  private def variants(s: String): Set[String] =
    (0 until s.length).map(i => s.take(i) + s.drop(i + 1)).toSet + s

  private def lev(a: String, b: String): Int = {
    val d = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) d(i)(0) = i
    for (j <- 0 to b.length) d(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val sGen: Gen[String] = Gen.chooseNum(0, 8)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  property("completeness: lev<=1 pairs ALWAYS share a deletion variant") =
    forAll(sGen, sGen) { (a, b) =>
      lev(a, b) > 1 || (variants(a) intersect variants(b)).nonEmpty
    }

  property("soundness bound: sharing a variant implies lev<=2 " +
    "(candidates are near; the exact verify prunes the lev=2 shell)") =
    forAll(sGen, sGen) { (a, b) =>
      (variants(a) intersect variants(b)).isEmpty || lev(a, b) <= 2
    }

  property("variant count is exactly len+1 or fewer (dup deletions " +
    "collapse), so the index explode is bounded") =
    forAll(sGen) { s =>
      val v = variants(s)
      v.size <= s.length + 1 && v.contains(s)
    }
}
