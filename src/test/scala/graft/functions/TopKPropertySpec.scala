package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Properties of the pure top-k buffer kernel: whatever the input
  * stream or merge split, the buffer holds exactly the k best
  * (score DESC, id ASC) entries — i.e. sort-take is the spec.
  */
object TopKPropertySpec extends Properties("topk-kernel") {

  private val entryGen: Gen[(Double, Long)] = for {
    s <- Gen.chooseNum(-100.0, 100.0)
    i <- Gen.chooseNum(0L, 50L) // small id space → frequent score ties
  } yield (s, i)

  private val streamGen: Gen[List[(Double, Long)]] =
    Gen.listOf(entryGen).map(_.distinct)

  private def spec(xs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    xs.sortBy { case (s, i) => (-s, i) }.take(k)

  private def fill(xs: Seq[(Double, Long)], k: Int): TopKAgg.Buf = {
    val b = new TopKAgg.Buf(k)
    xs.foreach { case (s, i) => b.offer(s, i) }
    b
  }

  private def contents(b: TopKAgg.Buf): List[(Double, Long)] =
    (0 until b.size).map(j => (b.scores(j), b.ids(j))).toList

  property("sequential offers == sort-take") =
    forAll(streamGen, Gen.chooseNum(1, 8)) { (xs, k) =>
      contents(fill(xs, k)) == spec(xs, k)
    }

  property("any split + absorb == sort-take (map-side combine safety)") =
    forAll(streamGen, Gen.chooseNum(1, 8), Gen.chooseNum(0, 100)) {
      (xs, k, cut) =>
        val (l, r) = xs.splitAt(cut % (xs.length + 1))
        val a = fill(l, k)
        a.absorb(fill(r, k))
        contents(a) == spec(xs, k)
    }
}
