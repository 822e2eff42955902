package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Properties of the pure sketch kernels (Bloom bitset, Misra-Gries
  * summary) under arbitrary inputs and merge splits — the JVM-side
  * guarantees the gate queries' exact-verify stages lean on.
  */
object SketchPropertySpec extends Properties("sketch-kernels") {

  private val M = 1 << 10
  private val K = 3

  private def bloomOf(items: Seq[String]): Array[Long] = {
    val buf = new Array[Long](M / 64)
    items.foreach { s =>
      (1 to K).foreach { j =>
        val pos = BloomFilterAgg.position(j, s, M)
        buf(pos >>> 6) |= (1L << (pos & 63))
      }
    }
    buf
  }

  private def member(buf: Array[Long], s: String): Boolean =
    (1 to K).forall { j =>
      val pos = BloomFilterAgg.position(j, s, M)
      (buf(pos >>> 6) >>> (pos & 63) & 1L) == 1L
    }

  private val strGen: Gen[String] = Gen.alphaNumStr.map(_.take(12))

  property("bloom: no false negatives, ever") =
    forAll(Gen.listOf(strGen)) { items =>
      val b = bloomOf(items)
      items.forall(member(b, _))
    }

  property("bloom: split + OR-merge == single build") =
    forAll(Gen.listOf(strGen), Gen.chooseNum(0, 100)) { (items, cut) =>
      val (l, r) = items.splitAt(cut % (items.length + 1))
      val merged = bloomOf(l).zip(bloomOf(r)).map { case (a, b) => a | b }
      merged.sameElements(bloomOf(items))
    }

  private val hllHashGen: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, (1L << 60) - 1))

  private def hllMax(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    a.zip(b).map { case (x, y) => math.max(x, y) }

  property("hll: split + max-merge == single build (any cut)") =
    forAll(hllHashGen, Gen.chooseNum(0, 100)) { (hs, cut) =>
      val (l, r) = hs.splitAt(cut % (hs.length + 1))
      hllMax(HllAgg.reference(l, 6), HllAgg.reference(r, 6)) ==
        HllAgg.reference(hs, 6)
    }

  property("hll: idempotent under replay (double the stream, same regs)") =
    forAll(hllHashGen) { hs =>
      HllAgg.reference(hs ++ hs, 6) == HllAgg.reference(hs, 6)
    }

  property("hll: register ranks stay in [0, 55] and only grow") =
    forAll(hllHashGen, hllHashGen) { (a, b) =>
      val ra = HllAgg.reference(a, 6)
      val rab = HllAgg.reference(a ++ b, 6)
      ra.forall(r => r >= 0 && r <= 55) &&
        ra.zip(rab).forall { case (x, y) => y >= x }
    }

  private val mgStreamGen: Gen[List[Long]] = Gen.listOf(
    Gen.frequency(5 -> Gen.const(1L), 3 -> Gen.const(2L),
      4 -> Gen.chooseNum(3L, 40L)))

  private def mgOf(items: Seq[Long], k: Int): MisraGriesAgg.Buf = {
    val b = new MisraGriesAgg.Buf(k)
    items.foreach(b.offer)
    b
  }

  property("misra-gries: heavy survivors + lower bounds under any split") =
    forAll(mgStreamGen, Gen.chooseNum(1, 6), Gen.chooseNum(0, 100)) {
      (xs, k, cut) =>
        val (l, r) = xs.splitAt(cut % (xs.length + 1))
        val merged = mgOf(l, k)
        merged.absorb(mgOf(r, k))
        val truth = xs.groupBy(identity).map { case (i, a) =>
          i -> a.length.toLong }
        val thresh = xs.length.toLong / (k + 1)
        val sizeOk = merged.counts.size <= k
        val lbOk = merged.counts.forall { case (i, c) => c <= truth(i) }
        val heavyOk = truth.filter(_._2 > thresh).keys
          .forall(merged.counts.contains)
        sizeOk && lbOk && heavyOk
    }
}
