package graft.vcr

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure VCR kernels: whatever the record stream
  * looks like, batching never loses or reorders data and never violates
  * the PutRecords caps; the tape codec is the identity; retry respects
  * its deadline.
  */
object BatcherPropertySpec extends Properties("vcr-kernels") {

  private val maxCount = 7
  private val maxBytes = 50L

  private val recordsGen: Gen[List[Array[Byte]]] =
    Gen.listOf(Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray)))

  property("batch caps hold; order/content preserved; only oversize dropped") =
    forAll(recordsGen) { records =>
      val batches = KinesisBatcher.assemble(
        records.iterator, maxCount, maxBytes).toList
      val capsOk = batches.forall { b =>
        b.count <= maxCount && b.bytes <= maxBytes && b.count > 0 &&
          b.bytes == b.payloads.map(_.length.toLong).sum
      }
      val kept = records.filter(_.length <= maxBytes)
      val flat = batches.flatMap(_.payloads)
      val contentOk = flat.map(_.toSeq) == kept.map(_.toSeq)
      // greedy: a batch only closes when it must
      val greedyOk = batches.sliding(2).forall {
        case List(a, b) =>
          a.count == maxCount || a.bytes + b.payloads.head.length > maxBytes
        case _ => true
      }
      capsOk && contentOk && greedyOk
    }

  property("tape line codec is the identity on arbitrary payloads") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)) { payload =>
      val line = java.util.Base64.getEncoder.encodeToString(payload)
      !line.contains("\n") &&
        java.util.Base64.getDecoder.decode(line).toSeq == payload.toSeq
    }

  property("humanize is total with a recognized unit") =
    forAll(Gen.chooseNum(0L, 10000000L)) { mins =>
      Estimator.humanize(mins).matches("\\d+ (mins|hours|days|months)")
    }

  property("retry never exceeds its deadline in simulated time") =
    forAll(Gen.chooseNum(1L, 100000L), Gen.chooseNum(1, 20)) {
      (timeout, failures) =>
        var now = 0L
        var calls = 0
        Retry.withBackoff[Unit](
          () => { calls += 1
            if (calls <= failures) throw new RuntimeException("t") },
          retryOn = _.getMessage == "t",
          timeoutMillis = timeout,
          clock = () => now,
          sleep = s => { now += s })
        Prop(now <= timeout + 1)
    }
}
