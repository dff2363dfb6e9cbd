package graft

import graft.sources.Mq
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** MQ coder (T.800 Annex C): decode(encode(bits)) == bits across
  * context counts, biases, and stream lengths — including the
  * pathological all-LPS and carry/stuffing-heavy streams.
  */
class MqSpec extends AnyFunSuite {

  private def roundTrip(bits: Seq[(Int, Int)], nCx: Int): Unit = {
    val enc = new Mq.Encoder
    val ecx = new Mq.Contexts(nCx)
    bits.foreach { case (cx, d) => enc.encode(ecx, cx, d) }
    val bytes = enc.flush()
    val dec = new Mq.Decoder(bytes)
    val dcx = new Mq.Contexts(nCx)
    bits.zipWithIndex.foreach { case ((cx, d), i) =>
      val got = dec.decode(dcx, cx)
      assert(got == d, s"bit $i (cx=$cx): wrote $d, read $got " +
        s"[stream ${bytes.length}B of ${bits.size} bits]")
    }
  }

  test("random context streams round-trip at every bias") {
    val rnd = new Random(7)
    for (trial <- 0 until 60) {
      val nCx = 1 + rnd.nextInt(19)
      val bias = rnd.nextDouble()
      val n = 1 + rnd.nextInt(3000)
      val bits = Seq.fill(n)(
        (rnd.nextInt(nCx), if (rnd.nextDouble() < bias) 1 else 0))
      roundTrip(bits, nCx)
    }
  }

  test("degenerate streams: all-0, all-1, alternating, single bit") {
    roundTrip(Seq((0, 1)), 1)
    roundTrip(Seq((0, 0)), 1)
    roundTrip(Seq.fill(4096)((0, 0)), 1)
    roundTrip(Seq.fill(4096)((0, 1)), 1)
    roundTrip((0 until 4096).map(i => (0, i % 2)), 1)
    roundTrip((0 until 4096).map(i => (i % 3, (i / 3) % 2)), 3)
  }

  test("non-zero initial states (tier-1's Table D.7) round-trip") {
    val rnd = new Random(11)
    val bits = Seq.fill(2000)((rnd.nextInt(3), rnd.nextInt(2)))
    val enc = new Mq.Encoder
    val ecx = new Mq.Contexts(3)
    ecx.set(0, 4); ecx.set(1, 3); ecx.set(2, 46)
    bits.foreach { case (cx, d) => enc.encode(ecx, cx, d) }
    val bytes = enc.flush()
    val dec = new Mq.Decoder(bytes)
    val dcx = new Mq.Contexts(3)
    dcx.set(0, 4); dcx.set(1, 3); dcx.set(2, 46)
    bits.foreach { case (cx, d) => assert(dec.decode(dcx, cx) == d) }
  }
}
