package graft

import graft.streaming.StreamingDrift
import graft.streaming.StreamingDrift.{DocEvent, DriftOut}
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** StreamingDrift vs its oracle-certified batch gate: with the
  * reference histogram set to the corpus's own length distribution,
  * the batch path must reproduce q104's per-source PSI values; the
  * ProcessingTimeTimeout branch is certified via TestGroupState
  * (the StatefulSessions/StreamingFunnel discipline).
  */
class StreamingDriftSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def corpusReference(): Map[Int, Double] = {
    val counts = Tables.documents(spark, dir)
      .selectExpr("CAST(n_chars DIV 100 AS INT) AS bucket")
      .groupBy("bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    counts.view.mapValues(_ / n).toMap
  }

  test("batch path sits inside the certified q104 row's quantization " +
      "envelope per source (q104 is gated in ql32 units — 32·log2 with " +
      "piecewise-linear interpolation; each ql32(x) underestimates " +
      "32·log2(x) by at most ~3.76 units, so the quantized PSI differs " +
      "from 46.1662·ln-PSI by at most 3.76·Σ|p−q| per source)") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val ref = corpusReference()
    val t0 = Timestamp.valueOf("2024-01-01 00:30:00")
    val docs = Tables.documents(spark, dir)
      .select("source", "n_chars").as[(String, Long)]
      .map { case (src, nc) => DocEvent(t0, src, nc) }
    val got = StreamingDrift.driftPsi(docs, ref)
      .collect().map(o => o.source -> o.psi).toMap
    val want = SparkEntry.queries("q104_drift_psi")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet)
    // per-source Σ_b |p_src(b) − p_corpus(b)| bounds the quantization
    // slack of the gated row's ql32 log against the monitor's ln
    val srcCounts = Tables.documents(spark, dir)
      .selectExpr("source", "CAST(n_chars DIV 100 AS INT) AS bucket")
      .groupBy("source", "bucket").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val perSrcN = srcCounts.groupBy(_._1._1).view
      .mapValues(_.values.sum.toDouble).toMap
    val l1 = srcCounts.keys.groupBy(_._1).view.mapValues { ks =>
      ks.map { case (src, b) =>
        math.abs(srcCounts((src, b)) / perSrcN(src) - ref.getOrElse(b, 0.0))
      }.sum
    }.toMap
    val toQ32 = 32.0 / math.log(2.0) // 46.1662...
    want.foreach { case (src, psiQ32) =>
      val tol = 3.76 * l1(src) + 1e-6
      assert(math.abs(psiQ32 - toQ32 * got(src)) < tol,
        s"$src: q104 $psiQ32 vs stream ${got(src)} (×$toQ32 = " +
          s"${toQ32 * got(src)}), tol $tol")
    }
  }

  test("windows split by event time; counts accumulate across calls") {
    val ref = Map(0 -> 0.5, 1 -> 0.5)
    val tr = StreamingDrift.transition(ref, streaming = true) _
    val key = ("web", 0L)
    val st = TestGroupState.create[Map[Int, Long]](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout(),
      1000L, Optional.of(java.lang.Long.MAX_VALUE), hasTimedOut = false)
    // two micro-batches into the same open window: nothing emitted,
    // state keeps the running bucket counts
    val ev = (nc: Long) => DocEvent(new Timestamp(1000), "web", nc)
    assert(tr(key, Iterator(ev(10), ev(120)), st).isEmpty)
    assert(tr(key, Iterator(ev(30)), st).isEmpty)
    assert(st.get == Map(0 -> 2L, 1 -> 1L))
  }

  test("timeout emits the PSI row and clears the window's state") {
    val ref = Map(0 -> 0.5, 1 -> 0.5)
    val tr = StreamingDrift.transition(ref, streaming = true) _
    val fired = TestGroupState.create[Map[Int, Long]](
      Optional.of(Map(0 -> 2L, 1 -> 1L)),
      GroupStateTimeout.ProcessingTimeTimeout(),
      1000L, Optional.of(java.lang.Long.MAX_VALUE), hasTimedOut = true)
    val out = tr(("web", 0L), Iterator.empty, fired).toSeq
    assert(out.size == 1)
    val o = out.head
    assert(o.source == "web" && o.n_docs == 3 && o.n_buckets == 2)
    val expected = StreamingDrift.psi(Map(0 -> 2L, 1 -> 1L), ref)
    assert(math.abs(o.psi - expected) < 1e-12)
    assert(fired.isRemoved, "window state must clear after emission")
  }

  test("unseen buckets hit the reference floor and score high") {
    val ref = Map(0 -> 1.0) // corpus only ever saw bucket 0
    // a source entirely in bucket 9 (unseen): p=1, q=floor → large PSI
    val psi = StreamingDrift.psi(Map(9 -> 5L), ref)
    assert(psi > 10, s"unseen-bucket drift scored only $psi")
  }

  test("psiQ32 matches the gated q104 algebra on integer counts and " +
      "refuses an observed bucket outside the reference support") {
    // identical distributions → every term is exactly 0
    val ref = Map(0 -> 60L, 1 -> 40L)
    assert(StreamingDrift.psiQ32(Map(0 -> 6L, 1 -> 4L), ref) == 0.0)
    // a shifted histogram scores positive in ql32 units
    assert(StreamingDrift.psiQ32(Map(0 -> 9L, 1 -> 1L), ref) > 0.0)
    // uncovered observed bucket: refuse loudly (the refFloor
    // generalization is psiTwoSided's ln form, not this gate's)
    intercept[IllegalArgumentException] {
      StreamingDrift.psiQ32(Map(7 -> 1L), ref)
    }
  }

  test("two-sided PSI pages on VANISHED mass where one-sided is blind") {
    // reference has two equal classes; the source now produces ONLY
    // class 0, perfectly matching the reference there... in shares?
    // no: its observed share of bucket 0 is 1.0 vs reference 0.5, so
    // one-sided still moves — use a reference where the surviving
    // bucket keeps its exact share, the canonical blind spot:
    // observed {0: 5} vs reference {0: 1.0 of observed support}. With
    // ref = {0 -> 1.0, 1 -> 0.0}... a zero-mass reference bucket is
    // excluded by q>0. The pure blind spot: counts whose support
    // shares renormalize to the reference exactly.
    val ref = Map(0 -> 0.5, 1 -> 0.25, 2 -> 0.25)
    val counts = Map(0 -> 2L, 1 -> 1L, 2 -> 1L)
    // matching support: both gates agree exactly (no missing term)
    assert(StreamingDrift.psiTwoSided(counts, ref) ==
      StreamingDrift.psi(counts, ref))
    // bucket 2 vanishes but 0 and 1 keep their RELATIVE shares ⇒
    // one-sided moves a little; two-sided must additionally carry
    // the missing-mass term (refFloor - q)·ln(refFloor/q) exactly
    val dropped = Map(0 -> 2L, 1 -> 1L)
    val one = StreamingDrift.psi(dropped, ref)
    val two = StreamingDrift.psiTwoSided(dropped, ref)
    val f = StreamingDrift.refFloor
    val missingTerm = (f - 0.25) * math.log(f / 0.25)
    assert(math.abs(two - (one + missingTerm)) < 1e-15)
    assert(two > one, "vanished mass must increase the two-sided score")
    // and the transition wires the flag through to emitted rows
    val tr = StreamingDrift.transition(ref, streaming = true,
      twoSided = true) _
    val fired = TestGroupState.create[Map[Int, Long]](
      Optional.of(dropped), GroupStateTimeout.ProcessingTimeTimeout(),
      1000L, Optional.of(java.lang.Long.MAX_VALUE), hasTimedOut = true)
    val o = tr(("web", 0L), Iterator.empty, fired).toSeq.head
    assert(math.abs(o.psi - two) < 1e-12)
  }
}
