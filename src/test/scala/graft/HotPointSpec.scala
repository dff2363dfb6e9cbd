package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The HOT-POINT RULE, machine-checked (VERDICT r19 next-round #5).
  *
  * The rule: the per-query regression gate must never adjudicate
  * against a BENCH_DETAIL vector measured under `host_state =
  * degraded` — a steal-inflated baseline raises every per-query bar
  * and waves real quiet-box regressions through. Through round 18
  * the rule lived in BASELINE.md prose and judge memory; round 19's
  * driver then COMMITTED its degraded 68.49 s vector over the
  * 43.74 s quiet cert, proving prose is not enforcement.
  *
  * The structural form (round 20): [[Bench.chooseReference]] walks
  * the committed history of BENCH_DETAIL.json newest-first and takes
  * the first detail whose own host_state verdict is not "degraded".
  * A degraded commit can park on HEAD indefinitely without ever
  * becoming the baseline — committing one is now merely harmless
  * instead of poisonous, which is strictly stronger than a spec that
  * forbids the commit (the driver commits artifacts mechanically and
  * cannot be spec-gated).
  *
  * Also pinned here: [[Bench.tightenPin]]'s 20%-per-round clamp
  * (ADVICE r19 #2 — one anomalously fast calib sample must not
  * permanently lower a pin, or every genuine quiet run thereafter
  * reads degraded and the hot-point rule forbids the commit that
  * would self-correct).
  */
class HotPointSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def d(json: String) = mapper.readTree(json)

  test("chooseReference skips degraded details; newest quiet wins") {
    val hist = Iterator(
      d("""{"value": 68.5, "host_state": "degraded"}"""),
      d("""{"value": 70.1, "host_state": "degraded"}"""),
      d("""{"value": 43.7, "host_state": "quiet"}"""),
      d("""{"value": 46.2, "host_state": "quiet"}"""))
    val ref = Bench.chooseReference(hist)
    assert(ref.isDefined)
    assert(ref.get.get("value").asDouble() == 43.7)
  }

  test("details without host_state are pre-instrument quiet certs") {
    val hist = Iterator(
      d("""{"value": 68.5, "host_state": "degraded"}"""),
      d("""{"value": 46.2}"""))
    assert(Bench.chooseReference(hist).get.get("value").asDouble() == 46.2)
  }

  test("an all-degraded history yields no reference at all") {
    val hist = Iterator(
      d("""{"value": 68.5, "host_state": "degraded"}"""),
      d("""{"value": 70.1, "host_state": "degraded"}"""))
    assert(Bench.chooseReference(hist).isEmpty)
  }

  test("tightenPin: monotone down, clamped to 20% per round, never raised") {
    // a modestly faster sample tightens to the sample
    assert(Bench.tightenPin(0.269, 0.250) == 0.250)
    // an anomalously fast sample (scheduler fluke) is clamped:
    // at most 20% below the current pin in one round
    assert(math.abs(Bench.tightenPin(0.269, 0.050) - 0.269 * 0.8) <= 1e-12)
    // a slower sample never raises the pin
    assert(Bench.tightenPin(0.269, 0.400) == 0.269)
  }

  test("decideReference: all-degraded history yields NO reference, never the disk copy") {
    // ADVICE r20 #1 (medium): with git WORKING but every committed
    // detail degraded, the old resolver silently adjudicated against
    // the working-tree file — the driver's possibly steal-inflated
    // vector, with no host_state check. The decision core must return
    // no reference (gate skipped loudly) and must not even consult
    // the disk thunk.
    var diskRead = false
    val hist = Iterator(
      "aaa" -> d("""{"value": 68.5, "host_state": "degraded"}"""),
      "bbb" -> d("""{"value": 70.1, "host_state": "degraded"}"""))
    val (ref, msg) = Bench.decideReference(Some(hist),
      () => { diskRead = true; Some(d("""{"value": 10.0}""")) })
    assert(ref.isEmpty)
    assert(!diskRead, "disk fallback consulted although git history was readable")
    assert(msg.contains("SKIPPED"))
  }

  test("decideReference: git-unavailable fallback applies the host_state check to the disk copy") {
    val degraded = d("""{"value": 75.9, "host_state": "degraded"}""")
    val (r1, m1) = Bench.decideReference(None, () => Some(degraded))
    assert(r1.isEmpty && m1.contains("SKIPPED"))
    val quiet = d("""{"value": 43.7, "host_state": "quiet"}""")
    val (r2, m2) = Bench.decideReference(None, () => Some(quiet))
    assert(r2.isDefined && r2.get.get("value").asDouble() == 43.7)
    assert(m2.contains("git unavailable"))
    val (r3, _) = Bench.decideReference(None, () => None)
    assert(r3.isEmpty)
  }

  test("decideReference: the chosen node's sha is the one reported") {
    // ADVICE r20 #3: the sha used to travel via a @volatile side
    // effect that was only correct because find() short-circuits;
    // now the pair travels together.
    val hist = Iterator(
      "deadbeef" -> d("""{"value": 68.5, "host_state": "degraded"}"""),
      "cafebabe" -> d("""{"value": 43.7, "host_state": "quiet"}"""),
      "00000000" -> d("""{"value": 46.2, "host_state": "quiet"}"""))
    val (ref, msg) = Bench.decideReference(Some(hist), () => None)
    assert(ref.get.get("value").asDouble() == 43.7)
    assert(msg.contains("cafebabe"))
  }

  test("the live repo's resolved regression reference is never degraded") {
    // Walk the ACTUAL committed history (same resolver the bench
    // gate runs). Regardless of what the driver parked on HEAD, the
    // chosen reference must be a quiet-window cert with a full
    // per-query vector.
    val details = Bench.committedDetails().map(_.toSeq).getOrElse(Nil)
    assume(details.nonEmpty, "git history unavailable in this environment")
    val ref = Bench.chooseReference(details.iterator.map(_._2))
    assert(ref.isDefined,
      "no non-degraded BENCH_DETAIL in the last 50 commits touching it")
    val hs = Option(ref.get.get("host_state")).map(_.asText())
    assert(hs.forall(_ != "degraded"))
    // and it carries the per-query vector the gate compares against
    assert(Option(ref.get.get("queries")).exists(_.size() > 200))
  }
}
