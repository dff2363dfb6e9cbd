package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical skew evidence for the near-dup family (VERDICT r7 §wrong
  * #1): q28's inverted-index self-join is the exact-Jaccard form and
  * puts f² candidate rows on a shingle shared by f documents; q69's
  * df-cutoff form drops hot shingles BEFORE the join. This spec turns
  * that from argument into measurement on corpora with an injected
  * stopword-heavy duplicate cluster, asserting the deterministic
  * quantity that actually kills a 100 TB run — rows through the
  * equi-join — rather than wall-clock (noisy host):
  *
  *   - q28's candidate volume grows QUADRATICALLY in the cluster
  *     size (4× hotter cluster → ~16× more join output);
  *   - q69's is INVARIANT to the cluster (identical volume at both
  *     cluster sizes: every hot shingle exceeds the cutoff and exits
  *     via the broadcast anti-join).
  */
class SkewEvidenceSpec extends AnyFunSuite with SharedSpark {

  /** sf0.001 + an injected cluster of `f` near-identical stopword
    * documents (the crawl-dup pathology: boilerplate pages differing
    * in one token).
    */
  private def skewedCorpus(f: Int): DataFrame = {
    val hotText = Seq.fill(5)(
      "the of and to a in is it you that he was for on are").mkString(" ")
    val rows = (0 until f).map(i =>
      (100000L + i, s"$hotText uniq$i", "en", "hotsrc",
        (hotText.length + 7).toLong))
    import spark.implicits._
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .union(rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
  }

  /** Distinct 3-token shingles per doc — the inverted-index key both
    * q28 and q69 join on.
    */
  private def shingles(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("toks"))
    .filter(size(col("toks")) >= 3)
    .select(col("doc_id"), explode(expr(
      """transform(sequence(0, size(toks) - 3),
        | k -> concat_ws(' ', toks[k], toks[k+1], toks[k+2]))"""
        .stripMargin)).as("sh"))
    .distinct()

  /** Rows the shingle-keyed self-join emits = the shuffle-side volume
    * the pair aggregation must absorb.
    */
  private def joinVolume(sh: DataFrame): Long =
    sh.as("a").join(sh.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .count()

  private def pruned(sh: DataFrame): DataFrame = {
    val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > graft.queries.Dedup.q69MaxDf).select("sh")
    sh.join(broadcast(hot), Seq("sh"), "left_anti")
  }

  test("q28's join volume is quadratic in the hot cluster; q69's is invariant") {
    val Seq(f1, f2) = Seq(60, 240)
    val sh1 = shingles(skewedCorpus(f1)).cache()
    val sh2 = shingles(skewedCorpus(f2)).cache()
    try {
      val base = joinVolume(shingles(skewedCorpus(0)))
      val raw1 = joinVolume(sh1)
      val raw2 = joinVolume(sh2)
      val cut1 = joinVolume(pruned(sh1))
      val cut2 = joinVolume(pruned(sh2))
      info(f"base=$base raw(f=$f1)=$raw1 raw(f=$f2)=$raw2 " +
        f"cutoff(f=$f1)=$cut1 cutoff(f=$f2)=$cut2")

      // quadratic blowup of the exact form: C(240,2)/C(60,2) ≈ 16.2
      val growth = (raw2 - base).toDouble / (raw1 - base).toDouble
      assert(growth > 10,
        f"expected ~16x quadratic growth of q28's candidate volume, got $growth%.1f")
      // the hot cluster dominates the whole join at f=240 (~35x here,
      // and the ratio keeps growing as f²)
      assert(raw2 > 20 * math.max(cut2, 1),
        s"raw volume $raw2 should dwarf the cutoff form's $cut2")
      // the df-cutoff form never sees the cluster: identical volume
      // at both cluster sizes (every hot shingle's df > cutoff)
      assert(cut1 == cut2,
        s"q69's volume must be invariant to the hot cluster: $cut1 vs $cut2")
    } finally { sh1.unpersist(); sh2.unpersist() }
  }
}
