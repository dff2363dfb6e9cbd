package graft

import graft.functions.Sketches
import graft.functions.Sketches.CountMinAggregator
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch Aggregator: upper-bound property, exactness
  * without collisions, merge-order invariance, and the distributed
  * path through Spark.
  */
class SketchesSpec extends AnyFunSuite with SharedSpark {

  private val rnd = new scala.util.Random(5)
  private val corpus: Seq[String] =
    Seq.fill(2000)(s"tok${rnd.nextInt(50)}") // 50 distinct, skewed-ish
  private val exact: Map[String, Long] =
    corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("estimates are upper bounds and exact at low collision rates") {
    val cms = corpus.foldLeft(Sketches.empty(4, 2048))((s, t) => s.add(t))
    exact.foreach { case (t, n) =>
      val est = cms.estimate(t)
      assert(est >= n)
      assert(est == n) // 50 keys in 4x2048 cells: collisions ~impossible
    }
    assert(cms.estimate("never-seen") == 0L)
  }

  test("narrow sketch still upper-bounds under heavy collisions") {
    val cms = corpus.foldLeft(Sketches.empty(4, 16))((s, t) => s.add(t))
    exact.foreach { case (t, n) => assert(cms.estimate(t) >= n) }
  }

  test("merge is order-invariant (any partitioning gives the same sketch)") {
    val parts = corpus.grouped(300).toSeq
    val sketches = parts.map(_.foldLeft(Sketches.empty(4, 512))((s, t) => s.add(t)))
    val fwd = sketches.reduceLeft((a, b) =>
      a.copy(counts = a.counts.clone()).mergeWith(b))
    val rev = sketches.reverse.reduceLeft((a, b) =>
      a.copy(counts = a.counts.clone()).mergeWith(b))
    assert(fwd.counts.toSeq == rev.counts.toSeq)
    assert(exact.forall { case (t, n) => fwd.estimate(t) >= n })
  }

  test("distributed aggregation through Spark matches local build") {
    import spark.implicits._
    val local = corpus.foldLeft(Sketches.empty(4, 512))((s, t) => s.add(t))
    val ds = spark.createDataset(corpus).repartition(8)
    val dist = ds.select(new CountMinAggregator(4, 512).toColumn).head()
    assert(dist.counts.toSeq == local.counts.toSeq)
  }

  // ---- HyperLogLog ----------------------------------------------

  test("HLL estimates distinct counts within a few percent") {
    val n = 20000
    val tokens = (0 until n).map(i => s"item-$i")
    val hll = tokens.foldLeft(Sketches.emptyHll(12))((s, t) => s.add(t))
    val est = hll.estimate
    assert(math.abs(est - n) / n < 0.05, s"estimate $est for $n")
    // duplicates don't move the estimate (idempotent add)
    val hll2 = (tokens ++ tokens ++ tokens)
      .foldLeft(Sketches.emptyHll(12))((s, t) => s.add(t))
    assert(hll2.estimate == est)
    // small range uses linear counting: near-exact
    val small = (0 until 30).map(i => s"s$i")
      .foldLeft(Sketches.emptyHll(12))((s, t) => s.add(t))
    assert(math.abs(small.estimate - 30) < 1.0)
  }

  test("HLL merge is order- and partitioning-invariant") {
    val tokens = (0 until 5000).map(i => s"item-$i")
    val whole = tokens.foldLeft(Sketches.emptyHll(10))((s, t) => s.add(t))
    val parts = tokens.grouped(700).map(
      _.foldLeft(Sketches.emptyHll(10))((s, t) => s.add(t))).toSeq
    val mergedFwd = parts.map(p => Sketches.HLL(p.p, p.registers.clone()))
      .reduceLeft(_.mergeWith(_))
    val mergedRev = parts.reverse.map(p => Sketches.HLL(p.p, p.registers.clone()))
      .reduceLeft(_.mergeWith(_))
    assert(mergedFwd.registers.toSeq == whole.registers.toSeq)
    assert(mergedRev.registers.toSeq == whole.registers.toSeq)
  }

  test("distributed HLL over Spark matches the local sketch") {
    import spark.implicits._
    val tokens = (0 until 8000).map(i => s"item-${i % 3000}") // 3000 distinct
    val local = tokens.foldLeft(Sketches.emptyHll(12))((s, t) => s.add(t))
    val dist = spark.createDataset(tokens).repartition(16)
      .select(new Sketches.HllAggregator(12).toColumn).head()
    assert(dist.registers.toSeq == local.registers.toSeq)
    assert(math.abs(dist.estimate - 3000) / 3000 < 0.05)
  }

  test("quantile sketch: bounded rank error on shuffled input") {
    val rnd = new scala.util.Random(11)
    val n = 50000
    val xs = rnd.shuffle((1 to n).map(_.toDouble).toVector)
    val sk = xs.foldLeft(Sketches.emptyQuantile(256))(_.add(_))
    assert(sk.n == n)
    // values ARE their own ranks here, so the estimate's rank error is
    // |estimate - q*n|; the compactor bound at k=256 is well under 2%
    Seq(0.01, 0.25, 0.5, 0.75, 0.95, 0.99).foreach { q =>
      val est = sk.quantile(q)
      assert(math.abs(est - q * n) <= 0.02 * n,
        s"q=$q est=$est true=${q * n}")
    }
  }

  test("quantile sketch merge stays within bound in any merge order") {
    val rnd = new scala.util.Random(23)
    val n = 40000
    val xs = rnd.shuffle((1 to n).map(_.toDouble).toVector)
    val parts = xs.grouped(7001)
      .map(_.foldLeft(Sketches.emptyQuantile(256))(_.add(_))).toSeq
    val fwd = parts.reduceLeft(_.mergeWith(_))
    val rev = parts.reverse.reduceLeft(_.mergeWith(_))
    Seq(fwd, rev).foreach { m =>
      assert(m.n == n)
      Seq(0.1, 0.5, 0.9).foreach { q =>
        assert(math.abs(m.quantile(q) - q * n) <= 0.03 * n,
          s"q=$q est=${m.quantile(q)}")
      }
    }
  }

  test("distributed quantile sketch over Spark: doc-length p50/p95") {
    import spark.implicits._
    val lens = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.expr(
        "CAST(length(text) AS DOUBLE)").as("len")).as[Double]
    val sk = lens.repartition(8)
      .select(new Sketches.QuantileAggregator(256).toColumn).head()
    val exact = lens.collect().sorted
    val n = exact.length
    Seq(0.5, 0.95).foreach { q =>
      val est = sk.quantile(q)
      val estRank = exact.count(_ <= est)
      assert(math.abs(estRank - q * n) <= math.max(0.05 * n, 3.0),
        s"q=$q est=$est rank=$estRank n=$n")
    }
  }

  // ---------------------------------------------------------------
  // Misra-Gries

  private def mgCheck(mg: Sketches.MG, ex: Map[String, Long], n: Long): Unit = {
    assert(mg.n == n)
    assert(mg.keys.size <= mg.k)
    val err = n / (mg.k + 1)
    ex.foreach { case (t, c) =>
      val est = mg.estimate(t)
      assert(est <= c, s"$t overestimated: $est > $c")
      assert(est >= c - err, s"$t underestimated past the bound: $est < $c - $err")
      if (c > err) assert(est > 0, s"heavy hitter $t ($c > $err) missing")
    }
  }

  private val zipf: Seq[String] = {
    val r = new scala.util.Random(11)
    // skewed: token id ~ floor(200 * u^3) — few heavy, long tail
    Seq.fill(5000)(s"z${(200 * math.pow(r.nextDouble(), 3)).toInt}")
  }
  private val zipfExact: Map[String, Long] =
    zipf.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("MG: deterministic bounds hold and every heavy hitter survives") {
    val mg = zipf.foldLeft(Sketches.emptyMg(32))((s, t) => s.add(t))
    mgCheck(mg, zipfExact, zipf.size.toLong)
  }

  test("MG: the bound survives ANY merge tree (values may differ — " +
      "guarantee-deterministic, not bit-deterministic)") {
    val parts = zipf.grouped(700).toSeq
      .map(_.foldLeft(Sketches.emptyMg(32))((s, t) => s.add(t)))
    val leftFold = parts.reduceLeft(_ mergeWith _)
    val rightFold = parts.reduceRight(_ mergeWith _)
    mgCheck(leftFold, zipfExact, zipf.size.toLong)
    mgCheck(rightFold, zipfExact, zipf.size.toLong)
  }

  test("MG two-pass heavy hitters over Spark: the summary's survivors " +
      "are a superset of every true heavy hitter, at any partitioning") {
    import spark.implicits._
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS t")
      .as[String].cache()
    val ex = toks.groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = ex.values.sum
    Seq(1, 7, 32).foreach { parts =>
      val mg = toks.repartition(parts)
        .select(new Sketches.MisraGriesAggregator(64).toColumn).head()
      mgCheck(mg, ex, n)
      // pass 2 of the production shape: exact-count only the <=k
      // survivors; every token above the threshold must be there
      val heavy = ex.filter(_._2 > n / 65).keySet
      assert(heavy.subsetOf(mg.keys.toSet),
        s"heavy hitters escaped the summary at $parts partitions")
    }
  }
}
