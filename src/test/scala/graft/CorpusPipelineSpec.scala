package graft

import graft.operators.CorpusPipeline
import graft.operators.CorpusPipeline.Config
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Composed corpus-curation pipeline over the real documents table +
  * targeted fixtures for each gate.
  */
class CorpusPipelineSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  test("each stage only narrows the corpus; output is duplicate-free") {
    val docs = Tables.documents(spark, dir)
    val featured = CorpusPipeline.withFeatures(docs)
    val cfg = Config()
    val gated = CorpusPipeline.qualityGate(featured, cfg)
    val exact = CorpusPipeline.exactDedup(gated)
    val near = CorpusPipeline.nearDedup(exact, cfg)
    val n0 = docs.count(); val n1 = gated.count()
    val n2 = exact.count(); val n3 = near.count()
    assert(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 > 0)
    // exact-dedup invariant: fingerprints unique afterwards
    assert(exact.select("fp").distinct().count() == n2)
    // gate invariant: survivors are en + above thresholds
    assert(gated.filter(col("lang") =!= "en"
      || col("n_tok") < cfg.minTokens || col("score") < cfg.minScore).isEmpty)
  }

  test("near-dup stage drops a planted shingle-identical copy") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "the fox runs to the river where the dog is waiting in the sun " +
      "and they walk home together in the evening light of the town"
    val docs = Seq(
      (1L, "en", base),
      (2L, "en", base + " extra tail words here"),  // near-dup of 1
      (3L, "en", "completely different content about spark engines " +
        "and the catalyst optimizer that plans the queries for the " +
        "cluster to execute in parallel over the huge data of the lake"))
      .toDF("doc_id", "lang", "text")
    val out = CorpusPipeline.curate(docs,
        Config(minTokens = 10, minScore = 0.0, nearDupMinMatches = 6))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 3L)) // 2 dropped as near-dup of 1
  }

  test("near-dup threshold applies per pair, not pooled across partners") {
    import spark.implicits._
    // A and B are unrelated; C = A's words ++ B's words. For each
    // minhash i, C's min over its shingle union is min(A's, B's) (bar
    // the 2 boundary shingles), so C matches A OR B on nearly every
    // band — pooled across partners that clears any threshold — but
    // matches EACH of A and B on only about half the bands. Per-pair
    // semantics must keep C; the pooled bug dropped it.
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu anchor beacon cedar"
    val b = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen " +
      "nineteen twenty acorn badger camel donkey eagle falcon gopher heron"
    val docs = Seq((1L, "en", a), (2L, "en", b), (3L, "en", a + " " + b))
      .toDF("doc_id", "lang", "text")
    val cfg = Config(minTokens = 10, minScore = 0.0, nearDupMinMatches = 9)
    val out = CorpusPipeline
      .nearDedup(CorpusPipeline.withFeatures(docs), cfg)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L)) // no single PAIR agrees on >= 9 bands
  }

  test("hot-shingle df cutoff: inert above max df, disables matching at 0") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "the fox runs to the river where the dog is waiting in the sun"
    val docs = Seq(
      (1L, "en", base),
      (2L, "en", base + " extra tail words here"))
      .toDF("doc_id", "lang", "text")
    val featured = CorpusPipeline.withFeatures(docs)
    def survivors(cfg: CorpusPipeline.Config) =
      CorpusPipeline.nearDedup(featured, cfg)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val cfg = Config(minTokens = 10, minScore = 0.0, nearDupMinMatches = 6)
    // generous cutoff (every shingle df <= 2 here): identical result
    assert(survivors(cfg) == survivors(cfg.copy(maxShingleDf = 2L)))
    assert(survivors(cfg) == Seq(1L)) // 2 dropped as near-dup
    // cutoff 0 removes every shingle: no candidates, nothing dropped
    assert(survivors(cfg.copy(maxShingleDf = 0L)) == Seq(1L, 2L))
  }

  test("curate composes with shard packing end-to-end") {
    val curated = CorpusPipeline.curate(Tables.documents(spark, dir))
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val packed = curated
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("shard", expr("CAST(floor((cum - n_tok) / 4000) AS BIGINT)"))
    val shards = packed.groupBy("shard")
      .agg(sum("n_tok").as("tokens"), count(lit(1)).as("docs"))
      .orderBy("shard").collect()
    assert(shards.nonEmpty)
    // every shard starts below the budget boundary; token sums are
    // budget-sized except possibly the last
    shards.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("tokens") >= 4000 - 500 || shards.length == 1)
    }
    val total = shards.map(_.getAs[Long]("tokens")).sum
    val expected = curated.agg(sum("n_tok")).head().getLong(0)
    assert(total == expected) // packing loses nothing
  }

  test("stats summarize the curated corpus") {
    val curated = CorpusPipeline.curate(Tables.documents(spark, dir))
    val row = CorpusPipeline.stats(curated).head()
    assert(row.getAs[Long]("n_docs") == curated.count())
    assert(row.getAs[Long]("total_tokens") > 0)
    val mean = row.getAs[Double]("mean_score")
    assert(mean >= 0.4 && mean <= 1.0)
  }
}
