package graft

import graft.operators.ShardWriter
import graft.queries.TrainingData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shard sink: directory layout, per-file ordering, round-trip. */
class ShardWriterSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  test("writes lang=*/shard=* layout, files ordered by doc_id, lossless") {
    val packed = TrainingData.packShards(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          expr("CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT)")
            .as("n_tok")),
      Seq("lang"), "doc_id")
      .select("lang", "doc_id", "n_tok", "shard")
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    ShardWriter.writeShards(packed, out, Seq("lang"), "doc_id")

    // directory layout: lang=<l>/shard=<n>
    val langDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(langDirs.nonEmpty && langDirs.forall(_.startsWith("lang=")), langDirs)
    val shardDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.isDirectory).map(_.getName).toSeq
    assert(shardDirs.nonEmpty && shardDirs.forall(_.startsWith("shard=")), shardDirs)

    // lossless round-trip (same rows, partition columns recovered)
    val back = spark.read.parquet(out)
    val a = packed.select("lang", "doc_id", "n_tok", "shard")
      .collect().map(_.toSeq).toSet
    val b = back.select("lang", "doc_id", "n_tok", "shard")
      .collect().map(_.toSeq).toSet
    assert(a == b)

    // every FILE is internally ordered by doc_id (the pack order a
    // trainer streams)
    val perFile = back.withColumn("f", input_file_name())
      .select("f", "doc_id").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSeq)
    perFile.foreach { case (f, ids) =>
      assert(ids == ids.sorted, s"file $f not ordered: ${ids.take(10)}")
    }

    // a shard never splits across files: (lang, shard) -> 1 file
    val filesPerShard = back.withColumn("f", input_file_name())
      .groupBy("lang", "shard").agg(countDistinct("f").as("nf"))
      .collect().map(_.getLong(2))
    assert(filesPerShard.forall(_ == 1L), filesPerShard.toSeq)
  }

  test("q107 mixture interleave: WFQ fairness holds and survives the write") {
    val rows = TrainingData.queries("q107_mixture_interleave")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._1) // (pos, source, doc_id, shard)

    // per-source subsequence keeps doc_id order (the writer's order
    // contract composes with the interleave's)
    rows.groupBy(_._2).foreach { case (s, rs) =>
      val ids = rs.sortBy(_._1).map(_._3).toSeq
      assert(ids == ids.sorted, s"source $s out of doc_id order")
    }

    // WFQ fairness: up to the first source exhaustion (virtual time
    // v* = √(min n_s)), every source has emitted floor(v*·√n_s) ± 1
    // docs — every prefix carries the √n temperature mixture
    val nSrc = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val vStar = math.sqrt(nSrc.values.min.toDouble)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val prefix = rows.takeWhile { case (_, s, _, _) =>
      val k = seen.getOrElse(s, 0) + 1
      seen(s) = k
      k / math.sqrt(nSrc(s).toDouble) <= vStar + 1e-9
    }
    val byS = prefix.groupBy(_._2).view.mapValues(_.length).toMap
    nSrc.foreach { case (s, n) =>
      val want = math.floor(vStar * math.sqrt(n.toDouble)).toInt
      val got = byS.getOrElse(s, 0)
      assert(math.abs(got - want) <= 1,
        s"source $s: $got docs in the fair prefix, expected ~$want")
    }

    // the interleave order survives ShardWriter: shard=<n> dirs, each
    // file internally ordered by pos, lossless round trip
    val out = java.nio.file.Files.createTempDirectory("graft-mix").toString
    val packed = TrainingData.queries("q107_mixture_interleave")(spark, dir)
    ShardWriter.writeShards(packed, out, Seq(), "pos")
    val back = spark.read.parquet(out)
    assert(back.select("pos", "source", "doc_id", "n_tok", "shard")
      .collect().map(_.toSeq).toSet ==
      packed.collect().map(_.toSeq).toSet)
    val perFile = back.withColumn("f", input_file_name())
      .select("f", "pos").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSeq)
    perFile.foreach { case (f, ps) =>
      assert(ps == ps.sorted, s"file $f not in interleave order")
    }
  }
}
