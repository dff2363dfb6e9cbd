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
}
