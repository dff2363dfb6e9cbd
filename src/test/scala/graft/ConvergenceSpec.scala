package graft

import graft.operators.SkewJoin
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** (a) Streaming-equals-batch convergence on the REAL events table:
  * the Structured Streaming tumbling aggregation, fed the sf0.001
  * events parquet as a file stream, produces exactly the batch
  * q16_tumbling_window numbers once the stream drains. (b) Salted
  * join produces row-identical results to the plain join.
  */
class ConvergenceSpec extends AnyFunSuite with SharedSpark {

  test("streaming tumbling agg over events parquet converges to batch") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, dir)
    // FileStreamSource needs a directory; stage the single parquet file
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    // normalize ts exactly as Tables.events does (the physical layout
    // has varied across testdata generations: int64 nanos vs micros)
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val rawStream = spark.readStream.schema(rawSchema)
      .parquet(streamDir.toString)
    val stream = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        rawStream.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampType => rawStream
      case _ => rawStream.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
    val q = EventStreams.tumblingAgg(stream)
      .writeStream.format("memory").queryName("conv")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("conv")
        .select("wstart", "event_type", "n", "sum_value")
        .orderBy("wstart", "event_type").collect().toSeq
      val batch = batchEvents
        .groupBy(window(col("ts"), "1 hour").getField("start").as("wstart"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("wstart", "event_type").collect().toSeq
      assert(streamed.size == batch.size && streamed == batch)
    } finally q.stop()
  }

  test("order-sensitive queries are invariant to shuffle partitioning") {
    // band-stack (explicit sort keys) and minhash (min-agg) must give
    // identical results however Spark partitions the shuffle
    val dir = "/root/testdata/sf0.001"
    def run(q: String, parts: String): Seq[String] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    Seq("q34_band_stack", "q29_minhash_sigs", "q35_firstwins_mosaic",
      "q57_dup_clusters")
      .foreach { q =>
        assert(run(q, "2") == run(q, "13"), s"$q varies with partitioning")
      }
  }

  test("salted join is row-identical to the plain join") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey").as("k"), col("o_orderkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("k"), col("c_name"))
    val plain = orders.join(cust, Seq("k"))
      .orderBy("k", "o_orderkey").collect().toSeq
    val salted = SkewJoin.saltedInnerJoin(orders, cust, Seq("k"),
        saltSource = "o_orderkey", saltFactor = 8)
      .select("k", "o_orderkey", "o_totalprice", "c_name")
      .orderBy("k", "o_orderkey").collect().toSeq
    assert(salted == plain)
  }
}
