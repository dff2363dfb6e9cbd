package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Partition-pruning evidence (SURVEY.md §4): the reference's MGRS
  * tile grid is a spatial partition key (`conf/config.yaml:13`); when
  * the catalog lake is laid out `PARTITIONED BY (tile)`, a tile
  * predicate prunes directories at planning time — the scan never
  * opens non-matching partitions. This is the 100 TB catalog layout
  * this engine assumes (ProductSelect tile-dispatch path).
  */
class PruningSpec extends AnyFunSuite with SharedSpark {

  test("tile-partitioned catalog scan prunes partitions on tile filter") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cat").toString
    val cat = Seq(
      ("a1", "31TCJ", 2.5), ("a2", "31TCJ", 3.0),
      ("b1", "32TDK", 1.0), ("c1", "30UVU", 4.0))
      .toDF("Id", "tile", "cloudCover")
    cat.write.partitionBy("tile").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("tile") === "31TCJ")
    assert(q.collect().length == 2) // executes q's own plan → metrics live
    val plan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scanExec = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // planner-time partition filter present...
    assert(scanExec.toString.contains("PartitionFilters") &&
      scanExec.toString.contains("31TCJ"))
    // ...and only the matching partition's files were actually read:
    // the table has 4 files across 3 tile dirs; 31TCJ holds 2
    assert(scanExec.metrics("numFiles").value == 2)
  }
}
