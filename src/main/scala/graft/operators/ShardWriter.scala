package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard SINK: materialize a packed corpus
  * (graft.queries.TrainingData.packShards output) as the directory
  * layout a training job consumes —
  *
  *   out/<key>=<v>/.../shard=<n>/part-*.parquet
  *
  * with every file internally ordered by the pack order, so a reader
  * streams documents exactly as the token-budget packing laid them
  * out.
  *
  * Scale design: ONE exchange — `repartition(keyCols :+ shard)`
  * hash-spreads shard groups across tasks (a shard never splits, so
  * file count stays O(shards), not O(tasks × shards)); the
  * within-task sort leads with the partition columns so the parquet
  * writer's dynamic-partition path finds its required clustering
  * already satisfied and does NOT insert its own (order-destroying)
  * sort; `orderCol` as the trailing sort key then survives into every
  * file. Directory partitioning gives partition PRUNING on read: a
  * trainer asking for lang=de/shard=7 touches exactly one directory.
  */
object ShardWriter {

  def writeShards(packed: DataFrame, out: String, keyCols: Seq[String],
      orderCol: String): Unit = {
    val partCols = keyCols :+ "shard"
    packed
      .repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols :+ orderCol).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(out)
  }
}
