package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the trained ANN index — the missing step between
  * "q103 composes IVF + PQ in one session" and "a 100 TB embedding
  * lake serves queries tomorrow": the codes land as a CELL-PARTITIONED
  * parquet layout, so a search probing nProbe cells touches exactly
  * nProbe directories (Catalyst partition pruning does the [[Ivf]]
  * scan cut on DISK, not just in the plan), and the model (centroids +
  * codebooks) rides along as two model-sized tables.
  *
  *   out/codes/cell=<c>/part-*.parquet   (vec_id, code ARRAY<INT>)
  *   out/model/centroids/                (cid, dim, v)
  *   out/model/codebooks/                (j, cid, dim, v)
  *
  * Scale: ONE exchange on cell for the codes (file count stays
  * O(cells), the ShardWriter discipline); the model tables are
  * driver-sized by construction (k·d and m·k·d/m doubles).
  * IndexStoreSpec proves save→load→search bit-identical to the
  * in-session q103 path and that a probed read touches only the
  * probed cell directories.
  */
object IndexStore {

  def save(encoded: DataFrame, cents: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], out: String,
      idCol: String = "vec_id", cellCol: String = "cell",
      codeCol: String = "code"): Unit = {
    val s = encoded.sparkSession
    import s.implicits._
    encoded.select(col(idCol), col(cellCol), col(codeCol))
      .repartition(col(cellCol))
      .write.mode("overwrite").partitionBy(cellCol)
      .parquet(s"$out/codes")
    cents.zipWithIndex.flatMap { case (c, cid) =>
      c.zipWithIndex.map { case (v, dim) => (cid, dim, v) }
    }.toDF("cid", "dim", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/model/centroids")
    codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.flatMap { case (cw, cid) =>
        cw.zipWithIndex.map { case (v, dim) => (j, cid, dim, v) }
      }
    }.toDF("j", "cid", "dim", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/model/codebooks")
  }

  /** The cell-partitioned code table; filter on `cell` before use so
    * partition pruning cuts the scan to the probed directories.
    */
  def loadCodes(s: SparkSession, out: String): DataFrame =
    s.read.parquet(s"$out/codes")

  def loadCentroids(s: SparkSession, out: String): Seq[Seq[Double]] =
    s.read.parquet(s"$out/model/centroids")
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }

  def loadCodebooks(s: SparkSession, out: String): Seq[Seq[Seq[Double]]] =
    s.read.parquet(s"$out/model/codebooks")
      .collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, sub) =>
        sub.groupBy(_.getInt(1)).toSeq.sortBy(_._1)
          .map { case (_, rows) =>
            rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
          }
      }
}
