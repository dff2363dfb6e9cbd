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

  /** Append newly encoded vectors to an existing index WITHOUT
    * touching resident codes: the new files land inside their `cell=`
    * directories (parquet append, same one-exchange discipline as
    * [[save]]); the model tables are immutable. Correct because cell
    * assignment and PQ codes are per-vector functions of the SAVED
    * model, so append-then-search is bit-identical to a full rebuild
    * (pinned by q121 against q103's oracle). This is the 100 TB
    * maintenance story: ingest streams INTO the index between
    * retrains, while q106's drift gate and q108's migration audit
    * decide when the model itself has rotted enough to rebuild.
    */
  def append(encoded: DataFrame, out: String, idCol: String = "vec_id",
      cellCol: String = "cell", codeCol: String = "code"): Unit =
    encoded.select(col(idCol), col(cellCol), col(codeCol))
      .repartition(col(cellCol))
      .write.mode("append").partitionBy(cellCol)
      .parquet(s"$out/codes")

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
