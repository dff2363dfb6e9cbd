package graft

import graft.operators.BruteKnn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mapPartitions kNN kernel must be bit-identical to the
  * declarative q25 plan (same quantized arithmetic, same tie-breaks).
  */
class BruteKnnSpec extends AnyFunSuite with SharedSpark {

  test("blocked kernel equals the declarative q25 result exactly") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val declarative = SparkEntry.queries("q25_knn_brute")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val blocked = BruteKnn.topK(spark, emb,
        emb.filter(col("vec_id") < 8), k = 5)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(blocked == declarative)
  }
}
