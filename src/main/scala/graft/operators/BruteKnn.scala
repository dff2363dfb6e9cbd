package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked brute-force cosine top-k — the deliberate `mapPartitions`
  * tier (the builder brief's option (d), justified here and only
  * here): the inner loop is a dense dot-product over every (corpus
  * row × query) pair, which SQL higher-order functions evaluate
  * interpreted per element, while this kernel runs as JIT-compiled
  * primitive-array arithmetic.
  *
  * Distribution shape: the query matrix is tiny (top-k search always
  * has few queries per batch) and rides inside the closure
  * (broadcast); the corpus streams through one scan; each partition
  * emits at most k candidates per query (a local top-k), and one
  * final window pass takes the global k — so the shuffle carries
  * O(partitions × queries × k) rows, never the pair cross-product.
  *
  * Arithmetic matches graft.queries.SimSearch exactly (quantize to
  * 1e6 longs → exact integer dot/norms → one double divide), so the
  * result is bit-identical to the declarative q25 plan.
  */
object BruteKnn {

  /** @param corpus  (vec_id: Long, embedding: Array[Float])
    * @param queries same schema; must be small (collected to driver)
    */
  def topK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    import spark.implicits._

    def quantize(v: Seq[Float]): Array[Long] =
      v.map(x => math.round(x.toDouble * 1000000)).toArray
    def norm2(q: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < q.length) { s += q(i) * q(i); i += 1 }
      s
    }

    val qRows = queries.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), quantize(r.getSeq[Float](1))))
    val qIds = qRows.map(_._1)
    val qVecs = qRows.map(_._2)
    val qNorms = qVecs.map(norm2)

    val candidates = corpus.select("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        // per-query bounded heaps (size k) for this partition
        val heaps = Array.fill(qIds.length)(
          collection.mutable.PriorityQueue.empty[(Double, Long)](
            Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, t._2))))
        it.foreach { case (cId, emb) =>
          val cv = quantize(emb.toSeq)
          val cn = norm2(cv)
          var qi = 0
          while (qi < qIds.length) {
            if (cId != qIds(qi)) {
              val qv = qVecs(qi)
              var dot = 0L; var d = 0
              while (d < cv.length) { dot += qv(d) * cv(d); d += 1 }
              val cos = dot.toDouble /
                (math.sqrt(qNorms(qi).toDouble) * math.sqrt(cn.toDouble))
              val h = heaps(qi)
              h.enqueue((cos, cId))
              if (h.size > k) h.dequeue() // drop current worst
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.toSeq.map { case (cos, cId) => (qIds(qi), cId, cos) }
        }
      }
      .toDF("q_id", "c_id", "cosine")

    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
    candidates
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "c_id", "cosine")
  }
}
