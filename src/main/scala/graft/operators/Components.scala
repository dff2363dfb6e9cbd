package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed connected components by iterative min-label
  * propagation — the operator that turns near-duplicate CANDIDATE
  * PAIRS (LSH/SimHash band collisions) into duplicate CLUSTERS, so a
  * curation pipeline can keep exactly one representative per cluster
  * (drop-the-larger-id on pairs under-drops transitive groups).
  *
  * Scale design is SIZE-ADAPTIVE. Candidate graphs are sparse by
  * construction (only pairs that survived banding), so the common
  * case is a driver-sized edge list — solved exactly with one
  * collect + union-find (`maxLocalEdges` cutover, one Spark job).
  * Above the cutover the distributed loop runs: each iteration is
  * one equi-join (labels onto the symmetrized edge list) plus one
  * min-aggregation — the standard large-graph CC loop; iterations
  * are bounded by the component diameter (near-dup clusters are
  * shallow; maxIter guards pathological chains).
  *
  * The loop itself is RDD-based with ONE explicit HashPartitioner
  * shared by the edge table and every round's label table — the
  * GraphX discipline, and the deliberate exception to the
  * DataFrame-first rule. Two reasons, both structural:
  * (1) a DataFrame loop re-enters Catalyst (analyze/optimize/
  * physical-plan/codegen) EVERY round — a fixed per-round cost that
  * AQE cannot remove and that dominated wall-clock on candidate
  * graphs (the data per round is a label table, tiny next to the
  * corpus that produced it); (2) partitioner reuse makes the
  * per-round edge⋈labels join and the union+min fold NARROW
  * (co-partitioned, zero shuffle of the edge table after the single
  * setup partitionBy) — a guarantee the DataFrame API cannot
  * express, and exactly what bounds network cost when the edge list
  * IS large. Each round materializes its label RDD and truncates
  * lineage (`localCheckpoint`), keeping the DAG O(1) per iteration.
  */
object Components {

  /** Eagerly materialize `df` and rebind it with FRESH attribute ids.
    * localCheckpoint alone keeps the original exprIds, and after a few
    * rounds of self-referencing union/join the duplicated ids break
    * Catalyst's Union constraint rewrite (`key not found: id#N`);
    * rebuilding from the checkpointed RDD gives each round a clean
    * attribute namespace AND an O(1) plan.
    */
  private def pin(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Union-find with path compression over an edge array — the
    * driver-side kernel behind the small-graph fast path.
    */
  private def unionFind(pairs: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = parent.getOrElseUpdate(x, x)
      while (parent(r) != r) r = parent(r)
      var c = x // compress the walked path
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // snapshot the key set before the final resolve: find() mutates
    // the map (path compression), and mutating a mutable.HashMap while
    // iterating it is not contractually safe
    val ks = parent.keys.toArray
    ks.iterator.map(v => v -> find(v)).toMap
  }

  /** @param edges columns (src, dst) — undirected, any orientation.
    * @param strict throw instead of warn when maxIter is hit without
    *        converging — un-converged labels mean SPLIT duplicate
    *        clusters downstream, silently under-deduplicating.
    * @param maxLocalEdges size-adaptive cutover: at or below this many
    *        (symmetrized) edges the component structure is solved with
    *        a driver-side union-find in ONE job instead of the
    *        iterative join loop. A near-dup candidate graph is sparse
    *        by construction (only pairs surviving the banding filter),
    *        so in practice even web-scale corpora land under a few
    *        million edges — the same driver-memory budget class as the
    *        IVF centroid collect. Set 0 to force the distributed loop.
    * @param jumpsPerRound static pointer jumps appended to each
    *        round's neighbor-min (each is one more equi-join through
    *        the pinned previous labels). Default 2 is the measured
    *        optimum on LSH candidate graphs — see the loop-body
    *        comment for why more jumps (or jumping through current
    *        labels) does not pay.
    * @param handoffEdges mid-loop contraction cutover: from round 2
    *        on, the loop periodically CONTRACTS the graph to label
    *        space — edges (comp(src), comp(dst)), self-loops dropped,
    *        deduped — and when the contracted residual fits in this
    *        budget it is finished EXACTLY with the driver union-find
    *        and composed back over the distributed labels (one
    *        broadcast relabel). A couple of propagation rounds
    *        collapse the dense near-dup clusters, so the residual
    *        (long chains, stragglers) is orders of magnitude smaller
    *        than the input — paying diameter-many distributed rounds
    *        to flood it is pure fixed cost. Same driver-memory budget
    *        class as `maxLocalEdges`; set 0 to force the loop to run
    *        to fixpoint distributedly.
    * @return (id, comp): every vertex that appears in `edges`, with
    *         comp = the smallest vertex id in its component.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30,
      strict: Boolean = false, maxLocalEdges: Long = 1L << 22,
      jumpsPerRound: Int = 2, handoffEdges: Long = 1L << 22): DataFrame = {
    val spark = edges.sparkSession
    val sym = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .union(edges.select(col("dst").cast("long").as("src"),
        col("src").cast("long").as("dst")))
      .distinct().transform(pin)
    val nEdges = sym.count() // cheap: counts the pinned RDD
    if (nEdges <= maxLocalEdges) {
      // Small-graph fast path: one collect + exact union-find. The
      // distributed loop below costs 2 jobs per round (pin +
      // convergence check); for a driver-sized edge list that fixed
      // overhead dominates by 10x+.
      val pairs = sym.rdd.map(r => (r.getLong(0), r.getLong(1))).collect()
      val labels = unionFind(pairs).toSeq
      import spark.implicits._
      return labels.toDF("id", "comp")
    }
    // Partition the loop to the GRAPH, not the session default: a
    // candidate graph is usually orders of magnitude smaller than the
    // corpus that produced it (only pairs surviving the banding
    // filter), while a truly huge graph gets MORE partitions than the
    // default, keeping per-task edge counts bounded (~64k edges per
    // partition). ONE HashPartitioner instance is shared by the edge
    // table and every round's label table, so the per-round
    // edge⋈labels join and the union+min fold are NARROW — the edge
    // table is shuffled exactly once (setup), never again.
    val nParts = math.min(math.max(4L, nEdges / 65536 + 1), 1L << 14).toInt
    val part = new HashPartitioner(nParts)
    // (src, dst) with both orientations present (sym is symmetrized),
    // keyed by src: joining labels on the key delivers comp(src) to
    // every neighbor dst — the symmetric twin row does the reverse.
    val edgesBySrc: RDD[(Long, Long)] = sym.rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .partitionBy(part)
      .persist()
    def materializeWithSum(rdd: RDD[(Long, Long)]): (RDD[(Long, Long)], Long) = {
      // localCheckpoint: the aggregate job below materializes the
      // blocks AND truncates lineage, keeping the DAG O(1) per round
      // (13 rounds of join/union lineage otherwise grow the stage
      // graph the scheduler must walk on every job).
      val pinned = rdd.localCheckpoint()
      val sum = pinned.aggregate(0L)((a, kv) => a + kv._2, _ + _)
      (pinned, sum)
    }
    // seed = one propagation round for free: comp(v) = min(v, min
    // neighbor) straight out of the first (narrow, co-partitioned)
    // reduce
    var (labels, prevSum) = materializeWithSum(
      edgesBySrc.reduceByKey(part, math.min(_: Long, _: Long))
        .mapPartitions(_.map { case (v, m) => (v, math.min(v, m)) },
          preservesPartitioning = true))
    // min-propagation monotonically decreases the label sum; fixpoint
    // reached when the sum stops moving
    var iter = 0
    var converged = false
    // Contraction probe (shared by the at-seed check and the per-round
    // check below — the probe costs about half a propagation round, so
    // probing early is cheap even when the residual is still too big):
    // project the edge set into label space and, if the deduped
    // residual is driver-sized, finish it exactly with the union-find
    // kernel. comp ids ARE vertex ids (component minima so far) and
    // the union-find roots at min, so composing uf∘comp yields the
    // true global minimum per component — exact, not approximate. The
    // argument holds for the SEED labels too (min(v, neighbors) is a
    // vertex id), which is why the probe now runs once BEFORE the
    // first propagation round (round 19): on candidate graphs whose
    // seed already contracts to driver size — measured on the sf0.1
    // dedup graph: 1620 contracted edges straight out of the seed
    // (791 was the residual after one propagation round, the pre-r19
    // handoff point) — the full join + reduce + pointer-jump round
    // the loop used to pay before its first probe was pure overhead.
    def tryHandoff(): Unit = {
      if (!converged && handoffEdges > 0) {
        val contracted = edgesBySrc.join(labels)
          .map { case (_, (dst, cs)) => (dst, cs) }
          .partitionBy(part)
          .join(labels) // narrow: both sides partitioned by `part`
          .map { case (_, (cs, cd)) =>
            if (cs < cd) (cs, cd) else (cd, cs)
          }
          .filter { case (a, b) => a != b }
          .distinct(nParts)
          .persist()
        val m = contracted.count()
        if (m <= handoffEdges) {
          val uf = unionFind(contracted.collect())
          contracted.unpersist(blocking = false)
          val bc = spark.sparkContext.broadcast(uf)
          val prev = labels
          labels = labels
            .mapValues(c => bc.value.getOrElse(c, c))
            .localCheckpoint()
          labels.count() // materialize before the parent is dropped
          prev.unpersist(blocking = false)
          converged = true
          log.warn(s"connectedComponents round $iter handoff: " +
            s"$m contracted edges finished locally")
        } else contracted.unpersist(blocking = false)
      }
    }
    tryHandoff()
    while (!converged && iter < maxIter) {
      // comp(src) delivered to each neighbor: NARROW join (edges and
      // labels share `part`), then one tiny shuffle to re-key the
      // contributions by receiving vertex
      val neigh = edgesBySrc.join(labels)
        .map { case (_, (dst, comp)) => (dst, comp) }
        .reduceByKey(part, math.min(_: Long, _: Long))
      // labels and neigh share `part` → partitioner-aware union →
      // narrow reduce
      val propagated = labels.union(neigh).reduceByKey(part, math.min(_: Long, _: Long))
      // pointer jumping (path compression): follow comp k more hops
      // through the PREVIOUS round's materialized labels — comp(id) :=
      // min(comp(id), prev_comp^k(comp(id))). Plain neighbor-min needs
      // diameter-many rounds (a 60-chain at sf0.1 cost 40+ s); the
      // jumps keep label chains compressed. Jumping through `labels`
      // (already materialized) rather than the freshly-built
      // `propagated` avoids recomputing the neighbor-min per jump.
      // Measured on the sf0.1 candidate graph: k=2 compresses every
      // stale pointer chain the round exposes (k>2 leaves round counts
      // unchanged — the residual rounds are frontier flooding, which
      // jumping cannot shortcut). Each jump is re-keyed by the current
      // comp (shuffle), joined narrow against `labels`, and re-keyed
      // back by vertex — all on the label table, never the edges.
      var cur = propagated
      for (_ <- 1 to jumpsPerRound) {
        cur = cur.map { case (id, comp) => (comp, id) }
          .partitionBy(part)
          .leftOuterJoin(labels)
          .map { case (comp, (id, hop)) =>
            (id, math.min(comp, hop.getOrElse(comp)))
          }
          .reduceByKey(part, math.min(_: Long, _: Long))
      }
      val prevLabels = labels
      val (updated, newSum) = materializeWithSum(cur)
      labels = updated
      prevLabels.unpersist(blocking = false)
      converged = newSum == prevSum
      prevSum = newSum
      iter += 1
      log.warn(s"connectedComponents round $iter labelSum=$newSum" +
        (if (converged) " (fixpoint)" else ""))
      tryHandoff()
    }
    edgesBySrc.unpersist(blocking = false)
    if (!converged) {
      val msg = s"connectedComponents did not converge in $maxIter " +
        "iterations — labels may split components (duplicate clusters " +
        "under-merged); raise maxIter"
      if (strict) throw new IllegalStateException(msg)
      log.warn(msg)
    }
    // hand the final label RDD back to SQL-land for downstream plans
    spark.createDataFrame(
      labels.map { case (id, comp) => Row(id, comp) },
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("comp", LongType, nullable = false))))
  }
}
