package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * shallow; maxIter guards pathological chains). Each iteration of
  * that loop ends in an EAGER
  * `localCheckpoint`: iteration k's plan references iteration k-1
  * twice (union + join), so without truncation the logical plan
  * doubles per round — 2^k nodes — and analysis OOMs around depth
  * ~13 even on a 13-vertex graph. Checkpointing pins the round's
  * result as a plain RDD scan, keeping both plan size and lineage
  * O(1) per iteration.
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

  /** [[pin]] plus the convergence metric (sum of the `comp` column,
    * ordinal 1) computed as a raw job over the just-checkpointed
    * blocks. The loop needs this sum every round; computing it with
    * `agg(sum(...))` would pay a full Catalyst analyze/optimize/
    * codegen cycle per iteration — measurable fixed cost that AQE
    * can't remove — where a fold over the cached RDD partitions is
    * planning-free.
    */
  private def pinWithCompSum(df: DataFrame): (DataFrame, Long) = {
    // LAZY checkpoint + one fold: the aggregate job both materializes
    // the checkpoint blocks and computes the sum — one job per round,
    // not a materialize job followed by a sum job
    val cp = df.localCheckpoint(eager = false)
    val sum = cp.rdd.aggregate(0L)((a, r) => a + r.getLong(1), _ + _)
    (cp.sparkSession.createDataFrame(cp.rdd, cp.schema), sum)
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
    * @return (id, comp): every vertex that appears in `edges`, with
    *         comp = the smallest vertex id in its component.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30,
      strict: Boolean = false, maxLocalEdges: Long = 1L << 22,
      jumpsPerRound: Int = 2): DataFrame = {
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
    // Size the loop's shuffle partitions to the GRAPH, not the session
    // default: each round runs 4-5 exchanges of the edge/label tables,
    // and a candidate graph is usually orders of magnitude smaller
    // than the corpus that produced it — at the session's corpus-sized
    // setting every round pays partitions×exchanges near-empty tasks
    // (the dominant cost of the loop at test scale), while a truly
    // huge graph gets MORE partitions than the default, keeping
    // per-task edge counts bounded (~64k edges per partition). The
    // sizing lives in a CHILD session (newSession: own SQLConf, shared
    // context/cache) so a concurrent query planning in the caller's
    // session never observes the loop's setting; the result is
    // re-bound to the caller's session before returning.
    val loopSession = spark.newSession()
    val target = math.min(math.max(4L, nEdges / 65536 + 1), 1L << 14)
    loopSession.conf.set("spark.sql.shuffle.partitions", target.toString)
    val symLoop = loopSession.createDataFrame(sym.rdd, sym.schema)
    // seed = one propagation round for free: comp(v) = min(v, min
    // neighbor) straight out of the first aggregation
    var (labels, prevSum) = pinWithCompSum(symLoop.groupBy("src")
      .agg(least(min(col("dst")), col("src")).as("comp"))
      .select(col("src").as("id"), col("comp")))
    // min-propagation monotonically decreases the label sum; fixpoint
    // reached when the sum stops moving
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neigh = symLoop.join(labels, symLoop("dst") === labels("id"))
        .select(symLoop("src").as("id"), col("comp"))
      val propagated = labels.select("id", "comp").union(neigh)
        .groupBy("id").agg(min("comp").as("comp"))
      // pointer jumping (path compression): follow comp k more hops
      // through the PREVIOUS round's pinned labels — comp(id) :=
      // min(comp(id), prev_comp^k(comp(id))). Plain neighbor-min
      // needs diameter-many rounds (a 60-chain at sf0.1 cost 40+ s);
      // the jumps keep label chains compressed while the whole round
      // stays ONE plan with ONE pin (planning + fixed job cost per
      // round is half the operator's wall-clock). Jumping through
      // `labels` (a pinned LogicalRDD with its own attributes)
      // rather than the freshly-built `propagated` keeps plan depth
      // linear in k and avoids self-joining a union plan. Measured
      // on the sf0.1 candidate graph: k=2 compresses every stale
      // pointer chain the round exposes (k>2 leaves round counts
      // unchanged — the residual rounds are frontier flooding, which
      // jumping cannot shortcut), and jumping through the CURRENT
      // round's labels instead (classic doubling) recomputes the
      // neighbor-min subplan per jump for barely one round saved —
      // 2x slower end-to-end. k=2 static is the measured optimum.
      var cur = propagated.select(col("id"), col("comp"))
      for (k <- 1 to jumpsPerRound) {
        val p = labels.select(col("id").as(s"p${k}_id"),
          col("comp").as(s"p${k}_comp"))
        cur = cur.join(p, cur("comp") === p(s"p${k}_id"), "left")
          .select(cur("id"),
            least(cur("comp"), coalesce(col(s"p${k}_comp"), cur("comp")))
              .as("comp"))
      }
      val (updated, newSum) = pinWithCompSum(cur)
      labels = updated
      converged = newSum == prevSum
      prevSum = newSum
      iter += 1
      log.warn(s"connectedComponents round $iter labelSum=$newSum" +
        (if (converged) " (fixpoint)" else ""))
    }
    if (!converged) {
      val msg = s"connectedComponents did not converge in $maxIter " +
        "iterations — labels may split components (duplicate clusters " +
        "under-merged); raise maxIter"
      if (strict) throw new IllegalStateException(msg)
      log.warn(msg)
    }
    // labels is a pinned LogicalRDD — re-bind it to the CALLER's
    // session so downstream plans (joins against caller DataFrames)
    // plan under the caller's conf, not the loop's
    spark.createDataFrame(labels.rdd, labels.schema)
  }
}
