package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-internal invariants of the round-7 analytics additions —
  * properties that must hold regardless of the DuckDB twin (which
  * certifies cross-engine value equality, not semantics): the
  * documented order-independence claims under physical re-layout,
  * and the algebraic identities each operator is built on.
  */
class QueryInvariantsSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"

  private def rows(q: String): Seq[String] =
    SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq

  test("q97 cluster cohesion is aggregation-layout-invariant") {
    // the exact-integer sum-vector argument says accumulation order
    // cannot matter; vary the shuffle layout (and with it the
    // partial-aggregation grouping and reduction order) and demand
    // bit-identical output
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    try {
      val outs = Seq("1", "7", "32").map { n =>
        spark.conf.set(key, n)
        rows("q97_cluster_cohesion")
      }
      assert(outs.distinct.size == 1,
        s"cohesion diverged across shuffle layouts")
    } finally spark.conf.set(key, orig)
  }

  test("q96 recall audit: recall is in [0, 1] and hits match the " +
      "intersection definition") {
    val df = SparkEntry.queries("q96_ann_recall")(spark, dir)
    val bad = df.filter(col("recall") < 0 || col("recall") > 1
      || col("hits") =!= (col("recall") * 5).cast("long")).count()
    assert(bad == 0)
  }

  test("q100 pagerank conserves probability mass") {
    // on the symmetrized graph every node has out-degree >= 1, so
    // each iteration redistributes all mass: sum(pr) == 1 up to the
    // per-node round-6 output rounding (n/2 * 1e-6 worst case)
    val df = SparkEntry.queries("q100_pagerank")(spark, dir)
    val n = df.count()
    val total = df.agg(sum("pr")).collect()(0).getDouble(0)
    assert(math.abs(total - 1.0) <= n * 5e-7 + 1e-9,
      s"mass $total over $n nodes")
  }

  test("q101 cohort matrix: n_active never exceeds cohort_size and " +
      "every cohort is fully active in its onboarding week") {
    val df = SparkEntry.queries("q101_cohort_retention")(spark, dir).cache()
    assert(df.filter(col("n_active") > col("cohort_size")).count() == 0)
    // a user is by definition active in the week containing their
    // first-seen day: retention == 1.0 at week = cohort DIV 7
    val onboarding = df.filter(col("week") === expr("CAST(cohort DIV 7 AS INT)"))
    assert(onboarding.filter(col("retention") =!= 1.0).count() == 0)
  }

  test("q104 PSI is non-negative for every source") {
    // each term (p_src - p_corpus) * ln(p_src / p_corpus) has both
    // factors sharing a sign, so the sum is >= 0 up to round-6
    val df = SparkEntry.queries("q104_drift_psi")(spark, dir)
    assert(df.filter(col("psi_q32") < -1e-6).count() == 0)
  }

  test("q106 embedding-drift PSI is non-negative and covers <= k cells") {
    val df = SparkEntry.queries("q106_embed_drift_psi")(spark, dir).cache()
    assert(df.filter(col("psi_q32") < -1e-6).count() == 0)
    assert(df.filter(col("n_cells") < 1 || col("n_cells") > 4).count() == 0)
  }

  test("q107 interleave is a dense total order with monotone shards") {
    val df = SparkEntry.queries("q107_mixture_interleave")(spark, dir)
      .orderBy("pos").cache()
    val n = df.count()
    // positions are exactly 0..n-1 (a permutation of the corpus)
    assert(df.agg(min("pos"), max("pos"), countDistinct("pos"))
      .collect()(0).toSeq == Seq(0L, n - 1, n))
    // token-budget packing never decreases the shard id along the order
    val shards = df.select("shard").collect().map(_.getLong(0))
    assert(shards.zip(shards.tail).forall { case (a, b) => a <= b })
  }

  test("q113 savings rollup is consistent with the q57 labels it rolls up") {
    val savings = SparkEntry.queries("q113_dedup_savings")(spark, dir).cache()
    val labeled = SparkEntry.queries("q57_dup_clusters")(spark, dir).count()
    val nDocs = savings.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(nDocs == labeled, s"rollup covers $nDocs docs, labels $labeled")
    // every cluster in the candidate graph has >= 2 members, removal
    // always saves something, and docs_removable = n_docs - n_clusters
    assert(savings.filter(col("cluster_size") < 2).count() == 0)
    assert(savings.filter(col("tokens_removable") <= 0).count() == 0)
    assert(savings.filter(
      col("docs_removable") =!= col("n_docs") - col("n_clusters")).count() == 0)
  }

  test("q108 migration matrix partitions the corpus and frac sums to 1") {
    val df = SparkEntry.queries("q108_cell_migration")(spark, dir).cache()
    val total = df.agg(sum("n")).collect()(0).getLong(0)
    val corpus = Tables.embeddings(spark, dir).count()
    assert(total == corpus, s"matrix mass $total != corpus $corpus")
    val fracSum = df.agg(sum("frac")).collect()(0).getDouble(0)
    assert(math.abs(fracSum - 1.0) <= df.count() * 5e-7 + 1e-9)
    assert(df.filter(col("cell_old") < 0 || col("cell_old") > 3
      || col("cell_new") < 0 || col("cell_new") > 3).count() == 0)
  }

  test("q105 shard fills are ordered min <= avg <= max and consistent") {
    val bad = SparkEntry.queries("q105_shard_balance")(spark, dir)
      .filter(col("min_fill") > col("avg_fill")
        || col("avg_fill") > col("max_fill")
        || col("n_shards") < 1
        || col("total_tokens") < col("min_fill") * col("n_shards")
        || col("total_tokens") > col("max_fill") * col("n_shards"))
      .count()
    assert(bad == 0)
  }

  test("q103 ivf-pq results come only from the query's probed cells") {
    // the composed index must never return a vector outside the
    // coarse quantizer's routing — a cross-join fallback or a cell
    // mixup would surface here as an out-of-probe hit. Rebuild
    // q103's own fixed model (the quantized vectors of ids
    // 0/10/20/30) and check every hit's corpus cell is among its
    // query's probe cells.
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS DOUBLE))")
        .as("embedding"))
    val fixed = corpus.filter(col("vec_id").isin(0L, 10L, 20L, 30L))
      .orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    val assigned = graft.operators.Ivf.assign(corpus, fixed, "embedding")
      .select(col("vec_id").as("c_id"), col("cell").as("c_cell"))
    val probed = graft.operators.Ivf.probeCells(
        corpus.filter(col("vec_id") < 8), fixed, nProbe = 2)
      .select(col("q_id"), col("cell").as("p_cell"))
    val outOfProbe = SparkEntry.queries("q103_ivfpq_search")(spark, dir)
      .join(assigned, "c_id")
      .join(probed, "q_id")
      .groupBy("q_id", "c_id")
      .agg(max(when(col("c_cell") === col("p_cell"), 1).otherwise(0))
        .as("in_probe"))
      .filter(col("in_probe") === 0)
      .count()
    assert(outOfProbe == 0)
  }

  test("q99 ledger never reports more drops than droppable windows") {
    val df = SparkEntry.queries("q99_window_dedup")(spark, dir)
    assert(df.filter(col("n_dropped") >= col("n_windows")).count() == 0)
    assert(df.filter(col("drop_ratio") <= 0 || col("drop_ratio") >= 1)
      .count() == 0)
  }

  test("q136 operating curve: recall and cells_read are monotone in " +
      "nProbe, and probing every cell recovers brute-force truth " +
      "exactly") {
    val df = SparkEntry.queries("q136_ann_recall_curve")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    // monotone per query: more probes can only add candidates, so
    // recall and cells_read never decrease along the sweep
    df.groupBy(_._2).foreach { case (q, rs) =>
      val byNp = rs.sortBy(_._1)
      byNp.sliding(2).foreach {
        case Array((_, _, c1, r1), (np2, _, c2, r2)) =>
          assert(r2 >= r1, s"recall not monotone for q=$q at np=$np2")
          assert(c2 >= c1, s"cells_read not monotone for q=$q at np=$np2")
        case _ => ()
      }
      // nProbe = k (all 8 cells): the probed search IS the brute
      // search, so recall@5 must be exactly 1.0 — the curve's anchor
      assert(byNp.last._4 == 1.0, s"recall@allCells != 1 for q=$q")
    }
    assert(df.map(_._2).distinct.length == 8)
  }

  test("q137 catalog-to-index composition serves only dedup survivors " +
      "of the picked tiles") {
    val res = SparkEntry.queries("q137_catalog_to_index")(spark, dir)
    val served = res.select("c_id").distinct()
      .collect().map(_.getLong(0)).toSet
    // recompute the survivor set independently (q72 winners' tiles ->
    // min doc_id per exact-content fingerprint)
    val tiles = SparkEntry.queries("q72_best_per_aoi")(spark, dir)
      .select((col("uuid").cast("long") % 60).as("t"))
      .collect().map(_.getLong(0)).toSet
    val survivors = Tables.documents(spark, dir)
      .filter((col("doc_id") % 60).isin(tiles.toSeq.map(Long.box): _*))
      .select(col("doc_id"), expr("md5(concat_ws(' ', " +
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)))").as("fp"))
      .groupBy("fp").agg(min("doc_id").as("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(served.nonEmpty && served.subsetOf(survivors),
      s"served ids escaped the survivor set: ${served -- survivors}")
  }

  test("q141 grouped OLS: normal equations hold and R2 is sane") {
    // the fitted coefficients must satisfy the normal equations
    // XᵀXb = Xᵀy — recompute the residual-gradient Xᵀ(y − Xb) from
    // the raw features per lang and demand it vanish (to double
    // round-off scaled by the Gram magnitudes); R² in (0, 1] because
    // the intercept-only model is nested in the fit
    val model = SparkEntry.queries("q141_ols_grouped")(spark, dir).cache()
    assert(model.count() == Tables.documents(spark, dir)
      .select("lang").distinct().count())
    assert(model.filter(col("r2") <= 0 || col("r2") > 1).count() == 0)
    val grad = queries.Analytics.olsFeatures(spark, dir)
      .join(queries.Analytics.olsModel(spark, dir)
        .select("lang", "b0d", "b1d", "b2d"), Seq("lang"))
      .withColumn("e", expr(
        "CAST(y AS DOUBLE) - (b0d + b1d * x1 + b2d * x2)"))
      .groupBy("lang")
      .agg(sum("e").as("g0"), sum(expr("e * x1")).as("g1"),
        sum(expr("e * x2")).as("g2"),
        sum(expr("abs(e) * (1 + abs(x1) + abs(x2))")).as("scale"))
    val bad = grad.filter(
      abs(col("g0")) + abs(col("g1")) + abs(col("g2")) >
        col("scale") * 1e-9 + lit(1e-6)).count()
    assert(bad == 0, "normal equations violated")
  }

  test("q142 waterfill: budget exhausted, caps respected, surplus " +
      "flows to the uncapped group") {
    val df = SparkEntry.queries("q142_epoch_waterfill")(spark, dir).cache()
    val langs = df.count()
    assert(df.filter(col("target_tokens") > col("cap_tokens")).count() == 0)
    assert(df.filter(col("epochs") > 2.000001).count() == 0)
    // both branches exercised on this corpus: en uncapped, rest capped
    assert(df.filter(col("lang") === "en" && col("capped") === 0).count() == 1)
    assert(df.filter(col("capped") === 1).count() >= 1)
    // Σ target == B up to the per-group floor loss
    val Seq(tgt, tot) = df.agg(sum("target_tokens"), sum("n_tokens"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]): @unchecked
    val budget = math.floor(1.8 * tot).toLong
    assert(tgt <= budget && tgt >= budget - langs,
      s"allocated $tgt of budget $budget")
  }

  test("q128 serve segmentation is COMPLETE: pieces concatenate back " +
      "to every word, and fertility's piece counts agree") {
    // lossless-segmentation invariant: BPE may only merge, never drop
    // or alter symbols — so stripping the piece separators must
    // reproduce each word exactly, for every word in the serve table
    val rows = SparkEntry.queries("q128_bpe_serve")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[String]("w")
      val pieces = r.getAs[String]("pieces")
      assert(pieces.replace(" ", "") == w,
        s"segmentation not lossless for '$w': '$pieces'")
      assert(r.getAs[Long]("n_pieces") == pieces.split(" ").length.toLong)
    }
    // q148's weighted fertility must be bounded by the per-word
    // extremes of the same serve table
    val fert = SparkEntry.queries("q148_bpe_fertility")(spark, dir)
      .collect().map(_.getAs[Double]("fertility"))
    val perWord = rows.map(_.getAs[Long]("n_pieces").toDouble)
    assert(fert.forall(f => f >= perWord.min && f <= perWord.max))
  }

  test("q156 skew report: factor >= 1 by construction, key counts " +
      "match independent distincts") {
    val rows = SparkEntry.queries("q156_join_skew_report")(spark, dir)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      // max >= mean always, so the factor cannot dip below 1
      assert(r.getAs[Double]("skew_factor") >= 1.0, r.toString)
    }
    val nk = rows.map(r =>
      r.getAs[String]("col_name") -> r.getAs[Long]("n_keys")).toMap
    val li = Tables.lineitem(spark, dir)
    Seq("l_orderkey", "l_partkey", "l_suppkey").foreach { c =>
      assert(nk(c) == li.select(c).distinct().count(), c)
    }
  }

  test("q158 quantized-IRLS training is reduction-layout-invariant: " +
      "bit-identical coefficients across physical re-layouts") {
    // the order-independence claim behind the 100 TB posture: the
    // weighted sufficient statistics are DECIMAL sums of integers,
    // so the partial-aggregation tree (per-partition partials, merge
    // order) cannot change a bit of the trained model
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    try {
      val outs = Seq(1 -> "1", 7 -> "5", 32 -> "32").map {
        case (parts, shuffle) =>
          spark.conf.set(key, shuffle)
          graft.queries.TextAnalysis.qcModelFresh(spark, dir, parts)
            .collect().map(_.toString).toSeq
      }
      assert(outs.distinct.size == 1,
        s"trained coefficients diverged across layouts: $outs")
    } finally spark.conf.set(key, orig)
  }

  test("q159 audit->fix: salting the flagged key leaves no single " +
      "hot partition — the hot key's tallest salt bucket is a real " +
      "split, bounded below by the pigeonhole floor") {
    val r = SparkEntry.queries("q159_skew_salt_relief")(spark, dir)
      .collect()
    assert(r.length == 1)
    val row = r.head
    val pre = row.getAs[Long]("pre_part_max")
    val post = row.getAs[Long]("post_part_max")
    val grp = row.getAs[Long]("post_group_max")
    val sf = row.getAs[Long]("salt_factor")
    // the fix must actually split the hot key: fewer rows in its
    // tallest post-salt bucket than its pre-salt single partition
    assert(post < pre, s"salting did not split the hot key: $row")
    // pigeonhole: sf buckets cannot do better than ceil(pre / sf)
    assert(post >= (pre + sf - 1) / sf, row.toString)
    // the flagged key's buckets are among the column's groups
    assert(grp >= post, row.toString)
    assert(row.getAs[Double]("relief") > 1.0, row.toString)
    // the audited column is the one q156 flags with the max factor
    val audit = SparkEntry.queries("q156_join_skew_report")(spark, dir)
      .collect()
    val flagged = audit.minBy(a =>
      (-a.getAs[Double]("skew_factor"), a.getAs[String]("col_name")))
    assert(row.getAs[String]("col_name") ==
      flagged.getAs[String]("col_name"))
  }

  test("q166/q167 split leakage -> repair: the repaired assignment " +
      "leaves ZERO near-dup candidate pairs crossing splits, and the " +
      "migration matrix conserves documents") {
    // rebuild the repair from PUBLIC gated outputs only (splits from
    // q92, clusters from q57, candidate pairs from q30) and check the
    // invariant q167 exists to establish
    val splits = SparkEntry.queries("q92_seeded_split")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    val comp = SparkEntry.queries("q57_dup_clusters")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component"))
      .toMap
    val edges = SparkEntry.queries("q30_lsh_candidates")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    // pre-repair: q166's totals match the independent recount
    val crossing = edges.count { case (a, b) => splits(a) != splits(b) }
    val q166Total = SparkEntry.queries("q166_split_leakage")(spark, dir)
      .collect().map(_.getAs[Long]("n_pairs")).sum
    assert(q166Total == crossing.toLong, s"$q166Total vs $crossing")
    // the repair rule: every member adopts the split of its cluster's
    // minimum-doc_id member
    val compSplit = comp.groupBy(_._2).map { case (c, ms) =>
      c -> splits(ms.keys.min)
    }
    def repaired(d: Long): String =
      comp.get(d).map(compSplit).getOrElse(splits(d))
    assert(edges.forall { case (a, b) => repaired(a) == repaired(b) },
      "a candidate pair still crosses splits after the repair")
    // q167's matrix: rows conserve documents and reproduce the rule
    val matrix = SparkEntry.queries("q167_split_repair")(spark, dir)
      .collect().map(r => (r.getAs[String]("old_split"),
        r.getAs[String]("new_split")) -> r.getAs[Long]("n_docs")).toMap
    assert(matrix.values.sum == splits.size.toLong)
    val expected = splits.toSeq
      .groupBy { case (d, s) => (s, repaired(d)) }
      .map { case (k, v) => k -> v.size.toLong }
    assert(matrix == expected, s"matrix diverged: $matrix vs $expected")
  }

  test("q151/q152 recall curves: bounded, truth anchors exact") {
    val mrl = SparkEntry.queries("q151_matryoshka_recall")(spark, dir)
      .collect().map(r => r.getAs[Int]("dim") -> r.getAs[Double]("recall_at_5"))
      .toMap
    assert(mrl.keySet == Set(8, 16, 32, 64))
    assert(mrl.values.forall(v => v >= 0 && v <= 1))
    // the full-dim "truncation" is the truth against itself
    assert(mrl(64) == 1.0)
    val ham = SparkEntry.queries("q152_binary_hamming")(spark, dir)
      .collect().map(r => r.getAs[String]("mode") -> r.getAs[Double]("recall_at_5"))
      .toMap
    assert(ham.keySet == Set("hamming_top5", "hamming20_rescored"))
    assert(ham.values.forall(v => v >= 0 && v <= 1))
  }

  test("q153 KS drift: statistic in [0,1], argmax length is in the " +
      "corpus support, and the gap is reproducible from raw counts") {
    val rows = SparkEntry.queries("q153_ks_drift")(spark, dir)
      .collect()
    val docs = Tables.documents(spark, dir)
      .selectExpr("source",
        "CAST(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS BIGINT) AS len")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val support = docs.map(_._2).toSet
    val n = docs.length.toDouble
    rows.foreach { r =>
      val ks = r.getAs[Double]("ks")
      assert(ks >= 0 && ks <= 1, r.toString)
      val at = r.getAs[Long]("at_len")
      assert(support.contains(at), s"argmax $at not in support")
      // independent recomputation of the gap at the reported length
      val src = r.getAs[String]("source")
      val ns = docs.count(_._1 == src).toDouble
      val fs = docs.count(d => d._1 == src && d._2 <= at) / ns
      val fc = docs.count(_._2 <= at) / n
      assert(math.abs(math.abs(fs - fc) - ks) < 1e-6,
        s"$src: reported $ks vs recomputed ${math.abs(fs - fc)}")
    }
  }

  test("q149 per-source drift: one row per source, degenerate groups " +
      "NULL out instead of fabricating a slope") {
    val df = SparkEntry.queries("q149_source_size_drift")(spark, dir).cache()
    assert(df.count() == Tables.documents(spark, dir)
      .select("source").distinct().count())
    // sf0.001 has 2-3 docs per source — fewer observations than
    // parameters means det == 0 exactly and the guard must emit NULL
    // (this corpus exercises it; the sf0.01 gate has 25 docs/source
    // and no NULLs)
    df.collect().foreach { r =>
      val n = r.getAs[Long]("n_docs")
      if (r.isNullAt(r.fieldIndex("b1"))) {
        assert(n <= 3, s"NULL fit with $n docs: $r")
        assert(r.isNullAt(r.fieldIndex("b1_delta")), r.toString)
      } else {
        val r2 = r.getAs[Double]("r2")
        assert(r2 > 0 && r2 <= 1, s"r2 out of range: $r")
      }
    }
  }

  test("q143 residual outliers: descending |resid|, consistent with " +
      "the q141 model") {
    val rows = SparkEntry.queries("q143_residual_outliers")(spark, dir)
      .collect()
    assert(rows.length == 20)
    val ares = rows.map(r => math.abs(r.getAs[Double]("resid")))
    assert(ares.sliding(2).forall(p => p(0) >= p(1) - 1e-9),
      "not sorted by |resid| desc")
    // resid must equal n_tok - pred (both are rounded from the same
    // unrounded doubles, so they can differ by at most one 1e-6 step)
    rows.foreach { r =>
      val d = r.getAs[Long]("n_tok") - r.getAs[Double]("pred") -
        r.getAs[Double]("resid")
      assert(math.abs(d) <= 2e-6, s"resid inconsistent: $r")
    }
  }

  test("CachedPlans.sinkName: unique per invocation, even same (prefix, dir)") {
    // two threads racing the same gated builder must not collide on
    // an active streaming query name (round-18 advice fix); the memo
    // still dedupes the RESULT, only the sink names stay disjoint
    val names = (1 to 100).map(_ => CachedPlans.sinkName("t_sink_", "/d"))
    assert(names.distinct.size == names.size)
    assert(names.forall(_.startsWith("t_sink_")))
  }
}
