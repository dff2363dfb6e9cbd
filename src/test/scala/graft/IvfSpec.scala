package graft

import graft.operators.Ivf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN index over the real embeddings table: training converges
  * to sane cells, search recall vs brute force clears the bar, and
  * probing fewer cells scans fewer candidates.
  */
class IvfSpec extends AnyFunSuite with SharedSpark {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir).cache()

  test("training produces k centroids and a total assignment") {
    val cents = Ivf.train(spark, emb, k = 8, iters = 4)
    assert(cents.size == 8 && cents.forall(_.size == 64))
    val assigned = Ivf.assign(emb, cents, "embedding")
    assert(assigned.filter(col("cell").isNull).count() == 0)
    val cells = assigned.groupBy("cell").count().collect()
    assert(cells.length >= 4) // clusters actually used, not collapsed
    assert(assigned.count() == emb.count())
  }

  test("IVF search recall@5 vs brute force is high on clustered data") {
    val cents = Ivf.train(spark, emb, k = 8, iters = 4)
    val corpus = Ivf.assign(emb, cents, "embedding").cache()
    val queries = emb.filter(col("vec_id") < 10)

    val ivf = Ivf.search(spark, corpus, cents, queries, topK = 5, nProbe = 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet

    // brute force over the same cosine arithmetic
    val dot =
      "aggregate(zip_with(qv, cv, (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), CAST(0 AS DOUBLE), (s, x) -> s + x)"
    def norm(c: String) =
      s"sqrt(aggregate(transform($c, a -> CAST(a AS DOUBLE) * CAST(a AS DOUBLE)), CAST(0 AS DOUBLE), (s, x) -> s + x))"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
    val brute = emb.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cosine", expr(s"$dot / (${norm("qv")} * ${norm("cv")})"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet

    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall@5 = $recall")
  }

  test("full-probe search IS brute force, rank for rank (quantized-exact)") {
    // With nProbe = k every cell is probed, so the candidate set is
    // the whole corpus minus self — the IVF plan must then reproduce
    // the brute-force ranking EXACTLY, not approximately. Run on
    // integer-quantized vectors so every dot/norm is exact in float64
    // in any accumulation order: strict triple equality cannot flake.
    graft.functions.VecFunctions.register(spark)
    val corpusQ = emb.select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS DOUBLE))")
      .as("embedding"))
    val cents = Ivf.train(spark, corpusQ, k = 8, iters = 2)
    val corpus = Ivf.assign(corpusQ, cents, "embedding").cache()
    val queries = corpusQ.filter(col("vec_id") < 10)

    val ivf = Ivf.search(spark, corpus, cents, queries, topK = 5, nProbe = 8)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("c_id"))).toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(desc("cosine"), col("c_id"))
    val brute = corpusQ.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cosine", expr(
        "vec_dot_d(qv, cv) / (sqrt(vec_dot_d(qv, qv)) * sqrt(vec_dot_d(cv, cv)))"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("c_id"))).toSet

    assert(ivf == brute,
      s"full-probe IVF diverged from brute force: ${ivf diff brute} vs ${brute diff ivf}")
  }

  test("fewer probes scan fewer candidate rows") {
    val cents = Ivf.train(spark, emb, k = 8, iters = 4)
    val corpus = Ivf.assign(emb, cents, "embedding").cache()
    val queries = emb.filter(col("vec_id") < 10)
    def candidates(nProbe: Int): Long = {
      val probed = Ivf.search(spark, corpus, cents, queries,
        topK = 1000000, nProbe = nProbe) // effectively no top-k cut
      probed.count()
    }
    val c1 = candidates(1); val c3 = candidates(3)
    assert(c1 < c3, s"nProbe=1 scanned $c1 vs nProbe=3 $c3")
  }

  test("vec_* kernels reject dimension mismatch instead of truncating") {
    // a mixed-model embedding column must fail loudly, not return a
    // plausible-but-wrong similarity through oracle-free paths
    graft.functions.VecFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.selectExpr("vec_dot_d(a, b)").collect()
    }
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert(rootMsg(e).contains("dimension mismatch") ||
      e.getMessage.contains("dimension mismatch"))
    val li = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
    val e2 = intercept[Exception] {
      li.selectExpr("vec_l2_sq(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>))").collect()
    }
    assert(rootMsg(e2).contains("dimension mismatch") ||
      e2.getMessage.contains("dimension mismatch"))
    // equal dims still compute
    val ok = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .selectExpr("vec_dot_d(a, b)").head().getDouble(0)
    assert(ok == 11.0)
  }

  test("trainLattice is partitioning-invariant (bit-identical model)") {
    // The property the lattice variant exists for: with integer-valued
    // inputs, every distance and mean numerator is exact in float64
    // regardless of accumulation order, so the SAME model must come
    // out however the data is partitioned — the single-node stand-in
    // for "same model on any cluster topology / any retrain".
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = (0L until 300L).map { id =>
      val center = (id % 3).toInt * 1000
      (id, Array.tabulate(8)(d => (center + rnd.nextInt(100) + d).toDouble))
    }
    val df = data.toDF("vec_id", "embedding")
    val models = Seq(df.repartition(1), df.repartition(7),
      df.repartition(13, col("vec_id"))).map { layout =>
      Ivf.trainLattice(spark, layout, k = 3, iters = 3)
    }
    assert(models(0) == models(1) && models(1) == models(2),
      s"model diverged across partitionings:\n${models.mkString("\n")}")
    // and the model is on the integer lattice
    assert(models.head.flatten.forall(v => v == math.floor(v)))
  }

  test("superCluster / superClusterMedoid partition the model: every " +
      "cid appears exactly once, supercenters have the right shape") {
    val cents = Ivf.train(spark, emb, k = 16, iters = 2)
    Seq(Ivf.superCluster(cents, 4), Ivf.superClusterMedoid(cents, 4))
      .foreach { case (sup, members) =>
        assert(sup.size == 4 && sup.forall(_.size == 64))
        assert(members.flatten.sorted == (0 until 16),
          "member lists must partition 0..k-1")
      }
    // medoid form: supercenters ARE the stride picks from the model
    val (supM, _) = Ivf.superClusterMedoid(cents, 4)
    assert(supM == Seq(cents(0), cents(4), cents(8), cents(12)))
  }

  test("assignHierarchical with probeSuper = g IS flat assignment " +
      "(every super probed -> candidate set is the whole model), and " +
      "probe-2 routing agrees with flat on strongly clustered data") {
    import spark.implicits._
    graft.functions.VecFunctions.register(spark)
    // 9 tight integer clusters, far apart: hierarchy routing is
    // unambiguous, so two-level must agree with flat everywhere
    val rnd = new scala.util.Random(11)
    val data = (0L until 540L).map { id =>
      val c = (id % 9).toInt
      (id, Array.tabulate(8)(d =>
        ((c % 3) * 10000 + (c / 3) * 7000 * (if (d % 2 == 0) 1 else -1)
          + rnd.nextInt(50)).toDouble))
    }
    val df = data.toDF("vec_id", "embedding")
    val cents = Ivf.trainLattice(spark, df, k = 9, iters = 3)
    val flat = Ivf.assign(df, cents, "embedding")
      .select(col("vec_id"), col("cell").as("cf"))
    // full probe == flat, exactly, for BOTH hierarchy strategies
    Seq(None, Some(Ivf.superClusterMedoid(cents, 3))).foreach { m =>
      val full = Ivf.assignHierarchical(df, cents, "embedding",
        probeSuper = 3, model = m)
        .select(col("vec_id"), col("cell").as("ch"))
      assert(flat.join(full, "vec_id")
        .filter(col("cf") =!= col("ch")).count() == 0,
        s"full-probe two-level diverged from flat (model=$m)")
    }
    // probe-2 on well-separated clusters: exact agreement
    val h2 = Ivf.assignHierarchical(df, cents, "embedding", probeSuper = 2)
      .select(col("vec_id"), col("cell").as("ch"))
    assert(flat.join(h2, "vec_id")
      .filter(col("cf") =!= col("ch")).count() == 0,
      "probe-2 routing missed on separated clusters")
  }
}
