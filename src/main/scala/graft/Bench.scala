package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up by executing the ENTIRE suite once untimed: a cold JVM
    // pays codegen compilation + JIT per distinct query shape, which
    // measured 2.5x on a cold run vs 1.09x warm (VERDICT r1). Timing
    // later passes measures the queries, not the compiler.
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench-warmup] $name failed: $e")
      }
    }
    // Time `passes` full passes and report the per-query MINIMUM: the
    // VM sees host-level CPU steal (observed: the same warm binary at
    // 31 s and 228 s minutes apart), and the minimum of repeated
    // measurements estimates the true cost where a single sample
    // measures the noise. Both pass totals are recorded alongside.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timedPass(): Seq[(String, Double)] = names.map { name =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case e: Throwable =>
        errors(name) = e.toString.takeWhile(_ != '\n').take(200)
        System.err.println(s"[bench] QUERY FAILED $name: $e")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val allPasses = (1 to math.max(passes, 1)).map(_ => timedPass())
    val results = names.map { n =>
      n -> allPasses.map(_.toMap.apply(n)).min
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // The driver records only a fixed-size tail of the sbt output, so
    // the summary line must stay SHORT: per-query keys are shortened
    // to their unique `qNN` prefix and values rounded to ms. The full
    // names + full precision + per-pass timings go to a sidecar file.
    val prefixCounts = names.groupBy(_.takeWhile(_ != '_'))
      .view.mapValues(_.size).toMap
    // collision guard: if two queries ever share a qNN prefix, keep
    // their full names — duplicate JSON keys would silently drop one
    // timing (parsers keep last-wins)
    def short(n: String) = {
      val p = n.takeWhile(_ != '_')
      if (p.matches("q\\d+") && prefixCounts(p) == 1) p else n
    }
    val qs = results.map { case (k, v) => s"${jstr(short(k))}:${f3(v)}" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(short(k))}:${jstr(v.take(60))}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val passTotals = allPasses.map(p => f3(p.map(_._2).sum)).mkString("[", ",", "]")
    val detailPath = "BENCH_DETAIL.json"
    val detail = {
      val dq = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
      val passes = allPasses.map(p =>
        p.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}"))
        .mkString("[", ",", "]")
      val de = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$dq,"passes":$passes,"errors":$de,"n_failed":${errors.size},"sf":${jstr(sfDir)}}"""
    }
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      detail.getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"pass_totals":$passTotals,"errors":$errJson,"n_failed":${errors.size},"detail":${jstr(detailPath)},"sf":"$sfDir"}""")
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
