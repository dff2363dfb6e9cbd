package graft

import graft.functions.Raster.Chip
import graft.sources.{Download, RasterIO}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

/** S5 binary scan, S6 download control logic, S7/S8 sinks. */
class RasterIOSpec extends AnyFunSuite with SharedSpark {

  test("S5: binaryFile scan parses band/resolution/tile from names") {
    val dir = Files.createTempDirectory("graft-jp2")
    Seq("T31TCJ_20230615T104621_B02_10m.jp2",
      "T31TCJ_20230615T104621_B08_10m.jp2",
      "T31TCJ_20230615T104621_B02_20m.jp2").foreach { n =>
      Files.write(dir.resolve(n), Array[Byte](1, 2, 3))
    }
    val df = RasterIO.readBandFiles(spark, dir.toString)
    val rows = df.select("band", "resolution_m", "tile")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(rows == Seq(("B02", 10, "31TCJ"), ("B02", 20, "31TCJ"),
      ("B08", 10, "31TCJ")))
  }

  test("S7/S8: chips land in the feature store as <uuid>.tif") {
    implicit val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("graft-store").toString
    val chip = Chip(2, 1, 0, 0, 2, 1, 0.0, Array(1.5, 2.5))
    RasterIO.writeChips(Seq(("u-1", chip), ("u-2", chip)).toDS(), out)
    val files = new java.io.File(out).list().sorted.toSeq
    assert(files == Seq("u-1.tif", "u-2.tif"))
    val back = RasterIO.decodeRaw(Files.readAllBytes(Paths.get(out, "u-1.tif")))
    assert(back == chip.copy(px = back.px) && back.px.toSeq == Seq(1.5, 2.5))
  }

  test("S6: token clock mints once, refreshes only after ttl") {
    var clock = 0L
    val mints = new AtomicInteger(0)
    val tc = new Download.TokenClock(
      mint = () => s"tok${mints.incrementAndGet()}",
      ttlSeconds = 600, now = () => clock)
    assert(tc.get() == "tok1")
    clock = 599; assert(tc.get() == "tok1") // still fresh
    clock = 600; assert(tc.get() == "tok2") // refreshed at ttl
    clock = 700; assert(tc.get() == "tok2")
  }

  test("S6: redirect loop follows 30x chains and bounds hops") {
    val bytes = Array[Byte](42)
    val got = Download.followRedirects("u0", {
      case "u0" => Left("u1"); case "u1" => Left("u2")
      case "u2" => Right(bytes)
    })
    assert(got.toSeq == bytes.toSeq)
    assertThrows[IllegalStateException] {
      Download.followRedirects("a", _ => Left("a"), maxHops = 3)
    }
  }

  test("S6: partition fetch caps concurrency at the quota and skips failures") {
    val inFlight = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val urls = (1 to 20).map(i => s"u$i")
    val got = Download.fetchPartition(urls, { u =>
      val cur = inFlight.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, cur))
      Thread.sleep(5)
      inFlight.decrementAndGet()
      if (u == "u7") throw new RuntimeException("boom")
      u.getBytes
    }, maxConcurrent = 4)
    assert(maxSeen.get() <= 4)
    assert(got.size == 19) // u7 skipped, logged
    assert(got.toMap.keySet == urls.toSet - "u7")
  }
}
