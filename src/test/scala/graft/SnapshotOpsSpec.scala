package graft

import graft.operators.SnapshotOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCD-1 upsert/diff semantics, including the NULL-replace case the
  * oracle queries (q66/q67, NULL-free data) cannot exercise.
  */
class SnapshotOpsSpec extends AnyFunSuite with SharedSpark {

  test("upsert: matched update replaces the whole row — NULLs win too") {
    import spark.implicits._
    val base = Seq((1L, Some("a"), Some(10)), (2L, Some("b"), Some(20)),
      (3L, Some("c"), Some(30))).toDF("id", "name", "v")
    // id=2's update legitimately clears `name` to NULL: SCD-1 replace
    // semantics require the NULL to REPLACE "b", not be coalesced away
    val updates = Seq((2L, None: Option[String], Some(21)),
      (4L, Some("d"), Some(40))).toDF("id", "name", "v")
    val out = SnapshotOps.upsert(base, updates, "id")
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val row2 = out(1)
    assert(row2.isNullAt(row2.fieldIndex("name")), row2.toString)
    assert(row2.getInt(row2.fieldIndex("v")) == 21)
    assert(out.map(r => r.getString(r.fieldIndex("src"))).toSeq ==
      Seq("carried", "updated", "carried", "inserted"))
  }

  test("diff classifies added/deleted/updated/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "fp1"), (2L, "fp2"), (3L, "fp3")).toDF("id", "fp")
    val neu = Seq((2L, "fp2"), (3L, "fp3x"), (4L, "fp4")).toDF("id", "fp")
    val got = SnapshotOps.diff(old, neu, "id", "fp")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "deleted"), (2L, "unchanged"),
      (3L, "updated"), (4L, "added")))
  }

  test("diff carries key-stable attributes through the join " +
      "(coalesce(new, old) — present on whichever side has the key)") {
    import spark.implicits._
    val old = Seq((1L, "fp1", "en"), (2L, "fp2", "de"), (3L, "fp3", "fr"))
      .toDF("id", "fp", "lang")
    val neu = Seq((2L, "fp2", "de"), (3L, "fp3x", "fr"), (4L, "fp4", "zh"))
      .toDF("id", "fp", "lang")
    val got = SnapshotOps.diff(old, neu, "id", "fp", carry = Seq("lang"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((1L, "deleted", "en"), (2L, "unchanged", "de"),
      (3L, "updated", "fr"), (4L, "added", "zh")))
  }
}
