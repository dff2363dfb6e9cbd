package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot maintenance for an append-only lake without a table
  * format: keyed UPSERT (SCD-1 merge) and snapshot DIFF — the two
  * primitives behind incremental corpus refreshes ("this week's crawl
  * updates/extends last week's corpus"; the reference's analog is the
  * date-windowed re-poll that re-returns known products,
  * `/root/reference/code/imagery_store.py:184`).
  *
  * Scale design: both are ONE full-outer equi-join on the key — the
  * minimal shuffle for reconciling two keyed datasets; no windows, no
  * skew (keys are unique per side). On a real lake the snapshots are
  * bucketed by the key, making the join exchange-free (BucketingSpec
  * proves the co-located pattern).
  */
object SnapshotOps {

  /** SCD-1 upsert: rows of `updates` replace same-key rows of `base`;
    * unmatched update rows are inserts. Column sets must match.
    * Output columns: key, then base's non-key columns (values
    * update-wins), plus `src` ∈ {inserted, updated, carried}.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = base.columns.filterNot(_ == key).toSeq
    val b = base.as("b"); val u = updates.as("u")
    // Row-wise replace keyed on the update's KEY presence, not
    // per-column coalesce: a matched update that legitimately sets a
    // column to NULL must win over the stale base value (SCD-1
    // replace semantics).
    val picked = cols.map(c =>
      when(col(s"u.$key").isNotNull, col(s"u.$c"))
        .otherwise(col(s"b.$c")).as(c))
    val src = when(col(s"b.$key").isNull, lit("inserted"))
      .when(col(s"u.$key").isNotNull, lit("updated"))
      .otherwise(lit("carried")).as("src")
    b.join(u, col(s"b.$key") === col(s"u.$key"), "full_outer")
      .select(coalesce(col(s"u.$key"), col(s"b.$key")).as(key) +:
        (picked :+ src): _*)
  }

  /** Change classification between two snapshots by key, using
    * `fpCol` as the content fingerprint: added / deleted / updated /
    * unchanged.
    *
    * `carry` names attribute columns present on BOTH sides to ride
    * through the diff as `coalesce(new, old)` — for key-stable
    * attributes (a document's language, a product's tile) this is
    * exactly what a separate dimension join on the key would attach,
    * minus the second corpus-sized join (round 22, guide §2.4: the
    * diff already co-locates both sides' attributes on the key).
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      fpCol: String, carry: Seq[String] = Nil): DataFrame = {
    val o = oldSnap.as("o"); val n = newSnap.as("n")
    o.join(n, col(s"o.$key") === col(s"n.$key"), "full_outer")
      .select(
        coalesce(col(s"n.$key"), col(s"o.$key")).as(key) +:
        when(col(s"o.$key").isNull, lit("added"))
          .when(col(s"n.$key").isNull, lit("deleted"))
          .when(col(s"o.$fpCol") =!= col(s"n.$fpCol"), lit("updated"))
          .otherwise(lit("unchanged")).as("change") +:
        carry.map(c => coalesce(col(s"n.$c"), col(s"o.$c")).as(c)): _*)
  }
}
