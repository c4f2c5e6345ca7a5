package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: given a grouped aggregate over the
  * OLD snapshot and a keyed changeset (SnapshotDiff.diffKeyed), produce
  * the aggregate of the NEW snapshot WITHOUT touching the new snapshot —
  * the incremental-view-maintenance counterpart of `diff_apply_merge`.
  *
  * Law (oracle-checked): `applyToAgg(agg(old), diff(old,new)) ≡ agg(new)`.
  *
  * At 100 TB this is the difference between re-aggregating the full fact
  * table and processing |changeset| rows: deltas are tiny, the base
  * aggregate is tiny, the join is broadcast-sized. Works for any
  * commutative-group aggregate (sum/count here; min/max need the scan).
  *
  * Group key = `segment`, measure = `acctbal` (string-domain snapshot
  * columns, like the reference's data model). Updates may MOVE a row
  * between groups (segment changes), so each update contributes
  * (-old contribution) to its old group and (+new) to its new group;
  * missing cells of partially-updated rows are reconstructed from the
  * old snapshot.
  */
object IncrementalAgg {

  private val dec = "decimal(18,2)"

  /** Grouped base aggregate: per segment, exact sum of acctbal + count. */
  def aggSnapshot(snapshot: DataFrame): DataFrame =
    snapshot.groupBy(col("segment"))
      .agg(sum(col("acctbal").cast(dec)).as("sum_bal"),
        count(lit(1)).as("n"))

  /** Grouped min/max base aggregate (the NON-invertible case). */
  def aggMinMax(snapshot: DataFrame): DataFrame =
    snapshot.groupBy(col("segment"))
      .agg(min(col("acctbal").cast(dec)).cast("double").as("min_bal"),
        max(col("acctbal").cast(dec)).cast("double").as("max_bal"),
        count(lit(1)).as("n"))

  /** Apply a changeset to a grouped aggregate. `old` is needed only to
    * reconstruct unchanged cells of partially-updated rows (joined on the
    * changed keys — a changeset-sized, not table-sized, join). */
  def applyToAgg(baseAgg: DataFrame, changes0: DataFrame, old: DataFrame): DataFrame = {
    // changeset shared across the four op branches via lazy checkpoint
    // (same rationale as applyToMinMax — one derivation of the diff
    // chain, not one per branch)
    val changes = changes0.localCheckpoint(eager = false)
    // whole-row JSON images ({"name":...,"acctbal":...,"segment":...}) —
    // decoded by field name, null-safely (see SnapshotDiff.rowImage)
    val imgSchema = org.apache.spark.sql.types.StructType(
      Seq("name", "acctbal", "segment").map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
    def imgCol(img: org.apache.spark.sql.Column, field: String) =
      from_json(img, imgSchema).getField(field)

    val inserts = changes.filter(col("op") === "insert").select(
      imgCol(col("new_val"), "segment").as("segment"),
      imgCol(col("new_val"), "acctbal").cast(dec).as("d_sum"),
      lit(1L).as("d_n"))
    val deletes = changes.filter(col("op") === "delete").select(
      imgCol(col("old_val"), "segment").as("segment"),
      (-imgCol(col("old_val"), "acctbal").cast(dec)).as("d_sum"),
      lit(-1L).as("d_n"))

    // updates: fold each key's changed cells into a patch, join the OLD
    // row for the unchanged cells, emit -old and +patched contributions
    val patches = changes.filter(col("op") === "update")
      .groupBy(col("slno"))
      .agg(map_from_entries(collect_list(struct(col("col"), col("new_val")))).as("patch"))
    val updated = old.join(patches, old("slno").cast("long") === patches("slno"))
      .select(
        old("segment").as("old_segment"),
        old("acctbal").as("old_acctbal"),
        when(map_contains_key(col("patch"), "segment"), element_at(col("patch"), "segment"))
          .otherwise(old("segment")).as("new_segment"),
        when(map_contains_key(col("patch"), "acctbal"), element_at(col("patch"), "acctbal"))
          .otherwise(old("acctbal")).as("new_acctbal"))
    val updMinus = updated.select(col("old_segment").as("segment"),
      (-col("old_acctbal").cast(dec)).as("d_sum"), lit(-1L).as("d_n"))
    val updPlus = updated.select(col("new_segment").as("segment"),
      col("new_acctbal").cast(dec).as("d_sum"), lit(1L).as("d_n"))

    val deltas = inserts.unionByName(deletes).unionByName(updMinus).unionByName(updPlus)
    baseAgg.select(col("segment"), col("sum_bal").as("d_sum"), col("n").as("d_n"))
      .unionByName(deltas)
      .groupBy(col("segment"))
      .agg(sum(col("d_sum")).as("sum_bal"), sum(col("d_n")).as("n"))
      .filter(col("n") > 0) // groups whose last row left disappear, like a re-agg
      .select(col("segment"), col("sum_bal").cast("double").as("sum_bal"), col("n"))
      .orderBy("segment")
  }

  /** Incremental maintenance of NON-invertible aggregates (min/max):
    * a delete of the row holding a group's minimum can't be subtracted
    * out — the group must be rescanned. IVM strategy: bound the rescan
    * to the AFFECTED groups (any group a change touches on its old or
    * new side); every untouched group's base row passes through
    * untouched. At 100 TB, with the table partitioned/clustered by the
    * group key, the rescan is a partition-pruned read of |affected
    * groups|, never a full pass; the affected-group list itself is
    * changeset-sized and broadcast.
    *
    * Law (oracle-checked): `applyToMinMax(aggMinMax(old), diff, old) ≡
    * aggMinMax(apply(old, diff))`. */
  def applyToMinMax(baseAgg: DataFrame, changes0: DataFrame, old: DataFrame): DataFrame = {
    // the changeset feeds FIVE branches (inserts, deletes, patches,
    // changed keys, and — through `updated` — both sides of the affected
    // set); lazily checkpointed so all of them share ONE derivation of
    // the diff chain instead of each replanning it (the r7 census showed
    // 34 exchanges on this key — 2x the next-highest — all of them
    // re-derived joins of the same old-vs-new diff)
    val changes = changes0.localCheckpoint(eager = false)
    val imgSchema = org.apache.spark.sql.types.StructType(
      Seq("name", "acctbal", "segment").map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
    def img(c: org.apache.spark.sql.Column, f: String) = from_json(c, imgSchema).getField(f)

    val inserts = changes.filter(col("op") === "insert")
      .select(img(col("new_val"), "segment").as("segment"),
        img(col("new_val"), "acctbal").as("acctbal"))
    val deletes = changes.filter(col("op") === "delete")
      .select(col("slno"), img(col("old_val"), "segment").as("segment"))
    val patches = changes.filter(col("op") === "update")
      .groupBy(col("slno"))
      .agg(map_from_entries(collect_list(struct(col("col"), col("new_val")))).as("patch"))
    // the patched-row frame feeds three consumers (both affected sides +
    // newRows) — shared for the same reason as the changeset above
    val updated = old.join(patches, old("slno").cast("long") === patches("slno"))
      .select(
        old("segment").as("old_segment"),
        when(map_contains_key(col("patch"), "segment"), element_at(col("patch"), "segment"))
          .otherwise(old("segment")).as("new_segment"),
        when(map_contains_key(col("patch"), "acctbal"), element_at(col("patch"), "acctbal"))
          .otherwise(old("acctbal")).as("new_acctbal"))
      .localCheckpoint(eager = false)

    // affected groups (changeset-sized), derived ONCE and shared by both
    // broadcast-join consumers below
    val affected = updated.select(col("old_segment").as("segment"))
      .unionByName(updated.select(col("new_segment").as("segment")))
      .unionByName(deletes.select(col("segment")))
      .unionByName(inserts.select(col("segment")))
      .distinct()
      .localCheckpoint(eager = false)

    // rows of the NEW snapshot that land in an affected group:
    //  - untouched old rows (not updated, not deleted) already there
    //  - updated rows whose new segment is affected (it is, by def)
    //  - inserted rows
    val changedKeys = changes.filter(col("op").isin("update", "delete"))
      .select(col("slno")).distinct()
    val untouched = old
      .join(changedKeys, old("slno").cast("long") === changedKeys("slno"), "left_anti")
      .join(broadcast(affected), Seq("segment"))
      .select(col("segment"), col("acctbal"))
    val newRows = untouched
      .unionByName(updated.select(col("new_segment").as("segment"), col("new_acctbal").as("acctbal")))
      .unionByName(inserts)

    val recomputed = newRows.groupBy(col("segment"))
      .agg(min(col("acctbal").cast(dec)).cast("double").as("min_bal"),
        max(col("acctbal").cast(dec)).cast("double").as("max_bal"),
        count(lit(1)).as("n"))

    baseAgg.join(broadcast(affected), Seq("segment"), "left_anti")
      .unionByName(recomputed)
      .orderBy("segment")
  }
}
