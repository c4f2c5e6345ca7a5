package graft

import org.apache.spark.sql.functions._
import graft.sync.{SnapshotDiff, Snapshots}

/** Diff/merge algebra (SURVEY §5.3): identity, round-trip, and positional
  * parity against a literal Scala port of the reference's `compare_data`
  * (syncquill.py:109-129) used as a property-test oracle.
  */
class SnapshotDiffSpec extends SparkSpec {

  private def customer = Tables.customer(spark, sfDir)

  test("diff(a, a) is empty") {
    val a = Snapshots.oldSnapshot(customer)
    assert(SnapshotDiff.diffKeyed(a, a, "slno").count() === 0)
  }

  test("round-trip law: apply(old, diff(old, new)) == new") {
    val old = Snapshots.oldSnapshot(customer)
    val neu = Snapshots.newSnapshot(customer)
    val applied = SnapshotDiff.applyChangeset(old, SnapshotDiff.diffKeyed(old, neu, "slno"), "slno")
    assert(applied.exceptAll(neu).count() === 0)
    assert(neu.exceptAll(applied).count() === 0)
  }

  /** Literal port of compare_data (syncquill.py:109-129) as the oracle. */
  private def compareDataRef(list1: Seq[Seq[String]], list2: Seq[Seq[String]],
                             cols: Seq[String]): Seq[(String, String, String, String, String)] = {
    val changes = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String, String)]
    val (len1, len2) = (list1.length, list2.length)
    if (len1 > len2)
      list1.drop(len2).foreach(r => changes += (("del_row", r.head, "", r.mkString("|"), null)))
    else if (len2 > len1)
      list2.drop(len1).foreach(r => changes += (("extra_row", r.head, "", null, r.mkString("|"))))
    for (i <- 0 until math.min(len1, len2); j <- 0 until math.min(list1(i).length, list2(i).length))
      if (list1(i)(j) != list2(i)(j))
        changes += (("diff", list1(i).head, cols(j), list1(i)(j), list2(i)(j)))
    changes.toSeq
  }

  test("diffPositional matches the literal compare_data port") {
    val bq = Snapshots.bqSnapshot(customer)
    val sheet = Snapshots.sheetSnapshot(customer)
    val cols = bq.columns.toSeq

    def toLists(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
      df.orderBy(col("slno").cast("long")).collect()
        .map(r => cols.indices.map(i => String.valueOf(r.get(i)))).toSeq

    val expected = compareDataRef(toLists(bq), toLists(sheet), cols)
      .map { case (op, slno, c, o, n) => (op, slno.toLong, c, Option(o), Option(n)) }
      .toSet

    val actual = SnapshotDiff.diffPositional(bq, sheet, "slno").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3),
        Option(r.getString(4)), Option(r.getString(5))))
      .toSet

    assert(actual === expected)
  }

  test("keyed diff classifies inserts/deletes/updates correctly") {
    val old = Snapshots.oldSnapshot(customer)
    val neu = Snapshots.newSnapshot(customer)
    val d = SnapshotDiff.diffKeyed(old, neu, "slno").cache()
    val byOp = d.groupBy("op").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // inserts = keys ≡49 (mod 50) minus those also ≡0 (mod 43); deletes = ≡0 (mod 43) ∩ old
    val oldKeys = old.select("slno").collect().map(_.getLong(0)).toSet
    val newKeys = neu.select("slno").collect().map(_.getLong(0)).toSet
    assert(byOp.getOrElse("insert", 0L) === (newKeys -- oldKeys).size.toLong)
    assert(byOp.getOrElse("delete", 0L) === (oldKeys -- newKeys).size.toLong)
    assert(byOp.getOrElse("update", 0L) > 0)
    d.unpersist()
  }
}
