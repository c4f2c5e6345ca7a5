package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Literal Scala port of the reference's `compare_data`
  * (syncquill.py:109-129) — the property-test oracle for positional-diff
  * parity (SURVEY §5.3). */
object DiffLaws {

  /** Whole-row image in the engine's JSON encoding (SnapshotDiff.rowImage).
    * The reference keeps the raw Python list in its change dicts
    * (syncquill.py:119,123) — the serialization is our engine's choice,
    * so the port mirrors the engine's null-safe JSON form. */
  def jsonImage(cols: Seq[String], row: Seq[String]): String =
    cols.zip(row).map { case (c, v) =>
      val ev = if (v == null) "null"
        else "\"" + v.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
          case ch => ch.toString
        } + "\""
      "\"" + c + "\":" + ev
    }.mkString("{", ",", "}")

  def compareDataRef(list1: Seq[Seq[String]], list2: Seq[Seq[String]],
                     cols: Seq[String]): Seq[(String, String, String, String, String)] = {
    val changes = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String, String)]
    val (len1, len2) = (list1.length, list2.length)
    if (len1 > len2)
      list1.drop(len2).foreach(r => changes += (("del_row", r.head, "", jsonImage(cols, r), null)))
    else if (len2 > len1)
      list2.drop(len1).foreach(r => changes += (("extra_row", r.head, "", null, jsonImage(cols, r))))
    for (i <- 0 until math.min(len1, len2); j <- 0 until math.min(list1(i).length, list2(i).length))
      if (list1(i)(j) != list2(i)(j))
        changes += (("diff", list1(i).head, cols(j), list1(i)(j), list2(i)(j)))
    changes.toSeq
  }

  /** (slno, va, vb) rows → string-domain snapshot DataFrame. */
  def toSnapshot(spark: SparkSession, rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("slno", "va", "vb")
      .select($"slno", $"va".cast("string").as("va"), $"vb".cast("string").as("vb"))
  }
}
