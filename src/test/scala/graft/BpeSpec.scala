package graft

import org.apache.spark.sql.functions._
import graft.llm.Bpe

/** Gates for the oracle-exempt BPE tokenizer: hand-derived merge
  * fixtures, an independent pair-scan reference for training, encode
  * laws (priority, overlap, multibyte), and the count invariants on the
  * real corpus.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def documents = Tables.documents(spark, sfDir)

  test("trainMerges: hand-derived fixture — counts, tie-break, and early stop") {
    // "ab" ×3, "abc" ×2: pairs (a,b)=5, (b,c)=2 → merge 1 = (a,b,5).
    // Then (ab,c)=2 → merge 2. Then no pair occurs twice → stop, even
    // with the budget unspent.
    val m = Bpe.trainMerges(Seq("ab" -> 3L, "abc" -> 2L), nMerges = 10)
    assert(m === Seq(("a", "b", 5L), ("ab", "c", 2L)))
    // tie on count breaks to the lexicographically smallest pair:
    // "xy" ×2 vs "ab" ×2 → (a,b) first
    val t = Bpe.trainMerges(Seq("xy" -> 2L, "ab" -> 2L), nMerges = 1)
    assert(t === Seq(("a", "b", 2L)))
    // overlap counting: "aaa" ×2 holds (a,a) twice per word → count 4
    val o = Bpe.trainMerges(Seq("aaa" -> 2L), nMerges = 1)
    assert(o === Seq(("a", "a", 4L)))
  }

  test("trainMerges matches an independent sliding-window reference on the corpus dict") {
    val dict = documents.select(explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(200)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = Bpe.trainMerges(dict, nMerges = 15)
    // reference: re-derive each round's winner by scanning SYMBOL
    // STRINGS with a separator character instead of symbol arrays —
    // a structurally different implementation of the same law
    var rows: Seq[(Vector[String], Long)] =
      dict.map { case (w, c) => (w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp))), c) }
    got.foreach { case (l, r, c) =>
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      rows.foreach { case (syms, wc) =>
        syms.sliding(2).foreach {
          case Seq(x, y) => counts.update((x, y), counts.getOrElse((x, y), 0L) + wc)
          case _ =>
        }
      }
      val ((bl, br), bc) = counts.minBy { case ((x, y), n) => (-n, x, y) }
      assert((bl, br, bc) === (l, r, c))
      rows = rows.map { case (syms, wc) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) { out += l + r; i += 2 }
          else { out += syms(i); i += 1 }
        }
        (out.toVector, wc)
      }
    }
    assert(got.size === 15, s"corpus dict must support 15 merges, got ${got.size}")
  }

  test("encode laws: priority, left-to-right overlap, multibyte, cache-safety") {
    import graft.functions.BpeExprs
    def enc(word: String, merges: Seq[(String, String)]): Seq[String] =
      BpeExprs.encodeWord(word, BpeExprs.rankMap(merges)).map(_.toString).toSeq
    // lowest-rank pair merges FIRST even when a later-rank pair appears
    // earlier in the word: rank 0 = (b,c), rank 1 = (a,b)
    assert(enc("abc", Seq(("b", "c"), ("a", "b"))) === Seq("a", "bc"))
    // chained merges compose: (a,b) then (ab,c) consumes the word
    assert(enc("abc", Seq(("a", "b"), ("ab", "c"))) === Seq("abc"))
    // overlap resolves left-to-right non-overlapping: aaa → aa|a
    assert(enc("aaa", Seq(("a", "a"))) === Seq("aa", "a"))
    // astral code point (🎉 U+1F389, a surrogate pair) never splits
    assert(enc("a🎉", Nil) === Seq("a", "🎉"))
    assert(enc("a🎉", Seq(("a", "🎉"))) === Seq("a🎉"))
    // the thread-local memo must be keyed by MODEL: same word, second
    // model, different answer
    assert(enc("ab", Seq(("a", "b"))) === Seq("ab"))
    assert(enc("ab", Nil) === Seq("a", "b"))
  }

  test("text_bpe_train and text_bpe_encode: deterministic, invariant-clean on the corpus") {
    val m1 = Bpe.bpeTrain(documents).collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val m2 = Bpe.bpeTrain(documents).collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m1.nonEmpty && m1 === m2)
    assert(m1.map(_._1).toSeq === m1.indices.map(_.toLong), "ranks must be dense")
    // pair counts never increase with rank-0 being the global max
    assert(m1.head._4 === m1.map(_._4).max)

    val enc = Bpe.bpeEncode(documents).collect()
    val chars = documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    assert(enc.length === chars.size)
    enc.foreach { r =>
      val (id, nWords, nBpe) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val nonEmptyWords = chars(id).split(" ", -1).count(_.nonEmpty)
      // every non-empty word emits ≥1 symbol; merging can only shrink
      assert(nBpe >= nonEmptyWords, s"doc $id: $nBpe < $nonEmptyWords")
      val totalCps = chars(id).split(" ", -1).filter(_.nonEmpty)
        .map(w => w.codePointCount(0, w.length)).sum
      assert(nBpe <= totalCps, s"doc $id: $nBpe > $totalCps code points")
      // compression must actually happen somewhere on a Zipfian corpus
    }
    val ratio = enc.map(_.getLong(2)).sum.toDouble /
      chars.values.map(t => t.split(" ", -1).filter(_.nonEmpty).map(w => w.codePointCount(0, w.length)).sum).sum
    assert(ratio < 0.9, s"40 merges must compress the corpus below 0.9 of code points, got $ratio")
  }

  test("persisted bpe model epoch: bit-identical encode, stored model, epoch reuse") {
    // same params → identical output: the persisted path is a pure
    // serving-layer change (train once, read the model table, encode)
    val live = Bpe.bpeEncode(documents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val persisted = Bpe.bpeEncodePersisted(spark, documents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(live === persisted, "persisted BPE encode diverged from in-session")
    // the stored model IS bpeTrain's frame, row for row
    val name = Bpe.ensureBpeModel(spark, documents)
    val stored = spark.table(name).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val trained = Bpe.bpeTrain(documents).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(stored === trained, "stored merge table diverged from bpeTrain")
    // epoch reuse: second resolve neither retrains nor rewrites
    assert(name === Bpe.ensureBpeModel(spark, documents))
    // the encode job itself plans no aggregate — training work lives
    // entirely behind the epoch artifact, the encode pass is map-side.
    // PlanWalk, not a plain collect: under AQE executedPlan is an
    // AdaptiveSparkPlanExec LEAF and collect would see nothing (review
    // finding r7 — the assertion was vacuously green)
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    val enc = Bpe.bpeEncodePersisted(spark, documents)
    enc.collect()
    val nAgg = PlanWalk.allNodes(enc.queryExecution.executedPlan).collect {
      case a: HashAggregateExec => a
      case a: ObjectHashAggregateExec => a
      case a: SortAggregateExec => a
    }.size
    assert(nAgg === 0, s"persisted BPE encode planned $nAgg aggregates:\n" +
      enc.queryExecution.executedPlan)
  }

  test("bpe fertility: reconciles with the persisted encode's own counts per language") {
    val fert = Bpe.bpeFertility(spark, documents).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    // recompute from the persisted encode output joined back to lang
    val enc = Bpe.bpeEncodePersisted(spark, documents)
      .join(documents.select(col("doc_id"), col("lang")), "doc_id")
      .collect().map(r => (r.getString(4), r.getLong(1), r.getLong(2)))
    val byLang = enc.groupBy(_._1).map { case (l, rs) =>
      l -> (rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).sum)
    }
    assert(fert.keySet === byLang.keySet)
    byLang.foreach { case (l, (n, words, bpe)) =>
      val (fn, fw, fb, fy) = fert(l)
      assert((fn, fw, fb) === ((n, words, bpe)), s"$l counts diverged")
      assert(fy === math.floor(bpe.toDouble / words * 1e4 + 0.5) / 1e4, s"$l fertility")
      // a 40-merge model trained on the full mixed dict must compress
      // SOMETHING: fertility strictly below 1 token per code point is
      // trivially true; the meaningful bound is ≤ 1 token per word only
      // after merges fire, so just pin positivity + finiteness here
      assert(fy > 0.0 && !fy.isNaN && !fy.isInfinite)
    }
    // cross-language signal: fertilities are not all identical (the
    // merge table is trained on the mixed dict, so languages with more
    // dict presence compress better — an all-equal answer would mean
    // the lang join or the rollup lost its key)
    assert(fert.values.map(_._4).toSet.size > 1)
  }

  test("bpe survives hostile input: null, empty, whitespace-only docs") {
    val hostile = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, "   "),
      (4L, "aa aa aa")).toDF("doc_id", "text")
    val m = Bpe.bpeTrain(hostile).collect()
    assert(m.map(r => (r.getString(1), r.getString(2))).toSeq === Seq(("a", "a")))
    val e = Bpe.bpeEncode(hostile).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // null/empty/whitespace docs emit 0 BPE tokens; "aa aa aa" merges
    // each word to ONE symbol
    assert(e(1L)._2 === 0L, e(1L))
    assert(e(2L)._2 === 0L)
    assert(e(3L)._2 === 0L)
    assert(e(4L) === ((3L, 3L, "aa|aa|aa")))
  }
}
