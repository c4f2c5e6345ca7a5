package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.SqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled text primitives. The HOF formulations
  * (`transform(sequence(...), i => concat_ws(...))`,
  * `aggregate(split(text,""), ...)`) evaluate their lambdas INTERPRETED,
  * per element — measured ~7s just to build shingles for 6k docs at
  * sf0.1. These expressions do the same work in one compiled pass per
  * row, and generate direct static-helper calls inside whole-stage
  * codegen (no CodegenFallback boxing).
  */

/** Word k-gram shingles of a token array; optionally distinct (first
  * occurrence order — order is irrelevant downstream: Jaccard/minhash
  * consume shingles as a bag/set). */
case class WordShingles(child: Expression, k: Int, distinct: Boolean)
  extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles needs array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(a: Any): Any =
    TextExprs.shinglesOf(a.asInstanceOf[ArrayData], k, distinct)

  // true codegen via a static helper call — no CodegenFallback boxing /
  // InternalRow wrapping per row, whole-stage span stays intact
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"${TextExprs.RT}.shinglesOf($a, $k, $distinct)")

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** MinHash signature of a shingle array in ONE compiled pass: for each of
  * `numHashes` seeded hash functions h_i, the min over shingles of
  * h_i(shingle), where h_i(s) = xxhash64(i, s) — bit-identical to the
  * built-in `xxhash64(lit(i), sh)` chain, so signatures match the
  * explode+groupBy(min) formulation exactly. Replaces the explode of the
  * full shingle table + a (doc, 16 longs) shuffle with a shuffle-FREE
  * per-row computation: at 100 TB the signature stage becomes a map-only
  * pass and only the tiny banded output ever shuffles. Docs with no
  * shingles yield null (mirrors explode dropping them). */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression with Serializable {
  import org.apache.spark.sql.catalyst.expressions.XxHash64Function
  import org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // empty shingle arrays yield null even when the child cannot: the
  // inherited child.nullable would let NullPropagation elide downstream
  // isNotNull filters over a non-nullable child (e.g. coalesce(text, ''))
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  // per-hash seed: xxhash64's default seed folded over the int literal i,
  // exactly what XxHash64(Seq(lit(i), s)) computes before reaching s
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XxHash64Function.hash(i, IntegerType, 42L))

  override def nullSafeEval(a: Any): Any = {
    val shs = a.asInstanceOf[ArrayData]
    val n = shs.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = shs.getUTF8String(j)
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(s, StringType, seeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  // static-helper codegen; empty shingle arrays yield NULL, so emit the
  // null branch explicitly (defineCodeGen can't produce null results)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |if ($a.numElements() == 0) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = ${TextExprs.RT}.minhashOf($a, $numHashes);
      |}
    """.stripMargin)

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** Rolling polynomial fingerprint over unicode code points:
  * fold(acc·mult + cp) mod `modulus` — the portable fold DuckDB can
  * mirror via list_reduce, one compiled pass. Default (31, 1e9+7) is
  * the house fingerprint; the (mult, modulus) params exist so SimHash
  * can pack TWO independent folds into one 48-bit portable hash. */
case class RollingFingerprint(child: Expression,
    mult: Long = 31L, modulus: Long = 1000000007L)
  extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rolling_fingerprint needs string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(a: Any): Any =
    TextExprs.fingerprintOf(a.asInstanceOf[UTF8String], mult, modulus)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, a => s"${TextExprs.RT}.fingerprintOf($a, ${mult}L, ${modulus}L)")

  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(child = c)
}

/** The SimHash 48-bit token hash: two independent rolling folds in one
  * compiled pass (see [[TextExprs.fingerprint48Of]]). DuckDB mirrors it
  * as two list_reduce folds + shift/OR — same packed value. */
case class RollingFingerprint48(child: Expression)
  extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rolling_fingerprint48 needs string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint48"

  override def nullSafeEval(a: Any): Any =
    TextExprs.fingerprint48Of(a.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, a => s"${TextExprs.RT}.fingerprint48Of($a)")

  override protected def withNewChildInternal(c: Expression): RollingFingerprint48 =
    copy(child = c)
}

/** Fused SimHash: per-token rolling fingerprint (the packed two-fold
  * 48-bit form, or the single house fold) + the per-bit sign-vote
  * accumulation, in ONE compiled pass over the token array. The HOF
  * formulation this replaces (`transform(tokens, fp)` then `bits` ×
  * `aggregate(hs, ±1 vote fold)`) evaluated `bits`+1 interpreted array
  * passes per row — 49 for the production 48-bit fingerprint (r14).
  * Bit-identical by construction: same per-token helper, same vote
  * arithmetic; parity with the HOF form is spec-pinned. NULL token
  * arrays yield null — callers that relied on the HOF form's
  * null-folds-to-0 coalesce at the call site. */
case class SimhashBits(child: Expression, bits: Int, pack48: Boolean)
  extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_bits needs array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(a: Any): Any =
    TextExprs.simhashOf(a.asInstanceOf[ArrayData], bits, pack48)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, a => s"${TextExprs.RT}.simhashOf($a, $bits, $pack48)")

  override protected def withNewChildInternal(c: Expression): SimhashBits = copy(child = c)
}

/** Fused shingle fingerprints: first-occurrence-ordered DISTINCT rolling
  * fingerprints of the k-word shingles of a token array, one compiled
  * pass, no intermediate shingle strings (the fold runs over the tokens'
  * code points with the separator folded between — arithmetically
  * identical to fingerprinting the concat-ws form). Replaces
  * `array_distinct(transform(word_shingles(toks,k), rolling_fp))`, whose
  * transform evaluated interpreted per shingle and which allocated every
  * shingle string just to hash it (r14). Parity is spec-pinned. */
case class ShingleFingerprints(child: Expression, k: Int,
    mult: Long = 31L, modulus: Long = 1000000007L)
  extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_fingerprints needs array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_fingerprints"

  override def nullSafeEval(a: Any): Any =
    TextExprs.shingleFingerprintsOf(a.asInstanceOf[ArrayData], k, mult, modulus)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"${TextExprs.RT}.shingleFingerprintsOf($a, $k, ${mult}L, ${modulus}L)")

  override protected def withNewChildInternal(c: Expression): ShingleFingerprints =
    copy(child = c)
}

object TextExprs {

  /** Fully-qualified name of this object for generated-code call sites. */
  private[functions] val RT: String =
    TextExprs.getClass.getName.stripSuffix("$") + "$.MODULE$"

  private val shingleSep = UTF8String.fromString(" ")

  /** Runtime body of [[WordShingles]] — callable from generated code. */
  def shinglesOf(toks: ArrayData, k: Int, distinct: Boolean): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val buf = new Array[UTF8String](k)
    def shingleAt(i: Int): UTF8String = {
      var j = 0
      while (j < k) { buf(j) = toks.getUTF8String(i + j); j += 1 }
      UTF8String.concatWs(shingleSep,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(buf): _*)
    }
    if (distinct) {
      val out = new java.util.LinkedHashSet[UTF8String](n)
      var i = 0
      while (i <= n - k) { out.add(shingleAt(i)); i += 1 }
      val arr = new Array[Any](out.size)
      val it = out.iterator(); var x = 0
      while (it.hasNext) { arr(x) = it.next(); x += 1 }
      new GenericArrayData(arr)
    } else {
      val arr = new Array[Any](n - k + 1)
      var i = 0
      while (i <= n - k) { arr(i) = shingleAt(i); i += 1 }
      new GenericArrayData(arr)
    }
  }

  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seedsFor(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes, n =>
      Array.tabulate(n)(i =>
        org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(i, org.apache.spark.sql.types.IntegerType, 42L)))

  /** Runtime body of [[MinHashSig]] for NON-empty input — callable from
    * generated code (the null branch is emitted at the call site). */
  def minhashOf(shs: ArrayData, numHashes: Int): ArrayData = {
    val seeds = seedsFor(numHashes)
    val n = shs.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = shs.getUTF8String(j)
      var i = 0
      while (i < numHashes) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(s, org.apache.spark.sql.types.StringType, seeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Runtime body of [[RollingFingerprint]] — a fold over UNICODE CODE
    * POINTS (not UTF-8 bytes): the same fold is expressible in DuckDB as
    * `list_reduce(list_prepend(0, list_transform(string_split(t,''),
    * c -> unicode(c))), (a,b) -> (a*mult+b)%modulus)`, which makes the
    * fingerprint oracle-checkable cross-engine. Keep `modulus·mult +
    * 0x10FFFF` inside a signed long — the house (31, 1e9+7) and the
    * SimHash second fold (131, 999999937) both do. */
  def fingerprintOf(u: UTF8String): Long = fingerprintOf(u, 31L, 1000000007L)

  def fingerprintOf(u: UTF8String, mult: Long, modulus: Long): Long = {
    val s = u.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % modulus
      i += Character.charCount(cp)
    }
    acc
  }

  /** Runtime body of [[RollingFingerprint48]]: BOTH SimHash folds —
    * (31 mod 1e9+7) and (131 mod 999999937) — in ONE code-point pass,
    * packed as (f1 mod 2^24) << 24 | (f2 mod 2^24). Bit-identical to
    * composing two [[fingerprintOf]] calls; half the scans on the
    * map-side hot path. */
  def fingerprint48Of(u: UTF8String): Long = {
    val s = u.toString
    var a1 = 0L
    var a2 = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      a1 = (a1 * 31 + cp) % 1000000007L
      a2 = (a2 * 131 + cp) % 999999937L
      i += Character.charCount(cp)
    }
    ((a1 % 16777216L) << 24) | (a2 % 16777216L)
  }

  /** Runtime body of [[SimhashBits]] — callable from generated code.
    * Exactly the HOF formulation's arithmetic: per token h = fp48 (or
    * the house fold), vote(b) += (bit b of h set ? +1 : -1); bit b of
    * the result set iff vote(b) > 0. Empty arrays yield 0 (every vote
    * sum is 0, no bit wins), matching the aggregate-fold form. */
  def simhashOf(toks: ArrayData, bits: Int, pack48: Boolean): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](bits)
    var j = 0
    while (j < n) {
      val u = toks.getUTF8String(j)
      val h = if (pack48) fingerprint48Of(u) else fingerprintOf(u)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  /** Runtime body of [[ShingleFingerprints]] — callable from generated
    * code. The fold over shingle p..p+k-1 runs over the member tokens'
    * code points with the space separator (cp 32) folded between, which
    * is arithmetically identical to folding over the concat-ws shingle
    * string (code points of a concatenation = concatenation of code
    * points). Distinct-on-fingerprint in first-occurrence order equals
    * the string-distinct-then-fingerprint-then-array_distinct chain:
    * both keep each fingerprint value once, at its first position. */
  def shingleFingerprintsOf(toks: ArrayData, k: Int,
      mult: Long, modulus: Long): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val strs = new Array[String](n)
    var i = 0
    while (i < n) { strs(i) = toks.getUTF8String(i).toString; i += 1 }
    val out = new java.util.LinkedHashSet[Any](n - k + 1)
    var p = 0
    while (p <= n - k) {
      var acc = 0L
      var j = 0
      while (j < k) {
        if (j > 0) acc = (acc * mult + 32L) % modulus
        val s = strs(p + j)
        var ci = 0
        while (ci < s.length) {
          val cp = s.codePointAt(ci)
          acc = (acc * mult + cp) % modulus
          ci += Character.charCount(cp)
        }
        j += 1
      }
      out.add(acc)
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  def wordShingles(tokens: Column, k: Int, distinct: Boolean = true): Column =
    SqlShim.column(WordShingles(SqlShim.expression(tokens), k, distinct))

  def rollingFingerprint(text: Column): Column =
    SqlShim.column(RollingFingerprint(SqlShim.expression(text)))

  def rollingFingerprint(text: Column, mult: Long, modulus: Long): Column =
    SqlShim.column(RollingFingerprint(SqlShim.expression(text), mult, modulus))

  def rollingFingerprint48(text: Column): Column =
    SqlShim.column(RollingFingerprint48(SqlShim.expression(text)))

  def minhashSig(shingles: Column, numHashes: Int): Column =
    SqlShim.column(MinHashSig(SqlShim.expression(shingles), numHashes))

  def simhashBits(tokens: Column, bits: Int, pack48: Boolean): Column =
    SqlShim.column(SimhashBits(SqlShim.expression(tokens), bits, pack48))

  def shingleFingerprints(tokens: Column, k: Int): Column =
    SqlShim.column(ShingleFingerprints(SqlShim.expression(tokens), k))
}
