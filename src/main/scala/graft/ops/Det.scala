package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for cross-engine (Spark vs DuckDB oracle) and
  * cross-run (shuffle-order) reproducibility of floating-point aggregates.
  *
  * A `sum(double)` depends on partial-aggregation order, which varies with
  * task scheduling — the same query can hash differently run to run, let
  * alone engine to engine. Casting each input to a fixed-scale DECIMAL
  * first makes the sum exact and associative, hence order-independent; the
  * final cast back to double is then a single deterministic conversion that
  * both engines perform identically on the same exact decimal.
  */
object Det {

  /** Order-independent sum of a double column: exact decimal accumulation,
    * emitted as double. Mirror in SQL:
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
    *
    * MAGNITUDE BOUND (r12): the final fractional-decimal→double cast is
    * double-rounded by DuckDB (double(unscaled) / 10^scale) once the
    * UNSCALED sum — value × 10^scale — passes 2^53 ≈ 9.0e15, where the
    * JVM's BigDecimal path rounds once; the two can then differ by 1 ULP
    * and every downstream digit diverges. Keep dsum for sums bounded by
    * value < 9.0e15 / 10^scale per group; past that use [[dsumExact]]. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Like [[dsum]] for an ALREADY-exact decimal expression, single-rounded
    * at ANY magnitude (r12): the summand is multiplied up to a scale-0
    * integer before summing — integer→double is correctly rounded on both
    * engines at every width (verified through the 2^53+1 tie and hugeint
    * range) — and the one final division by the exact power of ten is the
    * identical IEEE op on both sides. Mirror in SQL:
    * `CAST(SUM(CAST(x * 10^s AS DECIMAL(26,0))) AS DOUBLE) / 10^s.0`. */
  def dsumExact(c: Column, scale: Int): Column = {
    // math.pow is exact only while 10^scale fits a double's 53-bit
    // mantissa; past 15 the Long factor would silently drift and every
    // summand would scale wrongly — fail loudly instead.
    require(scale >= 0 && scale <= 15, s"dsumExact scale must be in [0,15], got $scale")
    val f = math.pow(10, scale) // exact powers of ten up to 1e15
    sum((c * lit(f.toLong)).cast("decimal(26,0)")).cast("double") / lit(f)
  }

  /** Order-independent mean: exact decimal sum divided by count, both sides
    * double/bigint division — identical IEEE result in Spark and DuckDB.
    * Mirror: `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** Binary-deterministic rounding: floor(x·10^s + 0.5)/10^s in pure
    * IEEE double ops, identical on any engine. Spark's `round()` decides
    * ties from the double's SHORTEST DECIMAL representation while DuckDB
    * rounds the binary value — exact-rational inputs (ratios of small
    * integers) hit x.xxxx5 representations and the two disagree. Use for
    * any rounded value built from integer ratios. Mirror SQL:
    * `floor(x*1e4 + 0.5)/1e4`. */
  def rfloor(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + lit(0.5)) / f
  }

  /** TPC-H price inputs lifted to exact decimals so products like
    * `price * (1 - discount) * (1 + tax)` are computed in decimal
    * arithmetic, never rounded from a double — a double→decimal cast of
    * the product rounds per-row and the two engines can disagree on ties.
    * Mirror: `CAST(x AS DECIMAL(12,2))` / `CAST(x AS DECIMAL(3,2))`. */
  def price(c: Column): Column = c.cast("decimal(12,2)")
  def oneMinus(c: Column): Column = lit(1).cast("decimal(3,2)") - c.cast("decimal(3,2)")
  def onePlus(c: Column): Column = lit(1).cast("decimal(3,2)") + c.cast("decimal(3,2)")
}
