package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.SqlShim
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql("SELECT
  * vec_dot(a, b) ...")` works next to the DataFrame API.
  *
  * Wire up with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or programmatically via `SparkSession.builder.withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}

object GraftExtensions {
  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (args => DotProduct(args(0), args(1))),
    "vec_norm" -> (args => L2Norm(args.head)),
    "word_shingles" -> (args => WordShingles(args.head,
      k = args(1).eval().asInstanceOf[Int], distinct = true)),
    "rolling_fingerprint" -> (args => RollingFingerprint(args.head)),
    "minhash_sig" -> (args => MinHashSig(args.head,
      numHashes = args(1).eval().asInstanceOf[Int])),
    "topk_sketch" -> (args => SpaceSavingTopK(args.head,
      k = args(1).eval().asInstanceOf[Int],
      capacity = args(2).eval().asInstanceOf[Int]).toAggregateExpression()),
    // Spark's own Bloom pair, unregistered upstream: build an index-epoch
    // filter in SQL (`graft_bloom_agg(key, items, bits)`) and probe it
    // (`graft_might_contain(filter, key)`) — the incremental-dedup
    // prefilter (Dedup.bloomBuild/bloomProbe) from pure spark.sql
    "graft_bloom_agg" -> (args =>
      org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args.head)),
        args(1), args(2), 0, 0).toAggregateExpression()),
    "graft_might_contain" -> (args =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        args.head,
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args(1))))))

  /** Register into an already-running session (same builders as the
    * extensions path) — for sessions constructed without
    * `spark.sql.extensions`, e.g. one handed over by a host harness. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) => SqlShim.registerFunction(spark, name, b) }
}
