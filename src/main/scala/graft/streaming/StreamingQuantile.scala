package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming maintenance of the mergeable quantile tier
  * ([[graft.ops.Aggregates.quantileRollup]]): a running (bucket, count)
  * histogram over exact integer cents, kept as STREAMING AGGREGATE state.
  * This is the production shape of percentile dashboards over an ingest
  * stream — per micro-batch the state absorbs one bucket-count delta
  * (map-side partial per task, tiny update per trigger), and any reader
  * turns the current state into p50/p90/p99 with the same bounded-error
  * read-off the batch tier uses. The state size is bounded by
  * value-range/width — never by stream length — the same reason the
  * batch tier's histogram merges losslessly.
  *
  * Works unchanged on a batch frame (the chunk-equivalence gate in
  * StreamingSpec feeds both sides): the bucket expression is SHARED with
  * the batch tier (`Aggregates.centsBucket`), so streaming state and
  * batch histograms can never drift onto different boundaries. */
object StreamingQuantile {

  /** Running histogram: groupBy bucket over the shared fixed-boundary
    * bucket expression. On a streaming frame this plans a stateful
    * streaming aggregate (Complete/Update output); on a batch frame it
    * IS `Aggregates.centsHist`. */
  def bucketCounts(orders: DataFrame, widthCents: Long = 100000L): DataFrame =
    orders
      .select(graft.ops.Aggregates.centsBucket(widthCents).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))

  /** Percentile read-off from a materialized state snapshot — the same
    * threshold/cumulative chain as the batch tier (shared code). */
  def quantilesFromState(state: DataFrame, widthCents: Long = 100000L,
                         qs: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    graft.ops.Aggregates.quantilesFromHist(state, widthCents, qs)
}
