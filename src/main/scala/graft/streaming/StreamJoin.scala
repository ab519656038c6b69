package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream watermarked interval join — the attribution shape (each
  * click joined to the same user's purchases within an event-time window),
  * the one Structured-Streaming operator family §2.9 lacked: both sides
  * are unbounded, so unlike the stream⋈static dim joins the engine must
  * BUFFER each side keyed by user and match across micro-batch boundaries.
  *
  * What bounds the state at scale — the reason this form works at 100 TB:
  *  - watermarks on BOTH event-time columns, plus
  *  - the two-sided time constraint (`r_ts ∈ [l_ts, l_ts + window]`)
  *
  * together let the engine compute, per side, the oldest row that could
  * still match anything (left rows age out `window` past the watermark,
  * right rows at the watermark), and evict everything older. Without the
  * time bound the join state would grow without limit; with it, state is
  * O(rows per watermark-delay + window span) regardless of stream length.
  * An inner join's emission is NOT watermark-gated — a match emits in the
  * micro-batch where both rows are first present — so a single-batch
  * drain's output is exactly the batch interval join, which is what makes
  * `stream_stream_join` exactly oracle-able (the same device as the
  * `stream_dedup` drain).
  *
  * `left`/`right` carry `(user_id, event_id, ts, value)`; output one row
  * per qualifying (left, right) pair with both ids and timestamps.
  */
object StreamJoin {

  def intervalJoin(left: DataFrame, right: DataFrame,
                   windowMinutes: Int, delay: String): DataFrame =
    joined(left, right, windowMinutes, delay, "inner")

  /** LEFT OUTER form — "every click, with its purchases if any": matches
    * emit as they meet (like the inner form), but a click with NO match
    * can only emit null-extended once the engine PROVES no future purchase
    * can close the window — i.e. when the watermark passes the click's
    * join-window close and its buffered state is evicted. That makes the
    * null-extension set watermark-gated (unlike inner emission), which is
    * exactly the session-window append-mode discipline: under a
    * single-batch drain the final watermark is a pure function of the
    * data, and the oracle replays the same cutoff
    * (`StreamJoinSpec` pins the boundary: close STRICTLY before the
    * watermark emits, close == watermark stays open).
    */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
                            windowMinutes: Int, delay: String): DataFrame =
    joined(left, right, windowMinutes, delay, "left_outer")

  private def joined(left: DataFrame, right: DataFrame, windowMinutes: Int,
                     delay: String, joinType: String): DataFrame = {
    val l = left
      .select(col("user_id"), col("event_id").as("l_id"), col("ts").as("l_ts"))
      .withWatermark("l_ts", delay)
    val r = right
      .select(col("user_id").as("r_user_id"), col("event_id").as("r_id"),
        col("ts").as("r_ts"), col("value").as("r_value"))
      .withWatermark("r_ts", delay)
    l.join(r,
        l("user_id") === col("r_user_id") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        joinType)
      .drop("r_user_id")
  }

  /** Stream⋈static dimension enrichment — the OTHER streaming join family:
    * only one side is unbounded, so no state store and no watermark are
    * involved at all. The static side is a plain batch DataFrame joined
    * inside every micro-batch; Structured Streaming re-executes the batch
    * subtree per trigger, so a dim refreshed on disk between triggers is
    * picked up without restarting the query (the slowly-changing-dim
    * pattern for continuous enrichment).
    *
    * Scale: the dim carries an explicit `broadcast` hint — the unbounded
    * fact side NEVER shuffles for the join, which is the only shape that
    * survives a 100 TB/day stream (shuffling a stream on user_id per
    * micro-batch would re-partition the firehose every trigger). Dims too
    * big to broadcast belong in the foreachBatch merge path
    * ([[StreamStar.upsertStarBatch]]) where the fact lands first and joins
    * co-located afterward.
    *
    * Stateless row-level enrichment is append-mode-safe by construction:
    * each input row emits exactly its joined rows in its own micro-batch,
    * so a drain equals the batch join — exactly oracle-able.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)
}
