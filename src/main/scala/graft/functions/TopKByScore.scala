package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

case class ScoredId(score: Double, id: Long)

/** Grouped top-k by (score desc, id asc) as a mergeable bounded
  * `Aggregator[IN, BUF, OUT]` — the scale-correct form of per-group
  * ranking. A `row_number() OVER (PARTITION BY g ORDER BY score)` window
  * must shuffle and sort EVERY scored row; this aggregate keeps at most
  * `k` entries per (group × partition) map-side and shuffles only those,
  * so network cost is O(groups × k × partitions) regardless of how many
  * candidates were scored — the difference between ranking a 100 TB scored
  * set and merging a few k-row heaps.
  *
  * Input tuples are (group, id, score); the group is carried by
  * `groupByKey` and ignored here. Ordering is total — score desc with id
  * asc tiebreak — so results are deterministic and engine-independent.
  */
class TopKByScore(k: Int)
  extends Aggregator[(Long, Long, Double), Seq[ScoredId], Seq[ScoredId]] {

  /** Strict total order: a ranks ahead of b. */
  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], in: (Long, Long, Double)): Seq[ScoredId] = {
    val e = ScoredId(in._3, in._2)
    if (buf.size < k) buf :+ e
    else {
      // O(k) scan for the current worst; k is small (5..100)
      var wi = 0
      var i = 1
      while (i < buf.size) {
        if (better(buf(wi), buf(i))) wi = i
        i += 1
      }
      if (better(e, buf(wi))) buf.updated(wi, e) else buf
    }
  }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] =
    buf.sortWith(better)

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}
