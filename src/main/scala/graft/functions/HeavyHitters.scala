package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

case class TokenCount(token: String, n: Long)

/** Misra-Gries heavy-hitters sketch as a typed
  * `Aggregator[IN, BUF, OUT]` — the custom-aggregate surface SURVEY.md §7
  * reserves for sketch operators. Mergeable (associative partial states),
  * so Spark runs it as a normal partial+final aggregation: each partition
  * keeps at most `capacity` counters, shuffling `capacity` rows per
  * partition regardless of corpus size.
  *
  * Guarantee: any token with frequency > N/capacity survives; counts are
  * exact when distinct tokens ≤ capacity (true for the fixture vocabulary,
  * which keeps the DuckDB oracle exact).
  */
class HeavyHitters(k: Int, capacity: Int = 1024)
  extends Aggregator[String, Map[String, Long], Seq[TokenCount]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(c) => buf.updated(tok, c + 1)
      case None if buf.size < capacity => buf.updated(tok, 1L)
      case None => // Misra-Gries decrement step
        buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (combined.size <= capacity) combined
    else {
      // subtract the (capacity+1)-th largest count, drop non-positives
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      combined.flatMap { case (t, c) => if (c - cut > 0) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[TokenCount] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
      .map { case (t, c) => TokenCount(t, c) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[TokenCount]] =
    ExpressionEncoder[Seq[TokenCount]]()
}
