package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a real AGGREGATE — the scale-correct alternative to
  * a `row_number` window for top-k-per-group: the buffer never holds
  * more than k entries, partial aggregation runs map-side (each task
  * reduces its slice to k before any shuffle), and the merge is a k+k
  * re-truncate. A window, by contrast, must co-locate and sort a
  * group's ENTIRE candidate set.
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * `orderBy(cosine.desc, nn_id)` window formulation, so results are
  * deterministic and oracle-comparable. NaN scores (e.g. cosine of a
  * zero-norm vector) are DROPPED here — Spark's desc sort would rank
  * NaN first in the window formulation, so callers wanting window
  * parity on NaN-bearing data must filter NaN before the window too
  * (the Similarity queries never produce NaN: norms are strictly
  * positive for the non-empty embeddings they score).
  */
case class ScoredId(score: Double, id: Long)

class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  private def truncate(xs: Seq[ScoredId]): Seq[ScoredId] =
    xs.sortBy(x => (-x.score, x.id)).take(k)

  override def zero: Seq[ScoredId] = Seq.empty
  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    // NaN never enters the buffer (comparisons below are false for NaN
    // only by accident of ordering — make the drop explicit).
    if (a.score.isNaN) buf
    // cheap guard: only re-sort when the candidate can enter the top-k
    else if (buf.length < k || a.score > buf.last.score ||
        (a.score == buf.last.score && a.id < buf.last.id)) truncate(buf :+ a)
    else buf
  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    truncate(b1 ++ b2)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = bufferEncoder
}
