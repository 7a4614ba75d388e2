package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input of [[TopKAgg]]: an integer micro-unit score and the row id. */
final case class ScoredId(score: Long, id: Long)

/** Bounded top-k buffer: parallel arrays sorted by (score DESC, id ASC),
  * never longer than k — primitive arrays keep the buffer encoder
  * columnar (no kryo blobs in the aggregation state).
  */
final case class TopKBuf(scores: Array[Long], ids: Array[Long])

/** Grouped top-k as a typed `Aggregator[IN, BUF, OUT]` — the per-group
  * top-k WITHOUT a window: the usual `row_number() OVER (PARTITION BY g
  * ORDER BY s DESC) <= k` sorts every group's full contents; this
  * aggregate carries a bounded k-row buffer that combines MAP-SIDE, so
  * the shuffle moves at most k rows per group per partition and no sort
  * of the group ever happens. At 100 TB with heavy-hitter groups that is
  * the difference between a skew-prone mega-group sort and a fixed-size
  * merge. Deterministic: the buffer order (score DESC, id ASC) is a total
  * order, so arrival and merge order cannot change the result — q120
  * restates it against the window form under the hash gate.
  *
  * Use via `functions.udaf(new TopKAgg(k), Encoders.product[ScoredId])`
  * then `agg(topk(col(score), col(id)))`; explode the returned arrays.
  */
final class TopKAgg(k: Int) extends Aggregator[ScoredId, TopKBuf, TopKBuf] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: TopKBuf = TopKBuf(Array.emptyLongArray, Array.emptyLongArray)

  // (score DESC, id ASC) strictly before?
  private def before(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def reduce(b: TopKBuf, a: ScoredId): TopKBuf = {
    val n = b.scores.length
    if (n == k && !before(a.score, a.id, b.scores(n - 1), b.ids(n - 1))) b
    else {
      // insertion point by linear scan — k is small by contract
      var p = 0
      while (p < n && before(b.scores(p), b.ids(p), a.score, a.id)) p += 1
      val m = math.min(n + 1, k)
      val ss = new Array[Long](m)
      val is = new Array[Long](m)
      System.arraycopy(b.scores, 0, ss, 0, p)
      System.arraycopy(b.ids, 0, is, 0, p)
      if (p < m) { ss(p) = a.score; is(p) = a.id }
      var q = p + 1
      while (q < m) { ss(q) = b.scores(q - 1); is(q) = b.ids(q - 1); q += 1 }
      TopKBuf(ss, is)
    }
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    val m = math.min(x.scores.length + y.scores.length, k)
    val ss = new Array[Long](m)
    val is = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeX = j >= y.scores.length || (i < x.scores.length &&
        before(x.scores(i), x.ids(i), y.scores(j), y.ids(j)))
      if (takeX) { ss(o) = x.scores(i); is(o) = x.ids(i); i += 1 }
      else { ss(o) = y.scores(j); is(o) = y.ids(j); j += 1 }
      o += 1
    }
    TopKBuf(ss, is)
  }

  override def finish(reduction: TopKBuf): TopKBuf = reduction
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
