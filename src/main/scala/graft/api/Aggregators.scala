package graft.api

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation — the `Aggregator[IN, BUF, OUT]` surface
  * (SURVEY.md §2.7: the reference's `reduction`/`foldby` analog for the
  * relational path). Catalyst plans these with partial (map-side) + final
  * merge automatically, so a custom aggregate scales exactly like a
  * built-in one.
  */
object Aggregators {

  /** Weighted mean over (value, weight) pairs. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Double)): Double = if (r._2 == 0) 0.0 else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Exact reservoir-free distinct-count buffer would not scale — this is
    * the log-log sketch shape instead: a tiny fixed buffer of max leading
    * zeros per 2^p register (a teaching-size HyperLogLog, p=8). For
    * production use `approx_count_distinct` (Spark's HLL++); this exists
    * to cover the "custom sketch as Aggregator" extension point with a
    * mergeable buffer. */
  class Hll(p: Int = 8) extends Aggregator[Long, Array[Byte], Long] {
    private val m = 1 << p
    override def zero: Array[Byte] = new Array[Byte](m)
    override def reduce(buf: Array[Byte], x: Long): Array[Byte] = {
      val h = scala.util.hashing.byteswap64(x)
      val idx = (h >>> (64 - p)).toInt
      val rank = (java.lang.Long.numberOfLeadingZeros(h << p) + 1).min(64 - p).toByte
      if (rank > buf(idx)) buf(idx) = rank
      buf
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Byte]): Long = {
      val alpha = 0.7213 / (1 + 1.079 / m)
      var sum = 0.0; var zeros = 0
      buf.foreach { r => sum += math.pow(2.0, -r.toDouble); if (r == 0) zeros += 1 }
      val e = alpha * m * m / sum
      val est = if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
      math.round(est)
    }
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Bounded top-k as a mergeable aggregate: keeps the k largest
    * (value, id) pairs (value DESC, id ASC tiebreak) in a size-k buffer.
    *
    * This is the SCALE-correct per-group top-k: Catalyst plans it with a
    * map-side partial, so at most k rows per group per partition reach
    * the exchange — versus the window-function formulation
    * (`row_number() OVER (PARTITION BY g ORDER BY v)`) which shuffles and
    * sorts EVERY row of every group before discarding all but k. For a
    * 100 TB corpus with bounded k the reduction is the ratio of corpus
    * size to (groups × k × partitions): typically orders of magnitude
    * less exchange traffic, and no per-group sort spill. */
  class TopK(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    private val ord = Ordering.by[(Long, Long), (Long, Long)] { case (v, id) => (-v, id) }
    override def zero: Seq[(Long, Long)] = Vector.empty
    override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
      if (b.length < k || ord.lt(a, b.last)) ((b :+ a).sorted(ord)).take(k) else b
    override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
      (x ++ y).sorted(ord).take(k)
    override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
