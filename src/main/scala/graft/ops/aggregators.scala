package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** §2.10 UDAF surface: a typed Aggregator computing the total number of
  * days covered by the union of a key's validity intervals (overlaps
  * merged, open intervals truncated at `horizon`).
  *
  * Buffer design (scale): a naive list buffer holds EVERY raw interval
  * of a key until `finish` — a hot key with millions of intervals OOMs
  * the aggregation buffer. This implementation compacts instead: raw
  * intervals accumulate in `pending`, and every `compactAt` of them are
  * folded into `islands`, the sorted disjoint union so far (a lossless
  * summary — the union of interval sets is associative/commutative, so
  * partial compaction commutes with Spark's partial aggregation and
  * merge order). Buffer memory is therefore O(#disjoint islands +
  * compactAt), not O(#raw intervals); #islands is the inherent floor
  * for an exact answer (a key whose intervals never touch needs every
  * island until merge time).
  *
  * Matches the SQL gaps-and-islands form (oracle-checked in
  * q42_interval_union_days).
  */
object IntervalUnionDays {

  /** (beginDays, endDaysOrNull) in days-since-epoch; end null = open. */
  type Interval = (Int, Option[Int])

  /** Aggregation state: raw `pending` intervals (≤ compactAt, counted
    * by `n` so size checks are O(1)), plus the compacted sorted
    * disjoint-island union of everything already folded. */
  case class Buf(pending: List[Interval], n: Int, islands: List[(Int, Int)])

  def apply(horizonDays: Int, compactAt: Int = 4096): Aggregator[Interval, Buf, Long] =
    new Aggregator[Interval, Buf, Long] {
      def zero: Buf = Buf(Nil, 0, Nil)

      def reduce(b: Buf, a: Interval): Buf =
        maybeCompact(Buf(a :: b.pending, b.n + 1, b.islands))

      def merge(b1: Buf, b2: Buf): Buf =
        maybeCompact(Buf(b1.pending ::: b2.pending, b1.n + b2.n,
          unionIslands(b1.islands, b2.islands)))

      def finish(b: Buf): Long =
        unionIslands(toIslands(b.pending), b.islands)
          .foldLeft(0L) { case (t, (s, e)) => t + (e - s) }

      private def maybeCompact(b: Buf): Buf =
        if (b.n < compactAt) b
        else Buf(Nil, 0, unionIslands(toIslands(b.pending), b.islands))

      /** Close open intervals at the horizon, drop empties, sort, sweep
        * into disjoint islands. */
      private def toIslands(pending: List[Interval]): List[(Int, Int)] =
        sweep(pending.map { case (s, e) => (s, e.getOrElse(horizonDays)) }
          .filter { case (s, e) => e > s }
          .sortBy(_._1))

      /** Union two already-disjoint sorted island lists. */
      private def unionIslands(a: List[(Int, Int)], b: List[(Int, Int)]): List[(Int, Int)] =
        if (a.isEmpty) b else if (b.isEmpty) a
        else sweep((a ::: b).sortBy(_._1))

      /** One pass over start-sorted closed intervals → disjoint union. */
      private def sweep(sorted: List[(Int, Int)]): List[(Int, Int)] = {
        val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
        var curS = Int.MinValue
        var curE = Int.MinValue
        sorted.foreach { case (s, e) =>
          if (s > curE) {
            if (curE > curS) out += ((curS, curE))
            curS = s; curE = e
          } else if (e > curE) curE = e
        }
        if (curE > curS) out += ((curS, curE))
        out.toList
      }

      def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
}
