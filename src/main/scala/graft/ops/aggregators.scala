package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** §2.10 UDAF surface: a typed Aggregator computing the total number of
  * days covered by the union of a key's validity intervals (overlaps
  * merged, open intervals truncated at `horizon`). The buffer is the
  * interval list; merge concatenates, finish sorts + unions — the
  * classic mergeable-state shape (works under partial aggregation).
  *
  * Matches the SQL gaps-and-islands form (oracle-checked in
  * q43_interval_union_days).
  */
object IntervalUnionDays {

  /** (beginDays, endDaysOrNull) in days-since-epoch; end null = open. */
  type Interval = (Int, Option[Int])

  def apply(horizonDays: Int): Aggregator[Interval, List[Interval], Long] =
    new Aggregator[Interval, List[Interval], Long] {
      def zero: List[Interval] = Nil
      def reduce(b: List[Interval], a: Interval): List[Interval] = a :: b
      def merge(b1: List[Interval], b2: List[Interval]): List[Interval] = b1 ::: b2
      def finish(b: List[Interval]): Long = {
        val closed = b.map { case (s, e) => (s, e.getOrElse(horizonDays)) }
          .filter { case (s, e) => e > s }
          .sortBy(_._1)
        var total = 0L
        var curS = Int.MinValue
        var curE = Int.MinValue
        closed.foreach { case (s, e) =>
          if (s > curE) {
            if (curE > curS) total += curE - curS
            curS = s; curE = e
          } else if (e > curE) curE = e
        }
        if (curE > curS) total += curE - curS
        total
      }
      def bufferEncoder: Encoder[List[Interval]] = Encoders.kryo[List[Interval]]
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
}
