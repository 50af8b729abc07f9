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

/** Misra–Gries heavy-hitters summary as a mergeable typed Aggregator
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012): at most `k` counters; inserting past
  * capacity decrements every counter (dropping zeros); merging sums
  * counters and subtracts the (k+1)-th largest, dropping non-positive.
  *
  * Guarantees, independent of partitioning and merge order — the
  * properties the q154 gate checks and the only things a consumer may
  * rely on (the candidate SET itself is order-dependent):
  *   - est(x) ≤ true(x)                          (never overcounts)
  *   - true(x) − est(x) ≤ n/(k+1)                (bounded undercount)
  *   - every x with true(x) > n/(k+1) is present (no heavy miss)
  *
  * Buffer is O(k) regardless of stream length — the fixed-size
  * summary that answers "top sources/domains/tokens by frequency"
  * over a 100 TB scan with one map-side-combined aggregate. */
/** K-minimum-values distinct sketch core (Bar-Yossef et al. 2002;
  * merge/estimator form in Beyer et al., SIGMOD 2007): the `k`
  * smallest DISTINCT hash values of a stream, as a mergeable typed
  * Aggregator. Unlike [[MisraGries]]' order-dependent candidate set,
  * the k-min set is a pure function of the input SET — independent of
  * partitioning and merge order — so [[graft.ops.Sketches]] gates it
  * hash-exactly against a `DISTINCT … ORDER BY h LIMIT k` oracle.
  *
  * Buffer is a sorted distinct Array[Long] of size ≤ k: once
  * saturated, a row whose hash ≥ the current k-th minimum is rejected
  * in O(1) (the common case — probability ≈ k/n), so the map-side
  * partial aggregation streams 100 TB with k·8 bytes of state per
  * task and a ≤ k-row exchange — the exact-distinct shuffle (every
  * distinct value crossing the wire) is what this sketch exists to
  * avoid. */
object KmvMinK {

  def apply(k: Int): Aggregator[Long, Array[Long], Array[Long]] = {
    require(k >= 2)
    new Aggregator[Long, Array[Long], Array[Long]] {
      def zero: Array[Long] = Array.emptyLongArray

      def reduce(buf: Array[Long], h: Long): Array[Long] = {
        val n = buf.length
        if (n == k && h >= buf(n - 1)) buf // O(1) saturated reject
        else {
          val i = java.util.Arrays.binarySearch(buf, h)
          if (i >= 0) buf // already present (set semantics)
          else {
            val ins = -i - 1
            val m = if (n == k) k else n + 1
            val out = new Array[Long](m)
            System.arraycopy(buf, 0, out, 0, ins)
            out(ins) = h
            // when full, the old k-th minimum falls off the end
            System.arraycopy(buf, ins, out, ins + 1, m - 1 - ins)
            out
          }
        }
      }

      /** Merge two sorted distinct arrays, keeping the k smallest of
        * their union — the KMV union property: k-min(S ∪ T) =
        * k-min(k-min(S) ∪ k-min(T)), which is what makes the sketch
        * both partition-safe and an appendable persisted state. */
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        if (a.isEmpty) return b
        if (b.isEmpty) return a
        val tmp = new Array[Long](math.min(k, a.length + b.length))
        var i = 0; var j = 0; var o = 0
        while (o < tmp.length && (i < a.length || j < b.length)) {
          val v =
            if (i >= a.length) { val x = b(j); j += 1; x }
            else if (j >= b.length) { val x = a(i); i += 1; x }
            else if (a(i) < b(j)) { val x = a(i); i += 1; x }
            else if (a(i) > b(j)) { val x = b(j); j += 1; x }
            else { val x = a(i); i += 1; j += 1; x }
          tmp(o) = v; o += 1
        }
        if (o == tmp.length) tmp else java.util.Arrays.copyOf(tmp, o)
      }

      def finish(buf: Array[Long]): Array[Long] = buf

      def bufferEncoder: Encoder[Array[Long]] =
        Encoders.kryo[Array[Long]]
      def outputEncoder: Encoder[Array[Long]] =
        Encoders.kryo[Array[Long]]
    }
  }
}

object MisraGries {

  def apply(k: Int): Aggregator[Long, Map[Long, Long], Seq[(Long, Long)]] = {
    require(k >= 1)
    new Aggregator[Long, Map[Long, Long], Seq[(Long, Long)]] {
      def zero: Map[Long, Long] = Map.empty

      def reduce(m: Map[Long, Long], x: Long): Map[Long, Long] =
        m.get(x) match {
          case Some(c) => m.updated(x, c + 1)
          case None if m.size < k => m.updated(x, 1L)
          case None => // decrement-all, drop zeros (the classic step)
            m.view.mapValues(_ - 1).filter(_._2 > 0).toMap
        }

      def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
        val s = (a.keySet ++ b.keySet).iterator
          .map(x => x -> (a.getOrElse(x, 0L) + b.getOrElse(x, 0L))).toMap
        if (s.size <= k) s
        else {
          val cut = s.values.toSeq.sorted(Ordering[Long].reverse)(k)
          s.view.mapValues(_ - cut).filter(_._2 > 0).toMap
        }
      }

      def finish(m: Map[Long, Long]): Seq[(Long, Long)] =
        m.toSeq.sortBy(_._1)

      def bufferEncoder: Encoder[Map[Long, Long]] =
        Encoders.kryo[Map[Long, Long]]
      def outputEncoder: Encoder[Seq[(Long, Long)]] =
        Encoders.kryo[Seq[(Long, Long)]]
    }
  }
}
