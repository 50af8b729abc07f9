package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sketches, WebExtract}

/** Batch 14 operators: the portable HLL sketch's estimator/merge
  * contract (the register TABLE itself is hash-gated by q127/q128)
  * and the WET extraction rules on hand-built markup. */
class WebCorpusSpec extends SparkSuite {
  import spark.implicits._

  test("HLL: estimate within the m=256 error band, linear counting low") {
    val big = (1 to 20000).map(i => s"key-$i").toDF("k")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(big, "k"))
    // rsd at m=256 is 1.04/16 = 6.5%; allow 3 sigma
    assert(math.abs(est - 20000) / 20000.0 < 0.20, s"est=$est")
    // small range: the linear-counting branch must engage and be tight
    val small = (1 to 50).map(i => s"s-$i").toDF("k")
    val estSmall = Sketches.hllEstimate(Sketches.hllRegisters(small, "k"))
    assert(math.abs(estSmall - 50) / 50.0 < 0.15, s"estSmall=$estSmall")
  }

  test("HLL: merge ≡ rebuild, duplicate-insensitive, null-excluding") {
    val xs = (1 to 5000).map(i => s"v-$i")
    val all = xs.toDF("k")
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "k").orderBy("bucket")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val direct = regs(all)
    // merge of an arbitrary split rebuilds the direct registers
    val merged = Sketches.hllMerge(
        Sketches.hllRegisters(xs.filter(_.hashCode % 3 == 0).toDF("k"), "k"),
        Sketches.hllRegisters(xs.filterNot(_.hashCode % 3 == 0).toDF("k"), "k"))
      .orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(merged == direct)
    // duplicates do not move a single register (distinct semantics)
    assert(regs(all.union(all).union(all)) == direct)
    // nulls are not counted
    val withNulls = (xs.map(Option(_)) ++ Seq.fill(100)(Option.empty[String]))
      .toDF("k")
    assert(regs(withNulls) == direct)
  }

  test("extractText: tags separate words, entities decode amp-LAST, ws collapses") {
    val html = Seq((1L,
      "<html><head><title>T one</title></head><body>" +
        "<p>a&amp;lt;b</p><div>c</div> &quot;q&#39;s&quot; " +
        "&lt;tag&gt;\t\n x</body></html>")).toDF("id", "html")
    val r = WebExtract.extractText(html, "id", "html").collect()(0)
    assert(r.getString(1) == "T one")
    // &amp;lt; is the ESCAPED text "&lt;" — a decoder that unescapes
    // &amp; first would double-decode it into a real '<'
    assert(r.getString(2) == "T one a&lt;b c \"q's\" <tag> x")
    assert(r.getInt(3) == 0)
  }

  test("extractText: adjacent block elements never fuse words") {
    val html = Seq((1L, "<p>alpha</p><p>beta</p>")).toDF("id", "html")
    val r = WebExtract.extractText(html, "id", "html").collect()(0)
    assert(r.getString(2) == "alpha beta")
    assert(r.getString(1) == "") // no title element
  }

  test("extractLinks: document order, multi-link, attribute-only match") {
    val html = Seq(
      (1L, """x <a href="u1">l</a> y <img src="i"/> <a id="z" href="u2">m</a>"""),
      (2L, "no links here")).toDF("id", "html")
    val out = WebExtract.extractLinks(html, "id", "html")
      .orderBy(col("id"), col("link_pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(out == Seq((1L, 0, "u1"), (1L, 1, "u2")))
  }
}
