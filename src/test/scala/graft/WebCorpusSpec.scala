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

  test("HLL set algebra: stats path ≡ estimate path; intersection " +
      "estimate in band; disjoint clamps at 0") {
    val a = (1 to 2000).map(i => s"id-$i").toDF("k")
    val b = (501 to 2500).map(i => s"id-$i").toDF("k")
    val regsA = Sketches.hllRegisters(a, "k")
    val regsB = Sketches.hllRegisters(b, "k")
    // the q189/q192 integer sufficient statistics determine the SAME
    // double the register-table estimator computes — exactly
    val st = Sketches.hllStats(regsA, "a").collect().head
    // relative epsilon, not ==: the stats path divides one 2^53-scaled
    // long while the estimate path accumulates per-bucket math.pow in
    // bucket order — equal only while the harmonic sum fits a 53-bit
    // mantissa exactly, which a register table mixing rho 1 with very
    // high rho need not satisfy
    val fromStats = Sketches.hllEstimateFromStats(st.getInt(1), st.getLong(2))
    val fromRegs = Sketches.hllEstimate(regsA)
    assert(math.abs(fromStats - fromRegs) <= 1e-12 * math.abs(fromRegs),
      s"stats=$fromStats regs=$fromRegs")
    // inclusion–exclusion: |A∩B| = 1500 here; deterministic md5
    // registers make the estimate a fixed number — band, not flake
    val inter = Sketches.hllIntersectEstimate(regsA, regsB)
    assert(math.abs(inter - 1500) / 1500.0 < 0.35, s"inter=$inter")
    // disjoint sets: clamped at 0, never negative
    val c = (90001 to 92000).map(i => s"id-$i").toDF("k")
    val interDisjoint = Sketches.hllIntersectEstimate(
      regsA, Sketches.hllRegisters(c, "k"))
    assert(interDisjoint >= 0.0)
    assert(interDisjoint < 400.0, s"disjoint=$interDisjoint") // ~sketch noise
  }

  test("CMS inner product: never undercounts the true join size, " +
      "min-over-depth is the estimate, band at adequate width") {
    // a: keys k-0..k-499 six times each; b: k-0..k-249 four times
    // each → true inner product Σ 6·4 over 250 shared keys = 6000
    val a = (1 to 3000).map(i => s"k-${i % 500}").toDF("k")
    val b = (1 to 1000).map(i => s"k-${i % 250}").toDF("k")
    val truth = 250L * 6 * 4
    val ma = Sketches.cmsSketch(a, "k", depth = 4, width = 4096)
    val mb = Sketches.cmsSketch(b, "k", depth = 4, width = 4096)
    val dots = Sketches.cmsInnerProductByDepth(ma, mb)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dots.keySet == Set(0, 1, 2, 3))
    // the §4.3 one-sided guarantee: EVERY depth row ≥ truth
    assert(dots.values.forall(_ >= truth), s"dots=$dots")
    val est = Sketches.cmsJoinSizeEstimate(ma, mb)
    assert(est == dots.values.min && est >= truth)
    // expected inflation ≈ ΣfA·ΣfB/width = 3M/4096 ≈ 732; allow 3×
    assert(est <= truth + 2200, s"est=$est truth=$truth")
    // fast (xxhash64) matrices through the SAME op (q195): the
    // one-sided guarantee and band hold lane-family-independently
    val fa = Sketches.cmsSketchFast(a, "k", depth = 4, width = 4096)
    val fb = Sketches.cmsSketchFast(b, "k", depth = 4, width = 4096)
    val estFast = Sketches.cmsJoinSizeEstimate(fa, fb)
    assert(estFast >= truth && estFast <= truth + 2200, s"fast=$estFast")
  }

  test("HLL fast (xxhash64): same layout, merge ≡ rebuild, band-agrees " +
      "with the md5-portable twin") {
    val xs = (1 to 20000).map(i => s"key-$i")
    val df = xs.toDF("k")
    val fast = Sketches.hllRegistersFast(df, "k")
    // identical register SCHEMA and bounds as the portable form
    assert(fast.columns.toSeq == Seq("bucket", "rho_max"))
    val regs = fast.collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(regs.forall { case (b, rho) => b >= 0 && b < 256 && rho >= 1 && rho <= 53 })
    // band agreement (VERDICT r10 #2: exact equality of estimates is
    // NOT required — both lanes must land in the same accuracy band):
    // rsd at m=256 is 6.5%, so both estimates sit within 3σ of truth
    // and therefore within ~40% of each other; pin both to truth.
    val estFast = Sketches.hllEstimate(fast)
    val estPortable = Sketches.hllEstimate(Sketches.hllRegisters(df, "k"))
    assert(math.abs(estFast - 20000) / 20000.0 < 0.20, s"fast=$estFast")
    assert(math.abs(estPortable - 20000) / 20000.0 < 0.20)
    // merge ≡ rebuild holds for the fast lane too (same max-merge)
    val merged = Sketches.hllMerge(
        Sketches.hllRegistersFast(xs.filter(_.hashCode % 3 == 0).toDF("k"), "k"),
        Sketches.hllRegistersFast(xs.filterNot(_.hashCode % 3 == 0).toDF("k"), "k"))
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(merged == fast.orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq)
    // grouped fast form: per-group slice equals its own direct build
    val rows = (1 to 3000).map(i => (i % 3L, s"v-${i % 700}"))
    val grouped = Sketches.hllRegistersByFast(rows.toDF("g", "k"), Seq("g"), "k")
      .orderBy("g", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    for (g <- 0L until 3L) {
      val direct = Sketches.hllRegistersFast(
          rows.filter(_._1 == g).map(_._2).toDF("k"), "k")
        .orderBy("bucket").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(grouped.filter(_._1 == g).map(t => (t._2, t._3)) == direct, s"g=$g")
    }
  }

  test("CMS fast (xxhash64): no-undercount invariant, additive merge, " +
      "error band vs exact counts") {
    // skewed frequencies: key j appears j times, j = 1..200
    val xs = (1 to 200).flatMap(j => Seq.fill(j)(s"k-$j"))
    val df = xs.toDF("k")
    val sk = Sketches.cmsSketchFast(df, "k")
    // counter matrix layout identical to the portable form
    assert(sk.columns.toSeq == Seq("r", "pos", "cnt"))
    assert(sk.agg(sum("cnt")).head.getLong(0) == 4L * xs.size) // depth rows
    val est = Sketches.cmsEstimateFast(sk, df, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // one-sided guarantee: est >= true for EVERY key...
    (1 to 200).foreach { j =>
      assert(est(s"k-$j") >= j, s"undercount at k-$j: ${est(s"k-$j")} < $j")
    }
    // ...and the Count-Min bound: overshoot ≤ eN with e = e/width ≈
    // 2.72/256; allow 3x slack for the tiny width-256 matrix
    val n = xs.size
    val maxOver = (1 to 200).map(j => est(s"k-$j") - j).max
    assert(maxOver <= 3 * math.E * n / 256, s"maxOver=$maxOver n=$n")
    // additive merge ≡ rebuild (same cell arithmetic as portable)
    val (a, b) = xs.splitAt(xs.size / 2)
    val merged = Sketches.cmsMerge(
        Sketches.cmsSketchFast(a.toDF("k"), "k"),
        Sketches.cmsSketchFast(b.toDF("k"), "k"))
      .orderBy("r", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(merged == sk.orderBy("r", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq)
  }

  test("CMS grouped fast (xxhash64): per-group slice ≡ direct build, " +
      "per-group merge ≡ rebuild, per-group no-undercount; grouped " +
      "fast HLL band-agrees with the md5 grouped twin") {
    // group g carries keys k-0..k-(99+50g), key j appearing (j%7)+1 times
    val rows = for {
      g <- 0 to 2; j <- 0 until 100 + 50 * g; _ <- 0 to j % 7
    } yield (g.toLong, s"k-$j")
    val df = rows.toDF("g", "k")
    val grouped = Sketches.cmsSketchByFast(df, Seq("g"), "k",
        depth = 2, width = 64)
      .orderBy("g", "r", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    for (g <- 0L to 2L) {
      val slice = grouped.filter(_._1 == g).map(t => (t._2, t._3, t._4))
      val own = rows.filter(_._1 == g).map(_._2).toDF("k")
      val direct = Sketches.cmsSketchFast(own, "k", depth = 2, width = 64)
        .orderBy("r", "pos").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
      assert(slice == direct, s"g=$g slice != direct build")
      // per-group additive merge ≡ rebuild (split the group's rows)
      val (a, b) = rows.filter(_._1 == g).map(_._2).splitAt(rows.size / 4)
      val merged = Sketches.cmsMerge(
          Sketches.cmsSketchFast(a.toDF("k"), "k", depth = 2, width = 64),
          Sketches.cmsSketchFast(b.toDF("k"), "k", depth = 2, width = 64))
        .orderBy("r", "pos").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
      assert(merged == direct, s"g=$g merge != rebuild")
      // per-group one-sided guarantee vs the group's exact counts
      val est = Sketches.cmsEstimateFast(
          Sketches.cmsSketchFast(own, "k", depth = 2, width = 64),
          own, "k", depth = 2, width = 64)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      rows.filter(_._1 == g).groupBy(_._2).foreach { case (k, ks) =>
        assert(est(k) >= ks.size, s"g=$g undercount at $k")
      }
    }
    // grouped fast HLL: per-group estimate lands in the same band as
    // the md5 grouped registers (the q198↔q167 twin contract)
    val hllRows = (1 to 6000).map(i => (i % 3L, s"v-${i % (500 + 100 * (i % 3))}"))
    val hdf = hllRows.toDF("g", "k")
    val fastBy = Sketches.hllRegistersByFast(hdf, Seq("g"), "k")
    val md5By = Sketches.hllRegistersBy(hdf, Seq("g"), "k")
    for (g <- 0L until 3L) {
      def slice(regs: org.apache.spark.sql.DataFrame) =
        regs.filter(col("g") === g).select("bucket", "rho_max")
      val truth = hllRows.filter(_._1 == g).map(_._2).distinct.size
      val ef = Sketches.hllEstimate(slice(fastBy))
      val em = Sketches.hllEstimate(slice(md5By))
      assert(math.abs(ef - truth) / truth.toDouble < 0.25, s"g=$g fast=$ef truth=$truth")
      assert(math.abs(em - truth) / truth.toDouble < 0.25, s"g=$g md5=$em truth=$truth")
    }
  }

  test("HLL grouped: each group's registers equal its own direct build") {
    val rows = (1 to 3000).map(i => (i % 5L, s"v-${i % 800}"))
    val grouped = Sketches.hllRegistersBy(rows.toDF("g", "k"),
        Seq("g"), "k")
      .orderBy("g", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    for (g <- 0L until 5L) {
      val slice = grouped.filter(_._1 == g).map(t => (t._2, t._3))
      val direct = Sketches.hllRegisters(
          rows.filter(_._1 == g).map(_._2).toDF("k"), "k")
        .orderBy("bucket").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(slice == direct, s"group $g")
    }
  }

  test("CMS grouped: each group's matrix equals its own direct build") {
    val rows = (1 to 2000).map(i => (i % 3L, (i * 7 % 40).toLong))
    val grouped = Sketches.cmsSketchBy(rows.toDF("g", "k"), Seq("g"),
        "k", depth = 2, width = 32)
      .orderBy("g", "r", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSeq
    for (g <- 0L until 3L) {
      val slice = grouped.filter(_._1 == g).map(t => (t._2, t._3, t._4))
      val direct = Sketches.cmsSketch(
          rows.filter(_._1 == g).map(_._2).toDF("k"), "k",
          depth = 2, width = 32)
        .orderBy("r", "pos").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
      assert(slice == direct, s"group $g")
    }
  }

  test("hist grouped: each group's bins equal its own direct build") {
    val rows = (1 to 2000).map(i => (i % 3L, (i * 37 % 1000).toLong))
    val grouped = Sketches.histSketchBy(rows.toDF("g", "v"),
        Seq("g"), "v", lo = 0L, hi = 1000L, bins = 16)
      .orderBy("g", "bin").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    for (g <- 0L until 3L) {
      val slice = grouped.filter(_._1 == g).map(t => (t._2, t._3))
      val direct = Sketches.histSketch(
          rows.filter(_._1 == g).map(_._2).toDF("v"), "v",
          lo = 0L, hi = 1000L, bins = 16)
        .orderBy("bin").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(slice == direct, s"group $g")
    }
  }

  test("CMS: never undercounts, exact when collision-free, merge ≡ rebuild") {
    // 2000 occurrences over 20 keys with known skewed frequencies
    val occ = (1 to 20).flatMap(k => Seq.fill(k * 10)(s"key-$k")).toDF("k")
    val sk = Sketches.cmsSketch(occ, "k")
    val est = Sketches.cmsEstimate(sk, occ, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 20).foreach { k =>
      assert(est(s"key-$k") >= k * 10L, s"undercount at key-$k")
    }
    // depth 4 × width 256 with 20 keys: whp no key collides in all 4
    // rows, so estimates should be exact here (deterministic hashes —
    // this either always holds or never does)
    assert((1 to 20).count(k => est(s"key-$k") == k * 10L) == 20)
    // merge of an arbitrary split rebuilds the matrix cell-for-cell
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("r", "pos").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val merged = Sketches.cmsMerge(
      Sketches.cmsSketch(occ.filter($"k".endsWith("3")), "k"),
      Sketches.cmsSketch(occ.filter(!$"k".endsWith("3")), "k"))
    assert(cells(merged) == cells(sk))
  }

  test("histogram: bins partition the count, clamp edges, merge ≡ rebuild") {
    val vals = ((1L to 1000L) ++ Seq(-50L, 99999L)).toDF("v") // 2 outliers
    val h = Sketches.histSketch(vals, "v", lo = 0L, hi = 1000L, bins = 10)
    val m = h.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m.values.sum == 1002L)            // nothing dropped
    assert(m(0) == 99L + 1)                  // 1..99 + the low outlier
    assert(m(9) == 100L + 2)                 // 900..999 + clamped 1000 + high outlier
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("bin").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val merged = Sketches.histMerge(
      Sketches.histSketch(vals.filter($"v" % 7 === 0), "v", 0L, 1000L, 10),
      Sketches.histSketch(vals.filter($"v" % 7 =!= 0), "v", 0L, 1000L, 10))
    assert(cells(merged) == cells(h))
  }

  test("histogram quantiles: the exact disc-quantile lands inside its bin") {
    val vals = (1L to 10000L).map(i => (i * i) % 7919L).toDF("v")
    val lo = 0L; val hi = 7919L; val bins = 64
    val h = Sketches.histSketch(vals, "v", lo, hi, bins)
    val qs = Sketches.histQuantileBins(h, lo, hi, bins, Seq(500, 900, 990))
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3))).toMap
    val sorted = vals.orderBy("v").collect().map(_.getLong(0))
    Seq(500, 900, 990).foreach { p =>
      val exact = sorted(((p.toLong * sorted.length + 999) / 1000 - 1).toInt)
      val (qlo, qhi) = qs(p)
      assert(exact >= qlo && exact < qhi,
        s"p=$p exact=$exact outside [$qlo,$qhi)")
    }
  }

  test("fuzzyJoin: complete vs brute force across the tiny/gram boundary") {
    import graft.ops.Relational
    // deterministic low-entropy strings, lengths 2..12 straddling the
    // q=3,d=1 completeness bound (7) and the tiny cut (8) — the worst
    // shapes for a candidate filter to silently drop
    val alpha = "abcd"
    def mk(seed: Int): String = {
      val len = 2 + (seed * 7919) % 11
      (0 until len).map(i => alpha((seed * 31 + i * 17) % 4)).mkString
    }
    val ls = (0 until 40).map(i => (i.toLong, mk(i)))
    val rs = (0 until 40).map { i =>
      val s = mk(i + 13)
      val mut = if (i % 3 == 0 && s.length > 2)
        s.updated(s.length / 2, 'z') else s
      (100L + i, mut)
    }
    val got = Relational.fuzzyJoin(
        ls.toDF("lid", "lstr"), "lid", "lstr",
        rs.toDF("rid", "rstr"), "rid", "rstr", q = 3, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (li, lstr) <- ls; (ri, rstr) <- rs
      dist = lev(lstr, rstr) if dist <= 1
    } yield (li, ri, dist)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty) // the differential actually exercised matches
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

  test("extractText: script/style/noscript BODIES are removed (r19), " +
      "case-insensitive and multiline; unclosed element keeps text") {
    import spark.implicits._
    val html = Seq((1L,
      "<html><head><style>p{color:red}</style>" +
        "<SCRIPT type=\"text/javascript\">var x = 1;\nalert(x);</SCRIPT>" +
        "</head><body><p>keep A</p><noscript>enable js</noscript>" +
        "<p>keep B</p></body></html>"),
      (2L, "<p>before</p><script>tail stays"))
      .toDF("id", "html")
    val out = WebExtract.extractText(html, "id", "html")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "keep A keep B")
    assert(!out(1L).contains("color") && !out(1L).contains("alert") &&
      !out(1L).contains("enable"))
    // unclosed script: the close tag anchors the match, so the tail
    // survives as text (documented conservative reading)
    assert(out(2L) == "before tail stays")
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

  // --- URL canonicalization (r18) ---

  private def canon(urls: (Long, String)*): Map[Long, (Boolean, String,
      String, String, String, Option[Int], String)] =
    WebExtract.canonicalizeUrls(urls.toDF("id", "url"), "id", "url")
      .collect().map { r =>
        r.getLong(0) -> ((r.getBoolean(1),
          if (r.isNullAt(2)) null else r.getString(2),
          if (r.isNullAt(3)) null else r.getString(3),
          if (r.isNullAt(4)) null else r.getString(4),
          if (r.isNullAt(5)) null else r.getString(5),
          if (r.isNullAt(6)) None else Some(r.getInt(6)),
          if (r.isNullAt(7)) null else r.getString(7)))
      }.toMap

  test("canonicalizeUrls: case, userinfo, default port, tracking " +
      "params, sort, fragment — the full rule set on hand cases") {
    val m = canon(
      1L -> "HTTP://User:Pw@WWW.Example.COM:80/Path/Sub?utm_source=a&b=2&a=1#frag",
      2L -> "https://shop.example.co.uk:8443/",
      3L -> "https://Example.com:443?x=1",
      4L -> "ftp://Files.Example.org",
      5L -> "http://10.0.0.1:8080/a",
      6L -> "http://localhost/x",
      7L -> "http://a.com/p?utm_source=1&fbclid=2")
    assert(m(1L) == ((true, null,
      "http://www.example.com/Path/Sub?a=1&b=2",
      "http", "www.example.com", None, "example.com")))
    assert(m(2L) == ((true, null, "https://shop.example.co.uk:8443/",
      "https", "shop.example.co.uk", Some(8443), "example.co.uk")))
    // empty path -> "/", default https port stripped
    assert(m(3L) == ((true, null, "https://example.com/?x=1",
      "https", "example.com", None, "example.com")))
    // no default-port rule for ftp; single-suffix host
    assert(m(4L) == ((true, null, "ftp://files.example.org/",
      "ftp", "files.example.org", None, "example.org")))
    // IP hosts are their own registrable key
    assert(m(5L) == ((true, null, "http://10.0.0.1:8080/a",
      "http", "10.0.0.1", Some(8080), "10.0.0.1")))
    // single-label host falls back to itself
    assert(m(6L)._7 == "localhost")
    // tracking-only query loses the '?' entirely
    assert(m(7L)._3 == "http://a.com/p")
  }

  test("canonicalizeUrls: a crafted 12-digit port never ANSI-throws — " +
      "typed port null, canonical string keeps it verbatim") {
    val m = canon(8L -> "http://h.com:999999999999/p")
    assert(m(8L)._1 && m(8L)._6.isEmpty &&
      m(8L)._3 == "http://h.com:999999999999/p")
  }

  test("canonicalizeUrls: dead lanes — schemeless, empty host, null") {
    val m = canon(1L -> "relative/path", 2L -> "//nohost/path",
      3L -> "http:///path", 4L -> null)
    assert(!m(1L)._1 && m(1L)._2 == "no_scheme" && m(1L)._3 == null)
    assert(!m(2L)._1 && m(2L)._2 == "no_scheme")
    assert(!m(3L)._1 && m(3L)._2 == "no_host")
    assert(!m(4L)._1 && m(4L)._2 == "no_scheme")
  }

  test("canonicalizeUrls: percent-encoding normalization (r19) — " +
      "unreserved escapes decode, surviving hex uppercases in path, " +
      "reserved escapes never decode, malformed passes through") {
    val m = canon(
      1L -> "http://EX%41MPLE.com/%7Euser/a",   // %41='A' host, %7E='~'
      2L -> "http://example.com/a%2fb",         // %2F reserved: kept, uppercased
      3L -> "http://example.com/p%2541",        // %25='%' NOT unreserved: no double-decode
      4L -> "http://example.com/x%4",           // malformed: verbatim
      5L -> "http://example.com/%61%2E%5F%2D",  // a . _ - all unreserved
      6L -> "http://example.com/q?v=%41")       // query values stay verbatim
    assert(m(1L)._5 == "example.com" &&
      m(1L)._3 == "http://example.com/~user/a")
    assert(m(2L)._3 == "http://example.com/a%2Fb")
    assert(m(3L)._3 == "http://example.com/p%2541")
    assert(m(4L)._3 == "http://example.com/x%4")
    assert(m(5L)._3 == "http://example.com/a._-")
    assert(m(6L)._3 == "http://example.com/q?v=%41")
  }

  test("registeredDomain: expanded public-suffix snapshot (r19) — " +
      "gov.br/co.il/go.jp-class suffixes keep three labels, unknown " +
      "tails fall back to two") {
    val m = canon(
      1L -> "http://www.city.gov.br/x",
      2L -> "http://news.haaretz.co.il/x",
      3L -> "http://www.metro.tokyo.lg.jp/x",
      4L -> "http://portal.diputados.gob.mx/x",
      5L -> "http://shop.example.com.ng/x",
      6L -> "http://dept.univ.ac.kr/x",
      7L -> "http://foo.bar.unknowntld/x") // not in snapshot: 2-label
    assert(m(1L)._7 == "city.gov.br")
    assert(m(2L)._7 == "haaretz.co.il")
    assert(m(3L)._7 == "tokyo.lg.jp")
    assert(m(4L)._7 == "diputados.gob.mx")
    assert(m(5L)._7 == "example.com.ng")
    assert(m(6L)._7 == "univ.ac.kr")
    assert(m(7L)._7 == "bar.unknowntld")
  }

  test("urlDupGroups: percent-variant twins collapse (r19)") {
    val urls = Seq(
      1L -> "http://a.com/pa/B",
      2L -> "http://a.com/p%61/B",   // %61='a' -> same canonical path
      3L -> "http://%61.com/pa/B",   // host escape -> same canonical host
      4L -> "http://a.com/p%2Fb",    // reserved escape: distinct path
      5L -> "http://a.com/p%2fb")    // …but hex case still collapses
    val out = WebExtract.urlDupGroups(
        WebExtract.canonicalizeUrls(urls.toDF("id", "url"), "id", "url"),
        "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      ("http://a.com/p%2Fb", 4L, 2L),
      ("http://a.com/pa/B", 1L, 3L)))
  }

  test("parseRobots (r19): groups, multi-agent lines, comments, CRLF, " +
      "empty Disallow, ignored directives, user-agent after rules " +
      "starts a new group") {
    import spark.implicits._
    val txt = "# hi\r\nUSER-AGENT: *\nDisallow: /a # tail comment\n" +
      "Crawl-delay: 7\nAllow: /a/b\n\nUser-agent: BotA\n" +
      "user-agent: botb\nDisallow:\nDisallow: /c\n" +
      "User-agent: late\nDisallow: /d\n"
    val out = WebExtract.parseRobots(
        Seq(("h1", txt)).toDF("host", "robots"), "host", "robots")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3),
        r.getBoolean(4), r.getString(5))).sortBy(_._3)
    assert(out.toSeq == Seq(
      (0, "*", 0, false, "/a"),
      (0, "*", 1, true, "/a/b"),
      (1, "bota;botb", 2, false, ""),
      (1, "bota;botb", 3, false, "/c"),
      (2, "late", 4, false, "/d")))
  }

  test("robotsDecide (r19): longest match wins, Allow wins ties, " +
      "specific group SHADOWS the wildcard, empty pattern matches " +
      "nothing, no rules / no robots -> allowed") {
    import spark.implicits._
    val robots = Seq(
      ("h1", "User-agent: *\nDisallow: /x\nAllow: /x/ok\n" +
        "User-agent: me\nDisallow: /y\nDisallow:\n" +
        "Allow: /y/a\nDisallow: /y/a\n"),
      ("h2", "User-agent: *\nDisallow: /\n"))
      .toDF("host", "robots")
    val rules = WebExtract.parseRobots(robots, "host", "robots")
    val urls = Seq(
      (1L, "h1", "/x/anything"),   // wildcard shadowed -> allowed
      (2L, "h1", "/y/deep"),       // specific group: disallowed
      (3L, "h1", "/y/a/file"),     // tie /y/a vs /y/a: Allow wins
      (4L, "h1", "/z"),            // no match -> allowed
      (5L, "h2", "/anything"),     // '/' disallows everything
      (6L, "h3", "/no/robots"))    // host without robots -> allowed
      .toDF("id", "host", "path")
    val out = WebExtract.robotsDecide(urls, "id", rules, "ME")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(3),
          if (r.isNullAt(4)) null else r.getString(4)))).toMap
    assert(out(1L) == ((true, null)))
    assert(out(2L) == ((false, "/y")))
    assert(out(3L) == ((true, "/y/a")))
    assert(out(4L) == ((true, null)))
    assert(out(5L) == ((false, "/")))
    assert(out(6L) == ((true, null)))
  }

  test("urlDupGroups: crawl-noise variants collapse to one canonical " +
      "key, distinct URLs never group") {
    val urls = Seq(
      1L -> "http://A.com/x?b=1&a=2#f",
      2L -> "HTTP://a.com:80/x?a=2&b=1",
      3L -> "http://a.com/x?a=2&utm_medium=m&b=1",
      4L -> "http://a.com/y",
      5L -> "https://a.com/x?a=2&b=1") // scheme differs: NOT a dup
    val out = WebExtract.urlDupGroups(
        WebExtract.canonicalizeUrls(urls.toDF("id", "url"), "id", "url"),
        "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("http://a.com/x?a=2&b=1", 1L, 3L)))
  }

  test("r19 expression parity: PctNormalizeExpr ≡ the column-form " +
      "pctNormalizeFull, RegisteredDomainExpr ≡ the literal-array " +
      "label algebra, over the crafted rule matrix + byte soup") {
    // the optimization swapped the built-in-function trees for single
    // codegen expressions; this pins the swap output-identical
    val crafted = Seq(
      "", "%", "%%", "a%", "%4", "%41", "%41%42", "x%2fY", "%2F",
      "%25 41", "%2541", "%7e", "%7E~", "%zz", "%4g", "a%61b%2Ec",
      "no-escapes-here", "%genuinely%bad%", "%0a", "%FF", "%ff0",
      "tr%C3%A4ils", "%2e%2E.", "a%2db-c%5Fd", "pct%20space")
    val soup = (1 to 200).map { i =>
      val r = new scala.util.Random(i)
      (1 to r.nextInt(20)).map(_ =>
        "ab%AF014fg.:/?#&=~_-".charAt(r.nextInt(20))).mkString
    }
    val in = (crafted ++ soup).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val both = in.select(col("id"),
      graft.functions.urlfns.pct_normalize(col("s")).as("expr_out"),
      WebExtract.pctNormalizeFull(col("s")).as("col_out"))
      .collect()
    both.foreach(r => assert(r.get(1) == r.get(2),
      s"pct mismatch on id ${r.getLong(0)}: ${r.get(1)} vs ${r.get(2)}"))

    val hosts = Seq("example.com", "www.example.co.uk", "a.b.c.gov.br",
      "localhost", "10.0.0.1", "1.2.3.4.5", "x.", ".x", "..",
      "single", "deep.sub.domain.example.ac.jp", "co.uk", "uk",
      "shop.example.com.ng", "weird..double", "ends.with.dot.")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "h")
    val suffixArr = array(WebExtract.PublicSuffixSnapshot.map(lit): _*)
    val labels = split(col("h"), "\\.")
    val lastTwo = concat(try_element_at(labels, lit(-2)), lit("."),
      try_element_at(labels, lit(-1)))
    val oldForm = when(col("h").rlike("^[0-9.]+$"), col("h"))
      .when(size(labels) >= 3 && array_contains(suffixArr, lastTwo),
        concat(try_element_at(labels, lit(-3)), lit("."), lastTwo))
      .when(size(labels) >= 2, lastTwo)
      .otherwise(col("h"))
    val rd = hosts.select(col("id"),
      graft.functions.urlfns.registered_domain(col("h"),
        WebExtract.PublicSuffixSnapshot).as("expr_out"),
      oldForm.as("col_out")).collect()
    rd.foreach(r => assert(r.get(1) == r.get(2),
      s"rd mismatch on id ${r.getLong(0)}: ${r.get(1)} vs ${r.get(2)}"))
  }
}
