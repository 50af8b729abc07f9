package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Temporal

/** Property-based checks (SURVEY.md §5): merge idempotence, anti-join /
  * except equivalence, join-vs-window overlap agreement, create_id
  * ordering — over randomly generated SCD2 tables (plain ScalaCheck
  * generators driven by a fixed-seed loop; the scalatestplus bridge is
  * not among the build's pinned deps). */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic sampler: n samples from gen, seeds 0..n-1. */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => gen(Gen.Parameters.default, Seed(i.toLong)).get)

  private def forAllSampled[A](gen: Gen[A], n: Int = 15)(body: A => Unit): Unit =
    samples(gen, n).foreach(body)

  private def forAllSampled2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 15)(
      body: (A, B) => Unit): Unit =
    samples(ga, n).zip(samples(gb.map(identity), n).reverse)
      .foreach { case (a, b) => body(a, b) }

  private case class Ver(identificatie: String, volgnummer: Int,
      beginDay: Int, lenDays: Option[Int], naam: String)

  private val genVer: Gen[Ver] = for {
    k <- Gen.oneOf("A", "B", "C", "D")
    vn <- Gen.choose(1, 5)
    b <- Gen.choose(0, 100)
    len <- Gen.option(Gen.choose(0, 50))
    n <- Gen.oneOf("x", "y", "z")
  } yield Ver(k, vn, b, len, n)

  private val genTable: Gen[List[Ver]] =
    Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, genVer))

  private def toDf(vs: List[Ver]): DataFrame = {
    val rows = vs.map(v => (s"${v.identificatie}_${"%03d".format(v.volgnummer)}",
      v.identificatie, v.volgnummer,
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.beginDay.toLong)),
      v.lenDays.map(l => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay((v.beginDay + l).toLong))).orNull,
      v.naam))
    // dedupe on id like a staged table would be
    rows.groupBy(_._1).map(_._2.head).toSeq
      .toDF("id", "identificatie", "volgnummer",
        "begin_geldigheid", "eind_geldigheid", "naam")
  }

  test("property: mergeScd2 is idempotent and preserves all live ids") {
    forAllSampled2(genTable, genTable, 10) { (liveL, stagedL) =>
      val live = toDf(liveL)
      val staged = toDf(stagedL)
      val once = Temporal.mergeScd2(live, staged, "id")
      val twice = Temporal.mergeScd2(once, staged, "id")
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
      // no live id ever disappears; every staged id is present
      assert(live.select("id").exceptAll(once.select("id")).isEmpty)
      assert(staged.select("id").exceptAll(once.select("id")).isEmpty)
    }
  }

  test("property: insertNew == except on ids; detectDeleted dual") {
    forAllSampled2(genTable, genTable, 10) { (liveL, stagedL) =>
      val live = toDf(liveL)
      val staged = toDf(stagedL)
      val viaAnti = Temporal.insertNew(staged, live, "id")
        .select("id").as[String].collect().sorted.toSeq
      val viaExcept = staged.select("id").except(live.select("id"))
        .as[String].collect().sorted.toSeq
      assert(viaAnti == viaExcept)
      val del = Temporal.detectDeleted(live, staged, "id")
        .select("id").as[String].collect().sorted.toSeq
      val delExcept = live.select("id").except(staged.select("id"))
        .as[String].collect().sorted.toSeq
      assert(del == delExcept)
    }
  }

  test("property: overlap join form and window form flag the same keys") {
    forAllSampled(genTable) { vsL =>
      val df = toDf(vsL)
      val joinKeys = Temporal.overlapPairsJoin(df)
        .select($"identificatie").distinct().as[String].collect().toSet
      val winKeys = Temporal.overlapsWindow(df)
        .select($"identificatie").distinct().as[String].collect().toSet
      assert(winKeys == joinKeys)
    }
  }

  test("property: skewSafeJoin == plain join for any salts count") {
    import graft.ops.Relational
    val genRows = Gen.listOfN(60, for {
      k <- Gen.choose(0, 4)     // few keys -> heavy collisions
      p <- Gen.choose(0, 1000)
    } yield (k, p))
    forAllSampled2(genRows, Gen.choose(1, 9), n = 8) { (rows, salts) =>
      val probe = rows.toDF("k", "payload")
      val build = (0 to 4).map(k => (k, s"v$k")).toDF("k", "v")
      val plain = probe.join(build, "k").select($"payload", $"v")
      val salted = Relational.skewSafeJoin(probe, build, "k", "payload", salts)
        .select($"payload", $"v")
      assert(plain.exceptAll(salted).count() == 0)
      assert(salted.exceptAll(plain).count() == 0)
    }
  }

  test("property: rangeJoinBinned == naive join for random intervals and bin widths") {
    val genPts = Gen.listOfN(40, Gen.choose(0, 400))
    val genIvs = Gen.listOfN(12, for {
      s <- Gen.choose(0, 400); len <- Gen.choose(-5, 120)
    } yield (s, s + len))  // negative len -> inverted, must be dropped
    forAllSampled2(Gen.zip(genPts, genIvs), Gen.oneOf(1, 7, 30, 365), n = 8) {
      case ((pts, ivs), binDays) =>
        val epoch = java.time.LocalDate.of(1970, 1, 1)
        val p = pts.zipWithIndex
          .map { case (d, i) => (i.toLong, java.sql.Date.valueOf(epoch.plusDays(d))) }
          .toDF("pid", "pt")
        val iv = ivs.zipWithIndex.map { case ((s, e), i) =>
          (i.toLong, java.sql.Date.valueOf(epoch.plusDays(s)),
            java.sql.Date.valueOf(epoch.plusDays(e))) }
          .toDF("iid", "b", "e")
        val binned = Temporal.rangeJoinBinned(p, "pt", iv, "b", "e", binDays)
          .select($"pid", $"iid").as[(Long, Long)].collect().toSet
        val naive = p.join(iv, $"pt" >= $"b" && $"pt" <= $"e")
          .select($"pid", $"iid").as[(Long, Long)].collect().toSet
        assert(binned == naive, s"binDays=$binDays")
    }
  }

  test("property: union-find and iterative component paths agree on random graphs") {
    // the adaptive switch in nearDupComponents must be invisible:
    // whichever path runs, every node gets the min reachable id
    val genEdges: Gen[List[(Long, Long)]] = Gen.listOfN(25, for {
      a <- Gen.choose(0L, 30L)
      b <- Gen.choose(0L, 30L) if b != a
    } yield (a, b))
    forAllSampled(genEdges, n = 8) { edges =>
      if (edges.nonEmpty) {
        val pairs = edges.toDF("id_a", "id_b")
        val local = graft.ops.Dedup.nearDupComponents(pairs, "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        val dist = graft.ops.Dedup.nearDupComponents(pairs, "id_a", "id_b",
          localEdgeThreshold = 0L).as[(Long, Long)].collect().toMap
        assert(local == dist, s"paths diverged on $edges")
      }
    }
  }

  test("property: create_id lexical order == (identificatie, volgnummer) order") {
    forAllSampled(Gen.listOfN(30, genVer)) { vs =>
      val ids = vs.map(v => ((v.identificatie, v.volgnummer),
        s"${v.identificatie}_${"%03d".format(v.volgnummer)}"))
      val byTuple = ids.sortBy(_._1).map(_._2)
      val byLex = ids.map(_._2).sorted
      assert(byTuple == byLex)
    }
  }

  /** Tiny-vocabulary corpora force k-gram collisions, the interesting
    * regime for the scrub/decontamination properties. */
  private val genCorpus: Gen[List[(Long, String)]] = {
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  }

  test("property: scrubDuplicatedSpans == sequential reference on random corpora") {
    val k = 3
    def reference(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
      val toks = docs.map { case (id, t) =>
        id -> t.trim.split("\\s+").toSeq }.toMap
      val occ = for {
        (id, ts) <- toks.toSeq
        p <- 0 to ts.length - k
      } yield (id, p, ts.slice(p, p + k).mkString(" "))
      val masked: Set[(Long, Int)] = occ.groupBy(_._3).values
        .filter(_.size > 1)
        .flatMap { os =>
          val canon = os.minBy(o => (o._1, o._2))
          os.filterNot(_ == canon)
            .flatMap(o => (o._2 until o._2 + k).map(tp => (o._1, tp)))
        }.toSet
      docs.map { case (id, _) =>
        val ts = toks(id)
        val kept = ts.zipWithIndex
          .filterNot { case (_, i) => masked((id, i)) }.map(_._1)
        id -> ((ts.length.toLong, (ts.length - kept.length).toLong,
          kept.mkString(" ")))
      }.toMap
    }
    forAllSampled(genCorpus, n = 8) { docs =>
      val got = graft.ops.Dedup.scrubDuplicatedSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .as[(Long, Long, Long, String)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      assert(got == reference(docs), s"diverged on $docs")
    }
  }

  test("property: contaminationFuzzy == brute-force pair scan on random corpora") {
    val k = 2
    val threshold = 0.4
    def shingleSet(t: String): Set[String] = {
      val ts = t.trim.split("\\s+").toSeq
      (0 to ts.length - k).map(p => ts.slice(p, p + k).mkString(" ")).toSet
    }
    def reference(train: Seq[(Long, String)],
        holdout: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
      val hs = holdout.map { case (id, t) => (id, shingleSet(t)) }
        .filter(_._2.nonEmpty)
      train.flatMap { case (tid, t) =>
        val ts = shingleSet(t)
        val hits = hs.flatMap { case (hid, h) =>
          val inter = (ts & h).size
          val union = ts.size + h.size - inter
          // the engine's exact IEEE sequence: (double inter)·1e6 / union
          if (inter > 0 && inter.toDouble / union >= threshold)
            Some((hid, math.floor(inter.toDouble * 1e6 / union).toLong))
          else None
        }
        if (hits.isEmpty) None
        else Some(tid -> hits.minBy { case (hid, jm) => (-jm, hid) })
      }.toMap
    }
    forAllSampled(Gen.zip(genCorpus, genCorpus), n = 8) { case (tr0, ho0) =>
      // disjoint id spaces, like a real train/holdout split
      val train = tr0
      val holdout = ho0.map { case (id, t) => (1000L + id, t) }
      val got = graft.ops.Dedup.contaminationFuzzy(
          train.toDF("doc_id", "text"), holdout.toDF("doc_id", "text"),
          "doc_id", "text", k, threshold)
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3))).toMap
      assert(got == reference(train, holdout),
        s"diverged on train=$train holdout=$holdout")
    }
  }

  test("property: uniMax waterfilling invariants for random mixes") {
    val genMix = for {
      nSrc <- Gen.choose(1, 6)
      counts <- Gen.listOfN(nSrc, Gen.choose(1, 40))
      target <- Gen.choose(1, 120)
      epochs <- Gen.oneOf(1L, 2L)
    } yield (counts, target.toLong, epochs)
    forAllSampled(genMix, n = 12) { case (counts, target, epochs) =>
      val rows = counts.zipWithIndex.flatMap { case (n, si) =>
        (0 until n).map(i => (si * 1000L + i, s"s$si"))
      }
      val q = graft.ops.TrainingPrep.uniMaxQuotas(
          rows.toDF("doc_id", "source"), "source", target, epochs)
        .as[(String, Long, Long)].collect().toSeq
      val caps = counts.map(_.toLong * epochs)
      // every source appears once; quotas never exceed their cap
      assert(q.length == counts.length)
      q.foreach { case (s, n, quota) =>
        assert(quota >= 0 && quota <= n * epochs, s"$s quota $quota cap ${n * epochs}")
      }
      val total = q.map(_._3).sum
      assert(total <= target)
      if (caps.sum <= target) assert(total == caps.sum) // ample budget: all capped
      else assert(total >= target - (counts.length - 1)) // floor shortfall bound
    }
  }
}
