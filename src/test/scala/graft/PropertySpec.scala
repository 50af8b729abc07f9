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
}
