package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.geo.{geofunctions, CollapseRedundantGeoCast, GraftExtensions, StCastTo}

/** SparkSessionExtensions wiring + the cast-collapse optimizer rule. */
class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("CollapseRedundantGeoCast removes the idempotent outer promote") {
    val df = Seq("POLYGON ((0 0, 1 0, 1 1, 0 0))").toDF("wkt")
      .select(geofunctions.st_castto(
        geofunctions.st_castto($"wkt", "MULTIPOLYGON"), "MULTIPOLYGON").as("g"))
    val before = df.queryExecution.analyzed
    val after = CollapseRedundantGeoCast(before)
    def countCasts(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = {
      var n = 0
      p.transformAllExpressions { case c: StCastTo => n += 1; c }
      n
    }
    assert(countCasts(before) == 2)
    assert(countCasts(after) == 1)
    // semantics preserved
    assert(df.as[String].head() == "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
    // different targets must NOT collapse
    val mixed = Seq("POINT (1 2)").toDF("wkt")
      .select(geofunctions.st_castto(
        geofunctions.st_castto($"wkt", "MULTIPOINT"), "MULTIPOLYGON").as("g"))
    assert(countCasts(CollapseRedundantGeoCast(mixed.queryExecution.analyzed)) == 2)
  }

  test("GraftExtensions injects SQL functions and the rule into a session") {
    // the shared suite session exists; build a sibling session (same
    // SparkContext) that applies the extensions
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = ext.sql(
        "SELECT st_geometrytype('POINT (1 2)') AS t, st_npoints('LINESTRING (0 0, 1 1)') AS n")
        .collect().head
      assert(r.getString(0) == "POINT" && r.getInt(1) == 2)
      // the sketch/text surface is SQL-callable too
      val s = ext.sql("""SELECT
        |  vec_dist2_long(array(1L, 2L), array(4L, 6L)) AS d,
        |  fingerprint64('ab') AS fp,
        |  avg_token_len('ab cdef') AS atl,
        |  size(shingle_set('a b c', 2)) AS nsh,
        |  create_ids('X|Y', '1|2') AS ids""".stripMargin).collect().head
      assert(s.getLong(0) == 9 + 16)
      assert(s.getLong(1) == (97L * 31 + 98) % 1000000007L)
      assert(s.getDouble(2) == 3.0)
      assert(s.getInt(3) == 2)
      assert(s.getSeq[String](4) == Seq("X_001", "Y_002"))
      // integral literal widths all resolve (BIGINT cast included) …
      val big = ext.sql(
        "SELECT size(shingle_set('a b c', CAST(2 AS BIGINT))) AS n")
        .collect().head
      assert(big.getInt(0) == 2)
      // … and a non-foldable second argument raises a CLEAR analysis
      // error, not a ClassCastException
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        ext.sql(
          "SELECT shingle_set(t, length(t)) FROM VALUES ('ab') v(t)").collect()
      }
      assert(err.getMessage.contains("foldable integer literal"))
      // rule is active in the optimizer pipeline (parquet-backed input:
      // a local literal would be constant-folded away entirely)
      val df = ext.read.parquet(s"$sf0001/documents.parquet")
        .select(geofunctions.st_castto(
          geofunctions.st_castto(col("text"), "MULTIPOLYGON"), "MULTIPOLYGON").as("g"))
      var n = 0
      df.queryExecution.optimizedPlan.transformAllExpressions {
        case c: StCastTo => n += 1; c
      }
      assert(n == 1)
      // the summary-rewrite rule is injected too: register a summary
      // for lineitem, and the exact-shape rollup reads the state
      // instead of the fact (answers proven equal to raw recompute)
      import graft.ops.IncrementalAgg
      import graft.plans.SummaryRegistry
      val keys = Seq("l_returnflag", "l_linestatus", "l_suppkey")
      val stateDir = java.nio.file.Files
        .createTempDirectory("graft_ext_summary").toString
      IncrementalAgg.aggState(
          ext.read.parquet(s"$sf0001/lineitem.parquet"),
          keys, Seq("l_quantity"), Nil, Nil)
        .write.mode("overwrite").parquet(s"$stateDir/state")
      SummaryRegistry.register(s"$sf0001/lineitem.parquet",
        SummaryRegistry.SummarySpec(s"$stateDir/state", keys,
          Seq("l_quantity"), Nil, Nil))
      try {
        val rolled = ext.read.parquet(s"$sf0001/lineitem.parquet")
          .groupBy(keys.map(col): _*)
          .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"),
            org.apache.spark.sql.functions.sum(
              col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("sq"))
        val p = rolled.queryExecution.executedPlan.toString
        assert(p.contains("graft_ext_summary") &&
          !p.contains("lineitem.parquet"),
          "injected summary rewrite did not fire")
        val viaState = rolled.orderBy(keys.map(col): _*)
          .collect().map(_.toString).toSeq
        SummaryRegistry.clear()
        val raw = ext.read.parquet(s"$sf0001/lineitem.parquet")
          .groupBy(keys.map(col): _*)
          .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"),
            org.apache.spark.sql.functions.sum(
              col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("sq"))
          .orderBy(keys.map(col): _*)
          .collect().map(_.toString).toSeq
        assert(viaState == raw)
      } finally SummaryRegistry.clear()
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
