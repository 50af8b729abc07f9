package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.parsers.dec2
import QuerySpec.table

/** Batch 8: unpivot (long form), second-moment statistics computed
  * from exact decimal sums (so stddev/corr agree bit-for-bit with the
  * oracle — naive streaming stddev would not), and the scalar string
  * function surface. */
object ExtrasQueries {

  val all: Seq[QuerySpec] = Seq(

    // Unpivot three measures to long form, then aggregate per measure.
    QuerySpec("q50_unpivot",
      (s, dir) => table(s, dir, "lineitem")
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "val")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("val"))).cast("double").as("total"))
        .orderBy(col("measure")),
      Some("""SELECT measure, COUNT(*) AS n,
        |  CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem)
        |GROUP BY measure ORDER BY measure""".stripMargin)),

    // stddev/corr from exact decimal moments: sum, sum of squares and
    // cross products are exact decimals; the final double formula is
    // written identically on both sides so the FP ops match 1:1.
    QuerySpec("q51_moment_stats",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val n = count(lit(1)).cast("double")
        val sx = sum(dec2(col("l_quantity"))).cast("double")
        val sxx = sum(dec2(col("l_quantity")) * dec2(col("l_quantity"))).cast("double")
        val sy = sum(dec2(col("l_extendedprice"))).cast("double")
        val syy = sum(dec2(col("l_extendedprice")) * dec2(col("l_extendedprice"))).cast("double")
        val sxy = sum(dec2(col("l_quantity")) * dec2(col("l_extendedprice"))).cast("double")
        li.groupBy(col("l_returnflag"))
          .agg(n.as("nd"), sx.as("sx"), sxx.as("sxx"), sy.as("sy"),
            syy.as("syy"), sxy.as("sxy"))
          .select(col("l_returnflag"),
            col("nd").cast("long").as("n"),
            // integer nano-units, NOT round(…, 9): round() itself is
            // engine-divergent (Spark routes doubles through
            // BigDecimal HALF_UP on the exact binary value, DuckDB
            // rounds in floating point), so a value near a 9th-decimal
            // boundary could round to different doubles even from
            // identical inputs (ADVICE r9). floor(x*1e9 + 0.5) is the
            // same three IEEE ops on both engines — the only residual
            // risk is a 1-ulp input difference landing exactly on an
            // integer boundary, strictly rarer than round()'s
            // implementation gap.
            floor(col("sx") / col("nd") * 1e9 + 0.5).cast("long")
              .as("mean_qty_nano"),
            floor(sqrt((col("sxx") - col("sx") * col("sx") / col("nd")) / (col("nd") - 1)) * 1e9 + 0.5)
              .cast("long").as("stddev_qty_nano"),
            floor((col("sxy") - col("sx") * col("sy") / col("nd")) /
              (sqrt(col("sxx") - col("sx") * col("sx") / col("nd")) *
               sqrt(col("syy") - col("sy") * col("sy") / col("nd"))) * 1e9 + 0.5)
              .cast("long").as("corr_qty_price_nano"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH m AS (SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS nd,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(nd AS BIGINT) AS n,
        |  CAST(floor(sx / nd * 1e9 + 0.5) AS BIGINT) AS mean_qty_nano,
        |  CAST(floor(sqrt((sxx - sx * sx / nd) / (nd - 1)) * 1e9 + 0.5)
        |    AS BIGINT) AS stddev_qty_nano,
        |  CAST(floor((sxy - sx * sy / nd) /
        |      (sqrt(sxx - sx * sx / nd) * sqrt(syy - sy * sy / nd))
        |      * 1e9 + 0.5) AS BIGINT) AS corr_qty_price_nano
        |FROM m ORDER BY l_returnflag""".stripMargin)),

    // Scalar string surface: case, substring, replace, reverse,
    // translate, repeat, edit distance — all exact.
    QuerySpec("q52_string_funcs",
      (s, dir) => table(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("u"),
          substring(col("p_name"), 1, 5).as("pre"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("novowel"),
          reverse(col("p_name")).as("rev"),
          translate(col("p_name"), "abc", "xyz").as("tr"),
          repeat(col("p_brand"), 2).as("rep"),
          length(col("p_name")).as("len"),
          levenshtein(col("p_name"), col("p_type")).as("lev"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(p_name) AS u, substr(p_name, 1, 5) AS pre,
        |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS novowel,
        |  reverse(p_name) AS rev, translate(p_name, 'abc', 'xyz') AS tr,
        |  repeat(p_brand, 2) AS rep, length(p_name) AS len,
        |  levenshtein(p_name, p_type) AS lev
        |FROM part ORDER BY p_partkey""".stripMargin)),

    // Link-graph PageRank (the Common-Crawl-style host-quality prior
    // a web-corpus curation pipeline weights documents by): 3 fixed
    // iterations of the integer micro-unit update over the
    // supplier→customer graph induced by lineitem⋈orders. Every step
    // is integer floor arithmetic, so the oracle unrolls the whole
    // run (the kmeansMicro discipline applied to graph iteration).
    // Graph shape: bipartite here (customers are all dangling) — the
    // operator's generality is spec-tested on a cyclic hand graph.
    QuerySpec("q125_pagerank",
      (s, dir) => {
        val edges = table(s, dir, "lineitem")
          .filter(col("l_orderkey") % 4 === 0)
          .join(table(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("src"), col("o_custkey").as("dst"))
        graft.ops.Graph.pageRankMicro(edges, "src", "dst", iters = 3)
          .orderBy(col("id"))
      },
      Some {
        def iter(i: Int, prev: String): String =
          s"""m$i AS (SELECT e.dst AS id, SUM(r.rank_micro // d.deg) AS m
             |  FROM e JOIN $prev r ON r.id = e.src
             |  JOIN dg d ON d.src = e.src GROUP BY 1),
             |r$i AS (SELECT n.id,
             |    CAST(150000 + (85 * COALESCE(m$i.m, 0)) // 100 AS BIGINT)
             |      AS rank_micro
             |  FROM n LEFT JOIN m$i USING (id))""".stripMargin
        s"""WITH e AS (SELECT DISTINCT l_suppkey AS src, o_custkey AS dst
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  WHERE l_orderkey % 4 = 0),
           |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
           |dg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
           |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank_micro FROM n),
           |${(1 to 3).map(i => iter(i, s"r${i - 1}")).mkString(",\n")}
           |SELECT id, rank_micro FROM r3 ORDER BY id""".stripMargin
      })
  )
}
