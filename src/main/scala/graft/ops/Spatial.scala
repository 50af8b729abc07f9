package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial distance joins by grid bucketing — the scale-safe form of
  * "find all pairs within radius r": bucket points into r×r grid
  * cells, probe each point against its 3×3 cell neighborhood, and
  * verify with exact integer squared distance. The pair space is
  * bounded by cell occupancy (density × r²), never n² — a planet-
  * scale point set joins at keyed-equi-join speed, and a hot cell is
  * an ordinary skew key (AQE/salting territory), not a plan change.
  * Same move as the LSH band / shingle bucket / IVF cell joins
  * elsewhere in the engine: candidate generation is ALWAYS keyed. */
object Spatial {

  /** Deterministic integer coordinate in [0, modulus) from a key —
    * the repo-wide portable-hash idiom (md5, domain-separated), so
    * the oracle derives identical points:
    * `CAST(('0x' || substr(md5(prefix || k), 1, 6)) AS BIGINT) % m`. */
  def hashCoord(prefix: String, key: Column, modulus: Int): Column =
    conv(substring(md5(concat(lit(prefix), key.cast("string"))), 1, 6),
      16, 10).cast("long") % modulus

  /** All unordered point pairs within `radius` (inclusive, by squared
    * integer distance): grid cell = (x div r, y div r); the probe
    * side explodes to its 9 neighbor cells, the build side is keyed
    * by its own cell, so every qualifying pair meets on exactly one
    * cell key and the `a < b` guard keeps exactly one orientation.
    * Output: (a, b, dist2). */
  def distanceJoin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long): DataFrame = {
    require(radius >= 1)
    val pts = points.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val withCell = pts
      .withColumn("cx", expr(s"x div ${radius}L"))
      .withColumn("cy", expr(s"y div ${radius}L"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val probe = withCell
      .select(col("id").as("a"), col("x").as("ax"), col("y").as("ay"),
        col("cx"), col("cy"), explode(offsets).as("__o"))
      .select(col("a"), col("ax"), col("ay"),
        (col("cx") + col("__o.dx")).as("cx"),
        (col("cy") + col("__o.dy")).as("cy"))
    val build = withCell.select(col("id").as("b"), col("x").as("bx"),
      col("y").as("by"), col("cx"), col("cy"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    probe.join(build, Seq("cx", "cy"))
      .filter(col("a") < col("b") && d2 <= lit(radius * radius))
      .select(col("a"), col("b"), d2.as("dist2"))
  }
}
