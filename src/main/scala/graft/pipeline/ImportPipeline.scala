package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.parsers
import graft.geo.geofunctions
import graft.model.{FkSpec, TableSpec}
import graft.ops.{Relational, Temporal, VersionedCols}
import graft.sources.CsvSource

/** The reference's entity-import lifecycle (SURVEY.md §3.2:
  * load → clean/validate → stage → validate-set → merge → commit),
  * re-expressed as one generic, spec-driven Spark pipeline
  * (/root/reference/src/dso_import/bagh/batch.py:45-137, 154-240).
  *
  * Differences by design:
  *  - per-row log lines become dead-letter DataFrames with reasons (P7)
  *  - the merge is a snapshot rewrite committed via temp-dir + atomic
  *    rename (§7.4.3) instead of an in-place SQL transaction
  *  - FK domains are joins, not driver RAM sets — they scale past memory
  */
object ImportPipeline {

  /** Validation outcome: `errors` abort before any write (reference:
    * ValueError before merge, bagh/batch.py:109-110); `warnings` (the
    * overlap check, :269-272) do not. */
  case class ValidationReport(errors: Seq[String], warnings: Seq[String]) {
    def failed: Boolean = errors.nonEmpty
  }

  case class ImportResult(
      merged: DataFrame,
      rejected: DataFrame,
      report: ValidationReport,
      inserted: Long, updated: Long)

  private val v = VersionedCols()

  /** Clean one raw (all-string) frame per the reference row pipeline
    * (P1-P7): rename, parse temporal block, synthesize id, filter
    * invalid ranges, validate geometry, apply extra columns, run FK
    * checks. Returns (clean, rejected-with-reason). */
  def clean(raw: DataFrame, spec: TableSpec,
      parents: Map[String, DataFrame]): (DataFrame, DataFrame) = {
    // P1 projection + rename (backticks: GOB headers contain ':' and '.')
    val renamed = raw.select(spec.sourceCols.map { case (s, t) => col(s"`$s`").as(t) }: _*)
    // temporal block parse (§3.2 step 2; bagh/batch.py:155-173)
    val typed = renamed
      .withColumn("volgnummer", col("volgnummer").cast("int"))
      .withColumn("registratiedatum", parsers.parseDateTime(col("registratiedatum")))
      .withColumn(v.begin, parsers.parseDate(col(v.begin)))
      .withColumn(v.eind, parsers.parseDate(col(v.eind)))
      .withColumn("id", parsers.createId(col(v.identificatie), col("volgnummer")))
    // P3 validity-range filter
    val badRange = typed.filter(!parsers.isValidDateRange(col(v.begin), col(v.eind)))
      .select(col("id"), lit("invalid_date_range").as("reject_reason"))
    val rangeOk = typed.filter(parsers.isValidDateRange(col(v.begin), col(v.eind)))
    // P4 geometry validate/promote: null WKT passes (warned upstream),
    // unparseable or unpromotable → reject
    val (geomOk, badGeom) = spec.geometry match {
      case Some(g) =>
        val cast = geofunctions.st_castto(col(g.col), g.targetType)
        // SRID contract (bagh_create.sql:37 geometry(...,28992)): EWKT
        // declaring a different SRID is a reject, like PostGIS on
        // insert; matching or absent declarations pass (the column is
        // pinned to g.srid either way via Metadata below).
        val declared = geofunctions.st_srid(col(g.col))
        val hasText = parsers.emptyToNull(col(g.col)).isNotNull
        val sridBad = hasText && declared.isNotNull && declared =!= lit(g.srid)
        val df = rangeOk.withColumn("__geom_cast",
          when(!hasText || sridBad, lit(null)).otherwise(cast))
        val bad = df.filter(hasText && col("__geom_cast").isNull)
          .select(col("id"), when(sridBad, lit("srid_mismatch"))
            .otherwise(lit("invalid_geometry")).as("reject_reason"))
        val ok = df.filter(!hasText || col("__geom_cast").isNotNull)
          .withColumn(g.col, col("__geom_cast")).drop("__geom_cast")
          .withMetadata(g.col, new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("srid", g.srid.toLong)
            .putString("geom_type", g.targetType.toUpperCase).build())
        (ok, bad)
      case None => (rangeOk, rangeOk.limit(0)
        .select(col("id"), lit("").as("reject_reason")))
    }
    // P5 extra columns
    val extra = spec.extraCols.foldLeft(geomOk) { case (df, (name, expr)) =>
      df.withColumn(name, expr)
    }
    // J1 FK checks, sequentially; each miss goes to the dead letter
    val (fkOk, fkBad) = spec.fks.foldLeft((extra, Seq.empty[DataFrame])) {
      case ((df, bad), FkSpec(child, parentName, parentKey, bcast)) =>
        val parent = parents(parentName)
        val ok = Relational.semiJoinFk(df, child, parent, parentKey, bcast)
        val miss = Relational.fkViolations(df, child, parent, parentKey, bcast)
          .select(col("id"), lit(s"fk_miss:$child").as("reject_reason"))
        (ok, bad :+ miss)
    }
    val rejected = (Seq(badRange, badGeom) ++ fkBad)
      .reduce(_ unionByName _)
      .filter(col("reject_reason") =!= "")
    (fkOk, rejected)
  }

  /** Set-level validations on the staged frame (§3.3 'after'):
    * duplicate-open-version (abort), deleted-history (abort),
    * interval-overlap (warn). */
  def validate(staged: DataFrame, live: Option[DataFrame]): ValidationReport = {
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val dup = Temporal.duplicateOpenVersions(staged, v).count()
    if (dup > 0) errors += s"duplicate_open_versions:$dup"
    live.foreach { l =>
      val deleted = Temporal.detectDeleted(l, staged, "id").count()
      if (deleted > 0) errors += s"deleted_history_rows:$deleted"
    }
    val overlaps = Temporal.overlapsWindow(staged, v).count()
    if (overlaps > 0) warnings += s"overlapping_ranges:$overlaps"
    ValidationReport(errors.toSeq, warnings.toSeq)
  }

  /** The committed-snapshot schema of `spec` as a zero-row frame — the
    * `clean()` output of an empty raw extract (a LocalRelation, so no
    * job runs). Used to preload absent parents on a named-task restart:
    * FK checks against it reject honestly instead of the `parents`
    * lookup throwing (reference batch/batch.py:19-30 `--bagh_start`). */
  def emptySnapshot(spark: SparkSession, spec: TableSpec,
      parents: Map[String, DataFrame]): DataFrame = {
    val raw = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      CsvSource.stringSchema(spec.sourceCols.map(_._1)))
    clean(raw, spec, parents)._1
  }

  /** Full lifecycle for one CSV extract against the current live
    * snapshot. Aborts (returns report.failed, nothing written) exactly
    * where the reference raises. */
  def importTable(spark: SparkSession, spec: TableSpec, csvPath: String,
      parents: Map[String, DataFrame], live: Option[DataFrame]): ImportResult = {
    val raw = CsvSource.read(spark, csvPath,
      CsvSource.stringSchema(spec.sourceCols.map(_._1)))
    val (cleaned, rejected) = clean(raw.clean, spec, parents)
    val staged = cleaned.cache()
    val report = validate(staged, live)
    if (report.failed)
      return ImportResult(live.getOrElse(staged.limit(0)), rejected, report, 0, 0)
    val (merged, ins, upd) = live match {
      case Some(l) =>
        val audit = Temporal.mergeAudit(l, staged, "id")
        (Temporal.mergeScd2(l, staged, "id"),
          audit.inserted.count(), audit.updated.count())
      case None => (staged, staged.count(), 0L)
    }
    ImportResult(merged, rejected, report, ins, upd)
  }

  /** Atomic-ish snapshot commit (§7.4.3): write to a temp dir next to
    * the target, then rename over it. Parquet overwrite alone is not
    * transactional; rename of a directory on one filesystem is the
    * closest safe primitive without a table format. */
  def commitSnapshot(df: DataFrame, targetDir: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = targetDir + ".staging"
    df.write.mode("overwrite").parquet(tmp)
    val target = Paths.get(targetDir)
    if (Files.exists(target)) {
      val old = Paths.get(targetDir + ".old")
      if (Files.exists(old)) {
        Files.walk(old).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
      Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    }
    Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Sequential job runner with named-task restart — the reference's
    * `--bagh_start` skip semantics (batch/batch.py:19-30). */
  def runJob(tasks: Seq[(String, () => Unit)], startAt: Option[String] = None): Seq[String] = {
    val toRun = startAt match {
      case Some(s) => tasks.dropWhile(_._1 != s)
      case None => tasks
    }
    toRun.map { case (name, fn) => fn(); name }
  }
}
