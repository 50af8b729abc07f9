package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.BagTables

/** The whole reference pipeline (`python manage.py run_import bagh`,
  * SURVEY.md §3.1) as one runnable job over the [[BagTables]] registry:
  * seed gemeente, then each CSV task in FK-topological order — every
  * table goes through the generic load → clean → validate → merge
  * lifecycle with the parents loaded so far, and commits an atomic
  * parquet snapshot per table.
  *
  * File layout mirrors the reference's DATA_DIR after objectstore
  * download (bagh/batch.py:54-55): `{GBD|BAG}_{name}_ActueelEnHistorie
  * .csv` directly under `dataDir`. Tables whose extract is absent are
  * skipped (supports partial runs; the reference's named-task restart
  * is the `startAt` parameter, batch/batch.py:19-30 semantics).
  */
object BagJob {

  case class TableOutcome(name: String, loaded: Long, rejected: Long,
      errors: Seq[String], skipped: Boolean)

  private def csvFile(dataDir: String, name: String): java.io.File = {
    val gobId = if (BagTables.gobPath(name) == "gebieden") "GBD" else "BAG"
    new java.io.File(s"$dataDir/${gobId}_${name}_ActueelEnHistorie.csv")
  }

  /** Run the job. Returns per-table outcomes in execution order; a
    * table with validation errors aborts before its write (reference
    * fail-fast), but later independent tables still run — its children
    * will then FK-reject against the stale/absent parent, which is the
    * honest cascade. */
  def run(spark: SparkSession, dataDir: String, outDir: String,
      startAt: Option[String] = None): Seq[TableOutcome] = {
    val parents = scala.collection.mutable.Map[String, DataFrame]()

    val gemeente = BagTables.gemeenteSeed(spark)
    ImportPipeline.commitSnapshot(gemeente, s"$outDir/gemeente")
    parents("gemeente") = spark.read.parquet(s"$outDir/gemeente")

    // Preload every table's last committed snapshot — or, when none
    // exists, an empty spec-schema frame — so a mid-DAG `startAt`
    // restart (reference batch/batch.py:19-30) and the absent/failed-
    // parent cascade resolve FK checks against committed state instead
    // of throwing on the `parents` lookup. loadOrder is FK-topological,
    // so each emptySnapshot sees its own parents already present.
    BagTables.loadOrder.foreach { spec =>
      parents(spec.name) =
        if (new java.io.File(s"$outDir/${spec.name}").exists())
          spark.read.parquet(s"$outDir/${spec.name}")
        else ImportPipeline.emptySnapshot(spark, spec, parents.toMap)
    }

    val specs = startAt match {
      case Some(s) => BagTables.loadOrder.dropWhile(_.name != s)
      case None => BagTables.loadOrder
    }
    val outcomes = specs.map { spec =>
      val f = csvFile(dataDir, spec.name)
      if (!f.exists()) {
        TableOutcome(spec.name, 0, 0, Nil, skipped = true)
      } else {
        val live =
          if (new java.io.File(s"$outDir/${spec.name}").exists())
            Some(spark.read.parquet(s"$outDir/${spec.name}"))
          else None
        val result = ImportPipeline.importTable(spark, spec, f.getPath,
          parents.toMap, live)
        if (result.report.failed) {
          TableOutcome(spec.name, 0, result.rejected.count(),
            result.report.errors, skipped = false)
        } else {
          ImportPipeline.commitSnapshot(result.merged, s"$outDir/${spec.name}")
          val committed = spark.read.parquet(s"$outDir/${spec.name}")
          parents(spec.name) = committed
          TableOutcome(spec.name, committed.count(), result.rejected.count(),
            Nil, skipped = false)
        }
      }
    }
    TableOutcome("gemeente", 1, 0, Nil, skipped = false) +: outcomes
  }
}
