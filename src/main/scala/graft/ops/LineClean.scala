package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Line-level corpus cleaning — the C4 family (Raffel et al. 2020,
  * "Exploring the Limits of Transfer Learning", §2.2: keep lines that
  * end in terminal punctuation and have enough words, drop boilerplate
  * lines and brace-bearing pages, drop pages left with too few lines)
  * plus the corpus-wide duplicate-line removal C4/RefinedWeb apply
  * across documents ("we discarded all but one of any three-sentence
  * span occurring more than once" — the line-granularity form).
  *
  * Scale shapes:
  *  - [[c4LineFilter]] is a pure per-row expression (split → HOF
  *    filter → rejoin), no shuffle, fully codegen — scan speed over
  *    100 TB.
  *  - [[corpusLineDedup]] is keep-first dedup keyed on the LINE: a
  *    `min(struct(doc, pos))` aggregation per line (map-side partial
  *    combine — a boilerplate line occurring a billion times collapses
  *    to one row per map task before the shuffle, where a
  *    `Window.partitionBy(line)` row_number would sort the whole hot
  *    group on one reducer), then a doc-keyed rebuild. Two shuffles,
  *    both partial-agg'd, both ∝ distinct data, skew-tolerant.
  */
object LineClean {

  /** Split '\n'-separated text into its lines (trailing empties kept —
    * Spark `split` uses limit -1, matching DuckDB `string_split`). */
  def lines(c: Column): Column = split(c, "\n")

  private val terminal = Seq(".", "!", "?", "\"")

  /** The C4 per-line keep rule: non-blank, ends in terminal
    * punctuation, ≥ `minWords` whitespace words, and contains no
    * blocklisted phrase (case-insensitive). */
  private def lineOk(l: Column, minWords: Int, blocklist: Seq[String]): Column = {
    val nonBlank = length(trim(l)) > 0
    val punct = substring(l, -1, 1).isin(terminal: _*)
    val words = size(split(trim(l), "\\s+")) >= minWords
    val clean = blocklist.map(p => !contains(lower(l), lit(p.toLowerCase)))
      .foldLeft(lit(true))(_ && _)
    nonBlank && punct && words && clean
  }

  /** C4-style document cleaning. Keeps each line passing [[lineOk]];
    * drops the whole document when fewer than `minLines` lines survive
    * or the raw text contains a curly brace (C4's code-page
    * heuristic). Output: (id, clean_text, n_lines_kept) — documents
    * that survive the page-level rules, with their text rebuilt from
    * the surviving lines.
    */
  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3, minLines: Int = 2,
      blocklist: Seq[String] = Seq("lorem ipsum")): DataFrame = {
    val kept = filter(lines(col(textCol)), l => lineOk(l, minWords, blocklist))
    df.select(col(idCol), kept.as("__kept"),
        col(textCol).contains("{").as("__brace"))
      .filter(size(col("__kept")) >= minLines && !col("__brace"))
      .select(col(idCol),
        array_join(col("__kept"), "\n").as("clean_text"),
        size(col("__kept")).as("n_lines_kept"))
  }

  /** Corpus-wide keep-first line dedup: every line keeps only its
    * first occurrence in (doc, position) order; documents are rebuilt
    * from their surviving lines in original position order. Documents
    * whose every line lost are dropped (join back against the input to
    * retain them as empties if a pipeline needs that). Output:
    * (id, dedup_text, n_lines_kept).
    *
    * Keep-first is `min(struct(id, pos))` grouped by the line — the
    * unique (id, pos) pair makes the struct ordering a total order, so
    * the result is deterministic and equals the window form
    * row_number() OVER (PARTITION BY line ORDER BY id, pos) = 1 while
    * keeping map-side partial aggregation (see class doc).
    */
  def corpusLineDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = df
      .select(col(idCol).as("__id"), posexplode(lines(col(textCol))).as(Seq("__pos", "__line")))
    val winners = ex
      .groupBy(col("__line"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__w"))
      .select(col("__w.__id").as("__id"), col("__w.__pos").as("__pos"), col("__line"))
    winners
      .groupBy(col("__id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line")), "\n").as("dedup_text"),
        count(lit(1)).cast("int").as("n_lines_kept"))
      .withColumnRenamed("__id", idCol)
  }

  /** Reference window form of [[corpusLineDedup]] (single-reducer hot
    * groups — test/differential use only; see class doc for why the
    * agg form ships). */
  def corpusLineDedupWindow(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = df
      .select(col(idCol).as("__id"), posexplode(lines(col(textCol))).as(Seq("__pos", "__line")))
    val w = Window.partitionBy(col("__line")).orderBy(col("__id"), col("__pos"))
    val winners = ex.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    winners
      .groupBy(col("__id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line")), "\n").as("dedup_text"),
        count(lit(1)).cast("int").as("n_lines_kept"))
      .withColumnRenamed("__id", idCol)
  }
}
