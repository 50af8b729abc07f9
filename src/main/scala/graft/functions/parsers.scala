package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column functions F1–F9/F11 of SURVEY.md §2.8 — the reference's
  * per-row Python parsers re-expressed as pure, codegen-friendly `Column`
  * combinators (no UDFs; every one compiles to built-in Catalyst
  * expressions inside whole-stage codegen).
  *
  * Reference semantics (file:line cites into /root/reference):
  *  - parse_date / parse_date_time: src/dso_import/batch/csv.py:12-26
  *  - parse_yesno_boolean:          src/dso_import/batch/csv.py:29-30
  *  - is_valid_date_range:          src/dso_import/batch/csv.py:33-34
  *  - create_id / create_ids:       src/dso_import/bagh/batch.py:20-32
  *  - int_or_none:                  src/dso_import/bagh/batch.py:35-39
  *  - pipe-split / empty→null:      src/dso_import/bagh/batch.py:547-560
  */
object parsers {

  /** F1 `parse_date` (csv.py:21-26): ISO date; strings longer than 10
    * chars are truncated to the first 10 before parsing; empty or
    * unparseable → null (try_: Spark 4 ANSI mode would otherwise throw). */
  def parseDate(c: Column): Column =
    try_to_timestamp(substring(trim(c), 1, 10), lit("yyyy-MM-dd")).cast("date")

  /** F2 `parse_date_time` (csv.py:12-18): >10 chars → ISO timestamp,
    * else ISO date widened to midnight; empty/unparseable → null. */
  def parseDateTime(c: Column): Column = {
    val t = trim(c)
    when(length(t) > 10, try_to_timestamp(t))
      .otherwise(try_to_timestamp(t, lit("yyyy-MM-dd")))
  }

  /** F3 `parse_yesno_boolean` (csv.py:29-30): J/Y (any case) → true,
    * N → false, anything else (incl. empty) → null. */
  def parseYesNo(c: Column): Column = {
    val u = upper(trim(c))
    when(u.isin("J", "Y"), lit(true))
      .when(u === "N", lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** F4 `is_valid_date_range` (csv.py:33-34): open interval (null end)
    * is valid; else begin must not exceed end. */
  def isValidDateRange(begin: Column, end: Column): Column =
    end.isNull || begin <= end

  /** F5 `create_id` (bagh/batch.py:20-21):
    * `"{identificatie}_{volgnummer:03}"`; null identificatie → null id.
    * Zero-padding keeps lexical order == version order. */
  def createId(identificatie: Column, volgnummer: Column): Column =
    when(identificatie.isNull, lit(null).cast("string"))
      .otherwise(concat(identificatie, lit("_"),
        lpad(volgnummer.cast("string"), 3, "0")))

  /** F6 `create_ids` (bagh/batch.py:24-32): parallel pipe-delimited id
    * list + volgnummer list → array of versioned ids, elementwise.
    * Compiled [[CreateIds]] expression (the zip_with combinator ran
    * interpreted and dominated q12); [[createIdsHof]] is the
    * differential-test witness. */
  def createIds(ids: Column, volgnummers: Column): Column =
    sketches.create_ids(ids, volgnummers)

  /** The original higher-order-function form of [[createIds]]. */
  def createIdsHof(ids: Column, volgnummers: Column): Column =
    zip_with(split(ids, "\\|"), split(volgnummers, "\\|"),
      (i, v) => concat(i, lit("_"), lpad(v, 3, "0")))

  /** F7 `int_or_none` (bagh/batch.py:35-39): digits-only string → int,
    * anything else (negatives, floats, text, empty) → null. A plain
    * `cast("int")` is too lenient — it accepts "-5" and "3.0". */
  def intOrNone(c: Column): Column = {
    val t = trim(c)
    when(t.rlike("^[0-9]+$"), t.cast("int"))
      .otherwise(lit(null).cast("int"))
  }

  /** F8 pipe-split to array (bagh/batch.py:547,556-558). The reference is
    * deliberately inconsistent: `toegang` maps empty → `[]`, while
    * `gebruiksdoel` keeps `split("") == [""]`. `emptyAsNil` selects. */
  def pipeSplit(c: Column, emptyAsNil: Boolean = true): Column =
    if (emptyAsNil)
      when(c.isNull || c === "", array().cast("array<string>"))
        .otherwise(split(c, "\\|"))
    else split(c, "\\|")

  /** F9 empty-string → null normalization (`r[...] or None` idiom,
    * bagh/batch.py:551-560). */
  def emptyToNull(c: Column): Column = nullif(trim(c), lit(""))

  /** F11 camelCase → snake_case (model_field_map, bagh/batch.py:214-225)
    * — compile-time helper used by TableSpec to build `.alias`es. */
  def camelToSnake(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase

  // --------------------------------------------------------------------
  // Oracle-exact numeric helpers (not in the reference; needed so Spark
  // and DuckDB produce bit-identical aggregates over double columns).
  // Doubles holding 2-decimal money values are summed via exact decimal
  // arithmetic, then surfaced as double: both engines compute the same
  // exact decimal and cast it identically.
  // --------------------------------------------------------------------

  /** Exact 2-decimal view of a money-ish double column. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Deterministic sum of a 2-decimal double column, returned as double. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast("double")

  /** Deterministic average (exact decimal sum / count), as double. */
  def avgMoney(c: Column): Column =
    (sum(dec2(c)).cast("double") / count(c)).cast("double")
}
