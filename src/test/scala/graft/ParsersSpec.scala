package graft

import org.apache.spark.sql.functions._
import graft.functions.parsers._

/** Golden-input cases for F1-F9, taken verbatim from the reference's
  * semantics (SURVEY.md §5): date truncation (csv.py:24-25),
  * int_or_none rejecting negatives/floats (bagh/batch.py:35-39),
  * J/Y/N/empty booleans (csv.py:29-30), empty-vs-missing pipe lists
  * (bagh/batch.py:556-558). */
class ParsersSpec extends SparkSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect().head.getAs[T]("r")

  private def oneSeq(c: org.apache.spark.sql.Column): List[String] =
    Seq(1).toDF("x").select(c.as("r")).collect().head.getSeq[String](0).toList

  test("parseDate truncates >10 chars then parses; empty -> null") {
    assert(one[java.sql.Date](parseDate(lit("2020-03-04T12:11:10"))).toString == "2020-03-04")
    assert(one[java.sql.Date](parseDate(lit("2020-03-04"))).toString == "2020-03-04")
    assert(one[java.sql.Date](parseDate(lit(""))) == null)
    assert(one[java.sql.Date](parseDate(lit("notadate"))) == null)
  }

  test("parseDateTime: >10 chars timestamp, else date at midnight") {
    assert(one[java.sql.Timestamp](parseDateTime(lit("2020-03-04 05:06:07")))
      .toString == "2020-03-04 05:06:07.0")
    assert(one[java.sql.Timestamp](parseDateTime(lit("2020-03-04")))
      .toString == "2020-03-04 00:00:00.0")
    assert(one[java.sql.Timestamp](parseDateTime(lit(""))) == null)
  }

  test("parseYesNo: J/Y/j true, N false, else null") {
    assert(one[Boolean](parseYesNo(lit("J"))) == true)
    assert(one[Boolean](parseYesNo(lit("Y"))) == true)
    assert(one[Boolean](parseYesNo(lit("j"))) == true)
    assert(one[Boolean](parseYesNo(lit("N"))) == false)
    assert(one[Any](parseYesNo(lit(""))) == null)
    assert(one[Any](parseYesNo(lit("X"))) == null)
  }

  test("createId zero-pads volgnummer to 3 (lexical order = version order)") {
    assert(one[String](createId(lit("ABC"), lit(7))) == "ABC_007")
    assert(one[String](createId(lit("ABC"), lit(123))) == "ABC_123")
    assert(one[Any](createId(lit(null).cast("string"), lit(1))) == null)
  }

  test("createIds zips parallel pipe lists elementwise") {
    assert(oneSeq(createIds(lit("A|B"), lit("1|12"))) == List("A_001", "B_012"))
  }

  test("intOrNone: digits only; rejects negatives, floats, text, empty") {
    assert(one[Int](intOrNone(lit("42"))) == 42)
    assert(one[Any](intOrNone(lit("-5"))) == null)
    assert(one[Any](intOrNone(lit("3.0"))) == null)
    assert(one[Any](intOrNone(lit("abc"))) == null)
    assert(one[Any](intOrNone(lit(""))) == null)
  }

  test("pipeSplit: empty -> [] when emptyAsNil, else [\"\"] (reference inconsistency preserved)") {
    assert(oneSeq(pipeSplit(lit("a|b|c"))) == List("a", "b", "c"))
    assert(oneSeq(pipeSplit(lit(""), emptyAsNil = true)) == List())
    assert(oneSeq(pipeSplit(lit(""), emptyAsNil = false)) == List(""))
  }

  test("emptyToNull and isValidDateRange") {
    assert(one[Any](emptyToNull(lit("  "))) == null)
    assert(one[String](emptyToNull(lit(" x "))) == "x")
    assert(one[Boolean](isValidDateRange(lit("2020-01-02").cast("date"),
      lit(null).cast("date"))) == true)
    assert(one[Boolean](isValidDateRange(lit("2020-01-02").cast("date"),
      lit("2020-01-01").cast("date"))) == false)
  }

  test("camelToSnake matches reference field map") {
    assert(camelToSnake("beginGeldigheid") == "begin_geldigheid")
    assert(camelToSnake("cbsCode") == "cbs_code")
    assert(camelToSnake("naam") == "naam")
  }
}
