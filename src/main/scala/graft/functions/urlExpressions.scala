package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL-canonicalization hot-path expressions (r19 optimization round).
  *
  * Motivation is PLAN-side, not row-side: the built-in-function forms
  * of percent-normalization (split / slice / transform / conv / chr
  * over a lambda) and registrable-domain lookup (a 250-literal
  * public-suffix ARRAY + array_contains) ran fine per row, but their
  * expression TREES dominated driver time — every Catalyst analysis,
  * canonicalization (Literal.hashCode over each suffix string,
  * orderCommutative) and AQE re-optimization pass re-walked thousands
  * of nodes, measured at ~4 s of q342's 5.3 s wall (JobProfile phase
  * split + thread-dump samples). Each expression here is ONE tree
  * node with the data captured as plain Scala state, byte-identical
  * in output to the column composition it replaces (the DuckDB
  * oracles replay the same rules unchanged).
  */
object urlfns {
  import GraftShim.{column, expression}

  def pct_normalize(c: Column): Column =
    column(PctNormalizeExpr(expression(c)))

  def registered_domain(host: Column, suffixes: Seq[String]): Column =
    column(RegisteredDomainExpr(expression(host), suffixes))
}

/** Percent-encoding normalization (RFC 3986 §6.2.2) — the exact
  * semantics of the prior column form: decode `%XX` escapes of
  * UNRESERVED bytes (ALPHA / DIGIT / `-` `.` `_` `~`), uppercase the
  * hex of every surviving valid escape, pass malformed escapes
  * (non-hex or truncated tail) through verbatim; a string with no
  * `%` is returned untouched (the fast path that previously rode a
  * contains() guard). Null in → null out. */
case class PctNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "pct_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pct_normalize expects STRING, got ${child.dataType}")

  private def isHex(ch: Char): Boolean =
    (ch >= '0' && ch <= '9') || (ch >= 'A' && ch <= 'F') ||
      (ch >= 'a' && ch <= 'f')

  private def unreserved(code: Int): Boolean =
    (code >= 48 && code <= 57) || (code >= 65 && code <= 90) ||
      (code >= 97 && code <= 122) ||
      code == 45 || code == 46 || code == 95 || code == 126

  def normalize(u: UTF8String): UTF8String = {
    val s = u.toString
    if (s.indexOf('%') < 0) return u
    // same part algebra as the split-on-'%' column form: first part
    // verbatim, each later part carries the escape that preceded it
    val parts = s.split("%", -1)
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(parts(0))
    var i = 1
    while (i < parts.length) {
      val p = parts(i)
      if (p.length >= 2 && isHex(p.charAt(0)) && isHex(p.charAt(1))) {
        val code = Integer.parseInt(p.substring(0, 2), 16)
        if (unreserved(code)) sb.append(code.toChar).append(p, 2, p.length)
        else sb.append('%')
          .append(Character.toUpperCase(p.charAt(0)))
          .append(Character.toUpperCase(p.charAt(1)))
          .append(p, 2, p.length)
      } else sb.append('%').append(p)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pctNorm", this,
      classOf[PctNormalizeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.normalize($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Registrable domain of a LOWERCASE host — the exact semantics of
  * the prior column form over the embedded public-suffix snapshot:
  * all-digits/dots hosts (IPv4-ish) are their own key; otherwise
  * last-3 labels when the final two match a snapshot suffix, else
  * last-2, else the host itself for single-label hosts. Null in →
  * null out. `suffixes` is captured as Scala state (one HashSet probe
  * per row) instead of a literal array — the plan-side point of this
  * file. */
case class RegisteredDomainExpr(child: Expression, suffixes: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "registered_domain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"registered_domain expects STRING, got ${child.dataType}")

  @transient private lazy val set: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String](suffixes.size * 2)
    suffixes.foreach(h.add)
    h
  }

  def lookup(u: UTF8String): UTF8String = {
    val host = u.toString
    // rlike "^[0-9.]+$" == non-empty and every char a digit or dot
    var ipish = host.length > 0
    var i = 0
    while (ipish && i < host.length) {
      val ch = host.charAt(i)
      ipish = (ch >= '0' && ch <= '9') || ch == '.'
      i += 1
    }
    if (ipish) return u
    val labels = host.split("\\.", -1)
    val n = labels.length
    if (n >= 2) {
      val lastTwo = labels(n - 2) + "." + labels(n - 1)
      if (n >= 3 && set.contains(lastTwo))
        UTF8String.fromString(labels(n - 3) + "." + lastTwo)
      else UTF8String.fromString(lastTwo)
    } else u
  }

  override def nullSafeEval(input: Any): Any =
    lookup(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("regDomain", this,
      classOf[RegisteredDomainExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.lookup($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
