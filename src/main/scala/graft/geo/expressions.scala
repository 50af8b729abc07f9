package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.SparkSession

/** F10 geometry functions as custom Catalyst expressions (SURVEY.md
  * §7.3: the one surface Spark lacks natively). Null-safe: null/invalid
  * WKT → null, mirroring batch/geo.py:52-57.
  *
  * The parse kernel is typed and invoked directly from generated code
  * (`addReferenceObj`) — a CodegenFallback would route through
  * eval(row) and force INPUT_ROW materialization in the surrounding
  * projection (measured ~4x on comparable generate pipelines). Written
  * as Expressions (not UDFs) so they carry proper nullability and show
  * up in plans.
  */
abstract class WktUnary extends UnaryExpression {
  override def nullable: Boolean = true
  protected def onGeom(g: GeoWkt.Geom): Any

  /** Java-null on parse failure (or promote rejection downstream);
    * doGenCode maps it to ev.isNull. */
  def build(input: UTF8String): Any =
    GeoWkt.parse(input.toString) match {
      case Some(g) => onGeom(g)
      case None => null
    }

  override def nullSafeEval(input: Any): Any =
    build(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wktExpr", this, classOf[WktUnary].getName)
    val res = ctx.freshName("wktRes")
    val boxed = CodeGenerator.boxedType(dataType)
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $res = $ref.build($c);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ($boxed) $res; }
    """)
  }
}

/** st_geometrytype(wkt) → 'POINT' | 'POLYGON' | ... | null. */
case class StGeometryType(child: Expression) extends WktUnary {
  override def dataType: DataType = StringType
  protected def onGeom(g: GeoWkt.Geom): Any = UTF8String.fromString(g.typeName)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_npoints(wkt) → total vertex count | null. */
case class StNPoints(child: Expression) extends WktUnary {
  override def dataType: DataType = IntegerType
  protected def onGeom(g: GeoWkt.Geom): Any = g.nPoints
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_isvalid(wkt) → structural validity | null on parse failure. */
case class StIsValid(child: Expression) extends WktUnary {
  override def dataType: DataType = BooleanType
  protected def onGeom(g: GeoWkt.Geom): Any = GeoWkt.isValid(g)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** st_castto(wkt, target) → canonical WKT of the promoted geometry, or
  * null when the promote matrix rejects (P4 semantics: the row is then
  * dropped by the pipeline's geometry filter). Target is a literal. */
case class StCastTo(child: Expression, target: String) extends WktUnary {
  override def dataType: DataType = StringType
  protected def onGeom(g: GeoWkt.Geom): Any =
    GeoWkt.promote(g, target).map(p => UTF8String.fromString(p.toWkt)).orNull
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** st_srid(wkt) → the EWKT-declared SRID (`SRID=28992;...`), or null
  * when the text carries no prefix or does not parse. The reference's
  * schema pins geometry(...,28992) (bagh/bagh_create.sql:37) and its
  * inputs pass through GEOSGeometry, which accepts EWKT — so declared-
  * SRID extraction is where that column-type contract gets enforced
  * (ImportPipeline rejects rows declaring a different SRID). */
case class StSrid(child: Expression) extends WktUnary {
  override def dataType: DataType = IntegerType
  protected def onGeom(g: GeoWkt.Geom): Any = null // build overridden below
  override def build(input: UTF8String): Any =
    GeoWkt.parseEwkt(input.toString) match {
      case Some((Some(srid), _)) => Int.box(srid)
      case _ => null
    }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object geofunctions {
  import GraftShim.{column, expression}
  def st_geometrytype(c: Column): Column = column(StGeometryType(expression(c)))
  def st_npoints(c: Column): Column = column(StNPoints(expression(c)))
  def st_isvalid(c: Column): Column = column(StIsValid(expression(c)))
  def st_castto(c: Column, target: String): Column =
    column(StCastTo(expression(c), target))
  def st_srid(c: Column): Column = column(StSrid(expression(c)))

  /** Register SQL names on a session (used by tests / spark.sql users). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("st_geometrytype",
      es => StGeometryType(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("st_npoints",
      es => StNPoints(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("st_isvalid",
      es => StIsValid(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("st_srid",
      es => StSrid(es.head), "scala_udf")
  }
}
