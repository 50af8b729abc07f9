package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Codegen-friendly Catalyst expressions for the sketch/vector hot
  * paths (SURVEY.md §7.3 escalation path (b): a native `Expression`
  * beats the interpreted higher-order-function forms).
  *
  * Measured motivation (sf0.1, local[32]): the `aggregate`/`zip_with`
  * lambda forms of dot-product and simhash run as interpreted
  * `HigherOrderFunction`s — per element they allocate and dispatch;
  * these expressions replace them with tight primitive loops (and, for
  * [[VecDot]], generated Java inside whole-stage codegen). At 100 TB
  * the same expressions are what every similarity/dedup pair loop
  * spends its CPU on.
  */
object sketchExpressions {

  /** Element accessor widening float/double arrays to double. */
  private[functions] def elemAsDouble(dt: DataType, a: ArrayData, i: Int): Double =
    dt match {
      case FloatType  => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case IntegerType => a.getInt(i).toDouble
      case LongType   => a.getLong(i).toDouble
      case other => throw new IllegalStateException(s"vec_dot element type $other")
    }
}

/** vec_dot(a, b): left-to-right double-fold dot product over numeric
  * arrays. Exactly the semantics of
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`:
  * null array, length mismatch, or any null element → null (zip_with
  * pads the shorter side with null, which nulls the fold). Same FP
  * result (identical association order), oracle-replicable. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects numeric arrays, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lt = elemType(left); val rt = elemType(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += sketchExpressions.elemAsDouble(lt, x, i) *
        sketchExpressions.elemAsDouble(rt, y, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val la = CodeGenerator.getValue(a, elemType(left), i)
      val rb = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ((double)($la)) * ((double)($rb));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vec_dist2(a, b): squared L2 distance, left-to-right double fold —
  * exactly `aggregate(zip_with(a,b,(x,y)->(x-y)*(x-y)), 0d, +)` (same
  * null/length semantics as [[VecDot]]). */
case class VecDist2(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dist2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lt = elemType(left); val rt = elemType(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = sketchExpressions.elemAsDouble(lt, x, i) -
        sketchExpressions.elemAsDouble(rt, y, i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val la = CodeGenerator.getValue(a, elemType(left), i)
      val rb = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = ((double)($la)) - ((double)($rb));
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vec_dist2_long(a, b): squared L2 distance over two array<long>
  * vectors in EXACT integer arithmetic — Σ(aᵢ-bᵢ)² as a long. Built
  * for micro-quantized vector math (k-means in micros): long sums are
  * associative, so the result is identical regardless of fold order
  * and bit-replicable in any engine's SUM. Null/length-mismatch
  * semantics match [[VecDist2]]. Bounds: |micro| ≤ ~2e6 → per-dim
  * square ≤ 4e12, safe for ~2M dims per vector. */
case class VecDist2Long(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dist2_long"

  def build(x: ArrayData, y: ArrayData): Any = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    build(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("v2l", this, classOf[VecDist2Long].getName)
    val res = ctx.freshName("v2lRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $res = $ref.build($a, $b);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (Long) $res; }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vec_sub_long(a, b): elementwise a − b over two array<long> vectors
  * — the residual computation of IVFADC (x − coarse centroid) in
  * exact integer micros, as a tight compiled loop instead of the
  * interpreted `zip_with(a, b, (x,y) -> x - y)` lambda (one dispatch
  * per ELEMENT on the corpus scan path). Null array, length mismatch,
  * or any null element → null — the [[VecDist2Long]] semantics. */
case class VecSubLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sub_long"

  def build(x: ArrayData, y: ArrayData): ArrayData = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      out(i) = x.getLong(i) - y.getLong(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    build(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vsl", this, classOf[VecSubLong].getName)
    val res = ctx.freshName("vslRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $res = $ref.build($a, $b);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $res; }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vec_argmin_long(x, codebook): index of the codebook row nearest to
  * the array<long> vector `x` by exact integer squared-L2; ties break
  * to the LOWEST index (strict `<` keeps the first minimum), matching
  * the k-means assignment rule `least(struct(dist, cent_id))` this
  * kernel replaces. The codebook rides in the expression as ONE
  * reference object, so the expression tree and the generated code
  * stay constant-size in k — the unrolled k-way `least(struct(...))`
  * form grew the codegen linearly in k and its per-iteration janino
  * compile dominated training time at realistic codebook sizes.
  * A codebook row of mismatched width never wins (skipped); if no row
  * matches the vector's width the result is null. */
case class VecArgminLong(child: Expression, codebook: Array[Array[Long]])
  extends UnaryExpression {
  require(codebook.nonEmpty, "codebook must be non-empty")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_argmin_long"

  def build(x: ArrayData): Any = {
    val n = x.numElements()
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    var best = -1
    var bestD = java.lang.Long.MAX_VALUE
    var j = 0
    while (j < codebook.length) {
      val c = codebook(j)
      if (c.length == n) {
        var d = 0L
        var p = 0
        while (p < n) {
          val t = x.getLong(p) - c(p)
          d += t * t
          p += 1
        }
        if (d < bestD) { bestD = d; best = j }
      }
      j += 1
    }
    if (best < 0) null else java.lang.Integer.valueOf(best)
  }

  override def nullSafeEval(a: Any): Any = build(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vam", this, classOf[VecArgminLong].getName)
    val res = ctx.freshName("vamRes")
    nullSafeCodeGen(ctx, ev, a => s"""
      Object $res = $ref.build($a);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (Integer) $res; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** vec_top_cells_dist2(x, codebook, n): indices of the `n` codebook
  * rows nearest to the float/double vector `x`, ordered best-first by
  * `(round(dist2, 6) asc, index asc)` — the EXACT ordering of the
  * crossJoin + `round(dist2,6)` + row_number window it replaces in the
  * IVF cell assignment (VERDICT r6 #1), so the q45/q85 oracles are
  * unchanged. dist2 is the same left-to-right double fold as
  * [[VecDist2]]; rounding replicates Spark's `round(_, 6)` on doubles
  * (HALF_UP via BigDecimal, NaN/Inf passed through) because round is
  * only order-relevant at ties, where the index tiebreak must fire
  * exactly when the SQL one does. The codebook rides as ONE reference
  * object (the [[VecArgminLong]] pattern): plan size and generated
  * code are constant in k, the per-row cost is one scan over k rows,
  * and — unlike the window form — there is no k× row amplification
  * and no shuffle. A codebook row of mismatched width never wins; if
  * no row matches the vector's width (or the vector has a null
  * element) the result is null. */
case class VecTopCellsDist2(child: Expression, codebook: Array[Array[Double]],
    n: Int) extends UnaryExpression {
  require(codebook.nonEmpty, "codebook must be non-empty")
  require(n > 0, "n must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_top_cells_dist2"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  /** Spark's round(d, 6): BigDecimal HALF_UP, NaN/Inf unchanged. */
  private def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def build(x: ArrayData): Any = {
    val len = x.numElements()
    var i = 0
    while (i < len) { if (x.isNullAt(i)) return null; i += 1 }
    val et = elemType
    val ds = new Array[Double](codebook.length)
    val ok = new Array[Boolean](codebook.length)
    var nOk = 0
    var j = 0
    while (j < codebook.length) {
      val c = codebook(j)
      if (c.length == len) {
        var s = 0.0
        var p = 0
        while (p < len) {
          val d = sketchExpressions.elemAsDouble(et, x, p) - c(p)
          s += d * d
          p += 1
        }
        ds(j) = round6(s); ok(j) = true; nOk += 1
      }
      j += 1
    }
    if (nOk == 0) return null
    // selection of the m best by (dist asc, index asc): strict < on an
    // ascending index scan keeps the first minimum, so ties break to
    // the lowest index — the row_number (d asc, cent asc) rule.
    // Double.compare, not `<`: NaN must order GREATEST (Spark's double
    // sort order) — a raw `<` is always false against NaN, which would
    // let a lower-index NaN distance win permanently (ADVICE r7)
    val m = math.min(n, nOk)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](codebook.length)
    var t = 0
    while (t < m) {
      var best = -1
      var bd = 0.0
      var q = 0
      while (q < codebook.length) {
        if (ok(q) && !taken(q) &&
            (best < 0 || java.lang.Double.compare(ds(q), bd) < 0)) {
          best = q; bd = ds(q)
        }
        q += 1
      }
      taken(best) = true; out(t) = best; t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = build(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vtc", this, classOf[VecTopCellsDist2].getName)
    val res = ctx.freshName("vtcRes")
    nullSafeCodeGen(ctx, ev, a => s"""
      Object $res = $ref.build($a);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** pq_adc(codes, qtable): asymmetric-distance computation for product
  * quantization (the PQ/ADC scan of Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): the
  * approximate squared distance from a query to a PQ-coded vector is
  * Σ_s qtable[s·ksub + codes[s]], where `codes` are the vector's
  * per-subspace centroid indices and `qtable` is the query's
  * precomputed (flattened m×ksub) table of exact integer-micro
  * subspace distances. All arithmetic is long — associative, so the
  * result is bit-replicable in any engine's SUM (the kmeansMicro
  * discipline). Per corpus row the cost is m array lookups — the whole
  * point of PQ at 100 TB: the scan touches m bytes of code + one
  * shared table instead of the raw vector. Null array, null element,
  * a code outside [0, ksub), or a table not exactly m·ksub wide → null
  * (never a wrong distance). */
case class PqAdcDist(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression {
  require(ksub > 0, "ksub must be positive")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  def build(codes: ArrayData, qtable: ArrayData): Any = {
    val m = codes.numElements()
    if (qtable.numElements() != m * ksub) return null
    var s = 0L
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codes.getInt(i)
      if (c < 0 || c >= ksub) return null
      val j = i * ksub + c
      if (qtable.isNullAt(j)) return null
      s += qtable.getLong(j)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    build(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adc", this, classOf[PqAdcDist].getName)
    val res = ctx.freshName("adcRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $res = $ref.build($a, $b);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (Long) $res; }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** simhash64(tokens): 64-bit SimHash of an array<string> — per token
  * one xxhash64 (seed 42, identical to the SQL `xxhash64` function),
  * ±1 vote per bit, bit set when the vote sum is strictly positive.
  * Null array → null; null elements are skipped. The kernel is typed
  * and invoked directly from generated code (a CodegenFallback here
  * would route through eval(row) and force INPUT_ROW materialization —
  * measured ~4x on the q12 generate pipeline for the same pattern). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  def build(arr: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (acc(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.build($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** simhash_md5_60(tokens): the engine-portable 60-bit SimHash sketch
  * as a single per-row expression — bit-identical to the grouped md5
  * form ([[graft.ops.Dedup.simhashGroupedPortable]]): per token, the
  * first 15 hex chars of md5(token) parsed as an unsigned 60-bit int
  * (computed here as the big-endian first 8 digest bytes >>> 4), ±1
  * votes per bit, bit set when strictly positive. Zero shuffles where
  * the grouped form pays an explode + 60-aggregate pass. */
case class SimHashMd5_60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_md5_60"

  // ThreadLocal: addReferenceObj shares ONE expression instance across
  // all task threads of the JVM, and MessageDigest is not thread-safe
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def build(arr: ArrayData): Long = {
    val digester = md.get()
    val acc = new Array[Int](60)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val digest = digester.digest(arr.getUTF8String(j).getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
        h = h >>> 4 // top 15 nibbles = first 15 hex chars
        var i = 0
        while (i < 60) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 60) {
      if (acc(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashMd5", this, classOf[SimHashMd5_60].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.build($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** minhash_md5(shingles, n): the engine-portable MinHash signature as
  * one per-row expression — per lane i, the minimum md5 hex digest of
  * `"i:" + shingle` over the shingle set, exactly the
  * `min(md5('i:' || shingle))` the q70 oracle computes per doc
  * (unsigned byte order on the 16-byte digest == lexicographic order
  * of its lowercase hex). Replaces the explode + n-min-aggregates
  * grouped phase with a zero-shuffle projection. Empty/null shingle
  * array → null (doc never bands). */
case class MinHashMd5(child: Expression, numHashes: Int)
  extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_md5"

  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  @transient private lazy val lanePrefix: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => s"$i:".getBytes("UTF-8"))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexChars = "0123456789abcdef".toCharArray

  def build(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val digester = md.get()
    val mins = new Array[Array[Byte]](numHashes)
    var j = 0
    var any = false
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val sh = arr.getUTF8String(j).getBytes
        var i = 0
        while (i < numHashes) {
          digester.reset()
          digester.update(lanePrefix(i))
          digester.update(sh)
          val d = digester.digest()
          if (mins(i) == null || unsignedLess(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      j += 1
    }
    if (!any) return null
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      val d = mins(i)
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = hexChars((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = hexChars(d(b) & 0xf)
        b += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String
        .fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashMd5", this, classOf[MinHashMd5].getName)
    val res = ctx.freshName("mmRes")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $res = $ref.build($c);
      if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** minhash_sig(shingles, n): n-element MinHash signature of an
  * array<string>. Each shingle is hashed once (xxhash64, seed 42);
  * the i-th signature lane takes the min of `XXH64.hashLong(h, i)` —
  * one string hash + n long mixes per shingle, single pass, no
  * shuffle. Min over a multiset equals min over the set, so upstream
  * dedup of shingles is unnecessary. Empty/null array → null (a doc
  * with no shingles has no signature and never bands). */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  /** Null result (no shingles) is represented as Java null; doGenCode
    * maps it to ev.isNull. */
  def build(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    var any = false
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val base = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashLong(base, i.toLong)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any = build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.build($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** shingle_set(text, k): distinct word k-shingles of a string, in one
  * compiled pass. Bit-faithful to the Column-combinator form
  * `array_distinct(when(size(toks) >= k, transform(sequence(...),
  * i -> concat_ws(" ", slice(toks, ...)))).otherwise(array()))` with
  * `toks = split(trim(text), "\\s+")`:
  *   - trim removes ASCII spaces only (Spark `trim` semantics);
  *   - the split keeps leading/trailing empty tokens exactly like
  *     Spark's `split` (Java `Pattern.split(s, -1)`);
  *   - fewer than k tokens → empty array; null text → null;
  *   - first-occurrence order, like `array_distinct`.
  * Motivation: the combinator form runs as interpreted higher-order
  * lambdas and was re-evaluated per consumer by CollapseProject —
  * measured as the dominant cost of the ngram/minhash queries.
  *
  * `withSize = true` returns array<struct<shingle,n_sh>> carrying the
  * distinct-shingle count on every element, so a downstream
  * `inline()` yields (shingle, n_sh) rows with the expression
  * evaluated exactly once per input row (a Generate evaluates its
  * child once — no projection-inlining hazard).
  *
  * `dedupe = false` keeps the full multiset in order (term-frequency
  * use cases: n-gram counting, TF-IDF) — then bit-faithful to the
  * combinator form WITHOUT the `array_distinct`. */
case class ShingleSet(child: Expression, k: Int, withSize: Boolean = false,
    dedupe: Boolean = true)
  extends UnaryExpression {
  require(k >= 1, "shingle size k must be >= 1")
  require(dedupe || !withSize, "withSize requires dedupe")

  override def dataType: DataType =
    if (withSize) ArrayType(StructType(Seq(
      StructField("shingle", StringType, nullable = false),
      StructField("n_sh", IntegerType, nullable = false))), containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_set"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def build(input: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val str = input.trim().toString
    val toks = ws.split(str, -1)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val nSh = toks.length - k + 1
    val sb = new java.lang.StringBuilder(64)
    if (!dedupe) {
      val out = new Array[Any](nSh)
      var i = 0
      while (i < nSh) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
        i += 1
      }
      return new GenericArrayData(out)
    }
    val seen = new java.util.LinkedHashSet[String](nSh * 2)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val it = seen.iterator()
    if (!withSize) {
      val out = new Array[Any](seen.size)
      var p = 0
      while (it.hasNext) {
        out(p) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
        p += 1
      }
      new GenericArrayData(out)
    } else {
      val n = seen.size
      val out = new Array[Any](n)
      var p = 0
      while (it.hasNext) {
        out(p) = org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(it.next()), n)
        p += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any =
    build(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleSet", this, classOf[ShingleSet].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.build($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** token_set_count(tokens, words): how many elements of an
  * array<string> appear in the fixed `words` set — the compiled form
  * of `size(filter(tokens, w -> array_contains(lit(words), w)))`
  * (null elements excluded, exactly like array_contains' null →
  * filter-false). Powers stopword ratios and stopword-voting lang-id:
  * the filter/array_contains combinators run as interpreted
  * higher-order lambdas per token per language on the scan path. */
case class TokenSetCount(child: Expression, words: Seq[String])
  extends UnaryExpression {
  require(words.nonEmpty, "words must be non-empty")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "token_set_count"

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](words.size * 2)
    words.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  def build(arr: ArrayData): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any = build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tsc", this, classOf[TokenSetCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.build($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** fingerprint64(text): rolling polynomial document hash,
  * `h = (h*31 + codepoint) mod 1e9+7` over the trimmed string — the
  * compiled form of
  * `aggregate(filter(split(trim(c), ""), ch -> ch != ""), 0L,
  *            (acc, ch) -> (acc*31 + ascii(ch)) % 1000000007)`.
  * Bit-faithful: Spark `ascii` returns the full code point of the
  * first character (verified: 'é'→233, '日'→26085, not the first
  * UTF-8 byte), `split` by the empty pattern yields one element per
  * code point, and the `!= ""` filter only drops the `[""]` artifact
  * of the empty string (→ fold over nothing → 0). The HOF form runs
  * as interpreted lambdas — one allocation + dispatch per CHARACTER
  * on the hot scan path; this is a tight primitive loop. */
case class Fingerprint64(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "fingerprint64"

  def build(input: org.apache.spark.unsafe.types.UTF8String): Long = {
    val s = input.trim().toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override def nullSafeEval(input: Any): Any =
    build(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fp64", this, classOf[Fingerprint64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.build($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** avg_token_len(text): mean whitespace-token length in characters, as
  * double — the compiled form of
  * `aggregate(transform(split(trim(c),"\\s+"), w -> length(w)), 0, +)
  *    .cast("double") / size(split(trim(c),"\\s+"))`.
  * Token lengths count code points (Spark `length` semantics); the
  * empty string yields `[""]` → 0.0/1 = 0.0, so the divisor is never
  * zero. Null text → null, like the HOF form. */
case class AvgTokenLen(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "avg_token_len"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def build(input: org.apache.spark.unsafe.types.UTF8String): Double = {
    val s = input.trim().toString
    val toks = ws.split(s, -1)
    var total = 0L
    var i = 0
    while (i < toks.length) {
      total += toks(i).codePointCount(0, toks(i).length)
      i += 1
    }
    total.toDouble / toks.length
  }

  override def nullSafeEval(input: Any): Any =
    build(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("atl", this, classOf[AvgTokenLen].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.build($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** create_ids(ids, nums): compiled form of the F6 combinator
  * `zip_with(split(ids,"\\|"), split(nums,"\\|"),
  *           (i,v) -> concat(i, '_', lpad(v, 3, '0')))` —
  * bit-faithful including the quirks: zip pads the shorter split with
  * null (→ null element via concat), and lpad TRUNCATES to 3 chars
  * when the volgnummer is longer (Spark lpad semantics; the reference's
  * `f"{v:03}"` never truncates — preserved as-is because the Column
  * form is the committed oracle behavior). Null in either input → null
  * (split(null) → null → zip_with(null, _) → null). */
case class CreateIds(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "create_ids"

  @transient private lazy val pipe = java.util.regex.Pattern.compile("\\|")

  /** Kernel shared by interpreted eval and generated code. Public +
    * typed so `doGenCode` can invoke it directly on the child UTF8String
    * values — a CodegenFallback here would route through `eval(row)`
    * and force INPUT_ROW materialization, which measurably broke the
    * surrounding generate/project pipeline (q12: explode over the
    * fallback cost ~4x the expression itself). */
  def build(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val as = pipe.split(a.toString, -1)
    val bs = pipe.split(b.toString, -1)
    val n = math.max(as.length, bs.length)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i < as.length && i < bs.length) {
        val v = bs(i)
        val padded =
          if (v.length >= 3) v.substring(0, 3)
          else "000".substring(v.length) + v
        out(i) = org.apache.spark.unsafe.types.UTF8String
          .fromString(as(i) + "_" + padded)
      } // else null: zip_with pads the shorter side
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    build(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("createIds", this,
      classOf[CreateIds].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.build($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** token_stats(text): single-pass whitespace-token frequency summary —
  * struct(n_tokens, n_distinct, top_freq) over `split(trim(c),"\\s+")`
  * (same tokenization convention as [[AvgTokenLen]] / the q21 oracle:
  * the empty string yields `[""]` → (1,1,1), so ratios never divide by
  * zero; null text → null). The repetition quality signals of a
  * Gopher-style filter pipeline — duplicate-word fraction
  * `1 - n_distinct/n_tokens` and top-word fraction
  * `top_freq/n_tokens` — derive from this struct with plain column
  * arithmetic. The equivalent declarative form
  * (explode → groupBy(doc, word) → groupBy(doc)) shuffles the entire
  * tokenized corpus TWICE; this is a per-row kernel — zero shuffles,
  * the only viable shape at 100 TB scan width. */
case class TokenStats(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_freq", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "token_stats"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def build(input: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = ws.split(input.trim().toString, -1)
    val freq = new java.util.HashMap[String, Int](toks.length * 2)
    var top = 0
    var i = 0
    while (i < toks.length) {
      val n = freq.merge(toks(i), 1, (a, b) => a + b)
      if (n > top) top = n
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length, freq.size, top))
  }

  override def nullSafeEval(input: Any): Any =
    build(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tst", this, classOf[TokenStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.build($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** nfc(text): Unicode NFC normalization (java.text.Normalizer) — the
  * one normalization step Spark has no built-in for. ASCII input is
  * returned untouched without allocating (a byte scan decides — the
  * common case on web corpora is a no-op), so the composed
  * normalizeText pipeline stays scan-speed. Idempotent; null → null. */
case class NfcNormalize(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "nfc"

  def build(input: org.apache.spark.unsafe.types.UTF8String):
      org.apache.spark.unsafe.types.UTF8String = {
    // pure-ASCII fast path: NFC is the identity, skip the String hop
    val n = input.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((input.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) input
    else {
      val s = input.toString
      val norm =
        if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
        else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      if (norm eq s) input
      else org.apache.spark.unsafe.types.UTF8String.fromString(norm)
    }
  }

  override def nullSafeEval(input: Any): Any =
    build(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.build($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** hll_lane_xx(key): production-speed HyperLogLog lane — one xxhash64
  * (seed 42, the repo's xx convention) over the key string, bucket =
  * low 8 bits (p = 8, m = 256), rho = leading zeros of the next
  * 52-bit window + 1 (capped 53 when the window is all-zero),
  * returned packed as `bucket * 64 + rho` (rho ≤ 53 < 64, so the
  * unpack is `div 64` / `% 64`, both codegen'd integer ops).
  *
  * This is the FAST twin of the md5 lane in
  * [[graft.ops.Sketches.hllRegisters]] (VERDICT r10 #2, reversing the
  * q27→q70 twin direction): same p, same rank-window width, same
  * (bucket, rho_max) register layout and the same register-wise-max
  * merge — only the hash family differs, so estimates agree to
  * sketch accuracy (WebCorpusSpec gates the band) but registers are
  * not engine-portable (DuckDB has no xxhash64; the md5 form stays
  * the oracle gate). The md5 form pays ~16 bytes of hex string + 6
  * string ops per row; this is one primitive hash + 4 ALU ops. */
case class HllLaneXx(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hll_lane_xx"

  def build(key: org.apache.spark.unsafe.types.UTF8String): Int = {
    val h = XXH64.hashUTF8String(key, 42L)
    val bucket = (h & 0xFFL).toInt
    val w = (h >>> 8) & ((1L << 52) - 1)
    val rho = if (w == 0L) 53 else java.lang.Long.numberOfLeadingZeros(w) - 11
    bucket * 64 + rho
  }

  override def nullSafeEval(input: Any): Any =
    build(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hllxx", this, classOf[HllLaneXx].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.build($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** md5_lane_pack(hex): the PORTABLE HLL lane's rank arithmetic as one
  * compiled pass — input the 32-char md5 hex string, output
  * `bucket·64 + rho` exactly as the string-arithmetic form (first 2
  * hex chars → bucket; 13-char window: each leading '0' contributes
  * 4 zero bits, the first nonzero nibble 1–4 by its high bit; all
  * zeros → 53). Exists because the Column-level form references the
  * md5 result ~13 times across its subexpressions, and under a
  * `Generate` (the profileApprox unpivot) codegen does NOT eliminate
  * common subexpressions — md5 was being recomputed per reference
  * (measured 5.8 s → 0.4 s on the 6-column profile at sf0.1). The
  * VALUE is unchanged, so the DuckDB oracles replay it verbatim. */
case class Md5LanePack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "md5_lane_pack"

  def build(hex: org.apache.spark.unsafe.types.UTF8String): Int = {
    val s = hex.toString
    val bucket = Integer.parseInt(s.substring(0, 2), 16)
    var i = 2
    var zeros = 0
    while (i < 15 && s.charAt(i) == '0') { zeros += 1; i += 1 }
    val rho =
      if (zeros == 13) 53
      else {
        val nibble = Character.digit(s.charAt(i), 16)
        val head =
          if (nibble >= 8) 1 else if (nibble >= 4) 2
          else if (nibble >= 2) 3 else 4
        4 * zeros + head
      }
    bucket * 64 + rho
  }

  override def nullSafeEval(input: Any): Any =
    build(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5lane", this, classOf[Md5LanePack].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.build($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** cms_pos_xx(key, depth, width): production-speed Count-Min lanes —
  * ONE xxhash64 per key, split into two 32-bit halves, and the depth
  * cell positions derived as `(h1 + r·h2) mod width` (Kirsch &
  * Mitzenmacher 2006: two hash functions simulate any number of
  * Count-Min rows with the same error guarantee; `h2 |= 1` avoids the
  * degenerate all-rows-identical case). Returns `array<int>` of
  * length `depth` — `posexplode` yields the same (r, pos) cell pairs
  * as the portable [[graft.ops.Sketches.cmsSketch]] layout, so the
  * counter matrix schema and the additive merge are unchanged.
  *
  * Fast twin of the md5 lane (VERDICT r10 #2): the portable form pays
  * depth md5s + hex-string arithmetic per row; this is one hash + one
  * multiply-add per row. Point estimates keep the one-sided
  * no-undercount guarantee (WebCorpusSpec gates it) but are not
  * DuckDB-replayable — the md5 form stays the oracle gate. */
case class CmsPosXx(child: Expression, depth: Int, width: Int)
  extends UnaryExpression {
  require(depth > 0 && width > 0)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cms_pos_xx"

  def build(key: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val h = XXH64.hashUTF8String(key, 42L)
    val h1 = h & 0xFFFFFFFFL
    val h2 = (h >>> 32) | 1L
    val out = new Array[Int](depth)
    var r = 0
    while (r < depth) {
      // h1 + r·h2 < 2^32 + depth·2^32 — no overflow for any sane depth
      out(r) = ((h1 + r * h2) % width).toInt
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    build(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsxx", this, classOf[CmsPosXx].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.build($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** cdc_bounds(tokens, window, modulus): content-defined chunk
  * boundary positions over a token array, in one compiled pass — the
  * FastCDC/LBFS boundary rule of `graft.ops.TrainingPrep.cdcChunks`
  * (reference-free extension). Bit-faithful to the Column-combinator
  * form it replaces:
  * {{{
  *   concat(array(0),
  *     filter(when(n-1 >= window, sequence(window, n-1))
  *              .otherwise(array()),
  *       i -> conv(substring(md5(concat_ws(" ",
  *              slice(toks, i-window+1, window))), 1, 15), 16, 10)
  *              .cast(long) % modulus === 0),
  *     array(n))
  * }}}
  * i.e. a boundary falls after 1-indexed token i (window ≤ i ≤ n-1)
  * when the md5 of the space-joined trailing window satisfies
  * hash % modulus == 0, with [0] and [n] as sentinels.
  *
  * Motivation (VERDICT r14 #1): the combinator form was the suite's
  * only interpreted hot loop — per candidate position it rebuilt the
  * joined window STRING, hex-encoded the full md5, substring'd 15
  * chars, and base-16-parsed them through `conv`. Here token UTF-8
  * bytes are materialized once per document and each candidate hash
  * streams those byte slices straight into a reused MessageDigest;
  * the compared integer is read as the top 60 bits of the digest —
  * `(first 8 bytes big-endian) >>> 4` — exactly the value the
  * substring(hex,1,15)+conv chain decodes (15 nibbles), with no
  * string, hex, or decimal round-trip. Null tokens are skipped like
  * `concat_ws`; null array → null. */
case class CdcBounds(child: Expression, window: Int, modulus: Int)
  extends UnaryExpression {
  require(window > 0 && modulus > 0, "window and modulus must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cdc_bounds"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_bounds expects array<string> tokens, got $other")
    }

  // MessageDigest is stateful and not thread-safe; the expression
  // object is shared across a task's rows (addReferenceObj), so keep
  // one digest per thread.
  @transient private lazy val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def build(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n - 1 < window) return new GenericArrayData(Array[Any](0, n))
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = mdLocal.get()
    val out = new java.util.ArrayList[Any](n / modulus + 2)
    out.add(0)
    i = window // boundary candidate after 1-indexed token i
    while (i <= n - 1) {
      md.reset()
      var j = i - window // 0-indexed window = tokens i-window .. i-1
      var first = true
      while (j < i) {
        if (bytes(j) != null) { // concat_ws skips nulls
          if (!first) md.update(' '.toByte)
          md.update(bytes(j))
          first = false
        }
        j += 1
      }
      val d = md.digest()
      val v = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      if (v % modulus == 0L) out.add(i)
      i += 1
    }
    out.add(n)
    val arr = new Array[Any](out.size)
    var p = 0
    while (p < arr.length) { arr(p) = out.get(p); p += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcBounds", this, classOf[CdcBounds].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.build($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column-level entry points. */
object sketches {
  import GraftShim.{column, expression}

  def vec_dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))
  def vec_dist2(a: Column, b: Column): Column = column(VecDist2(expression(a), expression(b)))
  def vec_dist2_long(a: Column, b: Column): Column =
    column(VecDist2Long(expression(a), expression(b)))
  def vec_sub_long(a: Column, b: Column): Column =
    column(VecSubLong(expression(a), expression(b)))
  def vec_argmin_long(x: Column, codebook: Array[Array[Long]]): Column =
    column(VecArgminLong(expression(x), codebook))
  def vec_top_cells_dist2(x: Column, codebook: Array[Array[Double]], n: Int): Column =
    column(VecTopCellsDist2(expression(x), codebook, n))
  def pq_adc(codes: Column, qtable: Column, ksub: Int): Column =
    column(PqAdcDist(expression(codes), expression(qtable), ksub))
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def simhash_md5_60(tokens: Column): Column = column(SimHashMd5_60(expression(tokens)))
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    column(MinHashSig(expression(shingles), numHashes))
  def minhash_md5(shingles: Column, numHashes: Int): Column =
    column(MinHashMd5(expression(shingles), numHashes))
  def shingle_set(text: Column, k: Int): Column =
    column(ShingleSet(expression(text), k))
  def shingle_set_n(text: Column, k: Int): Column =
    column(ShingleSet(expression(text), k, withSize = true))
  def shingles_all(text: Column, k: Int): Column =
    column(ShingleSet(expression(text), k, dedupe = false))
  def create_ids(ids: Column, nums: Column): Column =
    column(CreateIds(expression(ids), expression(nums)))
  def fingerprint64(text: Column): Column = column(Fingerprint64(expression(text)))
  def avg_token_len(text: Column): Column = column(AvgTokenLen(expression(text)))
  def token_set_count(tokens: Column, words: Seq[String]): Column =
    column(TokenSetCount(expression(tokens), words))
  def token_stats(text: Column): Column = column(TokenStats(expression(text)))
  def nfc(text: Column): Column = column(NfcNormalize(expression(text)))
  def hll_lane_xx(key: Column): Column = column(HllLaneXx(expression(key)))
  def md5_lane_pack(hex: Column): Column = column(Md5LanePack(expression(hex)))
  def cms_pos_xx(key: Column, depth: Int, width: Int): Column =
    column(CmsPosXx(expression(key), depth, width))
  def cdc_bounds(tokens: Column, window: Int, modulus: Int): Column =
    column(CdcBounds(expression(tokens), window, modulus))

  /** Register SQL names on a session (tests / spark.sql users). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      es => VecDot(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "scala_udf")
  }
}
