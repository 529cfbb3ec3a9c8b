package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric arrays, accumulating in double in
  * index order — the exact left-fold the oracle computes
  * (`list_reduce(list_transform(...))`), but compiled to a tight Java loop
  * instead of Spark's interpreted higher-order-function lambdas (HOFs like
  * `aggregate`/`zip_with` evaluate an expression tree per element; on an
  * O(pairs × dims) similarity kernel that interpretation dominates the
  * query).
  *
  * Semantics: Σ_i l[i]·r[i] for i < min(|l|,|r|), each element widened to
  * double before multiply — bit-identical to the interpreted/oracle fold.
  * A NULL element inside the folded range yields NULL (the interpreted
  * `aggregate(zip_with(...))` result: `x * NULL` is NULL and the fold
  * absorbs it); the per-lane check is only emitted when the array type says
  * `containsNull`, so dense embedding schemas keep the branch-free loop.
  *
  * `nullOnSizeMismatch = true` returns NULL when the lengths differ —
  * `zip_with`'s null-padding makes the interpreted fold NULL there, and
  * baking the guard into the kernel (instead of wrapping
  * `If(size(a)=size(b), …)` around it) means [[DotProductRewrite]] never
  * duplicates the input expressions, so COMPUTED vectors (normalized,
  * sliced, …) are rewritten too and evaluate once.
  */
case class ArrayDot(left: Expression, right: Expression,
    nullOnSizeMismatch: Boolean = false) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  // total on any dataType: `nullable` may be consulted before
  // checkInputDataTypes rejects a mistyped call — never cast blindly there
  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def nullable: Boolean =
    super.nullable || nullOnSizeMismatch || elemNullable(left) || elemNullable(right)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"arraydot needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (nullOnSizeMismatch && a.numElements() != b.numElements()) return null
    val n = math.min(a.numElements(), b.numElements())
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    val aCN = elemNullable(left)
    val bCN = elemNullable(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if ((aCN && a.isNullAt(i)) || (bCN && b.isNullAt(i))) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String) =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, NOT fixed names: two ArrayDots in one codegen'd stage
      // (dot(a,b) + norm's dot(v,v)) otherwise redeclare the same Java
      // locals and the whole stage falls back to interpreted eval
      val n = ctx.freshName("adN")
      val acc = ctx.freshName("adAcc")
      val i = ctx.freshName("adI")
      val nullChecks =
        (if (elemNullable(left)) Seq(s"$a.isNullAt($i)") else Nil) ++
          (if (elemNullable(right)) Seq(s"$b.isNullAt($i)") else Nil)
      val elemGuard = if (nullChecks.isEmpty) ""
        else s"if (${nullChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
      val (sizeOpen, sizeClose) = if (nullOnSizeMismatch)
        (s"if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; } else {", "}")
      else ("", "")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |$sizeOpen
         |for (int $i = 0; $i < $n; $i++) {
         |  $elemGuard
         |  $acc += ${getter(left, a, i)} * ${getter(right, b, i)};
         |}
         |$sizeClose
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static kernel for [[CellDistances]]. */
object VecKernels {
  /** Exact int64 L2 distance from a quantized vector to EVERY codebook
    * centroid, in centroid order — Σ_d (qv[d]−c[d])² per centroid. */
  def cellDistances(qv: ArrayData, cb: Array[Array[Long]]): ArrayData = {
    val out = new Array[Any](cb.length)
    var k = 0
    while (k < cb.length) {
      val c = cb(k)
      var s = 0L
      var d = 0
      val n = math.min(qv.numElements(), c.length)
      while (d < n) {
        val diff = qv.getLong(d) - c(d)
        s += diff * diff
        d += 1
      }
      out(k) = s
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ±1/√k random projection (Johnson–Lindenstrauss, Achlioptas 2001
    * sign-matrix form): y_r = (Σ_d sign(r,d)·x_d) / √k, fold d-ascending,
    * sign(r,d) from the repo's standard integer hash over g = r·64+d+1.
    * √16 = 4 is exact, so the scale divide is one well-defined IEEE op
    * mirrored by the oracle. */
  def jlProject(emb: ArrayData, outDims: Int, floatElems: Boolean): ArrayData = {
    val n = emb.numElements()
    // Derive the seed stride from the INPUT length and the scale from
    // outDims (round-7 advice: the hardwired 64/÷4.0 silently mis-scaled
    // any other shape). At the shipped 64→16 shape both are bit-identical
    // to the old literals: r·64+d+1, and √16 = 4 exactly in IEEE.
    val scale = math.sqrt(outDims.toDouble)
    val out = new Array[Any](outDims)
    var r = 0
    while (r < outDims) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        val g = r.toLong * n + d + 1L
        val sign = if ((g * g * 2654435761L + g * 40503L) % 1000L < 500L) 1.0 else -1.0
        val x = if (floatElems) emb.getFloat(d).toDouble else emb.getDouble(d)
        acc += sign * x
        d += 1
      }
      out(r) = acc / scale
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Clustered-fixture embedding generator — see [[ClusteredEmbGen]]. */
  def clusteredEmb(vecId: Long): ArrayData = {
    val out = new Array[Any](64)
    var k = 1L
    while (k <= 64) {
      val g = (vecId % 8) * 64 + k
      val sign = if ((g * g * 2654435761L + g * 40503L) % 1000L < 500L) 1.0 else -1.0
      val noise = (((vecId * 2654435761L + k * 40503L) % 1000L).toDouble / 1000.0 - 0.5) * 0.4
      out((k - 1).toInt) = sign + noise
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** 16-dim ±1/√16 Johnson–Lindenstrauss projection of an embedding column
  * (see [[VecKernels.jlProject]]). */
case class JlProject(child: Expression, outDims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jl_project needs array<float|double>, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    VecKernels.jlProject(input.asInstanceOf[ArrayData], outDims, floatElems)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecKernels.jlProject($c, $outDims, $floatElems)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deterministic clustered-fixture embedding from a vec_id column — the
  * compiled twin of [[graft.ext.SimilarityOps]]' `clusteredEmbExpr` HOF
  * (same integer hash, same IEEE op order: sign ± 1.0 by cluster-seeded
  * hash, plus a 0.4-amplitude per-lane noise term). Exists because any
  * consumer that element_at's the HOF-generated column inside ANOTHER
  * lambda (e.g. the int-quantize transform) re-evaluates the whole
  * 64-lane generator per element after projection collapse — O(64²)
  * interpreted work per row; the kernel is one compiled pass and CSE
  * dedupes repeated calls. */
case class ClusteredEmbGen(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"clustered_emb needs bigint, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    VecKernels.clusteredEmb(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.clusteredEmb($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distances from a quantized int64 vector column to every centroid of a
  * plan-time codebook. The composable form is
  * `transform(<512-literal array-of-arrays>, c -> aggregate(...))` — an
  * interpreted HOF that re-materializes the literal codebook array PER ROW
  * and hands Catalyst a ~1500-node tree to analyze per query; the kernel
  * holds the codebook as one referenced object and runs the k·d loop
  * compiled (same exact integer arithmetic, same oracle). */
case class CellDistances(child: Expression, codebook: Seq[Seq[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val cb: Array[Array[Long]] = codebook.map(_.toArray).toArray
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cell_distances needs array<bigint>, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    VecKernels.cellDistances(input.asInstanceOf[ArrayData], cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", cb, "long[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.cellDistances($c, $cbRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static kernels for the product-quantization read/train path. All exact
  * int64 arithmetic; argmin ties resolve to the FIRST minimum (the
  * `array_position(ds, array_min(ds))` rule the HOF forms and the DuckDB
  * oracles use). */
object PqKernels {
  /** argmin_j Σ_d (sv[d] − cb(m)(j)(d))² — subspace assignment. */
  def assign(m: Int, sv: ArrayData, cb: Array[Array[Array[Long]]]): Int = {
    val cm = cb(m)
    var best = 0
    var bestD = Long.MaxValue
    var j = 0
    while (j < cm.length) {
      val c = cm(j)
      var s = 0L
      var d = 0
      while (d < c.length) { val diff = sv.getLong(d) - c(d); s += diff * diff; d += 1 }
      if (s < bestD) { bestD = s; best = j }
      j += 1
    }
    best
  }

  /** Per-subspace codes of a full quantized vector: code m =
    * argmin_j Σ_d (qv[m·w+d] − cb(m)(j)(d))², w = subspace width. */
  def codes(qv: ArrayData, cb: Array[Array[Array[Long]]]): ArrayData = {
    val msub = cb.length
    val w = cb(0)(0).length
    val out = new Array[Any](msub)
    var m = 0
    while (m < msub) {
      val cm = cb(m)
      var best = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < cm.length) {
        val c = cm(j)
        var s = 0L
        var d = 0
        while (d < w) { val diff = qv.getLong(m * w + d) - c(d); s += diff * diff; d += 1 }
        if (s < bestD) { bestD = s; best = j }
        j += 1
      }
      out(m) = best
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Double-precision variant of [[codes]]+reconstruction for the
    * FORMULA-codebook PQ ops (float embeddings, double centroids): returns
    * (codes, recon_sse) in one pass. Fold order matches the HOF forms —
    * per (m, j) the d-ascending sum, argmin first-min, then the recon
    * accumulates per-m partial sums in m order — so doubles are
    * bit-identical to the interpreted expressions and the oracles. */
  def codesReconD(emb: ArrayData, cb: Array[Array[Array[Double]]], floatElems: Boolean)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val msub = cb.length
    val kk = cb(0).length
    val w = cb(0)(0).length
    val codes = new Array[Int](msub)
    var m = 0
    while (m < msub) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < kk) {
        val c = cb(m)(j)
        var s = 0.0
        var d = 0
        while (d < w) {
          val e = if (floatElems) emb.getFloat(m * w + d).toDouble else emb.getDouble(m * w + d)
          val diff = e - c(d)
          s += diff * diff
          d += 1
        }
        if (s < bestD) { bestD = s; best = j }
        j += 1
      }
      codes(m) = best
      m += 1
    }
    var acc = 0.0
    m = 0
    while (m < msub) {
      val c = cb(m)(codes(m))
      var s = 0.0
      var d = 0
      while (d < w) {
        val e = if (floatElems) emb.getFloat(m * w + d).toDouble else emb.getDouble(m * w + d)
        val diff = e - c(d)
        s += diff * diff
        d += 1
      }
      acc += s
      m += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        codes.map(Int.box): Array[Any]), acc))
  }

  /** Double-precision ADC: Σ_m Σ_d (qe[m·w+d] − cb(m)(codes(m))(d))²,
    * per-m partial sums accumulated in m order (HOF fold parity). */
  def adcD(qe: ArrayData, codes: ArrayData, cb: Array[Array[Array[Double]]],
      floatElems: Boolean): Double = {
    val msub = cb.length
    val w = cb(0)(0).length
    var acc = 0.0
    var m = 0
    while (m < msub) {
      val c = cb(m)(codes.getInt(m))
      var s = 0.0
      var d = 0
      while (d < w) {
        val e = if (floatElems) qe.getFloat(m * w + d).toDouble else qe.getDouble(m * w + d)
        val diff = e - c(d)
        s += diff * diff
        d += 1
      }
      acc += s
      m += 1
    }
    acc
  }

  /** Asymmetric distance: Σ_m Σ_d (qv[m·w+d] − cb(m)(codes(m))(d))². */
  def adc(qv: ArrayData, codes: ArrayData, cb: Array[Array[Array[Long]]]): Long = {
    val msub = cb.length
    val w = cb(0)(0).length
    var acc = 0L
    var m = 0
    while (m < msub) {
      val c = cb(m)(codes.getInt(m))
      var d = 0
      while (d < w) { val diff = qv.getLong(m * w + d) - c(d); acc += diff * diff; d += 1 }
      m += 1
    }
    acc
  }
}

/** Subspace assignment j for a (subspace index, subvector) row against a
  * plan-time 3-level codebook. */
case class PqAssign(m: Expression, sv: Expression, codebook: Seq[Seq[Seq[Long]]])
    extends BinaryExpression {
  @transient private lazy val cb: Array[Array[Array[Long]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  override def left: Expression = m
  override def right: Expression = sv
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (m.dataType, sv.dataType) match {
      case (IntegerType, ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_assign needs (int, array<bigint>), got $other")
    }
  override def nullSafeEval(mv: Any, svv: Any): Any =
    PqKernels.assign(mv.asInstanceOf[Int], svv.asInstanceOf[ArrayData], cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "long[][][]")
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PqKernels.assign($a, $b, $cbRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(m = l, sv = r)
}

/** Per-subspace PQ codes of a full quantized vector. */
case class PqCodes(child: Expression, codebook: Seq[Seq[Seq[Long]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val cb: Array[Array[Array[Long]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_codes needs array<bigint>, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.codes(input.asInstanceOf[ArrayData], cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "long[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.codes($c, $cbRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric (query-vector vs candidate-codes) PQ distance. */
case class PqAdc(qv: Expression, codes: Expression, codebook: Seq[Seq[Seq[Long]]])
    extends BinaryExpression {
  @transient private lazy val cb: Array[Array[Array[Long]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  override def left: Expression = qv
  override def right: Expression = codes
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (qv.dataType, codes.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc needs (array<bigint>, array<int>), got $other")
    }
  override def nullSafeEval(q: Any, c: Any): Any =
    PqKernels.adc(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "long[][][]")
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PqKernels.adc($a, $b, $cbRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(qv = l, codes = r)
}

/** (codes, recon_sse) of a float-embedding column against a plan-time
  * double codebook — the formula-codebook PQ encode. */
case class PqCodesReconD(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("recon_sse", DoubleType, nullable = false)))
  private def floatElems: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_codes_recon needs array<float|double>, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.codesReconD(input.asInstanceOf[ArrayData], cb, floatElems)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebookD", cb, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.codesReconD($c, $cbRef, $floatElems)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Double ADC of a float query vector against candidate codes under a
  * plan-time double codebook. */
case class PqAdcD(qe: Expression, codes: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {
  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  override def left: Expression = qe
  override def right: Expression = codes
  override def dataType: DataType = DoubleType
  private def floatElems: Boolean = qe.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (qe.dataType, codes.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_d needs (array<float|double>, array<int>), got $other")
    }
  override def nullSafeEval(q: Any, c: Any): Any =
    PqKernels.adcD(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], cb, floatElems)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebookD", cb, "double[][][]")
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PqKernels.adcD($a, $b, $cbRef, $floatElems)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(qe = l, codes = r)
}

/** Column-level vector helpers built on [[ArrayDot]]. */
object Vec {
  import org.apache.spark.sql.functions.sqrt
  import org.apache.spark.sql.graft.shim

  def dot(a: Column, b: Column): Column =
    shim.column(ArrayDot(shim.expression(a), shim.expression(b)))

  /** L2 norm = sqrt(dot(v, v)) — same squared-fold the oracle uses. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Int L2 distances to every centroid of a plan-time codebook. */
  def cellDistances(qv: Column, codebook: Seq[Seq[Long]]): Column =
    shim.column(CellDistances(shim.expression(qv), codebook))
  def clusteredEmb(vecId: Column): Column =
    shim.column(ClusteredEmbGen(shim.expression(vecId)))
  def jlProject(emb: Column, outDims: Int): Column =
    shim.column(JlProject(shim.expression(emb), outDims))

  def pqAssign(m: Column, sv: Column, cb: Seq[Seq[Seq[Long]]]): Column =
    shim.column(PqAssign(shim.expression(m), shim.expression(sv), cb))
  def pqCodes(qv: Column, cb: Seq[Seq[Seq[Long]]]): Column =
    shim.column(PqCodes(shim.expression(qv), cb))
  def pqAdc(qv: Column, codes: Column, cb: Seq[Seq[Seq[Long]]]): Column =
    shim.column(PqAdc(shim.expression(qv), shim.expression(codes), cb))
  def pqCodesReconD(emb: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    shim.column(PqCodesReconD(shim.expression(emb), cb))
  def pqAdcD(qe: Column, codes: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    shim.column(PqAdcD(shim.expression(qe), shim.expression(codes), cb))

  /** Bounded grouped top-k ([[TopKByDesc]]): k best payload structs by
    * (key DESC, tie ASC), as an aggregate — map-side partial, no window. */
  def topkBy(key: Column, tie: Column, payload: Column, k: Int): Column =
    shim.column(TopKByDesc(shim.expression(key), shim.expression(tie),
      shim.expression(payload), k).toAggregateExpression())
}
