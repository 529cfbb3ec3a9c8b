package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the dedup pipeline. Semantically identical to the
  * composable form (`filter(split(lower(text)))` → k-gram `transform` →
  * `array_min(transform(md5))`, mirrored by the DuckDB oracles), but
  * evaluated as straight JVM loops: Spark's higher-order functions interpret
  * an expression tree per element, which at numPerm × shingles × docs lambda
  * evaluations dominates the runtime of the whole LSH pipeline.
  */
object TextKernels {

  /** Unicode NFC normalization. Pure-ASCII input (the overwhelmingly
    * common case in web corpora) is detected by a raw byte scan — ASCII is
    * always NFC — and returns the input object with ZERO allocation; only
    * strings containing a byte ≥ 0x80 pay the String decode +
    * isNormalized check, and only genuinely denormalized ones pay the
    * compose. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s // pure ASCII: already NFC, no allocation
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Distinct lowercase word k-grams of a text (whitespace tokens, empties
    * dropped, first-occurrence order). ≡ the shinglesExpr/shinglesSql HOFs. */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.toLowerCase.split(' ').filter(_.nonEmpty)
    val out = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      out.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var n = 0
    while (it.hasNext) { arr(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(arr)
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val sb = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      sb(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(sb)
  }

  /** Unsigned lexicographic compare of equal-length digests — identical to
    * comparing their lowercase-hex encodings as strings (hex digit order is
    * monotone in nibble value). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** 32-bit SimHash over whitespace tokens (multiplicity-weighted): bit j of
    * md5-hex nibble j/4 (bit j%4); fingerprint bit set iff the ±1 sum over
    * tokens is positive. ≡ the explode + 32-sum-aggregate formulation the
    * DuckDB oracle uses, folded into one compiled per-row pass. */
  def simhash32(text: UTF8String): Long = {
    val toks = text.toString.toLowerCase.split(' ')
    val md = MessageDigest.getInstance("MD5")
    val counts = new Array[Int](32)
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) {
        md.reset()
        val d = md.digest(toks(t).getBytes("UTF-8"))
        var j = 0
        while (j < 32) {
          // hex nibble j/4 of the digest: even index = high nibble of byte
          val nibIdx = j / 4
          val b = d(nibIdx / 2)
          val nib = if (nibIdx % 2 == 0) (b >> 4) & 0xf else b & 0xf
          counts(j) += 2 * ((nib >> (j % 4)) & 1) - 1
          j += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** MinHash signature: for each perm i, min over shingles of
    * md5Hex("i|" + shingle). ≡ array_min(transform(shs, s -> md5('i|'||s)))
    * per perm; null when there are no shingles (array_min of empty). */
  def minhashSignature(shingles: ArrayData, numPerm: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](numPerm)
    val prefixes = Array.tabulate(numPerm)(i => s"$i|".getBytes("UTF-8"))
    var s = 0
    while (s < n) {
      val shBytes = shingles.getUTF8String(s).getBytes
      var i = 0
      while (i < numPerm) {
        md.reset()
        md.update(prefixes(i))
        md.update(shBytes)
        val d = md.digest()
        if (mins(i) == null || less(d, mins(i))) mins(i) = d
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(d => UTF8String.fromString(hex(d))): Array[Any])
  }
}

/** Unicode NFC canonical-composition normalization — the curation step
  * that runs BEFORE any hashing/dedup so byte-different encodings of the
  * same text (e + combining acute vs é) hash identically. NFC, not NFKC:
  * canonical composition is semantics-preserving, while compatibility
  * folding (① → 1) changes content and belongs to a separate opt-in pass.
  * Fast path: `Normalizer.isNormalized` is a cheap scan and almost always
  * true on real corpora — the input UTF8String is returned as-is with no
  * allocation; only denormalized strings pay the compose. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string input, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.nfcNormalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfcNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word-k-gram shingles of a string column. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs a string input, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wordShingles(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordShingles($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature array over a shingle-array column (null on empty). */
case class MinHashSignature(child: Expression, numPerm: Int) extends UnaryExpression {
  require(numPerm >= 1, "numPerm must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<string>, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhashSignature(input.asInstanceOf[ArrayData], numPerm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.TextKernels.minhashSignature($c, $numPerm);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 32-bit SimHash fingerprint of a string column. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash32 needs a string input, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash32(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column API for the kernels. */
object TextFns {
  def wordShingles(text: Column, k: Int): Column =
    shim.column(WordShingles(shim.expression(text), k))
  def minhashSignature(shingles: Column, numPerm: Int): Column =
    shim.column(MinHashSignature(shim.expression(shingles), numPerm))
  def simhash32(text: Column): Column =
    shim.column(SimHash32(shim.expression(text)))
  def nfcNormalize(text: Column): Column =
    shim.column(NfcNormalize(shim.expression(text)))
}
