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

  /** Positional word-k-gram 32-bit hashes for the winnowing family —
    * one long per gram position, in position order (NOT distinct; an
    * empty array when the doc has under k tokens). ≡ the HOF form
    * `transform(sequence(..), i -> conv(substring(md5(gram), 1, 8), 16,
    * 10))` the oracle mirrors: the first 8 hex chars of an md5 ARE its
    * first 4 bytes big-endian, read here straight off the digest — no
    * per-gram hex encode/parse, no intermediate gram-string array, and no
    * per-element lambda interpretation (the [[wordShingles]] rationale;
    * the HOF stage measured ~17 CPU-s/run at sf0.1, dominated by exactly
    * that churn). */
  def winnowGramHashes(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.toLowerCase.split(' ').filter(_.nonEmpty)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(i) = java.lang.Long.valueOf(
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Positional word-k-gram md5 hex digests — [[winnowGramHashes]] with
    * the FULL 32-hex-char digest (dup-spans joins on the whole md5, not a
    * 32-bit prefix). Position order, not distinct; empty under k tokens. */
  def gramMd5s(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.toLowerCase.split(' ').filter(_.nonEmpty)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(hex(
        md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-token (word, gear-hash) pairs for CDC chunking — one struct per
    * whitespace token in position order (empty array for token-free text).
    * ≡ the HOF form `transform(toks, w -> named_struct('w', w, 'g',
    * aggregate(transform(sequence(1, length(w)), i ->
    * cast(ascii(substring(w, i, 1)) as bigint)), 0L, (h, c) -> (h*31 + c)
    * % 1000000007)))`: a triple-nested interpreted lambda — per token, per
    * character — that dominated `dedup_cdc_chunks`; here one straight
    * pass over the codepoints (Spark's substring/ascii pair yields the
    * character's codepoint — asserted against the HOF in KernelsSpec,
    * including non-ASCII). */
  def cdcGearTokens(text: UTF8String): ArrayData = {
    val toks = text.toString.toLowerCase.split(' ').filter(_.nonEmpty)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      var h = 0L
      var j = 0
      while (j < w.length) {
        val cp = w.codePointAt(j)
        h = (h * 31 + cp) % 1000000007L
        j += Character.charCount(cp)
      }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(w), h))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** First-char-indexed, longest-first vocab lookup for [[bpeCount]]:
    * slot c holds every vocab entry starting with ASCII char c, sorted by
    * length descending, so a position probes only the few entries that can
    * possibly match instead of the whole vocabulary. */
  def buildBpeTable(vocab: Seq[String]): Array[Array[String]] = {
    val table = Array.fill(128)(Array.empty[String])
    vocab.distinct.groupBy(_.charAt(0)).foreach { case (c, vs) =>
      require(c < 128, s"bpe vocab entries must start with an ASCII char: '$c'")
      table(c) = vs.sortBy(-_.length).toArray
    }
    table
  }

  /** Greedy longest-match subword count — the compiled twin of the
    * `aggregate(sequence(...))` fold in [[graft.ext.TextOps]] (kept there
    * as the semantic spec): at each position take the longest matching
    * vocab entry, else advance one CODEPOINT. Spark HOF lambdas interpret
    * an expression tree per element; at len × |V| probes per document the
    * interpreted fold measured 112 s for the sf0.1 corpus vs ~1 s compiled
    * (SCALING.md r7). ASCII-only vocab means a code-unit `regionMatches`
    * can never match half a surrogate pair, and the non-match branch
    * advances by `Character.charCount`, so the walk is codepoint-exact —
    * identical counts to the substring()-based fold and the DuckDB
    * recursive oracle on any input. */
  def bpeCount(text: UTF8String, table: Array[Array[String]]): Long = {
    val s = text.toString
    val len = s.length
    var i = 0
    var n = 0L
    while (i < len) {
      val c = s.charAt(i)
      var adv = 0
      if (c < 128) {
        val cands = table(c)
        var j = 0
        while (adv == 0 && j < cands.length) {
          val v = cands(j)
          if (s.regionMatches(i, v, 0, v.length)) adv = v.length
          j += 1
        }
      }
      if (adv == 0) adv = Character.charCount(s.codePointAt(i))
      i += adv
      n += 1L
    }
    n
  }

  /** One-pass Gopher signal counters — n_tok, word-length sum, trigram
    * total/distinct, stopword hits — as a single compiled walk over the
    * tokens. The composable HOF form (kept in [[graft.ext.TextOps]] as the
    * semantic spec) inlines the tokenizer INTO each trigram lambda when
    * Catalyst collapses the projection, so `filter(keep)`-style consumers
    * re-tokenized the document per trigram element — O(n²) interpreted work
    * that measured 22 s for the sf0.1 corpus vs 0.4 s through this kernel
    * (SCALING.md r7). Tokenization is [[wordShingles]]' exact rule
    * (lowercase, single-space split, empties dropped); word length counts
    * CODEPOINTS like Spark's `length`. */
  def gopherSignals(text: UTF8String, stopSet: java.util.HashSet[String])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toString.toLowerCase.split(' ').filter(_.nonEmpty)
    var lenSum = 0L
    var stopCnt = 0L
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      lenSum += w.codePointCount(0, w.length)
      if (stopSet.contains(w)) stopCnt += 1L
      i += 1
    }
    val tgTotal = math.max(toks.length - 2, 0).toLong
    val seen = new java.util.HashSet[String]()
    i = 0
    while (i + 3 <= toks.length) {
      seen.add(new java.lang.StringBuilder(toks(i)).append(' ')
        .append(toks(i + 1)).append(' ').append(toks(i + 2)).toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length.toLong, lenSum, tgTotal, seen.size.toLong, stopCnt))
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

  /** One-pass quality-classifier featurization: struct<n_tok,
    * feats array<bigint>> where feats[j] counts tokens whose SECOND md5
    * hex digit (the low nibble of digest byte 0) equals j — exactly
    * `conv(substring(md5(t), 2, 1), 16, 10)` bin-counted, the single-hash
    * featurization [[graft.ext.TextOps.qualityTrainFeatures]] specifies.
    * The HOF form pays one interpreted md5 lambda per token PLUS 16
    * interpreted filter passes per document; this walk hashes each token
    * once and increments one bin — the r7 compile-the-hotspot discipline
    * (text_quality_train read 20.3× at the 1000× store through the HOF
    * path; featurization was 135 of its 147 s — SCALING.md r10.2). */
  def qtFeatures(text: UTF8String, dims: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toString.toLowerCase.split(' ')
    val md = MessageDigest.getInstance("MD5")
    val bins = new Array[Long](dims)
    var n = 0L
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        n += 1L
        md.reset()
        val d = md.digest(toks(i).getBytes("UTF-8"))
        val nib = d(0) & 0xf
        if (nib < dims) bins(nib) += 1L
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, new GenericArrayData(bins)))
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

/** Positional k-gram full-md5-hex array of a string column (dup-spans). */
case class GramMd5s(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "gram width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gram_md5s needs a string input, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.gramMd5s(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.gramMd5s($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-token (word, gear-hash) struct array of a string column (CDC). */
case class CdcGearTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("w", StringType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "g", org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cdc_gear_tokens needs a string input, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.cdcGearTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.cdcGearTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Positional k-gram 32-bit hash array of a string column (winnowing). */
case class WinnowGramHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "gram width must be >= 1")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_gram_hashes needs a string input, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.winnowGramHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.winnowGramHashes($c, $k)")
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

/** Greedy longest-match subword count of a string column over a fixed
  * vocabulary (see [[TextKernels.bpeCount]]). */
case class BpeCount(child: Expression, vocab: Seq[String]) extends UnaryExpression {
  @transient private lazy val table: Array[Array[String]] =
    TextKernels.buildBpeTable(vocab)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_count needs a string input, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.bpeCount(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.bpeCount($c, $tableRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass Gopher quality signals of a string column: struct<n_tok,
  * word_len_sum, tg_total, tg_distinct, stop_cnt>, all BIGINT (see
  * [[TextKernels.gopherSignals]]). */
case class GopherSignals(child: Expression, stopWords: Seq[String]) extends UnaryExpression {
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopWords.foreach(s.add)
    s
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tok", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("word_len_sum", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("tg_total", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("tg_distinct", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("stop_cnt", org.apache.spark.sql.types.LongType, nullable = false)))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gopher_signals needs a string input, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.gopherSignals(input.asInstanceOf[UTF8String], stopSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.gopherSignals($c, $setRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass quality-featurization of a string column: struct<n_tok,
  * feats array<bigint>> (see [[TextKernels.qtFeatures]]). */
case class QtFeatures(child: Expression, dims: Int) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tok", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("feats",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false),
      nullable = false)))
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"qt_features needs a string input, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.qtFeatures(input.asInstanceOf[UTF8String], dims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.qtFeatures($c, $dims)")
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
  def winnowGramHashes(text: Column, k: Int): Column =
    shim.column(WinnowGramHashes(shim.expression(text), k))
  def cdcGearTokens(text: Column): Column =
    shim.column(CdcGearTokens(shim.expression(text)))
  def gramMd5s(text: Column, k: Int): Column =
    shim.column(GramMd5s(shim.expression(text), k))
  def simhash32(text: Column): Column =
    shim.column(SimHash32(shim.expression(text)))
  def nfcNormalize(text: Column): Column =
    shim.column(NfcNormalize(shim.expression(text)))
  def bpeCount(text: Column, vocab: Seq[String]): Column =
    shim.column(BpeCount(shim.expression(text), vocab))
  def gopherSignals(text: Column, stopWords: Seq[String]): Column =
    shim.column(GopherSignals(shim.expression(text), stopWords))
  def qtFeatures(text: Column, dims: Int): Column =
    shim.column(QtFeatures(shim.expression(text), dims))
}
