package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (MOSS-style): rolling xxhash64 of character
  * k-grams, minimum per sliding window of `w`, distinct in first-occurrence
  * order.
  *
  * The composable form (`transform(sequence…, i -> xxhash64(substr…))` nested
  * under a second `transform` + `array_min(slice…)` + `array_distinct`) is
  * semantically identical but runs on Catalyst's INTERPRETED higher-order-
  * function path: every k-gram evaluates an expression subtree and allocates
  * a substring, every window allocates a slice array — the single most
  * expensive per-row computation in the engine (bench q59). This expression
  * does one pass: char→byte offsets computed once, each k-gram hashed
  * directly from the original UTF-8 buffer (no substring allocation), window
  * minima over a primitive array. Bit-identical to the composable form
  * (same XXH64 seed 42 over the same UTF-8 bytes — pinned by the parity
  * test), ~an order of magnitude less work per row, and it keeps the whole
  * stage inside codegen (`doGenCode` delegates to the same static
  * `compute`, so eval and codegen cannot drift).
  */
case class WinnowingFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")
  require(w >= 1, s"w must be >= 1, got $w")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnowing_fingerprints requires a string, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    WinnowingFingerprintsExpr.compute(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowingFingerprintsExpr.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnowing_fingerprints"
}

object WinnowingFingerprintsExpr {

  private val EMPTY = new GenericArrayData(Array.emptyLongArray)

  /** One-pass winnowing over the UTF-8 buffer. Shared by interpreted eval and
    * generated code. Complexity O(chars·w) with zero per-gram allocation
    * (w is small — 4 by default; a monotonic deque would be O(chars) but
    * loses to the simple loop's branch predictability at these widths).
    */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val numBytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // char index -> byte offset, one UTF-8 walk (substr semantics are
    // per-CHARACTER: a multi-byte char counts once, same as SQL substr)
    var chars = 0
    var i = 0
    while (i < numBytes) {
      i += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
      chars += 1
    }
    val n = chars - k + 1 // k-gram count
    if (n < 1 || n - w + 1 < 1) return EMPTY
    val offsets = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < numBytes) {
      offsets(c) = i
      i += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
      c += 1
    }
    offsets(chars) = numBytes
    val hashes = new Array[Long](n)
    var j = 0
    while (j < n) {
      val bs = offsets(j)
      hashes(j) = XXH64.hashUnsafeBytes(base, off + bs, offsets(j + k) - bs, 42L)
      j += 1
    }
    val m = n - w + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    j = 0
    while (j < m) {
      var min = hashes(j)
      var t = j + 1
      while (t < j + w) {
        if (hashes(t) < min) min = hashes(t)
        t += 1
      }
      seen.add(min)
      j += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  /** Register `winnowing_fingerprints(text, k, w)` for SQL use (k, w must be
    * integer literals — they shape the computation, not the data).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnowing_fingerprints",
      exprs => fromExprs(exprs),
      "built-in")

  private[functions] def fromExprs(exprs: Seq[Expression]): Expression = {
    def lit(e: Expression, name: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
      case other =>
        throw new IllegalArgumentException(s"winnowing_fingerprints: $name must be an int literal, got $other")
    }
    exprs match {
      case Seq(t)       => WinnowingFingerprintsExpr(t, 8, 4)
      case Seq(t, a)    => WinnowingFingerprintsExpr(t, lit(a, "k"), 4)
      case Seq(t, a, b) => WinnowingFingerprintsExpr(t, lit(a, "k"), lit(b, "w"))
      case _ => throw new IllegalArgumentException("winnowing_fingerprints takes 1-3 args")
    }
  }

  /** Column-level constructor (classic-session bridge). */
  def winnowing_fingerprints(text: Column, k: Int = 8, w: Int = 4): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      WinnowingFingerprintsExpr(GraftColumnBridge.expression(text), k, w))
  }
}

/** Native one-pass character-class counts: string →
  * struct<n_chars, n_alpha, n_digit, n_punct> (ints, code-point counts).
  *
  * Replaces three full regex passes (`regexp_replace(text, "[^\p{L}]", "")`
  * + length, ditto `\p{N}` and `\p{Punct}`) each of which runs the regex
  * engine over the whole document AND allocates the stripped copy — with a
  * single code-point walk. Class semantics replicate Java regex exactly
  * (pinned by the parity test): `\p{L}` = Character.isLetter (the five L*
  * categories), `\p{N}` = Nd|Nl|No, `\p{Punct}` = the 32 POSIX ASCII
  * punctuation characters (Java's \p{Punct} is ASCII-only without
  * UNICODE_CHARACTER_CLASS).
  */
case class CharClassCountsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_class_counts requires a string, got ${other.sql}")
    }

  override def dataType: DataType = CharClassCountsExpr.schema

  override def nullSafeEval(s: Any): Any =
    CharClassCountsExpr.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharClassCountsExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_class_counts"
}

object CharClassCountsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false)))

  private def isPosixPunct(cp: Int): Boolean =
    cp < 128 && "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".indexOf(cp) >= 0

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    var chars = 0
    var alpha = 0
    var digit = 0
    var punct = 0
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      chars += 1
      if (Character.isLetter(cp)) alpha += 1
      else {
        val t = Character.getType(cp)
        if (t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
          t == Character.OTHER_NUMBER) digit += 1
        else if (isPosixPunct(cp)) punct += 1
      }
      i += Character.charCount(cp)
    }
    org.apache.spark.sql.catalyst.InternalRow(chars, alpha, digit, punct)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_class_counts",
      exprs => CharClassCountsExpr(exprs.head),
      "built-in")

  def char_class_counts(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(CharClassCountsExpr(GraftColumnBridge.expression(text)))
  }
}

/** Native MinHash signature over pre-hashed shingles (array<long> →
  * array<long> of length `numHashes`).
  *
  * Semantics are EXACTLY graft.llm.Dedup's composable form: the i-th hash
  * function is `(v & (2^62-1)) + i * (xxhash64(v, golden) & (2^57-1))`, the
  * minimum taken per i over all shingles; null elements are skipped (the
  * composable `least(m, null)` keeps m); an empty array yields Long.MaxValue
  * everywhere. The composable `aggregate(…zip_with…)` runs interpreted and
  * allocates two boxed arrays per SHINGLE; this is one primitive-array loop
  * per row — the inner kernel of every MinHash query and of
  * SimilarityJoinTransform. Parity pinned by TextExpressionsSpec.
  */
case class MinhashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 32, s"numHashes must be in [1,32], got $numHashes")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    MinhashSignatureExpr.compute(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashSignatureExpr.compute($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinhashSignatureExpr {
  private val GOLDEN = 0x9e3779b97f4a7c15L
  private val MASK62 = (1L << 62) - 1
  private val MASK57 = (1L << 57) - 1

  def compute(a: ArrayData, numHashes: Int): ArrayData = {
    val n = a.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!a.isNullAt(j)) {
        val v = a.getLong(j)
        val h1 = v & MASK62
        // Spark's xxhash64(v, lit(GOLDEN)) CHAINS its arguments (each value
        // hashed with the running result as seed, starting at 42), it does
        // not take GOLDEN as the seed — replicate that exactly for parity
        // with the composable form.
        val h2 = XXH64.hashLong(GOLDEN, XXH64.hashLong(v, 42L)) & MASK57
        var i = 0
        var h = h1
        while (i < numHashes) {
          if (h < sig(i)) sig(i) = h
          i += 1
          h += h2
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      {
        case Seq(t, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, IntegerType)) =>
          MinhashSignatureExpr(t, n)
        case _ =>
          throw new IllegalArgumentException(
            "minhash_signature(arr, numHashes) requires an int literal numHashes")
      },
      "built-in")

  def minhash_signature(shingles: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      MinhashSignatureExpr(GraftColumnBridge.expression(shingles), numHashes))
  }
}

/** Native 64-bit SimHash over a token array (array<string> → bigint).
  *
  * Per-bit majority vote over xxhash64(token, seed 42): bit j of the result
  * is set when more token hashes have bit j set than clear. Exactly
  * graft.llm.Dedup's composable form, including its null quirk (a null token
  * votes −1 on every bit — `when(null, 1).otherwise(-1)` takes the
  * otherwise branch). The composable form allocates a 64-element boxed
  * vote array per TOKEN under interpreted HOF evaluation; this is one
  * int[64] per row. Parity pinned by TextExpressionsSpec.
  */
case class Simhash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.sql}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    Simhash64Expr.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Simhash64Expr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object Simhash64Expr {

  def compute(a: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        var j = 0
        while (j < 64) { votes(j) -= 1; j += 1 }
      } else {
        val t = a.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) != 0L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64",
      exprs => Simhash64Expr(exprs.head),
      "built-in")

  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(Simhash64Expr(GraftColumnBridge.expression(tokens)))
  }
}

/** Native Unicode normalization (NFC/NFD/NFKC/NFKD) — Spark has no built-in
  * for it, yet it is the FIRST transform a multilingual training corpus
  * needs: visually identical strings with different code-point sequences
  * (composed é vs e+U+0301) break exact dedup, fingerprinting and
  * tokenization unless canonicalized.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that avoids the
  * allocation entirely for already-normalized text (the overwhelmingly
  * common case for web corpora) — the input UTF8String is returned as-is.
  * `doGenCode` delegates to the same static `compute`, so eval and codegen
  * cannot drift. Oracle parity: DuckDB's `nfc_normalize` (q132).
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType if UnicodeNormalizeExpr.forms.contains(form) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize: unknown form '$form' (NFC|NFD|NFKC|NFKD)")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize requires a string, got ${other.sql}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    UnicodeNormalizeExpr.compute(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UnicodeNormalizeExpr.compute($c, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "unicode_normalize"
}

object UnicodeNormalizeExpr {

  private[functions] val forms = Set("NFC", "NFD", "NFKC", "NFKD")

  def compute(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  private[functions] def fromExprs(exprs: Seq[Expression]): Expression = {
    def formOf(e: Expression): String = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
        v.toString.toUpperCase
      case other =>
        throw new IllegalArgumentException(
          s"unicode_normalize: form must be a string literal, got $other")
    }
    exprs match {
      case Seq(t)    => UnicodeNormalizeExpr(t, "NFC")
      case Seq(t, f) => UnicodeNormalizeExpr(t, formOf(f))
      case _ => throw new IllegalArgumentException("unicode_normalize takes 1-2 args")
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize",
      exprs => fromExprs(exprs),
      "built-in")

  def unicode_normalize(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      UnicodeNormalizeExpr(GraftColumnBridge.expression(text), form))
  }
}

/** Native md5 64-bit prefix: the packed unsigned 32-bit halves of an md5,
  * `(h1 << 32) | h2` with h1 = digest bytes 0–3 and h2 = bytes 4–7
  * (big-endian) — EXACTLY `conv(substring(md5(s), 1, 8), 16, 10)` and
  * `conv(substring(md5(s), 9, 8), 16, 10)` packed into one long.
  *
  * The composable form pays, per row: hex-encoding the 16-byte digest into
  * a 32-char string, two substring allocations, and two base-16 string
  * parses. This expression hashes the UTF-8 bytes and reads the prefix off
  * the raw digest — no hex round-trip, one pass — which matters because the
  * md5 prefix is the per-row cost of every Kirsch–Mitzenmacher Bloom probe
  * ([[graft.llm.BloomSketch]]) at 100 TB. Values are bit-identical to the
  * conv/substring formulation (parity-tested), so DuckDB oracles built on
  * the hex form stay valid. `doGenCode` delegates to the same static
  * `compute`, so eval and codegen cannot drift.
  */
case class Md5Prefix64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_prefix64 requires string, got ${other.sql}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    Md5Prefix64Expr.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Prefix64Expr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix64"
}

object Md5Prefix64Expr {

  // MessageDigest is not thread-safe; one per task thread, reset per call
  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  def compute(s: UTF8String): Long = {
    val d = digests.get()
    d.reset()
    val h = d.digest(s.getBytes)
    val h1 = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    val h2 = ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
    (h1 << 32) | h2
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix64",
      exprs => Md5Prefix64Expr(exprs.head),
      "built-in")

  def md5_prefix64(s: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(Md5Prefix64Expr(GraftColumnBridge.expression(s)))
  }
}

/** Native content-defined chunking (CDC, gear-hash / FastCDC-style): split a
  * document into variable-length chunks whose boundaries are decided by the
  * CONTENT (a rolling gear hash hitting a mask), not by fixed offsets — so
  * an insertion or deletion only moves the boundaries of the chunk it lands
  * in, and every later chunk re-synchronizes byte-for-byte. Chunk-level
  * fingerprint dedup over CDC chunks therefore survives edits that shift
  * offsets, which fixed-size chunking ([[graft.llm.Chunking]]) cannot.
  *
  * Rolling state: h = (h << 1) + GEAR(byte) over the chunk's UTF-8 bytes
  * (reset at each boundary — a 64-entry sliding influence window via the
  * shift). A boundary cuts AFTER a character when at least `minLen`
  * characters have accumulated and (h & mask) == 0, where
  * mask = 2^maskBits − 1 → expected chunk length ≈ minLen + 2^maskBits
  * characters; `maxLen` forces a cut (pathological content — e.g. one
  * repeated byte whose hash never hits the mask — degrades to fixed-size,
  * never unbounded). Boundaries are always CHARACTER-aligned: multi-byte
  * code points feed the hash byte-by-byte but can never be split.
  *
  * One O(bytes) pass, zero per-chunk allocation beyond the output slices
  * (UTF8String substrings share the input buffer); `doGenCode` delegates to
  * the same static `compute`, so eval and codegen cannot drift. The gear
  * table is a fixed deterministic permutation (XXH64 of the byte value) —
  * chunking is reproducible across JVMs, sessions and retries.
  */
case class CdcChunksExpr(child: Expression, minLen: Int, maskBits: Int, maxLen: Int)
    extends UnaryExpression {

  require(minLen >= 1, s"minLen must be >= 1, got $minLen")
  require(maskBits >= 1 && maskBits <= 48, s"maskBits must be in [1,48], got $maskBits")
  require(maxLen > minLen, s"maxLen must be > minLen, got $maxLen <= $minLen")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_chunks requires a string, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    CdcChunksExpr.compute(s.asInstanceOf[UTF8String], minLen, maskBits, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunksExpr.compute($c, $minLen, $maskBits, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunksExpr {

  private val EMPTY = new GenericArrayData(Array.empty[Any])

  /** Deterministic 256-entry gear table (XXH64 of the byte value, fixed
    * seed): equidistributed 64-bit values so (h & mask) == 0 fires with
    * probability 2^-maskBits per character on real content.
    */
  private val GEAR: Array[Long] =
    Array.tabulate(256)(b => XXH64.hashLong(b.toLong, 0x9E3779B97F4A7C15L))

  def compute(s: UTF8String, minLen: Int, maskBits: Int, maxLen: Int): ArrayData = {
    val numBytes = s.numBytes()
    if (numBytes == 0) return EMPTY
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val mask = (1L << maskBits) - 1
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int] // byte offsets
    var h = 0L
    var chunkChars = 0
    var i = 0
    while (i < numBytes) {
      val charBytes = UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
      var j = 0
      while (j < charBytes && i + j < numBytes) {
        h = (h << 1) + GEAR(Platform.getByte(base, off + i + j) & 0xff)
        j += 1
      }
      i += charBytes
      chunkChars += 1
      if ((chunkChars >= minLen && (h & mask) == 0L) || chunkChars >= maxLen) {
        cuts += math.min(i, numBytes)
        h = 0L
        chunkChars = 0
      }
    }
    if (cuts.isEmpty || cuts.last != numBytes) cuts += numBytes
    val out = new Array[Any](cuts.length)
    var start = 0
    var k = 0
    while (k < cuts.length) {
      out(k) = UTF8String.fromBytes({
        val len = cuts(k) - start
        val bytes = new Array[Byte](len)
        Platform.copyMemory(base, off + start, bytes, Platform.BYTE_ARRAY_OFFSET, len)
        bytes
      })
      start = cuts(k)
      k += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_chunks",
      exprs => fromExprs(exprs),
      "built-in")

  private[functions] def fromExprs(exprs: Seq[Expression]): Expression = {
    def lit(e: Expression, name: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
      case other =>
        throw new IllegalArgumentException(s"cdc_chunks: $name must be an int literal, got $other")
    }
    exprs match {
      case Seq(t)          => CdcChunksExpr(t, 64, 8, 1024)
      case Seq(t, a)       => CdcChunksExpr(t, lit(a, "minLen"), 8, 1024)
      case Seq(t, a, b)    => CdcChunksExpr(t, lit(a, "minLen"), lit(b, "maskBits"), 1024)
      case Seq(t, a, b, c) => CdcChunksExpr(t, lit(a, "minLen"), lit(b, "maskBits"), lit(c, "maxLen"))
      case _ => throw new IllegalArgumentException("cdc_chunks takes 1-4 args")
    }
  }

  /** Column-level constructor (classic-session bridge). */
  def cdc_chunks(text: Column, minLen: Int = 64, maskBits: Int = 8,
      maxLen: Int = 1024): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      CdcChunksExpr(GraftColumnBridge.expression(text), minLen, maskBits, maxLen))
  }
}
