package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass tokenizer as a custom Catalyst expression.
  *
  * Semantics are EXACTLY [[TextFunctions.tokenize]] (lowercase → regex
  * extract → min-length → stopword drop; ref
  * bm25_sparse_indexer.py:516-543), and null text propagates to a null
  * array like the regexp_extract_all formulation it replaces.
  *
  * Why an Expression: the declarative form — `regexp_extract_all` +
  * two higher-order `filter`s with a per-token `array_contains` over
  * the 89-entry stopword list — evaluates the lambdas interpreted and
  * costs O(|stopwords|) per token. Tokenization sits under every BM25
  * index build, dedup shingle, and text-quality scan, i.e. it touches
  * every row of the corpus, so it gets the same treatment as the
  * vector dot product: one tight JVM pass per row (compiled regex,
  * HashSet membership), invoked from whole-stage codegen via a bound
  * reference (one virtual call per row, no lambda dispatch).
  */
case class Tokenize(child: Expression, removeStopwords: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val pattern: Pattern =
    Pattern.compile(TextFunctions.TokenPattern)
  @transient private lazy val stops: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    TextFunctions.EnglishStopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** One pass over the row's text; called from interpreted eval AND
    * from the generated code (via a reference object). */
  def doTokenize(text: UTF8String): ArrayData = {
    // Locale.ROOT: String.toLowerCase is locale-sensitive (tr_TR turns
    // 'I' into dotless ı) where the `lower()` built-in this replaced is
    // not — pin the locale so results never depend on the host JVM
    val m = pattern.matcher(text.toString.toLowerCase(java.util.Locale.ROOT))
    val out = new java.util.ArrayList[AnyRef]()
    while (m.find()) {
      val t = m.group()
      if (t.length >= TextFunctions.MinTokenLength) {
        val u = UTF8String.fromString(t)
        if (!removeStopwords || !stops.contains(u)) out.add(u)
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    doTokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenizer", this, classOf[Tokenize].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.doTokenize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

/** The deterministic mock embedding as ONE Catalyst expression:
  * sha256(utf8 bytes) → eight big-endian uint32 → scale to [-1,1) →
  * L2-normalize → zero-pad to `dim` (bit-exact with
  * [[TextFunctions.mockEmbeddingDouble]] — both call the same
  * [[TextFunctions.mockEmbeddingFromUtf8]]).
  *
  * Why an Expression rather than composed builtins: the declarative
  * form (`sha2` + 8 hex slices + norm) inlines the sha2 subtree into
  * each of the 8 components AND the norm — an O(dim×8) expression tree
  * with no codegen-time CSE — and janino rejects the generated method,
  * silently dropping every embed-bearing stage (search legs,
  * chunk→embed build, knn_text) to interpreted execution. This form is
  * one sha256 and one tight JVM loop per row, invoked from whole-stage
  * codegen via a bound reference, so the surrounding stage keeps its
  * generated pipeline.
  *
  * Ref semantics: packages/vecpipe/search/dense_search.py:19-44. */
case class MockEmbed(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)

  // MessageDigest is stateful and this expression instance is shared
  // across the executor's task threads via the codegen reference
  // array — one digest per thread, reset per row
  @transient private lazy val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("SHA-256"))

  def embed(text: UTF8String): ArrayData = {
    val md = digests.get()
    md.reset()
    val vals = TextFunctions.mockEmbeddingFromUtf8Digest(md, text.getBytes, dim)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(vals)
  }

  override def nullSafeEval(input: Any): Any =
    embed(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mockEmbed", this, classOf[MockEmbed].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.embed($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MockEmbed =
    copy(child = newChild)
}

/** Unicode NFC normalization as a codegen'd expression — the
  * canonicalization pass a multilingual pipeline runs before hashing /
  * dedup (decomposed "e"+COMBINING ACUTE and composed "é" must hash
  * identically, or the same text dodges every dedup operator). Spark
  * ships no normalize builtin; java.text.Normalizer is the JVM
  * implementation of the same Unicode standard algorithm DuckDB's
  * `nfc_normalize` (utf8proc) implements, which is what makes the
  * oracle replay exact. The `isNormalized` fast path skips the
  * allocation entirely for already-NFC (e.g. pure-ASCII) rows — the
  * overwhelmingly common case in a web corpus. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.normalize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Parse 8 hex chars of a digest string at a fixed offset as an
  * unsigned 32-bit value — bit-identical to
  * `conv(substring(hex, off+1, 8), 16, 10).cast("long")` but without
  * conv's radix-conversion string machinery, which dominated the
  * minhash seed family's CPU (16 parses per shingle). The sha256
  * digest itself stays a shared subexpression across seeds. */
case class HexSliceToLong(child: Expression, offset: Int)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  def parse(s: UTF8String): Long = {
    // UTF8String.getByte is an unchecked raw-memory read: fail loudly
    // on short inputs instead of returning nondeterministic garbage
    if (s.numBytes < offset + 8)
      throw new IllegalArgumentException(
        s"HexSliceToLong: input has ${s.numBytes} bytes, need ${offset + 8}")
    var v = 0L
    var i = offset
    val end = offset + 8
    while (i < end) {
      val c = s.getByte(i)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else c - 'A' + 10
      v = (v << 4) | d
      i += 1
    }
    v
  }

  override def nullSafeEval(input: Any): Any =
    parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hexSlice", this, classOf[HexSliceToLong].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.parse($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HexSliceToLong =
    copy(child = newChild)
}
