package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level MinHash kernel shared by interpreted eval and generated code.
  *
  * Semantics are EXACTLY the portable md5 construction the DuckDB oracle
  * replays (DedupQueries.minhashLshSql): h1/h2 are the integer values of
  * md5-hex characters 1-13 and 14-26 (two 52-bit words, read here straight
  * from the digest bytes nibble-wise — no hex string materialized), and
  * component k of the signature is min over shingles of (h1 + k·h2)
  * (Kirsch-Mitzenmacher). One native loop per row: no interpreted
  * higher-order functions, no per-component re-hashing.
  */
/** One MD5 instance per executor thread, shared by every md5-based kernel
  * in this file (digest instances are stateful and not thread-safe).
  */
private[functions] object Md5 {
  private val tl = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  def get(): MessageDigest = tl.get()
}

object MinhashOps {

  /** 52-bit big-endian value of 13 hex nibbles starting at `startNibble`. */
  private def h52(d: Array[Byte], startNibble: Int): Long = {
    var v = 0L
    var i = startNibble
    val end = startNibble + 13
    while (i < end) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  def signature(shingles: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val digest = Md5.get()
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      digest.reset()
      val d = digest.digest(shingles.getUTF8String(i).getBytes)
      val h1 = h52(d, 0)
      val h2 = h52(d, 13)
      var h = h1
      var j = 0
      while (j < k) {
        if (h < sig(j)) sig(j) = h
        h += h2
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Row-level 32-bit SimHash kernel (shared by interpreted eval and
  * generated code). Semantics are EXACTLY the portable md5-nibble
  * construction the DuckDB oracle replays (DedupQueries.simhashSql): for
  * each DISTINCT token, bit b of its md5 (b in 0..31) is bit (b mod 4) of
  * hex nibble floor(b/4); each set bit votes +1, each clear bit -1, and
  * the fingerprint keeps the bits with a positive vote sum. One native
  * loop per row instead of a ~64-lambda interpreted aggregate/zip_with
  * pipeline per token (measured ~8× on the dedup_simhash family at
  * sf0.1). Null token slots are ignored (the tokenizer never emits them).
  */
object SimhashOps {

  def fingerprint(tokens: ArrayData): Long = {
    val acc = new Array[Int](32)
    val seen = new java.util.HashSet[UTF8String]()
    val digest = Md5.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && seen.add(t)) {
        digest.reset()
        val d = digest.digest(t.getBytes)
        var b = 0
        while (b < 32) {
          val c = b >> 2 // hex-char index; only the first 4 digest bytes matter
          val byte = d(c >> 1) & 0xff
          val nib = if ((c & 1) == 0) byte >>> 4 else byte & 0xf
          if (((nib >>> (b & 3)) & 1) == 1) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) { if (acc(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }
}

/** Row-level word n-gram shingling kernel (shared by interpreted eval and
  * generated code). Semantics are EXACTLY the HOF form the DuckDB oracles
  * replay: `array_distinct(transform(sequence(1, size(tk) - n + 1),
  * i -> concat_ws(' ', tk[i..i+n-1])))` — first-occurrence order, space-
  * joined consecutive tokens — but in one native loop instead of ~4
  * interpreted lambda evals per position.
  */
object ShingleOps {
  private val Sep = UTF8String.fromString(" ")

  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val cnt = tokens.numElements()
    if (cnt < n) return new GenericArrayData(new Array[AnyRef](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= cnt) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](0)))
  }
}

object CharNgramOps {
  /** ALL positional character n-grams (non-distinct — the profile/count
    * use case), via UTF8String.substringSQL so the values are identical
    * to the builtin `substring(text, i, n)` the HOF form and the DuckDB
    * oracle's `substr` compute, including for multi-byte code points.
    */
  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val m = s.numChars() - n + 1
    if (m <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) { out(i) = s.substringSQL(i + 1, n); i += 1 }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression:
  * `char_ngrams(string, n) -> array<string>` (all positional n-grams).
  * Replaces the interpreted `transform(sequence(...), i -> substring(...))`
  * form in text_ngram_profile: one static call inside whole-stage codegen
  * instead of a per-row integer-array build plus n interpreted substrings.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, positive n), got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    CharNgramOps.ngrams(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharNgramOps.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression:
  * `word_shingles(array<string>, n) -> array<string>` (distinct n-grams).
  * Same preference-order rationale as [[MinhashSignature]].
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, positive n), got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    ShingleOps.shingles(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: `simhash64(array<string>) -> bigint` — the
  * 32-bit md5-nibble SimHash fingerprint of a token array (distinct
  * applied internally). Same preference-order rationale as
  * [[MinhashSignature]]: one static call inside whole-stage codegen
  * instead of an interpreted aggregate over 32-lambda zip_with votes per
  * token; values identical to the HOF form, so the DuckDB oracle is
  * unchanged.
  */
case class SimhashFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    SimhashOps.fingerprint(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashOps.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: `minhash_sig(array<string>, k) -> array<long>`.
  *
  * Chosen over the equivalent aggregate/transform/zip_with HOF pipeline
  * (which stays interpreted and costs ~10× here) per the SURVEY §4
  * preference order: the kernel runs inside whole-stage codegen as one
  * static call. Values are identical to the HOF form, so the DuckDB oracle
  * is unchanged.
  */
case class MinhashSignature(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, positive k), got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    MinhashOps.signature(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashOps.signature($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
