package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch expressions over a pre-hashed token/shingle array
  * (array<long> of xxhash64 values).
  *
  * Why custom expressions: the builtin formulation — 64 separate
  * `array_min(transform(hs, ...))` / `aggregate(hs, ...)` columns —
  * interprets a lambda per element per hash function (64 × |tokens| ×
  * |docs| closure calls); these generate ONE tight fused loop inside
  * whole-stage codegen. Wraparound long arithmetic is intentional here
  * (hash mixing) and safe: generated Java wraps silently, outside ANSI
  * checks.
  */
object HashFamilies {
  /** Odd multipliers/offsets of the affine family h_i(x) = a_i*x + b_i
    * (splitmix64-style constants; odd multipliers are bijective mod 2^64).
    */
  def a(i: Int): Long = -7046029254386353131L * (2L * i + 1)
  def b(i: Int): Long = -4658895280553007687L * i
}

/** Hashed distinct word n-grams of a text column: tokenizes on single
  * spaces, hashes each n-gram (FNV-1a 64 over the joined bytes) and
  * dedups — the fused replacement for
  * `array_distinct(transform(sequence(...), i -> xxhash64(concat_ws(slice(split(text))))))`,
  * which allocates a token array, a slice and a joined string per shingle.
  * Texts with fewer than n words produce one n-gram of all words (same
  * rule as the slice-based formulation).
  *
  * CodegenFallback is deliberate: ONE virtual call per row doing a tight
  * char loop beats generating a tokenizer in Java strings — the per-element
  * interpreted lambdas were the problem, not the per-row call.
  */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override def nullSafeEval(in: Any): Any = {
    val bytes = in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    // word start/end offsets (split on single ' ', empty tokens included —
    // mirrors split(text, ' '))
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') starts += i + 1
      i += 1
    }
    val nWords = starts.length
    def wordEnd(w: Int): Int = if (w + 1 < nWords) starts(w + 1) - 1 else bytes.length
    val span = math.min(n, nWords)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var w = 0
    val lastStart = math.max(nWords - span, 0)
    while (w <= lastStart) {
      // FNV-1a 64 over bytes [start(w), wordEnd(w+span-1)) — includes the
      // single-space separators, i.e. the joined n-gram string
      var h = -3750763034362895579L // FNV offset basis
      var p = starts(w)
      val end = wordEnd(w + span - 1)
      while (p < end) { h ^= bytes(p) & 0xFF; h *= 1099511628211L; p += 1 }
      seen.add(h)
      w += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): NgramHashes =
    copy(child = c)
}

/** 60-bit MD5 token hashes of a text column: tokenizes on single spaces
  * (empty tokens included, duplicates KEPT — simhash weights bits by
  * occurrence), hashes each token to the first 15 hex chars of its MD5.
  *
  * Why MD5 and 60 bits: the value is reproducible in any SQL engine with
  * an md5() builtin — DuckDB: `('0x' || substring(md5(tok), 1, 15))::BIGINT`
  * — which is what upgrades the simhash gate query from a rows-only check
  * to a full hash-matched oracle. 15 hex chars (60 bits) always fit a
  * signed BIGINT on both sides; full 64 would overflow DuckDB's cast.
  *
  * CodegenFallback for the same reason as [[NgramHashes]]: one virtual
  * call per row running a tight byte loop.
  */
case class Md5TokenHashes(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_tokens expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_tokens"

  override def nullSafeEval(in: Any): Any = {
    val bytes = in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val md = Md5TokenHashes.digest.get()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // first 8 digest bytes big-endian = first 16 hex chars; >>> 4
        // drops the 16th nibble, leaving exactly substring(md5, 1, 15)
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
        out += (h >>> 4)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Md5TokenHashes =
    copy(child = c)
}

object Md5TokenHashes {
  // MessageDigest is stateful and not thread-safe; one per task thread
  private[functions] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** POSITIONAL 60-bit MD5 word n-gram hashes: splits on single spaces
  * (empty tokens included), hashes every FULL n-word window (joined by
  * single spaces — i.e. the original byte span) to the first 15 hex
  * chars of its MD5, in position order, duplicates kept. Texts with
  * fewer than n words produce an EMPTY array.
  *
  * This is the winnowing-front-end counterpart of [[NgramHashes]]: that
  * one is FNV-64, deduped and length-folded for MinHash shingles (cheap,
  * Spark-only); this one keeps positions and uses the oracle-reproducible
  * md5 lane (DuckDB: `('0x' || substring(md5(array_to_string(
  * words[i+1:i+n], ' ')), 1, 15))::BIGINT`) so a fingerprint query can be
  * hash-matched end-to-end. CodegenFallback as for [[NgramHashes]].
  */
case class Md5NgramHashes(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_ngrams expects n >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_ngrams expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_ngrams"

  override def nullSafeEval(in: Any): Any = {
    val bytes = in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') starts += i + 1
      i += 1
    }
    val nWords = starts.length
    def wordEnd(w: Int): Int = if (w + 1 < nWords) starts(w + 1) - 1 else bytes.length
    if (nWords < n) return new GenericArrayData(Array.empty[Long])
    val md = Md5TokenHashes.digest.get()
    val out = new Array[Long](nWords - n + 1)
    var w = 0
    while (w <= nWords - n) {
      val from = starts(w)
      val until = wordEnd(w + n - 1)
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xFFL); k += 1 }
      out(w) = h >>> 4 // first 15 hex chars of md5, as in Md5TokenHashes
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Md5NgramHashes =
    copy(child = c)
}

/** MinHash signature: array of `numHashes` minima of the affine-mixed
  * base hashes. Null/empty input → null signature.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash expects array<long>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  // empty input arrays evaluate to null even when the child is
  // non-nullable — without this the optimizer may fold IsNull(this) away
  override def nullable: Boolean = true

  override def nullSafeEval(in: Any): Any = {
    val hs = in.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = h * HashFamilies.a(i) + HashFamilies.b(i)
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val as = ctx.addReferenceObj("minhashA",
      Array.tabulate(numHashes)(HashFamilies.a), "long[]")
    val bs = ctx.addReferenceObj("minhashB",
      Array.tabulate(numHashes)(HashFamilies.b), "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val out = ctx.freshName("out")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $out = new long[$numHashes];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $h = $hs.getLong($j);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $v = $h * $as[$i] + $bs[$i];
         |      if ($v < $out[$i]) $out[$i] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** 64-bit SimHash: bit i of the output is set iff bit i is set in at
  * least half of the input hashes. Null/empty input → null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<long>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  // empty input arrays evaluate to null even when the child is non-nullable
  override def nullable: Boolean = true

  override def nullSafeEval(in: Any): Any = {
    val hs = in.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val cnt = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < 64) { if (((h >>> i) & 1L) == 1L) cnt(i) += 1; i += 1 }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (2 * cnt(i) >= n) out |= (1L << i); i += 1 }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val cnt = ctx.freshName("cnt")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  int[] $cnt = new int[64];
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $h = $hs.getLong($j);
         |    for (int $i = 0; $i < 64; $i++) {
         |      if ((($h >>> $i) & 1L) == 1L) $cnt[$i]++;
         |    }
         |  }
         |  long $out = 0L;
         |  for (int $i = 0; $i < 64; $i++) {
         |    if (2 * $cnt[$i] >= $n) $out |= (1L << $i);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}
