package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two array<double> columns.
  *
  * Why a custom Catalyst expression (SURVEY §2.4 preference ladder (b)):
  * the builtin alternative `aggregate(zip_with(a, b, (x,y) -> x*y), ...)`
  * allocates an intermediate array and interprets two lambdas per row —
  * at 10M+ candidate pairs × 64 dims that dominated the whole benchmark.
  * This expression generates a tight primitive loop inside whole-stage
  * codegen: no allocation, no virtual calls.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Packs 32 sign bits of an array<double> into a long: bit j is set iff
  * `arr[offset + j] > 0` (strict — zeros and negatives clear). Two calls
  * (offset 0 and 32) binary-quantize a 64-dim embedding into two
  * BIGINT halves; 32-bit halves keep every packed value positive, so
  * the DuckDB oracle recomputes them with plain integer arithmetic (no
  * 1<<63 sign-bit wraparound question on either engine). Native codegen
  * for the same reason as [[DotProduct]]: this runs once per corpus row
  * in the quantization scan — a 32-step interpreted lambda per row is
  * the slow path.
  */
case class SignBits(child: Expression, offset: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_signbits expects array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_signbits"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0L
    var j = 0
    while (j < 32) {
      val i = offset + j
      if (i < n && x.getDouble(i) > 0) s |= (1L << j)
      j += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |long $s = 0L;
         |for (int $j = 0; $j < 32; $j++) {
         |  int $i = $offset + $j;
         |  if ($i < $n && $a.getDouble($i) > 0) $s |= (1L << $j);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignBits = copy(child = newChild)
}

/** Session registration for the engine's native SQL functions. */
object GraftFunctions {

  /** Literal-integer argument extraction for registration-time-bound
    * parameters (bit widths, n-gram sizes): a non-foldable or
    * non-numeric argument would otherwise surface as an opaque
    * ClassCastException/NPE from eval() during expression expansion —
    * fail instead with an error that names the function and position,
    * matching the expressions' own input-type error style.
    */
  private def litInt(fn: String, pos: Int,
      e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument $pos must be a literal integer, got non-foldable " +
          s"expression ${e.sql}")
    e.eval() match {
      case n: Number => n.intValue()
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument $pos must be a literal integer, got " +
            s"${if (other == null) "NULL" else other.getClass.getSimpleName}")
    }
  }
  /** Idempotent: makes `graft_dot(a, b)`, `graft_minhash(hs, n)` and
    * `graft_simhash(hs)` available to `expr(...)`/SQL.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      (children: Seq[Expression]) => DotProduct(children(0), children(1)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_minhash",
      (children: Seq[Expression]) => MinHashSignature(children(0),
        children(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      (children: Seq[Expression]) => SimHash64(children(0)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_md5_tokens",
      (children: Seq[Expression]) => Md5TokenHashes(children(0)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_md5_ngrams",
      (children: Seq[Expression]) => Md5NgramHashes(children(0),
        litInt("graft_md5_ngrams", 2, children(1))),
      "built-in")
    reg.createOrReplaceTempFunction("graft_ngrams",
      (children: Seq[Expression]) => NgramHashes(children(0),
        children(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction("graft_count_tokens",
      (children: Seq[Expression]) => TokenGroupCounts(children(0), children(1)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_ntokens",
      (children: Seq[Expression]) => TokenCount(children(0)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_freq_agg",
      (children: Seq[Expression]) => FreqItemsAgg(children(0),
        children(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction("graft_freq_union",
      (children: Seq[Expression]) => FreqUnionAgg(children(0),
        children(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction("graft_freq_topk",
      (children: Seq[Expression]) => FreqTopK(children(0),
        children(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction("graft_theta_agg",
      (children: Seq[Expression]) => ThetaAgg(children(0),
        children(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction("graft_theta_union",
      (children: Seq[Expression]) => ThetaUnionAgg(children(0),
        children(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    reg.createOrReplaceTempFunction("graft_theta_and",
      (children: Seq[Expression]) => ThetaCombine(children(0), children(1), "and"),
      "built-in")
    reg.createOrReplaceTempFunction("graft_theta_or",
      (children: Seq[Expression]) => ThetaCombine(children(0), children(1), "or"),
      "built-in")
    reg.createOrReplaceTempFunction("graft_pq_encode",
      (children: Seq[Expression]) => PqEncode(children(0), children(1),
        children(2), children(3)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_pq_adc",
      (children: Seq[Expression]) => PqAdc(children(0), children(1),
        children(2), children(3), children(4)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_theta_not",
      (children: Seq[Expression]) => ThetaCombine(children(0), children(1), "not"),
      "built-in")
    reg.createOrReplaceTempFunction("graft_theta_est",
      (children: Seq[Expression]) => ThetaEstimate(children(0)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_pairs",
      (children: Seq[Expression]) => PairCombinations(children(0)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_signbits",
      (children: Seq[Expression]) => SignBits(children(0),
        litInt("graft_signbits", 2, children(1))),
      "built-in")
    reg.createOrReplaceTempFunction("graft_gram_agg",
      (children: Seq[Expression]) => GramAgg(children(0), children(1),
        litInt("graft_gram_agg", 3, children(2))),
      "built-in")
    reg.createOrReplaceTempFunction("graft_gram_multi",
      (children: Seq[Expression]) => MultiGramAgg(children(0), children(1),
        litInt("graft_gram_multi", 3, children(2)),
        litInt("graft_gram_multi", 4, children(3))),
      "built-in")
    // optimizer strength reduction lives beside the functions: any session
    // the library registers into also gets size(split(x,' ')) →
    // graft_ntokens. Keyed removal keeps repeated register() calls from
    // stacking duplicate rules.
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ eq ReduceSplitSizeToNTokens) :+ ReduceSplitSizeToNTokens
  }
}
