package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Size,
  StringSplit, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token count of a single-space-tokenized text column — exactly
  * `size(split(text, ' '))` (Java regex semantics, limit -1: count =
  * number of space separators + 1, empty string included, consecutive /
  * leading / trailing spaces each producing an empty token that still
  * counts), computed as one byte scan with no array allocation.
  *
  * Why a custom Catalyst expression (SURVEY §2.4 preference ladder (b)):
  * the builtin form materializes every token as a UTF8String slice into a
  * fresh array just to read its length. The 0x20 byte never occurs inside
  * a multi-byte UTF-8 sequence (all continuation/lead bytes are >= 0x80),
  * so a byte scan is exact for any unicode content. Generates a tight
  * primitive loop inside whole-stage codegen (same pattern as
  * [[DotProduct]]).
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ntokens expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ntokens"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var c = 1
    var i = 0
    while (i < n) { if (s.getByte(i) == 0x20) c += 1; i += 1 }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $s.numBytes();
         |int $c = 1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($s.getByte($i) == 0x20) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** Optimizer strength reduction: `size(split(text, ' '))` →
  * `graft_ntokens(text)` (SURVEY §2.4 preference ladder (c): a
  * `Rule[LogicalPlan]` where the declarative form is right but the
  * physical evaluation isn't). The pipeline operators state token counts
  * in the builtin vocabulary — packSequences, sampleBudget, paragraph
  * reassembly, text quality — and this rule swaps the array
  * materialization for the byte scan wherever the pattern appears, so
  * callers never trade readability for the fast path.
  *
  * Deliberately narrow: only the exact shape Spark's `split(text, " ")`
  * builds — a literal single-space pattern (as a regex, matches precisely
  * one 0x20) with the default limit -1, under non-legacy `size` null
  * semantics (null → null, which [[TokenCount]] matches; legacy
  * `size(null) = -1` is left alone). Installed per-session via
  * `GraftFunctions.register` (experimental.extraOptimizations) or the
  * `spark.sql.extensions=graft.functions.GraftExtensions` config
  * (injectOptimizerRule). Idempotent: the rewrite removes its own match.
  */
object ReduceSplitSizeToNTokens extends Rule[LogicalPlan] {
  private val spaceRegex = UTF8String.fromString(" ")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(str, Literal(re: UTF8String, StringType),
            Literal(-1, IntegerType)), false)
          // default-collation strings only: TokenCount's checkInputDataTypes
          // accepts exactly StringType, so rewriting a Spark 4 COLLATE
          // column would plant an unresolved expression in a post-analysis
          // plan (and a collation-aware split could disagree with the byte
          // scan anyway) — leave the valid original in place
          if re == spaceRegex && str.dataType == StringType =>
        TokenCount(str)
    }
}
