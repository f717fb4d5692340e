package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered pairs (u, v) with u-index < v-index of an array<long> —
  * the basket → co-occurrence-candidate step of the graph builders.
  *
  * Why a custom Catalyst expression (SURVEY §2.4 preference ladder (b)):
  * the builtin formulation
  * `flatten(transform(items, (x,i) -> transform(slice(items,i+2,n), ...)))`
  * interprets TWO nested lambdas and allocates a slice array per anchor
  * element — per basket of size k that is k array allocations + k²/2
  * interpreted lambda frames. This expression emits the k²/2 pair rows
  * in one tight loop. Caller contract: the input is sorted + distinct
  * (collect_set + sort_array), so u < v holds by construction.
  */
case class PairCombinations(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pairs expects array<long>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("u", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_pairs"

  override def nullSafeEval(in: Any): Any = {
    val xs = in.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val u = xs.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](u, xs.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val u = ctx.freshName("u"); val out = ctx.freshName("out")
      s"""
         |int $n = $xs.numElements();
         |Object[] $out = new Object[$n * ($n - 1) / 2];
         |int $k = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $u = $xs.getLong($i);
         |  for (int $j = $i + 1; $j < $n; $j++) {
         |    $out[$k++] = new org.apache.spark.sql.catalyst.expressions
         |      .GenericInternalRow(new Object[]{$u, $xs.getLong($j)});
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : PairCombinations = copy(child = newChild)
}
