package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-group token-occurrence counts of a text column:
  * `graft_count_tokens(text, array(array('the','and'), array('der','und')))`
  * returns `array<int>` where element i is the number of
  * single-space-delimited tokens of `text` (duplicates counted, same
  * tokenization as `split(text, ' ')`) that appear in group i. A token in
  * several groups increments each of them.
  *
  * Why a custom expression (SURVEY §2.4 preference ladder (b)): the
  * builtin formulation — one `size(filter(split(text,' '), x -> x IN (...)))`
  * column per group — allocates the token array once per GROUP and
  * interprets a lambda per token per group. This does one scan of the
  * text bytes and one hash probe per token for all groups together.
  *
  * CodegenFallback for the same reason as [[NgramHashes]]: one virtual
  * call per row running a tight byte loop; the per-element interpreted
  * lambdas were the problem, not the per-row call.
  */
case class TokenGroupCounts(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(ArrayType(StringType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_count_tokens expects (string, array<array<string>>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  // a null GROUP (not a null marker) yields a null count for that slot
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "graft_count_tokens"

  /** Per-token group-index lists plus the null-group slots.
    * A marker may belong to several groups ("la" in both fr and es) —
    * indexes are deduped so a marker listed twice in ONE group still
    * counts each token occurrence once (same as `x IN ('a','a')`).
    */
  private case class Lookup(nGroups: Int, nullGroups: Array[Boolean],
      tokens: java.util.HashMap[UTF8String, Array[Int]]) {
    // lets the scan loop skip allocating+probing empty tokens (repeated /
    // leading / trailing spaces) in the overwhelmingly common case where
    // no marker group contains the empty string
    val hasEmptyMarker: Boolean =
      tokens.containsKey(UTF8String.fromString(""))
  }

  /** Built once when the group literal is foldable — the only supported
    * shape in practice.
    */
  @transient private lazy val foldedLookup: Option[Lookup] =
    if (right.foldable) Option(right.eval(null)).map(g =>
      buildLookup(g.asInstanceOf[ArrayData]))
    else None

  // Non-foldable groups (e.g. a joined-in marker column) would otherwise
  // rebuild the HashMap per ROW — O(rows × markers) allocation. Cache the
  // last lookup keyed on value equality: an equality probe is a flat
  // compare, far cheaper than a rebuild, and the common non-foldable shape
  // is one repeated marker set. The key is COPIED because unsafe-row
  // ArrayData buffers are reused across rows. Key and lookup live in ONE
  // immutable tuple assigned once: expressions are normally deserialized
  // per task, but if an instance were ever shared across threads, a torn
  // (key, lookup) pair could silently return wrong counts — a single
  // reference can at worst cause a harmless rebuild.
  @transient private var cached: (ArrayData, Lookup) = _

  private def lookupFor(groups: ArrayData): Lookup = {
    val c = cached
    if (c != null && c._1 == groups) c._2
    else {
      val built = (groups.copy(), buildLookup(groups))
      cached = built
      built._2
    }
  }

  private def buildLookup(groups: ArrayData): Lookup = {
    val nGroups = groups.numElements()
    val nullGroups = new Array[Boolean](nGroups)
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    var g = 0
    while (g < nGroups) {
      val arr = groups.getArray(g)
      if (arr == null) nullGroups(g) = true
      else {
        var i = 0
        while (i < arr.numElements()) {
          val tok = arr.getUTF8String(i)
          if (tok != null) {
            val prev = m.get(tok)
            if (prev == null) m.put(tok, Array(g))
            else if (!prev.contains(g)) m.put(tok, prev :+ g)
          }
          i += 1
        }
      }
      g += 1
    }
    Lookup(nGroups, nullGroups, m)
  }

  override def nullSafeEval(text: Any, groups: Any): Any = {
    val lk = foldedLookup.getOrElse(
      lookupFor(groups.asInstanceOf[ArrayData]))
    val bytes = text.asInstanceOf[UTF8String].getBytes
    val counts = new Array[Int](lk.nGroups)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        // split(text, ' ') emits empty tokens for repeated / leading /
        // trailing spaces, so an empty-string marker must see them — but
        // only pay that probe when such a marker exists
        if (i > start || lk.hasEmptyMarker) {
          val hit = lk.tokens.get(UTF8String.fromBytes(bytes, start, i - start))
          if (hit != null) {
            var k = 0
            while (k < hit.length) { counts(hit(k)) += 1; k += 1 }
          }
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](lk.nGroups)
    var g = 0
    while (g < lk.nGroups) {
      out(g) = if (lk.nullGroups(g)) null else counts(g)
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenGroupCounts =
    copy(left = newLeft, right = newRight)
}
