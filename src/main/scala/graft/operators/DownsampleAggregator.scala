package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** The ten downsamplers (SURVEY §2.2) as ONE mergeable typed
  * `Aggregator[In, Buf, Out]` — the UDAF row of the §2.4 checklist.
  *
  * The buffer carries only the composable pieces (c, s, q, l, u, tMin,
  * tMax, tSum); mean/std-dev/t-mean derive in `finish`, with the
  * reference's naive `sqrt(q/c − m²)` formula. Because `merge` is
  * associative over partial buffers this is exactly the hierarchical-fold
  * contract the rollup ladder uses: level g+1 can fold level-g buffers
  * without re-reading raw history.
  *
  * The declarative column path ([[Downsample.aggColumns]]) stays the
  * default — built-in aggregates get whole-stage codegen while a typed
  * Aggregator deserializes per row. This exists for callers that need the
  * bundle as one reusable `TypedColumn` (Dataset API) and as the explicit
  * buffer spec for custom state stores.
  */
object DownsampleAggregator {

  /** One raw datapoint: epoch seconds + numeric value. */
  case class In(tSec: Long, v: Double)

  /** Mergeable partial state — the composable 8 of the 10 aggregates. */
  case class Buf(c: Long, s: Double, q: Double, l: Double, u: Double,
      tMin: Long, tMax: Long, tSum: Long)

  /** All ten downsamplers; timestamps as epoch seconds. t_mean is
    * floor(tSum/c), identical to the column path's
    * `bucket + floor(avg(t − bucket))` because floorDiv is shift-invariant.
    */
  case class Out(c: Long, s: Double, q: Double, l: Double, u: Double,
      m: Double, d: Double, t_first: Long, t_last: Long, t_mean: Long)

  val aggregator: Aggregator[In, Buf, Out] = new Aggregator[In, Buf, Out] {
    override def zero: Buf = Buf(0L, 0.0, 0.0,
      Double.PositiveInfinity, Double.NegativeInfinity,
      Long.MaxValue, Long.MinValue, 0L)

    override def reduce(b: Buf, x: In): Buf = Buf(
      b.c + 1, b.s + x.v, b.q + x.v * x.v,
      math.min(b.l, x.v), math.max(b.u, x.v),
      math.min(b.tMin, x.tSec), math.max(b.tMax, x.tSec), b.tSum + x.tSec)

    override def merge(a: Buf, b: Buf): Buf = Buf(
      a.c + b.c, a.s + b.s, a.q + b.q,
      math.min(a.l, b.l), math.max(a.u, b.u),
      math.min(a.tMin, b.tMin), math.max(a.tMax, b.tMax), a.tSum + b.tSum)

    override def finish(b: Buf): Out = {
      if (b.c == 0L) {
        // empty input (global agg over zero rows / empty merge chain):
        // a defined all-zero row instead of /0 and min/max sentinels
        Out(0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0L, 0L, 0L)
      } else {
        val m = b.s / b.c
        val d = math.sqrt(math.max(b.q / b.c - m * m, 0.0))
        Out(b.c, b.s, b.q, b.l, b.u, m, d, b.tMin, b.tMax,
          Math.floorDiv(b.tSum, b.c))
      }
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** The bundle as a TypedColumn for `KeyValueGroupedDataset.agg`. */
  def column: TypedColumn[In, Out] = aggregator.toColumn
}
