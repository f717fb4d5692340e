package graft.model

import java.sql.Timestamp

/** Core data model (SURVEY.md §1.2, FIXTURES.md §2).
  *
  * A stream is a logical key partitioning one big datapoints table — never
  * a per-stream object graph. All per-stream computation is expressed as
  * key-partitioned DataFrame operations so it distributes at 100 TB.
  */

/** The seven value-downsampler aggregates of one bucket (short storage keys
  * from the reference: c,s,q,l,u,m,d — SURVEY §2.2).
  */
case class AggValue(
    c: Long,              // count of non-null datapoints
    s: Double,            // sum
    q: Double,            // sum of squares
    l: Double,            // min ("lower")
    u: Double,            // max ("upper")
    m: Double,            // mean = s/c
    d: Double)            // population std-dev = sqrt(q/c - m^2) (naive formula, oracle-exact)

/** The three time-downsampler aggregates (a,m,z in the reference). */
case class TimeAgg(first: Timestamp, last: Timestamp, mean: Timestamp)

/** One row of the `datapoints` table. At a stream's highest granularity the
  * raw value lives in v_num / v_json and agg/t_agg are null; at coarser
  * granularities only agg/t_agg are populated and t is the bucket start.
  */
case class Datapoint(
    stream_id: String,
    granularity: String,
    t: Timestamp,
    v_num: Option[Double],
    v_json: Option[String],
    agg: Option[AggValue],
    t_agg: Option[TimeAgg])

/** One row of the `streams` metadata table (FIXTURES.md §2). */
case class StreamDescriptor(
    stream_id: String,
    tags: Map[String, String],
    tags_json: String,
    value_type: String,
    value_downsamplers: Seq[String],
    time_downsamplers: Seq[String],
    highest_granularity: String,
    derive_from: Seq[String],
    derive_op: Option[String],
    derive_args: Option[String],
    earliest_ts: Option[Timestamp],
    latest_ts: Option[Timestamp],
    // opaque per-type options JSON (reference: value_type_options, e.g.
    // archived graph layouts). No execution semantics upstream either —
    // persisted verbatim and guarded by the immutable-config contract.
    value_type_options: Option[String] = None)

object ValueType {
  val Numeric = "numeric"
  val Nominal = "nominal"
  val Graph = "graph"
  val all: Set[String] = Set(Numeric, Nominal, Graph)
}

/** One declaration row for the bulk `Datastream.ensureStreams` lane —
  * field-for-field the [[graft.core.Datastream.ensureStream]] parameters
  * (same defaults), so a per-call loop and a batch declare identically.
  */
case class EnsureSpec(
    queryTags: Map[String, String],
    tags: Map[String, String] = Map.empty,
    valueDownsamplers: Seq[String] = Downsamplers.allValueNames.toSeq.sorted,
    highestGranularity: Granularity = Granularity.Seconds,
    deriveFrom: Seq[String] = Nil,
    deriveOp: Option[String] = None,
    deriveArgs: Option[String] = None,
    valueType: String = ValueType.Numeric,
    timeDownsamplers: Seq[String] = Downsamplers.allTimeNames.toSeq.sorted,
    valueTypeOptions: Option[String] = None)

/** Per-spec outcome of the bulk declaration: the stream id (existing or
  * created) or the §1.6-taxonomy error message for THIS row — conflicts
  * never abort the batch (the appendMultiple checks-fold discipline).
  */
case class EnsureOutcome(
    streamId: Option[String],
    error: Option[String],
    created: Boolean)

object Downsamplers {
  /** Value downsamplers: public name -> short storage key (SURVEY §2.2). */
  val value: Map[String, String] = Map(
    "count" -> "c", "sum" -> "s", "sum_squares" -> "q",
    "min" -> "l", "max" -> "u", "mean" -> "m", "std_dev" -> "d")

  /** Time downsamplers: public name -> short storage key. */
  val time: Map[String, String] = Map(
    "first" -> "a", "last" -> "z", "mean" -> "m")

  val allValueNames: Set[String] = value.keySet
  val allTimeNames: Set[String] = time.keySet

  def validateValue(names: Seq[String]): Unit =
    names.foreach(n => if (!allValueNames(n)) throw UnsupportedDownsampler(n))
  def validateTime(names: Seq[String]): Unit =
    names.foreach(n => if (!allTimeNames(n)) throw UnsupportedDownsampler(n))
}

object DeriveOps {
  val Sum = "sum"
  val Derivative = "derivative"
  val CounterReset = "counter_reset"
  val CounterDerivative = "counter_derivative"
  val all: Set[String] = Set(Sum, Derivative, CounterReset, CounterDerivative)

  def validate(op: String): Unit =
    if (!all(op)) throw UnsupportedDeriveOperator(op)
}
