package graft.model

/** Error taxonomy mirroring the reference's `datastream/exceptions.py`
  * (SURVEY.md §1.6; reference dir was empty — taxonomy from the public
  * datastream docs). Same trigger conditions, Scala-typed.
  */
class DatastreamException(msg: String) extends RuntimeException(msg)

case class StreamNotFound(query: String)
  extends DatastreamException(s"stream not found: $query")

case class MultipleStreamsReturned(query: String)
  extends DatastreamException(s"multiple streams match: $query")

case class InconsistentStreamConfiguration(detail: String)
  extends DatastreamException(s"inconsistent stream configuration: $detail")

case class OutstandingDependenciesError(streamIds: Seq[String])
  extends DatastreamException(
    s"streams have outstanding dependencies: ${streamIds.mkString(", ")}")

case class UnsupportedDownsampler(name: String)
  extends DatastreamException(s"unsupported downsampler: $name")

case class UnsupportedGranularity(name: String)
  extends DatastreamException(s"unsupported granularity: $name")

case class UnsupportedDeriveOperator(name: String)
  extends DatastreamException(s"unsupported derive operator: $name")

case class InvalidTimestamp(detail: String)
  extends DatastreamException(s"invalid timestamp: $detail")

case class IncompatibleGranularities(detail: String)
  extends DatastreamException(s"incompatible granularities: $detail")

case class IncompatibleTypes(detail: String)
  extends DatastreamException(s"incompatible types: $detail")

case class AppendToDerivedStreamNotAllowed(streamId: String)
  extends DatastreamException(s"cannot append to derived stream: $streamId")

case class InvalidOperatorArguments(detail: String)
  extends DatastreamException(s"invalid operator arguments: $detail")

case class ConcurrentCommit(root: String, version: Long)
  extends DatastreamException(
    s"version $version already committed by another writer: $root")
