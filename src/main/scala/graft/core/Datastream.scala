package graft.core

import java.sql.Timestamp
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model._
import graft.operators.{Derive, Downsample}

/** Spark-native re-design of the reference's frontend `Datastream` class
  * (SURVEY.md §2.1, operators A1–A11; public wlanslovenija/datastream API —
  * the reference checkout was empty, see SURVEY §0).
  *
  * Storage layout (SURVEY §1.5 mapping):
  *  - `<root>/streams`     — parquet snapshot of [[graft.model.StreamDescriptor]] rows
  *  - `<root>/datapoints`  — parquet partitioned by `granularity` (and `ymd`
  *    date bucket), holding raw values at each stream's highest granularity
  *    and the ten downsampled aggregates at every coarser ladder level.
  *
  * Scale design: stream *metadata* is a catalog (small, driver-cached like a
  * metastore); all *datapoint* paths are distributed DataFrame jobs keyed by
  * stream_id — appends, downsampling and derive operators run set-wise over
  * every matched stream in one job, never one job per stream. Granularity
  * partitioning + parquet min/max stats on `t` reproduce the reference's
  * timestamp-encoded-_id range-scan pruning (SURVEY §4).
  */
class Datastream(val spark: SparkSession, val rootDir: String) {
  import spark.implicits._

  private val streamsPath = s"$rootDir/streams"
  private val datapointsPath = s"$rootDir/datapoints"

  // ---- catalog (stream metadata) -------------------------------------

  /** Driver-side catalog cache; persisted to parquet lazily (`flush()`).
    * `ensureStream` only marks the catalog dirty so bulk stream creation
    * costs no Spark jobs — EXCEPT when it creates a derived stream over
    * sources that already hold history with the default
    * `deriveBackprocess=true`, which flushes the catalog and runs the
    * backprocess job right there (reference parity); append/delete/tag
    * paths flush automatically.
    */
  private var catalog: Map[String, StreamDescriptor] = loadCatalog()
  private var catalogDirty = false

  /** Persist pending catalog changes (no-op when clean). */
  def flush(): Unit = if (catalogDirty) { persistCatalog(); catalogDirty = false }

  private def loadCatalog(): Map[String, StreamDescriptor] = {
    // fall back to the rename-aside backup persistCatalog leaves during its
    // swap window: a crash between (streams -> streams.old) and
    // (streams.tmp -> streams) must not read as an empty catalog
    val p = new java.io.File(streamsPath)
    val src = if (p.exists()) streamsPath
              else if (new java.io.File(s"$streamsPath.old").exists()) s"$streamsPath.old"
              else return Map.empty
    spark.read.parquet(src).as[StreamDescriptor]
      .collect().map(d => d.stream_id -> d).toMap
  }

  private def persistCatalog(): Unit = {
    // crash-safe swap: never a window where no complete catalog exists on
    // disk. Write tmp, rename current aside (NOT delete — a crash after a
    // recursive delete would lose the catalog), swap tmp in, then drop the
    // backup. loadCatalog falls back to the .old copy.
    val tmp = s"$streamsPath.tmp"
    catalog.values.toSeq.toDS().coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val dst = new java.io.File(streamsPath)
    val bak = new java.io.File(s"$streamsPath.old")
    if (bak.exists()) rmTree(bak)
    if (dst.exists() && !dst.renameTo(bak))
      throw new java.io.IOException(s"failed to move catalog aside: $dst -> $bak")
    if (!new java.io.File(tmp).renameTo(dst))
      throw new java.io.IOException(s"failed to move catalog into place: $tmp -> $dst")
    if (bak.exists()) rmTree(bak)
    // only mark clean once the data is durably in place — a failed write
    // must leave the catalog dirty so a retried flush() actually retries
    catalogDirty = false
  }

  def streams: DataFrame =
    if (catalog.isEmpty) spark.emptyDataset[StreamDescriptor].toDF()
    else catalog.values.toSeq.toDS().toDF()

  // ---- A1 ensure_stream ----------------------------------------------

  def ensureStream(
      queryTags: Map[String, String],
      tags: Map[String, String] = Map.empty,
      valueDownsamplers: Seq[String] = Downsamplers.allValueNames.toSeq.sorted,
      highestGranularity: Granularity = Granularity.Seconds,
      deriveFrom: Seq[String] = Nil,
      deriveOp: Option[String] = None,
      deriveArgs: Option[String] = None,
      valueType: String = ValueType.Numeric,
      timeDownsamplers: Seq[String] = Downsamplers.allTimeNames.toSeq.sorted,
      valueTypeOptions: Option[String] = None,
      deriveBackprocess: Boolean = true): String = {
    // valueTypeOptions (e.g. archived graph layouts) are accepted for API
    // parity and carried in derive_args-style JSON; they have no execution
    // semantics in the reference either (count-only downsampling).
    val _ = valueTypeOptions
    if (!ValueType.all(valueType)) throw IncompatibleTypes(valueType)
    if (valueType != ValueType.Numeric && valueDownsamplers.exists(_ != "count"))
      throw UnsupportedDownsampler(
        s"$valueType streams support only 'count', got ${valueDownsamplers.mkString(",")}")
    Downsamplers.validateValue(valueDownsamplers)
    Downsamplers.validateTime(timeDownsamplers)
    deriveOp.foreach(DeriveOps.validate)
    if (deriveOp.isDefined != deriveFrom.nonEmpty)
      throw InvalidOperatorArguments("derive_op and derive_from must be set together")
    // per-op arity: sum coalesces N sources; the lag-based ops are defined
    // over exactly one source (recomputeDerived would otherwise interleave
    // several sources' windows onto one derived id)
    deriveOp.foreach { op =>
      if (op != DeriveOps.Sum && deriveFrom.size != 1)
        throw InvalidOperatorArguments(
          s"derive_op $op takes exactly 1 source stream, got ${deriveFrom.size}")
    }
    deriveFrom.foreach { src =>
      val d = catalog.getOrElse(src, throw StreamNotFound(src))
      // a derived stream may not be finer-grained than any of its sources
      if (highestGranularity.seconds < Granularity(d.highest_granularity).seconds)
        throw IncompatibleGranularities(
          s"derived ${highestGranularity.name} finer than source ${d.highest_granularity}")
      if (deriveOp.contains(DeriveOps.CounterReset) ||
          deriveOp.contains(DeriveOps.CounterDerivative) ||
          deriveOp.contains(DeriveOps.Derivative)) {
        if (d.value_type != ValueType.Numeric)
          throw IncompatibleTypes(s"derive source $src is ${d.value_type}")
      }
    }

    val existing = catalog.values.filter(d =>
      queryTags.forall { case (k, v) => d.tags.get(k).contains(v) }).toList
    existing match {
      case d :: Nil =>
        // immutable config — conflicting re-declaration is an error
        if (d.value_downsamplers.toSet != valueDownsamplers.toSet ||
            d.time_downsamplers.toSet != timeDownsamplers.toSet ||
            d.highest_granularity != highestGranularity.name ||
            d.value_type != valueType ||
            d.derive_from.toSet != deriveFrom.toSet ||
            d.derive_op != deriveOp ||
            d.derive_args != deriveArgs)
          throw InconsistentStreamConfiguration(d.stream_id)
        d.stream_id
      case Nil =>
        val id = UUID.randomUUID().toString
        val allTags = queryTags ++ tags
        val desc = StreamDescriptor(
          stream_id = id,
          tags = allTags,
          tags_json = Json.nested(allTags),
          value_type = valueType,
          value_downsamplers = valueDownsamplers,
          time_downsamplers = timeDownsamplers,
          highest_granularity = highestGranularity.name,
          derive_from = deriveFrom,
          derive_op = deriveOp,
          derive_args = deriveArgs,
          earliest_ts = None,
          latest_ts = None)
        catalog += id -> desc
        catalogDirty = true
        // reference parity: derive_backprocess=True (the default) computes
        // the new derived stream from whatever source history already
        // exists, instead of leaving it empty until the next source append.
        // "history" must look THROUGH derived sources (their latest_ts is
        // never set — only raw appends advance it), so walk the derive
        // chain down to raw streams; catalog-only, no Spark job.
        def hasHistory(sid: String, seen: Set[String] = Set.empty): Boolean = {
          val d = catalog(sid)
          d.latest_ts.isDefined || (!seen(sid) &&
            d.derive_from.exists(hasHistory(_, seen + sid)))
        }
        if (deriveBackprocess && deriveFrom.nonEmpty &&
            deriveFrom.exists(hasHistory(_))) {
          // flush FIRST: recomputeDerived writes partition dirs keyed by
          // this id, and a crash between that write and a later lazy
          // flush would strand orphan data no catalog entry explains
          flush()
          recomputeDerived(desc)
        }
        id
      case many => throw MultipleStreamsReturned(queryTags.toString)
    }
  }

  // ---- A2/A3 append --------------------------------------------------

  def append(streamId: String, value: Double, timestamp: Timestamp,
      checkTimestamp: Boolean = true): Unit = {
    val df = Seq((streamId, timestamp, value)).toDF("stream_id", "t", "v")
    appendMultiple(df, checkTimestamp)
  }

  /** Bulk append — the engine's native shape. `df` columns:
    * stream_id, t (timestamp), and v (double, nullable) for numeric
    * streams and/or v_json (string) for nominal/graph streams.
    * Timestamps are rounded to each stream's highest granularity; strict
    * decreases versus the stream's last STORED timestamp raise
    * [[InvalidTimestamp]] when `checkTimestamp` (a DataFrame batch has no
    * row order, so ordering WITHIN one batch is not checked by default).
    * `strictWithinBatch=true` restores the reference's fully sequential
    * semantics through one bulk call: the batch must carry a `seq` column
    * stating per-stream arrival order, and any (floored) timestamp
    * decrease along it raises [[InvalidTimestamp]].
    * Values of the wrong kind for a stream's declared value_type raise
    * [[IncompatibleTypes]] (the reference's append-time type check).
    *
    * `dedupExisting=true` makes the append idempotent against exact
    * re-delivery — rows whose (stream_id, rounded t, value) already exist
    * are silently dropped, while a distinct new value in an
    * already-populated bucket still appends (two events in one second are
    * two datapoints, as in the batch path). The check scans only the
    * batch's own [min t, max t] window of the primary root (ymd partition
    * pruning), so its cost is bounded by the batch span, not store size.
    * Streaming ingest re-delivery relies on this.
    */
  def appendMultiple(df: DataFrame, checkTimestamp: Boolean = true,
      dedupExisting: Boolean = false,
      strictWithinBatch: Boolean = false): Unit = {
    import spark.implicits._
    // cache the caller's batch: the ids scan, validation probes, store
    // write and bounds aggregation would otherwise re-execute its
    // (possibly expensive) lineage up to 5 times. Only manage the cache
    // if the caller hasn't already persisted this frame.
    val ownCache = df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val cached = if (ownCache) df.persist() else df
    try {
      // ONE pass over the raw batch: distinct stream ids, per-stream raw
      // time bounds and value-kind presence flags fold into a single
      // aggregation job (ids-distinct used to be its own scan, and the
      // validation agg used to run AFTER a metadata join). All per-stream
      // validation then happens driver-side against the catalog —
      // metadata-scale work, equivalent because every per-row check
      // reduces to a per-stream extremum: any(t < last) ⇔ min(t) < last
      // (flooring is monotone), any(wrong-kind value) ⇔ kind-presence flag.
      val hasV = cached.columns.contains("v")
      val hasJ = cached.columns.contains("v_json")
      val aggCols = Seq(min("t").as("lo_raw"), max("t").as("hi_raw")) ++
        (if (hasJ) Seq(max(col("v_json").isNotNull).as("has_json")) else Nil) ++
        (if (hasV) Seq(max(col("v").isNotNull).as("has_num")) else Nil)
      val checks = cached.groupBy("stream_id")
        .agg(aggCols.head, aggCols.tail: _*).collect()

      // per-stream time bounds of the batch, floored to the stream's
      // highest granularity (advance catalog bounds in finishAppend —
      // taken from the PRE-dedup frame on purpose: on a retried delivery
      // the timestamps are in the store either way, and a crash between
      // last round's write and catalog persist must still advance)
      val bounds = checks.map { r =>
        val id = r.getString(0)
        val d = catalog.getOrElse(id, throw StreamNotFound(id))
        if (d.derive_op.isDefined) throw AppendToDerivedStreamNotAllowed(id)
        if (d.value_type == ValueType.Numeric && hasJ &&
            r.getAs[Boolean]("has_json"))
          throw IncompatibleTypes(
            s"value kind does not match stream $id's value_type")
        if (d.value_type != ValueType.Numeric && hasV &&
            r.getAs[Boolean]("has_num"))
          throw IncompatibleTypes(
            s"value kind does not match stream $id's value_type")
        val gsec = Granularity(d.highest_granularity).seconds
        // floorDiv at BOTH steps: `getTime / 1000` truncates toward zero,
        // which for pre-epoch timestamps floors differently than the Spark
        // write path's unix_timestamp and would desync the monotonicity
        // check / dedup window from the stored data
        def floorTs(ts: Timestamp): Timestamp =
          new Timestamp(
            Math.floorDiv(Math.floorDiv(ts.getTime, 1000L), gsec) * gsec * 1000)
        val lo = floorTs(r.getAs[Timestamp]("lo_raw"))
        if (checkTimestamp && d.latest_ts.exists(l => lo.getTime < l.getTime))
          // a strict decrease versus the stream's last stored timestamp is
          // a monotonicity violation (the reference's check_timestamp=True)
          throw InvalidTimestamp(s"non-monotonic append for stream $id")
        org.apache.spark.sql.Row(id, lo, floorTs(r.getAs[Timestamp]("hi_raw")))
      }
      val ids = checks.map(_.getString(0))

      // per-stream config joins in as a BROADCAST metadata frame (never a
      // typedLit map of the whole catalog — that would inline a
      // million-stream catalog into the plan); only the WRITE path needs
      // the per-row join now (granularity name + per-row rounding)
      val meta = broadcast(ids.toSeq.map { id =>
        val d = catalog(id)
        (id, Granularity(d.highest_granularity).seconds, d.highest_granularity)
      }.toDF("stream_id", "gsec", "gname"))
      val rounded = cached.join(meta, "stream_id")
        .withColumn("t", timestamp_seconds(
          floor(unix_timestamp(col("t")) / col("gsec")) * col("gsec")))

      // opt-in WITHIN-batch monotonicity (SURVEY §2.1 A2: the reference's
      // sequential appends reject every decrease, not just batch-min vs
      // stored-last). A DataFrame has no row order, so the caller states
      // arrival order through a per-stream `seq` column; a (floored)
      // timestamp decrease along seq raises InvalidTimestamp — the same
      // rows rejected had they been appended one call at a time. One
      // extra windowed pass over the batch, only when opted in.
      if (strictWithinBatch) {
        if (!cached.columns.contains("seq"))
          throw InvalidOperatorArguments(
            "strictWithinBatch needs a 'seq' column (per-stream arrival order)")
        val w = Window.partitionBy("stream_id").orderBy("seq")
        val bad = rounded
          .withColumn("_prev_t", lag(col("t"), 1).over(w))
          .where(col("_prev_t").isNotNull && col("t") < col("_prev_t"))
          .select("stream_id").limit(1).collect()
        bad.headOption.foreach { r =>
          throw InvalidTimestamp(
            s"non-monotonic timestamps within batch for stream ${r.getString(0)}")
        }
      }

      val deduped =
        if (!dedupExisting || bounds.isEmpty || !nonEmptyDir(datapointsPath)) rounded
        else {
          val lo = bounds.map(_.getTimestamp(1)).minBy(_.getTime)
          val hi = bounds.map(_.getTimestamp(2)).maxBy(_.getTime)
          val gnames = ids.map(catalog(_).highest_granularity).distinct.toSeq
          val existing = filterToStreams(
            DatapointStore.read(spark, Seq(datapointsPath))
              .where(col("granularity").isin(gnames: _*) &&
                col("t") >= lo && col("t") <= hi &&
                col("ymd") >= DatapointStore.ymdKey(lo) &&
                col("ymd") <= DatapointStore.ymdKey(hi)),
            ids.toSeq).select("stream_id", "t", "v_num", "v_json")
          // drop only EXACT re-deliveries (same stream, rounded t, value):
          // a retried micro-batch re-sends identical rows, while a
          // genuinely new value landing in an already-seen second must
          // still append (two distinct events in one bucket are two
          // datapoints, same as the batch path). Null-safe equality so
          // null-valued re-deliveries dedup too.
          val vCond =
            if (hasV) rounded("v").cast("double") <=> existing("v_num")
            else existing("v_num").isNull
          val jCond =
            if (hasJ) rounded("v_json") <=> existing("v_json")
            else existing("v_json").isNull
          rounded.join(existing,
            rounded("stream_id") === existing("stream_id") &&
              rounded("t") === existing("t") && vCond && jCond,
            "left_anti")
        }

      val withJson = if (hasJ) deduped
                     else deduped.withColumn("v_json", lit(null).cast("string"))
      val withV = if (hasV) withJson
                  else withJson.withColumn("v", lit(null).cast("double"))
      val toWrite = withV.select(
          col("stream_id"),
          col("gname").as("granularity"),
          col("t"),
          col("v").cast("double").as("v_num"),
          col("v_json"))
      DatapointStore.append(toWrite, datapointsPath)
      finishAppend(bounds, ids)
    } finally if (ownCache) cached.unpersist()
  }

  private def finishAppend(bounds: Array[org.apache.spark.sql.Row],
      ids: Array[String]): Unit = {
    // capture each appended stream's changed region BEFORE advancing the
    // catalog: the incremental derive cascade needs the PRE-batch latest
    // timestamp (exact lookback partition + staleness self-heal check)
    val regions = bounds.map { r =>
      val id = r.getString(0)
      val lo = r.getTimestamp(1); val hi = r.getTimestamp(2)
      id -> Region(dayStart(lo), Some(DatapointStore.ymdKey(hi)),
        catalog(id).latest_ts)
    }.toMap
    // advance per-stream time bounds in the catalog
    bounds.foreach { r =>
      val id = r.getString(0)
      val d = catalog(id)
      val lo = r.getTimestamp(1); val hi = r.getTimestamp(2)
      catalog += id -> d.copy(
        earliest_ts = Some(d.earliest_ts.fold(lo)(e => if (e.before(lo)) e else lo)),
        latest_ts = Some(d.latest_ts.fold(hi)(l => if (l.after(hi)) l else hi)))
    }
    persistCatalog()
    deriveDependents(ids.toSet, regions)
  }

  // ---- datapoints access ----------------------------------------------

  private def nonEmptyDir(p: String): Boolean = {
    val f = new java.io.File(p)
    f.exists() && f.listFiles() != null && f.listFiles().nonEmpty
  }

  private def datapointsExist: Boolean =
    nonEmptyDir(datapointsPath) || nonEmptyDir(derivedRawPath) ||
      nonEmptyDir(rollupsPath)

  /** Does ANY data exist at granularity `g`? A driver-side directory probe
    * (granularity is a partition column in all three roots) that lets the
    * rollup ladder skip the high-water-mark scan-and-broadcast job for
    * levels being materialized for the first time — the common case on
    * bulk backfills. Derived roots nest granularity under stream_id, so
    * that probe is O(#derived streams) driver-side listing, still far
    * cheaper than a distributed scan of nothing.
    */
  private def granularityExists(g: String): Boolean = {
    if (nonEmptyDir(s"$datapointsPath/granularity=$g")) return true
    def anyStreamHas(root: String): Boolean =
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .exists(k => k.isDirectory && nonEmptyDir(s"${k.getPath}/granularity=$g"))
    anyStreamHas(derivedRawPath) || anyStreamHas(rollupsPath)
  }

  private def rmTree(f: java.io.File): Unit = DatapointStore.rmTree(f)

  /** Derived streams live in two SHARED roots partitioned by stream_id
    * first (raw level and rollups): recomputing one stream deletes its two
    * partition directories and appends fresh rows — never an
    * O(whole-store) rewrite, which would be fatal at scale since
    * dependents recompute on every source append.
    */
  private def derivedRawPath = s"$rootDir/derived_raw"
  private def rollupsPath = s"$rootDir/derived_rollups"

  /** Unified scan of the datapoints table: exactly three scan nodes
    * regardless of stream count — primary root, derived raw root, derived
    * rollups root. Plan size is O(1) in #streams.
    */
  def datapoints: DataFrame = {
    val scans = Seq(datapointsPath, derivedRawPath, rollupsPath)
      .filter(nonEmptyDir)
      .map(p => DatapointStore.read(spark, Seq(p)))
    if (scans.isEmpty) DatapointStore.empty(spark)
    else scans.reduce(_.unionByName(_))
  }

  /** Stream-id filter that stays plan-friendly at scale: no filter when
    * the set is the whole catalog, a literal IN for small sets, a
    * broadcast semi-join above that (a million-id literal list would
    * explode the plan).
    */
  private def filterToStreams(df: DataFrame, idsSel: Seq[String]): DataFrame =
    if (idsSel.size == catalog.size) df
    else if (idsSel.size <= 256) df.where(col("stream_id").isin(idsSel: _*))
    else {
      import spark.implicits._
      df.join(broadcast(idsSel.toDF("stream_id")), Seq("stream_id"), "left_semi")
    }

  /** Raw points of a set of streams at their highest granularity, shaped
    * (stream_id, t, v) for the operators.
    */
  private def rawPoints(ids: Seq[String]): DataFrame = {
    val gOf = catalog.filter(d => ids.contains(d._1))
      .map { case (id, d) => id -> d.highest_granularity }
    datapoints
      .where(col("stream_id").isin(ids: _*) &&
             col("granularity").isin(gOf.values.toSeq.distinct: _*))
      .select(col("stream_id"), col("t"), col("v_num").as("v"))
  }

  // ---- A4 get_data ----------------------------------------------------

  def getData(
      streamId: String,
      granularity: Granularity,
      start: Option[Timestamp] = None,
      end: Option[Timestamp] = None,
      startExclusive: Boolean = false,
      endExclusive: Boolean = false,
      reverse: Boolean = false,
      valueDownsamplers: Option[Seq[String]] = None,
      timeDownsamplers: Option[Seq[String]] = None): DataFrame = {
    val d = catalog.getOrElse(streamId, throw StreamNotFound(streamId))
    val hg = Granularity(d.highest_granularity)
    if (granularity.seconds < hg.seconds)
      throw UnsupportedGranularity(
        s"${granularity.name} finer than stream's highest ${hg.name}")
    valueDownsamplers.foreach { vds =>
      vds.foreach(n => if (!d.value_downsamplers.contains(n))
        throw UnsupportedDownsampler(n))
    }
    timeDownsamplers.foreach { tds =>
      tds.foreach(n => if (!d.time_downsamplers.contains(n))
        throw UnsupportedDownsampler(n))
    }
    // partition pruning on granularity + parquet min/max pushdown on t
    var q = datapoints
      .where(col("granularity") === granularity.name && col("stream_id") === streamId)
    // a `t` predicate alone never prunes the ymd partition column — derive
    // the matching ymd day-key bounds explicitly (same epoch-day formula
    // as DatapointStore.ymdCol, so it is session-timezone-proof)
    start.foreach { s =>
      q = q.where(if (startExclusive) col("t") > s else col("t") >= s)
      q = q.where(col("ymd") >= DatapointStore.ymdKey(s))
    }
    end.foreach { e =>
      q = q.where(if (endExclusive) col("t") < e else col("t") <= e)
      q = q.where(col("ymd") <= DatapointStore.ymdKey(e))
    }

    val projected =
      if (granularity.seconds == hg.seconds)
        q.select(col("t"), col("v_num").as("v"), col("v_json"))
      else {
        val vds = valueDownsamplers.getOrElse(d.value_downsamplers)
        val tds = timeDownsamplers.getOrElse(d.time_downsamplers)
        val vCols = vds.map(n => col(Downsamplers.value(n)).as(n))
        // time downsamplers keep the t_ prefix: the value downsampler `mean`
        // would otherwise collide with the time downsampler `mean`
        val tCols = tds.map(n => col(s"t_$n"))
        q.select(col("t") +: (vCols ++ tCols): _*)
      }
    if (reverse) projected.orderBy(col("t").desc) else projected.orderBy(col("t"))
  }

  /** Lazy cursor over get_data results — the reference's `Datapoints`
    * wrapper. Rows stream to the driver one partition at a time
    * (`toLocalIterator`), so memory stays bounded however large the range.
    */
  def getDataIterator(
      streamId: String,
      granularity: Granularity,
      start: Option[Timestamp] = None,
      end: Option[Timestamp] = None,
      reverse: Boolean = false): java.util.Iterator[org.apache.spark.sql.Row] =
    getData(streamId, granularity, start = start, end = end,
      reverse = reverse).toLocalIterator()

  // ---- A5–A8 tags -----------------------------------------------------

  def findStreams(queryTags: Map[String, String] = Map.empty): DataFrame = {
    queryTags.foldLeft(streams) { case (df, (k, v)) =>
      df.where(element_at(col("tags"), k) === v)
    }
  }

  /** Nested-path find_streams (SURVEY §1.2: reference tags are arbitrary
    * nested JSON documents queried by nested equality). `path` is a dotted
    * path — "meta.region" (or "$.meta.region") — traversed through the
    * canonical NESTED tag document `tags_json` (which [[Json.nested]]
    * builds from the dotted flat map, so `tags("meta.region")` and this
    * traversal always agree). Each segment goes through the bracket form
    * so segment names with metacharacters survive.
    */
  def findStreamsByJsonPath(path: String, value: String): DataFrame = {
    val p = if (path.startsWith("$.")) path.drop(2) else path
    val jp = "$" + p.split('.').filter(_.nonEmpty).map(seg =>
      s"['${seg.replace("\\", "\\\\").replace("'", "\\'")}']").mkString
    streams.where(get_json_object(col("tags_json"), jp) === value)
  }

  /** Merge a NESTED JSON tag document into a stream's tags (the
    * reference's native tag shape). Leaves merge at their dotted paths;
    * numbers/booleans coerce to their JSON text, arrays stay whole as
    * JSON-text leaves. Equivalent to updateTags with the flattened map.
    */
  def updateTagsNested(streamId: String, json: String): Unit =
    updateTags(streamId, Json.flatten(json))

  /** The canonical nested tag document of a stream. */
  def getTagsJson(streamId: String): String =
    catalog.getOrElse(streamId, throw StreamNotFound(streamId)).tags_json

  def findStreamIds(queryTags: Map[String, String]): Seq[String] =
    catalog.values.filter(d =>
      queryTags.forall { case (k, v) => d.tags.get(k).contains(v) })
      .map(_.stream_id).toSeq

  def getTags(streamId: String): Map[String, String] =
    catalog.getOrElse(streamId, throw StreamNotFound(streamId)).tags

  def updateTags(streamId: String, tags: Map[String, String]): Unit = {
    val d = catalog.getOrElse(streamId, throw StreamNotFound(streamId))
    val merged = d.tags ++ tags
    catalog += streamId -> d.copy(tags = merged, tags_json = Json.nested(merged))
    persistCatalog()
  }

  def removeTag(streamId: String, tag: String): Unit = {
    val d = catalog.getOrElse(streamId, throw StreamNotFound(streamId))
    val t2 = d.tags - tag
    catalog += streamId -> d.copy(tags = t2, tags_json = Json.nested(t2))
    persistCatalog()
  }

  def clearTags(streamId: String): Unit = {
    val d = catalog.getOrElse(streamId, throw StreamNotFound(streamId))
    catalog += streamId -> d.copy(tags = Map.empty, tags_json = "{}")
    persistCatalog()
  }

  // ---- A9 delete_streams ----------------------------------------------

  def deleteStreams(queryTags: Map[String, String] = Map.empty): Int = {
    val victims = findStreamIds(queryTags).toSet
    if (victims.isEmpty) return 0
    val dependents = catalog.values.filter(d =>
      !victims(d.stream_id) && depsOf(d).exists(victims)).map(_.stream_id).toSeq
    if (dependents.nonEmpty) throw OutstandingDependenciesError(dependents)
    val (derVictims, rawVictims) =
      victims.partition(id => catalog(id).derive_op.isDefined)
    // derived streams: drop their raw + rollup partition directories, no
    // table rewrite
    derVictims.foreach { id =>
      rmTree(new java.io.File(s"$derivedRawPath/stream_id=$id"))
      rmTree(new java.io.File(s"$rollupsPath/stream_id=$id"))
    }
    // raw streams share the primary table: rewrite it (rare admin op) —
    // scan ONLY the primary root, never the union view
    if (rawVictims.nonEmpty && nonEmptyDir(datapointsPath)) {
      val kept = spark.read.parquet(datapointsPath)
        .where(!col("stream_id").isin(rawVictims.toSeq: _*))
      DatapointStore.replace(kept, datapointsPath)
    }
    catalog --= victims
    persistCatalog()
    victims.size
  }

  // ---- A10 downsample_streams + store maintenance ---------------------

  /** Retention: drop all datapoints (raw, rollup and derived) strictly
    * older than `before`, by removing whole ymd partition directories —
    * O(#partitions), no data rewrite. An engine-side extension (the
    * reference has no TTL); catalog time bounds are left untouched and are
    * advisory after expiry (earliest_ts may predate the retained data).
    */
  def expireData(before: Timestamp): Unit = {
    val key = DatapointStore.ymdKey(before)
    DatapointStore.expire(datapointsPath, key, depth = 1)
    DatapointStore.expire(derivedRawPath, key, depth = 2)
    DatapointStore.expire(rollupsPath, key, depth = 2)
  }

  /** Rewrite the main datapoints root (raw + rollup levels) to one sorted
    * file per (granularity, ymd) partition — the off-peak maintenance job
    * that undoes append fragmentation. Derived roots are excluded: their
    * per-stream partitions are replaced wholesale on every recompute, so
    * they never fragment.
    */
  def compactStore(): Unit = DatapointStore.compact(spark, datapointsPath)

  /** Fold new raw datapoints into every coarser granularity for all matched
    * streams — one distributed job per ladder level, finest→coarsest, each
    * level folding from the previous level's partial aggregates
    * (SURVEY §2.2 note a: c/s/q/l/u compose, m/d derive; the nested ladder
    * means completed coarse buckets are exactly unions of completed finer
    * buckets). Only completed buckets (bucket end <= until) are written.
    */
  /** Reference-parity overload: `until=None` means "now" (A10's default —
    * every bucket that has already closed in wall-clock time
    * materializes).
    */
  def downsampleStreams(): Option[DataFrame] =
    downsampleStreams(new Timestamp(System.currentTimeMillis()))

  def downsampleStreams(until: Timestamp,
      queryTags: Map[String, String] = Map.empty,
      returnDatapoints: Boolean = false,
      filterStream: StreamDescriptor => Boolean = _ => true)
      : Option[DataFrame] = {
    val emitted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // filterStream = the reference's filter_stream callback (A10): a
    // catalog-level predicate, evaluated on stream DESCRIPTORS (metadata
    // scale), never on datapoints
    val ids = (if (queryTags.isEmpty) catalog.keys.toSeq
               else findStreamIds(queryTags))
      .filter(id => filterStream(catalog(id)))
    if (ids.isEmpty || !datapointsExist) return None
    val hgOf = ids.map(id => id -> Granularity(catalog(id).highest_granularity)).toMap

    val isNumeric = ids.map(id => id -> (catalog(id).value_type == ValueType.Numeric)).toMap

    // per target level: streams that need it, split by fold source and by
    // value type (numeric folds all 10 aggregates; nominal/graph fold count
    // + time downsamplers only — SURVEY §1.4)
    Granularity.ladder.drop(1).foreach { g =>
      val needs = ids.filter(id => hgOf(id).seconds < g.seconds)
      if (needs.nonEmpty) {
        val prev = Granularity.ladder(Granularity.ladder.indexOf(g) - 1)
        val (fromPartials, fromRaw) =
          needs.partition(id => hgOf(id).seconds < prev.seconds)

        // high-water mark per stream at this level = max materialized
        // bucket; skipped entirely (no scan, no broadcast) when the level
        // has never been materialized
        val levelExists = granularityExists(g.name)
        lazy val existing = filterToStreams(
            datapoints.where(col("granularity") === g.name), needs)
          .groupBy("stream_id").agg(max("t").as("hwm"))

        def newBuckets(src: DataFrame): DataFrame =
          if (!levelExists) src
          else src
            .join(broadcast(existing), Seq("stream_id"), "left")
            .where(col("hwm").isNull ||
                   unix_timestamp(col("t")) >= unix_timestamp(col("hwm")) + g.seconds)
            .drop("hwm")

        def rawOf(idsSel: Seq[String]): DataFrame = filterToStreams(
          datapoints.where(
            col("granularity").isin(idsSel.map(hgOf(_).name).distinct: _*)),
          idsSel)

        val (rawNum, rawCnt) = fromRaw.partition(isNumeric)
        val (partNum, partCnt) = fromPartials.partition(isNumeric)
        val parts = Seq(
          if (rawNum.nonEmpty)
            Some(Downsample.toGranularity(
              newBuckets(rawOf(rawNum).select(col("stream_id"), col("t"),
                col("v_num").as("v"))), g, Some(until)))
          else None,
          if (rawCnt.nonEmpty)
            Some(Downsample.countOnlyToGranularity(
              newBuckets(rawOf(rawCnt).select(col("stream_id"), col("t"),
                col("v_json"))), g, Some(until)))
          else None,
          if (partNum.nonEmpty) {
            val fine = filterToStreams(
                datapoints.where(col("granularity") === prev.name), partNum)
              .select(col("stream_id"), col("t"), col("c"), col("s"), col("q"),
                col("l"), col("u"), col("t_first"), col("t_last"), col("t_mean"))
            Some(Downsample.foldToCoarser(newBuckets(fine), g)
              .where(unix_timestamp(col("t")) + g.seconds <= lit(until.getTime / 1000L)))
          } else None,
          if (partCnt.nonEmpty) {
            val fine = filterToStreams(
                datapoints.where(col("granularity") === prev.name), partCnt)
              .select(col("stream_id"), col("t"), col("c"),
                col("t_first"), col("t_last"), col("t_mean"))
            Some(Downsample.countOnlyFold(newBuckets(fine), g)
              .where(unix_timestamp(col("t")) + g.seconds <= lit(until.getTime / 1000L)))
          } else None
        ).flatten

        parts.reduceOption(_.unionByName(_, allowMissingColumns = true))
          .foreach { out =>
            // derived streams' rollups go to their own roots (so a later
            // recompute never touches the primary table); materialize when
            // splitting or returning so lineage isn't re-executed per sink
            val derivedNeeds = needs.filter(id => catalog(id).derive_op.isDefined)
            val frame = if (returnDatapoints || derivedNeeds.nonEmpty)
              out.localCheckpoint(true) else out
            if (derivedNeeds.nonEmpty) {
              DatapointStore.append(
                frame.where(!col("stream_id").isin(derivedNeeds: _*)),
                datapointsPath)
              // ALL derived streams' rollups in one partitioned write
              DatapointStore.appendByStream(
                frame.where(col("stream_id").isin(derivedNeeds: _*)),
                rollupsPath)
            } else DatapointStore.append(frame, datapointsPath)
            if (returnDatapoints) emitted += DatapointStore.normalize(frame)
          }
      }
    }
    emitted.reduceOption(_.unionByName(_))
  }

  // ---- A11 backprocess + derive ---------------------------------------

  /** All streams a derived stream reads: its sources plus an optional
    * reset stream named in derive_args (V4) — the reference treats the
    * reset stream as a named derive source too.
    */
  private def depsOf(d: StreamDescriptor): Seq[String] =
    d.derive_from ++ d.derive_args.flatMap(Json.strField(_, "reset_stream"))

  /** Derived streams in dependency order (sources before dependents). */
  private def derivedInOrder(ids: Set[String]): Seq[StreamDescriptor] = {
    val derived = catalog.values.filter(_.derive_op.isDefined).toSeq
    // transitive closure: a derived stream is affected if any dep is in
    // `ids` or is itself an affected derived stream
    var affected = derived.filter(d =>
      depsOf(d).exists(ids) || ids(d.stream_id)).toList
    var grew = true
    while (grew) {
      val cur = affected.map(_.stream_id).toSet
      val more = derived.filter(d => !cur(d.stream_id) && depsOf(d).exists(cur))
      grew = more.nonEmpty
      affected = affected ++ more
    }
    // topological: repeatedly take streams whose deps are not pending
    var pending = affected
    var done = List.empty[StreamDescriptor]
    var changed = true
    while (pending.nonEmpty && changed) {
      changed = false
      val (ready, rest) = pending.partition(d =>
        !depsOf(d).exists(src => pending.exists(_.stream_id == src)))
      if (ready.nonEmpty) { done = done ++ ready; changed = true }
      pending = rest
    }
    done
  }

  /** The day-aligned region of a stream's datapoints that an append (or a
    * cascaded derived rewrite) changed: `[loTs, end-of-hiKey]`, with
    * `hiKey=None` meaning "changed through the end of the stream".
    * `extentBefore` is the stream's data extent (last datapoint t, or
    * derive-coverage watermark for derived streams) BEFORE the change —
    * the staleness check and the exact lookback-partition key need it.
    */
  private case class Region(loTs: Timestamp, hiKey: Option[String],
      extentBefore: Option[Timestamp])

  private def dayStart(t: Timestamp): Timestamp =
    new Timestamp(Math.max(
      Math.floorDiv(Math.floorDiv(t.getTime, 1000L), 86400L), 0L) * 86400000L)

  /** Recompute derived streams whose sources include any of `ids`
    * (transitively), INCREMENTALLY where possible (SURVEY §3 E1: the
    * reference applies derive operators per append, not per full history).
    *
    * All four derive ops are lag-local — an output point depends on at
    * most its immediate predecessor (plus reset events since it) — so an
    * append changing `[lo, hi]` of a source can only change derived
    * outputs at t >= lo. The incremental path therefore rewrites only the
    * derived stream's ymd partitions from day(lo) onward (day-exact for
    * the bucket-local `sum`), reading one day of lookback instead of the
    * full source history: per-batch derive cost is O(appended window), not
    * O(history) — the property that keeps steady-state streaming ingest
    * flat as history grows. Any precondition miss (first materialization,
    * missed-coverage crash gap, unbounded lookback) falls back to the
    * idempotent full recompute, which is also what backprocess_streams
    * always does.
    */
  private def deriveDependents(ids: Set[String],
      regions0: Map[String, Region]): Unit = {
    val regions = scala.collection.mutable.Map.empty[String, Region] ++ regions0
    var changed = ids
    derivedInOrder(ids).filterNot(d => ids(d.stream_id)).foreach { d =>
      val changedDeps = depsOf(d).distinct.filter(changed)
      incrementalDerive(d, changedDeps, regions.toMap) match {
        case Some(r) => regions(d.stream_id) = r
        case None =>
          recomputeDerived(d)
          // full rewrite: the changed region is unbounded below, which
          // Region cannot express — leave no region so dependents of this
          // stream also recompute fully
          regions.remove(d.stream_id)
      }
      changed += d.stream_id
    }
  }

  /** A dependency's data extent: last datapoint timestamp for raw streams
    * (catalog), derive-coverage watermark for derived ones (marker file).
    */
  private def depExtent(id: String): Option[Timestamp] = {
    val d = catalog(id)
    if (d.derive_op.isDefined) readCoverage(id) else d.latest_ts
  }

  /** Coverage watermark a successful recompute would establish NOW: the
    * max extent over this stream's dependencies (sources recompute before
    * dependents in topological order, so their markers are fresh).
    */
  private def coverageNow(d: StreamDescriptor): Option[Timestamp] =
    depsOf(d).flatMap(depExtent).reduceOption((a, b) => if (a.after(b)) a else b)

  /** Derive-coverage marker: "this derived stream incorporates all source
    * data with t <= marker". Written (data first, marker second) after
    * every successful recompute; a crash between an append's store write
    * and its derive leaves the marker behind the sources' extent, which
    * the next append detects and heals with a full recompute. Stored as a
    * file beside the stream's partitions, not in the catalog, so catalog
    * crash-ordering never has to reason about it.
    */
  private def coverageFile(id: String) =
    new java.io.File(s"$derivedRawPath/stream_id=$id/_graft_coverage")

  private def readCoverage(id: String): Option[Timestamp] = {
    val f = coverageFile(id)
    if (!f.exists()) None
    else scala.util.Try(
      new Timestamp(new String(java.nio.file.Files.readAllBytes(f.toPath))
        .trim.toLong * 1000L)).toOption
  }

  private def writeCoverage(id: String, cw: Option[Timestamp]): Unit =
    cw.foreach { t =>
      val f = coverageFile(id)
      f.getParentFile.mkdirs()
      val tmp = new java.io.File(f.getPath + ".tmp")
      java.nio.file.Files.write(tmp.toPath,
        (t.getTime / 1000L).toString.getBytes)
      java.nio.file.Files.move(tmp.toPath, f.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

  /** Drop a derived stream's (granularity, ymd) partition directories with
    * `fromKey <= ymd <= toKey` under `root` — pure directory removal,
    * O(#partitions of one stream).
    */
  private def deleteDerivedYmds(root: String, id: String,
      fromKey: String, toKey: Option[String]): Unit = {
    val sdir = new java.io.File(s"$root/stream_id=$id")
    Option(sdir.listFiles()).getOrElse(Array.empty)
      .withFilter(_.isDirectory).foreach { gdir =>
        Option(gdir.listFiles()).getOrElse(Array.empty)
          .withFilter(f => f.isDirectory && f.getName.startsWith("ymd="))
          .foreach { ydir =>
            val k = ydir.getName.stripPrefix("ymd=")
            if (k >= fromKey && toKey.forall(k <= _)) rmTree(ydir)
          }
      }
  }

  /** Max backward partition-days one lookback scan may cover before the
    * incremental path gives up (unbounded source gap → full recompute).
    */
  private val lookbackDays = 40L

  /** The last datapoint rows (all rows at max t) of `srcId` strictly
    * before `w`, as collected (stream_id, t, v) rows — the one point of
    * lookback the lag-local ops need. Partition-exact when the pre-batch
    * latest is known (steady tail append: one ymd day scanned); a bounded
    * `lookbackDays`-day backward scan otherwise. None = could not bound
    * the search — caller must full-recompute.
    */
  private def lookbackRows(srcId: String, w: Timestamp,
      prevLatest: Option[Timestamp]): Option[Array[org.apache.spark.sql.Row]] = {
    val sd = catalog(srcId)
    val wKey = DatapointStore.ymdKey(w)
    if (wKey.toLong == 0L) return None // pre-epoch rows share day 0: no pruning
    val hg = sd.highest_granularity
    def scanDays(keyLo: String, keyHi: String): DataFrame =
      datapoints.where(col("stream_id") === srcId &&
          col("granularity") === hg &&
          col("ymd") >= keyLo && col("ymd") <= keyHi && col("t") < w)
        .select(col("stream_id"), col("t"), col("v_num").as("v"))
    def maxTRows(scan: DataFrame): Array[org.apache.spark.sql.Row] = {
      val m = scan.agg(max("t")).collect().head
      if (m.isNullAt(0)) Array.empty
      else scan.where(col("t") === m.getTimestamp(0)).collect()
    }
    if (sd.derive_op.isDefined) {
      // derived roots partition by stream_id first: the last pre-w day is
      // an exact driver-side directory listing, no probing
      val gdir = new java.io.File(s"$derivedRawPath/stream_id=$srcId/granularity=$hg")
      val keys = Option(gdir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("ymd="))
        .map(_.getName.stripPrefix("ymd=")).filter(_ < wKey)
      if (keys.isEmpty) Some(Array.empty)
      else Some(maxTRows(scanDays(keys.max, keys.max)))
    } else sd.earliest_ts match {
      case None => Some(Array.empty)
      case Some(e) if !e.before(w) => Some(Array.empty)
      case Some(e) =>
        prevLatest match {
          case Some(pl) if pl.before(w) =>
            // steady tail append: the stream's last point IS at t ==
            // prevLatest (stored timestamps are floored the same way the
            // catalog bound is), so exactly one ymd partition holds it
            val k = DatapointStore.ymdKey(pl)
            Some(maxTRows(scanDays(k, k)))
          case _ =>
            // same-day re-append or historical insert: the last pre-w
            // point's day is unknown — one pruned scan over the trailing
            // lookbackDays window, then give up
            val eDay = DatapointStore.ymdKey(e).toLong
            val loDay = math.max(wKey.toLong - lookbackDays, eDay)
            val rows = maxTRows(scanDays(f"$loDay%09d", f"${wKey.toLong - 1}%09d"))
            if (rows.nonEmpty || eDay >= wKey.toLong - lookbackDays) Some(rows)
            else None
        }
    }
  }

  /** Attempt the bounded incremental recompute of one derived stream.
    * Returns the region it rewrote (for dependents downstream), or None
    * when a precondition fails and the caller must run the full recompute.
    */
  private def incrementalDerive(d: StreamDescriptor, changedDeps: Seq[String],
      regions: Map[String, Region]): Option[Region] = {
    if (changedDeps.isEmpty || !changedDeps.forall(regions.contains)) return None
    if (!nonEmptyDir(s"$derivedRawPath/stream_id=${d.stream_id}")) return None
    val cw = readCoverage(d.stream_id) match {
      case Some(t) => t
      case None => return None // pre-marker store or never derived: full
    }
    // staleness self-heal: if any dependency already held data beyond our
    // coverage BEFORE this batch, a previous derive was skipped (crash
    // between store write and derive) — incremental would leave that gap
    // stale forever, so recompute fully instead
    val stale = depsOf(d).distinct.exists { x =>
      regions.get(x).map(_.extentBefore).getOrElse(depExtent(x))
        .exists(_.after(cw))
    }
    if (stale) return None

    val g = Granularity(d.highest_granularity)
    val w = dayStart(changedDeps.map(x => regions(x).loTs).minBy(_.getTime))
    val wKey = DatapointStore.ymdKey(w)
    def tail(ids: Seq[String], fromTs: Timestamp): DataFrame = {
      val gnames = ids.map(catalog(_).highest_granularity).distinct
      datapoints.where(col("stream_id").isin(ids: _*) &&
          col("granularity").isin(gnames: _*) &&
          col("ymd") >= DatapointStore.ymdKey(fromTs) && col("t") >= fromTs)
        .select(col("stream_id"), col("t"), col("v_num").as("v"))
    }
    val lbSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("stream_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))

    val (out, hiKeyOut): (DataFrame, Option[String]) = d.derive_op.get match {
      case DeriveOps.Sum =>
        // bucket-local: only the appended days' buckets can change (every
        // ladder granularity divides a day, so no bucket straddles the
        // day-partition boundary). Rewrite exactly those days from ALL
        // sources pruned to them.
        val his = changedDeps.map(x => regions(x).hiKey)
        val hiKey = if (his.forall(_.isDefined)) Some(his.flatten.max) else None
        val src = {
          val base = tail(d.derive_from, w)
          hiKey.fold(base)(k => base.where(col("ymd") <= k))
        }
        (Derive.streamSum(src, g, d.stream_id), hiKey)
      case op =>
        val srcId = d.derive_from.head
        val prevLatest = regions.get(srcId).map(_.extentBefore)
          .getOrElse(catalog(srcId).latest_ts)
        val lb = lookbackRows(srcId, w, prevLatest) match {
          case Some(rows) => rows
          case None => return None
        }
        val lbDf = spark.createDataFrame(
          spark.sparkContext.parallelize(lb.toSeq, 1), lbSchema)
        val input = tail(Seq(srcId), w).unionByName(lbDf)
        val res = op match {
          case DeriveOps.Derivative => Derive.derivative(input)
          case DeriveOps.CounterReset => Derive.counterReset(input)
          case DeriveOps.CounterDerivative =>
            val maxValue = d.derive_args.flatMap(Json.numField(_, "max_value"))
            val resetId = d.derive_args.flatMap(Json.strField(_, "reset_stream"))
            // resets at or after the lookback point can still suppress the
            // first in-window interval; older ones are <= prev_t for every
            // in-window pair and thus can never suppress — safe to omit
            val resetFrom = lb.headOption.map(_.getTimestamp(1)).getOrElse(w)
            val reset = resetId.map { rid =>
              datapoints.where(col("stream_id") === rid &&
                  col("granularity") === catalog(rid).highest_granularity &&
                  col("ymd") >= DatapointStore.ymdKey(resetFrom) &&
                  col("t") >= resetFrom)
                .select(lit(srcId).as("stream_id"), col("t"))
            }
            Derive.counterDerivative(input, maxValue, reset)
        }
        (res, None)
    }
    val result = out.withColumn("stream_id", lit(d.stream_id))
      .withColumn("t", timestamp_seconds(
        floor(unix_timestamp(col("t")) / g.seconds) * g.seconds))
      .where(col("t") >= lit(w)) // lookback-internal pairs never emit
    deleteDerivedYmds(derivedRawPath, d.stream_id, wKey, hiKeyOut)
    // rollups: always drop from wKey onward (not the finite sum range) —
    // the downsample ladder's high-water mark only regenerates buckets
    // past the max remaining one, so a finite mid-range hole would never
    // re-materialize
    deleteDerivedYmds(rollupsPath, d.stream_id, wKey, None)
    DatapointStore.appendByStream(result.select(
        col("stream_id"), lit(g.name).as("granularity"), col("t"),
        col("v").as("v_num")),
      derivedRawPath)
    writeCoverage(d.stream_id, coverageNow(d))
    Some(Region(w, hiKeyOut, Some(cw)))
  }

  def backprocessStreams(queryTags: Map[String, String] = Map.empty): Unit = {
    val ids = (if (queryTags.isEmpty) catalog.keys.toSeq
               else findStreamIds(queryTags)).toSet
    derivedInOrder(ids).foreach(recomputeDerived)
  }

  private def recomputeDerived(d: StreamDescriptor): Unit = {
    val g = Granularity(d.highest_granularity)
    val src = rawPoints(d.derive_from)
    val result = (d.derive_op.get match {
      case DeriveOps.Sum => Derive.streamSum(src, g, d.stream_id)
      case DeriveOps.Derivative => Derive.derivative(src)
      case DeriveOps.CounterReset => Derive.counterReset(src)
      case DeriveOps.CounterDerivative =>
        val maxValue = d.derive_args.flatMap(Json.numField(_, "max_value"))
        val resetId = d.derive_args.flatMap(Json.strField(_, "reset_stream"))
        // re-key reset events onto the (single) source stream's id so they
        // land in the same per-stream window partition they must suppress
        val srcId = d.derive_from.head
        val reset = resetId.map(id => rawPoints(Seq(id))
          .select(lit(srcId).as("stream_id"), col("t")))
        Derive.counterDerivative(src, maxValue, reset)
    }).withColumn("stream_id", lit(d.stream_id))
      // the derived stream may be coarser than its source: round output
      // timestamps to the derived stream's highest granularity, the same
      // invariant the append path enforces (streamSum already buckets)
      .withColumn("t", timestamp_seconds(
        floor(unix_timestamp(col("t")) / g.seconds) * g.seconds))
    // idempotent per-stream replace: drop this stream's raw + rollup
    // partition directories, then append the recomputed raw level —
    // O(derived stream), not O(store). `result` reads only SOURCE streams
    // (dependents recompute after us in topological order), so deleting
    // our own partitions before the write action runs is safe. Coarser
    // levels re-materialize on the next downsampleStreams call.
    rmTree(new java.io.File(s"$derivedRawPath/stream_id=${d.stream_id}"))
    rmTree(new java.io.File(s"$rollupsPath/stream_id=${d.stream_id}"))
    DatapointStore.appendByStream(result.select(
        col("stream_id"), lit(g.name).as("granularity"), col("t"),
        col("v").as("v_num")),
      derivedRawPath)
    // marker last: a crash before this line re-runs the full recompute
    writeCoverage(d.stream_id, coverageNow(d))
  }
}

/** Minimal canonical-JSON helpers. Tag documents live in TWO synchronized
  * shapes: a flat dotted-path map (`tags`, the fast equality-query form)
  * and the canonical NESTED document (`tags_json`, built by [[nested]],
  * keys sorted at every level) that json-path queries traverse. A dotted
  * flat key IS nesting: "meta.region" -> {"meta": {"region": ...}}.
  */
object Json {
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def toJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")

  /** Canonical nested JSON document from a flat dotted-path map: keys
    * split on '.', sorted at every level. A key that is both a value and
    * a parent ("a" and "a.b") has no nested representation — raises
    * [[InvalidOperatorArguments]] rather than silently dropping one. Keys
    * with empty segments ("a..b", trailing dot) stay literal leaves.
    */
  def nested(m: Map[String, String]): String = {
    import scala.collection.mutable
    val root = mutable.TreeMap.empty[String, Any] // String leaf | TreeMap obj
    def insert(obj: mutable.TreeMap[String, Any], segs: List[String],
        full: String, v: String): Unit = segs match {
      case last :: Nil => obj.get(last) match {
        case Some(_: mutable.TreeMap[_, _]) =>
          throw InvalidOperatorArguments(
            s"tag nesting conflict: '$full' is both a value and a parent")
        case _ => obj.update(last, v)
      }
      case head :: rest => obj.get(head) match {
        case Some(child: mutable.TreeMap[String @unchecked, Any @unchecked]) =>
          insert(child, rest, full, v)
        case Some(_) =>
          throw InvalidOperatorArguments(
            s"tag nesting conflict: a prefix of '$full' is already a value")
        case None =>
          val child = mutable.TreeMap.empty[String, Any]
          obj.update(head, child)
          insert(child, rest, full, v)
      }
      case Nil => ()
    }
    m.toSeq.sortBy(_._1).foreach { case (path, v) =>
      val segs = path.split('.')
      if (segs.isEmpty || segs.exists(_.isEmpty)) insert(root, List(path), path, v)
      else insert(root, segs.toList, path, v)
    }
    def render(node: Any): String = node match {
      case s: String => "\"" + esc(s) + "\""
      case o: mutable.TreeMap[String @unchecked, Any @unchecked] =>
        o.map { case (k, v) => "\"" + esc(k) + "\": " + render(v) }
          .mkString("{", ", ", "}")
    }
    render(root)
  }

  /** Flatten a nested JSON object to the dotted-path leaf map (inverse of
    * [[nested]] for string leaves). Scalar leaves coerce to their text;
    * arrays stay whole as JSON-text leaves. Jackson is Spark's own JSON
    * parser — no extra dependency.
    */
  def flatten(json: String): Map[String, String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val root = scala.util.Try(mapper.readTree(json)).getOrElse(
      throw InvalidOperatorArguments(s"invalid tag document: $json"))
    if (root == null || !root.isObject)
      throw InvalidOperatorArguments("tag document must be a JSON object")
    val out = Map.newBuilder[String, String]
    def walk(prefix: String, n: com.fasterxml.jackson.databind.JsonNode): Unit =
      if (n.isObject)
        n.properties().iterator().forEachRemaining { e =>
          walk(if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}",
            e.getValue)
        }
      else out += prefix -> (if (n.isTextual) n.asText else n.toString)
    walk("", root)
    out.result()
  }

  private def field(json: String, name: String): Option[String] = {
    val p = ("\"" + java.util.regex.Pattern.quote(name) +
      "\"\\s*:\\s*(\"([^\"]*)\"|[-0-9.eE+]+)").r
    p.findFirstMatchIn(json).map(m =>
      if (m.group(2) != null) m.group(2) else m.group(1))
  }
  def numField(json: String, name: String): Option[Double] =
    field(json, name).flatMap(s => scala.util.Try(s.toDouble).toOption)
  def strField(json: String, name: String): Option[String] = field(json, name)
}
