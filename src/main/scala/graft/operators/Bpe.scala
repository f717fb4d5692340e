package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.DatapointStore

/** Byte-pair-encoding tokenizer TRAINING over the corpus (Sennrich et al.
  * 2016 — the subword algorithm behind GPT-2/RoBERTa vocabularies), as a
  * distributed pipeline op: learning the merge table from 100 TB of text
  * is exactly the kind of corpus-wide aggregation this engine exists for.
  *
  * Scale design: training NEVER iterates the corpus. One groupBy
  * collapses the corpus to its word-frequency table (vocabulary-scale —
  * millions of rows at web scale, not billions), and every merge
  * iteration is (a) one flatMap+groupBy pair-count over that table,
  * weighted by word frequency, and (b) a TakeOrdered(1) argmax + one map
  * to apply the merge — two narrow jobs per merge on vocabulary-sized
  * data. Symbol sequences shrink monotonically, and the table is
  * localCheckpoint'd per round (iterative-lineage rule). Ties break to
  * the lexicographically smallest (a, b) so training is deterministic on
  * any cluster layout.
  *
  * Words split to characters + a terminal `</w>` marker (the classic
  * formulation: "newest" → n e w e s t </w>); merging is strict
  * left-to-right with skip-after-merge, the published overlap rule.
  */
object Bpe {

  case class WordFreq(syms: Seq[String], freq: Long)

  private val EOW = "</w>"

  /** Apply one merge (a, b) → ab to a symbol sequence, left-to-right,
    * skipping past each merge (so "aaa" under (a,a) → "aa a", never
    * "a aa" or a chain).
    */
  private[graft] def mergePair(syms: Seq[String], a: String, b: String,
      ab: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += ab; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** The vocabulary-scale word-frequency table the trainer iterates on. */
  private def wordTable(docs: DataFrame, textCol: String): Dataset[WordFreq] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => WordFreq(w.map(_.toString) :+ EOW, f) }
  }

  /** Learn up to `nMerges` merges; stops early when the best pair's
    * corpus frequency falls below `minFreq` (a merge seen once carries no
    * generalization). Returns merges in rank order.
    *
    * Job-count contract: the cluster collapses the corpus to its
    * word-frequency table ONCE; when that table fits `driverLocalMaxWords`
    * rows (the common case — web-scale English is ~10⁷ distinct words,
    * vocabulary-scale by construction) the merge loop runs driver-local
    * with incremental pair-count maintenance, so total Spark jobs are
    * O(1) in the merge count instead of 2 per merge (a 32k-merge vocab
    * was ~64k sequential jobs of pure scheduler latency on the
    * distributed loop). Oversized vocabularies fall back to
    * [[trainDistributed]] — distributed words, driver-resident pair
    * counts maintained by per-merge deltas from affected words only
    * (two narrow jobs per merge, zero per-merge shuffles). All lanes
    * produce the identical merge table (same argmax, same tie order —
    * pinned three-way in OperatorsSpec on the gate corpus).
    */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text",
      minFreq: Long = 2, driverLocalMaxWords: Int = 1000000)
      : Seq[(String, String)] = {
    val words = wordTable(docs, textCol)
    val head = words.limit(driverLocalMaxWords + 1).collect()
    if (head.length <= driverLocalMaxWords) trainLocal(head, nMerges, minFreq)
    else trainDistributed(words.localCheckpoint(true), nMerges, minFreq)
  }

  /** Spark string ORDER BY is UTF8String order = unsigned-BYTE
    * lexicographic; Java String.compareTo is UTF-16 code units, which
    * disagrees above the BMP — the driver-local tie-break must compare
    * UTF-8 bytes or the two training paths could diverge on exotic text.
    */
  private def utf8Less(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  private def pairLess(p: (String, String), q: (String, String)): Boolean =
    if (p._1 != q._1) utf8Less(p._1, q._1) else utf8Less(p._2, q._2)

  /** Driver-local merge loop over a collected word-frequency table —
    * Sennrich's reference algorithm with incremental maintenance: each
    * merge updates pair counts only for the words that CONTAIN the merged
    * pair (found via an inverted pair→words index; stale index entries —
    * words whose copy of the pair was consumed by an earlier overlap —
    * are harmless, their remove-then-re-add is a no-op). Argmax is a
    * full scan of the pair-count map with the (count desc, pair asc)
    * total order — O(#pairs) driver CPU per merge, zero Spark jobs.
    */
  private[graft] def trainLocal(table: Array[WordFreq], nMerges: Int,
      minFreq: Long): Seq[(String, String)] = {
    import scala.collection.mutable
    val syms: Array[Seq[String]] = table.map(_.syms)
    val freq: Array[Long] = table.map(_.freq)
    val pairCount = mutable.HashMap[(String, String), Long]()
    val pairWords = mutable.HashMap[(String, String), mutable.Set[Int]]()
    def rescan(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * freq(i)
        if (c == 0L) pairCount.remove(p) else pairCount(p) = c
        if (sign > 0)
          pairWords.getOrElseUpdate(p, mutable.Set[Int]()) += i
        j += 1
      }
    }
    syms.indices.foreach(rescan(_, 1L))
    val merges = Seq.newBuilder[(String, String)]
    var it = 0
    var continue = true
    while (continue && it < nMerges) {
      var best: (String, String) = null
      var bestC = 0L
      pairCount.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && best != null && pairLess(p, best))) {
          best = p; bestC = c
        }
      }
      if (best == null || bestC < minFreq) continue = false
      else {
        merges += best
        val (a, b) = best
        val ab = a + b
        pairWords.get(best).foreach(_.toArray.foreach { i =>
          rescan(i, -1L)
          syms(i) = mergePair(syms(i), a, b, ab)
          rescan(i, 1L)
        })
        pairWords.remove(best)
        it += 1
      }
    }
    merges.result()
  }

  private def containsPair(s: Seq[String], a: String, b: String): Boolean = {
    var i = 0
    while (i + 1 < s.length) {
      if (s(i) == a && s(i + 1) == b) return true
      i += 1
    }
    false
  }

  private def addPairs(m: scala.collection.mutable.HashMap[(String, String), Long],
      s: Seq[String], delta: Long): Unit = {
    var i = 0
    while (i + 1 < s.length) {
      val p = (s(i), s(i + 1))
      val c = m.getOrElse(p, 0L) + delta
      if (c == 0L) m.remove(p) else m(p) = c
      i += 1
    }
  }

  /** Distributed fallback lane for word tables too large to collect —
    * the scale split that makes 100 TB training feasible: the WORD table
    * (the big thing — tens of millions of rows) lives on disk SHARDED
    * by a stable hash of the original word (64 partition dirs, the
    * store's pruning discipline), the PAIR-COUNT table (bounded by
    * adjacent-symbol combinatorics — orders of magnitude smaller) lives
    * on the driver, and BESIDE each pair's count sits its pair→shard
    * POSTING as a single 64-bit presence mask. Per merge:
    *   - argmax = a driver map scan, ZERO jobs;
    *   - delta + rewrite = two jobs that READ ONLY THE SHARDS IN THE
    *     MERGED PAIR'S POSTING MASK (parquet partition pruning), so
    *     per-merge task counts are ∝ words actually containing the pair
    *     — the long tail of a 32k-merge vocabulary touches 1-2 shards,
    *     not the full vocabulary (the r11 full-vocab-scan-per-merge
    *     watch item);
    *   - the rewrite lands via dynamic partition overwrite, replacing
    *     only the scanned shard dirs.
    * Posting maintenance is SUPERSET-safe, mirroring trainLocal's stale
    * inverted-index rule: a pair's mask ORs in every shard whose
    * rewritten words contain it post-merge (a word can only COME to
    * contain a pair by being rewritten, and rewrites happen only in
    * scanned shards — so the mask always covers every containing word;
    * stale bits merely scan a shard that no longer matches). The single
    * shuffle in the whole train is the initial corpus-wide pair count,
    * which also seeds the masks exactly (bit_or of shard bits). If even
    * the pair-count TABLE exceeds `maxDriverPairs` (degenerate symbol
    * inventories), the per-merge [[trainDistributedNaive]] loop remains
    * as the last-resort lane. All lanes produce the identical merge
    * table (same argmax, same UTF-8-byte tie order) — pinned three-way
    * in OperatorsSpec, which also pins tail-merge scan counts via
    * `onMergeScan`.
    */
  private[graft] def trainDistributed(words0: Dataset[WordFreq],
      nMerges: Int, minFreq: Long,
      maxDriverPairs: Int = 20000000,
      onMergeScan: Int => Unit = _ => ()): Seq[(String, String)] = {
    val spark = words0.sparkSession
    import spark.implicits._
    import scala.collection.mutable
    val NShards = 64 // one Long posting mask per pair
    val work = java.nio.file.Files
      .createTempDirectory("graft-bpe-words").toString
    val dir = s"$work/words"
    // shard = stable hash of the ORIGINAL word (its init symbol split) —
    // carried as a partition column through every rewrite
    words0.toDF()
      .withColumn("shard",
        pmod(xxhash64(concat_ws(" ", col("syms"))), lit(NShards.toLong))
          .cast("int"))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    // schema pinned so per-merge reads never pay a footer-inference job
    val tableSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("syms",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.types.StructField("freq",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("shard",
        org.apache.spark.sql.types.IntegerType)))
    def shardTable(shards: Seq[Int]): Dataset[(Seq[String], Long, Int)] =
      spark.read.schema(tableSchema).parquet(dir)
        .where(col("shard").isin(shards.map(Int.box): _*))
        .select("syms", "freq", "shard").as[(Seq[String], Long, Int)]
    def allShards: Seq[Int] = 0 until NShards
    // ONE corpus-wide pair count + posting mask — the only shuffle
    val init = shardTable(0 until NShards)
      .flatMap { case (syms, f, sh) =>
        syms.iterator.sliding(2).withPartial(false)
          .map(p => (p.head, p(1), f, sh)).toSeq
      }
      .toDF("a", "b", "f", "shard")
      .groupBy("a", "b").agg(sum("f").as("cnt"),
        expr("bit_or(shiftleft(CAST(1 AS BIGINT), shard))").as("mask"))
      .as[(String, String, Long, Long)]
      .limit(maxDriverPairs + 1).collect()
    if (init.length > maxDriverPairs) {
      DatapointStore.rmTree(work)
      return trainDistributedNaive(words0, nMerges, minFreq)
    }
    val pairCount = mutable.HashMap[(String, String), Long]()
    val pairMask = mutable.HashMap[(String, String), Long]()
    init.foreach { case (a, b, c, m) =>
      pairCount((a, b)) = c; pairMask((a, b)) = m
    }
    val merges = Seq.newBuilder[(String, String)]
    var it = 0
    var continue = true
    while (continue && it < nMerges) {
      var best: (String, String) = null
      var bestC = 0L
      pairCount.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && best != null && pairLess(p, best))) {
          best = p; bestC = c
        }
      }
      if (best == null || bestC < minFreq) continue = false
      else {
        merges += best
        val (a, b) = best
        val ab = a + b
        val mask = pairMask.getOrElse(best, -1L)
        val shards = allShards.filter(s => (mask & (1L << s)) != 0L)
        onMergeScan(shards.length)
        // delta from the posted shards only: per-partition maps keyed
        // (pair → (count delta, post-merge presence mask)), no shuffle
        val deltas = shardTable(shards).rdd.mapPartitions { part =>
          val m = mutable.HashMap[(String, String), (Long, Long)]()
          def fold(s: Seq[String], d: Long, bit: Long): Unit = {
            var i = 0
            while (i + 1 < s.length) {
              val p = (s(i), s(i + 1))
              val (c0, m0) = m.getOrElse(p, (0L, 0L))
              m(p) = (c0 + d, m0 | bit)
              i += 1
            }
          }
          part.foreach { case (syms, f, sh) =>
            if (containsPair(syms, a, b)) {
              fold(syms, -f, 0L)
              fold(mergePair(syms, a, b, ab), f, 1L << sh)
            }
          }
          Iterator.single(m)
        }.collect()
        deltas.foreach(_.foreach { case (p, (d, bits)) =>
          val c = pairCount.getOrElse(p, 0L) + d
          if (c == 0L) { pairCount.remove(p); pairMask.remove(p) }
          else {
            pairCount(p) = c
            pairMask(p) = pairMask.getOrElse(p, 0L) | bits
          }
        })
        pairMask.remove(best)
        // rewrite ONLY the posted shards: ONE narrow job into a stage
        // sibling, then rename the shard dirs in (zero jobs — writing
        // the live table directly would need a plan-disconnecting
        // checkpoint job per merge to dodge the self-overwrite check;
        // the table is private session scratch, so plain renames serve)
        val stage = s"$work/stage"
        shardTable(shards)
          .map { case (syms, f, sh) =>
            if (containsPair(syms, a, b)) (mergePair(syms, a, b, ab), f, sh)
            else (syms, f, sh)
          }
          .toDF("syms", "freq", "shard")
          .write.mode("overwrite").partitionBy("shard").parquet(stage)
        val bfs = DatapointStore.fsFor(dir)
        shards.foreach { sh =>
          val live = new org.apache.hadoop.fs.Path(dir, s"shard=$sh")
          val staged = new org.apache.hadoop.fs.Path(stage, s"shard=$sh")
          // rewrites preserve row counts, so every scanned shard that
          // held rows restages; a stale-mask shard that was never
          // written (posting superset) keeps its live dir untouched
          if (bfs.exists(staged)) {
            DatapointStore.rmTree(bfs, live)
            if (!bfs.rename(staged, live))
              throw new java.io.IOException(s"bpe rewrite: cannot swap $staged")
          }
        }
        DatapointStore.rmTree(stage)
        it += 1
      }
    }
    DatapointStore.rmTree(work)
    merges.result()
  }

  /** The original distributed merge loop (2 vocabulary-scale jobs per
    * merge) — last-resort lane, engaged only when even the pair-count
    * table overflows the driver budget.
    */
  private[graft] def trainDistributedNaive(words0: Dataset[WordFreq],
      nMerges: Int, minFreq: Long): Seq[(String, String)] = {
    val spark = words0.sparkSession
    import spark.implicits._
    var words = words0
    val merges = Seq.newBuilder[(String, String)]
    var it = 0
    var continue = true
    while (continue && it < nMerges) {
      val top = words.flatMap(wf =>
          wf.syms.iterator.sliding(2).withPartial(false)
            .map(p => (p.head, p(1), wf.freq)).toSeq)
        .toDF("a", "b", "f")
        .groupBy("a", "b").agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minFreq) continue = false
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val ab = a + b
        words = words.map(wf => WordFreq(mergePair(wf.syms, a, b, ab), wf.freq))
          .localCheckpoint(true)
        it += 1
      }
    }
    merges.result()
  }

  /** Test hook: the word table for a corpus (the [[trainDistributed]]
    * input), exposed so the old≡new pin can drive both lanes.
    */
  private[graft] def wordTableFor(docs: DataFrame,
      textCol: String = "text"): Dataset[WordFreq] = wordTable(docs, textCol)

  /** Encode a corpus with a learned merge table: per doc, every word is
    * split to chars+`</w>` and the merges replay in rank order (the
    * standard greedy-by-rank encoder). The merge list broadcasts with
    * the task closure (vocabulary-scale); encoding is a pure per-row map
    * over the corpus — one pass, no shuffle. Output: (id, n_words,
    * n_subwords) — the compression audit a tokenizer change ships with.
    */
  def encodeStats(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranked = merges.toArray
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val ws = t.split(" ").filter(_.nonEmpty)
        var n = 0L
        ws.foreach { w =>
          var syms: Seq[String] = w.map(_.toString) :+ EOW
          ranked.foreach { case (a, b) =>
            if (syms.length > 1) syms = mergePair(syms, a, b, a + b)
          }
          n += syms.length
        }
        (id, ws.length.toLong, n)
      }
      .toDF(idCol, "n_words", "n_subwords")
  }
}
