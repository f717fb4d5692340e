package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for large-scale training-data pipelines
  * (driver north-star scope; no counterpart in the reference — SURVEY §2.4
  * "north-star extras"). These are the steps that turn a deduped corpus
  * into an actual training mix: deterministic splits, per-source caps,
  * content scrubbing, and a reproducible global shuffle.
  *
  * Scale design:
  *  - Split assignment is a pure projection (md5 of the id) — zero
  *    shuffle, stable across runs/cluster sizes/partitionings, and any
  *    engine (Spark, DuckDB, a feature store) derives the identical split,
  *    which is what makes train/test contamination auditable at 100 TB.
  *  - Per-source capping is one hash partition by source + a per-partition
  *    top-N (rank pushdown: Spark turns the row_number filter into
  *    WindowGroupLimit, so each partition keeps N rows, not the full sort).
  *  - Redaction is a codegen'd regexp_replace projection — no UDF.
  *  - Interleave is a repartitionByRange-style total order on a hash key:
  *    one range shuffle, and the output order is a deterministic function
  *    of content, not of input file layout.
  */
object Pipeline {

  /** THE deterministic id hash of every pipeline op (md5 of the id's
    * decimal string) — splits and budget samples must stay derivable by
    * any engine from the same definition, so it lives in exactly one
    * place.
    */
  private def idHash(idCol: Column): Column =
    md5(idCol.cast("string").cast("binary"))

  /** Deterministic hash bucket in [0, 256): the first md5 byte of the id
    * rendered by its first two hex chars. String compare ≡ numeric compare
    * (fixed-width lowercase hex), so thresholds work in any SQL engine.
    */
  private def hexBucket(idCol: Column): Column =
    substring(idHash(idCol), 1, 2)

  /** Assign each row a reproducible train/val/test split by hashing its id:
    * bucket < trainHex → train, < valHex → val, else test. Default 'e6'/'f3'
    * ≈ 90/5/5. Adding rows never reassigns existing ones (no sampling, no
    * global state) — the property that keeps splits stable as a corpus
    * grows.
    */
  def hashSplit(df: DataFrame, idCol: String = "doc_id",
      trainHex: String = "e6", valHex: String = "f3"): DataFrame = {
    val b = hexBucket(col(idCol))
    df.withColumn("split",
      when(b < trainHex, "train").when(b < valHex, "val").otherwise("test"))
  }

  /** T5-style deterministic span corruption — the denoising-objective
    * input builder: cut each document's token stream into fixed `spanLen`
    * spans, corrupt span k of doc d iff the 15-hex-char md5 BIGINT of
    * "d:k" ≡ 0 (mod `oneInK`) (the reproducible-sampling lane every
    * pipeline op uses — any engine re-derives the same mask), collapse
    * each corrupted span to one `sentinel` token, and emit the corrupted
    * text beside the masked-out target tokens. Determinism is the point:
    * the corruption is a pure function of (doc_id, position), so epochs,
    * retries, and engines agree on every mask.
    *
    * Scale shape: one posexplode + one keyed hash agg; the re-assembly
    * sorts each doc's token structs INSIDE the aggregated array
    * (sort_array — no window, no per-row global ordering), and
    * array_join drops the null placeholders of masked positions. Output:
    * (id, n_spans, n_corrupted, corrupted, target).
    */
  def spanCorrupt(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", spanLen: Int = 3, oneInK: Int = 5,
      sentinel: String = "<X>"): DataFrame = {
    require(spanLen >= 1 && oneInK >= 1, "spanLen/oneInK must be >= 1")
    val pt = docs.select(col(idCol), posexplode(split(col(textCol), " ")))
      .withColumn("span", expr(s"pos div $spanLen"))
      .withColumn("flag", expr(
        "CAST(conv(substring(md5(concat(CAST(" + idCol + " AS STRING), " +
          s"':', CAST(span AS STRING))), 1, 15), 16, 10) AS BIGINT) " +
          s"% $oneInK = 0"))
      .withColumn("out_tok",
        when(!col("flag"), col("col"))
          .when(expr(s"pos % $spanLen = 0"), lit(sentinel)))
      .withColumn("tgt_tok", when(col("flag"), col("col")))
    pt.groupBy(col(idCol))
      .agg((max("span") + 1).cast("long").as("n_spans"),
        countDistinct(when(col("flag"), col("span"))).as("n_corrupted"),
        array_join(expr("transform(sort_array(collect_list(" +
          "struct(pos, out_tok))), s -> s.out_tok)"), " ").as("corrupted"),
        array_join(expr("transform(sort_array(collect_list(" +
          "struct(pos, tgt_tok))), s -> s.tgt_tok)"), " ").as("target"))
  }

  /** Keep at most `n` rows per source, preferring the longest documents
    * (n_chars desc, id asc tiebreak). The row_number filter compiles to a
    * WindowGroupLimit: each shuffle partition retains only its top-n heap
    * instead of sorting the whole source's documents.
    */
  def capPerSource(df: DataFrame, n: Int, sourceCol: String = "source",
      orderCol: String = "n_chars", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(sourceCol)
      .orderBy(col(orderCol).desc, col(idCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= n)
  }

  /** Scrub a word-class from the text (the PII-redaction shape: the real
    * pattern would be emails/phones/ids; the mechanics — a codegen'd
    * whole-word regexp_replace projection, zero shuffle — are identical).
    */
  def redact(df: DataFrame, pattern: String, replacement: String = "<ENT>",
      textCol: String = "text"): DataFrame =
    df.withColumn("redacted",
      regexp_replace(col(textCol), s"\\b(?:$pattern)\\b", replacement))

  /** Reproducible global shuffle: total-order the corpus by a content hash
    * (md5 of source:id, id tiebreak). Physically a range shuffle +
    * per-partition sort; the resulting training order is independent of
    * input file layout and cluster size.
    */
  def interleave(df: DataFrame, sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val key = md5(concat_ws(":", col(sourceCol), col(idCol).cast("string"))
      .cast("binary"))
    df.withColumn("shuffle_key", key).orderBy(col("shuffle_key"), col(idCol))
  }

  /** Sequence packing: assign documents to fixed-token-budget packs for
    * training-batch assembly. Contiguous offset packing — docs are laid
    * out in (source, id) order and pack_id = ⌊tokens-before-this-doc /
    * budget⌋ — so the assignment is a pure function of the corpus, not of
    * cluster layout. One hash shuffle by source + a running sum; each
    * source's window state is a single counter, so a 100 TB corpus packs
    * in one pass with per-source parallelism.
    */
  /** Single-pass numeric profiling: one row per requested column with
    * null count, exact distinct count, and min/max — the "know your
    * corpus before training on it" sweep. ONE aggregation job over the
    * table (Spark plans the multiple DISTINCT aggregates via expand, so
    * the input is still read once); the 1×(4·|cols|) result is then
    * unpivoted driver-free with `stack`.
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("double").as(s"${c}__mn"),
      max(col(c)).cast("double").as(s"${c}__mx")))
    val stackArgs = cols
      .map(c => s"'$c', ${c}__nn, ${c}__nd, ${c}__mn, ${c}__mx")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs)" +
        " as (col_name, n_null, n_distinct, mn, mx)"))
  }

  /** Overlapping token-window chunking — the standard long-document →
    * training-example step. Each document yields chunks starting at token
    * offsets 0, stride, 2·stride, … < n_tokens; the tail chunk may be
    * shorter than `width` (never dropped — dropping tails silently loses
    * corpus tail content, the kind of cap CLAUDE/README call out).
    *
    * Scale design: a pure generate-and-explode projection — zero shuffle,
    * zero state; chunk identity (doc_id, chunk_idx) is deterministic, so
    * re-runs and any-engine recomputation agree row-for-row. Token
    * re-slicing happens once per chunk from one materialized split array
    * (never re-tokenizing per chunk inside the lambda).
    */
  def chunkDocuments(df: DataFrame, width: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    df.select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), col("w"),
        posexplode(expr(s"transform(sequence(0, size(w) - 1, $stride)," +
          s" s -> slice(w, s + 1, $width))")))
      .select(col(idCol),
        col("pos").cast("int").as("chunk_idx"),
        (col("pos") * stride).cast("long").as("chunk_start"),
        size(col("col")).cast("long").as("n_toks"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

  def packSequences(df: DataFrame, budget: Long, sourceCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // installs the size(split)->graft_ntokens strength reduction for the
    // n_toks projection below
    graft.functions.GraftFunctions.register(df.sparkSession)
    val w = Window.partitionBy(sourceCol).orderBy(idCol)
    df.withColumn("n_toks", size(split(col(textCol), " ")).cast("long"))
      .withColumn("cum_before", sum(col("n_toks")).over(w) - col("n_toks"))
      // integer div on both engines (Spark `div` ≡ DuckDB `//`) — no
      // float rounding at pack boundaries
      .withColumn("pack_id", expr(s"cum_before div $budget"))
  }

  /** Benchmark-contamination scores: for each training document, the
    * number of its distinct word trigrams that appear anywhere in the
    * benchmark set. Docs with no overlap are absent (score 0). The
    * benchmark trigram set is deduped then broadcast — the train side
    * (the 100 TB side) streams through a broadcast hash join with no
    * shuffle; only the per-doc grouped count shuffles, keyed by doc.
    */
  def contaminationScores(train: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val benchGrams = docTrigrams(bench, idCol, textCol).select("g").distinct()
    docTrigrams(train, idCol, textCol).join(broadcast(benchGrams), "g")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
  }

  /** Per-doc distinct word trigrams — the shared probe stream of both
    * contamination lanes. */
  private def docTrigrams(df: DataFrame, idCol: String,
      textCol: String): DataFrame = df
    .select(col(idCol), split(col(textCol), " ").as("toks"))
    .select(col(idCol),
      explode(array_distinct(TextStats.wordTrigrams(col("toks")))).as("g"))

  /** [[contaminationScores]] for benchmark sets too big to broadcast as a
    * hash relation: a Bloom filter over the benchmark trigrams (~1.2
    * bytes/gram at 1% fpp vs ~50+ for a broadcast hash map — 10⁹ grams
    * fit in ~1.2 GB) prefilters the train-gram stream MAP-SIDE, and only
    * the surviving candidates pay the shuffled exact-confirm join. The
    * bloom is candidate pruning ONLY — false positives die in the exact
    * join, so the result is bit-identical to the broadcast lane (pinned
    * in OperatorsSpec) and the same oracle SQL applies.
    */
  def contaminationScoresBloom(train: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      fpp: Double = 0.01): DataFrame = {
    // three consumers (count, bloom build, confirm join) — checkpoint or
    // the bench tokenize+explode re-runs per consumer (CLAUDE.md self-join
    // re-run trap)
    val benchGrams = docTrigrams(bench, idCol, textCol).select("g")
      .distinct().localCheckpoint(true)
    val bloom = benchGrams.stat.bloomFilter("g",
      math.max(benchGrams.count(), 1L), fpp)
    val bc = train.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) => bc.value.mightContainString(g))
    docTrigrams(train, idCol, textCol)
      .where(mightContain(col("g")))
      // shuffle_hash pins the at-scale join shape (bench side too big to
      // broadcast — that's this lane's premise); shuffle volume is
      // candidates + bench grams, never the raw train-gram stream
      .join(benchGrams.hint("shuffle_hash"), Seq("g"))
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
  }

  /** Reproducible epoch-seeded global shuffle + sharding — the "shuffle
    * the corpus between training epochs" primitive. Each row hashes to a
    * 60-bit key from (seed, id), lands in `h % nShards`, and gets its
    * within-shard position; training consumes shards in (shard, pos)
    * order. Changing the seed re-deals the entire order; the same seed
    * reproduces it on any engine (the md5 arithmetic is the
    * oracle-portable 15-hex-char BIGINT lane).
    *
    * Scale shape: the hash is a pure projection; position is a window per
    * SHARD, so parallelism = nShards (pick shards ≫ cores; a shard's rows
    * are a 1/nShards sample of the corpus — balanced by construction, no
    * skew key exists). No global sort, no single-partition window.
    */
  def shuffleShards(df: DataFrame, seed: String, nShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    val h = conv(substring(md5(
        concat_ws(":", lit(seed), col(idCol).cast("string"))
          .cast("binary")), 1, 15),
      16, 10).cast("long")
    df.select(col(idCol), h.as("h"),
        pmod(h, lit(nShards.toLong)).as("shard"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy("h", idCol)).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Shared tail of the two paragraph-rewrite ops: re-join each document's
    * surviving (idx, para) windows in index order and restore docs whose
    * every window was dropped (left join, empty text) — silently losing
    * fully-scrubbed docs would corrupt downstream per-doc joins. Order is
    * recovered by sorting the structs inside the group, never by trusting
    * collect_list order (non-deterministic under shuffle).
    */
  private def reassemble(df: DataFrame, kept: DataFrame, words: Int,
      idCol: String, textCol: String): DataFrame =
    reassembleWith(df, kept,
      expr(s"(size(split($textCol, ' ')) - 1) div $words + 1"),
      " ", idCol, textCol)

  /** Generalized reassembly: `nParas` counts each document's windows (the
    * fixed-window formula or a natural-split size), `joinSep` restores
    * the document with the same separator the split used.
    */
  private def reassembleWith(df: DataFrame, kept: DataFrame,
      nParas: org.apache.spark.sql.Column, joinSep: String,
      idCol: String, textCol: String): DataFrame = {
    // installs the size(split)->graft_ntokens strength reduction for the
    // fixed-window n_paras projection (no-op for natural separators)
    graft.functions.GraftFunctions.register(df.sparkSession)
    val rebuilt = kept.groupBy(idCol).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("idx"), col("para")))),
        x => x("para")), joinSep).as("text_out"))
    df.select(col(idCol), nParas.cast("long").as("n_paras"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text_out"), lit("")).as(textCol),
        col("n_paras"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  private def paragraphs(df: DataFrame, words: Int,
      idCol: String, textCol: String): DataFrame =
    // materialized once: both ops consume this frame on BOTH sides of a
    // self-join (keeper/boiler build + probe), and without the checkpoint
    // the full tokenize+window of the corpus re-executes per side (the
    // self-join re-run trap CLAUDE.md pins for the sketch/index stages)
    chunkDocuments(df, words, words, idCol, textCol)
      .select(col(idCol), col("chunk_idx").as("idx"),
        col("chunk_text").as("para"))
      .localCheckpoint(true)

  /** C4-style corpus-wide paragraph dedup: split each document into
    * consecutive `words`-token windows ("paragraphs" — the testdata has no
    * newline structure, so a fixed window stands in for the natural split;
    * real corpora pass their own pre-split), keep only the corpus-wide
    * FIRST occurrence of each distinct window (lowest (doc id, index)),
    * and reassemble what survives per document.
    *
    * Scale design: keeper election is a groupBy(para).min(struct) — partial
    * aggregation absorbs hot duplicates map-side, deliberately NOT a window
    * over the text key (which would buffer every copy of a viral paragraph
    * on one partition); the join back on the same key AQE-skew-splits. One
    * content-keyed shuffle + one doc-keyed reassembly shuffle total.
    */
  def dedupParagraphs(df: DataFrame, words: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    reassemble(df,
      electKeepers(paragraphs(df, words, idCol, textCol), idCol),
      words, idCol, textCol)

  /** [[dedupParagraphs]] over the document's NATURAL paragraphs — the
    * caller-supplied split (C4 splits on blank lines) rather than fixed
    * token windows. Same keeper election and reassembly; documents are
    * restored with the same separator. Consecutive separators yield empty
    * paragraphs, which dedup like any other window (all but the corpus
    * first disappear) — pre-clean with regexp_replace if that matters.
    */
  def dedupParagraphsNatural(df: DataFrame, sep: String = "\n\n",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    reassembleWith(df,
      electKeepers(naturalParagraphs(df, sep, idCol, textCol), idCol),
      size(split(col(textCol), java.util.regex.Pattern.quote(sep))),
      sep, idCol, textCol)

  /** Corpus-wide FIRST-occurrence election over a (id, idx, para) frame —
    * groupBy + min(struct), deliberately not a window over the text key
    * (a viral paragraph would buffer every copy on one partition).
    */
  private def electKeepers(paras: DataFrame, idCol: String): DataFrame = {
    val keepers = paras.groupBy("para")
      .agg(min(struct(col(idCol), col("idx"))).as("keep"))
    paras.join(keepers, "para")
      .where(col(s"keep.$idCol") === col(idCol) &&
        col("keep.idx") === col("idx"))
      .select(col(idCol), col("idx"), col("para"))
  }

  private def naturalParagraphs(df: DataFrame, sep: String,
      idCol: String, textCol: String): DataFrame =
    // literal (quoted) separator — split() takes a regex; localCheckpoint
    // for the same self-join re-run reason as the fixed-window path
    df.select(col(idCol), posexplode(
        split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .select(col(idCol), col("pos").as("idx"), col("col").as("para"))
      .localCheckpoint(true)

  /** CCNet-style boilerplate removal: drop EVERY copy of a `words`-token
    * window whose exact text occurs in more than `maxDocs` distinct
    * documents (nav bars, cookie banners, license footers — text that
    * repeats across pages regardless of content). Contrast with
    * [[dedupParagraphs]]: rare windows keep all their copies here, frequent
    * windows lose even the first.
    *
    * Scale design: doc-frequency is a groupBy(para) countDistinct(doc) —
    * partial-aggregated; the >maxDocs survivor set is high-frequency by
    * definition, hence tiny relative to the corpus, so the anti join
    * broadcasts at any realistic threshold.
    */
  def removeBoilerplate(df: DataFrame, words: Int, maxDocs: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val paras = paragraphs(df, words, idCol, textCol)
    reassemble(df, dropBoiler(paras, maxDocs, idCol), words, idCol, textCol)
  }

  /** [[removeBoilerplate]] over natural (caller-split) paragraphs — see
    * [[dedupParagraphsNatural]] for the split/reassembly contract.
    */
  def removeBoilerplateNatural(df: DataFrame, maxDocs: Int,
      sep: String = "\n\n",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    reassembleWith(df,
      dropBoiler(naturalParagraphs(df, sep, idCol, textCol), maxDocs, idCol),
      size(split(col(textCol), java.util.regex.Pattern.quote(sep))),
      sep, idCol, textCol)

  private def dropBoiler(paras: DataFrame, maxDocs: Int,
      idCol: String): DataFrame = {
    val boiler = paras.groupBy("para")
      .agg(countDistinct(col(idCol)).as("df_docs"))
      .where(col("df_docs") > maxDocs).select("para")
    paras.join(boiler, Seq("para"), "left_anti")
  }

  /** Token-budget sampling: keep a reproducible pseudo-random subset of
    * each source whose cumulative token count stays within `budget`.
    * Ordering by md5(id) is the deterministic stand-in for a shuffle, so
    * the sample is stable across runs and engines; the cumulative-sum
    * cutoff is the streaming-friendly form of "sample N tokens per
    * source" (no global count pass, no rejection loop).
    */
  def sampleBudget(df: DataFrame, budget: Long, sourceCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    sampleMixture(df, Map.empty, budget, sourceCol, idCol, textCol)

  /** Per-group winsorization (outlier clamping) of an integral feature:
    * clamp to [round(p_lo), round(p_hi)] of the group's own distribution.
    * Bounds round to INTEGERS on purpose: interpolated quantiles can
    * differ in the last ulp across engines (different lerp forms), and an
    * integer bound keeps every downstream sum exact BIGINT arithmetic.
    * Bounds come from the distributed distinct-value CDF rank lane
    * ([[Percentiles.exactInterpolated]], r16 — bit-identical to builtin
    * percentile by the ScaleSpec pin, without its per-group value-count
    * map in one reducer per group), then one keyed LEFT join back (left
    * = the builtin's all-null-group row survives with null bounds).
    * Note (r16 ADVICE): the left join also means rows whose groupCol is
    * NULL pass through with null bounds — clamped = the raw value —
    * where the pre-r16 inner join dropped them; callers with nullable
    * group keys that want the old behavior must pre-filter.
    * Output adds (lo_b, hi_b, clamped).
    */
  def winsorize(df: DataFrame, valueCol: String, groupCol: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val bounds = Percentiles.exactInterpolated(df, groupCol, valueCol,
        Seq(lo -> "lo_q", hi -> "hi_q"))
      .select(col(groupCol), round(col("lo_q")).cast("long").as("lo_b"),
        round(col("hi_q")).cast("long").as("hi_b"))
    df.join(bounds, Seq(groupCol), "left")
      .withColumn("clamped",
        least(greatest(col(valueCol).cast("long"), col("lo_b")), col("hi_b")))
  }

  /** Cluster-aware train/val/test split: near-duplicate CLUSTERS, not
    * documents, are the split unit — each doc gets the [[hashSplit]] of
    * its cluster REPRESENTATIVE, so a near-dup pair can never straddle
    * train and eval (the leakage a doc-keyed split cannot prevent: a
    * crawl dup of an eval doc landing in train). `pairs` is any near-dup
    * pair set (doc_a, doc_b) — minhash, simhash or embedding detector,
    * caller's choice; docs in no pair group as themselves, so adding
    * clean docs never reassigns existing splits.
    *
    * Scale shape: label propagation runs on the PAIR graph
    * (sketch-derived, tiny vs the corpus), labels join back to the
    * corpus by id (broadcast-able — clustered docs are the minority by
    * the premise of dedup), and the split itself stays a pure
    * projection. Output adds (group_id, split).
    */
  def leakageSafeSplit(df: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", trainHex: String = "e6",
      valHex: String = "f3"): DataFrame = {
    val cc = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as(idCol), col("rep_id"))
    val grouped = df.join(cc, Seq(idCol), "left")
      .withColumn("group_id", coalesce(col("rep_id"), col(idCol)))
      .drop("rep_id")
    val b = hexBucket(col("group_id"))
    grouped.withColumn("split",
      when(b < trainHex, "train").when(b < valHex, "val").otherwise("test"))
  }

  /** Deterministic weighted priority sample (PPS-style, k rows): each row
    * draws u = 60-bit md5(seed:id) — uniform over [0, 2^60) — and its
    * priority is `u div weight` (BIGINT floor division), so doubling a
    * row's weight halves its expected priority and the k SMALLEST
    * priorities are a probability-proportional-to-size sample. Integer
    * arithmetic only (no exp/ln, whose last-ulp varies across libm
    * implementations), so any engine reproduces the exact sample from the
    * same (seed, id, weight) triples.
    *
    * Scale shape: priority is a pure projection; the global top-k compiles
    * to TakeOrderedAndProject (per-partition heap + driver merge of k
    * rows), never a full sort of the corpus. Weights must be >= 1.
    */
  def sampleWeighted(df: DataFrame, k: Int, seed: String,
      weightCol: String, idCol: String = "doc_id"): DataFrame = {
    val u = conv(substring(md5(
        concat_ws(":", lit(seed), col(idCol).cast("string"))
          .cast("binary")), 1, 15),
      16, 10).cast("long")
    df.withColumn("__u", u)
      .withColumn("priority",
        expr(s"__u div CAST($weightCol AS BIGINT)"))
      .drop("__u")
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** Mixture reweighting: [[sampleBudget]] with a per-source token budget
    * so the sampled corpus hits a TARGET source mix (upweight curated
    * sources, cap the crawl) instead of equal shares. Budgets compile to
    * a literal when-chain — no join, no extra shuffle beyond the same
    * per-source window pass; sources missing from `budgets` get
    * `default` (0 drops them entirely).
    */
  def sampleMixture(df: DataFrame, budgets: Map[String, Long],
      default: Long, sourceCol: String = "source",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val budgetCol = budgets.toSeq.sortBy(_._1)
      .foldLeft(lit(default)) { case (acc, (src, b)) =>
        when(col(sourceCol) === src, lit(b)).otherwise(acc)
      }
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(idHash(col(idCol)), col(idCol))
    df.withColumn("n_toks", size(split(col(textCol), " ")).cast("long"))
      .withColumn("cum_toks", sum(col("n_toks")).over(w))
      .where(col("cum_toks") <= budgetCol)
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each document by
    * how target-like its HASHED n-gram feature distribution is, using
    * per-bucket importance weights estimated from the corpus itself.
    *
    *   bucket(tok) = md5_60(tok) mod `buckets`
    *   w(b)        = (scale * (target_count(b)+1)) div (raw_count(b)+1)
    *   score(doc)  = Σ_tokens w(bucket(tok))
    *
    * The paper's weight is the LOG likelihood ratio and selection is
    * Gumbel resampling; this variant keeps the hashed-feature estimator
    * but uses FIXED-POINT ratio weights and top-k selection, because
    * log/exp reproduce differently in the last ulp across libm
    * implementations — integer floor division makes the scores (and
    * therefore the selected set) bit-identical on any engine, which is
    * what lets a 100 TB selection be audited by an independent system.
    * Laplace +1 smoothing keeps empty buckets finite.
    *
    * Scale shape: the weight table is `buckets` rows — broadcast — so
    * scoring is scan → explode → broadcast-join → one (doc_id) hash agg;
    * nothing shuffles document text. The corpus is scanned twice (count
    * pass + scoring pass); at 100 TB that beats materializing the
    * exploded token stream, and both bucket counts (raw + target) come
    * out of the SAME first pass via a conditional aggregate.
    * Output: (idCol, dsir_score BIGINT).
    */
  def dsirScores(df: DataFrame, target: Column, buckets: Int = 512,
      scale: Long = 1000000L, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    def toks = df.select(col(idCol), target.as("__tgt"),
        explode(expr(s"graft_md5_tokens($textCol)")).as("__h"))
      .withColumn("__b", pmod(col("__h"), lit(buckets.toLong)))
    val weights = toks.groupBy("__b")
      .agg(count(lit(1)).as("__r"), count_if(col("__tgt")).as("__t"))
      .select(col("__b"),
        expr(s"($scale * (__t + 1L)) div (__r + 1L)").as("__w"))
    toks.join(broadcast(weights), "__b")
      .groupBy(col(idCol))
      .agg(sum(col("__w")).as("dsir_score"))
  }

  /** k-anonymity / l-diversity audit: group rows by their quasi-
    * identifier columns and report, per equivalence class, the class
    * size, the number of distinct sensitive values (l-diversity), and
    * whether the class must be suppressed (size < k) before release —
    * the standard privacy gate a training-data export runs before
    * shipping user-derived records.
    *
    * Scale shape: ONE hash aggregation on the QI key (count +
    * count-distinct partial-aggregate map-side); nothing is sorted or
    * windowed, no self-joins — the audit costs the same as a groupBy
    * count at any corpus size.
    */
  def kAnonymityReport(df: DataFrame, qi: Seq[String], sensitive: String,
      k: Long): DataFrame =
    df.groupBy(qi.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitive)).as("l_diversity"))
      .withColumn("suppressed", col("class_size") < k)

  /** Quantile normalization across groups (the microarray classic, here
    * for balancing per-source length/score distributions): every row's
    * value is replaced by the GLOBAL value at the same relative rank —
    * qnorm = v(g) with g = ceil(r·N / n_g), r the row's 1-based rank
    * inside its group (ties by id) and v(·) the global type-1 order
    * statistic. Pure integer rank arithmetic ((r·N + n_g − 1) div n_g,
    * never a float quantile), so the mapping is bit-identical
    * cross-engine.
    *
    * Scale shape — deliberately NO global per-row window: the per-group
    * rank is a group-partitioned window (the inherent order-statistics
    * shuffle), and the global CDF is built on the DISTINCT-VALUE
    * histogram (metadata-scale; its cumulative window is bounded by the
    * value support, q_ntile_cume-style), then applied with a broadcast
    * range join `lo < g <= hi`. A naive global row_number would funnel
    * the corpus through one partition.
    *
    * Output: input id/group/value + `qnorm`.
    */
  def quantileNormalize(df: DataFrame, valueCol: String,
      groupCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val rows = df.select(col(idCol), col(groupCol), col(valueCol))
    val cnt = rows.groupBy(valueCol).agg(count(lit(1)).as("ca"))
      .withColumn("hi", sum("ca").over(Window.orderBy(valueCol)))
      .withColumn("lo", col("hi") - col("ca"))
      .select(col(valueCol).as("qnorm"), col("lo"), col("hi"))
    val ns = rows.groupBy(groupCol).agg(count(lit(1)).as("n_g"))
    val tot = rows.agg(count(lit(1)).as("n_total"))
    rows
      .withColumn("r", row_number().over(
        Window.partitionBy(groupCol).orderBy(col(valueCol), col(idCol))))
      .join(broadcast(ns), Seq(groupCol))
      .crossJoin(broadcast(tot))
      .withColumn("g", expr("(r * n_total + n_g - 1) div n_g"))
      .join(broadcast(cnt), col("g") > col("lo") && col("g") <= col("hi"))
      .select(col(idCol), col(groupCol), col(valueCol), col("qnorm"))
  }

  /** PII release audit: per source, how many documents contain an
    * email / phone / URL pattern — the scan a pipeline runs BEFORE
    * shipping a corpus (the detection complement of [[redact]], which
    * rewrites). One conditional-agg pass over the corpus; the regexes
    * stay inside the common RE2 ⊆ Java-regex subset so the report is
    * reproducible on any engine. Counts are per-document (a doc with
    * three emails counts once per family).
    */
  def piiScan(df: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val phone = "[0-9]{3}-[0-9]{4}"
    val url = "https?://[^ ]+"
    def hits(p: String) = sum(when(col(textCol).rlike(p), 1L).otherwise(0L))
    df.groupBy(sourceCol).agg(
      count(lit(1)).as("n_docs"),
      hits(email).as("n_email"),
      hits(phone).as("n_phone"),
      hits(url).as("n_url"))
  }

  /** Largest-remainder (Hamilton) quota split: assign every row of a
    * stratum to one of the weighted splits so each stratum's allocation
    * is EXACTLY proportional — base quota floor(n_s·w_i / Σw), then the
    * leftover seats go to the splits with the largest remainders
    * (n_s·w_i mod Σw, ties to declaration order). [[hashSplit]] is only
    * proportional in expectation; this is the lane for small strata
    * where a hash split's binomial noise can starve a 10% dev set.
    * All quota arithmetic is integer, so the assignment is a pure
    * function of (counts, weights, in-stratum order) — bit-identical on
    * any engine.
    *
    * In-stratum order is `idCol` ascending (any total order works; ids
    * keep it reproducible across runs). Scale shape: quotas come from
    * one metadata-scale count agg; the assignment is one per-stratum
    * sort window (the order-statistics shuffle — inherent to exact
    * allocation) plus a broadcast range join of the quota boundaries.
    *
    * Output: input rows + `split`.
    */
  def quotaSplit(df: DataFrame, weights: Seq[(String, Long)],
      stratumCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val total = weights.map(_._2).sum
    val wdf = weights.zipWithIndex
      .map { case ((name, w), i) => (name, w, i.toLong) }
      .toDF("split", "w", "ord")
    val ns = df.groupBy(stratumCol).agg(count(lit(1)).as("n_s"))
    val wS = Window.partitionBy(stratumCol)
    val quotas = ns.crossJoin(broadcast(wdf))
      .withColumn("base", expr(s"(n_s * w) div $total"))
      .withColumn("frac", expr(s"(n_s * w) % $total"))
      .withColumn("rem_rank", row_number().over(
        wS.orderBy(col("frac").desc, col("ord"))))
      .withColumn("rem_total", col("n_s") - sum("base").over(wS))
      .withColumn("quota", col("base") +
        when(col("rem_rank") <= col("rem_total"), 1L).otherwise(0L))
      .withColumn("hi", sum("quota").over(wS.orderBy("ord")))
      .withColumn("lo", col("hi") - col("quota"))
      .select(col(stratumCol), col("split"), col("lo"), col("hi"))
    df.withColumn("rn", row_number().over(wS.orderBy(idCol)))
      .join(broadcast(quotas), Seq(stratumCol))
      .where(col("rn") > col("lo") && col("rn") <= col("hi"))
      .drop("rn", "lo", "hi")
  }

  /** t-closeness audit — the distributional complement of
    * [[kAnonymityReport]]: k-anonymity bounds how FEW records share a
    * quasi-identifier class, l-diversity how few distinct sensitive
    * values; t-closeness bounds how far a class's sensitive-value
    * DISTRIBUTION drifts from the corpus-wide one (a class can be large
    * and diverse yet still leak — e.g. 95% one segment where the corpus
    * is 20%). Distance is total-variation, computed entirely in exact
    * integer cross-multiplied form: per class of size n against the
    * global table of size N, tvd_num = Σ_v |c_v·N − g_v·n| and
    * tvd_ppm = (10⁶·tvd_num) div (2·n·N) — TVD·10⁶ floored, no float
    * probabilities anywhere so the report is bit-identical cross-engine.
    * (BIGINT headroom: c_v·N and the Σ bound by n·N·2 — fine to ~10⁹
    * records; beyond that scale the ppm lane would move to per-class
    * DECIMAL accumulation.)
    *
    * Scale shape: ONE corpus scan into a (QI, sensitive) hash aggregation
    * (metadata-scale output); classes × global-values is a broadcast
    * cross join over that aggregate, never over records. The class-value
    * grid must include values a class NEVER takes (they contribute
    * g_v·n), hence the left join + zero fill.
    *
    * Output: one row per QI class — (qi…, n, tvd_num, tvd_ppm).
    */
  def tClosenessReport(df: DataFrame, qi: Seq[String],
      sensitive: String): DataFrame = {
    // the one corpus-scan aggregate; every other relation derives from it
    val cv = df.groupBy((qi :+ sensitive).map(col): _*)
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val cls = cv.groupBy(qi.map(col): _*).agg(sum("c").as("n"))
    val gv = cv.groupBy(sensitive).agg(sum("c").as("g"))
    val tot = cv.agg(sum("c").as("n_total"))
    cls.crossJoin(broadcast(gv))
      .join(cv, qi :+ sensitive, "left").na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
      .withColumn("dev", abs(col("c") * col("n_total") - col("g") * col("n")))
      .groupBy((qi.map(col) :+ col("n") :+ col("n_total")): _*)
      .agg(sum("dev").as("tvd_num"))
      .withColumn("tvd_ppm", expr("(1000000 * tvd_num) div (2 * n * n_total)"))
      .select((qi.map(col) ++ Seq(col("n"), col("tvd_num"),
        col("tvd_ppm"))): _*)
  }

  /** Batch perceptron trained on integer quality features — the
    * cheap-trainable document quality classifier every curation pipeline
    * keeps in front of the expensive model (fastText-style): label
    * y ∈ {+1, −1} (lang == 'en'), features (bias, capped n_chars/100,
    * capped tokens/10, capped sentence count), and per round the CLASSIC
    * batch update w += Σ_{y·(w·x) ≤ 0} y·x — one aggregate job per round
    * over a localCheckpointed feature frame, no shuffle beyond the agg's
    * partials.
    *
    * The whole trainer is PURE INTEGER (no learning rate, no sigmoid, no
    * division), so the weight trajectory is exact cross-engine and the
    * oracle replays it as fixed-round unrolled AS MATERIALIZED CTEs.
    * Headroom: |w_j| grows ≤ Σ|x_j| ≤ 10·n per round ⇒ predictions stay
    * ≤ 4·10·(rounds·10·n) ≪ 2⁶³ for any corpus this library targets.
    * Output: one row per round — weights AFTER the update, n_mis under
    * the weights BEFORE it.
    */
  def perceptron(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val f = docs.select(
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
      lit(1L).as("x0"),
      expr("least(n_chars div 100, 10L)").as("x1"),
      expr("least(cast(size(split(text, ' ')) as bigint) div 10, 10L)")
        .as("x2"),
      expr("least(cast(size(split(text, '\\\\.')) as bigint) - 1, 10L)")
        .as("x3"))
      .localCheckpoint(true) // feeds `rounds` sequential aggregates
    var wv = Array(0L, 0L, 0L, 0L)
    val hist = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long, Long, Long)]
    for (r <- 1 to rounds) {
      val pred = expr(
        s"${wv(0)}L * x0 + ${wv(1)}L * x1 + ${wv(2)}L * x2 + ${wv(3)}L * x3")
      val mis = (col("y") * pred) <= 0
      val row = f.select(
        sum(when(mis, col("y") * col("x0")).otherwise(0L)).as("g0"),
        sum(when(mis, col("y") * col("x1")).otherwise(0L)).as("g1"),
        sum(when(mis, col("y") * col("x2")).otherwise(0L)).as("g2"),
        sum(when(mis, col("y") * col("x3")).otherwise(0L)).as("g3"),
        sum(when(mis, 1L).otherwise(0L)).as("n_mis")).head()
      wv = wv.zipWithIndex.map { case (w0, j) => w0 + row.getLong(j) }
      hist += ((r, wv(0), wv(1), wv(2), wv(3), row.getLong(4)))
    }
    hist.toSeq.toDF("round", "w0", "w1", "w2", "w3", "n_mis")
  }
}
