package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (driver north-star
  * scope). All codegen'd builtins — token counting, quality scoring and
  * fingerprinting run inside whole-stage codegen with no UDFs, so they
  * stream through a 100 TB corpus at scan speed.
  */
object TextStats {

  private val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** BPE-ish tokenizer regex: word runs or single non-space punctuation —
    * the cheap sub-word-ish proxy pretraining pipelines use for token
    * budgeting when the real tokenizer is too expensive to run at scan
    * time.
    */
  val bpeishPattern = "\\w+|[^\\w\\s]"

  /** Token statistics per document: whitespace tokens, BPE-ish regex
    * tokens, unique tokens, type-token ratio.
    */
  def tokenStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(regexp_extract_all(col(textCol), lit(bpeishPattern), lit(0)))
        .cast("long").as("n_bpeish_tokens"),
      size(array_distinct(toks)).cast("long").as("n_unique_tokens"),
      (size(array_distinct(toks)) / size(toks)).as("ttr"))
  }

  /** Quality heuristics: punctuation ratio, stopword ratio, mean word
    * length — the standard cheap filters of a pretraining pipeline.
    */
  def qualityStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // fused tokenize-and-count (see languageId) — replaces the
    // interpreted filter-lambda over a split() array
    val sw = stopwords.map(s => s"'$s'").mkString("array(array(", ", ", "))")
    docs.select(
      col(idCol).as("doc_id"),
      ((length(col(textCol)) -
        length(regexp_replace(col(textCol), "[.,!?;:]", ""))) /
        length(col(textCol))).as("punct_ratio"),
      expr(s"element_at(graft_count_tokens($textCol, $sw), 1)")
        .cast("double").divide(size(split(col(textCol), " ")))
        .as("stopword_ratio"),
      ((length(col(textCol)) - size(split(col(textCol), " ")) + 1) /
        size(split(col(textCol), " "))).as("mean_word_len"))
  }

  /** Corpus-trained unigram LM quality score: mean ln P(token) per doc,
    * where P is the token's relative frequency over the whole corpus —
    * the self-supervised "looks like the corpus" ranking signal used to
    * filter out-of-distribution gibberish when no external LM is
    * available.
    *
    * Two distributed passes: (1) explode → count per token (one shuffle
    * keyed by token); (2) explode again, broadcast-join the frequency
    * table back, re-aggregate per doc. The frequency table is
    * vocabulary-sized — orders of magnitude smaller than the corpus — so
    * it broadcasts even when the corpus is 100 TB (prune rare tokens
    * first if the vocabulary itself explodes).
    */
  def unigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
    // materialize the vocab-sized table once: it feeds the total AND the
    // broadcast join, which would otherwise each re-run the corpus
    // scan + token shuffle (CLAUDE.md: checkpoint multiply-read stages)
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val total = freq.agg(sum("n").as("total"))
    toks.join(broadcast(freq), "tok")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(avg(log(col("n") / col("total"))).as("logprob"))
  }

  /** Bigram-LM log-probability scoring — the CCNet-style "filter by LM
    * perplexity" signal, self-trained on the corpus: additive-smoothing
    * conditionals P(w2|w1) = (c(w1 w2) + alpha) / (cLeft(w1) + alpha·V),
    * with cLeft folded from the bigram table itself and V the corpus
    * vocabulary size; each document scores the average ln P over its
    * bigrams (perplexity = exp(−logprob)). Documents with fewer than two
    * tokens have no bigrams and drop out, matching the oracle's inner
    * joins.
    *
    * Scale: the count tables are vocabulary-scale groupBys of fixed-size
    * keys (never document text beyond the token stream) and the scoring
    * pass is an equi-join of the bigram stream against them; the bigram
    * array builds from ONE materialized token split via zip_with (an
    * index lambda re-evaluating split() per element is the documented
    * O(len²) trap).
    */
  def bigramLogProb(docs: DataFrame, alpha: Double = 0.5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        expr("""zip_with(slice(toks, 1, size(toks) - 1),
                |        slice(toks, 2, size(toks) - 1),
                |        (a, b) -> concat(a, ' ', b))""".stripMargin)
          .as("bigrams"))
    // the bigram stream feeds the count table AND the scoring join —
    // checkpoint once (CLAUDE.md: checkpoint multiply-read stages)
    val bg = base.select(col("doc_id"), explode(col("bigrams")).as("bg"))
      .localCheckpoint(true)
    val cnt = bg.groupBy("bg").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val leftc = cnt
      .groupBy(element_at(split(col("bg"), " "), 1).as("w1"))
      .agg(sum("c").as("lc"))
    val vocab = base.select(explode(col("toks")).as("tok"))
      .agg(countDistinct("tok").as("v"))
    bg.join(cnt, "bg")
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .join(leftc, "w1")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log((col("c") + lit(alpha)) /
          (col("lc") + lit(alpha) * col("v")))).as("logprob"))
  }

  /** Per-group token-distribution drift: KL(P(token|group) ‖ P(token))
    * for each value of `groupCol` — the corpus-profiling signal that
    * flags a source/shard whose language drifted from the mixture (high
    * KL = distinctive vocabulary; near 0 = indistinguishable from the
    * pool). No smoothing needed: every token observed in a group is
    * observed globally, so P(t) > 0 wherever the sum has weight.
    *
    * Scale: two vocabulary-scale count tables (group×token and token)
    * off ONE materialized token stream, an equi-join on token, and a
    * per-group agg — token text never shuffles more than once. Output:
    * (group, n_tokens, kl).
    */
  def tokenKlDivergence(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(groupCol).as("grp"),
        explode(split(col(textCol), " ")).as("tok"))
      .localCheckpoint(true) // feeds the group AND global count tables
    val byGrp = toks.groupBy("grp", "tok").agg(count(lit(1)).as("c_gt"))
    val glob = toks.groupBy("tok").agg(count(lit(1)).as("c_t"))
    val grpTot = toks.groupBy("grp").agg(count(lit(1)).as("n_g"))
    val total = toks.agg(count(lit(1)).as("n"))
    byGrp.join(glob, "tok")
      .join(broadcast(grpTot), "grp")
      .crossJoin(broadcast(total))
      .groupBy("grp")
      .agg(first("n_g").as("n_tokens"),
        sum((col("c_gt") / col("n_g")) *
          log((col("c_gt") / col("n_g")) / (col("c_t") / col("n"))))
          .as("kl"))
      .select(col("grp").as(groupCol), col("n_tokens"), col("kl"))
  }

  /** Repetition signals (the Gopher-style quality filters): fraction of
    * duplicated words and duplicated bigrams per document. High values
    * flag boilerplate/spam for corpus filtering. String bigrams (not the
    * hashed graft_ngrams path) so the numbers are engine-portable and
    * oracle-exact; still pure codegen'd builtins.
    */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // tokenize ONCE into a column, then build bigrams as a zip of two
    // slices of that array. An index-lambda re-evaluating split() inside
    // transform() is O(len²) per document — it re-split the whole text per
    // element and cost 14 s vs 0.6 s at sf0.1.
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        expr("""zip_with(slice(toks, 1, size(toks) - 1),
                |        slice(toks, 2, size(toks) - 1),
                |        (a, b) -> concat(a, ' ', b))""".stripMargin)
          .as("bigrams"))
      .select(
        col("doc_id"),
        (lit(1.0) -
          size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
          .as("dup_word_ratio"),
        when(size(col("bigrams")) === 0, 0.0)
          .otherwise(lit(1.0) - size(array_distinct(col("bigrams")))
            .cast("double") / size(col("bigrams")))
          .as("dup_bigram_ratio"))
  }

  /** String word trigrams of a token-array column: element i is
    * `toks[i] ⧺ ' ' ⧺ toks[i+1] ⧺ ' ' ⧺ toks[i+2]`; fewer than 3 tokens →
    * empty array. Built as a zip of three slices of the MATERIALIZED token
    * column (never index a derived expression inside a lambda — see
    * repetitionStats). String trigrams (not hashed graft_ngrams) so
    * contamination checks are engine-portable and oracle-exact.
    */
  def wordTrigrams(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val len = greatest(size(toks) - 2, lit(0))
    zip_with(
      slice(toks, lit(1), len),
      zip_with(slice(toks, lit(2), len), slice(toks, lit(3), len),
        (b, c) => concat(b, lit(" "), c)),
      (a, bc) => concat(a, lit(" "), bc))
  }

  /** 64-bit content fingerprint (order-sensitive rolling-hash style):
    * xxhash64 over the full text. Cheap doc identity for joins/logs.
    */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), xxhash64(col(textCol)).as("fp"))

  /** N-gram-heuristic language ID: scores each doc against per-language
    * marker-token sets and picks the best; `und` when nothing matches.
    * (The container has no CLD/fastText — this is the documented n-gram
    * heuristic from the driver brief, fully codegen'd.)
    */
  def languageId(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val markers = Map(
      "en" -> Seq("the", "and", "of", "is", "to"),
      "de" -> Seq("der", "die", "das", "und", "ist"),
      "fr" -> Seq("le", "la", "les", "et", "est"),
      "es" -> Seq("el", "la", "los", "y", "es"),
      "zh" -> Seq("的", "是", "了", "在", "和"))
    val langs = markers.keys.toSeq.sorted
    // one fused tokenize-and-count pass over the text for ALL languages
    // (graft_count_tokens) instead of a split() plus an interpreted
    // filter-lambda per language; scores(i) = occurrences of langs(i)'s
    // markers, identical to size(filter(toks, x -> x IN (...)))
    val groupsSql = langs.map(l =>
        markers(l).map(s => s"'$s'").mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
    val scored = docs.select(col(idCol).as("doc_id"),
      expr(s"graft_count_tokens($textCol, $groupsSql)").as("scores"))
    val score = langs.indices.map(i => element_at(col("scores"), i + 1))
    val best = langs.zip(score).map { case (l, sc) =>
      struct(sc.as("score"), lit(l).as("lang")) }
    scored.select(col("doc_id"),
      when(greatest(score: _*) > 0,
        greatest(best: _*).getField("lang")).otherwise(lit("und")).as("lang_pred"))
  }

  /** EXACT corpus heavy hitters (tokens with frequency > total/k) via a
    * Misra–Gries candidate pass: pass 1 runs an MG summary of `counters`
    * counters per partition (shuffle-free; only <= counters candidate
    * tokens + a token total leave each partition), pass 2 exact-counts
    * the candidate union alone (a broadcast semi-join keeps the groupBy's
    * shuffle at candidate tokens only, never the full vocabulary).
    *
    * Recall is STRUCTURAL, not probabilistic: a token with global count
    * > n/k has count_p > n_p/k in at least one partition (pigeonhole),
    * and MG with `counters` >= k counters keeps every token with
    * partition count > n_p/(counters+1) ⊇ > n_p/k. The exact recount
    * then makes the output independent of partitioning/stream order —
    * identical to the oracle's direct full groupBy, at a shuffle volume
    * of O(counters × partitions) instead of O(vocabulary).
    */
  def heavyHitters(docs: DataFrame, k: Int = 64, counters: Int = 128,
      textCol: String = "text"): DataFrame = {
    require(counters >= k, "MG needs counters >= k for total recall")
    val spark = docs.sparkSession
    val texts = docs.select(col(textCol).cast("string").as("t")).na.drop()
    val partials = texts.rdd.mapPartitions { it =>
      val cnt = scala.collection.mutable.HashMap[String, Long]()
      var total = 0L
      it.foreach { r =>
        // split(" ", -1) ≡ Spark split(text, ' '): empties kept
        r.getString(0).split(" ", -1).foreach { tok =>
          total += 1
          cnt.get(tok) match {
            case Some(c) => cnt(tok) = c + 1
            case None if cnt.size < counters => cnt(tok) = 1L
            case None => // decrement-all step (amortized O(1) per token)
              val dead = cnt.iterator.flatMap { case (t, c) =>
                if (c == 1L) Some(t) else { cnt(t) = c - 1; None }
              }.toArray
              dead.foreach(cnt.remove)
          }
        }
      }
      Iterator.single((cnt.keys.toArray, total))
    }.collect()
    val total = partials.map(_._2).sum
    val cand = partials.flatMap(_._1).distinct // <= counters × partitions
    import spark.implicits._
    val candDf = cand.toSeq.toDF("tok")
    texts.select(explode(split(col("t"), " ")).as("tok"))
      .join(broadcast(candDf), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > total)
      .withColumn("freq_ppm", expr(s"(1000000 * cnt) div ${total}L"))
  }

  /** K-minimum-values distinct sketch per group, next to its exact twin
    * — the mergeable cardinality estimator a 100 TB vocabulary census
    * runs where exact countDistinct shuffles every token (KMV state is
    * k hashes per group; the estimate is `(k−1)·H / h_k` with h_k the
    * k-th smallest hash over the hash space [0, H)). Hashing rides the
    * oracle-reproducible md5 15-hex BIGINT lane (H = 16¹⁵ = 2⁶⁰), so
    * the k-th hash AND the estimate are deterministic cross-engine —
    * the estimate floors the one double division (63·2⁶⁰ is an exact
    * double; both engines round the same bigint→double identically).
    * Groups with fewer than k distinct tokens report their exact count
    * (the KMV small-set rule). Output: (group, n_exact, kth_hash,
    * est_floor) — the exact column grades the estimator in place.
    */
  def kmvDistinct(docs: DataFrame, k: Int = 64,
      groupCol: String = "source", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = docs.select(col(groupCol).as("g"),
        explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok") =!= "").distinct()
      // graft_md5_tokens hashes a SPACE-SPLIT text to an array; a
      // single token yields a 1-element array — take it
      .withColumn("h", expr("element_at(graft_md5_tokens(tok), 1)"))
      .localCheckpoint(true) // exact count AND the k-smallest election
    val exact = toks.groupBy("g").agg(count(lit(1)).as("n_exact"))
    val kth = toks.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("h"), col("tok"))))
      .where(col("rn") === k)
      .select(col("g"), col("h").as("kth_hash"))
    exact.join(kth, Seq("g"), "left")
      .select(col("g").as(groupCol), col("n_exact"), col("kth_hash"),
        when(col("kth_hash").isNull, col("n_exact"))
          .otherwise(floor(lit((k - 1).toDouble) *
            lit(1.152921504606846976e18) / col("kth_hash").cast("double")))
          .as("est_floor"))
  }
}
