package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Text-analysis queries over the documents fixture (SURVEY §7.4):
  * token/char statistics, quality scoring, heuristic language ID, and
  * content fingerprinting. All row-level map work — no shuffles, scales
  * linearly with input splits.
  */
object TextAnalysis {

  /** Per-document token statistics. */
  def stats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.charCount(col("text")).as("n_chars_actual"),
      TextFunctions.avgTokenLength(col("text")).as("avg_token_len"),
      TextFunctions.tokenEstimate(col("text")).as("n_tokens_bpe"))

  /** Per-document quality metrics. */
  def quality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      TextFunctions.stopwordCount(col("text")).as("n_stopwords"),
      TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"),
      TextFunctions.punctCount(col("text")).as("n_punct"),
      TextFunctions.qualityScore(col("text")).as("quality"))

  /** Heuristic language ID vs. the fixture's labelled lang. */
  def langId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      col("lang"),
      TextFunctions.langIdGuess(col("text")).as("lang_guess"))

  /** Exact content fingerprint (md5 — engine-neutral, oracle-checkable).
    * The rolling-hash variant ([[TextFunctions.fingerprintRolling]]) is the
    * codegen'd engine-native fingerprint, covered by unit tests.
    */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      TextFunctions.fingerprintMd5(col("text")).as("fp_md5"))

  /** Intra-document repetition ratio — the Gopher/MassiveText-style
    * boilerplate signal: the fraction of word bigrams that are repeats of
    * an earlier bigram in the same document (0 = no repetition). Pure
    * row-level map; docs with <2 tokens have no bigrams and report 0.
    */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    val grams = TextFunctions.shingles(col("text"), 2)
    // repartition first: the fixture parquet is single-row-group (one scan
    // task), so the per-doc shingling must be spread or it runs on 1 core
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(
      col("doc_id"),
      size(grams).as("n_bigrams"),
      size(array_distinct(grams)).as("n_unique"))
      .withColumn("rep_ratio",
        when(col("n_bigrams") > 0,
          (col("n_bigrams") - col("n_unique")).cast("double") /
            col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Group-wise top-k: the `k` highest-quality documents per language,
    * through the bounded-heap aggregate ([[graft.functions.TopKByScore]]).
    * Versus the window row_number form, map-side partial aggregation sends
    * at most k entries per (lang, input partition) to the shuffle — the
    * shape that matters when a group holds billions of rows. Ties rank
    * (score desc, doc_id asc) on both engines.
    */
  def topQualityDocs(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import graft.functions.TopKByScore.topKByScore
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("lang"), col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .groupBy(col("lang"))
      .agg(topKByScore(col("quality"), col("doc_id"), k).as("ids"))
      .select(col("lang"), posexplode(col("ids")))
      .select(
        col("lang"),
        col("col").as("doc_id"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Top terms via the Misra–Gries mergeable summary
    * ([[graft.functions.FrequentTerms]]) — the scale path beside the exact
    * [[vocabulary]]: one global aggregate whose bounded-map partials merge
    * map-side, so the shuffle carries ≤ capacity entries per partition
    * regardless of vocabulary size (an exact `groupBy(term)` shuffles the
    * whole term domain). With `capacity` ≥ the true distinct-term count
    * (fixture: 31 « 256) the counts are exact, which is what the q70
    * oracle checks.
    */
  def vocabularySketched(
      s: SparkSession, dir: String,
      capacity: Int = 256, topK: Int = 20): DataFrame = {
    import graft.functions.FrequentTerms.frequentTerms
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(explode(TextFunctions.tokens(col("text"))).as("term"))
      .agg(frequentTerms(col("term"), capacity).as("sk"))
      .select(explode(col("sk")))
      .select(col("key").as("term"), col("value").as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("term"))
      .limit(topK)
  }

  /** Fixed-size token-window chunking with overlap — the step that turns
    * curated documents into context-window-sized training samples: chunk
    * `k` covers tokens [k·stride, k·stride + chunkTokens), so consecutive
    * chunks overlap by `chunkTokens - stride` tokens (0 < stride ≤
    * chunkTokens). The last chunk is the one that first reaches the
    * document's end — it may be short (never padded), and no chunk after
    * it is emitted (a further start would only re-cover tokens the
    * previous chunk already holds): chunk count = 1 + ⌈max(0, n −
    * chunkTokens) / stride⌉. Pure row-level explode — no shuffle, output
    * rows ≈ n_tokens/stride per doc, and the slice/join expressions are
    * codegen'd, so the operator scales with input splits like any map.
    */
  def chunks(
      s: SparkSession, dir: String,
      chunkTokens: Int = 32, stride: Int = 24): DataFrame = {
    require(stride > 0 && stride <= chunkTokens, "need 0 < stride <= chunkTokens")
    // last chunk index: ceil((n - chunkTokens)/stride) via integer
    // arithmetic, clamped at 0 for docs shorter than one chunk
    val lastIdx =
      s"greatest(0, (size(toks) - $chunkTokens + ${stride - 1}) div $stride)"
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"), col("toks"),
        posexplode(expr(s"sequence(0, $lastIdx)")))
      .select(
        col("doc_id"),
        col("pos").cast("int").as("chunk_id"),
        (col("pos") * stride).cast("int").as("chunk_start"),
        slice(col("toks"), col("pos") * stride + 1, lit(chunkTokens)).as("chunk"))
      .select(
        col("doc_id"), col("chunk_id"), col("chunk_start"),
        size(col("chunk")).as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Occurrence-weighted mean corpus frequency of a document's tokens — a
    * "genericness" score (high = the document is made of very common
    * tokens; the inverse signal of rare-token density used by
    * CCNet-style corpus filters). Two aggregates: the term-frequency
    * table (map-side-combined groupBy over the term domain), then a join
    * back to token instances and a per-doc mean through exact decimal
    * ([[Exact.davg]]) so the double is partition-order-stable. The
    * frequency table is broadcast — even web-scale vocabularies are
    * dwarfed by the corpus; were it not, the join key is the term on both
    * sides, a plain co-partitioned shuffle join.
    */
  def commonness(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
    val counts = toks.groupBy(col("term"))
      .agg(count(lit(1)).as("term_freq"))
    toks.join(broadcast(counts), "term")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_tokens"),
        Exact.davg(col("term_freq")).as("avg_term_freq"))
  }

  /** Tokenization to vocabulary ids — the conversion step between curated
    * text and training tensors: a frequency-ranked vocabulary of the top
    * `vocabSize` terms (id = rank by count desc, term asc; 1-based), every
    * document re-expressed as its comma-joined id sequence with
    * out-of-vocabulary terms mapped to 0. Two phases with the right scale
    * shapes: the vocabulary BUILD aggregates the term domain map-side, then
    * selects the top `vocabSize` through the bounded-heap aggregate
    * ([[graft.functions.TopTermsByCount]]) — each partition of the
    * term-count table forwards ≤ vocabSize entries, so no stage ever holds
    * the whole (Heaps'-law-growing) term domain in one task, and rank is
    * the array position of the ≤ vocabSize survivors (no window anywhere);
    * the APPLY is a broadcast lookup join on exploded (doc, pos, term)
    * followed by one per-doc regroup, order restored by sorting the
    * (pos, id) pairs — no global ordering in the apply path either.
    */
  def tokenIds(
      s: SparkSession, dir: String, vocabSize: Int = 20): DataFrame = {
    import graft.functions.TopTermsByCount.topTermsByCount
    val toks = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), posexplode(TextFunctions.tokens(col("text"))))
      .withColumnRenamed("col", "term")
    val vocab = toks.groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .agg(topTermsByCount(col("n"), col("term"), vocabSize).as("v"))
      .select(posexplode(col("v")))
      .select(
        col("col.term").as("term"),
        (col("pos") + 1).cast("long").as("token_id"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .withColumn("tid", coalesce(col("token_id"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("tid")))),
            x => x.getField("tid").cast("string")),
          ",").as("token_ids"))
  }

  /** Term co-occurrence counts over a bounded top vocabulary — the
    * integer sufficient statistics of PMI/npmi collocation mining
    * (PMI(a,b) = log(n_both·N / (n_a·n_b)); the log is left to the
    * consumer so every emitted value is an exact count, engine-portable
    * bit-for-bit). Document-level co-occurrence: a pair counts once per
    * document containing both terms.
    *
    * Scale shape: the vocabulary bound is what makes co-occurrence
    * join-able at corpus scale — the pair space is C(vocabSize, 2), not
    * C(corpus vocabulary, 2), and the per-document self-join is keyed on
    * doc_id (equality join; ≤ vocabSize rows per doc on either side), so
    * the shuffle carries (doc, vocab-term) pairs, never the token stream
    * and never an all-pairs product. The vocabulary selection is the
    * bounded-heap aggregate ([[graft.functions.TopTermsByCount]]) — top
    * `vocabSize` by (doc-frequency desc, term asc) with ≤ vocabSize entries
    * per partition at the merge, never the whole term domain in one task.
    */
  def cooccurrence(
      s: SparkSession, dir: String, vocabSize: Int = 30): DataFrame = {
    import graft.functions.TopTermsByCount.topTermsByCount
    val toks = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("term"))
    val docFreq = toks.groupBy(col("term"))
      .agg(count(lit(1)).as("n_docs"))
    val vocab = docFreq
      .agg(topTermsByCount(col("n_docs"), col("term"), vocabSize).as("v"))
      .select(explode(col("v")).as("e"))
      .select(col("e.term").as("term"), col("e.n").as("n_docs"))
    // Both self-join sides consume dv; cache the narrow (doc, vocab-term)
    // projection so the tokenize+explode+vocab-join runs once, not twice.
    val dv = Caching.cacheOnce(toks.join(broadcast(vocab), "term"))
    dv.select(col("doc_id"), col("term").as("term_a"), col("n_docs").as("n_a"))
      .join(
        dv.select(
          col("doc_id").as("b_doc"), col("term").as("term_b"),
          col("n_docs").as("n_b")),
        col("doc_id") === col("b_doc") && col("term_a") < col("term_b"))
      .groupBy(col("term_a"), col("term_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_both"))
      .select("term_a", "term_b", "n_a", "n_b", "n_both")
  }

  /** Per-language quality deciles (`ntile`): every doc ranked by its
    * quality score within its language, cut into `buckets` equal-height
    * bands, then per-band corpus statistics — the curation view that
    * answers "what does the bottom decile look like, and how much of the
    * corpus is it". The ntile order carries a doc_id tiebreak so band
    * boundaries are deterministic under equal scores. One window shuffle
    * keyed by lang + one aggregation; band min/max are order-statistics
    * of bit-identical doubles, and the char mass is an integer sum, so
    * the whole row is engine-exact.
    */
  def qualityDeciles(
      s: SparkSession, dir: String, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, dir)
      .select(
        col("doc_id"), col("lang"), col("n_chars"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .withColumn("decile",
        ntile(buckets).over(
          Window.partitionBy(col("lang"))
            .orderBy(col("quality"), col("doc_id"))))
      .groupBy(col("lang"), col("decile"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"),
        sum(col("n_chars")).as("sum_chars"))
  }

  /** Per-document out-of-vocabulary statistics against the corpus top-`
    * vocabSize` vocabulary — the coverage signal that decides whether a
    * tokenizer vocabulary (or a frozen model's) fits a corpus: docs with
    * high OOV mass are the ones a vocab-bounded pipeline degrades on.
    * Same two-phase shape as [[tokenIds]]: bounded vocabulary build, then
    * a broadcast membership join on the exploded token stream folded
    * straight back into one per-doc aggregate — all counts, engine-exact.
    */
  def oovStats(
      s: SparkSession, dir: String, vocabSize: Int = 20): DataFrame = {
    import graft.functions.TopTermsByCount.topTermsByCount
    val toks = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
    val vocab = toks.groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .agg(topTermsByCount(col("n"), col("term"), vocabSize).as("v"))
      .select(explode(col("v")).as("e"))
      .select(col("e.term").as("term"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1).otherwise(0)).cast("int").as("n_oov"),
        count_distinct(when(col("in_vocab").isNull, col("term")))
          .cast("int").as("n_oov_distinct"))
  }

  /** Corpus vocabulary: the 50 most frequent terms with occurrence and
    * document frequencies. One explode + one aggregation — the shuffle
    * carries (term, partial counts) after map-side combine, and the top-k
    * is TakeOrdered (per-partition heads + driver merge, no global sort).
    */
  def vocabulary(s: SparkSession, dir: String, topK: Int = 50): DataFrame =
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("term"))
      .limit(topK)

  /** Adjacent-pair frequencies — the counting step of a BPE tokenizer
    * training round (Sennrich ACL'16: the first merge is the corpus-wide
    * most frequent symbol pair; every round is this same count over the
    * re-segmented corpus). Emitted: the top `k` pairs with rank and count.
    *
    * Scale shape: pairs are born inside the per-row `zip_with` (no
    * self-join of the token stream against itself — adjacency is array
    * structure, free at map time), counted with map-side partial
    * aggregation on the (Heaps'-law) pair domain, and the global top-k is
    * the bounded-heap [[graft.functions.TopTermsByCount]] aggregate — ≤ k
    * entries per partition at the merge, never the whole pair domain in
    * one task (the same no-global-window discipline as [[tokenIds]]).
    */
  def bpePairs(s: SparkSession, dir: String, k: Int = 30): DataFrame = {
    import graft.functions.TopTermsByCount.topTermsByCount
    val w = TextFunctions.tokens(col("text"))
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(explode(
        zip_with(
          slice(w, lit(1), size(w) - 1),
          slice(w, lit(2), size(w) - 1),
          (a, b) => concat(a, lit(" "), b))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .agg(topTermsByCount(col("n"), col("pair"), k).as("v"))
      .select(posexplode(col("v")))
      .select(
        col("col.term").as("pair"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col.n").as("n_occurrences"))
  }
}
