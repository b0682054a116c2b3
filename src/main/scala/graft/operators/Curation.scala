package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dataset-curation operators: reproducible splits and the contamination
  * check between them — the step after dedup in a training-data pipeline
  * (eval sets must not share near-duplicate documents with train).
  */
object Curation {

  /** Deterministic 80/10/10 split on the stable document id (bucket =
    * doc_id mod 10; at scale the bucket key would be a content hash so
    * re-ingested corpora split identically — same expression shape,
    * different key). Pure row-level projection: no shuffle, no state, and
    * trivially reproducible across runs and engines.
    */
  def splitExpr(id: Column): Column =
    when(pmod(id, lit(10)) < 8, lit("train"))
      .when(pmod(id, lit(10)) === 8, lit("validation"))
      .otherwise(lit("test"))

  def datasetSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), splitExpr(col("doc_id")).as("split"))

  /** CLUSTER-AWARE split (q197): the 80/10/10 split keyed by each
    * document's near-dup cluster REPRESENTATIVE
    * ([[Dedup.nearDupClusters]]' connected-component label) instead of
    * its own id — a whole near-duplicate component lands in ONE split,
    * so the leakage [[crossSplitContamination]] hunts (train and eval
    * sharing near-duplicates) is impossible BY CONSTRUCTION rather
    * than removed after the fact. Singleton documents keep their own
    * id as representative, so the split stays ~80/10/10 and exactly
    * [[datasetSplit]] wherever no duplication exists. Same distributed
    * shape as the cluster labeling (keyed shuffles only); the split
    * itself stays a pure projection.
    */
  def clusterAwareSplit(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupClusters(s, dir)
      .select(col("doc_id"), col("cluster_rep"),
        splitExpr(col("cluster_rep")).as("split"))

  /** Cross-split contamination: near-duplicate pairs (true shingle-jaccard
    * ≥ threshold, candidates from the MinHash banding of
    * [[Dedup.minhashLsh]]) where one side landed in train and the other in
    * an eval split — exactly the leakage a decontamination pass removes.
    * Output orients the pair as (train_id, eval_id).
    */
  def crossSplitContamination(
      s: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashLsh(s, dir, threshold = threshold)
      .withColumn("a_split", splitExpr(col("a_id")))
      .withColumn("b_split", splitExpr(col("b_id")))
    val aTrain = pairs
      .filter(col("a_split") === "train" && col("b_split") =!= "train")
      .select(
        col("a_id").as("train_id"), col("b_id").as("eval_id"),
        col("b_split").as("eval_split"), col("jaccard"))
    val bTrain = pairs
      .filter(col("b_split") === "train" && col("a_split") =!= "train")
      .select(
        col("b_id").as("train_id"), col("a_id").as("eval_id"),
        col("a_split").as("eval_split"), col("jaccard"))
    aTrain.unionByName(bTrain)
  }

  /** Per-stratum corpus report — the "what's in the mix" dashboard of a
    * curation pipeline: per (lang, source) document counts and length
    * statistics in one map-side-combined aggregate over one scan. Means go
    * through exact decimal intermediates ([[Exact.davg]]) so the doubles
    * are partition-order-stable (bit-identical on any executor layout).
    */
  def corpusReport(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("nt", size(split(col("text"), " ")))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        Exact.davg(col("nt")).as("avg_tokens"),
        Exact.davg(col("n_chars")).as("avg_chars"),
        max(col("n_chars")).as("max_chars"),
        min(col("n_chars")).as("min_chars"))

  /** The curation pipeline's terminal filter — quality gates composed into
    * one pass: keep documents whose quality score clears the floor, whose
    * bigram repetition stays under the boilerplate ceiling, whose
    * heuristic language agrees with the labelled one, and which carry no
    * detectable PII in the raw text. One scan, all row-level expressions;
    * every component metric is independently oracle-validated
    * (q36/q37/q56/q57), this operator pins their composition.
    */
  def curatedCorpus(
      s: SparkSession,
      dir: String,
      minQuality: Double = 0.5,
      maxRepetition: Double = 0.5): DataFrame = {
    // Composed from the component operators (each metric column is
    // exactly its independently-oracled operator), joined on doc_id, with
    // a cache barrier between computing the metrics and filtering on
    // them. The barrier is load-bearing: the text metrics are built from
    // higher-order functions (transform/filter lambdas), which are
    // CodegenFallback — without the barrier, predicate pushdown inlines
    // each metric's whole expression tree into the filter condition and
    // the interpreted evaluator re-runs the shingling per reference
    // (measured ~18× slowdown). The cached frame is narrow (ids + a few
    // numbers, no text), so the barrier costs little even at corpus
    // scale, and the gate's survivors are typically re-read many times.
    val q = TextAnalysis.quality(s, dir).select("doc_id", "quality")
    val r = TextAnalysis.repetition(s, dir).select("doc_id", "rep_ratio")
    val l = TextAnalysis.langId(s, dir) // doc_id, lang, lang_guess
    val piiCount =
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))) +
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))) +
        size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0)))
    val pii = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), piiCount.as("n_pii"))
    val metrics = Caching.cacheOnce(
      l.join(q, "doc_id").join(r, "doc_id").join(pii, "doc_id"))
    metrics
      .filter(
        col("quality") >= minQuality &&
        col("rep_ratio") <= maxRepetition &&
        col("lang_guess") === col("lang") &&
        col("n_pii") === 0)
      .select("doc_id", "lang", "quality", "rep_ratio")
  }

  /** Deterministic stratified sampling: per-language keep rates applied
    * via a stable id-mod predicate (en is downsampled to 20%, the
    * lower-resource strata keep 50%) — the language-rebalancing step of a
    * corpus mix. A pure pushed filter: no shuffle, no RNG state, identical
    * output on re-ingest and across engines (at scale the mod key would be
    * a content hash, same shape). Rates are per-stratum data, not code:
    * pass any (lang → keep-out-of-10) map.
    */
  def stratifiedSample(
      s: SparkSession,
      dir: String,
      keepOutOf10: Map[String, Int] = Map("en" -> 2),
      defaultKeep: Int = 5): DataFrame = {
    val rate = keepOutOf10.foldLeft(lit(defaultKeep)) { case (acc, (lang, k)) =>
      when(col("lang") === lang, lit(k)).otherwise(acc)
    }
    Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(10)) < rate)
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Deterministic fixed-size per-group sample: the `k` docs per language
    * ranked first by a salted content-derived order — md5 of the doc id,
    * ranked via its first 13 hex digits read as a 52-bit integer (exact in
    * a double). A hash order is a uniform-but-reproducible permutation:
    * re-runs, re-ingests, and other engines pick the IDENTICAL sample
    * (`ORDER BY substr(md5(id),1,13) DESC` in any SQL engine — zero-padded
    * lowercase hex makes lexicographic = numeric), unlike rand()-based
    * sampling. Versus [[stratifiedSample]]'s mod-filter (a fixed RATE),
    * this takes a fixed COUNT per group through the bounded-heap top-k
    * aggregate — map-side partials keep the shuffle at k entries per
    * (group, partition) regardless of corpus size, never a global window
    * sort over the corpus.
    */
  def groupSample(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import graft.functions.TopKByScore.topKByScore
    val scored = Tables.documents(s, dir)
      .select(
        col("lang"), col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 13),
          16, 10).cast("double").as("h"))
    scored.groupBy(col("lang"))
      .agg(topKByScore(col("h"), col("doc_id"), k).as("ids"))
      .select(col("lang"), posexplode(col("ids")))
      .select(
        col("lang"), col("col").as("doc_id"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** The decontamination PURGE — the action [[crossSplitContamination]]'s
    * report feeds: the train split with every document that near-duplicates
    * an eval/validation document removed. One anti-join of the (small)
    * contaminated-train-id set against the split-filtered corpus; the
    * expensive part is the candidate generation, which rides the same
    * banded-LSH pair pipeline as q53 (ids-only shuffles, never all-pairs).
    */
  def decontaminatedTrain(s: SparkSession, dir: String): DataFrame = {
    val contaminated = crossSplitContamination(s, dir)
      .select(col("train_id").as("doc_id")).distinct()
    Tables.documents(s, dir)
      .filter(splitExpr(col("doc_id")) === "train")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Contiguous sequence packing — the step that concatenates documents
    * into fixed-token-budget training samples (pack = the set of docs
    * whose concatenation fills one context window; the overflow doc opens
    * the next pack). Deterministic contiguous form: docs are laid out in
    * doc_id order and a running token total assigns
    * `pack_id = ⌊(cumsum − n_tokens) / ctxTokens⌋` — a doc opens a new
    * pack exactly when the budget its predecessors left cannot hold its
    * first token. Packing is scoped PER SOURCE: each stratum packs
    * independently (one window shuffle, parallel across strata), which is
    * the scale form — a single global pack order is inherently a
    * sequential scan on any engine, and real pipelines pack per shard.
    * Integer token counts and integer division make it cross-engine exact.
    */
  def sequencePacking(
      s: SparkSession, dir: String, ctxTokens: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select(
        col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("source"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $ctxTokens").as("pack_id"))
  }

  /** Temperature-scaled domain mixing — the step that rebalances a corpus
    * across sources before training (α < 1 flattens the source
    * distribution, upweighting small domains, as in GPT-3/Pile-style
    * mixture weighting). α is fixed at 0.5 and every step is chosen to be
    * cross-engine exact: per-source weight = ⌊√n_s⌋ (IEEE sqrt is
    * correctly rounded, floor makes it an integer), per-source target =
    * ⌊budget · w_s / Σw⌋ in integer arithmetic, and the per-source pick
    * order is md5(doc_id) — a deterministic pseudo-random permutation both
    * engines reproduce byte-for-byte (no RNG state, re-ingest-stable).
    *
    * Scale shape: the weight/target table is O(#sources) and broadcast;
    * the only data shuffle is the per-source window rank. At extreme
    * per-source cardinalities the rank would become the bounded-heap
    * top-k aggregate ([[graft.functions.TopKByScore]]) with k = target_s;
    * the window form is kept because targets vary per source.
    */
  def domainMix(s: SparkSession, dir: String, budget: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val weights = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs"))).cast("long"))
    val total = weights.agg(sum(col("w")).as("tw"))
    val targets = weights.crossJoin(broadcast(total))
      .select(col("source"), expr(s"($budget * w) div tw").as("target"))
    docs
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
      .join(broadcast(targets), "source")
      .filter(col("rk") <= col("target"))
      .select(col("doc_id"), col("source"), col("rk").cast("int").as("rk"))
  }

  /** Per-language quality percentile gate: keep the top half of each
    * language's quality distribution — the relative (distribution-aware)
    * counterpart of [[curatedCorpus]]'s absolute quality floor, which is
    * how real pipelines set thresholds when score scales differ per
    * stratum. percent_rank = (rank−1)/(n−1) is an exact small-rational
    * division, so the emitted double and the ≥ cut agree across engines
    * and partitionings; ties are ordered by doc_id so the rank itself is
    * deterministic. One scan + one per-language window shuffle.
    */
  def qualityGate(
      s: SparkSession, dir: String, keepFrom: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("doc_id"), col("lang"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .withColumn("pr", percent_rank().over(
        Window.partitionBy(col("lang")).orderBy(col("quality"), col("doc_id"))))
      .filter(col("pr") >= keepFrom)
  }

  // ── PII detection / redaction ─────────────────────────────────────────
  // Regexes written in the common subset of java.util.regex (Spark) and
  // RE2 (DuckDB oracle) — no backrefs, no lookarounds — so both engines
  // match identical spans.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** The documents fixture with deterministic synthetic PII injected
    * (fixture text itself is PII-free, which would make the detector
    * vacuous): every 3rd doc gains an email, every 4th a phone number,
    * every 5th an IPv4 — pure expressions both engines reproduce exactly.
    */
  private[graft] def syntheticPiiText: Column = {
    val id = col("doc_id")
    concat(
      col("text"),
      when(id % 3 === 0,
        concat(lit(" contact user"), id.cast("string"), lit("@mail.example.com")))
        .otherwise(lit("")),
      when(id % 4 === 0,
        concat(lit(" call 555-"), lpad((id % 1000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(id % 5 === 0,
        concat(lit(" from 192.168."), (id % 200 + 1).cast("string"), lit(".77")))
        .otherwise(lit("")))
  }

  /** Deterministic epoch sharding — the "global shuffle" a trainer needs
    * without a total-order sort: each document hashes to one of `shards`
    * buckets (seeded multiplicative hash, so epochs differ by seed yet
    * replay bit-identically), and gets a position within its shard by
    * hash order. ONE hash shuffle + per-shard window; a full ORDER BY
    * over 100 TB would range-partition and sort everything through one
    * global ordering instead. Shards are balanced by hash uniformity;
    * workers read disjoint shard files. The hash is plain integer
    * arithmetic (not xxhash64) so the oracle (q113) replays it
    * closed-form.
    */
  def trainingShards(
      s: SparkSession, dir: String, seed: Int = 7, shards: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = pmod(
      col("doc_id") * lit(2654435761L) + lit(seed.toLong) * lit(40503L),
      lit(1000000007L))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"), col("n_chars"))
  }

  /** Deterministic negative-pair mining for contrastive training: each
    * document draws `perDoc` pseudo-random partners via a fixed integer
    * hash (Knuth multiplicative constant) over (doc_id, draw index), mod
    * the corpus size — self-draws rotate to the next id. The partner
    * fetch is an ordinary key-equality join (shuffle on id, broadcast-
    * able dim at scale), NEVER a cartesian: at 100 TB this produces
    * n·perDoc pairs with an O(n) shuffle where naive "sample from the
    * cross product" shapes are O(n²). The fixed hash makes epochs
    * reproducible and the oracle (q109) closed-form.
    */
  def negativePairs(s: SparkSession, dir: String, perDoc: Int = 4): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val drawn = docs.select(col("doc_id"),
        explode(sequence(lit(1), lit(perDoc))).as("draw"))
      .withColumn("raw",
        pmod(col("doc_id") * lit(2654435761L) + col("draw") * lit(40503L), lit(n)))
      .withColumn("neg_id",
        when(col("raw") === col("doc_id"), pmod(col("raw") + 1, lit(n)))
          .otherwise(col("raw")))
      .select(col("doc_id"), col("draw").cast("int").as("draw"), col("neg_id"))
    drawn.join(
        docs.select(col("doc_id").as("neg_id"),
          length(col("text")).as("neg_len")),
        Seq("neg_id"))
      .select(col("doc_id"), col("draw"), col("neg_id"), col("neg_len"))
  }

  /** PII scan + redaction over the documents table — the safety pass of a
    * curation pipeline: per-document counts of email / phone / IPv4
    * matches, a has_pii flag (the drop-or-route decision), and a redacted
    * text with each span replaced by a typed placeholder. Row-level map
    * over one scan — no shuffle, no state; the regex work is codegen'd
    * string processing that scales embarrassingly.
    *
    * Redaction order (email → phone → IP) is fixed and mirrored in the
    * oracle so overlapping matches resolve identically.
    */
  def piiRedact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      // single-row-group fixture: spread the per-doc regex work first
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("txt", syntheticPiiText)
      .select(
        col("doc_id"),
        // group 0 = whole match, explicitly: Spark defaults the group
        // index to 1 and Ipv4Re carries a (repetition) capture group
        size(regexp_extract_all(col("txt"), lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("txt"), lit(PhoneRe), lit(0))).as("n_phones"),
        size(regexp_extract_all(col("txt"), lit(Ipv4Re), lit(0))).as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("txt"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>").as("redacted"))
      .withColumn("has_pii",
        (col("n_emails") + col("n_phones") + col("n_ips")) > 0)
}
