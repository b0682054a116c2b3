package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}
import graft.sources.Tables

/** Deduplication family for training-data pipelines (SURVEY §7.4): exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine. Every variant is
  * join-shaped — candidate generation is always a key-equality self-join on
  * a blocking/bucket key, never an all-pairs comparison, so the shuffle
  * volume scales with bucket sizes, not n² (the property that matters at
  * 100 TB).
  */
object Dedup {

  /** Exact dedup: keep the lowest-doc_id representative of each distinct
    * text. One shuffle on the text hash (Spark groups by the value; for
    * very long texts, group by `fingerprintMd5` instead to shrink shuffle
    * keys — same result, 32-byte keys).
    */
  def exact(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  /** N-gram (token-set) Jaccard near-dup pairs.
    *
    * Blocking: candidates must share `lang` and have token counts within
    * ±20% (length filter is a standard Jaccard bound: |A∩B|/|A∪B| ≥ τ
    * implies |A|/|B| ≥ τ). The blocking key has tiny cardinality (5
    * langs), so a shuffle join would cap parallelism at 5 tasks; instead
    * the right side is broadcast and the left side repartitioned to core
    * count — every task streams its slice of docs against the in-memory
    * block index. At 100 TB the broadcast side becomes a salted
    * (lang, salt) shuffle join; the verify arithmetic is unchanged.
    *
    * Per-pair cost: token arrays are pre-sorted once per doc, so the
    * intersection is a codegen'd two-pointer merge
    * ([[graft.functions.SortedIntersectCount]]) and |A∪B| is
    * |A|+|B|−|A∩B| — no per-pair hash sets or array materialization.
    */
  def ngramJaccard(s: SparkSession, dir: String, threshold: Double = 0.6): DataFrame = {
    // repartition BEFORE the tokenize/sort projection: the fixture files
    // are single-row-group parquet (one scan task), so per-doc compute
    // must be spread first or it runs on one core.
    val docs = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        col("lang"),
        sort_array(array_distinct(TextFunctions.tokens(col("text")))).as("toks"))
      .withColumn("nt", size(col("toks")))

    val a = docs
      .select(
        col("doc_id").as("a_id"), col("lang"),
        col("toks").as("a_toks"), col("nt").as("a_nt"))
    val b = docs.select(
      col("doc_id").as("b_id"), col("lang").as("b_lang"),
      col("toks").as("b_toks"), col("nt").as("b_nt"))

    a.join(broadcast(b),
        col("lang") === col("b_lang") &&
        col("a_id") < col("b_id") &&
        col("a_nt") * 5 >= col("b_nt") * 4 &&
        col("b_nt") * 5 >= col("a_nt") * 4)
      .withColumn("n_inter",
        TextFunctions.sortedIntersectCount(col("a_toks"), col("b_toks")))
      .withColumn("n_union", col("a_nt") + col("b_nt") - col("n_inter"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / col("n_union").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "n_inter", "n_union", "jaccard")
  }

  /** MinHash + LSH near-dup pairs (Broder '97 resemblance sketches;
    * banding per Leskovec/Rajaraman/Ullman "Mining of Massive Datasets"
    * ch.3): shingle → 64-hash MinHash signature → 16 bands of 4 →
    * candidates = pairs sharing any band bucket (key-equality join on
    * (band index, band hash)) → verified against true shingle-set Jaccard.
    * All-pairs never materializes; shuffle is bounded by bucket sizes.
    */
  def minhashLsh(
      s: SparkSession,
      dir: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    // Shingling + signing is the expensive per-doc step and the frame is
    // consumed three times (banding, and both sides of the verify join) —
    // repartition first (single-row-group input = one scan task), compute
    // once, persist. A few MB per 10k docs; lives until session end
    // (each driver run uses a fresh session).
    val docs = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        sort_array(array_distinct(TextFunctions.shingles(col("text"), shingleK)))
          .as("shingles"))
      .withColumn("sig", TextFunctions.minhashOfShingles(col("shingles"), numHashes))
      .persist()

    // Explode signature into (band, bandHash) bucket keys — ids only, so
    // the bucket join shuffles 16 small rows per doc, not 16 copies of
    // the shingle array. Shingles are re-attached to the (far smaller)
    // surviving candidate pairs for the verify step.
    val bandCols = (0 until bands).map(bi =>
      xxhash64(slice(col("sig"), bi * rows + 1, rows)))
    val banded = docs.select(
      col("doc_id"),
      posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")

    val candidates = banded
      .join(
        banded.select(
          col("band").as("b_band"), col("band_hash").as("b_hash"),
          col("doc_id").as("b_id")),
        col("band") === col("b_band") &&
        col("band_hash") === col("b_hash") &&
        col("doc_id") < col("b_id"))
      .select(col("doc_id").as("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")

    val shA = docs.select(col("doc_id").as("a_id"), col("shingles").as("a_sh"))
    val shB = docs.select(col("doc_id").as("b_id"), col("shingles").as("b_sh"))
    candidates
      .join(shA, "a_id")
      .join(shB, "b_id")
      .withColumn("n_inter",
        TextFunctions.sortedIntersectCount(col("a_sh"), col("b_sh")))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (size(col("a_sh")) + size(col("b_sh")) - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** SimHash near-dup pairs (Charikar '02; used for web-scale dedup in
    * Manku et al., WWW'07): 64-bit token fingerprint; near-dups differ in
    * ≤ `maxHamming` bits. Candidate generation via the pigeonhole block
    * trick: split the fingerprint into `maxHamming + 1` chunks — any pair
    * within the Hamming budget must agree on at least one whole chunk, so
    * candidates come from an equality join on (chunk index, chunk value).
    */
  def simhash(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.simhash(col("text")).as("sig"))

    val chunkCols = (0 until chunks).map(i =>
      shiftrightunsigned(col("sig"), i * bitsPer)
        .bitwiseAND(lit((1L << bitsPer) - 1)))
    val chunked = docs.select(
      col("doc_id"), col("sig"),
      posexplode(array(chunkCols: _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")

    val a = chunked.select(
      col("chunk"), col("chunk_val"),
      col("doc_id").as("a_id"), col("sig").as("a_sig"))
    val b = chunked.select(
      col("chunk").as("b_chunk"), col("chunk_val").as("b_val"),
      col("doc_id").as("b_id"), col("sig").as("b_sig"))

    a.join(b,
        col("chunk") === col("b_chunk") &&
        col("chunk_val") === col("b_val") &&
        col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", VectorFunctions.hamming(col("a_sig"), col("b_sig")))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Embedding-cosine near-dup pairs. The fixture tier compares all pairs
    * through a blocked self-join; the 100 TB path swaps the blocking key
    * for [[VectorFunctions.hyperplaneSketch]] buckets (see
    * [[Similarity.annLsh]]) — same verify step, candidate set shrunk by
    * the sketch. The default threshold is calibrated to the synthetic
    * fixture (max off-diagonal cosine ≈ 0.51; 0.4 keeps the top ~0.05% of
    * pairs); real embedding dedup uses ~0.95 on near-identical content.
    */
  def embeddingCosine(s: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("a_emb"), col("b_emb")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id")
  }
}
