package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Lexical relevance ranking over the documents table — the retrieval leg
  * of a training-data pipeline (query-document scoring for data curation /
  * nearest-text lookup beside the embedding ANN path).
  *
  * Scoring is BM25-shaped (Robertson et al., TREC-3): per query term,
  * idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)). The idf factor is the
  * RAW odds form (N − df + 0.5)/(df + 0.5) — BM25's idf without the final
  * log. The ranking it induces is identical (log is monotonic) and every
  * operation stays rational arithmetic over corpus integers, so the score
  * doubles are bit-identical across engines and partitionings — the same
  * cross-engine-exactness rule as [[Exact]]; `ln` is the one piece libms
  * may round differently, so it stays out of the oracle-checked surface.
  *
  * Scale shape: one aggregate pass collects corpus stats (N, Σdl, per-term
  * document frequencies — scalars, never rows, reach the driver), then one
  * stateless scoring scan with the per-term tf counts fused into a single
  * projection; top-k via TakeOrderedAndProject (per-partition heads +
  * driver merge, no global sort). Terms are literals in the plan, so the
  * whole score is one codegen'd expression.
  */
object Search {

  val K1 = 1.2
  val B = 0.75

  def bm25(
      s: SparkSession,
      dir: String,
      terms: Seq[String] = Seq("the", "of", "and"),
      k: Int = 20): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))

    // Corpus statistics: one distributed aggregate, scalar collect.
    val statAggs =
      count(lit(1)) +: sum(col("dl")).cast("long") +:
        terms.map(t => sum(array_contains(col("toks"), t).cast("long")))
    val stats = docs.agg(statAggs.head, statAggs.tail: _*).collect().head
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n

    val score = terms.zipWithIndex.map { case (t, i) =>
      val dfT = stats.getLong(2 + i)
      val idf = (n - dfT + 0.5) / (dfT + 0.5)
      val tf = size(filter(col("toks"), x => x === lit(t))).cast("double")
      lit(idf) * (tf * lit(K1 + 1)) /
        (tf + lit(K1) * (lit(1 - B) + lit(B) * (col("dl").cast("double") / lit(avgdl))))
    }.reduce(_ + _)

    docs
      .withColumn("score", score)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select("doc_id", "score")
  }

  /** Inverted index (term → postings): per term, the document frequency
    * and the first `maxPostings` doc ids ascending, serialized as a
    * comma-joined string — the batch-built retrieval index beside [[bm25]]
    * (which scores by scanning; this materializes the term→docs map a
    * lookup service would serve). One explode + one groupBy(term); the
    * capped postings run through the bounded-heap aggregate (score =
    * −doc_id ⇒ the `maxPostings` SMALLEST ids, in ascending rank order),
    * so map-side partials carry at most `maxPostings` entries per (term,
    * partition) — a stop-word term never materializes its full id list
    * anywhere, which at corpus scale would be a multi-GB aggregation
    * buffer. `n_docs` is the separate count aggregate; a real index
    * serving FULL postings shards them — same plan keyed by
    * (term, doc_id div shardSize).
    */
  def invertedIndex(
      s: SparkSession, dir: String, maxPostings: Int = 20): DataFrame = {
    import graft.functions.TopKByScore.topKByScore
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col("text")))).as("term"))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("n_docs"),
        topKByScore((-col("doc_id")).cast("double"), col("doc_id"), maxPostings)
          .as("ids"))
      .select(
        col("term"), col("n_docs"),
        array_join(transform(col("ids"), _.cast("string")), ",").as("postings"))
  }
}
