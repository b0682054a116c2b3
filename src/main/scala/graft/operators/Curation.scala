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
}
