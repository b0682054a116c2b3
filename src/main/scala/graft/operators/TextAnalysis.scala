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
}
