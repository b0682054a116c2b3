package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline surface
  * (SURVEY §7.4): tokenization, quality scoring, n-gram shingling,
  * heuristic language ID, token-count estimation, fingerprints. All are
  * compositions of codegen'd built-ins (split / filter / transform /
  * regexp), so they distribute and pushdown like any Catalyst expression;
  * the only custom expressions are the fingerprint/sketch hashes in
  * [[graft.functions]] expressions.
  */
object TextFunctions {

  /** Whitespace tokenizer — the documents fixture is single-space-separated
    * word soup (FIXTURES.md).
    */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Mean token length, exactly: (chars − separators) / tokens as double
    * (integer inputs → deterministic division result).
    */
  def avgTokenLength(text: Column): Column =
    (length(text) - (tokenCount(text) - 1)).cast("double") /
      tokenCount(text).cast("double")

  /** Occurrences of any word from `words` among the tokens. */
  def wordOccurrences(text: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(set, t)))
  }

  // Tiny per-language stopword lists for the heuristic language-ID
  // (disjoint across languages so scores don't double-count).
  val StopwordsEn: Seq[String] = Seq("the", "of", "and", "to", "in")
  val StopwordsFr: Seq[String] = Seq("le", "la", "les", "des", "et")
  val StopwordsEs: Seq[String] = Seq("el", "los", "las", "una", "y")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ist")

  def stopwordCount(text: Column): Column =
    wordOccurrences(text, StopwordsEn ++ StopwordsFr ++ StopwordsEs ++ StopwordsDe)

  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text).cast("double")

  /** Heuristic stopword language ID: argmax of per-language stopword hits
    * with a fixed tie-break order (en > fr > es > de); "unknown" when no
    * stopword matches. Deterministic by construction.
    */
  def langIdGuess(text: Column): Column = {
    val en = wordOccurrences(text, StopwordsEn)
    val fr = wordOccurrences(text, StopwordsFr)
    val es = wordOccurrences(text, StopwordsEs)
    val de = wordOccurrences(text, StopwordsDe)
    when(en === 0 && fr === 0 && es === 0 && de === 0, lit("unknown"))
      .when(en >= fr && en >= es && en >= de, lit("en"))
      .when(fr >= es && fr >= de, lit("fr"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** BPE-ish token-count estimate: letter runs, single digits, and single
    * non-alphanumeric symbols each count as one token (regex heuristic over
    * the text; the container has no tokenizer libs — this is the public
    * approximation of "tokens ≈ words + digits + symbols").
    */
  def tokenEstimate(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), lit(0)))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0)))

  /** Composite quality score in [0,1]-ish: rewards mid-length docs and
    * stopword presence, penalizes very short docs — exact rational
    * arithmetic over int counts, then one double division each, so the
    * value is reproducible bit-for-bit across engines.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val lenScore = when(toks >= 20.0, 1.0).otherwise(toks / 20.0)
    val stopScore = when(stopwordRatio(text) > 0.1, 1.0)
      .otherwise(stopwordRatio(text) * 10.0)
    lenScore * 0.5 + stopScore * 0.5
  }

  /** Word k-gram shingles (k consecutive tokens joined by one space); docs
    * shorter than k tokens yield a single whole-text shingle.
    */
  def shingles(text: Column, k: Int): Column = {
    val t = tokens(text)
    when(size(t) >= k,
      transform(
        sequence(lit(0), size(t) - lit(k)),
        i => concat_ws(" ", slice(t, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** Intersection count of two sorted+distinct string arrays (fused merge
    * loop — see [[SortedIntersectCount]]).
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      SortedIntersectCount(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Exact content fingerprint (md5 hex) — cheap exact-dedup key. */
  def fingerprintMd5(text: Column): Column = md5(text)

  /** Rolling polynomial fingerprint (custom codegen'd expression). */
  def fingerprintRolling(text: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(text)))

  /** PassJoin candidate keys (segment hashes / probe-substring hashes)
    * for edit-distance blocking — see [[PassJoinKeys]].
    */
  def passJoinKeys(lang: Column, text: Column, tau: Int, probe: Boolean): Column =
    GraftSqlBridge.column(PassJoinKeys(
      GraftSqlBridge.expression(lang), GraftSqlBridge.expression(text), tau, probe))

  /** Exact Levenshtein distance when ≤ `tau`, else −1 — banded DP, ~10×
    * the built-in thresholded form on short documents ([[BandedLevenshtein]]).
    */
  def levenshteinWithin(a: Column, b: Column, tau: Int): Column =
    GraftSqlBridge.column(BandedLevenshtein(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b), tau))

  /** MinHash signature over word `k`-gram shingles. */
  def minhash(text: Column, k: Int, numHashes: Int): Column =
    minhashOfShingles(shingles(text, k), numHashes)

  /** MinHash signature over a precomputed shingle/token array column. */
  def minhashOfShingles(shingleArr: Column, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinHashSignature(GraftSqlBridge.expression(shingleArr), numHashes))

  /** 64-bit SimHash over tokens. */
  def simhash(text: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens(text))))

  /** 64-bit SimHash over a precomputed shingle/token array column.
    * Shingle-level SimHash discriminates where token-level does not: docs
    * drawn from a shared vocabulary have near-identical token SETS, but
    * k-gram shingle sets are near-disjoint unless the word ORDER matches.
    */
  def simhashOfShingles(shingleArr: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(shingleArr)))
}
