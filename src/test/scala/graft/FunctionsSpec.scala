package graft

import org.apache.spark.sql.functions._

import graft.functions.{StableHash64, TextFunctions, VectorFunctions}

/** Custom-expression correctness: fused vector ops vs the built-in HOF
  * compositions, fingerprints vs reference implementations, sketch
  * determinism.
  */
class FunctionsSpec extends SparkTestBase {

  test("frequent-terms sketch: exact under capacity; heavy hitters survive over it") {
    import spark.implicits._
    import graft.functions.FrequentTerms.frequentTerms
    val data = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ (1 to 40).map(i => s"t$i")
    val terms = data.toDF("term").repartition(4)
    def sketch(capacity: Int): Map[String, Long] =
      terms.agg(frequentTerms(col("term"), capacity).as("sk"))
        .select(explode(col("sk"))).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // capacity 8 « 42 distinct: N=120 → max undercount N/(8+1) ≈ 13.3;
    // the two heavy hitters must survive with bounded-error estimates
    val mg = sketch(8)
    assert(mg.size <= 8)
    assert(mg.contains("a") && mg("a") <= 50 && mg("a") >= 50 - 14)
    assert(mg.contains("b") && mg("b") <= 30 && mg("b") >= 30 - 14)
    // capacity ≥ distinct: never a decrement, counts exact
    val exact = sketch(128)
    assert(exact("a") == 50L && exact("b") == 30L && exact.size == 42)
  }

  test("fused cosine == HOF cosine (codegen and eval agree with builtins)") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val pairs = a.crossJoin(b)
    val diff = pairs.select(
      abs(VectorFunctions.cosineSim(col("a_emb"), col("b_emb")) -
        VectorFunctions.cosineSimHof(col("a_emb"), col("b_emb"))).as("d"))
      .agg(max($"d")).as[Double].head()
    assert(diff < 1e-12, s"cosine mismatch: $diff")
  }

  test("fused dot == HOF dot exactly") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val diff = a.crossJoin(b).select(
      abs(VectorFunctions.dotProduct(col("a_emb"), col("b_emb")) -
        VectorFunctions.dotProductHof(col("a_emb"), col("b_emb"))).as("d"))
      .agg(max($"d")).as[Double].head()
    assert(diff == 0.0)
  }

  test("rolling hash matches the reference loop, via codegen path") {
    import spark.implicits._
    val texts = Seq("hello world", "", "a", "graft engine")
    def ref(s: String): Long = {
      var h = 0L
      for (b <- s.getBytes("UTF-8")) h = h * 31L + (b & 0xffL)
      h
    }
    val got = texts.toDF("t")
      .select(TextFunctions.fingerprintRolling($"t").as("h"))
      .as[Long].collect().toSeq
    assert(got == texts.map(ref))
  }

  test("stable hash is deterministic and seed-sensitive") {
    val b = "shingle text".getBytes("UTF-8")
    assert(StableHash64.hashBytes(b, 0L) == StableHash64.hashBytes(b.clone(), 0L))
    assert(StableHash64.hashBytes(b, 0L) != StableHash64.hashBytes(b, 1L))
  }

  test("minhash signature: identical texts agree, sensitivity to change, length correct") {
    import spark.implicits._
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog again and again"),
      ("b", "the quick brown fox jumps over the lazy dog again and again"),
      ("c", "completely different words entirely unrelated content here now then")
    ).toDF("id", "t")
    val sigs = df.select($"id", TextFunctions.minhash($"t", 3, 64).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    assert(sigs("a") == sigs("b"))
    assert(sigs("a").length == 64)
    val agree = sigs("a").zip(sigs("c")).count { case (x, y) => x == y }
    assert(agree < 8, s"unrelated texts agree on $agree/64 hashes")
  }

  test("simhash: identical → distance 0; unrelated → large distance") {
    import spark.implicits._
    val df = Seq(
      ("a", "spark query engine with columnar storage and vectorized reads"),
      ("b", "spark query engine with columnar storage and vectorized reads"),
      ("c", "pineapple umbrella dances quietly beneath seventeen turquoise clouds")
    ).toDF("id", "t")
    val sigs = df.select($"id", TextFunctions.simhash($"t").as("s"))
      .as[(String, Long)].collect().toMap
    assert(java.lang.Long.bitCount(sigs("a") ^ sigs("b")) == 0)
    assert(java.lang.Long.bitCount(sigs("a") ^ sigs("c")) > 10)
  }

  test("sorted merge intersect == array_intersect size on real docs") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(100)
      .select($"doc_id",
        sort_array(array_distinct(TextFunctions.tokens($"text"))).as("toks"))
    val a = docs.select($"doc_id".as("a_id"), $"toks".as("a_toks"))
    val b = docs.select($"doc_id".as("b_id"), $"toks".as("b_toks"))
    val mismatches = a.crossJoin(b)
      .select(
        TextFunctions.sortedIntersectCount($"a_toks", $"b_toks").as("fast"),
        size(array_intersect($"a_toks", $"b_toks")).as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(mismatches == 0)
  }

  test("sorted merge intersect, long-element path == array_intersect size (hashed tokens)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(100)
      .select($"doc_id",
        sort_array(array_distinct(
          transform(TextFunctions.tokens($"text"), t => xxhash64(t)))).as("toks"))
    val a = docs.select($"doc_id".as("a_id"), $"toks".as("a_toks"))
    val b = docs.select($"doc_id".as("b_id"), $"toks".as("b_toks"))
    val mismatches = a.crossJoin(b)
      .select(
        TextFunctions.sortedIntersectCount($"a_toks", $"b_toks").as("fast"),
        size(array_intersect($"a_toks", $"b_toks")).as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(mismatches == 0)
  }

  test("banded levenshtein == built-in levenshtein wherever within τ, else −1") {
    import spark.implicits._
    // Random-ish pairs spanning: equal, within-band, exactly τ, τ+1,
    // hugely different lengths (short-circuit), multibyte code points.
    val pairs = Seq(
      ("kitten", "sitting"), ("abc", "abc"), ("", ""), ("", "abcd"),
      ("abcdefghij", "abcdefghij".reverse), ("résumé naïve", "resume naive"),
      ("aaaaaaaaaa", "aaaabaaaaa"), ("x" * 40, "x" * 40 + "y" * 9),
      ("the quick brown fox", "the quick brown cat"),
      ("αβγδε ζηθικ", "αβγδε ζηθικλ")) ++
      (1 to 30).map(i => (s"document number $i with words", s"document number ${i * 7} with wordz"))
    val tau = 8
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      levenshtein($"a", $"b").as("full"),
      TextFunctions.levenshteinWithin($"a", $"b", tau).as("banded"))
      .as[(Int, Int)].collect()
    rows.foreach { case (full, banded) =>
      if (full <= tau) assert(banded == full, s"within τ: $full vs $banded")
      else assert(banded == -1, s"beyond τ must be -1, got $banded (full $full)")
    }
  }

  test("l2 norm matches sqrt of fused self-dot") {
    import spark.implicits._
    val diff = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
      .select(abs(
        VectorFunctions.l2Norm($"embedding") -
          sqrt(VectorFunctions.dotProduct($"embedding", $"embedding"))).as("d"))
      .agg(max($"d")).as[Double].head()
    assert(diff < 1e-12)
  }

  test("hamming expression matches Long.bitCount") {
    import spark.implicits._
    val got = Seq((0xffL, 0x0fL)).toDF("a", "b")
      .select(VectorFunctions.hamming($"a", $"b")).as[Int].head()
    assert(got == 4)
  }

  test("hyperplane sketch is deterministic across evaluations") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(20)
    val s1 = e.select($"vec_id", VectorFunctions.hyperplaneSketch($"embedding", 16, 64).as("s"))
      .as[(Long, Long)].collect().toMap
    val s2 = e.select($"vec_id", VectorFunctions.hyperplaneSketch($"embedding", 16, 64).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(s1 == s2)
  }

  test("shingles: k-grams for long docs, whole text for short ones") {
    import spark.implicits._
    val got = Seq("a b c d", "x y").toDF("t")
      .select(TextFunctions.shingles($"t", 3).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got.head == Seq("a b c", "b c d"))
    assert(got(1) == Seq("x y"))
  }

  test("langid guess is one of the expected labels") {
    import spark.implicits._
    val got = Seq("the cat of the house", "le chat et la maison", "xyzzy qwerty")
      .toDF("text")
      .select(TextFunctions.langIdGuess($"text")).as[String].collect().toSeq
    assert(got == Seq("en", "fr", "unknown"))
  }
}
