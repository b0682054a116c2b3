package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.Similarity
import graft.sources.Tables

/** Dev tool: measures, on the actual fixtures, the sketch-parameter margins
  * that make the approximate operators' outputs equal their exact
  * counterparts (recall = 1.0) — the numbers behind the defaults pinned in
  * [[operators.Similarity]] / [[operators.Dedup]] and asserted by the
  * equivalence specs. Run: `runMain graft.Calibrate <sfDir>`.
  */
object Calibrate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"=== calibrating on $sfDir ===")

    // ── ANN: brute top-10 vs 48-bit hyperplane sketch Hamming ──────────
    val bits = 48
    val e = Tables.embeddings(spark, sfDir)
    val n = e.count()
    val sk = e.withColumn(
      "sketch", VectorFunctions.hyperplaneSketch(col("embedding"), bits, 64))
    val q0 = sk.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), col("sketch").as("q_sk"))
    val ranked = sk.filter(col("vec_id") =!= 0).crossJoin(broadcast(q0))
      .withColumn("cos", VectorFunctions.cosineSim(col("embedding"), col("q_emb")))
      .withColumn("ham", VectorFunctions.hamming(col("sketch"), col("q_sk")))
      .persist()
    val top = ranked.orderBy(col("cos").desc, col("vec_id")).limit(30)
      .select("vec_id", "cos", "ham").collect()
    println("ann top-30 (vec_id/cos/ham48): " + top.map(r =>
      f"${r.getLong(0)}/${r.getDouble(1)}%.4f/${r.getInt(2)}").mkString(" "))
    val needHam = top.take(10).map(_.getInt(2)).max
    println(s"q40: maxHamming needed for top-10 recall=1.0: $needHam")
    for (mh <- Seq(needHam, needHam + 2, needHam + 4))
      println(s"q40: candidates at maxHamming=$mh: " +
        s"${ranked.filter(col("ham") <= mh).count()} / $n")
    ranked.unpersist()

    // ── IVF: which cells hold the top-10; probe rank needed ────────────
    val ePart = e.repartition(8)
    val cents = Similarity.ivfCentroids(ePart, 16, 2)
    val qVec = e.filter(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    def cosTo(c: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < c.length) {
        dot += c(i).toDouble * qVec(i); nx += c(i).toDouble * c(i)
        ny += qVec(i).toDouble * qVec(i); i += 1
      }
      val d = math.sqrt(nx) * math.sqrt(ny); if (d == 0) 0 else dot / d
    }
    val probeOrder = cents.zipWithIndex.sortBy { case (c, i) => (-cosTo(c), i) }
      .map(_._2)
    val topIds = top.take(10).map(_.getLong(0))
    val cidOfTop = Similarity.withCentroidId(e, cents)
      .filter(col("vec_id").isin(topIds.map(java.lang.Long.valueOf).toIndexedSeq: _*))
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val needNprobe = topIds.map(id => probeOrder.indexOf(cidOfTop(id)) + 1).max
    println(s"q44: probe order=${probeOrder.mkString(",")} " +
      s"topCids=${topIds.map(cidOfTop).mkString(",")} needed nprobe=$needNprobe")

    // ── MinHash banding recall vs true shingle Jaccard ─────────────────
    val docs = Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        sort_array(array_distinct(TextFunctions.shingles(col("text"), 3))).as("sh"))
      .withColumn("sig", TextFunctions.minhashOfShingles(col("sh"), 64))
      .persist()
    val aa = docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val bb = docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val exact = aa.join(bb, col("a_id") < col("b_id"))
      .withColumn("ni", TextFunctions.sortedIntersectCount(col("a_sh"), col("b_sh")))
      .withColumn("j", col("ni").cast("double") /
        (size(col("a_sh")) + size(col("b_sh")) - col("ni")).cast("double"))
      .filter(col("j") >= 0.2)
      .select("a_id", "b_id", "j").collect()
    println("shingle-jaccard pairs >= 0.2: " + exact.sortBy(-_.getDouble(2)).map(r =>
      f"${r.getLong(0)}-${r.getLong(1)}:${r.getDouble(2)}%.3f").mkString(" "))
    val sigs = docs.select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def shareBand(a: Array[Long], b: Array[Long], bands: Int, rows: Int): Boolean =
      (0 until bands).exists(bi =>
        (0 until rows).forall(j => a(bi * rows + j) == b(bi * rows + j)))
    for ((bands, rows) <- Seq((16, 4), (32, 2), (64, 1)); tau <- Seq(0.5, 0.6, 0.7)) {
      val pairs = exact.filter(_.getDouble(2) >= tau)
      val missed = pairs.count(r =>
        !shareBand(sigs(r.getLong(0)), sigs(r.getLong(1)), bands, rows))
      println(s"minhash bands=$bands rows=$rows tau=$tau: " +
        s"exact=${pairs.length} missedByBanding=$missed")
    }
    val ids = sigs.keys.toArray.sorted
    for ((bands, rows) <- Seq((16, 4), (32, 2), (64, 1))) {
      var cand = 0L; var tot = 0L
      for (i <- ids.indices; jx <- i + 1 until ids.length) {
        tot += 1
        if (shareBand(sigs(ids(i)), sigs(ids(jx)), bands, rows)) cand += 1
      }
      println(s"minhash bands=$bands rows=$rows candidateRate=$cand/$tot")
    }

    // ── SimHash-over-shingles Hamming vs true shingle Jaccard ──────────
    // (token-level jaccard doesn't discriminate on this fixture: docs
    // share a small vocabulary, so distinct-token sets nearly coincide
    // across unrelated docs; shingle sets are bimodal.)
    val shSig = docs.withColumn(
      "hsig",
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.SimHash64(
          org.apache.spark.sql.GraftSqlBridge.expression(col("sh")))))
      .select("doc_id", "hsig").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dupPairs = exact.filter(_.getDouble(2) >= 0.5)
    val dupHams = dupPairs.map(r => java.lang.Long.bitCount(
      shSig(r.getLong(0)) ^ shSig(r.getLong(1))))
    println(s"simhash-shingle: dup pairs n=${dupPairs.length} " +
      s"hams=${dupHams.sorted.mkString(",")}")
    val sids = shSig.keys.toArray.sorted
    for (maxH <- Seq(3, 5, 7)) {
      val chunks = maxH + 1
      val bitsPer = 64 / chunks
      def chunkShare(a: Long, b: Long): Boolean =
        (0 until chunks).exists { i =>
          val m = (1L << bitsPer) - 1
          ((a >>> (i * bitsPer)) & m) == ((b >>> (i * bitsPer)) & m)
        }
      var cand = 0L; var tot = 0L
      for (i <- sids.indices; jx <- i + 1 until sids.length) {
        tot += 1
        if (chunkShare(shSig(sids(i)), shSig(sids(jx)))) cand += 1
      }
      println(s"simhash-shingle pigeonhole maxH=$maxH chunks=$chunks " +
        s"candidateRate=$cand/$tot")
    }

    // ── SimHash Hamming vs true token Jaccard ──────────────────────────
    val toks = Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        sort_array(array_distinct(TextFunctions.tokens(col("text")))).as("toks"),
        TextFunctions.simhash(col("text")).as("sig"))
      .persist()
    val ta = toks.select(col("doc_id").as("a_id"), col("toks").as("a_t"), col("sig").as("a_s"))
    val tb = toks.select(col("doc_id").as("b_id"), col("toks").as("b_t"), col("sig").as("b_s"))
    val tpairs = ta.join(tb, col("a_id") < col("b_id"))
      .withColumn("ni", TextFunctions.sortedIntersectCount(col("a_t"), col("b_t")))
      .withColumn("j", col("ni").cast("double") /
        (size(col("a_t")) + size(col("b_t")) - col("ni")).cast("double"))
      .withColumn("ham", VectorFunctions.hamming(col("a_s"), col("b_s")))
      .filter(col("j") >= 0.3)
      .select("a_id", "b_id", "j", "ham").collect()
    println("token-jaccard pairs >= 0.3 (j/ham): " + tpairs.sortBy(-_.getDouble(2))
      .map(r => f"${r.getDouble(2)}%.3f/${r.getInt(3)}").mkString(" "))
    for (tau <- Seq(0.5, 0.6, 0.7, 0.8)) {
      val p = tpairs.filter(_.getDouble(2) >= tau)
      println(s"simhash tau=$tau: n=${p.length} " +
        s"maxHam=${if (p.isEmpty) -1 else p.map(_.getInt(3)).max}")
    }
    val hsigs = toks.select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hids = hsigs.keys.toArray.sorted
    for (maxH <- Seq(3, 6, 8, 12)) {
      val chunks = maxH + 1
      val bitsPer = 64 / chunks
      def chunkShare(a: Long, b: Long): Boolean =
        (0 until chunks).exists { i =>
          val m = (1L << bitsPer) - 1
          ((a >>> (i * bitsPer)) & m) == ((b >>> (i * bitsPer)) & m)
        }
      var cand = 0L; var tot = 0L
      for (i <- hids.indices; jx <- i + 1 until hids.length) {
        tot += 1
        if (chunkShare(hsigs(hids(i)), hsigs(hids(jx)))) cand += 1
      }
      println(s"simhash pigeonhole maxH=$maxH chunks=$chunks candidateRate=$cand/$tot")
    }

    spark.stop()
  }
}
