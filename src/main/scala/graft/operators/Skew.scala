package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew mitigation for joins (SURVEY §7 / builder brief: "salting for
  * skew"). A hot key concentrates its rows in one shuffle partition; the
  * salted join spreads the big side's rows over `saltBuckets` synthetic
  * sub-keys and replicates the small side once per bucket, turning one
  * straggler task into `saltBuckets` even ones. AQE's skew-join split
  * handles moderate skew at runtime; explicit salting is the lever when a
  * single key exceeds what one executor can hold at all.
  */
object Skew {

  private val SaltCol = "_graft_salt"

  /** Equi-join `big ⋈ small` on `keys`, salted: `big` rows get a content-
    * derived salt in [0, saltBuckets); `small` is replicated once per salt
    * value. Result is row-identical to the unsalted join.
    *
    * The salt hashes the row's hashable NON-KEY columns, NOT a row-id: a
    * `monotonically_increasing_id`-based salt depends on partition layout
    * and task scheduling, so it re-salts differently on stage retry and its
    * non-determinism fences off plan-cache reuse. A content hash is
    * deterministic, survives retries, and spreads a hot key just as evenly
    * whenever any non-key column varies across the key's rows (the case
    * that makes a key hot in the first place). Key columns are excluded
    * from the salt source — a hot key's rows all share the key bytes, so a
    * key-only hash would land every one of them in the SAME bucket while
    * still paying `saltBuckets`× small-side replication (the degenerate
    * case where salting silently does nothing). When `big` was projected
    * down to just the join keys and no hashable non-key column exists, the
    * salt falls back to a positional spread: join output is identical for
    * ANY salt assignment (every small row is replicated under every salt
    * value), so positional placement only costs retry-stable task layout —
    * a fair trade against a no-op mitigation. Map-typed columns are
    * excluded (Spark's `hash` rejects MapType); rows that are
    * byte-identical across every hashable non-key column share a bucket —
    * exact duplicate fact rows belong to the dedup pass, not the salt.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val keySet = keys.toSet
    val saltSrc = big.schema.fields
      .filter(f => !keySet.contains(f.name) && hashable(f.dataType))
      .map(f => col(f.name))
    val saltExpr =
      if (saltSrc.nonEmpty)
        pmod(hash(saltSrc.toIndexedSeq: _*), lit(saltBuckets)).cast("long")
      else // keys-only projection: content can't spread a hot key — use position
        pmod(monotonically_increasing_id(), lit(saltBuckets.toLong))
    val saltedBig = big.withColumn(SaltCol, saltExpr)
    val replicatedSmall = small.withColumn(
      SaltCol,
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    val cond: Column = (keys :+ SaltCol)
      .map(k => saltedBig(k) === replicatedSmall(k))
      .reduce(_ && _)
    val joined = saltedBig.join(replicatedSmall, cond, joinType)
      .drop(replicatedSmall(SaltCol))
      .drop(saltedBig(SaltCol))
    keys.foldLeft(joined)((d, k) => d.drop(replicatedSmall(k)))
  }

  /** Per-supplier revenue through [[saltedJoin]] — the fact side spread
    * over 8 salt buckets before meeting the (replicated) supplier dim, then
    * the exact-decimal aggregate. Row-identical to the plain join (the
    * DuckDB oracle is the unsalted SQL); the salt only changes which
    * reducer each fact row lands on, which is the point: a hot supplier
    * key stops being a straggler task.
    */
  def saltedRevenue(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .select(
        col("l_suppkey").as("suppkey"),
        col("l_extendedprice"), col("l_discount"))
    val small = Tables.supplier(s, dir)
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    saltedJoin(big, small, Seq("suppkey"), saltBuckets = 8)
      .groupBy(col("suppkey"), col("s_name"))
      .agg(
        Exact.dsumRaw(
          Exact.discounted(col("l_extendedprice"), col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }
}
