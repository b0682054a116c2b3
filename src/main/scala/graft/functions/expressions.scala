package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot paths the built-in function
  * library can't express efficiently (SURVEY §7.5 "LLM ops v2"): vector
  * similarity over `ArrayType(FloatType)` embeddings, MinHash signatures,
  * SimHash, and rolling-hash fingerprints. All are deterministic, null-safe
  * (`nullIntolerant`), and — where the loop is simple — implement
  * `doGenCode` so they stay inside whole-stage codegen.
  */

/** Cosine similarity of two float-array embeddings, in one fused pass
  * (dot, |x|², |y|² in a single loop over primitive floats — no boxing, no
  * intermediate arrays, unlike a zip_with/aggregate composition).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
        |int $n = Math.min($x.numElements(), $y.numElements());
        |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xi = (double) $x.getFloat($i);
        |  double $yi = (double) $y.getFloat($i);
        |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        |}
        |double $denom = Math.sqrt($nx) * Math.sqrt($ny);
        |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two float-array embeddings (fused primitive loop). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
        |int $n = Math.min($x.numElements(), $y.numElements());
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
        |}
        |${ev.value} = $dot;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit FNV-1a over a UTF8 string — the stable token/shingle hash shared
  * by MinHash, SimHash and the rolling fingerprint. Public algorithm;
  * deterministic across JVMs and partitionings.
  */
object StableHash64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def hashBytes(bytes: Array[Byte], seed: Long): Long = {
    var h = Offset ^ seed
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= Prime; i += 1 }
    h
  }

  /** FNV-1a over `bytes[from, until)` — slice hashing without the slice
    * allocation (the PassJoin probe hashes ~10² substrings per row).
    */
  def hashRange(bytes: Array[Byte], from: Int, until: Int, seed: Long): Long = {
    var h = Offset ^ seed
    var i = from
    while (i < until) { h ^= (bytes(i) & 0xffL); h *= Prime; i += 1 }
    h
  }
}

/** Candidate keys for PassJoin edit-distance blocking (Li/Deng/Feng,
  * VLDB'11), one array per row. With k = τ+1 canonical segments:
  *
  *   - index side (`probe = false`): k keys, one per segment — segment i
  *     of an n-char text starts at i·⌊n/k⌋ + min(i, n mod k) and spans
  *     ⌊n/k⌋ (+1 for the first n mod k segments) chars;
  *   - probe side (`probe = true`): for each segment index i of a
  *     hypothetical partner of length ℓb ∈ [n−τ, n+τ], every substring
  *     the PassJoin theorem could match: lengths in
  *     [max(1, ⌊(n−τ)/k⌋), ⌊(n+τ)/k⌋+1], start positions within ±τ of
  *     the canonical start's range over ℓb (a strict superset of the
  *     tight windows — over-wide windows only add verify work, never
  *     miss a true pair).
  *
  * A key is FNV-1a over the substring's UTF-8 bytes seeded by
  * (lang hash, segment index), so key equality ⟺ same language, same
  * segment slot, same text (modulo 64-bit collisions, which only ADD
  * candidates — the Levenshtein verify removes them). Positions are CODE
  * POINTS (matching `levenshtein`/`n_chars` semantics); a one-pass
  * offset table maps char→byte so non-ASCII rows hash byte ranges
  * in place, no per-substring allocation. One compiled call per row
  * (CodegenFallback): the previous transform/filter/flatten composition
  * evaluated ~10³ interpreted lambdas per row — measured 2.5× slower
  * end-to-end on the sf1 smoke.
  */
case class PassJoinKeys(
    left: Expression, right: Expression, tau: Int, probe: Boolean)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "passjoin_keys"

  private val k = tau + 1

  override protected def nullSafeEval(langAny: Any, textAny: Any): Any = {
    val langSeed = StableHash64.hashBytes(
      langAny.asInstanceOf[UTF8String].getBytes, 0x9a55L)
    val text = textAny.asInstanceOf[UTF8String]
    val bytes = text.getBytes
    val n = text.numChars()
    // char index -> byte offset (offsets(n) = bytes.length); single pass.
    val offsets = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (ci < n) {
      offsets(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offsets(n) = bytes.length
    def key(i: Int, from: Int, len: Int): Long =
      StableHash64.hashRange(
        bytes, offsets(from), offsets(from + len), langSeed ^ (i.toLong << 1))
    val out = new scala.collection.mutable.ArrayBuffer[Long](if (probe) 512 else k)
    if (!probe) {
      if (n >= k) {
        val base = n / k
        val rem = n % k
        var i = 0
        while (i < k) {
          val start = i * base + math.min(i, rem)
          val len = base + (if (i < rem) 1 else 0)
          out += key(i, start, len)
          i += 1
        }
      }
    } else {
      val blo = Math.floorDiv(n - tau, k)
      val bhi = Math.floorDiv(n + tau, k)
      val lLo = math.max(1, blo)
      var i = 0
      while (i < k) {
        var l = lLo
        while (l <= bhi + 1) {
          var p = math.max(0, i * blo - tau)
          val pHi = math.min(n - l, i * bhi + i + tau)
          while (p <= pHi) {
            out += key(i, p, l)
            p += 1
          }
          l += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature: for an array of token/shingle strings, returns
  * `numHashes` minima of independent hash functions h_i(x) = a_i*H(x)+b_i
  * (multiply-shift family over one stable base hash per shingle) — one pass
  * over the shingles per row, versus `numHashes` array traversals for a
  * transform/array_min composition. Backs LSH near-dup dedup (SURVEY §7.4).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  // Deterministic odd multipliers / offsets derived from a fixed seed via
  // splitmix64 (public PRNG finalizer; Steele et al., "Fast Splittable
  // Pseudorandom Number Generators", OOPSLA'14).
  @transient private lazy val coeffs: Array[(Long, Long)] = {
    var s = 0x9e3779b97f4a7c15L
    def next(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.fill(numHashes)((next() | 1L, next()))
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = StableHash64.hashBytes(arr.getUTF8String(i).getBytes, 0L)
        var j = 0
        while (j < numHashes) {
          val (a, b) = coeffs(j)
          val h = a * base + b
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over an array of token strings: each token's stable hash
  * votes ±1 per bit position; the sign of each bit's tally forms the
  * fingerprint (Charikar, "Similarity Estimation Techniques from Rounding
  * Algorithms", STOC'02). Near-duplicates differ in few bits.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = StableHash64.hashBytes(arr.getUTF8String(i).getBytes, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling hash over a string's UTF-8 bytes (h = h*31 + b),
  * the classic Rabin–Karp document fingerprint. Codegen'd: the loop lives
  * inside whole-stage codegen.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
        |byte[] $bytes = $c.getBytes();
        |long $h = 0L;
        |for (int $i = 0; $i < $bytes.length; $i++) {
        |  $h = $h * 31L + ($bytes[$i] & 0xffL);
        |}
        |${ev.value} = $h;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Thresholded Levenshtein distance over code points, banded: computes
  * only the |i−j| ≤ τ diagonal band (any alignment with ≤ τ edits stays
  * inside it), two int rows, O(len·(2τ+1)) — and returns −1 as soon as
  * the band proves the distance exceeds τ. The built-in
  * `levenshtein(l, r, threshold)` measured ~64 µs per ~300-char pair on
  * the PassJoin verify (16 s for 252k pairs at sf1); this loop is ~6 µs —
  * the difference between the verify dominating the dedup and
  * disappearing into it. Exact by construction for every returned
  * distance, which is what the DuckDB oracle checks.
  */
case class BandedLevenshtein(left: Expression, right: Expression, tau: Int)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "banded_levenshtein"

  override protected def nullSafeEval(lAny: Any, rAny: Any): Any = {
    val s = lAny.asInstanceOf[UTF8String].toString
    val t = rAny.asInstanceOf[UTF8String].toString
    val a = s.codePoints().toArray
    val b = t.codePoints().toArray
    val n = a.length
    val m = b.length
    if (math.abs(n - m) > tau) return -1
    val inf = tau + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= tau) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - tau)
      val hi = math.min(m, i + tau)
      if (lo == 1) cur(0) = math.min(i, inf) else cur(lo - 1) = inf
      if (hi < m) cur(hi + 1) = inf
      var best = inf
      j = lo
      while (j <= hi) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        var d = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < d) d = del
        val ins = cur(j - 1) + 1
        if (ins < d) d = ins
        if (d > inf) d = inf
        cur(j) = d
        if (d < best) best = d
        j += 1
      }
      if (best >= inf) return -1 // whole band over budget: early exit
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(m) <= tau) prev(m) else -1
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two pre-sorted, pre-deduplicated string
  * arrays via a linear merge — no per-row hash set, no boxing, codegen'd.
  * The hot inner loop of set-similarity (Jaccard) joins: at 500k+
  * candidate pairs per partition this replaces `size(array_intersect(..))`
  * (which allocates an OpenHashSet per pair) with two pointers over
  * binary-sorted UTF8 strings.
  *
  * Inputs MUST be sorted ascending (`sort_array`) and distinct
  * (`array_distinct`) — the caller owns that invariant.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  // The element compare dispatches on the LEFT child's type, so mismatched
  // sides (e.g. array<bigint> vs array<string> through the SQL surface)
  // must be rejected at analysis — the primitive getter would otherwise
  // read a string-backed array's offset words as values, silently.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if l == r && (l == StringType || l == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two arrays of the same element type " +
            s"(string or bigint), got ${left.dataType.catalogString} and " +
            s"${right.dataType.catalogString}")
    }

  // Merge over sorted long arrays (hashed tokens) compares two primitives;
  // over sorted string arrays it's a byte-wise UTF8String comparison. The
  // long path is what the dedup hot loops use — token arrays are hashed
  // before the candidate join precisely so this compare is cheap.
  private lazy val isLongElems: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var n = 0
    if (isLongElems) {
      while (i < nx && j < ny) {
        val c = java.lang.Long.compare(x.getLong(i), y.getLong(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val cmp =
        if (isLongElems) s"java.lang.Long.compare($x.getLong($i), $y.getLong($j))"
        else s"$x.getUTF8String($i).compareTo($y.getUTF8String($j))"
      s"""
        |int $nx = $x.numElements();
        |int $ny = $y.numElements();
        |int $i = 0; int $j = 0; int $n = 0;
        |while ($i < $nx && $j < $ny) {
        |  int $c = $cmp;
        |  if ($c == 0) { $n++; $i++; $j++; }
        |  else if ($c < 0) { $i++; } else { $j++; }
        |}
        |${ev.value} = $n;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Hamming distance between two 64-bit fingerprints (for SimHash dedup). */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (x, y) => s"${ev.value} = java.lang.Long.bitCount($x ^ $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The `k` nearest centroid ids of an embedding, ranked by
  * (cosine distance asc, centroid id asc) — the IVF assign/probe kernel.
  *
  * Why an expression and not a composition: the declarative shape —
  * `least(struct(dist_0, 0), …, struct(dist_63, 63))` for assignment,
  * `array_sort(array(struct…))` for probe lists — unrolls one fused
  * cosine PER CENTROID into a single generated method. At nlist = 64 ×
  * dim = 64 that Project crossed Janino's 64 KB method limit even with
  * each centroid as one constant reference (`typedlit`, round 8), so the
  * whole stage fell back to interpreted mode (observed: 3 fires per sf1
  * smoke, `references[511]`). Here the centroid matrix is ONE reference
  * object and the generated code is a single constant-size call into
  * [[select]] — a JIT-compiled double loop over primitive floats, inside
  * whole-stage codegen regardless of nlist.
  *
  * Semantics EXACTLY match the composed form it replaces: distance =
  * `1.0 - cosine` with [[CosineSimilarity]]'s accumulation order (index
  * ascending, doubles, `sqrt(nx)*sqrt(ny)` denominator, 0-denominator →
  * similarity 0.0 → distance 1.0), ties broken by smaller centroid id
  * (struct ordering's second field). Null embedding → null (the composed
  * form's null-field struct ordering was never exercised — embeddings are
  * non-null by fixture contract; `nullIntolerant` makes the edge explicit).
  */
case class NearestCentroids(
    child: Expression,
    centroids: Array[Array[Float]],
    k: Int)
  extends UnaryExpression {

  require(k > 0, "k must be positive")
  require(centroids.nonEmpty, "centroids must be non-empty")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroids"

  /** Bounded insertion-select of the k smallest (dist, cid) pairs; public
    * because generated code calls it through a reference object.
    */
  def select(a: Any): ArrayData = {
    val x = a.asInstanceOf[ArrayData]
    val kk = math.min(k, centroids.length)
    val bestD = new Array[Double](kk)
    val bestC = new Array[Int](kk)
    var size = 0
    var ci = 0
    while (ci < centroids.length) {
      val c = centroids(ci)
      val n = math.min(x.numElements(), c.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = c(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      val denom = math.sqrt(nx) * math.sqrt(ny)
      val dist = 1.0 - (if (denom == 0.0) 0.0 else dot / denom)
      // Insert position: strictly-smaller distances rank first; equal
      // distances keep the earlier (smaller) centroid id — ci ascends, so
      // "first index with bestD > dist" reproduces (dist asc, cid asc).
      if (size < kk || dist < bestD(kk - 1)) {
        var pos = if (size < kk) size else kk - 1
        while (pos > 0 && bestD(pos - 1) > dist) {
          if (pos < kk) { bestD(pos) = bestD(pos - 1); bestC(pos) = bestC(pos - 1) }
          pos -= 1
        }
        bestD(pos) = dist; bestC(pos) = ci
        if (size < kk) size += 1
      }
      ci += 1
    }
    val out = new Array[Any](size)
    var j = 0
    while (j < size) { out(j) = bestC(j); j += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any = select(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj(
        "nearestCentroids", this, classOf[NearestCentroids].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.select($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit-max sign sketch for random-hyperplane LSH: bit b = 1 iff
  * `v · plane_b > 0.0` (Charikar STOC'02), all planes in one loop.
  *
  * Same Janino story as [[NearestCentroids]]: the composed form — one
  * `CASE WHEN dot_product(v, plane_b) > 0 THEN 1<<b` per bit, OR-reduced —
  * unrolls bits × dim work into a single generated method and crossed the
  * 64 KB limit at 64 × 64 even with `typedlit` plane constants (the write-
  * time index Project that kept falling back to interpreted mode in the
  * sf1 smoke). The plane matrix rides as one reference object; generated
  * code is a constant-size call. Dot accumulation is index-ascending
  * doubles — [[DotProduct]]'s exact arithmetic — so sketches are
  * bit-identical to the composed form. Null embedding → null (composed
  * form gave 0L — a degenerate all-bits-zero sketch; embeddings are
  * non-null by fixture contract, and an explicit null beats a sketch that
  * silently buckets all null rows together).
  */
case class HyperplaneSketch(child: Expression, planes: Array[Array[Float]])
  extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64, "need 1..64 planes")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sketch"

  /** Public because generated code calls it through a reference object. */
  def sketch(a: Any): Long = {
    val x = a.asInstanceOf[ArrayData]
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(x.numElements(), p.length)
      var dot = 0.0; var i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * p(i).toDouble; i += 1 }
      if (dot > 0.0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def nullSafeEval(a: Any): Any = sketch(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj(
        "hyperplaneSketch", this, classOf[HyperplaneSketch].getName)
      s"${ev.value} = $ref.sketch($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Packed product-quantization code of an embedding: per subspace mi the
  * argmin-centroid byte (L2 via the ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖² identity
  * on the normalized subvector), OR-shifted into one long — the PQ
  * write-time kernel.
  *
  * Third member of the Janino family ([[NearestCentroids]],
  * [[HyperplaneSketch]]): the composed form unrolled m × ksub fused dot
  * products into the write-time Project and pushed it past the 64 KB
  * method limit. Arithmetic is replicated operation-for-operation:
  * rawNorm = sqrt(dot(x,x)) (index-ascending doubles), norm = rawNorm if
  * > 0 else 1 (the zero-vector branch), dist = cNormSqHalf − dot/norm
  * with cNormSqHalf precomputed as `c.map(x => x²).sum / 2` exactly as
  * the plan-time literal was, ties → smaller code. Null embedding → null.
  */
case class PqCode(child: Expression, codebooks: Array[Array[Array[Float]]])
  extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.length <= 8, "need 1..8 subspaces")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_code"

  // Same Scala expression the composed form evaluated at plan time — the
  // summation order (left fold over the mapped array) must not change.
  @transient private lazy val cNormSqHalf: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x.toDouble * x).sum / 2.0))

  /** Public because generated code calls it through a reference object. */
  def code(a: Any): Long = {
    val x = a.asInstanceOf[ArrayData]
    val xn = x.numElements()
    var dotXX = 0.0; var i = 0
    while (i < xn) { val v = x.getFloat(i).toDouble; dotXX += v * v; i += 1 }
    val rawNorm = math.sqrt(dotXX)
    val norm = if (rawNorm > 0.0) rawNorm else 1.0
    var sig = 0L
    var mi = 0
    while (mi < codebooks.length) {
      val cents = codebooks(mi)
      val d = cents(0).length
      val off = mi * d
      val subLen = math.max(0, math.min(d, xn - off))
      var bestD = Double.MaxValue; var bestC = 0; var first = true
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var dot = 0.0; var j = 0
        while (j < subLen) { dot += x.getFloat(off + j).toDouble * cent(j).toDouble; j += 1 }
        val dist = cNormSqHalf(mi)(c) - dot / norm
        if (first || dist < bestD) { bestD = dist; bestC = c; first = false }
        c += 1
      }
      sig |= bestC.toLong << (8 * mi)
      mi += 1
    }
    sig
  }

  override protected def nullSafeEval(a: Any): Any = code(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val ref = ctx.addReferenceObj("pqCode", this, classOf[PqCode].getName)
      s"${ev.value} = $ref.code($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
