package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled single-pass expressions for the MinHash pipeline. The
  * declarative formulation (transform ∘ array_distinct ∘ shingles with
  * nested lambdas) evaluates in Catalyst's interpreted HOF path —
  * ~1.7 ms/row on 20-token docs — which is the difference between a
  * scan-speed dedup pass and a 5× slowdown at 100 TB. These evaluate
  * in one compiled loop each (CodegenFallback: the eval itself is
  * compiled Scala; no per-element closure dispatch).
  */

/** Distinct word n-gram shingle hashes of a string, as array<long>.
  * Token hashes are 64-bit (two murmur3 seeds); shingle hash mixes
  * consecutive token hashes with multiply-rotate — deterministic
  * across JVMs, runs, and partitionings.
  */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = s.split("\\s+")
    // 64-bit token hash from two murmur3 passes with different seeds
    val th = new Array[Long](toks.length)
    var m = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        val h1 = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c)
        val h2 = scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b)
        th(m) = (h1.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
        m += 1
      }
      i += 1
    }
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    val count = math.max(1, m - n + 1)
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var k = 0
    var start = 0
    while (start < count) {
      var h = 0x27d4eb2f165667c5L
      var j = 0
      val lim = math.min(n, m - start)
      while (j < lim) {
        h = java.lang.Long.rotateLeft(h ^ th(start + j), 27) * 0x9E3779B97F4A7C15L
        j += 1
      }
      if (seen.add(h)) { out(k) = h; k += 1 }
      start += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** MinHash signature from an array<long> of element hashes:
  * sig[i] = min over elements of (A_i * h) ^ B_i, for `numHashes`
  * deterministic splitmix64-derived (A_i odd, B_i) constants.
  * One compiled O(numHashes × |elements|) loop per row.
  */
case class MinHashSignature64(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val constA: Array[Long] =
    Array.tabulate(numHashes)(i => 0x9E3779B97F4A7C15L * (2L * i + 1) | 1L)
  @transient private lazy val constB: Array[Long] =
    Array.tabulate(numHashes)(i => 0xBF58476D1CE4E5B9L * (i + 1))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<long>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = constA(i); val b = constB(i)
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (hs.getLong(j) * a) ^ b
        if (v < best) best = v
        j += 1
      }
      sig(i) = best
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature64 =
    copy(child = newChild)
}

/** Indexes of all matching filters for one line, in one compiled pass —
  * the large-registry form of the fan-out predicate array. Patterns are
  * compiled once per executor via the [[graft.operators.FilterFanout]]
  * fast-path analysis (word → contains, (?i)word → lower-contains,
  * else regex find). Returns array<int> of matching filter ordinals.
  */
case class MultiRegexMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expects string, got ${child.dataType}")

  @transient private lazy val matchers =
    patterns.map(graft.operators.FilterFanout.compileMatcher).toArray
  @transient private lazy val needsLower = matchers.exists(_.needsLower)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // lower-case ONCE per row, not once per case-insensitive matcher
    val lower = if (needsLower) s.toLowerCase(java.util.Locale.ROOT) else null
    val hits = new Array[Int](matchers.length)
    var k = 0
    var i = 0
    while (i < matchers.length) {
      if (matchers(i).matches(s, lower)) { hits(k) = i; k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hits, k))
  }

  override protected def withNewChildInternal(newChild: Expression): MultiRegexMatch =
    copy(child = newChild)
}

/** 60-bit SimHash over the token multiset with MD5 token hashes (the
  * first 15 hex chars of `md5(token)` as a 60-bit integer) — same
  * semantics as [[SimHash64]] but built ENTIRELY from operations every
  * SQL engine shares (md5, integer shifts, signed sums), so the whole
  * signature is reproducible in DuckDB and the oracle can hash-match
  * the fingerprint itself. 60 bits (not 64) keeps the value and its
  * bit tests inside a signed BIGINT in engines without unsigned types.
  * One compiled pass per row, like [[SimHash64]].
  */
case class SimHashMd5(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expects string, got ${child.dataType}")

  private val Bits = 60

  /** NULL text hashes like empty text (signature 0): the dedup
    * operators and their SQL oracles share the "no content = empty
    * content" convention (documents LEFT JOIN sig + coalesce 0), so a
    * NULL-text document must not silently vanish from pair blocking
    * while the oracle still pairs it.
    */
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) java.lang.Long.valueOf(0L) else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split("\\s+")
    val md = SimHashMd5.digests.get()
    val counts = new Array[Int](Bits)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        md.reset()
        val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex chars = top 60 bits of the first 7.5 bytes:
        // bytes 0..6 in full plus the high nibble of byte 7
        var h = 0L
        var bIdx = 0
        while (bIdx < 7) { h = (h << 8) | (d(bIdx) & 0xFFL); bIdx += 1 }
        h = (h << 4) | ((d(7) & 0xF0L) >> 4)
        var j = 0
        while (j < Bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

object SimHashMd5 {
  /** Per-thread MessageDigest: `getInstance` per ROW was ~30% of the
    * signature pass (provider lookup + allocation). MessageDigest is
    * not thread-safe, and one Expression instance can be evaluated
    * from several task threads — thread-local is the safe reuse.
    */
  private[functions] val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
}

/** 64-bit SimHash of a string's whitespace-token multiset: per bit
  * position, sum +1/-1 over token-hash bits; bit j of the result is
  * set when the sum is positive. One compiled pass per row — no
  * explode, no shuffle, no 64-aggregate codegen unit.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expects string, got ${child.dataType}")

  /** NULL text → signature 0, like [[SimHashMd5]]: "no content" and
    * "empty content" block identically across both simhash variants.
    */
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) java.lang.Long.valueOf(0L) else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split("\\s+")
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        val h1 = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c)
        val h2 = scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b)
        val h = (h1.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Random-hyperplane LSH signatures for a numeric vector: one
  * `planesPerTable`-bit sign signature per hash table, as array<long>
  * of length `nTables`. Hyperplane components are splitmix64-derived
  * from (plane, dim) — deterministic, no RNG, no broadcast needed.
  * Evaluates all nTables × planesPerTable dot products in one compiled
  * loop (the unrolled Column formulation generated a codegen unit that
  * took seconds to Janino-compile per query).
  */
case class HyperplaneSigs(child: Expression, nTables: Int, planesPerTable: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<float|double>, got $other")
    }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private var planeCache: Array[Array[Double]] = _
  private def planes(dim: Int): Array[Array[Double]] = {
    if (planeCache == null || planeCache(0).length != dim) {
      planeCache = Array.tabulate(nTables * planesPerTable) { i =>
        val table = i / planesPerTable
        val p = i % planesPerTable
        Array.tabulate(dim)(d => HyperplaneSigs.component(table * 97 + p, d))
      }
    }
    planeCache
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val pl = planes(dim)
    val sigs = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var p = 0
      while (p < planesPerTable) {
        val plane = pl(t * planesPerTable + p)
        var dot = 0.0
        var d = 0
        while (d < dim) {
          val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
          dot += x * plane(d)
          d += 1
        }
        if (dot >= 0) sig |= (1L << p)
        p += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}

object HyperplaneSigs {
  /** plane component ~ U[-0.5, 0.5), splitmix64((plane, dim)).
    * Public so oracle builders can inline the exact plane values as SQL
    * literals and replay the signature computation in another engine
    * (the hyperplanes are pure arithmetic — no RNG state to ship).
    */
  def component(plane: Int, d: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + d * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    (java.lang.Long.remainderUnsigned(z, 1000000L).toDouble / 1000000.0) - 0.5
  }
}

/** Distinct word n-grams of a string as array<string> (space-joined,
  * first-occurrence order) in one compiled pass. The declarative
  * `array_distinct(transform(sequence(...), i => concat_ws(slice(...))))`
  * formulation evaluates in the interpreted HOF path — per-n-gram
  * closure dispatch and array churn made it the hot spot of the
  * decontamination operator. Semantics match that formulation exactly
  * (tokens = non-empty `\s+` splits; fewer than `n` tokens → empty
  * array), so the DuckDB oracle is unchanged.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val toks0 = input.asInstanceOf[UTF8String].toString.split("\\s+")
    var m = 0
    var i = 0
    while (i < toks0.length) { // compact non-empty tokens in place
      if (toks0(i).nonEmpty) { toks0(m) = toks0(i); m += 1 }
      i += 1
    }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val count = m - n + 1
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var start = 0
    while (start < count) {
      val sb = new java.lang.StringBuilder(toks0(start))
      var j = 1
      while (j < n) { sb.append(' ').append(toks0(start + j)); j += 1 }
      seen.add(sb.toString)
      start += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** Index of the nearest centroid by dot product — the IVF assign step
  * in one compiled loop. Centroids arrive L2-normalized (argmax of
  * dot against normalized centroids == argmax of cosine, since the
  * row vector's own norm is a constant positive factor), so no
  * per-row sqrt. Ties keep the LAST index, matching the
  * struct-array_max formulation this replaces (max struct on equal
  * cos picks the larger cell ordinal). The previous unrolled
  * nCells × dim Column tree also cost seconds of Janino compilation
  * per pass — this is one small expression regardless of nCells.
  */
case class NearestCellDot(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression with CodegenFallback {

  require(cents.nonEmpty, "need at least one centroid")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<float|double>, got $other")
    }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val mat: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = 0
    var bestDot = Double.NegativeInfinity
    var j = 0
    while (j < mat.length) {
      val c = mat(j)
      val dim = math.min(v.numElements(), c.length)
      var s = 0.0
      var d = 0
      while (d < dim) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        s += x * c(d)
        d += 1
      }
      if (s >= bestDot) { bestDot = s; best = j }
      j += 1
    }
    java.lang.Integer.valueOf(best)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellDot =
    copy(child = newChild)
}
