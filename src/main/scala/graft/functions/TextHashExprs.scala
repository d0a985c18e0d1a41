package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native hot-path expressions for text hashing.
  *
  * The higher-order-function formulations of these are O(n × k) with the
  * n-sized input subtree re-evaluated inside each lambda step (interpreted
  * HOFs perform no common-subexpression elimination), which turns linear
  * algorithms quadratic. Each expression here is one tight loop over the
  * already-materialized input array.
  */

/** All w-element-window polynomial hashes of a long array, by true rolling
  * update: h_{i+1} = (h_i - a_i·B^{w-1})·B + a_{i+w} — O(n) total, Long
  * arithmetic wrapping mod 2^64. Arrays shorter than w yield the single
  * whole-array hash.
  */
case class WindowPolyHash(child: Expression, w: Int, base: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_poly_hash expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n <= w) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * base + xs.getLong(i); i += 1 }
      new GenericArrayData(Array(h))
    } else {
      // B^{w-1} mod 2^64, for evicting the element leaving the window.
      var pw = 1L
      var j = 1
      while (j < w) { pw *= base; j += 1 }
      val out = new Array[Long](n - w + 1)
      var h = 0L
      var i = 0
      while (i < w) { h = h * base + xs.getLong(i); i += 1 }
      out(0) = h
      while (i < n) {
        h = (h - xs.getLong(i - w) * pw) * base + xs.getLong(i)
        out(i - w + 1) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[WindowPolyHash].getName
    val ref = ctx.addReferenceObj("wph", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowPolyHash =
    copy(child = newChild)
}

/** MinHash signature of a shingle-hash array: element s (1-based) is
  * min over shingles h of xxhash64(h, s) — bit-identical to the built-in
  * `xxhash64(h, s)` two-column form (seed chain 42 → h → s), so results
  * match the HOF formulation exactly, in one O(n × p) native loop with a
  * per-shingle prefix hash reused across permutations.
  */
case class MinHashSignature(child: Expression, p: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val sig = Array.fill(p)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hh = XXH64.hashLong(xs.getLong(i), 42L)
      var s = 1
      while (s <= p) {
        val v = XXH64.hashLong(s.toLong, hh)
        if (v < sig(s - 1)) sig(s - 1) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[MinHashSignature].getName
    val ref = ctx.addReferenceObj("mhs", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Expand a BAG of 64-bit feature hashes into distinct INSTANCE hashes:
  * the c-th occurrence (0-based) of value h maps to xxhash64-mix(h, c).
  * Two documents then share exactly min(c_A(h), c_B(h)) instances of each
  * feature h, so ordinary (set) MinHash over the instance arrays estimates
  * the WEIGHTED Jaccard  Σ_h min(c_A,c_B) / Σ_h max(c_A,c_B) — the
  * integer-weight form large-corpus dedup uses (repeated boilerplate
  * counts once per occurrence, not once per distinct string). One O(n)
  * native pass with an open-addressing-free HashMap occurrence counter;
  * the HOF formulation would need an O(n²) count-of-equal-prefix lambda.
  */
case class BagInstanceHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bag_instance_hashes expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val seen = new java.util.HashMap[java.lang.Long, java.lang.Integer](n * 2)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = xs.getLong(i)
      val c = seen.merge(h, 1, (a, b) => a + b) - 1 // occurrences BEFORE this one
      out(i) = XXH64.hashLong(c.toLong, XXH64.hashLong(h, 42L))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[BagInstanceHashes].getName
    val ref = ctx.addReferenceObj("bih", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BagInstanceHashes =
    copy(child = newChild)
}

/** Intersection size of two SORTED long arrays by linear merge — O(n+m),
  * no allocation, no boxing. The generic `array_intersect` builds a boxed
  * hash set per invocation; on a candidate-pair hot path (millions of
  * pairs × ~100-element gram sets) that is the dominant cost. Sort the
  * sets once per row (`array_sort`) and count per pair with this.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_long_intersect_count expects two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[SortedLongIntersectCount].getName
    val ref = ctx.addReferenceObj("slic", this, cls)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = (Long) $ref.nullSafeEval($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** True iff ANY element of the input array<long> occurs in the fixed
  * SORTED haystack, by per-element binary search — O(k · log m) for a
  * k-gram document against an m-gram haystack. The `arrays_overlap`
  * formulation builds a hash set from the smaller (per-doc) side and then
  * LINEARLY SCANS the literal haystack until a hit, so every clean
  * document — the overwhelming majority in a decontamination pass — pays
  * O(m); with a benchmark suite of 10⁵-10⁶ grams that is the dominant
  * cost of the whole probe. The haystack rides inside the expression
  * (serialized once with the task closure, shared across rows), not as a
  * per-row Catalyst literal.
  */
case class SortedLongContainsAny(child: Expression, haystack: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sorted_long_contains_any expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(haystack, xs.getLong(i)) >= 0) return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[SortedLongContainsAny].getName
    val ref = ctx.addReferenceObj("slca", this, cls)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (Boolean) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedLongContainsAny =
    copy(child = newChild)
}

/** 64-bit SimHash of a token-hash array: each hash votes +1/-1 per bit
  * position; the sign of each tally is the signature bit. One O(n × 64)
  * native loop — the HOF formulation folds a 64-long array per token,
  * allocating and boxing throughout.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val tally = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = xs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[SimHash64].getName
    val ref = ctx.addReferenceObj("shx", this, cls)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (Long) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Per-document n-gram repetition statistics for the Gopher Table A1
  * rules (`GopherFilters.ngramFlags`): over the word n-grams of a token
  * array, `top_chars` = occurrences × char length of the MOST COMMON
  * gram (count ties broken by the lexicographically smallest gram —
  * UTF8String binary order, which is what `sort_array` and the oracle's
  * `ORDER BY g` both use) and `dup_chars` = Σ (count−1) × length over
  * distinct grams occurring more than once.
  *
  * One hash-map pass per document — O(total gram chars). The
  * sort-the-grams `aggregate` HOF formulation this replaces was the
  * whole q_gopher_ngrams budget (~13 s at sf0.1: interpreted lambda
  * steps over a 5-field struct per gram, × 9 n values); this is the
  * same integers in a tight loop.
  */
case class GramRepetitionStats(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_repetition_stats expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("top_chars", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("dup_chars", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val cnt = xs.numElements()
    val zero = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](0L, 0L))
    if (cnt < n) return zero
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Long]()
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i + n <= cnt) {
      var j = 0
      while (j < n) { window(j) = xs.getUTF8String(i + j); j += 1 }
      val gram = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, window: _*)
      counts.merge(gram, 1L, (a, b) => a + b)
      i += 1
    }
    var topCnt = 0L
    var topGram: org.apache.spark.unsafe.types.UTF8String = null
    var dup = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > topCnt || (c == topCnt && e.getKey.compareTo(topGram) < 0)) {
        topCnt = c
        topGram = e.getKey
      }
      if (c > 1L) dup += (c - 1L) * e.getKey.numChars()
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](topCnt * topGram.numChars(), dup))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[GramRepetitionStats].getName
    val ref = ctx.addReferenceObj("grs", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramRepetitionStats =
    copy(child = newChild)
}

object TextHashExprs {

  /** n-gram repetition stats (top_chars, dup_chars) of an array<string>. */
  def gramRepetitionStats(tokens: Column, n: Int): Column =
    ColumnBridge.column(GramRepetitionStats(ColumnBridge.expression(tokens), n))

  /** Rolling w-window polynomial hashes of an array<long> column. */
  def windowPolyHash(xs: Column, w: Int, base: Long): Column =
    ColumnBridge.column(WindowPolyHash(ColumnBridge.expression(xs), w, base))

  /** p-permutation MinHash signature of an array<long> column. */
  def minhashSignature(hashes: Column, p: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), p))

  /** 64-bit SimHash of an array<long> column of token hashes. */
  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))

  /** Intersection size of two sorted array<long> columns (linear merge). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Does any element of `xs` occur in the SORTED long haystack?
    * Per-element binary search; haystack serialized once per task.
    */
  def sortedContainsAny(xs: Column, sortedHaystack: Array[Long]): Column =
    ColumnBridge.column(SortedLongContainsAny(
      ColumnBridge.expression(xs), sortedHaystack))

  /** Bag → per-occurrence instance hashes of an array<long> column. */
  def bagInstanceHashes(hashes: Column): Column =
    ColumnBridge.column(BagInstanceHashes(ColumnBridge.expression(hashes)))
}
