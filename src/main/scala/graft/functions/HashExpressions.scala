package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlInternals.{columnOf, expressionOf}
import org.apache.spark.sql.types._

/** Fused single-pass signature kernels for the dedup pipeline (SURVEY.md §4
  * extension ladder, tier (b) — a native Expression where composing
  * built-ins forces many passes over the same array).
  *
  * Both are bit-exact replacements for their composed built-in forms (kept
  * in `Dedup` as `*Composed` for differential testing): they reproduce
  * Spark's own xxhash64 seeding, so signatures — and therefore every
  * downstream candidate pair — are unchanged.
  */

/** 64-bit SimHash over an `array<long>` of token hashes, in ONE traversal.
  *
  * Replaces 64 independent `aggregate()` lambdas (one per bit — 64 scans of
  * the token array per row and a giant codegen unit). Semantics: bit i of
  * the result is 1 iff Σ_tokens (bit i of hash ? +1 : −1) > 0 — identical
  * to `Dedup.simhashComposed`.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<BIGINT>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    val ones = new Array[Int](64)
    var j = 0
    while (j < m) {
      val h = a.getLong(j)
      var i = 0
      while (i < 64) { ones(i) += ((h >>> i) & 1L).toInt; i += 1 }
      j += 1
    }
    // bitSum = 2·ones − m; bit set iff bitSum > 0
    var sig = 0L
    var i = 0
    while (i < 64) { if (2 * ones(i) > m) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val ones = ctx.freshName("ones")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val sig = ctx.freshName("sig")
      s"""
         |int $m = $a.numElements();
         |int[] $ones = new int[64];
         |for (int $j = 0; $j < $m; $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) $ones[$i] += (int) (($h >>> $i) & 1L);
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) if (2 * $ones[$i] > $m) $sig |= (1L << $i);
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature of `n` permutations over an `array<long>` of base
  * element hashes, in ONE traversal.
  *
  * out[i] = min over elements h of xxhash64(h, i) with Spark's seeding
  * (XXH64.hashInt(i, XXH64.hashLong(h, 42))) — identical to the composed
  * `array((0 until n).map(i => array_min(transform(bh, h => xxhash64(h,
  * lit(i))))))` form, but the n minima accumulate in registers during a
  * single pass instead of n full array traversals with n intermediate
  * arrays. Null for an empty array (array_min of empty is null likewise).
  */
case class MinHashSig(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0 && n <= 1024, s"minhash_sig: n out of range: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<BIGINT>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty array → null

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    if (m == 0) return null
    val mins = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val base = XXH64.hashLong(a.getLong(j), 42L)
      var i = 0
      while (i < n) {
        val v = XXH64.hashInt(i, base)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val mins = ctx.freshName("mins")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xxh = classOf[XXH64].getName
      s"""
         |int $m = $a.numElements();
         |if ($m == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$n];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $m; $j++) {
         |    long $base = $xxh.hashLong($a.getLong($j), 42L);
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $v = $xxh.hashInt($i, $base);
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** xxhash64 of every character k-gram of a string, in ONE traversal —
  * `out[i] = xxhash64(substring(s, i, k))` without ever materializing the
  * substring. The composed pipeline (`transform(sequence(...), i =>
  * substr(norm, i, k))` + `xxhash64` per shingle) allocates one UTF8String
  * per shingle — ~2000 allocations per document — before hashing; this
  * kernel walks the char boundaries once and hashes each byte window in
  * place. Bit-identical to Spark's `xxhash64(string)` (XXH64 over the
  * UTF-8 bytes, seed 42). Duplicates are kept: min/intersect/union
  * consumers are set-semantics anyway.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 1000, s"shingle_hashes: k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects STRING, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val nChars = s.numChars()
    val nOut = nChars - k + 1
    if (nOut <= 0) return new GenericArrayData(Array.emptyLongArray)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val offs = new Array[Int](nChars + 1)
    var bi = 0
    var ci = 0
    while (ci < nChars) {
      offs(ci) = bi
      bi += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + bi))
      ci += 1
    }
    offs(nChars) = s.numBytes()
    val out = new Array[Long](nOut)
    var i = 0
    while (i < nOut) {
      out(i) = XXH64.hashUnsafeBytes(base, off + offs(i), offs(i + k) - offs(i), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val nChars = ctx.freshName("nChars")
      val nOut = ctx.freshName("nOut")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val offs = ctx.freshName("offs")
      val bi = ctx.freshName("bi")
      val ci = ctx.freshName("ci")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val xxh = classOf[XXH64].getName
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val platform = "org.apache.spark.unsafe.Platform"
      val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
      s"""
         |int $nChars = $a.numChars();
         |int $nOut = $nChars - $k + 1;
         |if ($nOut <= 0) {
         |  ${ev.value} = $uad.fromPrimitiveArray(new long[0]);
         |} else {
         |  Object $base = $a.getBaseObject();
         |  long $off = $a.getBaseOffset();
         |  int[] $offs = new int[$nChars + 1];
         |  int $bi = 0;
         |  for (int $ci = 0; $ci < $nChars; $ci++) {
         |    $offs[$ci] = $bi;
         |    $bi += $utf8.numBytesForFirstByte($platform.getByte($base, $off + $bi));
         |  }
         |  $offs[$nChars] = $a.numBytes();
         |  long[] $out = new long[$nOut];
         |  for (int $i = 0; $i < $nOut; $i++) {
         |    $out[$i] = $xxh.hashUnsafeBytes(
         |      $base, $off + $offs[$i], $offs[$i + $k] - $offs[$i], 42L);
         |  }
         |  ${ev.value} = $uad.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** xxhash64 of every word n-gram of a whitespace-NORMALIZED string (single
  * ASCII spaces between tokens — the caller lower/trim/collapses first), in
  * ONE traversal. Because tokens are single-space separated, the n-gram
  * string "t1 t2 … tn" IS a byte range of the input, so each hash is
  * computed in place — bit-identical to `xxhash64(array_join(slice(split(
  * s, ' '), i+1, n), ' '))` without allocating any gram string. Returns an
  * empty array when the string has fewer than n tokens (the composed form's
  * length filter does the same).
  */
case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0 && n <= 100, s"word_ngram_hashes: n out of range: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_hashes expects STRING, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val nBytes = s.numBytes()
    if (nBytes == 0) return new GenericArrayData(Array.emptyLongArray)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // token start byte offsets (spaces are single ASCII 0x20 by contract)
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    var i = 0
    while (i < nBytes) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte)
        starts += i + 1
      i += 1
    }
    val t = starts.length
    if (t < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](t - n + 1)
    var g = 0
    while (g <= t - n) {
      val s0 = starts(g)
      val e0 = if (g + n < t) starts(g + n) - 1 else nBytes
      out(g) = XXH64.hashUnsafeBytes(base, off + s0, e0 - s0, 42L)
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val nBytes = ctx.freshName("nBytes")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val starts = ctx.freshName("starts")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      val s0 = ctx.freshName("s0")
      val e0 = ctx.freshName("e0")
      val out = ctx.freshName("out")
      val xxh = classOf[XXH64].getName
      val platform = "org.apache.spark.unsafe.Platform"
      val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
      s"""
         |int $nBytes = $a.numBytes();
         |Object $base = $a.getBaseObject();
         |long $off = $a.getBaseOffset();
         |int[] $starts = new int[$nBytes + 1];
         |int $t = 0;
         |if ($nBytes > 0) {
         |  $starts[$t++] = 0;
         |  for (int $i = 0; $i < $nBytes; $i++) {
         |    if ($platform.getByte($base, $off + $i) == (byte) ' ') $starts[$t++] = $i + 1;
         |  }
         |}
         |if ($t < $n) {
         |  ${ev.value} = $uad.fromPrimitiveArray(new long[0]);
         |} else {
         |  long[] $out = new long[$t - $n + 1];
         |  for (int $g = 0; $g <= $t - $n; $g++) {
         |    int $s0 = $starts[$g];
         |    int $e0 = ($g + $n < $t) ? $starts[$g + $n] - 1 : $nBytes;
         |    $out[$g] = $xxh.hashUnsafeBytes($base, $off + $s0, $e0 - $s0, 42L);
         |  }
         |  ${ev.value} = $uad.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
}

/** Random-hyperplane LSH sign bits over an embedding column, in ONE
  * traversal: bit p of the result is 1 iff Σ_i x_i·w(p,i) > 0, where the
  * pseudo-weight w(p,i) = (pmod(xxhash64(p, seed, i), 2000001) − 10⁶)/10⁶
  * reproduces `Similarity.lshKeyComposed` exactly (Spark's xxhash64 chain
  * over three int children, with the (p, seed) prefix pre-folded per plane).
  * The composed form re-walks the embedding once per plane and materializes
  * a weights array per (row, plane); this kernel accumulates all plane
  * projections in registers during a single pass. Null/absent elements
  * contribute 0 (the composed form zeroes the whole plane's bit via
  * null-propagation — embeddings with null elements are malformed inputs;
  * we keep the per-element definition which is the useful one).
  */
case class LshSignBits(child: Expression, nPlanes: Int, seed: Int)
    extends UnaryExpression {
  require(nPlanes > 0 && nPlanes <= 63, s"lsh_sign_bits: nPlanes out of range: $nPlanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sign_bits expects ARRAY<FLOAT|DOUBLE>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Per-plane pre-folded hash prefix: xxhash64 seeds 42, then folds plane
    * index and seed — constant per plane, computed once at plan time.
    */
  private lazy val planeBases: Array[Long] =
    Array.tabulate(nPlanes)(p => XXH64.hashInt(seed, XXH64.hashInt(p, 42L)))

  private def weight(base: Long, i: Int): Double = {
    val h = XXH64.hashInt(i, base)
    val m = ((h % 2000001L) + 2000001L) % 2000001L
    (m - 1000000L).toDouble / 1000000.0
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    val acc = new Array[Double](nPlanes)
    var i = 0
    while (i < m) {
      if (!a.isNullAt(i)) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        var p = 0
        while (p < nPlanes) { acc(p) += x * weight(planeBases(p), i); p += 1 }
      }
      i += 1
    }
    var bits = 0L
    var p = 0
    while (p < nPlanes) { if (acc(p) > 0) bits |= (1L << p); p += 1 }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val basesRef = ctx.addReferenceObj("lshPlaneBases", planeBases, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      val w = ctx.freshName("w")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val bits = ctx.freshName("bits")
      val xxh = classOf[XXH64].getName
      val nullGuard =
        if (child.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($a.isNullAt($i)) continue;"
        else ""
      s"""
         |int $m = $a.numElements();
         |double[] $acc = new double[$nPlanes];
         |for (int $i = 0; $i < $m; $i++) {
         |  $nullGuard
         |  double $x = (double) $a.$get($i);
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    long $h = $xxh.hashInt($i, $basesRef[$p]);
         |    long $w = (($h % 2000001L) + 2000001L) % 2000001L;
         |    $acc[$p] += $x * (($w - 1000000L) / 1000000.0);
         |  }
         |}
         |long $bits = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) if ($acc[$p] > 0) $bits |= (1L << $p);
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignBits =
    copy(child = newChild)
}

object HashFunctions {
  /** Column API: fused simhash over an array<long> of token hashes. */
  def simhash64(tokenHashes: Column): Column =
    columnOf(SimHash64(expressionOf(tokenHashes)))

  /** Column API: fused n-permutation minhash over array<long> base hashes. */
  def minhash_sig(baseHashes: Column, n: Int): Column =
    columnOf(MinHashSig(expressionOf(baseHashes), n))

  /** Column API: fused random-hyperplane sign bits over an embedding. */
  def lsh_sign_bits(embedding: Column, nPlanes: Int, seed: Int): Column =
    columnOf(LshSignBits(expressionOf(embedding), nPlanes, seed))

  /** Column API: xxhash64 of every char k-gram, no substring allocation. */
  def shingle_hashes(text: Column, k: Int): Column =
    columnOf(ShingleHashes(expressionOf(text), k))

  /** Column API: xxhash64 of every word n-gram of a normalized string. */
  def word_ngram_hashes(text: Column, n: Int): Column =
    columnOf(WordNgramHashes(expressionOf(text), n))
}
