package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Deterministic 64-bit mixer (public SplitMix64 construction) used to
  * derive per-permutation coefficients from a seed. No RNG state — pure
  * function of the seed, so plans are reproducible across executors.
  */
/** Analysis-time input type guards for the custom expressions. The
  * evaluators read raw `ArrayData` slots (`getLong`/`getFloat`), so a
  * mistyped input must fail analysis — not silently read garbage bytes.
  * (`ExpectsInputTypes` is private[sql]-typed, hence manual checks.)
  */
private[functions] object TypeGuard {
  def requireType(fn: String, actual: DataType, ok: DataType => Boolean, expected: String): TypeCheckResult =
    if (ok(actual)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires $expected input, got ${actual.catalogString}")

  val isLongArray: DataType => Boolean = {
    case ArrayType(LongType, _) => true
    case _                      => false
  }
  val isFloatArray: DataType => Boolean = {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  val isString: DataType => Boolean = {
    case StringType => true
    case _          => false
  }
}

/** Shared one-pass word canonicalization + hashing for the fused text
  * kernels, matching `Text.canon` (lowercase then [^a-z0-9]+ as
  * separators):
  *  - ASCII fast path: A-Z fold by +32, a-z0-9 kept;
  *  - non-ASCII chars fold via Character.toLowerCase and are kept only
  *    if they land in [a-z0-9] (covers U+212A KELVIN SIGN → 'k',
  *    U+0130 'İ' → 'i' — the cases where a full-string lower() would
  *    also keep a word character);
  *  - per-word hash is FNV-1a over the char codes, finalized by Mix64.
  *    (A plain 31-polynomial collides on short words — e.g. "c0a" vs
  *    "ana" — because Mix64 of equal accumulators is equal; FNV-1a's
  *    per-char 64-bit multiply keeps distinct short words distinct.)
  */
private[graft] object WordWalk {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** Returns the array of word hashes (length in `_1`, buffer in `_2`);
    * buffer may be longer than the count.
    */
  def wordHashes(s: String): (Int, Array[Long]) = {
    val n = s.length
    var buf = new Array[Long](math.max(8, n / 5))
    var nWords = 0
    var wh = FnvOffset
    var inWord = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val lc: Int =
        if (c >= 'A' && c <= 'Z') c + 32
        else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) c.toInt
        else if (c < 128) -1
        else {
          val l = Character.toLowerCase(c.toInt)
          if ((l >= 'a' && l <= 'z') || (l >= '0' && l <= '9')) l else -1
        }
      if (lc >= 0) {
        wh = (wh ^ lc) * FnvPrime
        inWord = true
      } else if (inWord) {
        if (nWords == buf.length) buf = java.util.Arrays.copyOf(buf, nWords * 2)
        buf(nWords) = Mix64(wh); nWords += 1
        wh = FnvOffset; inWord = false
      }
      i += 1
    }
    if (inWord) {
      if (nWords == buf.length) buf = java.util.Arrays.copyOf(buf, nWords + 1)
      buf(nWords) = Mix64(wh); nWords += 1
    }
    (nWords, buf)
  }
}

object Mix64 {
  def apply(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** SplitMix64 finalizer of a BIGINT column — the deterministic row hash
  * behind reproducible train/val/test assignment ([[graft.ops.Sample
  * .hashSplit]]). A dedicated expression because the wrapping multiplies
  * can't be written with Column arithmetic under ANSI mode (overflow
  * would throw); the codegen inlines the three mix rounds directly, so
  * the hash stays inside whole-stage codegen with zero calls/boxing.
  * Mirrored bit-exactly in SQL by [[graft.oracle.DuckHash.mix64BucketSql]].
  */
case class Mix64Long(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuard.requireType(prettyName, child.dataType, _ == LongType, "bigint")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Mix64(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val z = ctx.freshName("z")
      s"""long $z = $input + 0x9e3779b97f4a7c15L;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |${ev.value} = $z ^ ($z >>> 31);""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Mix64Long = copy(child = c)
  override def prettyName: String = "mix64"
}

/** MinHash signature over a column of pre-hashed shingles.
  *
  * Input: `array<long>` (xxhash64 of each shingle). Output: `array<long>`
  * of length `k` where slot i is the minimum of the i-th affine
  * permutation `h*a_i + b_i` (natural Long wraparound — only order
  * stability matters for LSH, not modular exactness).
  *
  * A single imperative O(n*k) pass per row; replaces k=128 chained
  * `transform`/`array_min` calls which would allocate 128 intermediate
  * arrays per row. Spark-side equivalent of the shingle→minhash step of
  * classic MinHashLSH dedup; runs entirely map-side (no shuffle).
  */
case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuard.requireType(prettyName, child.dataType, TypeGuard.isLongArray, "array<bigint>")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val coefA: Array[Long] =
    Array.tabulate(k)(i => Mix64(seed + 2L * i) | 1L) // odd => bijective mod 2^64
  @transient private lazy val coefB: Array[Long] =
    Array.tabulate(k)(i => Mix64(seed + 2L * i + 1L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val v = h * coefA(i) + coefB(i)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      val tmp = ctx.freshName("res")
      s"""Object $tmp = $ref.nullSafeEval($input);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash over a column of pre-hashed tokens (`array<long>`).
  *
  * Classic Charikar construction: per bit, +1 if set in the token hash,
  * -1 otherwise; the output bit is 1 iff the sum is positive. One
  * imperative pass; map-side only.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuard.requireType(prettyName, child.dataType, TypeGuard.isLongArray, "array<bigint>")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val w = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) w(b) += 1 else w(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (w(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      val tmp = ctx.freshName("res")
      s"""Object $tmp = $ref.nullSafeEval($input);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $tmp).longValue(); }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Fused text -> MinHash signature: canonicalize, tokenize, shingle, and
  * minhash in ONE imperative pass with zero intermediate string/array
  * allocation. Equivalent to
  * `MinHashSig(xxhash64-per-shingle(shingles(canon(text))))` up to the
  * hash family (word/shingle hashes here are polynomial+Mix64, which is
  * fine: LSH only needs a fixed deterministic family, and this path has
  * no cross-engine oracle).
  *
  * Measured ~10x over the compositional pipeline on 500-char docs — the
  * compositional path pays for building every shingle as a string and
  * re-walking UTF8 data; this walks the text once.
  */
case class TextShingleMinHash(child: Expression, k: Int, shingleK: Int, seed: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuard.requireType(prettyName, child.dataType, TypeGuard.isString, "string")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val coefA: Array[Long] =
    Array.tabulate(k)(i => Mix64(seed + 2L * i) | 1L)
  @transient private lazy val coefB: Array[Long] =
    Array.tabulate(k)(i => Mix64(seed + 2L * i + 1L))

  override def nullSafeEval(input: Any): Any = {
    // pass 1: canonical word hashes (shared WordWalk kernel)
    val (nWords, wordHashes) = WordWalk.wordHashes(input.toString)
    if (nWords == 0) return null
    // pass 2: shingle hashes (combine shingleK consecutive word hashes)
    val nShingles = if (nWords <= shingleK) 1 else nWords - shingleK + 1
    val width = math.min(shingleK, nWords)
    val mins = Array.fill(k)(Long.MaxValue)
    var sIdx = 0
    while (sIdx < nShingles) {
      var h = WordWalk.FnvOffset
      var j = 0
      while (j < width) {
        h = (h ^ wordHashes(sIdx + j)) * WordWalk.FnvPrime
        j += 1
      }
      h = Mix64(h)
      var p = 0
      while (p < k) {
        val v = h * coefA(p) + coefB(p)
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      sIdx += 1
    }
    new GenericArrayData(mins)
  }

  /** Fully-inlined codegen: the generated class contains the whole
    * word-walk + shingle + k-permutation loop body (no per-row virtual
    * call back into this expression object, no boxing). Arithmetic is
    * line-for-line the nullSafeEval path, so signatures are
    * bit-identical between interpreted and codegen evaluation
    * (spec-asserted via spark.sql.codegen.factoryMode=NO_CODEGEN).
    * Only the coefficient arrays cross as reference objects.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val coefARef = ctx.addReferenceObj("graftCoefA", coefA, "long[]")
      val coefBRef = ctx.addReferenceObj("graftCoefB", coefB, "long[]")
      // SplitMix64 finalizer, inlined at both call sites (no helper
      // function: addNewFunction may split helpers across nested classes,
      // and a cross-class call would defeat the inlining this exists for)
      def mix(in: String, out: String): String =
        s"""long $out = $in + 0x9e3779b97f4a7c15L;
           |$out = ($out ^ ($out >>> 30)) * 0xbf58476d1ce4e5b9L;
           |$out = ($out ^ ($out >>> 27)) * 0x94d049bb133111ebL;
           |$out = $out ^ ($out >>> 31);""".stripMargin
      val fn = ctx.addNewFunction("graftTextShingleMinHash",
        s"""private long[] graftTextShingleMinHash(org.apache.spark.unsafe.types.UTF8String u) {
           |  String s = u.toString();
           |  int n = s.length();
           |  long[] words = new long[Math.max(8, n / 5)];
           |  int nWords = 0;
           |  long wh = ${WordWalk.FnvOffset}L;
           |  boolean inWord = false;
           |  for (int i = 0; i <= n; i++) {
           |    int lc;
           |    if (i == n) lc = -1; // virtual trailing separator flushes the last word
           |    else {
           |      char c = s.charAt(i);
           |      if (c >= 'A' && c <= 'Z') lc = c + 32;
           |      else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) lc = c;
           |      else if (c < 128) lc = -1;
           |      else {
           |        int l = Character.toLowerCase((int) c);
           |        lc = ((l >= 'a' && l <= 'z') || (l >= '0' && l <= '9')) ? l : -1;
           |      }
           |    }
           |    if (lc >= 0) { wh = (wh ^ lc) * ${WordWalk.FnvPrime}L; inWord = true; }
           |    else if (inWord) {
           |      if (nWords == words.length) words = java.util.Arrays.copyOf(words, nWords * 2);
           |      ${mix("wh", "wm")}
           |      words[nWords++] = wm;
           |      wh = ${WordWalk.FnvOffset}L; inWord = false;
           |    }
           |  }
           |  if (nWords == 0) return null;
           |  int nShingles = (nWords <= $shingleK) ? 1 : nWords - $shingleK + 1;
           |  int width = Math.min($shingleK, nWords);
           |  long[] mins = new long[$k];
           |  java.util.Arrays.fill(mins, Long.MAX_VALUE);
           |  for (int sIdx = 0; sIdx < nShingles; sIdx++) {
           |    long h = ${WordWalk.FnvOffset}L;
           |    for (int j = 0; j < width; j++) h = (h ^ words[sIdx + j]) * ${WordWalk.FnvPrime}L;
           |    ${mix("h", "hm")}
           |    for (int p = 0; p < $k; p++) {
           |      long v = hm * $coefARef[p] + $coefBRef[p];
           |      if (v < mins[p]) mins[p] = v;
           |    }
           |  }
           |  return mins;
           |}""".stripMargin)
      val tmp = ctx.freshName("res")
      s"""long[] $tmp = $fn($input);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($tmp); }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): TextShingleMinHash = copy(child = c)
  override def prettyName: String = "text_shingle_minhash"
}

/** Fused text -> (prefix-block key, distinct shingle-hash set): the
  * blocked exact n-gram-Jaccard kernel in ONE pass over the text.
  *
  * Canonicalization matches Text.canon (lowercase, [^a-z0-9]+ as
  * separators) — exact on ASCII, and folding non-ASCII chars whose
  * lowercase lands in [a-z0-9] the way a full-string lower() does (see
  * WordWalk). Output struct:
  *   pfx: long    — hash of the first `prefixN` canonical words (block key;
  *                  equal-prefix <=> equal-hash up to 2^-64 collisions)
  *   sh:  array<long> — sorted DISTINCT hashes of word `shingleK`-shingles
  *                  (docs with fewer than `shingleK` words collapse to one
  *                  whole-text shingle, mirroring Text.shinglesOfWords)
  * Null when the canonical text has no words.
  *
  * Replaces regex canon + split + higher-order shingle transform +
  * array_distinct over *string* arrays: no string allocation at all, and
  * downstream Jaccard runs on sorted long arrays instead of string sets.
  * |A∩B| / |A∪B| over hashes equals the string-set Jaccard as long as no
  * 64-bit collision occurs within a compared pair (~1e-15 for 50-shingle
  * docs).
  */
case class ShingleBlock(child: Expression, shingleK: Int, prefixN: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuard.requireType(prettyName, child.dataType, TypeGuard.isString, "string")
  override def dataType: DataType = StructType(Seq(
    StructField("pfx", LongType, nullable = false),
    StructField("sh", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    // pass 1: canonical word hashes (shared WordWalk kernel)
    val (nWords, wordHashes) = WordWalk.wordHashes(input.toString)
    if (nWords == 0) return null
    // prefix block key: combine the first prefixN word hashes
    val pn = math.min(prefixN, nWords)
    var pfx = WordWalk.FnvOffset
    var p = 0
    while (p < pn) { pfx = (pfx ^ wordHashes(p)) * WordWalk.FnvPrime; p += 1 }
    pfx = Mix64(pfx)
    // shingle hashes, then sort + dedupe in place
    val width = math.min(shingleK, nWords)
    val nShingles = if (nWords <= shingleK) 1 else nWords - shingleK + 1
    val hs = new Array[Long](nShingles)
    var sIdx = 0
    while (sIdx < nShingles) {
      var h = WordWalk.FnvOffset
      var j = 0
      while (j < width) { h = (h ^ wordHashes(sIdx + j)) * WordWalk.FnvPrime; j += 1 }
      hs(sIdx) = Mix64(h)
      sIdx += 1
    }
    java.util.Arrays.sort(hs)
    var out = hs
    var m = 0
    var r = 0
    while (r < nShingles) {
      if (m == 0 || hs(r) != out(m - 1)) { out(m) = hs(r); m += 1 }
      r += 1
    }
    if (m < nShingles) out = java.util.Arrays.copyOf(out, m)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](pfx, new GenericArrayData(out)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      val tmp = ctx.freshName("res")
      s"""Object $tmp = $ref.nullSafeEval($input);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $tmp; }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): ShingleBlock = copy(child = c)
  override def prettyName: String = "shingle_block"
}

/** Dot products of a float vector against a fixed set of planes
  * (hyperplanes for sign-LSH, centroid vectors for IVF) in one imperative
  * pass. Replaces p separate `aggregate(zip_with(...))` higher-order
  * calls — which each re-walk the array with interpreted lambdas — with a
  * single O(p*d) loop. Summation is left-to-right like `aggregate`, so
  * results are bit-identical to the compositional form.
  */
case class PlaneDots(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  // nullSafeEval reads elements with arr.getFloat: anything but
  // array<float> must be rejected at analysis time, not read as garbage.
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuard.requireType(prettyName, child.dataType, TypeGuard.isFloatArray, "array<float>")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val planeArr: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val p = planeArr.length
    val out = new Array[Double](p)
    var j = 0
    while (j < p) {
      val plane = planeArr(j)
      val n = math.min(d, plane.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += arr.getFloat(i).toDouble * plane(i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      val tmp = ctx.freshName("res")
      s"""Object $tmp = $ref.nullSafeEval($input);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): PlaneDots = copy(child = c)
  override def prettyName: String = "plane_dots"
}

/** Morton/Z-order interleave of the low 32 bits of two longs: the first
  * input's bits occupy even positions, the second's odd positions. Used
  * by `sinks.Clustered.zorderWrite` as a write-time layout key: sorting
  * by the interleaved key gives parquet row-group min/max skipping on
  * BOTH dimensions (the classic Z-order curve; the magic-mask bit
  * spread is the standard public construction).
  */
case class InterleaveBits32(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint) inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  private def spread(x0: Long): Long = {
    var v = x0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(
      spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val va = ctx.freshName("za")
      val vb = ctx.freshName("zb")
      def spreadCode(in: String, v: String) =
        s"""long $v = $in & 0xFFFFFFFFL;
           |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x3333333333333333L;
           |$v = ($v | ($v << 1)) & 0x5555555555555555L;""".stripMargin
      s"""${spreadCode(a, va)}
         |${spreadCode(b, vb)}
         |${ev.value} = $va | ($vb << 1);""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): InterleaveBits32 =
    copy(left = l, right = r)
  override def prettyName: String = "interleave_bits32"
}

/** Column-level API for the custom expressions. */
object exprs {
  def plane_dots(vec: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(PlaneDots(ColumnBridge.expression(vec), planes))

  def text_minhash_sig(text: Column, k: Int = 128, shingleK: Int = 3, seed: Long = 42L): Column =
    ColumnBridge.column(TextShingleMinHash(ColumnBridge.expression(text), k, shingleK, seed))

  def minhash_sig(shingleHashes: Column, k: Int = 128, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingleHashes), k, seed))

  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenHashes)))

  def shingle_block(text: Column, shingleK: Int = 3, prefixN: Int = 3): Column =
    ColumnBridge.column(ShingleBlock(ColumnBridge.expression(text), shingleK, prefixN))

  def zorder_key(a: Column, b: Column): Column =
    ColumnBridge.column(InterleaveBits32(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
