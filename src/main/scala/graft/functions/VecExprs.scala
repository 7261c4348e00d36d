package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass imperative vector kernels (optimization guide §1.2 step 2 /
  * §4.1: keep the plan shape, make per-task work cheap). These replace
  * compositional `aggregate(zip_with(...))` chains — which materialize an
  * intermediate array per call and walk the inputs once per aggregate —
  * with single fused loops. Each kernel documents, and its spec pins,
  * BIT-EXACT equivalence with the compositional form it replaces: all
  * integer arithmetic is the same wraparound 64-bit math in the same
  * order, so every oracle hash is unchanged.
  */

/** Exact cosine over two integer-quantized vectors — the fused form of
  * [[graft.vec.Vec.cosineQ]]'s
  * `when(n2 === 0, 0.0).otherwise(dotQ(a,b) / sqrt(dotQ(a,a)*dotQ(b,b)))`,
  * which walked the arrays five times (zip_with + aggregate per dot) and
  * allocated three intermediate arrays per pair. One loop, no allocation.
  *
  * Null semantics replicate the compositional chain exactly:
  *  - null input array → null;
  *  - any null element (either side) → null (zip_with's null products
  *    poison every aggregate);
  *  - length mismatch with nonzero norms → null (the padded null products
  *    poison the cross dot), but 0.0 when n2 = 0 — the `when` guard fires
  *    before the null dot is consulted;
  *  - n2 = 0 → 0.0; overflow wraps like 64-bit `aggregate` sums and a
  *    negative n2 yields NaN through sqrt, exactly as before.
  */
case class CosineQ(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (TypeGuard.isLongArray(left.dataType) && TypeGuard.isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>) inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var sa = 0L
    while (i < na) {
      if (a.isNullAt(i)) return null
      val x = a.getLong(i)
      sa += x * x
      i += 1
    }
    var sb = 0L
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) return null
      val x = b.getLong(i)
      sb += x * x
      i += 1
    }
    val n2 = sa * sb
    if (n2 == 0L) java.lang.Double.valueOf(0.0)
    else if (na != nb) null // zip_with pads → null dot; when-guard already missed
    else {
      var dot = 0L
      i = 0
      while (i < na) { dot += a.getLong(i) * b.getLong(i); i += 1 }
      java.lang.Double.valueOf(dot.toDouble / math.sqrt(n2.toDouble))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      val tmp = ctx.freshName("res")
      s"""Object $tmp = $ref.nullSafeEval($l, $r);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $tmp).doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineQ =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_q"
}

/** Integer dot product of two quantized vectors — the fused form of
  * [[graft.vec.Vec.dotQ]]'s `aggregate(zip_with(a, b, _*_), 0L, _+_)`.
  * Null semantics replicated: null array → null; any null element → null;
  * length mismatch → null (zip_with pads the shorter side with nulls).
  */
case class DotQ(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (TypeGuard.isLongArray(left.dataType) && TypeGuard.isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>) inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      val tmp = ctx.freshName("res")
      s"""Object $tmp = $ref.nullSafeEval($l, $r);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $tmp).longValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotQ =
    copy(left = l, right = r)
  override def prettyName: String = "dot_q"
}

/** PQ encoding of a float vector against a literal codebook — the fused
  * form of [[graft.ann.Pq.codes]], which built m×kCent
  * `aggregate(zip_with(slice(v), centroid))` sub-distance expressions
  * (128 array walks + allocations per row at the default geometry). One
  * O(m·kCent·dsub) loop per row, identical double arithmetic: per
  * (subspace, centroid) the L2² folds left-to-right over ascending dims
  * from a 0.0 accumulator; argmin ties resolve to the lowest centroid
  * (`array_position(dists, array_min(dists))` semantics, where array_min
  * takes the first of equal doubles).
  *
  * Inputs shorter than m·dsub dims return null (the compositional form
  * degenerates to null-poisoned distance arrays there; no caller feeds
  * one — Pq.fittedCodebook rejects mis-dimensioned corpora — so the
  * defined-null is strictly safer). Null input array → null; a null
  * element → null.
  */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuard.requireType(prettyName, child.dataType, TypeGuard.isFloatArray, "array<float>")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val m = cb.length
  @transient private lazy val dsub = cb(0)(0).length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < m * dsub) return null
    var i = 0
    while (i < m * dsub) { if (v.isNullAt(i)) return null; i += 1 }
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = cb(s)
      val base = s * dsub
      var bestC = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          val d = v.getFloat(base + j).toDouble - cent(j)
          acc += d * d
          j += 1
        }
        // strict < keeps the FIRST minimal centroid — array_position of
        // array_min returns the first occurrence, ties to lowest c
        if (acc < bestD) { bestD = acc; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
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
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** Per-subspace nearest-centroid L2² distances (µ-unit-truncated longs)
  * against a literal codebook — the fused per-row kernel of
  * [[graft.ann.Pq.distortion]]: same m×kCent×dsub fold as [[PqEncode]]
  * but emitting `trunc(minDist * 1e6)` per subspace instead of the
  * argmin index. Same null/short-input contract as [[PqEncode]].
  */
case class PqMinDistU6(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuard.requireType(prettyName, child.dataType, TypeGuard.isFloatArray, "array<float>")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val m = cb.length
  @transient private lazy val dsub = cb(0)(0).length

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < m * dsub) return null
    var i = 0
    while (i < m * dsub) { if (v.isNullAt(i)) return null; i += 1 }
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val cents = cb(s)
      val base = s * dsub
      // running min with array_min's ordering (NaN greater than every
      // double, ADVICE r14): bestD starts NaN and is replaced whenever it
      // is NaN or acc is strictly smaller — so all-NaN distances yield
      // NaN (→ 0L under the truncating cast, matching the compositional
      // (array_min(dists) * 1e6).cast('long')), not a MaxValue sentinel
      var bestD = Double.NaN
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          val d = v.getFloat(base + j).toDouble - cent(j)
          acc += d * d
          j += 1
        }
        if (java.lang.Double.isNaN(bestD) || acc < bestD) bestD = acc
        c += 1
      }
      // (array_min(dists) * 1e6).cast("long") = truncating double→long cast
      out(s) = (bestD * 1e6).toLong
      s += 1
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
  override protected def withNewChildInternal(c: Expression): PqMinDistU6 = copy(child = c)
  override def prettyName: String = "pq_min_dist_u6"
}

/** ADC score of a PQ code row against one query's literal lookup table —
  * the fused form of [[graft.ann.Pq.scoreCodes]]'s
  * `aggregate(zip_with(codes, sequence(0, m-1), (code, s) =>
  * element_at(lut, s*kCent + code + 1)), 0L, _+_)`. Null semantics
  * replicated: null codes → null; null code element → null; a code row
  * whose length differs from m, or a code indexing past the lut, → null
  * (zip_with padding / element_at out-of-range both poison the sum).
  */
case class AdcScore(child: Expression, lut: Seq[Long], kCent: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuard.requireType(prettyName, child.dataType,
      { case ArrayType(IntegerType, _) => true; case _ => false }, "array<int>")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val lutArr: Array[Long] = lut.toArray
  @transient private lazy val m = lutArr.length / kCent

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    if (codes.numElements() != m) return null
    var acc = 0L
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val idx = s * kCent + codes.getInt(s)
      if (idx < 0 || idx >= lutArr.length) return null
      acc += lutArr(idx)
      s += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      val tmp = ctx.freshName("res")
      s"""Object $tmp = $ref.nullSafeEval($input);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $tmp).longValue(); }""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): AdcScore = copy(child = c)
  override def prettyName: String = "adc_score"
}

/** Integer squared-L2 distance of two quantized vectors — the fused form
  * of `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, _+_)`
  * (the IVF-RQ probe's reconstruction distance). Null semantics as
  * [[DotQ]]: null array / null element / length mismatch → null.
  */
case class SqDistQ(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (TypeGuard.isLongArray(left.dataType) && TypeGuard.isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>) inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      val tmp = ctx.freshName("res")
      s"""Object $tmp = $ref.nullSafeEval($l, $r);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $tmp).longValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistQ =
    copy(left = l, right = r)
  override def prettyName: String = "sq_dist_q"
}

/** Integer squared-L2 distances of a quantized residual against every row
  * of a literal integer codebook — the fused form of
  * [[graft.vec.Rq.l2Dists]]'s `transform(sequence(...), j =>
  * aggregate(zip_with(r, cb[j], (x,y) => (x-y)*(x-y)), 0L, _+_))`
  * (k array walks + allocations per row). A null input array, a null
  * element, or a length mismatch against the codebook rows returns a null
  * ARRAY — the compositional form produced an array of null ELEMENTS
  * there, which its only consumers (array_min / array_position in
  * Rq.assign) reduce to the same nulls, pinned by R14OptSpec.
  */
case class L2DistsQ(child: Expression, codebook: Seq[Seq[Long]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuard.requireType(prettyName, child.dataType, TypeGuard.isLongArray, "array<bigint>")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val cb: Array[Array[Long]] = codebook.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val r = input.asInstanceOf[ArrayData]
    val d = r.numElements()
    var i = 0
    while (i < d) { if (r.isNullAt(i)) return null; i += 1 }
    val out = new Array[Long](cb.length)
    var c = 0
    while (c < cb.length) {
      val row = cb(c)
      if (row.length != d) return null
      var acc = 0L
      var j = 0
      while (j < d) {
        val x = r.getLong(j) - row(j)
        acc += x * x
        j += 1
      }
      out(c) = acc
      c += 1
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
  override protected def withNewChildInternal(c: Expression): L2DistsQ = copy(child = c)
  override def prettyName: String = "l2_dists_q"
}

/** Count of positions where two b-bit minwise sketches agree — the fused
  * form of `aggregate(zip_with(a, b, (x,y) => when(x === y, 1).otherwise(0)),
  * 0, _+_)` over array<smallint> sketches (the est-Jaccard verify tier of
  * Dedup.minhashCandidates / Incremental.classify). Null semantics
  * replicated: null array → null; a null ELEMENT or a padded position
  * from a length mismatch contributes 0 (the `when`'s otherwise), never
  * null — so the fused count only scans the shorter prefix and the
  * result is always defined for non-null inputs.
  */
case class SketchEqCount(left: Expression, right: Expression) extends BinaryExpression {
  private val isShortArray: DataType => Boolean = {
    case ArrayType(ShortType, _) => true
    case _                       => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isShortArray(left.dataType) && isShortArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<smallint>, array<smallint>) inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getShort(i) == b.getShort(i)) acc += 1
      i += 1
    }
    java.lang.Integer.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      s"${ev.value} = ((java.lang.Integer) $ref.nullSafeEval($l, $r)).intValue();"
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SketchEqCount =
    copy(left = l, right = r)
  override def prettyName: String = "sketch_eq_count"
}

/** Column-level API for the fused vector kernels. */
/** Fused binary sign-pack over a quantized vector (r15): one pass
  * computing BOTH the 64-bit sign word and the positive count — the
  * compositional form built a 64-element sequence array, transformed it
  * with per-index `element_at` probes, and ran two separate aggregates
  * (three array allocations and two walks per row).
  *
  * Bit-exact semantics of
  * `aggregate(transform(sequence(0,63), i -> IF(q[i+1] > 0, 1L << i, 0L)), 0L, _|_)`
  * and `aggregate(q, 0, (a,x) -> a + IF(x > 0, 1, 0))`:
  *  - null input → null; null ELEMENTS contribute no bit and no count
  *    (the IF's null predicate takes the else branch);
  *  - bits read the first 64 elements; n_pos counts ALL elements;
  *  - elements past the array length contribute 0 bits (the legacy
  *    element_at-out-of-range semantics; embeddings are fixed 64-d so
  *    the branch is unobservable on real data).
  */
case class SignPack(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (TypeGuard.isLongArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StructType(Seq(
    StructField("bits", LongType, nullable = false),
    StructField("n_pos", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val n = q.numElements()
    var bits = 0L
    var nPos = 0L
    var i = 0
    while (i < n) {
      if (!q.isNullAt(i) && q.getLong(i) > 0L) {
        if (i < 64) bits |= 1L << i
        nPos += 1L
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bits, nPos)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("graftExpr", this)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
  override def prettyName: String = "sign_pack"
}

object vexprs {
  def cosine_q(a: Column, b: Column): Column =
    ColumnBridge.column(CosineQ(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def dot_q(a: Column, b: Column): Column =
    ColumnBridge.column(DotQ(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def pq_encode(v: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), cb))
  def pq_min_dist_u6(v: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqMinDistU6(ColumnBridge.expression(v), cb))
  def adc_score(codes: Column, lut: Seq[Long], kCent: Int): Column =
    ColumnBridge.column(AdcScore(ColumnBridge.expression(codes), lut, kCent))
  def sq_dist_q(a: Column, b: Column): Column =
    ColumnBridge.column(SqDistQ(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2_dists_q(r: Column, cb: Seq[Seq[Long]]): Column =
    ColumnBridge.column(L2DistsQ(ColumnBridge.expression(r), cb))
  def sketch_eq_count(a: Column, b: Column): Column =
    ColumnBridge.column(SketchEqCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sign_pack(q: Column): Column =
    ColumnBridge.column(SignPack(ColumnBridge.expression(q)))
}
