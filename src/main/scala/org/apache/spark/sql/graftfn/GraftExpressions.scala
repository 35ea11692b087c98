package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, EvalMode, ExpectsInputTypes, Expression, IntegralDivide, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType, StringType, StructField, StructType}

/** Bridge into the `private[sql]` Column↔Expression API for graft's
  * native Catalyst expressions (the supported pattern for libraries
  * adding codegen-friendly functions without forking Spark).
  */
object GraftExpressions {
  def fastMd5(c: Column): Column =
    ExpressionUtils.column(FastMd5Expr(ExpressionUtils.expression(c.cast("binary"))))

  /** Truncating integral division (SQL `div`), LEGACY eval so divisor 0
    * yields null — DuckDB's `//` behavior — instead of the ANSI error the
    * Spark-4 default session would raise on an empty group.
    */
  def intDiv(a: Column, b: Column): Column =
    ExpressionUtils.column(IntegralDivide(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      EvalMode.LEGACY))

  def floatVecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def rollingHash(c: Column): Column =
    ExpressionUtils.column(RollingHashExpr(ExpressionUtils.expression(c)))

  /** Sequential long-array dot — the integer-micro twin of
    * [[floatVecDot]] (exact, so bit-identity questions don't even
    * arise; null semantics mirror the `aggregate(zip_with(...))` fold).
    */
  def longVecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(LongVecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Distinct word-3-gram shingles of a token array (first-occurrence
    * order) — the per-row form of the inverted-index input, so the
    * shingle derivation needs no doc_id exchange, window, or
    * corpus-wide distinct (optimization guide §2.4).
    */
  def distinctShingles(toks: Column): Column =
    ExpressionUtils.column(DistinctShinglesExpr(
      ExpressionUtils.expression(toks)))

  /** Per-document composite winnow-key array over a token array. */
  def winnowEk(toks: Column, hexChars: Int, posField: Long): Column =
    ExpressionUtils.column(WinnowEkExpr(
      ExpressionUtils.expression(toks), hexChars, posField))

  /** Winnow selection (distinct window minima / F) over an ek array. */
  def winnowMinSelect(ek: Column, w: Int, posField: Long): Column =
    ExpressionUtils.column(WinnowMinSelectExpr(
      ExpressionUtils.expression(ek), w, posField))

  /** Dot of a float-array column against a fixed double-array weight
    * vector (hyperplane projections): two expression nodes instead of a
    * ~4×64-term Add chain, whose deep tree cost shows up in every
    * planning/codegen pass.
    */
  def floatDotWeights(a: Column, weights: Array[Double]): Column =
    ExpressionUtils.column(FloatDoubleVecDot(
      ExpressionUtils.expression(a),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        weights, ArrayType(DoubleType))))

  /** Column form of [[FloatDoubleVecDot]] — float-array × double-array
    * sequential fold (e.g. an embedding against a computed centroid).
    */
  def floatDoubleVecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatDoubleVecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Spark's native bloom-filter aggregate (the machinery behind its
    * runtime join filters), exposed as a Column: builds ONE sketch over
    * `xxhash64(c)` with full partial-aggregation — the sketch, never the
    * key set, crosses the wire. Deterministic for a given key set and
    * sizing, so a gate built on it is stable across runs/partitionings.
    */
  def bloomAgg(c: Column, expectedItems: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          ExpressionUtils.expression(
            org.apache.spark.sql.functions.xxhash64(c)),
          math.max(expectedItems, 1L))
        .toAggregateExpression())

  /** [[bloomAgg]] with an explicit bit budget — the false-positive
    * dial (bits/key ≈ 20 ⇒ fpp ≈ 7·10⁻⁵ vs the default sizing's 3%).
    * Deterministic for a given key set and sizing (xxhash64 inside),
    * so gates built on it are stable across runs and partitionings.
    */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          ExpressionUtils.expression(
            org.apache.spark.sql.functions.xxhash64(c)),
          org.apache.spark.sql.catalyst.expressions.Literal(
            math.max(expectedItems, 1L)),
          org.apache.spark.sql.catalyst.expressions.Literal(
            math.max(numBits, 64L)))
        .toAggregateExpression())

  /** Per-row PQ argmin over a driver-collected codebook
    * ([[graft.functions.PqKernel.argmins]]): array of
    * (winning candidate index, rounded distance) structs, one per
    * subspace — the codegen'd replacement for the codebook crossJoin +
    * per-(vector, subspace) argmin (guide §4; see [[PqArgminExpr]]).
    */
  def pqArgmin(emb: Column, book: graft.functions.PqKernel.Book): Column =
    ExpressionUtils.column(PqArgminExpr(
      ExpressionUtils.expression(emb), book))

  /** Membership probe against a serialized [[bloomAgg]] sketch — the
    * codegen'd `BloomFilterMightContain`, never a UDF. No false
    * negatives: a key that was added always probes true.
    */
  def bloomMightContain(bloomBytes: Array[Byte], c: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(bloomBytes, BinaryType),
        ExpressionUtils.expression(
          org.apache.spark.sql.functions.xxhash64(c))))
}

/** Σ (double)a[i] * w[i], sequential — same association order as the
  * left-assoc `a[1]*w1 + a[2]*w2 + …` SQL chain the oracle uses.
  */
case class FloatDoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.VecOps.dotFloatDouble(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dotFloatDouble($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatDoubleVecDot = copy(left = newLeft, right = newRight)
  override def prettyName: String = "float_double_vec_dot"
}

/** Sequential left-fold dot product of two float arrays in double —
  * the codegen'd replacement for `aggregate(zip_with(a, b, _*_), 0d, _+_)`,
  * whose lambda interpretation costs ~µs/element and, worse, gets
  * duplicated into join residual conditions. Bit-identical result
  * (same products, same left-to-right additions in double), so DuckDB
  * `list_reduce` oracles are unchanged. Degenerate inputs also mirror
  * the HOF form exactly — unequal lengths or a null element yield null
  * (zip_with pads with null, which poisons the fold) — so
  * [[FloatDotRewrite]] can match globally without changing user results.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  // null even for non-null children (length mismatch / null element)
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.VecOps.dotFloat(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""java.lang.Double $boxed = graft.functions.VecOps.dotFloat($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatVecDot = copy(left = newLeft, right = newRight)
  override def prettyName: String = "float_vec_dot"
}

/** Codegen'd polynomial rolling hash over code points
  * ([[graft.functions.TextHash.rollingHash]]) — the per-document
  * fingerprint primitive; exact BIGINT twin exists in DuckDB.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(v: Any): Any =
    graft.functions.TextHash.rollingHash(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.rollingHash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

/** Sequential left-fold dot product of two long arrays — exact integer
  * sum, identical to the `aggregate(zip_with(a, b, _*_), 0L, _+_)` HOF
  * fold it replaces in s27's hot path (and to DuckDB `list_reduce`);
  * unequal lengths or a null element yield null, mirroring the HOF
  * form's null-poisoned fold.
  */
case class LongVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType),
      ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  // null even for non-null children (length mismatch / null element)
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.VecOps.dotLong(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""java.lang.Long $boxed = graft.functions.VecOps.dotLong($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongVecDot = copy(left = newLeft, right = newRight)
  override def prettyName: String = "long_vec_dot"
}

/** Codegen'd per-row PQ argmin over a driver-collected quantizer-bounded
  * codebook ([[graft.functions.PqKernel]]) — one static call per row,
  * so the embeddings projection stays inside whole-stage codegen while
  * the kernel loops over primitive codeword arrays. Replaces the
  * codebook crossJoin + per-(vector, subspace) argmin, whose exchange
  * deduped nothing (each group came from one input row).
  */
case class PqArgminExpr(child: Expression,
    book: graft.functions.PqKernel.Book)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(v: Any): Any =
    graft.functions.PqKernel.argmins(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], book)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("pqBook", book)
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernel.argmins($c, $b)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqArgminExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_argmin"
}

/** Codegen'd per-document distinct 3-gram shingles
  * ([[graft.functions.ShingleKernel.distinctShingles]]) — one static
  * call per row, so the documents projection stays inside whole-stage
  * codegen while the kernel runs a hash-set loop over the token array.
  */
case class DistinctShinglesExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    graft.functions.ShingleKernel.distinctShingles(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleKernel.distinctShingles($c)")
  override protected def withNewChildInternal(newChild: Expression): DistinctShinglesExpr =
    copy(child = newChild)
  override def prettyName: String = "distinct_shingles"
}

/** Codegen'd per-document winnow keys: the composite
  * `h·F + (F−1−min(pos, F−1))` array over 3-gram shingle md5 prefixes
  * of a token array ([[graft.functions.WinnowKernel.ekArray]]) — one
  * static call per row, so the documents projection stays inside
  * whole-stage codegen while the kernel runs primitive-long loops.
  */
case class WinnowEkExpr(child: Expression, hexChars: Int, posField: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    graft.functions.WinnowKernel.ekArray(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      hexChars, posField)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowKernel.ekArray($c, $hexChars, ${posField}L)")
  override protected def withNewChildInternal(newChild: Expression): WinnowEkExpr =
    copy(child = newChild)
  override def prettyName: String = "winnow_ek"
}

/** Codegen'd winnow selection at width `w` over a precomputed ek array
  * ([[graft.functions.WinnowKernel.select]]): distinct full-window
  * minima / F, sorted. Splitting ek from selection lets the d33 sweep
  * hash each shingle ONCE and select at three widths per row.
  */
case class WinnowMinSelectExpr(child: Expression, w: Int, posField: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    graft.functions.WinnowKernel.select(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      w, posField)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowKernel.select($c, $w, ${posField}L)")
  override protected def withNewChildInternal(newChild: Expression): WinnowMinSelectExpr =
    copy(child = newChild)
  override def prettyName: String = "winnow_min_select"
}

/** Codegen'd md5-hex via [[graft.functions.FastMd5.hexOf]] (thread-local
  * digest reuse instead of per-row `MessageDigest.getInstance`).
  */
case class FastMd5Expr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    graft.functions.FastMd5.hexOf(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastMd5.hexOf($c)")
  override protected def withNewChildInternal(newChild: Expression): FastMd5Expr =
    copy(child = newChild)
  override def prettyName: String = "fast_md5"
}
