package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression: dot product of two ArrayType(DoubleType)
  * columns with whole-stage codegen (a tight primitive loop — no per-element
  * lambda dispatch, no boxing). This is the §2.11 "custom Expression beats
  * UDF beats interpreted higher-order function" extension point: the
  * similarity-search operators call it ~12M times per bench run.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: the j-th member of a multiply-shift hash
  * permutation family over a 64-bit hash. `(h ^ seed*phi) * (2*seed+1)` in
  * wrapping Java arithmetic — a bijection mod 2^64, which is exactly what a
  * MinHash permutation needs — with full codegen. Exists because ANSI mode
  * (Spark 4 default) rejects overflowing `*`/`+` in SQL expressions, and
  * per-seed xxhash64 re-hashing costs ~10x more in the signature aggregate.
  */
case class PermuteHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"permute_hash requires (BIGINT, INT), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "permute_hash"

  private final val Phi = -0x61c8864680b583ebL // 2^64 / golden ratio, odd

  override def nullSafeEval(h: Any, j: Any): Any = {
    val seed = j.asInstanceOf[Int]
    (h.asInstanceOf[Long] ^ (seed * Phi)) * (2L * seed + 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, j) =>
      s"${ev.value} = ($h ^ ((long) $j * ${Phi}L)) * (2L * $j + 1L);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PermuteHash =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: Hamming distance between two
  * ArrayType(IntegerType) bit-vector columns (count of positions that
  * differ over the common prefix) with whole-stage codegen. The SimHash
  * verify step runs this once per candidate pair — as an interpreted
  * `aggregate(zip_with(...))` lambda chain it was the one non-codegen
  * fragment in the near-dup hot path.
  */
case class BitsHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bits_hamming requires two ARRAY<INT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bits_hamming"

  // a NULL element can never equal anything → counts as a differing
  // position, matching the zip_with(CASE WHEN x = y ...) formulation this
  // expression replaced (and never calling getInt on a null slot, which is
  // undefined behavior on ArrayData)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var d = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i) || x.getInt(i) != y.getInt(i)) d += 1
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("diff")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $d = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i) ||
         |      $a.getInt($i) != $b.getInt($i)) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsHamming =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: fused nearest-centroid argmax against a
  * LITERAL codebook — `argmax_cell(vd, nrm, cells, cnrms, ids)` returns the
  * id of the centroid maximizing `vec_dot(vd, cells[c]) / (nrm * cnrms[c])`
  * (cosine; ties and NaN resolved by `Double.compare` total order with the
  * FIRST maximal cell winning — bit-identical to the
  * `array_max(array(struct(acos, -cell)...))` formulation it replaced).
  *
  * Exists because the struct/array_max formulation, though whole-stage
  * codegen'd, ran ~1000× slower than a primitive loop (measured 12 s for
  * 60k rows × 64 cells × 64 dims on 32 cores — per-row materialization of a
  * 64-struct array plus non-primitive max ordering; the fused loop runs the
  * same 245M multiplies in <0.3 s). This is THE inner loop of scoring a
  * 100 TB corpus against a k-means codebook, and of every k-means training
  * iteration, so it must be a tight primitive loop.
  *
  * The codebook children must be foldable (literals after constant folding);
  * they are extracted ONCE into primitive `double[][]`/`double[]`/`int[]`
  * reference objects — never re-materialized per row.
  */
case class ArgmaxCell(children: Seq[Expression]) extends Expression {
  private def vd = children(0)
  private def nrm = children(1)

  override def checkInputDataTypes(): TypeCheckResult = {
    def isDA(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }
    val shapeOk = children.length == 5 && isDA(vd.dataType) &&
      nrm.dataType == DoubleType &&
      (children(2).dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => true; case _ => false
      }) && isDA(children(3).dataType) &&
      (children(4).dataType match {
        case ArrayType(IntegerType, _) => true; case _ => false
      })
    if (!shapeOk)
      TypeCheckResult.TypeCheckFailure(
        "argmax_cell requires (ARRAY<DOUBLE>, DOUBLE, ARRAY<ARRAY<DOUBLE>>, " +
          "ARRAY<DOUBLE>, ARRAY<INT>)")
    else if (!children.drop(2).forall(_.foldable))
      TypeCheckResult.TypeCheckFailure(
        "argmax_cell codebook arguments (cells, cnrms, ids) must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val (cellsArr, cnrmsArr, idsArr) = {
    val ca = children(2).eval(null).asInstanceOf[ArrayData]
    val cells = Array.tabulate(ca.numElements())(i => ca.getArray(i).toDoubleArray())
    val cns = children(3).eval(null).asInstanceOf[ArrayData].toDoubleArray()
    val ids = children(4).eval(null).asInstanceOf[ArrayData].toIntArray()
    require(cells.length > 0 && cells.length == cns.length && cells.length == ids.length,
      s"argmax_cell codebook arity mismatch: ${cells.length} cells, " +
        s"${cns.length} norms, ${ids.length} ids")
    (cells, cns, ids)
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = vd.nullable || nrm.nullable
  override def prettyName: String = "argmax_cell"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vdv = vd.eval(input)
    val nrmv = nrm.eval(input)
    if (vdv == null || nrmv == null) null
    else {
      val xs = vdv.asInstanceOf[ArrayData]
      val nr = nrmv.asInstanceOf[Double]
      var best = -1
      var bestV = 0.0
      var c = 0
      while (c < cellsArr.length) {
        val cv = cellsArr(c)
        val n = math.min(cv.length, xs.numElements())
        var s = 0.0
        var j = 0
        while (j < n) { s += cv(j) * xs.getDouble(j); j += 1 }
        val acos = s / (nr * cnrmsArr(c))
        if (best < 0 || java.lang.Double.compare(acos, bestV) > 0) {
          best = c; bestV = acos
        }
        c += 1
      }
      idsArr(best)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vdCode = vd.genCode(ctx)
    val nrmCode = nrm.genCode(ctx)
    val cellsRef = ctx.addReferenceObj("cells", cellsArr, "double[][]")
    val cnrmsRef = ctx.addReferenceObj("cnrms", cnrmsArr, "double[]")
    val idsRef = ctx.addReferenceObj("ids", idsArr, "int[]")
    val (best, bestV, c, cv, n, s, j, acos) = (ctx.freshName("best"),
      ctx.freshName("bestV"), ctx.freshName("c"), ctx.freshName("cv"),
      ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("j"),
      ctx.freshName("acos"))
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
        ${vdCode.code}
        ${nrmCode.code}
        boolean ${ev.isNull} = ${vdCode.isNull} || ${nrmCode.isNull};
        int ${ev.value} = -1;
        if (!${ev.isNull}) {
          int $best = -1;
          double $bestV = 0.0;
          for (int $c = 0; $c < $cellsRef.length; $c++) {
            double[] $cv = $cellsRef[$c];
            int $n = java.lang.Math.min($cv.length, ${vdCode.value}.numElements());
            double $s = 0.0;
            for (int $j = 0; $j < $n; $j++) {
              $s += $cv[$j] * ${vdCode.value}.getDouble($j);
            }
            double $acos = $s / (${nrmCode.value} * $cnrmsRef[$c]);
            if ($best < 0 || java.lang.Double.compare($acos, $bestV) > 0) {
              $best = $c; $bestV = $acos;
            }
          }
          ${ev.value} = $idsRef[$best];
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgmaxCell =
    copy(children = newChildren)
}

/** Native Catalyst expression: Bloom-filter membership probe of a 64-bit key
  * against a CONSTANT serialized `org.apache.spark.util.sketch.BloomFilter`
  * (the format `DataFrameStatFunctions.bloomFilter` produces). The filter
  * bytes arrive as a foldable BinaryType child, deserialize ONCE per plan
  * (lazily, on driver and on each executor from the shipped literal), and
  * codegen references the live filter object — so the probe runs inside
  * whole-stage codegen like every other hot-path predicate. Exists because
  * Spark has no public Column function for Bloom membership (its
  * `BloomFilterMightContain` is internal to runtime join-filter injection);
  * this replaced the engine's one hot-path ScalaUDF
  * ([[graft.api.Text.contaminationBloom]]).
  *
  * The filter rides the PLAN (a literal), not a broadcast variable — right
  * for decontamination, where the eval-gram filter is small by contract;
  * genuinely huge filters should go back to an explicit broadcast.
  */
case class BloomProbe(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && left.foldable &&
        right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_probe requires (constant BINARY, BIGINT), got " +
        s"${left.dataType.simpleString} (foldable=${left.foldable}) and " +
        s"${right.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_probe filter bytes must be a non-null literal")
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  // override eval (not nullSafeEval): BinaryExpression's null short-circuit
  // would silently return null for a NULL filter literal on the interpreted
  // path while codegen fails loudly in doGenCode — force the filter FIRST
  // so both paths surface the misuse identically
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val f = filter
    val g = right.eval(input)
    if (g == null) null else f.mightContainLong(g.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    // generate ONLY the gram child: nullSafeCodeGen would also emit the
    // foldable filter literal, putting the raw bytes in the codegen
    // references array NEXT TO the deserialized filter they already became —
    // every task binary would carry the filter twice. The serialized bytes
    // still live once in the expression tree (they are the left child); the
    // generated code needs only the live object.
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val g = right.genCode(ctx)
    ev.copy(code =
      code"""
            |${g.code}
            |boolean ${ev.isNull} = ${g.isNull};
            |boolean ${ev.value} = false;
            |if (!${ev.isNull}) {
            |  ${ev.value} = $bfRef.mightContainLong(${g.value});
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  val dotBuilder: Seq[Expression] => Expression = exprs => VecDot(exprs(0), exprs(1))
  val permuteBuilder: Seq[Expression] => Expression =
    exprs => PermuteHash(exprs(0), exprs(1))
  val hammingBuilder: Seq[Expression] => Expression =
    exprs => BitsHamming(exprs(0), exprs(1))
  val argmaxCellBuilder: Seq[Expression] => Expression = exprs => ArgmaxCell(exprs)
  val bloomProbeBuilder: Seq[Expression] => Expression =
    exprs => BloomProbe(exprs(0), exprs(1))

  /** Runtime registration on a live session (used by the query builders). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "permute_hash", permuteBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bits_hamming", hammingBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "argmax_cell", argmaxCellBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_probe", bloomProbeBuilder, "built-in")
  }
}

/** Session-builder registration (`SparkSession.builder.withExtensions(new
  * GraftExtensions)`) — the deployment-grade injection path; the runtime
  * `VectorFunctions.register` exists because the driver harness constructs
  * its own plain session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      VectorFunctions.dotBuilder))
    e.injectFunction((
      FunctionIdentifier("permute_hash"),
      new ExpressionInfo(classOf[PermuteHash].getName, "permute_hash"),
      VectorFunctions.permuteBuilder))
    e.injectFunction((
      FunctionIdentifier("bits_hamming"),
      new ExpressionInfo(classOf[BitsHamming].getName, "bits_hamming"),
      VectorFunctions.hammingBuilder))
    e.injectFunction((
      FunctionIdentifier("argmax_cell"),
      new ExpressionInfo(classOf[ArgmaxCell].getName, "argmax_cell"),
      VectorFunctions.argmaxCellBuilder))
    e.injectFunction((
      FunctionIdentifier("bloom_probe"),
      new ExpressionInfo(classOf[BloomProbe].getName, "bloom_probe"),
      VectorFunctions.bloomProbeBuilder))
  }
}
