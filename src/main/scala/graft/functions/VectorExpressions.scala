package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the dense dot product of two
  * `array<double>` columns.
  *
  * Why a custom Expression (SURVEY.md §7.3's "only if bench demands"
  * case — it did): the composable form
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` is a higher-order
  * function, which Catalyst evaluates INTERPRETED — per-element
  * closure dispatch, boxed lambda variables, an allocated
  * intermediate array — and it sits in the innermost loop of every
  * similarity operator (n² pairs × 64 dims). This expression emits a
  * tight primitive loop via `doGenCode` and participates in
  * whole-stage codegen; it cut the embedding near-dup benchmark ~10×.
  *
  * Semantics — EXACTLY those of the HOF form (so
  * [[RewriteHofDotProduct]] may substitute this expression
  * unconditionally):
  *  - multiply-add left-to-right over indices 0..n-1 (same fold
  *    order → bit-identical doubles);
  *  - a null array yields null;
  *  - unequal lengths yield null (zip_with pads the shorter side
  *    with null, so some product — and the fold — is null);
  *  - a null element yields null (null propagates through × and +).
  */
final case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true // null elements / length mismatch

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product_double expects two array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product_double"
}

/** Integer dot of two SQ8 code arrays (`array<tinyint>`, the codes
  * stored SHIFTED by −128 so [0,255] quantization levels fit a
  * tinyint): Σ (x_i + 128)·(y_i + 128), as INT — the per-pair kernel
  * of the SQ8 pre-screen inside IVF cells
  * (graft.ext.Similarity.cellPairsIndexedScreened). Max value
  * 64·255² ≈ 4.2M per 64-dim pair, far inside Int. Codegen'd tight
  * byte loop: the point of the screen is that this runs on 1/8th the
  * memory traffic of the 8-byte-per-element exact double dot.
  */
final case class Sq8DotU(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq8_dot_u expects two array<tinyint> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += (x.getByte(i) + 128) * (y.getByte(i) + 128)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $acc = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (((int) $a.getByte($i)) + 128) * (((int) $b.getByte($i)) + 128);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8DotU =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sq8_dot_u"
}

object VectorExpressions {

  /** Column wrapper: codegen'd dot product of two `array<double>`s.
    * Resolves through the session function registry, so the session
    * must be built with [[GraftExtensions]]
    * (`spark.sql.extensions=graft.functions.GraftExtensions`).
    */
  def dotd(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_product_double", a, b)

  /** Column wrapper: codegen'd SQ8 code dot (see [[Sq8DotU]]). */
  def sq8DotU(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("sq8_dot_u", a, b)
}

/** Engine extension entry point — the public mechanism for native
  * expressions (SparkSessionExtensions; set
  * `spark.sql.extensions=graft.functions.GraftExtensions` on the
  * session builder). Registered functions participate in SQL
  * passthrough too: `SELECT dot_product_double(a, b)` works.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectFunction((
      new FunctionIdentifier("dot_product_double"),
      new ExpressionInfo(classOf[DotProductDouble].getName, "dot_product_double"),
      (children: Seq[Expression]) => DotProductDouble(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("sq8_dot_u"),
      new ExpressionInfo(classOf[Sq8DotU].getName, "sq8_dot_u"),
      (children: Seq[Expression]) => Sq8DotU(children(0), children(1))))
    // word_ngrams(tokens, n) — the codegen'd shingling primitive
    // (n must be a foldable integer literal; it parameterizes the
    // generated loop).
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable,
          "word_ngrams(tokens, n) requires a literal n")
        val n = children(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"word_ngrams n must be an integer literal, got $other")
        }
        WordNgrams(children(0), n)
      }))
    // log_bucket_median(x, alpha) / log_bucket_quantile(x, alpha, q)
    // — deterministic mergeable quantile sketch (DDSketch bucket
    // layout); alpha and q parameterize the bucket base and the rank,
    // so they must be foldable literals.
    def numLit(e: Expression, what: String): Double = {
      require(e.foldable, s"$what must be a literal")
      e.eval() match {
        case d: Double => d
        case f: Float => f.toDouble
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case other => throw new IllegalArgumentException(
          s"$what must be a numeric literal, got $other")
      }
    }
    // numeric inputs are welcome: cast to double at build (the
    // aggregate itself is monomorphic on DOUBLE)
    def asDouble(e: Expression): Expression =
      org.apache.spark.sql.catalyst.expressions.Cast(
        e, org.apache.spark.sql.types.DoubleType)
    ext.injectFunction((
      new FunctionIdentifier("log_bucket_median"),
      new ExpressionInfo(classOf[LogBucketQuantileAgg].getName, "log_bucket_median"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "log_bucket_median(x, alpha) takes two arguments")
        LogBucketQuantileAgg(asDouble(children(0)),
          numLit(children(1), "log_bucket_median alpha"), q = 0.5)
      }))
    ext.injectFunction((
      new FunctionIdentifier("log_bucket_quantile"),
      new ExpressionInfo(classOf[LogBucketQuantileAgg].getName, "log_bucket_quantile"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "log_bucket_quantile(x, alpha, q) takes three arguments")
        LogBucketQuantileAgg(asDouble(children(0)),
          numLit(children(1), "log_bucket_quantile alpha"),
          numLit(children(2), "log_bucket_quantile q"))
      }))
    // cosine_similarity(a, b) — composed from the native dot product;
    // the whole tree stays inside codegen.
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[DotProductDouble].getName, "cosine_similarity"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        val (a, b) = (children(0), children(1))
        Divide(DotProductDouble(a, b),
          Multiply(Sqrt(DotProductDouble(a, a)), Sqrt(DotProductDouble(b, b))))
      }))
  }
}
