package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for word n-grams over a token array —
  * the per-row hot path of the whole text family (shingling feeds
  * every dedup operator, fingerprints, decontamination, span stats).
  *
  * Why a custom Expression (the same call as [[DotProductDouble]],
  * plan-shape rule SURVEY.md §8.4.3): the composable form
  *
  *   `transform(sequence(1, greatest(size(t) - (n-1), 1)),
  *              i => concat_ws(" ", slice(t, i, n)))`
  *
  * is a higher-order function chain that Catalyst evaluates
  * INTERPRETED — per-window closure dispatch, a materialized index
  * sequence, and a sliced COPY of the token array per window. This
  * expression emits one tight loop via `doGenCode` and participates
  * in whole-stage codegen.
  *
  * Semantics — those of the HOF form (Dedup.ngrams) on every
  * non-null input, so the substitution is invisible to every oracle
  * twin (all of which tokenize non-null text):
  *  - window count = max(len − n + 1, 1) — short docs yield ONE
  *    degenerate window (the whole array, truncated slice);
  *  - each gram joins its window's tokens with a single space,
  *    `concat_ws` style: null tokens are SKIPPED, an empty window
  *    yields the empty string (len = 0 → [""]).
  *
  * ONE deliberate divergence: a NULL token array yields NULL here
  * (standard null propagation), where the HOF form yields [""] — an
  * accident of `greatest` SKIPPING the null from `size(null)` so the
  * sequence still emits one index. No operator feeds null token
  * arrays (tokenization is unconditional), and null-in → null-out is
  * the semantics a SQL caller of `word_ngrams` expects.
  */
final case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects array<string>, got ${other.simpleString}")
  }

  private lazy val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val count = math.max(len - n + 1, 1)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, len)
      val parts = new Array[UTF8String](math.max(end - i, 0))
      var j = i
      while (j < end) {
        parts(j - i) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val count = ctx.freshName("count")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val parts = ctx.freshName("parts")
      val j = ctx.freshName("j")
      val u = classOf[UTF8String].getName
      s"""
         |int $len = $a.numElements();
         |int $count = java.lang.Math.max($len - ${n - 1}, 1);
         |Object[] $out = new Object[$count];
         |for (int $i = 0; $i < $count; $i++) {
         |  int $end = java.lang.Math.min($i + $n, $len);
         |  $u[] $parts = new $u[java.lang.Math.max($end - $i, 0)];
         |  for (int $j = $i; $j < $end; $j++) {
         |    $parts[$j - $i] = $a.isNullAt($j) ? null : $a.getUTF8String($j);
         |  }
         |  $out[$i] = $u.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object TextExpressions {

  /** Column wrapper: codegen'd word n-grams of an `array<string>`.
    * Resolves through the session function registry
    * ([[GraftExtensions]]), so it is equally callable from
    * passthrough SQL: `word_ngrams(tokens, 3)`.
    */
  def wordNgrams(tokens: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "word_ngrams", tokens, org.apache.spark.sql.functions.lit(n))
}
