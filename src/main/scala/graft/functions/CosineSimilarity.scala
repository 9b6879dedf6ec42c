package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two DOUBLE arrays.
  *
  * Replaces the composed `aggregate(zip_with(...)) / (sqrt ∘ aggregate)²`
  * column (three higher-order-function evaluations and six array traversals
  * per row) with ONE fused loop that whole-stage codegen inlines — the hot
  * path of the embedding dedup/ANN operators, where it runs once per
  * candidate pair. Accumulation order is ascending index for all three
  * sums, identical to the sequential folds it replaces, so scores are
  * bit-compatible with the previous implementation and with DuckDB's
  * list_cosine_similarity on the same doubles.
  *
  * Semantics: null array → null; LENGTH MISMATCH → null (a truncated/
  * corrupt embedding must not produce a plausible prefix cosine that can
  * cross a dup threshold — the composed aggregate/zip_with column also
  * nulled out, and DuckDB's list_cosine_similarity errors); a NULL ELEMENT
  * → null (checks only emitted when the input types say `containsNull`, so
  * provably non-null arrays keep the branch-free hot loop); zero norm →
  * NaN (0/0), matching the composed-column behavior.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // lazy val: nullSafeEval consults this per ROW on interpreted paths —
  // a def would re-pattern-match the child types in the hot loop
  private lazy val elementsNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, n1), ArrayType(_, n2)) => n1 || n2
    case _ => true
  }

  // always nullable: a runtime LENGTH MISMATCH yields null regardless of
  // what the static types promise
  override def nullable: Boolean = true

  // strict array<double> inputs (no implicit cast injection — callers cast,
  // as every call site already does for float embeddings); null in → null
  // out via BinaryExpression's null-safe evaluation. INTENTIONALLY strict
  // about an untyped NULL literal too: cosine_sim(NULL, x) fails ANALYSIS
  // rather than silently typing the column — cast the literal
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var n1 = 0.0; var n2 = 0.0
    var i = 0
    if (elementsNullable) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; n1 += xi * xi; n2 += yi * yi
        i += 1
      }
    } else {
      while (i < n) {
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; n1 += xi * xi; n2 += yi * yi
        i += 1
      }
    }
    dot / (math.sqrt(n1) * math.sqrt(n2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val n1 = ctx.freshName("n1")
      val n2 = ctx.freshName("n2")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      // element null checks only when the types allow null elements (then
      // `nullable` is true and ev.isNull is a real variable); otherwise the
      // loop stays branch-free for codegen
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val assign =
        s"${ev.value} = $dot / (java.lang.Math.sqrt($n1) * java.lang.Math.sqrt($n2));"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $n1 = 0.0; double $n2 = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $n1 += $xi * $xi; $n2 += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) { $assign }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
