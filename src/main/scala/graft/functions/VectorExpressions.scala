package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the ANN hot path.
  *
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` is semantically
  * right but executes on the interpreted higher-order-function path: per
  * element it allocates lambda-variable rows and boxes every product.
  * At P candidate pairs × d dims that interpreter overhead dominates the
  * whole similarity query. This expression is the same left-to-right
  * float64 summation as a tight Java loop inside whole-stage codegen
  * (`doGenCode`), with an identical interpreted fallback (`nullSafeEval`).
  *
  * Null/shape semantics mirror the fold formulation exactly: null array →
  * null; mismatched lengths or a null element → null (zip_with pads the
  * shorter side with null and `null * x` poisons the double sum); empty
  * arrays → 0.0 (the fold seed).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

/** [[DotProductFloat]] generalized to MIXED element types: each side is
  * `array<float>` or `array<double>`, summed left-to-right in float64 —
  * the shape the classification operators hit (float corpus vectors ×
  * double centroid means). Bit-identical to the fold formulation
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _+_)` ([[graft.operators.Knn.dot]]), including its null/shape
  * semantics: null array → null; length mismatch or null element →
  * null; empty arrays → 0.0.
  */
case class DotProductMixed(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType) = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      def get(arr: String, idx: String, f: Boolean) =
        if (f) s"((double) $arr.getFloat($idx))" else s"$arr.getDouble($idx)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${get(a, i, isFloat(left))} * ${get(b, i, isFloat(right))};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductMixed =
    copy(left = newLeft, right = newRight)
}

/** Registration for the engine's native expressions.
  *
  * Two equivalent entry points:
  *   - `GraftFunctions.register(spark)` — imperative, used by the Knn/Dedup
  *     operators on first use (idempotent);
  *   - `GraftSparkExtensions` — `SparkSessionExtensions` injector for
  *     `spark.sql.extensions=graft.functions.GraftSparkExtensions`, the
  *     deployment-config path.
  *
  * Either way the function is invoked through the public
  * `functions.call_function`, never a private Column constructor.
  */
object GraftFunctions {
  val DotName = "graft_dot_f32"
  val DotMixedName = "graft_dot"
  val NGramsName = "graft_word_ngrams"
  val MinHashName = "graft_minhash_sig"

  private def binary(name: String, clazz: Class[_],
      mk: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), {
      case Seq(a, b) => mk(a, b)
      case exprs => throw new IllegalArgumentException(
        s"$name expects 2 arguments, got ${exprs.length}")
    })

  val SimHashName = "graft_simhash"
  val SrpBucketName = "graft_srp_bucket"
  val CharNGramsName = "graft_char_ngrams"
  val CleanTextName = "graft_clean_text"
  val RobotsMatchName = "graft_robots_match"

  private def unary(name: String, clazz: Class[_],
      mk: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), {
      case Seq(a) => mk(a)
      case exprs => throw new IllegalArgumentException(
        s"$name expects 1 argument, got ${exprs.length}")
    })

  private def ternary(name: String, clazz: Class[_],
      mk: (Expression, Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), {
      case Seq(a, b, c) => mk(a, b, c)
      case exprs => throw new IllegalArgumentException(
        s"$name expects 3 arguments, got ${exprs.length}")
    })

  val WinnowName = "graft_winnow"
  val UnigramSegName = "graft_unigram_segment"
  val MultiMatchName = "graft_multi_match"
  val MultiRedactName = "graft_multi_redact"
  val SpanHashesName = "graft_span_hashes"
  val SpanHashes2Name = "graft_span_hashes2"

  def injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    binary(DotName, classOf[DotProductFloat], DotProductFloat.apply),
    binary(DotMixedName, classOf[DotProductMixed], DotProductMixed.apply),
    binary(SpanHashesName, classOf[SpanHashesExpr], SpanHashesExpr.apply),
    binary(SpanHashes2Name, classOf[SpanHashes2Expr], SpanHashes2Expr.apply),
    binary(NGramsName, classOf[WordNGramsExpr], WordNGramsExpr.apply),
    binary(MinHashName, classOf[MinHashSigExpr], MinHashSigExpr.apply),
    binary(SimHashName, classOf[SimHashExpr], SimHashExpr.apply),
    binary(SrpBucketName, classOf[SrpBucketExpr], SrpBucketExpr.apply),
    binary(CharNGramsName, classOf[CharNGramsExpr], CharNGramsExpr.apply),
    binary(RobotsMatchName, classOf[RobotsMatchExpr], RobotsMatchExpr.apply),
    unary(CleanTextName, classOf[CleanTextExpr], CleanTextExpr.apply),
    ternary(WinnowName, classOf[WinnowExpr], WinnowExpr.apply),
    ternary(UnigramSegName, classOf[UnigramSegExpr], UnigramSegExpr.apply),
    binary(MultiMatchName, classOf[MultiMatchExpr], MultiMatchExpr.apply),
    ternary(MultiRedactName, classOf[MultiRedactExpr],
      MultiRedactExpr.apply))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (ident, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident)) {
        spark.sessionState.functionRegistry
          .registerFunction(ident, info, builder)
      }
    }

  /** Codegen'd float32 dot product (requires `register`/extensions). */
  def dotF32(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** Codegen'd mixed float/double dot product — bit-identical to the
    * `Knn.dot` fold formulation (requires `register`/extensions).
    */
  def dotMixed(a: Column, b: Column): Column =
    call_function(DotMixedName, a, b)

  /** Native n-gram windows over a words array (requires `register`). */
  def wordNGrams(words: Column, n: Int): Column =
    call_function(NGramsName, words, org.apache.spark.sql.functions.lit(n))

  /** Native k-permutation MinHash over token hashes (requires `register`). */
  def minHashSig(hashes: Column, k: Int): Column =
    call_function(MinHashName, hashes, org.apache.spark.sql.functions.lit(k))

  /** Native one-pass SimHash over token hashes (requires `register`). */
  def simHash(hashes: Column, bits: Int): Column =
    call_function(SimHashName, hashes, org.apache.spark.sql.functions.lit(bits))

  /** RFC 9309 §2.2.3 rule match — `*`/`$` wildcards, prefix otherwise
    * (requires `register`).
    */
  def robotsMatch(path: Column, pattern: Column): Column =
    call_function(RobotsMatchName, path, pattern)

  /** Native sign-random-projection LSH bucket against literal hyperplanes
    * (requires `register`).
    */
  def srpBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    call_function(SrpBucketName, vec,
      org.apache.spark.sql.functions.typedLit(planes))

  /** Native char n-gram windows over a string (requires `register`). */
  def charNGrams(str: Column, n: Int): Column =
    call_function(CharNGramsName, str, org.apache.spark.sql.functions.lit(n))

  /** Native one-pass text canonicalization: NFC + control strip +
    * whitespace collapse + trim (requires `register`).
    */
  def cleanText(str: Column): Column = call_function(CleanTextName, str)

  /** Native one-pass rolling span hashes over a words array (requires
    * `register`).
    */
  def spanHashes(words: Column, width: Int): Column =
    call_function(SpanHashesName, words,
      org.apache.spark.sql.functions.lit(width))

  /** The independent second rolling stream — cross-document span keys
    * are the (stream-1, stream-2) pair (requires `register`).
    */
  def spanHashes2(words: Column, width: Int): Column =
    call_function(SpanHashes2Name, words,
      org.apache.spark.sql.functions.lit(width))

  /** Native one-pass winnowing fingerprints over a string (requires
    * `register`).
    */
  def winnow(str: Column, k: Int, w: Int): Column =
    call_function(WinnowName, str,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))

  /** Native unigram-LM Viterbi segmentation under a literal piece table
    * (requires `register`). `pieces`/`logprobs` are parallel.
    */
  def unigramSegment(str: Column, pieces: Seq[String],
                     logprobs: Seq[Double]): Column =
    call_function(UnigramSegName, str,
      org.apache.spark.sql.functions.typedlit(pieces),
      org.apache.spark.sql.functions.typedlit(logprobs))

  /** Native Aho–Corasick per-pattern occurrence counts under a literal
    * pattern list (requires `register`).
    */
  def multiMatch(str: Column, patterns: Seq[String]): Column =
    call_function(MultiMatchName, str,
      org.apache.spark.sql.functions.typedlit(patterns))

  /** Native Aho–Corasick span redaction under a literal pattern list
    * (requires `register`).
    */
  def multiRedact(str: Column, patterns: Seq[String],
                  mask: Char = '*'): Column =
    call_function(MultiRedactName, str,
      org.apache.spark.sql.functions.typedlit(patterns),
      org.apache.spark.sql.functions.lit(mask.toString))
}

/** `spark.sql.extensions` injector (config-driven deployments): the
  * native function registry plus the fold→kernel optimizer rule.
  */
class GraftSparkExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.NativeDotRewrite)
  }
}
