package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns.
  *
  * The composable form (`zip_with` + `aggregate` lambdas) allocates and
  * interprets per element — ~50× slower on 64-dim vectors. This is a
  * single fused loop over the primitive float arrays, with whole-stage
  * codegen emitting the same loop inline. Accumulation order (index 0→n
  * in double precision) is identical to the lambda formulation and to
  * external oracles, so results are bit-equal.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $a.getFloat($i);
          double $yi = (double) $b.getFloat($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Sign-random-projection signature as a native expression: bit i of the
  * result is the sign of ⟨v, h_i⟩ for deterministic ±1 hyperplanes
  * (md5-derived, see [[SrpSignature.signsFor]]). One fused loop instead
  * of nBits interpreted `aggregate(zip_with(...))` folds per row.
  */
case class SrpSignature(child: Expression, signs: Array[Array[Int]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "srp_sig"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var sig = 0L
    var i = 0
    while (i < signs.length) {
      val plane = signs(i)
      val n = math.min(x.numElements(), plane.length)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += x.getFloat(j).toDouble * plane(j); j += 1 }
      if (dot > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signs", signs, "int[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val plane = ctx.freshName("plane"); val sig = ctx.freshName("sig")
      s"""
        long $sig = 0L;
        for (int $i = 0; $i < $signsRef.length; $i++) {
          int[] $plane = $signsRef[$i];
          int $n = java.lang.Math.min($a.numElements(), $plane.length);
          double $dot = 0.0;
          for (int $j = 0; $j < $n; $j++) {
            $dot += ((double) $a.getFloat($j)) * $plane[$j];
          }
          if ($dot > 0) $sig |= 1L << $i;
        }
        ${ev.value} = $sig;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

object SrpSignature {
  /** Deterministic ±1 hyperplanes: sign = parity of md5("table:plane:dim")
    * — stable across engines and releases, no RNG state to ship.
    */
  def signsFor(dim: Int, nBits: Int, table: Int): Array[Array[Int]] =
    Array.tabulate(nBits, dim) { (i, j) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$table:$i:$j".getBytes("UTF-8"))
      if ((hex(0) & 1) == 0) 1 else -1
    }
}

object VectorFunctions {
  val Name = "cosine_sim"
  val SrpName = "srp_sig"

  private def srpBuilder(exprs: Seq[Expression]): Expression = {
    def intArg(e: Expression): Int =
      e.eval(null).asInstanceOf[Number].intValue()
    SrpSignature(exprs(0),
      SrpSignature.signsFor(intArg(exprs(1)), intArg(exprs(2)), intArg(exprs(3))))
  }

  private[functions] def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    Name -> (exprs => CosineSim(exprs(0), exprs(1))),
    SrpName -> srpBuilder,
    // aggregates: the analyzer wraps AggregateFunction results in an
    // AggregateExpression automatically on resolution
    "kmv_bottomk" -> (exprs => KmvBottomK(exprs(0),
      exprs(1).eval(null).asInstanceOf[Number].intValue())),
    "simhash_sig" -> (exprs => SimhashSig(exprs(0))))

  /** Idempotent per-session registration (temp functions). Sessions built
    * through [[GraftExtensions]] get them injected; this covers foreign
    * sessions handed to the library.
    */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      val reg = spark.sessionState.functionRegistry
      // skip if present: createOrReplace on an existing name logs a WARN
      // per call, which pollutes the bench/verify stdout the driver parses
      if (!reg.functionExists(
          new org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }

  /** Column API for [[CosineSim]] (requires registration, see above). */
  def cosineSim(a: Column, b: Column): Column = call_function(Name, a, b)

  /** Column API for [[SrpSignature]]: dim/nBits/table must be literals. */
  def srpSig(emb: Column, dim: Int, nBits: Int, table: Int): Column =
    call_function(SrpName, emb, lit(dim), lit(nBits), lit(table))

  /** Column API for [[KmvBottomK]] (aggregate; k must be a literal). */
  def kmvBottomK(h: Column, k: Int): Column =
    call_function("kmv_bottomk", h, lit(k))

  /** Column API for [[SimhashSig]] (aggregate). */
  def simhashSig(h: Column): Column = call_function("simhash_sig", h)
}

/** SparkSessionExtensions hook: `.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.functions.GraftExtensions` makes the
  * engine's native functions available in any session, including SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    VectorFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSim].getName, name),
        b))
    }
    e.injectOptimizerRule(_ => BoundedLevenshteinRule)
  }
}
