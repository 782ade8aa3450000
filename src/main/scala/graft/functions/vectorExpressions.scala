package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two numeric-vector columns in double precision —
  * the scoring hot loop of every ANN / embedding-dedup operator. Native
  * eval: three tight JVM loops instead of per-element lambda interpretation
  * (the higher-order `zip_with`+`aggregate` formulation runs the SQL
  * interpreter 3*dim times per row).
  *
  * Accepts array<float> and array<double> on either side (mixed is fine):
  * elements are widened to double exactly as the HOF formulation's
  * `cast("double")` did, so scores stay bit-identical to both the previous
  * implementation and the DuckDB oracle twins.
  */
object CosineSim {
  /** null when dimensions differ or any element is null — matching the
    * zip_with(pad-with-null) + aggregate(null-propagating) formulation
    * this expression replaced. Boxed return so codegen can surface NULL.
    * `aDouble`/`bDouble` select the element accessor (float is widened).
    */
  def compute(a: ArrayData, b: ArrayData, aDouble: Boolean, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

/** Squared L2 distance of two numeric-vector columns in double precision —
  * the cell-assignment / probe-ranking metric of the IVF ANN path. Same
  * accumulation order as the HOF `aggregate(zip_with((p-q)^2))` fold, so
  * distances are bit-identical to that formulation.
  */
object L2Sq {
  def compute(a: ArrayData, b: ArrayData, aDouble: Boolean, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      val d = x - y
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: expected array<float|double> on both sides, got " +
        s"(${left.dataType}, ${right.dataType})")

  private def leftIsDouble: Boolean = elemType(left.dataType).contains(DoubleType)
  private def rightIsDouble: Boolean = elemType(right.dataType).contains(DoubleType)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    L2Sq.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsDouble, rightIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.L2Sq$$.MODULE$$.compute(
        $a, $b, $leftIsDouble, $rightIsDouble);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: expected array<float|double> on both sides, got " +
        s"(${left.dataType}, ${right.dataType})")

  private def leftIsDouble: Boolean = elemType(left.dataType).contains(DoubleType)
  private def rightIsDouble: Boolean = elemType(right.dataType).contains(DoubleType)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsDouble, rightIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.CosineSim$$.MODULE$$.compute(
        $a, $b, $leftIsDouble, $rightIsDouble);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
