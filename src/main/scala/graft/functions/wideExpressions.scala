package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Long sum across an arbitrary number of numeric columns of ONE row —
  * the wide-table row reduction (4,000+ column ingest accounting, feature
  * totals). NULLs count as 0; floating inputs truncate like a SQL
  * `CAST(x AS BIGINT)`.
  *
  * Exists because the declarative spellings are interpreted at this
  * width: `aggregate(array(cols...), ...)` is a higher-order function
  * (CodegenFallback — per-row lambda interpretation plus a 4,450-element
  * array materialization; measured 17-20 s over 50K×4,450 where this
  * expression runs in ~1 s), and a `+`-chain of 4,450 Adds nests a
  * 4,450-deep expression tree that breaks the 64KB method limit without
  * splitting. Codegen here emits straight-line `sum += col;` statements
  * through `splitExpressionsWithCurrentInputs`, so the generated code
  * stays within JVM method limits at any width.
  */
case class WideRowSum(children: Seq[Expression]) extends Expression {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_row_sum"

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.find(c => !WideRowSum.supported(c.dataType))
    bad match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: unsupported input type ${c.dataType} (integral/float/double only)")
      case None if children.isEmpty =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName needs at least one column")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: InternalRow): Any = {
    var s = 0L
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v != null) s += (v match {
        case n: java.lang.Number => n.longValue()
        case other => sys.error(s"graft_row_sum: non-numeric value $other")
      })
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childCodes = children.map { c =>
      val eval = c.genCode(ctx)
      s"""
         |${eval.code}
         |if (!${eval.isNull}) {
         |  ${ev.value} += (long) ${eval.value};
         |}
       """.stripMargin
    }
    // HashExpression's split pattern: the accumulator threads through the
    // split methods as an argument + return value, keeping every generated
    // method under the JVM's 64KB limit regardless of column count
    val body = ctx.splitExpressionsWithCurrentInputs(
      expressions = childCodes,
      funcName = "wideRowSum",
      extraArguments = Seq(CodeGenerator.JAVA_LONG -> ev.value.toString),
      returnType = CodeGenerator.JAVA_LONG,
      makeSplitFunction = b => s"$b\nreturn ${ev.value};",
      foldFunctions = _.map(call => s"${ev.value} = $call;").mkString("\n"))
    ev.copy(
      code = code"""
        |long ${ev.value} = 0L;
        |$body
       """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object WideRowSum {
  private[functions] def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case _ => false
  }
}
