package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native ENGINE-SHARED polynomial string hash:
  *   h = fold(bytes, 0, (h, b) => (h·31 + b) mod (10⁹+7))
  * — the arithmetic any SQL engine can replicate exactly (DuckDB:
  * `list_reduce` over `ord(substr(...))`), unlike xxhash64. For ASCII
  * input (the corpus contract) bytes ≡ code points, so both folds see
  * the same values; every intermediate ≤ 31·(10⁹+7)+255 ≪ 2⁶³
  * (ANSI-safe, no wrap).
  *
  * One tight codegen'd loop over the UTF8String bytes per row — the
  * interpreted `aggregate(split(s, ''), …)` HOF form this replaces
  * allocates a per-character array and evaluates an expression tree
  * per character (measured: the q95 winnowing scan went from
  * pathological to scan-speed when moved onto this). */
case class PolyHashExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_polyhash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_polyhash expects a string arg, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff).toLong) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |int $n = $s.numBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h * 31L + (long)($s.getByte($i) & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PolyHashExpr = copy(child = newChild)
}

object PolyHashExpr {
  val name = "graft_polyhash"

  private val info = new ExpressionInfo(
    classOf[PolyHashExpr].getName, name)

  private val builder: Seq[Expression] => Expression = {
    case Seq(s) => PolyHashExpr(s)
    case args => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${args.length}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}
