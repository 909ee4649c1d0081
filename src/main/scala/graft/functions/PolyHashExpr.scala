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


/** string → long ROLLING word-hash fold (tx4's rolling_hash): words are
  * split on single spaces, each word char-folds base 31 mod P, and the
  * word hashes fold base 131 mod P in order — token-order-sensitive, so
  * shuffled words fingerprint differently. Streaming formulation: the
  * running word hash flushes at every space byte, so no intermediate
  * word array exists; empty words (consecutive/leading/trailing spaces)
  * flush as hash 0, exactly what the HOF/DuckDB `string_split` forms
  * compute. ASCII contract as [[PolyHashExpr]] (bytes ≡ code points). */
case class RollHashExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_rollhash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_rollhash expects a string arg, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var wh = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b == 0x20) { acc = (acc * 131L + wh) % 1000000007L; wh = 0L }
      else wh = (wh * 31L + b.toLong) % 1000000007L
      i += 1
    }
    (acc * 131L + wh) % 1000000007L
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val wh = ctx.freshName("wh")
      val b = ctx.freshName("b")
      s"""
         |int $n = $s.numBytes();
         |long $acc = 0L;
         |long $wh = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $b = $s.getByte($i) & 0xff;
         |  if ($b == 0x20) { $acc = ($acc * 131L + $wh) % 1000000007L; $wh = 0L; }
         |  else $wh = ($wh * 31L + (long)$b) % 1000000007L;
         |}
         |${ev.value} = ($acc * 131L + $wh) % 1000000007L;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollHashExpr = copy(child = newChild)
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
