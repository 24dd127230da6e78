package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hash-map string→int lookup, null when absent — value-identical to
  * `element_at(map(<literal entries>), c)` over the same entries
  * (LookupSpec pins it), which Spark evaluates as a LINEAR scan of the
  * literal ArrayBasedMapData per row: with the 63-token feature
  * directory of the quality classifier that was ~32 string comparisons
  * per corpus token in the design-matrix build (round-19
  * optimization). The table is an O(1) HashMap built once per executor
  * expression instance; keys compare as UTF8Strings — exactly the
  * literal map's equality. */
case class StringToIntLookup(child: Expression, entries: Seq[(String, Int)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val table = StringToIntLookup.build(entries)

  override def nullSafeEval(input: Any): Any =
    table.get(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tblRef = ctx.addReferenceObj("lookupTable",
      StringToIntLookup.build(entries), "java.util.HashMap")
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    val code = c.code +
      code"""
         |boolean ${ev.isNull} = true;
         |int ${ev.value} = -1;
         |if (!${c.isNull}) {
         |  Integer $boxed = (Integer) $tblRef.get(${c.value});
         |  if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.intValue(); }
         |}
         |""".stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): StringToIntLookup =
    copy(child = newChild)
}

object StringToIntLookup {

  def build(entries: Seq[(String, Int)])
      : java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](entries.size * 2)
    entries.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), Integer.valueOf(v))
    }
    m
  }

  def lookup(c: Column, entries: Seq[(String, Int)]): Column =
    ColumnBridge.column(StringToIntLookup(ColumnBridge.expression(c), entries))
}
