package org.apache.spark.sql.graft

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Decodes external [[Row]]s into case-class instances, including nested
  * structs, maps and Option fields (reference: sql/custom/RowDecoder.scala:33-45).
  *
  * Serializable so it can ride inside closures to executors; the encoder
  * machinery is rebuilt lazily per JVM (`@transient lazy val`) — the same
  * per-executor-state pattern the serde expressions use.
  */
class RowDecoder[T <: Product : TypeTag] extends Serializable {

  @transient private lazy val encoder: ExpressionEncoder[T] =
    ExpressionEncoder[T]().resolveAndBind()

  @transient private lazy val toCatalyst: Any => Any =
    CatalystTypeConverters.createToCatalystConverter(encoder.schema)

  @transient private lazy val deserializer: ExpressionEncoder.Deserializer[T] =
    encoder.createDeserializer()

  def convert(row: Row): T =
    deserializer(toCatalyst(row).asInstanceOf[InternalRow])
}
