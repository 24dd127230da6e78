package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{from_json, col}
import org.apache.spark.sql.types.StringType

import org.apache.spark.sql.graft.{CatalystToConfluentAvro, ColumnBridge, ConfluentAvroToCatalyst, ConfluentJsonRegistry, ToConfluentJson}

import graft.registry.{ConfluentAvroRegistry, SchemaRegistryClient, SubjectType}

/** Column functions for Confluent-framed serde against a schema registry
  * (reference: sql/confluent/avro/ConfluentAvroConnector.scala:26-46 and
  * sql/confluent/json/ConfluentJsonConnector.scala:32-60). */
package object confluent {

  private def subjectName(topic: String, st: SubjectType) = s"$topic-${st.suffix}"

  /** Decode a Confluent-framed Avro binary column into a struct, with
    * per-record writer→reader schema evolution. */
  def from_confluent_avro(data: Column, topic: String, subjectType: SubjectType,
      client: SchemaRegistryClient): Column =
    ColumnBridge.column(ConfluentAvroToCatalyst(
      ColumnBridge.expression(data),
      subjectName(topic, subjectType),
      new ConfluentAvroRegistry(client)))

  /** Encode a struct column as Confluent-framed Avro, registering (or
    * compatibility-checked updating) the subject schema.
    * `evolveToLatest`: when the subject already carries a different
    * (evolved) schema, serialize under THAT schema field-name-resolved
    * instead of registering the data's schema — target fields absent
    * from the data fill with their Avro defaults (write-side
    * evolution). Off by default = the reference's exact behavior. */
  def to_confluent_avro(data: Column, topic: String, subjectType: SubjectType,
      client: SchemaRegistryClient, updateAllowed: Boolean = false,
      mutualReadCheck: Boolean = false, eagerCheck: Boolean = false,
      evolveToLatest: Boolean = false): Column = {
    val expr = CatalystToConfluentAvro(
      ColumnBridge.expression(data),
      subjectName(topic, subjectType),
      new ConfluentAvroRegistry(client), updateAllowed, mutualReadCheck,
      evolveToLatest)
    if (eagerCheck && expr.child.resolved) expr.test()
    ColumnBridge.column(expr)
  }

  /** Parse a JSON string/binary column using the subject's registered
    * JSON Schema (composition over the codegen'd from_json). */
  def from_confluent_json(data: Column, topic: String, subjectType: SubjectType,
      client: SchemaRegistryClient): Column = {
    val schema = new ConfluentJsonRegistry(client)
      .latestSparkSchema(subjectName(topic, subjectType))
    from_json(data.cast(StringType), schema)
  }

  /** Serialize a struct column to JSON, registering (or
    * compatibility-checked updating) its JSON Schema. */
  def to_confluent_json(data: Column, topic: String, subjectType: SubjectType,
      client: SchemaRegistryClient, updateAllowed: Boolean = false,
      mutualReadCheck: Boolean = false, eagerCheck: Boolean = false): Column = {
    val expr = ToConfluentJson(
      ColumnBridge.expression(data),
      subjectName(topic, subjectType),
      new ConfluentJsonRegistry(client), updateAllowed, mutualReadCheck)
    // unbound columns analyze to a NullType placeholder pre-analysis —
    // eager checking is only possible on dataframe-bound struct columns
    if (eagerCheck && expr.child.resolved &&
      expr.child.dataType.isInstanceOf[org.apache.spark.sql.types.StructType]) expr.test()
    ColumnBridge.column(expr)
  }
}
