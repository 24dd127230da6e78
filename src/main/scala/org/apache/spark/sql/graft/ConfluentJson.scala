package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, RuntimeReplaceable, StructsToJson}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

import graft.jsonschema.JsonSchemaConverter
import graft.registry.SchemaRegistryClient

/** JSON flavor of the registry governance
  * (reference: sql/confluent/json/ConfluentJsonConnector.scala:32-102):
  * subjects hold JSON Schema documents; read derives the parse schema
  * from the latest subject version; write registers/updates the schema
  * derived from the data's StructType. */
class ConfluentJsonRegistry(val client: SchemaRegistryClient) extends Serializable {

  def latestSparkSchema(subject: String): StructType =
    client.getLatest(subject) match {
      case Some((_, json)) => JsonSchemaConverter.toSparkSchema(json)
      case None => throw new IllegalArgumentException(
        s"subject $subject not found in schema registry")
    }

  /** Register the schema if new; replacing an existing different schema
    * requires `updateAllowed`. */
  def setOrUpdateSchema(subject: String, schema: StructType, updateAllowed: Boolean): Unit = {
    val json = JsonSchemaConverter.fromSparkSchemaString(schema)
    client.getLatest(subject) match {
      // nullability-insensitive no-op check: Catalyst rules legitimately
      // shift nullable flags between analysis passes of the same plan
      case Some((_, existing)) if org.apache.spark.sql.types.DataType.equalsStructurally(
          JsonSchemaConverter.toSparkSchema(existing),
          JsonSchemaConverter.toSparkSchema(json), ignoreNullability = true) =>
        () // unchanged
      case Some(_) if !updateAllowed =>
        throw new graft.registry.IncompatibleSchemaException(
          s"subject $subject already has a different schema and updateAllowed=false")
      case _ => client.register(subject, json)
    }
  }
}

/** struct → JSON string with registry governance: registering the JSON
  * Schema happens when the optimizer materializes `replacement` (driver,
  * plan time — effectively the reference's eagerCheck); execution is
  * Spark's own codegen'd `to_json`
  * (Spark-first replacement for the reference's StructsToJson fork at
  * sql/confluent/json/ConfluentJsonConnector.scala:74-176). */
case class ToConfluentJson(
    child: Expression,
    subject: String,
    registry: ConfluentJsonRegistry,
    updateAllowed: Boolean) extends RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = {
    child.dataType match {
      case st: StructType => registry.setOrUpdateSchema(subject, st, updateAllowed)
      case other => throw new IllegalArgumentException(
        s"to_confluent_json requires a struct column, got $other")
    }
    StructsToJson(Map.empty, child, Some(SQLConf.get.sessionLocalTimeZone))
  }

  override protected def withNewChildInternal(newChild: Expression): ToConfluentJson =
    copy(child = newChild)
}
