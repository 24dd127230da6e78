package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, RuntimeReplaceable, StructsToJson}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, MapType, ShortType, StructType}

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
    * requires `updateAllowed` AND a passing compatibility check —
    * new-can-read-old, or both directions when `mutualReadCheck` —
    * mirroring the Avro side (and the reference's JSON-subject handling
    * through the same ConfluentClient.setOrUpdateSchema machinery,
    * reference: sql/confluent/ConfluentClient.scala:85-116). */
  def setOrUpdateSchema(subject: String, schema: StructType, updateAllowed: Boolean,
      mutualReadCheck: Boolean = false): Unit = {
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
      case Some((_, existingJson)) =>
        val existing = JsonSchemaConverter.toSparkSchema(existingJson)
        val problems =
          if (mutualReadCheck)
            ConfluentJsonRegistry.canRead(schema, existing, "new cannot read old") ++
              ConfluentJsonRegistry.canRead(existing, schema, "old cannot read new")
          else ConfluentJsonRegistry.canRead(schema, existing, "new cannot read old")
        if (problems.nonEmpty) throw new graft.registry.IncompatibleSchemaException(
          s"JSON schema update for $subject is incompatible: ${problems.mkString("; ")}")
        client.register(subject, json)
      case None => client.register(subject, json)
    }
  }
}

object ConfluentJsonRegistry {

  /** Can data written under `writer` be read with `reader`? Empty =
    * compatible. Rules (JSON-Schema semantics expressed on the converted
    * StructTypes, where required ↔ non-nullable):
    *  - a reader field absent from the writer must be optional;
    *  - a required reader field may not map to an optional writer field
    *    (the data may lack it);
    *  - primitive types must match or widen (integer ranks byte<short<
    *    int<long; float<double; any integer reads as double — JSON
    *    `number` accepts `integer` values);
    *  - structs recurse per field, arrays on the element, maps on the
    *    value; extra writer fields are ignored by the reader. */
  private[graft] def canRead(reader: StructType, writer: StructType,
      what: String): Seq[String] =
    canReadStruct(reader, writer, "$").map(p => s"$what: $p")

  private def rank(dt: DataType): Option[Int] = dt match {
    case ByteType => Some(0); case ShortType => Some(1)
    case IntegerType => Some(2); case LongType => Some(3)
    case _ => None
  }

  private def widens(writer: DataType, reader: DataType): Boolean =
    (writer, reader) match {
      case (FloatType, DoubleType) => true
      case (w, DoubleType) if rank(w).isDefined => true
      case (w, FloatType) if rank(w).isDefined => true
      case (w, r) => (rank(w), rank(r)) match {
        case (Some(a), Some(b)) => a < b
        case _ => false
      }
    }

  private def canReadType(reader: DataType, writer: DataType, path: String): Seq[String] =
    (reader, writer) match {
      case (r: StructType, w: StructType) => canReadStruct(r, w, path)
      case (ArrayType(re, _), ArrayType(we, _)) => canReadType(re, we, s"$path[]")
      case (MapType(_, rv, _), MapType(_, wv, _)) => canReadType(rv, wv, s"$path{}")
      case (r, w) if r == w => Nil
      case (r, w) if widens(w, r) => Nil
      case (r, w) => Seq(s"$path: existing data is $w, unreadable as $r")
    }

  private def canReadStruct(reader: StructType, writer: StructType, path: String): Seq[String] =
    reader.fields.toSeq.flatMap { rf =>
      writer.fields.find(_.name == rf.name) match {
        case Some(wf) =>
          val missing =
            if (!rf.nullable && wf.nullable)
              Seq(s"$path.${rf.name}: required by reader but optional in existing data")
            else Nil
          missing ++ canReadType(rf.dataType, wf.dataType, s"$path.${rf.name}")
        case None if rf.nullable => Nil
        case None => Seq(s"$path.${rf.name}: required field absent from existing data")
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
    updateAllowed: Boolean,
    mutualReadCheck: Boolean = false) extends RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = {
    child.dataType match {
      case st: StructType =>
        registry.setOrUpdateSchema(subject, st, updateAllowed, mutualReadCheck)
      case other => throw new IllegalArgumentException(
        s"to_confluent_json requires a struct column, got $other")
    }
    StructsToJson(Map.empty, child, Some(SQLConf.get.sessionLocalTimeZone))
  }

  /** Force registration/compatibility-check now (driver, plan time) —
    * the eagerCheck semantics of the reference's connector. */
  def test(): Unit = { replacement; () }

  override protected def withNewChildInternal(newChild: Expression): ToConfluentJson =
    copy(child = newChild)
}
