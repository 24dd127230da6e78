package graft.jsonschema

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.types._

/** JSON Schema (draft-04) ↔ Spark [[StructType]] converter.
  *
  * Read-side semantics follow the reference
  * (reference: sql/confluent/json/JsonToSparkSchemaConverter.scala:29-150):
  * `properties`/`required` drive nullability, `["T","null"]` type arrays
  * mark nullable, `$ref` resolves against `#/definitions`, `object` with
  * `additionalProperties` and no `properties` becomes a MapType, custom
  * `date-time`/`date` string formats become Timestamp/Date, and with
  * lenient typing a multi-type field degrades to string while strict
  * typing rejects it.
  *
  * Write side (reference: sql/confluent/json/SparkToJsonSchemaConverter.scala:10-51):
  * structs → `object` + `required`, maps → `additionalProperties`,
  * decimal scale 0 → `integer` else `number`, emits the draft-04
  * `$schema` header.
  */
object JsonSchemaConverter {

  val SchemaVersionUrl = "http://json-schema.org/draft-04/schema#"

  class JsonSchemaException(msg: String) extends Exception(msg)

  // ---------------------------------------------------------------- read

  def toSparkSchema(schemaContent: String, strictTyping: Boolean = true): StructType = {
    val root = JsonMethods.parse(schemaContent) match {
      case o: JObject => o
      case other => throw new JsonSchemaException(s"JSON Schema root must be an object, got $other")
    }
    new JsonToSparkConverter(root, strictTyping).convert()
  }

  private class JsonToSparkConverter(root: JObject, strict: Boolean) {

    def convert(): StructType =
      toDataTypeN(root)._1 match {
        case st: StructType => st
        case other => throw new JsonSchemaException(s"root schema must describe an object, got $other")
      }

    private def resolveRef(ref: String): JObject = {
      val path = ref.stripPrefix("#/").split('/').toList
      val resolved = path.foldLeft(root: JValue)((acc, seg) => acc \ seg)
      resolved match {
        case o: JObject => o
        case other => throw new JsonSchemaException(s"cannot resolve $$ref '$ref': $other")
      }
    }

    /** (dataType, nullableFromTypeArray); `seenRefs` guards $ref cycles
      * (Catalyst types are finite — recursive schemas must be rejected,
      * like the Avro converter does). */
    private def toDataTypeN(node: JObject, seenRefs: Set[String] = Set.empty)
        : (DataType, Boolean) = {
      node \ "$ref" match {
        case JString(ref) =>
          if (seenRefs.contains(ref))
            throw new JsonSchemaException(s"recursive $$ref '$ref' is not supported")
          return toDataTypeN(resolveRef(ref), seenRefs + ref)
        case _ =>
      }
      val (typeNames, nullableInType) = node \ "type" match {
        case JString(t)  => (Seq(t), false)
        case JArray(ts)  =>
          val names = ts.collect { case JString(t) => t }
          (names.filter(_ != "null"), names.contains("null"))
        case JNothing    => (Seq("object"), false) // bare {properties: …}
        case other       => throw new JsonSchemaException(s"unsupported 'type': $other")
      }
      val dt = typeNames match {
        case Seq() => throw new JsonSchemaException("only 'null' in type array is unsupported")
        case Seq(one) => simpleOrComplex(one, node, seenRefs)
        case many =>
          if (strict) throw new JsonSchemaException(
            s"multiple types $many not supported with strict typing")
          else StringType
      }
      (dt, nullableInType)
    }

    private def simpleOrComplex(typeName: String, node: JObject,
        seenRefs: Set[String]): DataType = typeName match {
      case "integer" => LongType
      case "number"  => DoubleType
      case "boolean" => BooleanType
      case "string"  => node \ "format" match {
        case JString("date-time") => TimestampType
        case JString("date")      => DateType
        case _                    => StringType
      }
      case "array" => node \ "items" match {
        case items: JObject =>
          val (et, elemNullable) = toDataTypeN(items, seenRefs)
          ArrayType(et, containsNull = elemNullable)
        case other => throw new JsonSchemaException(s"array requires object 'items', got $other")
      }
      case "object" =>
        node \ "properties" match {
          case props: JObject =>
            val required: Set[String] = node \ "required" match {
              case JArray(vs) => vs.collect { case JString(s) => s }.toSet
              case _ => Set.empty
            }
            val fields = props.obj.map { case (name, value) =>
              value match {
                case fieldNode: JObject =>
                  val (dt, nullableInType) = toDataTypeN(fieldNode, seenRefs)
                  StructField(name, dt, nullable = !required.contains(name) || nullableInType)
                case other => throw new JsonSchemaException(
                  s"property '$name' must be an object, got $other")
              }
            }
            StructType(fields)
          case JNothing => node \ "additionalProperties" match {
            case ap: JObject =>
              val (vt, valueNullable) = toDataTypeN(ap, seenRefs)
              MapType(StringType, vt, valueContainsNull = valueNullable)
            case _ => StructType(Seq.empty)
          }
          case other => throw new JsonSchemaException(s"'properties' must be an object, got $other")
        }
      case other => throw new JsonSchemaException(s"unsupported JSON Schema type '$other'")
    }
  }

  // --------------------------------------------------------------- write

  def fromSparkSchema(schema: StructType): JObject = {
    val body = structToJson(schema)
    JObject(("$schema" -> JString(SchemaVersionUrl)) :: body.obj)
  }

  def fromSparkSchemaString(schema: StructType, pretty: Boolean = false): String = {
    val j = fromSparkSchema(schema)
    if (pretty) JsonMethods.pretty(JsonMethods.render(j))
    else JsonMethods.compact(JsonMethods.render(j))
  }

  private def structToJson(st: StructType): JObject = {
    val props = JObject(st.fields.map(f => f.name -> typeToJson(f.dataType)).toList)
    val required = st.fields.filterNot(_.nullable).map(f => JString(f.name)).toList
    JObject(List(
      "type" -> JString("object"),
      "properties" -> props,
      "required" -> JArray(required),
      "additionalProperties" -> JBool(false)))
  }

  private def typeToJson(dt: DataType): JValue = dt match {
    case ByteType | ShortType | IntegerType | LongType => JObject("type" -> JString("integer"))
    case FloatType | DoubleType => JObject("type" -> JString("number"))
    case d: DecimalType =>
      JObject("type" -> JString(if (d.scale == 0) "integer" else "number"))
    case BooleanType => JObject("type" -> JString("boolean"))
    case StringType | BinaryType => JObject("type" -> JString("string"))
    case TimestampType | TimestampNTZType =>
      JObject("type" -> JString("string"), "format" -> JString("date-time"))
    case DateType =>
      JObject("type" -> JString("string"), "format" -> JString("date"))
    case ArrayType(et, _) =>
      JObject("type" -> JString("array"), "items" -> typeToJson(et))
    case MapType(StringType, vt, _) =>
      JObject("type" -> JString("object"), "additionalProperties" -> typeToJson(vt))
    case MapType(kt, _, _) =>
      throw new JsonSchemaException(s"JSON object keys must be strings, got $kt")
    case st: StructType => structToJson(st)
    case other => throw new JsonSchemaException(s"unsupported Spark type $other")
  }
}
