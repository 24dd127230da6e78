package graft.avro

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalType, LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.Schema.Type._
import org.apache.spark.sql.types._

/** Bidirectional Avro [[Schema]] ↔ Catalyst [[DataType]] converter.
  *
  * Matches the reference's conversion semantics
  * (reference: sql/confluent/avro/AvroSchemaConverter.scala:51-200):
  *  - logical types date / timestamp-millis / timestamp-micros / decimal;
  *  - NullType ↔ Avro NULL;
  *  - nullable fields become unions with **null first** and
  *    `default = null` (so schema-registry compatibility rules treat new
  *    optional fields as evolvable);
  *  - `[int,long]` → LongType, `[float,double]` → DoubleType, other
  *    complex unions → struct of `member0…memberN`;
  *  - enum → string; recursive records are rejected;
  *  - decimals ride on FIXED with the minimal byte length for the
  *    precision.
  */
object AvroSchemaConverter {

  case class SchemaType(dataType: DataType, nullable: Boolean)

  class IncompatibleSchemaException(msg: String) extends Exception(msg)

  // ---------------------------------------------------------------- read

  def toSqlType(avroSchema: Schema): SchemaType =
    toSqlTypeHelper(avroSchema, Set.empty)

  private def toSqlTypeHelper(avroSchema: Schema, seenRecords: Set[String]): SchemaType =
    avroSchema.getType match {
      case INT => avroSchema.getLogicalType match {
        case _: LogicalTypes.Date => SchemaType(DateType, nullable = false)
        case _ => SchemaType(IntegerType, nullable = false)
      }
      case STRING  => SchemaType(StringType, nullable = false)
      case BOOLEAN => SchemaType(BooleanType, nullable = false)
      case BYTES | FIXED => avroSchema.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          SchemaType(DecimalType(d.getPrecision, d.getScale), nullable = false)
        case _ => SchemaType(BinaryType, nullable = false)
      }
      case DOUBLE => SchemaType(DoubleType, nullable = false)
      case FLOAT  => SchemaType(FloatType, nullable = false)
      case LONG => avroSchema.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
          SchemaType(TimestampType, nullable = false)
        case _ => SchemaType(LongType, nullable = false)
      }
      case ENUM => SchemaType(StringType, nullable = false)
      case NULL => SchemaType(NullType, nullable = true)

      case RECORD =>
        if (seenRecords.contains(avroSchema.getFullName)) {
          throw new IncompatibleSchemaException(
            s"recursive Avro record ${avroSchema.getFullName} is not supported")
        }
        val seen = seenRecords + avroSchema.getFullName
        val fields = avroSchema.getFields.asScala.map { f =>
          val st = toSqlTypeHelper(f.schema(), seen)
          StructField(f.name, st.dataType, st.nullable)
        }
        SchemaType(StructType(fields.toSeq), nullable = false)

      case ARRAY =>
        val st = toSqlTypeHelper(avroSchema.getElementType, seenRecords)
        SchemaType(ArrayType(st.dataType, containsNull = st.nullable), nullable = false)

      case MAP =>
        val st = toSqlTypeHelper(avroSchema.getValueType, seenRecords)
        SchemaType(MapType(StringType, st.dataType, valueContainsNull = st.nullable),
          nullable = false)

      case UNION =>
        val types = avroSchema.getTypes.asScala
        if (types.exists(_.getType == NULL)) {
          val remaining = types.filter(_.getType != NULL)
          if (remaining.isEmpty) SchemaType(NullType, nullable = true)
          else {
            val st = toSqlTypeHelper(Schema.createUnion(remaining.asJava), seenRecords)
            st.copy(nullable = true)
          }
        } else types.map(_.getType).toSeq match {
          case Seq(t) => toSqlTypeHelper(types.head, seenRecords)
          case Seq(a, b) if Set(a, b) == Set(INT, LONG) =>
            SchemaType(LongType, nullable = false)
          case Seq(a, b) if Set(a, b) == Set(FLOAT, DOUBLE) =>
            SchemaType(DoubleType, nullable = false)
          case _ =>
            // complex union → struct of member0…memberN; each member
            // nullable because only one branch carries a value at a time
            val fields = types.zipWithIndex.map { case (m, i) =>
              val st = toSqlTypeHelper(m, seenRecords)
              StructField(s"member$i", st.dataType, nullable = true)
            }
            SchemaType(StructType(fields.toSeq), nullable = false)
        }
    }

  // --------------------------------------------------------------- write

  /** Minimal FIXED byte length holding `precision` decimal digits. */
  def minBytesForPrecision(precision: Int): Int = {
    var bytes = 1
    while (math.log10(2) * (8 * bytes - 1) < precision) bytes += 1
    bytes
  }

  def toAvroType(
      catalystType: DataType,
      nullable: Boolean = false,
      recordName: String = "topLevelRecord",
      nameSpace: String = ""): Schema = {
    val builder = SchemaBuilder.builder()
    val schema = catalystType match {
      case BooleanType => builder.booleanType()
      case ByteType | ShortType | IntegerType => builder.intType()
      case LongType   => builder.longType()
      case DateType   => LogicalTypes.date().addToSchema(builder.intType())
      case TimestampType | TimestampNTZType =>
        LogicalTypes.timestampMicros().addToSchema(builder.longType())
      case FloatType  => builder.floatType()
      case DoubleType => builder.doubleType()
      case StringType => builder.stringType()
      case NullType   => builder.nullType()
      case d: DecimalType =>
        val fixed = Schema.createFixed(s"${recordName}_fixed", null,
          nameSpace, minBytesForPrecision(d.precision))
        LogicalTypes.decimal(d.precision, d.scale).addToSchema(fixed)
      case BinaryType => builder.bytesType()
      case ArrayType(et, containsNull) =>
        builder.array().items(toAvroType(et, containsNull, recordName, nameSpace))
      case MapType(StringType, vt, valueContainsNull) =>
        builder.map().values(toAvroType(vt, valueContainsNull, recordName, nameSpace))
      case MapType(kt, _, _) =>
        throw new IncompatibleSchemaException(
          s"Avro maps require string keys; got $kt")
      case st: StructType =>
        val childNameSpace = if (nameSpace != "") s"$nameSpace.$recordName" else recordName
        val fieldsAssembler = SchemaBuilder.record(recordName).namespace(nameSpace).fields()
        st.foreach { f =>
          val fieldAvroType = toAvroType(f.dataType, f.nullable, f.name, childNameSpace)
          // optional fields get default=null (valid because null is the
          // union's FIRST branch); required fields get no default
          if (f.nullable && f.dataType != NullType) {
            fieldsAssembler.name(f.name).`type`(fieldAvroType).withDefault(null)
          } else {
            fieldsAssembler.name(f.name).`type`(fieldAvroType).noDefault()
          }
        }
        fieldsAssembler.endRecord()
      case other =>
        throw new IncompatibleSchemaException(s"unsupported type $other")
    }
    // nullable → union with null FIRST + default null (evolution-friendly)
    if (nullable && catalystType != NullType) {
      Schema.createUnion((Schema.create(Schema.Type.NULL) +: Seq(schema)).asJava)
    } else schema
  }
}
