package graft.avro

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{Conversions, LogicalTypes, Schema}
import org.apache.avro.Schema.Type._
import org.apache.avro.generic.{GenericData, GenericFixed, GenericRecord, GenericRecordBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, SpecializedGetters}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst ↔ Avro-generic value converters, compiled once per schema
  * pair into closure trees (no per-row type dispatch) — the same
  * performance shape as the reference's serializer
  * (reference: sql/confluent/avro/MyAvroSerializer.scala:46-247) plus the
  * read direction the reference got from spark-avro (absent here).
  *
  * Both directions are driven by the (catalystType, avroSchema) pair so
  * logical types (date, timestamp-millis/micros, decimal) convert by
  * what the *Avro* schema declares.
  */
object AvroCatalystSerde {

  private val decimalConversion = new Conversions.DecimalConversion

  private def nonNull(schema: Schema): Schema =
    if (schema.getType == UNION) {
      val rest = schema.getTypes.asScala.filter(_.getType != NULL)
      if (rest.size == 1) rest.head else Schema.createUnion(rest.asJava)
    } else schema

  // ======================================================= Catalyst→Avro

  /** Row serializer for a struct type (entry point for writers). */
  def catalystToAvro(catalystType: DataType, avroSchema: Schema): Any => Any =
    makeWriter(catalystType, nonNull(avroSchema))

  private def makeWriter(dt: DataType, avro0: Schema): Any => Any = {
    val avro = nonNull(avro0)
    // promotable unions ([int,long] → LongType, [float,double] →
    // DoubleType per AvroSchemaConverter): write through the wider branch
    if (avro.getType == UNION) {
      val wanted = dt match {
        case LongType => Some(LONG)
        case DoubleType => Some(DOUBLE)
        case _ => None
      }
      wanted.flatMap(t => avro.getTypes.asScala.find(_.getType == t)) match {
        case Some(branch) => return makeWriter(dt, branch)
        case None =>
      }
    }
    val f: Any => Any = (dt, avro.getType) match {
      case (BooleanType, BOOLEAN) => identity
      case (ByteType | ShortType | IntegerType, INT) => identity
      case (IntegerType, LONG) => v => v.asInstanceOf[Int].toLong
      case (DateType, INT) => identity // days since epoch both sides
      case (LongType, LONG) => identity
      case (TimestampType | TimestampNTZType, LONG) => avro.getLogicalType match {
        case _: LogicalTypes.TimestampMillis => v => v.asInstanceOf[Long] / 1000L
        case _ => identity // micros
      }
      case (FloatType, FLOAT) => identity
      case (FloatType, DOUBLE) => v => v.asInstanceOf[Float].toDouble
      case (DoubleType, DOUBLE) => identity
      case (StringType, STRING) => v => v.toString
      case (StringType, ENUM) =>
        v => {
          val s = v.toString
          if (!avro.getEnumSymbols.contains(s))
            throw new IllegalArgumentException(
              s"value '$s' is not a symbol of enum ${avro.getFullName}")
          new GenericData.EnumSymbol(avro, s)
        }
      case (BinaryType, BYTES) => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case (BinaryType, FIXED) => v => {
        val bytes = v.asInstanceOf[Array[Byte]]
        if (bytes.length != avro.getFixedSize)
          throw new IllegalArgumentException(
            s"fixed ${avro.getFullName} needs ${avro.getFixedSize} bytes, got ${bytes.length}")
        new GenericData.Fixed(avro, bytes)
      }
      case (d: DecimalType, FIXED) =>
        v => decimalConversion.toFixed(v.asInstanceOf[Decimal].toJavaBigDecimal, avro,
          LogicalTypes.decimal(d.precision, d.scale))
      case (d: DecimalType, BYTES) =>
        v => decimalConversion.toBytes(v.asInstanceOf[Decimal].toJavaBigDecimal, avro,
          LogicalTypes.decimal(d.precision, d.scale))
      case (ArrayType(et, containsNull), ARRAY) =>
        val elemW = makeWriter(et, avro.getElementType)
        val wrapped = nullWrap(elemW, containsNull, avro.getElementType)
        val getter = elementGetter(et)
        v => {
          val arr = v.asInstanceOf[ArrayData]
          val out = new java.util.ArrayList[Any](arr.numElements())
          var i = 0
          while (i < arr.numElements()) {
            out.add(if (arr.isNullAt(i)) wrapped(null) else wrapped(getter(arr, i)))
            i += 1
          }
          out
        }
      case (MapType(StringType, vt, valueContainsNull), MAP) =>
        val valW = nullWrap(makeWriter(vt, avro.getValueType), valueContainsNull, avro.getValueType)
        val getter = elementGetter(vt)
        v => {
          val m = v.asInstanceOf[MapData]
          val out = new java.util.HashMap[String, Any](m.numElements())
          val keys = m.keyArray(); val vals = m.valueArray()
          var i = 0
          while (i < m.numElements()) {
            val value = if (vals.isNullAt(i)) valW(null) else valW(getter(vals, i))
            out.put(keys.getUTF8String(i).toString, value)
            i += 1
          }
          out
        }
      case (st: StructType, RECORD) =>
        // NAME-resolVED, target-driven (the write-side evolution the
        // reference's positional MyAvroSerializer could not do — its own
        // ignore'd limitation at ConfluentAvroCatalystTest.scala:79-91):
        // every data field must exist in the target record; a target
        // field absent from the data fills with its Avro DEFAULT (or
        // null for a null-union), resolved ONCE at closure-build time.
        // When target == converted data schema (the non-evolution path)
        // fields match 1:1 and this degenerates to the plain writer.
        st.fields.foreach { sf =>
          require(avro.getField(sf.name) != null,
            s"field ${sf.name} missing in Avro record ${avro.getFullName}")
        }
        val byName = st.fields.zipWithIndex.map { case (sf, i) => sf.name -> (sf, i) }.toMap
        val fieldFills: Array[(Int, SpecializedGetters) => Any] =
          avro.getFields.asScala.map { af =>
            byName.get(af.name()) match {
              case Some((sf, si)) =>
                val w = nullWrap(makeWriter(sf.dataType, af.schema()), sf.nullable, af.schema())
                val g = elementGetter(sf.dataType)
                (pos: Int, row: SpecializedGetters) =>
                  if (row.isNullAt(si)) w(null) else w(g(row, si))
              case None =>
                val dv: Any =
                  if (af.hasDefaultValue) GenericData.get().getDefaultValue(af)
                  else if (hasNullBranch(af.schema()) || af.schema().getType == NULL) null
                  else throw new IllegalArgumentException(
                    s"target field ${af.name()} of ${avro.getFullName} is absent " +
                      "from the data and has no default")
                (_: Int, _: SpecializedGetters) => dv
            }
          }.toArray
        val positions = avro.getFields.asScala.map(_.pos()).toArray
        v => {
          val row = v.asInstanceOf[SpecializedGetters]
          val rec = new GenericData.Record(avro)
          var i = 0
          while (i < fieldFills.length) {
            rec.put(positions(i), fieldFills(i)(positions(i), row))
            i += 1
          }
          rec
        }
      case (NullType, NULL) => _ => null
      case (cdt, at) =>
        throw new IllegalArgumentException(
          s"cannot serialize Catalyst $cdt as Avro $at (${avro.getFullName})")
    }
    f
  }

  private def hasNullBranch(avro: Schema): Boolean =
    avro.getType == UNION && avro.getTypes.asScala.exists(_.getType == NULL)

  private def nullWrap(f: Any => Any, nullable: Boolean, avro: Schema): Any => Any =
    if (!nullable) f
    else v => if (v == null) {
      if (!hasNullBranch(avro) && avro.getType != NULL)
        throw new IllegalArgumentException(
          s"null value for non-nullable Avro schema ${avro.getFullName}")
      null
    } else f(v)

  /** Positional accessor on SpecializedGetters for a Catalyst type. */
  private def elementGetter(dt: DataType): (SpecializedGetters, Int) => Any = dt match {
    case BooleanType => (g, i) => g.getBoolean(i)
    case ByteType => (g, i) => g.getByte(i).toInt
    case ShortType => (g, i) => g.getShort(i).toInt
    case IntegerType | DateType => (g, i) => g.getInt(i)
    case LongType | TimestampType | TimestampNTZType => (g, i) => g.getLong(i)
    case FloatType => (g, i) => g.getFloat(i)
    case DoubleType => (g, i) => g.getDouble(i)
    case StringType => (g, i) => g.getUTF8String(i)
    case BinaryType => (g, i) => g.getBinary(i)
    case d: DecimalType => (g, i) => g.getDecimal(i, d.precision, d.scale)
    case st: StructType => (g, i) => g.getStruct(i, st.size)
    case _: ArrayType => (g, i) => g.getArray(i)
    case _: MapType => (g, i) => g.getMap(i)
    case NullType => (_, _) => null
    case other => throw new IllegalArgumentException(s"unsupported getter type $other")
  }

  // ======================================================= Avro→Catalyst

  /** Value deserializer; for RECORD schemas produces [[InternalRow]]. */
  def avroToCatalyst(avroSchema: Schema, catalystType: DataType): Any => Any =
    makeReader(nonNull(avroSchema), catalystType)

  private def makeReader(avro0: Schema, dt: DataType): Any => Any = {
    val avro = nonNull(avro0)
    (avro.getType, dt) match {
      case (BOOLEAN, BooleanType) => identity
      case (INT, IntegerType | DateType) => v => v.asInstanceOf[Number].intValue()
      case (INT, LongType) => v => v.asInstanceOf[Number].longValue()
      case (LONG, LongType) => identity
      case (LONG, TimestampType | TimestampNTZType) => avro.getLogicalType match {
        case _: LogicalTypes.TimestampMillis => v => v.asInstanceOf[Long] * 1000L
        case _ => identity
      }
      case (FLOAT, FloatType) => identity
      case (FLOAT, DoubleType) => v => v.asInstanceOf[Float].toDouble
      case (DOUBLE, DoubleType) => identity
      case (STRING | ENUM, StringType) => v => UTF8String.fromString(v.toString)
      case (BYTES, BinaryType) => v => {
        val bb = v.asInstanceOf[ByteBuffer]
        val bytes = new Array[Byte](bb.remaining())
        bb.duplicate().get(bytes)
        bytes
      }
      case (FIXED, BinaryType) => v => v.asInstanceOf[GenericFixed].bytes().clone()
      case (FIXED | BYTES, d: DecimalType) =>
        val lt = LogicalTypes.decimal(d.precision, d.scale)
        v => {
          val big = v match {
            case fixed: GenericFixed => decimalConversion.fromFixed(fixed, avro, lt)
            case bb: ByteBuffer => decimalConversion.fromBytes(bb, avro, lt)
          }
          Decimal(big, d.precision, d.scale)
        }
      case (ARRAY, ArrayType(et, _)) =>
        val elemR = makeReader(avro.getElementType, et)
        v => {
          val in = v.asInstanceOf[java.util.Collection[Any]]
          val out = new Array[Any](in.size())
          val it = in.iterator(); var i = 0
          while (it.hasNext) {
            val e = it.next()
            out(i) = if (e == null) null else elemR(e)
            i += 1
          }
          new GenericArrayData(out)
        }
      case (MAP, MapType(StringType, vt, _)) =>
        val valR = makeReader(avro.getValueType, vt)
        v => {
          val in = v.asInstanceOf[java.util.Map[Any, Any]]
          val keys = new Array[Any](in.size())
          val vals = new Array[Any](in.size())
          val it = in.entrySet().iterator(); var i = 0
          while (it.hasNext) {
            val e = it.next()
            keys(i) = UTF8String.fromString(e.getKey.toString)
            vals(i) = if (e.getValue == null) null else valR(e.getValue)
            i += 1
          }
          ArrayBasedMapData(keys, vals)
        }
      case (RECORD, st: StructType) =>
        val fieldReaders = st.fields.map { sf =>
          val af = avro.getField(sf.name)
          (af, if (af == null) null else makeReader(af.schema(), sf.dataType))
        }
        v => {
          val rec = v.asInstanceOf[GenericRecord]
          val out = new Array[Any](fieldReaders.length)
          var i = 0
          while (i < fieldReaders.length) {
            val (af, r) = fieldReaders(i)
            if (af != null) {
              val value = rec.get(af.pos())
              out(i) = if (value == null) null else r(value)
            }
            i += 1
          }
          new GenericInternalRow(out)
        }
      case (UNION, LongType) => v => v.asInstanceOf[Number].longValue()
      case (UNION, DoubleType) => v => v.asInstanceOf[Number].doubleValue()
      case (UNION, st: StructType) if st.fields.forall(_.name.startsWith("member")) =>
        // complex union → memberN struct: resolve the branch per value
        val branches = avro.getTypes.asScala.toArray
        val readers = branches.zip(st.fields).map { case (b, f) => makeReader(b, f.dataType) }
        v => {
          val idx = GenericData.get().resolveUnion(avro, v)
          val out = new Array[Any](st.size)
          out(idx) = if (v == null) null else readers(idx)(v)
          new GenericInternalRow(out)
        }
      case (NULL, _) => _ => null
      case (at, cdt) =>
        throw new IllegalArgumentException(s"cannot read Avro $at as Catalyst $cdt")
    }
  }
}
