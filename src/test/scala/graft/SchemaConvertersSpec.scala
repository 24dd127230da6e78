package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.avro.{LogicalTypes, Schema}
import org.apache.spark.sql.types._

import graft.avro.AvroSchemaConverter
import graft.jsonschema.JsonSchemaConverter
import graft.xml.XsdSchemaConverter

class SchemaConvertersSpec extends AnyFunSuite {

  // ----------------------------------------------------------------- Avro

  private val complexStruct = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("l", LongType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("d", DoubleType, nullable = false),
    StructField("dec", DecimalType(10, 2), nullable = true),
    StructField("dt", DateType, nullable = false),
    StructField("ts", TimestampType, nullable = true),
    StructField("bin", BinaryType, nullable = true),
    StructField("arr", ArrayType(StringType, containsNull = true), nullable = true),
    StructField("m", MapType(StringType, LongType, valueContainsNull = false), nullable = true),
    StructField("nested", StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true))), nullable = true)))

  test("avro: catalyst -> avro -> catalyst roundtrip preserves structure + nullability") {
    val avro = AvroSchemaConverter.toAvroType(complexStruct, nullable = false, "rec", "ns")
    val back = AvroSchemaConverter.toSqlType(avro)
    assert(back.dataType == complexStruct)
  }

  test("avro: nullable fields are null-FIRST unions with default null") {
    val avro = AvroSchemaConverter.toAvroType(complexStruct, nullable = false, "rec", "ns")
    val lField = avro.getField("l")
    assert(lField.schema().getType == Schema.Type.UNION)
    assert(lField.schema().getTypes.get(0).getType == Schema.Type.NULL)
    assert(lField.hasDefaultValue)
  }

  test("avro: logical types land correctly") {
    val avro = AvroSchemaConverter.toAvroType(complexStruct, nullable = false, "rec", "ns")
    assert(avro.getField("dt").schema().getLogicalType.isInstanceOf[LogicalTypes.Date])
    val tsSchema = avro.getField("ts").schema().getTypes.get(1)
    assert(tsSchema.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros])
    val decSchema = avro.getField("dec").schema().getTypes.get(1)
    val dl = decSchema.getLogicalType.asInstanceOf[LogicalTypes.Decimal]
    assert(dl.getPrecision == 10 && dl.getScale == 2)
    assert(decSchema.getType == Schema.Type.FIXED)
  }

  test("avro: [int,long] and [float,double] unions collapse; complex unions become memberN struct") {
    def u(ts: Schema.Type*) = Schema.createUnion(ts.map(Schema.create).asJava)
    assert(AvroSchemaConverter.toSqlType(u(Schema.Type.INT, Schema.Type.LONG)).dataType == LongType)
    assert(AvroSchemaConverter.toSqlType(u(Schema.Type.FLOAT, Schema.Type.DOUBLE)).dataType == DoubleType)
    val mixed = AvroSchemaConverter.toSqlType(u(Schema.Type.STRING, Schema.Type.INT)).dataType
    assert(mixed == StructType(Seq(
      StructField("member0", StringType), StructField("member1", IntegerType))))
  }

  test("avro: enum reads as string; recursive record rejected") {
    val enumSchema = Schema.createEnum("E", null, "ns", Seq("A", "B").asJava)
    assert(AvroSchemaConverter.toSqlType(enumSchema).dataType == StringType)
    val recursive = new Schema.Parser().parse(
      """{"type":"record","name":"Node","fields":[
        |{"name":"next","type":["null","Node"]}]}""".stripMargin)
    intercept[AvroSchemaConverter.IncompatibleSchemaException] {
      AvroSchemaConverter.toSqlType(recursive)
    }
  }

  test("avro: minBytesForPrecision") {
    assert(AvroSchemaConverter.minBytesForPrecision(1) == 1)
    assert(AvroSchemaConverter.minBytesForPrecision(10) == 5)
    assert(AvroSchemaConverter.minBytesForPrecision(38) == 16)
  }

  // ---------------------------------------------------------- JSON Schema

  private def loadResource(name: String): String = {
    val src = scala.io.Source.fromResource(name)
    try src.mkString finally src.close()
  }

  test("json-schema: fixture converts with required/nullable, refs, maps, date-time") {
    val st = JsonSchemaConverter.toSparkSchema(loadResource("schemas/profile.schema.json"))
    assert(st("id") == StructField("id", LongType, nullable = false))
    assert(st("name").nullable == false)
    assert(st("score") == StructField("score", DoubleType, nullable = true))
    assert(st("joined").dataType == TimestampType)
    // in required list BUT has ["string","null"] type → nullable wins
    assert(st("nickname") == StructField("nickname", StringType, nullable = true))
    assert(st("tags").dataType == ArrayType(StringType, containsNull = false))
    val addr = st("address").dataType.asInstanceOf[StructType]
    assert(!addr("city").nullable && addr("zip").nullable)
    assert(st("counters").dataType == MapType(StringType, LongType, valueContainsNull = false))
    val friend = st("friend").dataType.asInstanceOf[StructType]
    assert(!friend("fid").nullable && friend("fname").nullable)
  }

  test("json-schema: spark -> json -> spark roundtrip") {
    val st = JsonSchemaConverter.toSparkSchema(loadResource("schemas/profile.schema.json"))
    val jsonStr = JsonSchemaConverter.fromSparkSchemaString(st)
    val back = JsonSchemaConverter.toSparkSchema(jsonStr)
    assert(back == st)
  }

  test("json-schema: strict rejects multi-type, lenient degrades to string") {
    val multi = """{"type":"object","properties":{"x":{"type":["integer","string"]}}}"""
    intercept[JsonSchemaConverter.JsonSchemaException] {
      JsonSchemaConverter.toSparkSchema(multi, strictTyping = true)
    }
    val st = JsonSchemaConverter.toSparkSchema(multi, strictTyping = false)
    assert(st("x").dataType == StringType)
  }

  test("json-schema: decimal scale drives integer-vs-number on write") {
    val st = StructType(Seq(
      StructField("i0", DecimalType(20, 0)), StructField("n2", DecimalType(20, 2))))
    val j = JsonSchemaConverter.fromSparkSchemaString(st)
    assert(j.contains(""""i0":{"type":"integer"}"""))
    assert(j.contains(""""n2":{"type":"number"}"""))
  }

  // ------------------------------------------------------------------ XSD

  private lazy val xsd = XsdSchemaConverter.read(loadResource("schemas/order.xsd"), maxRecursion = 3)

  test("xsd: root elements, sequences, choice, optional, arrays") {
    val order = xsd("order").dataType.asInstanceOf[StructType]
    assert(order("id") == StructField("id", LongType, nullable = false))
    assert(order("created").dataType == TimestampType)
    assert(order("total").dataType == DecimalType(38, 2))
    assert(order("note").nullable)
    // repeated element → array of struct with attribute field
    val item = order("item")
    assert(item.dataType.isInstanceOf[ArrayType])
    val itemSt = item.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(itemSt("qty").dataType == IntegerType)
    assert(itemSt("_pos") == StructField("_pos", IntegerType, nullable = false))
    // choice members both present, nullable driven by minOccurs
    assert(order.fieldNames.contains("email") && order.fieldNames.contains("phone"))
    // element ref resolved with minOccurs=0 propagated
    val ship = order("shipping")
    assert(ship.nullable)
    assert(ship.dataType.asInstanceOf[StructType]("zip").dataType == DecimalType(38, 0))
    // xs:any wildcard column
    assert(order.fieldNames.contains(XsdSchemaConverter.WildcardColName))
    // attributes incl. attributeGroup
    assert(order("_status") == StructField("_status", StringType, nullable = false))
    assert(order("_createdBy").dataType == StringType)
    assert(order("_version").dataType == IntegerType)
  }

  test("xsd: recursion depth-limited; simpleContent produces _VALUE; documentation comment kept") {
    val cat = xsd("category").dataType.asInstanceOf[StructType]
    // maxRecursion=3 named-type expansions → root + 3 nested levels,
    // innermost has its 'sub' dropped
    def depth(st: StructType, n: Int = 1): Int =
      st.fields.find(_.name == "sub") match {
        case Some(f) =>
          depth(f.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType], n + 1)
        case None => n
      }
    assert(depth(cat) == 4)
    val measured = xsd("measured").dataType.asInstanceOf[StructType]
    assert(measured("_VALUE").dataType == DoubleType)
    assert(measured("_unit") == StructField("_unit", StringType, nullable = false))
    assert(xsd("order").getComment().contains("A customer order"))
  }
}
