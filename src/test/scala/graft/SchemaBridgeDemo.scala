package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object SchemaBridgeDemo {
  def main(args: Array[String]): Unit = {
    // --- XSD contract drives a live Spark XML parse ---
    val xsd = """<?xml version="1.0"?><xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
      <xs:element name="item"><xs:complexType><xs:sequence>
        <xs:element name="sku" type="xs:string"/>
        <xs:element name="qty" type="xs:int"/>
        <xs:element name="price" type="xs:decimal" minOccurs="0"/>
      </xs:sequence><xs:attribute name="pos" type="xs:int" use="required"/>
      </xs:complexType></xs:element></xs:schema>"""
    val itemSchema = graft.xml.XsdSchemaConverter.read(xsd, 10)("item").dataType.asInstanceOf[StructType]
    println("XSD->Spark: " + itemSchema.simpleString)
    val spark = SharedSpark.spark
    import spark.implicits._
    val xml = Seq("""<item pos="1"><sku>A-9</sku><qty>4</qty><price>9.50</price></item>""",
                  """<item pos="2"><sku>B-3</sku><qty>1</qty></item>""").toDF("raw")
    val parsed = xml.select(from_xml(col("raw"), itemSchema).as("r")).select("r.*")
    parsed.collect().foreach(r => println("XML row: " + r))
    // --- Catalyst -> Avro schema accepted by the Avro runtime ---
    val avroSchema = graft.avro.AvroSchemaConverter.toAvroType(
      StructType(Seq(StructField("id", LongType, false), StructField("name", StringType, true))), false, "rec", "g")
    val rec = new org.apache.avro.generic.GenericRecordBuilder(avroSchema).set("id", 42L).build()
    println("Avro rec: " + rec + " schema=" + avroSchema.toString)
    // PROBE: non-string map keys rejected
    try graft.avro.AvroSchemaConverter.toAvroType(MapType(IntegerType, StringType), false, "m", "")
    catch { case e: Throwable => println("map-key-err: " + e.getMessage) }
    // PROBE: garbage XSD
    try graft.xml.XsdSchemaConverter.read("<not-xsd/>", 5)
    catch { case e: Throwable => println("bad-xsd-err: " + e.getClass.getSimpleName) }
    spark.stop()
  }
}
