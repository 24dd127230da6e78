package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** XSD-schema-driven XML *data* parsing (the x_xml_parse bridge): the
  * StructType [[graft.xml.XsdSchemaConverter]] derives from an XSD must
  * drive Spark 4's `from_xml` correctly over payloads shaped like the
  * reference's paired fixtures (basket.xsd+basket.xml: unbounded
  * repeated child entries; complex.xsd: attributes + nesting —
  * reference src/test/resources/xmlSchema/). */
class XmlParseSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  private val basketXsd =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
      |  <xs:element name="basket">
      |    <xs:complexType>
      |      <xs:sequence>
      |        <xs:element name="entry" minOccurs="0" maxOccurs="unbounded">
      |          <xs:complexType>
      |            <xs:sequence>
      |              <xs:element name="key" minOccurs="0" type="xs:long"/>
      |              <xs:element name="value" minOccurs="0" type="xs:string"/>
      |            </xs:sequence>
      |          </xs:complexType>
      |        </xs:element>
      |      </xs:sequence>
      |      <xs:attribute name="owner" type="xs:string" use="required"/>
      |    </xs:complexType>
      |  </xs:element>
      |</xs:schema>""".stripMargin

  test("converted XSD drives from_xml: repeated entries, attribute, nested text") {
    val st = graft.xml.XsdSchemaConverter.read(basketXsd, 5)("basket")
      .dataType.asInstanceOf[StructType]
    // the schema the parse runs under: entry is array<struct>, owner an attr
    assert(st("entry").dataType.isInstanceOf[ArrayType])
    assert(st.fieldNames.contains("_owner"))
    val xml =
      "<basket owner=\"ada\">" +
        "<entry><key>9027</key><value>glasstop stove in black</value></entry>" +
        "<entry><key>288</key><value>wooden spoon</value></entry>" +
      "</basket>"
    val row = Seq(xml).toDF("x")
      .select(from_xml(col("x"), st).as("p"))
      .select(col("p._owner").as("owner"),
        size(col("p.entry")).as("n"),
        col("p.entry")(0).getField("key").as("k0"),
        col("p.entry")(1).getField("value").as("v1"))
      .head()
    assert(row.getString(0) == "ada")
    assert(row.getInt(1) == 2)
    assert(row.getLong(2) == 9027L)
    assert(row.getString(3) == "wooden spoon")
  }

  test("missing optional repeated element parses to null array, not a failure") {
    val st = graft.xml.XsdSchemaConverter.read(basketXsd, 5)("basket")
      .dataType.asInstanceOf[StructType]
    val row = Seq("<basket owner=\"bo\"></basket>").toDF("x")
      .select(from_xml(col("x"), st).as("p"))
      .select(col("p._owner"), col("p.entry")).head()
    assert(row.getString(0) == "bo")
    assert(row.isNullAt(1))
  }

  test("x_xml_parse gate runs end-to-end at sf0.001 with parsed-struct facts") {
    val df = graft.queries.Serde.xmlParse(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every row's facts came through the XML roundtrip: status is a
    // single char, prio non-empty, and items imply positive sums
    assert(rows.forall(r => r.getString(1).length == 1))
    assert(rows.forall(r => r.getString(2).nonEmpty))
    assert(rows.filter(_.getLong(3) > 0).forall(r =>
      r.getLong(4) > 0 && r.getLong(5) > 0))
  }
}
