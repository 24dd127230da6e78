package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.avro.{AvroSchemaConverter, SchemaDiff}

case class StrictP(a: Int)
case class StrictOpt(a: Option[Int])
sealed trait Hinted
case class HintA(n: Int) extends Hinted
case class HintB(s: String) extends Hinted

/** Coverage for the long-tail reference parity items: schema diff,
  * json4s shims, hadoop-conf builder, parquet binding committer class. */
class ParitySpec extends AnyFunSuite {

  test("SchemaDiff reports field-level differences and tolerates enum~string") {
    val s1 = AvroSchemaConverter.toAvroType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("nested", StructType(Seq(
        StructField("x", IntegerType, nullable = false))), nullable = false))),
      nullable = false, "r", "ns")
    val s2 = AvroSchemaConverter.toAvroType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("extra", DoubleType, nullable = true),
      StructField("nested", StructType(Seq(
        StructField("x", StringType, nullable = false))), nullable = false))),
      nullable = false, "r", "ns")
    val d = SchemaDiff.diff(s1, s2)
    assert(d.exists(_.contains("name")) && d.exists(_.contains("only in first")))
    assert(d.exists(_.contains("extra")) && d.exists(_.contains("only in second")))
    assert(d.exists(m => m.contains("nested.x") && m.contains("INT") && m.contains("STRING")))
    assert(SchemaDiff.diff(s1, s1).isEmpty)
    // enum vs string tolerated
    val enumS = new org.apache.avro.Schema.Parser().parse(
      """{"type":"enum","name":"E","symbols":["A"]}""")
    val strS = org.apache.avro.Schema.create(org.apache.avro.Schema.Type.STRING)
    assert(SchemaDiff.diff(enumS, strS).isEmpty)
  }

  test("Json4sCompat strict formats fail loudly instead of swallowing bad values") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val strict = graft.util.Json4sCompat.getStrictSerializationFormat
    assert(JsonMethods.parse("""{"a": 1}""").extract[StrictP](strict, manifest[StrictP]) == StrictP(1))
    // lenient formats silently turn an ill-typed optional into None;
    // strict option parsing raises
    val badOpt = JsonMethods.parse("""{"a": "not-an-int"}""")
    assert(badOpt.extract[StrictOpt](DefaultFormats, manifest[StrictOpt]) == StrictOpt(None))
    intercept[MappingException] {
      badOpt.extract[StrictOpt](strict, manifest[StrictOpt])
    }
  }

  test("Json4sCompat typeHints formats round-trip polymorphic values") {
    import org.json4s._
    import org.json4s.jackson.Serialization
    val hinted = graft.util.Json4sCompat.getStrictSerializationFormat(
      ShortTypeHints(List(classOf[HintA], classOf[HintB]), "kind"))
    val out = Serialization.write(List[Hinted](HintA(1), HintB("x")))(hinted)
    assert(out.contains(""""kind":"HintA""""))
    val back = Serialization.read[List[Hinted]](out)(hinted, manifest[List[Hinted]])
    assert(back == List(HintA(1), HintB("x")))
    // strictness is preserved alongside the hints
    intercept[MappingException] {
      Serialization.read[HintA]("""{"kind":"HintA","n":"bad"}""")(hinted, manifest[HintA])
    }
  }

  test("HadoopConf builds a Configuration from properties") {
    val conf = org.apache.spark.sql.graft.HadoopConf.fromProperties(
      Map("fs.s3a.endpoint" -> "http://localhost:9000", "my.key" -> "v"))
    assert(conf.get("fs.s3a.endpoint") == "http://localhost:9000")
    assert(conf.get("my.key") == "v")
  }

  test("BindingParquetOutputCommitter is installable as the parquet committer") {
    import SharedSpark._
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_bpc_").toString + "/t"
    spark.conf.set("spark.sql.parquet.output.committer.class",
      "org.apache.spark.sql.graft.cloud.BindingParquetOutputCommitter")
    try {
      Seq((1, "x")).toDF("id", "s").write.parquet(out)
      assert(spark.read.parquet(out).count() == 1)
    } finally spark.conf.unset("spark.sql.parquet.output.committer.class")
  }
}
