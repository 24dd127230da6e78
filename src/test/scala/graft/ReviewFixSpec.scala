package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression coverage for the round-1 code-review findings. */
class ReviewFixSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  test("serde handles promotable [int,long]/[float,double] unions") {
    import graft.avro.AvroCatalystSerde
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"il","type":["int","long"]},
        |{"name":"fd","type":["float","double"]}]}""".stripMargin)
    val st = graft.avro.AvroSchemaConverter.toSqlType(schema).dataType.asInstanceOf[StructType]
    assert(st("il").dataType == LongType && st("fd").dataType == DoubleType)
    val reader = AvroCatalystSerde.avroToCatalyst(schema, st)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("il", 42) // writer chose the int branch
    rec.put("fd", 1.5f) // writer chose the float branch
    val row = reader(rec).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getLong(0) == 42L && row.getDouble(1) == 1.5)
    // write direction picks the wider branch
    val writer = AvroCatalystSerde.catalystToAvro(st, schema)
    val out = writer(org.apache.spark.sql.catalyst.InternalRow(7L, 2.5))
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
    assert(out.get("il") == 7L && out.get("fd") == 2.5)
  }

  test("shingles of a too-short document is empty, not broken (ANSI-safe)") {
    val r = Seq("one two", "a b c d").toDF("text")
      .select(graft.text.shingles(col("text"), 3).as("sh"))
      .collect()
    assert(r(0).getSeq[String](0).isEmpty)
    assert(r(1).getSeq[String](0) == Seq("a b c", "b c d"))
  }

  test("resolveExpression caseSensitive=false matches mixed-case attributes") {
    import org.apache.spark.sql.graft.ExpressionEvaluator
    val schema = StructType(Seq(StructField("MyField", IntegerType)))
    val e = ExpressionEvaluator.resolveExpression(expr("myfield + 1"), schema,
      caseSensitive = false)
    assert(e.resolved)
    intercept[Exception] {
      val e2 = ExpressionEvaluator.resolveExpression(expr("myfield + 1"), schema,
        caseSensitive = true)
      require(e2.resolved)
    }
  }

  test("recursive JSON Schema $ref is rejected cleanly") {
    val recursive =
      """{"type":"object","properties":{"child":{"$ref":"#/definitions/node"}},
        |"definitions":{"node":{"type":"object",
        |  "properties":{"next":{"$ref":"#/definitions/node"}}}}}""".stripMargin
    val ex = intercept[graft.jsonschema.JsonSchemaConverter.JsonSchemaException] {
      graft.jsonschema.JsonSchemaConverter.toSparkSchema(recursive)
    }
    assert(ex.getMessage.contains("recursive"))
  }

  test("XSD element ref occurs do not leak across use sites") {
    val xsd =
      """<?xml version="1.0"?><xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
        |<xs:element name="root"><xs:complexType><xs:sequence>
        |  <xs:element ref="item" maxOccurs="unbounded"/>
        |  <xs:element ref="item2"/>
        |</xs:sequence></xs:complexType></xs:element>
        |<xs:element name="item" type="xs:string"/>
        |<xs:element name="item2" type="xs:string"/>
        |</xs:schema>""".stripMargin
    val st = graft.xml.XsdSchemaConverter.read(xsd, 5)
    val root = st("root").dataType.asInstanceOf[StructType]
    // first ref is repeated -> array; second is plain string
    assert(root("item").dataType.isInstanceOf[ArrayType])
    assert(root("item2").dataType == StringType)
    // the GLOBAL item element itself must not have been mutated: its
    // top-level struct entry is scalar, and non-nullable occurs intact
    assert(st("item").dataType == StringType)
  }

  test("truncated confluent frame yields a named wire-format error") {
    import graft.confluent._
    import graft.registry.{InMemorySchemaRegistry, SubjectType}
    val client = new InMemorySchemaRegistry("reviewfix")
    Seq((1L, "a")).toDF("id", "name")
      .select(to_confluent_avro(struct($"id", $"name"), "rf", SubjectType.value, client).as("b"))
      .collect()
    val ex = intercept[Exception] {
      Seq(Array[Byte](0, 0)).toDF("b")
        .select(from_confluent_avro($"b", "rf", SubjectType.value, client)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("truncated wire-format frame")))
  }

  test("banded Hamming pairs == quadratic join on real fps + planted radii 0..7") {
    // Round-13 advice: the DuckDB oracles replay the SAME Manku
    // block-pair pigeonhole as Dedup.hammingPairs, so a radius/block
    // change that silently broke the premise could slip past the
    // hash-match (both sides would lose the same pairs). This pins the
    // banded path against an algorithm-independent quadratic crossJoin
    // at sf0.001: md5-derived base fingerprints (~32 apart pairwise)
    // plus, for every 25th doc, planted variants at EXACT Hamming
    // distance k for k = 0..7 — including k = 7, one past the radius,
    // which both paths must exclude.
    val docs = Tables.documents(spark, sf0001)
    val base = docs.select(col("doc_id").as("doc"),
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long")
        // spread over all 64 bits (the 15-hex conv covers only 60)
        .bitwiseXOR(shiftleft(col("doc_id") % 16, 60)).as("sh"))
    val m = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
    // k flips at deterministic positions 64/k apart, phase doc_id%7
    val plants = (0 to 7).map { k =>
      val flips = (0 until k).map(j => (j * 64 / math.max(k, 1)) % 64)
      base.filter(col("doc") % 25 === 0)
        .select((col("doc") + lit((k + 1) * m)).as("doc"),
          flips.foldLeft(col("sh")) { (acc, p) =>
            acc.bitwiseXOR(shiftleft(lit(1L), (p + 3) % 64))
          }.as("sh"))
    }.reduce(_ unionByName _)
    val fps = base.unionByName(plants).cache()
    try {
      val banded = graft.dedup.Dedup.hammingPairs(fps, maxHamming = 6)
        .select("doc_a", "doc_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = fps.as("x").crossJoin(fps.as("y"))
        .filter(col("x.doc") < col("y.doc"))
        .select(col("x.doc"), col("y.doc"),
          bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("h"))
        .filter(col("h") <= 6).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded == brute,
        s"banded=${banded.size} brute=${brute.size} " +
          s"missed=${(brute -- banded).take(3)} extra=${(banded -- brute).take(3)}")
      // the plant ladder actually exercised every radius incl. the edge
      val radii = brute.map(_._3)
      assert((0 to 6).forall(radii.contains), s"radii covered: $radii")
      assert(!banded.exists(_._3 > 6))
      // the TAGGED single-join variant partitions the band space by
      // tag: per-tag results must equal separate hammingPairs calls,
      // and no pair may cross tags (mm_dup_union's one-join fold)
      val tagged3 = graft.dedup.Dedup.hammingPairsTagged(
        fps.withColumn("tag",
          when(col("doc") % 3 === 0, "p").when(col("doc") % 3 === 1, "a")
            .otherwise("v")), maxHamming = 6)
        .collect()
        .map(r => (r.getString(2), r.getLong(0), r.getLong(1), r.getInt(3)))
        .groupBy(_._1).view
        .mapValues(_.map(t => (t._2, t._3, t._4)).toSet).toMap
      for ((tagName, rem) <- Seq(("p", 0L), ("a", 1L), ("v", 2L))) {
        val solo = graft.dedup.Dedup.hammingPairs(
          fps.filter(col("doc") % 3 === rem), maxHamming = 6)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(tagged3.getOrElse(tagName, Set.empty) == solo,
          s"tag $tagName diverges from the separate banded join")
      }
    } finally fps.unpersist()
  }
}
