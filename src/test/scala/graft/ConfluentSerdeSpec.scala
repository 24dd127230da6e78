package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterEach
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.confluent._
import graft.registry.{ConfluentAvroRegistry, HttpSchemaRegistry, InMemorySchemaRegistry, IncompatibleSchemaException, SchemaRegistryClient, SubjectType}

/** The full serde behavior suite, abstract over the registry client so the
  * SAME tests run against the in-memory store and the HTTP client (via an
  * in-test stub REST server) — reference parity for the remote
  * `CachedSchemaRegistryClient` path (ConfluentClient.scala:39). */
abstract class ConfluentSerdeBehaviors extends AnyFunSuite with BeforeAndAfterEach {
  import SharedSpark._
  import spark.implicits._

  protected def client: SchemaRegistryClient

  test("avro roundtrip: DataFrame -> confluent bytes -> DataFrame") {
    val df = Seq((1L, "ann", 3.5, true), (2L, "bob", -1.25, false))
      .toDF("id", "name", "score", "ok")
    val encoded = df.select(
      to_confluent_avro(struct($"id", $"name", $"score", $"ok"),
        "t1", SubjectType.value, client).as("payload"))
    val bytes = encoded.collect().map(_.getAs[Array[Byte]]("payload"))
    // wire format: magic 0x0 + 4-byte BE id
    assert(bytes.forall(_(0) == 0x0))
    val decoded = encoded.select(
      from_confluent_avro($"payload", "t1", SubjectType.value, client).as("r"))
      .select("r.*")
    assert(decoded.collect().toSet == df.collect().toSet)
  }

  test("avro roundtrip: nested struct, array, map, decimal, date, timestamp") {
    val df = spark.sql(
      """SELECT named_struct(
        |  'xs', array(1, 2, 3),
        |  'm', map('a', 10L, 'b', 20L),
        |  'dec', cast(12.34 as decimal(10,2)),
        |  'd', date'2024-05-06',
        |  'ts', timestamp'2024-05-06 07:08:09.123456',
        |  'inner', named_struct('u', 'x', 'v', 9)
        |) AS s""".stripMargin)
    val back = df.select(
      to_confluent_avro($"s", "t2", SubjectType.value, client).as("b"))
      .select(from_confluent_avro($"b", "t2", SubjectType.value, client).as("r"))
      .select("r.*")
    val row = back.collect().head
    assert(row.getSeq[Int](row.fieldIndex("xs")).toList == List(1, 2, 3))
    assert(row.getAs[Map[String, Long]]("m") == Map("a" -> 10L, "b" -> 20L))
    assert(row.getAs[java.math.BigDecimal]("dec").toString == "12.34")
    assert(row.getAs[java.sql.Date]("d").toString == "2024-05-06")
    assert(row.getAs[java.sql.Timestamp]("ts").toString == "2024-05-06 07:08:09.123456")
    assert(row.getAs[Row]("inner") == Row("x", 9))
  }

  test("avro roundtrip: null handling for optional fields") {
    val df = Seq((1L, Some("x")), (2L, None)).toDF("id", "opt")
    val back = df.select(
      to_confluent_avro(struct($"id", $"opt"), "t3", SubjectType.value, client).as("b"))
      .select(from_confluent_avro($"b", "t3", SubjectType.value, client).as("r"))
      .select("r.*")
    assert(back.collect().toSet == Set(Row(1L, "x"), Row(2L, null)))
  }

  test("schema evolution: records written with v1 read under evolved v2 subject schema") {
    val reg = new ConfluentAvroRegistry(client)
    // write v1 records
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val v1bytes = v1.select(
      to_confluent_avro(struct($"id", $"name"), "evo", SubjectType.value, client).as("b"))
      .collect().map(_.getAs[Array[Byte]]("b"))
    // evolve the subject: add nullable field (default null)
    import org.apache.spark.sql.types._
    val v2 = graft.avro.AvroSchemaConverter.toAvroType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("extra", StringType, nullable = true))), nullable = false)
    reg.setOrUpdateSchema("evo-value", v2, updateAllowed = true)
    // old bytes decode under the NEW reader schema: extra = null
    val bytesDf = v1bytes.toSeq.toDF("b")
    val decoded = bytesDf.select(
      from_confluent_avro($"b", "evo", SubjectType.value, client).as("r")).select("r.*")
    assert(decoded.columns.toSeq == Seq("id", "name", "extra"))
    assert(decoded.collect().toSet == Set(Row(1L, "a", null), Row(2L, "b", null)))
  }

  test("schema evolution on write: v1 rows serialized under the evolved v2 subject schema") {
    // The reference's own ignore'd limitation (its positional serializer
    // can't do this, ConfluentAvroCatalystTest.scala:79-91): the subject
    // has already evolved to v2 when a v1-shaped writer shows up.
    val reg = new ConfluentAvroRegistry(client)
    import org.apache.spark.sql.types._
    val v2 = graft.avro.AvroSchemaConverter.toAvroType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("extra", StringType, nullable = true))), nullable = false)
    val (v2id, _) = reg.setOrUpdateSchema("wevo-value", v2)
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    // flag OFF = reference behavior: the v1 data schema would need to
    // REGISTER as a new version, refused without updateAllowed
    intercept[IncompatibleSchemaException] {
      v1.select(to_confluent_avro(struct($"id", $"name"), "wevo",
        SubjectType.value, client).as("b")).collect()
    }
    // flag ON: serialize name-resolved under v2 — no new version, the
    // wire id is v2's, and the missing `extra` field fills with its
    // default (null)
    val bytes = v1.select(to_confluent_avro(struct($"id", $"name"), "wevo",
      SubjectType.value, client, evolveToLatest = true).as("b"))
      .collect().map(_.getAs[Array[Byte]]("b"))
    bytes.foreach { b =>
      val buf = java.nio.ByteBuffer.wrap(b)
      assert(buf.get() == 0x0.toByte && buf.getInt() == v2id)
    }
    assert(client.versions("wevo-value") == Seq(1), "evolution write must not register")
    val decoded = bytes.toSeq.toDF("b")
      .select(from_confluent_avro($"b", "wevo", SubjectType.value, client).as("r"))
      .select("r.*")
    assert(decoded.columns.toSeq == Seq("id", "name", "extra"))
    assert(decoded.collect().toSet == Set(Row(1L, "a", null), Row(2L, "b", null)))
    // extra DATA fields stay a loud error — evolution never drops data
    val wide = Seq((1L, "a", 7L)).toDF("id", "name", "unexpected")
    val err = intercept[Exception] {
      wide.select(to_confluent_avro(struct($"id", $"name", $"unexpected"),
        "wevo", SubjectType.value, client, evolveToLatest = true).as("b")).collect()
    }
    assert(err.getMessage != null)
  }

  test("incompatible update rejected; identical re-register is a no-op") {
    val reg = new ConfluentAvroRegistry(client)
    import org.apache.spark.sql.types._
    val s1 = graft.avro.AvroSchemaConverter.toAvroType(StructType(Seq(
      StructField("id", LongType, nullable = false))), nullable = false)
    val (id1, _) = reg.setOrUpdateSchema("c-value", s1)
    assert(reg.setOrUpdateSchema("c-value", s1)._1 == id1)
    // dropping a required field + adding a new required one → new reader
    // cannot read old data
    val s2 = graft.avro.AvroSchemaConverter.toAvroType(StructType(Seq(
      StructField("other", StringType, nullable = false))), nullable = false)
    intercept[IncompatibleSchemaException] {
      reg.setOrUpdateSchema("c-value", s2, updateAllowed = true)
    }
    // and without updateAllowed even compatible changes are refused
    val s3 = graft.avro.AvroSchemaConverter.toAvroType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("extra", StringType, nullable = true))), nullable = false)
    intercept[IncompatibleSchemaException] {
      reg.setOrUpdateSchema("c-value", s3)
    }
  }

  test("json schema compat: widening update allowed, incompatible rejected, mutual-read stricter") {
    import org.apache.spark.sql.graft.ConfluentJsonRegistry
    import org.apache.spark.sql.types._
    val reg = new ConfluentJsonRegistry(client)
    val v1 = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType, nullable = true)))
    reg.setOrUpdateSchema("jc-value", v1, updateAllowed = false)
    // int -> long widening + new OPTIONAL field: backward compatible
    val v2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("extra", DoubleType, nullable = true)))
    reg.setOrUpdateSchema("jc-value", v2, updateAllowed = true)
    assert(reg.latestSparkSchema("jc-value").fieldNames.toSeq == Seq("id", "name", "extra"))
    // new REQUIRED field absent from existing data: rejected
    val bad = StructType(v2.fields :+ StructField("must", StringType, nullable = false))
    intercept[IncompatibleSchemaException] {
      reg.setOrUpdateSchema("jc-value", bad, updateAllowed = true)
    }
    // type narrowing (long -> int): rejected
    val narrow = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType, nullable = true)))
    intercept[IncompatibleSchemaException] {
      reg.setOrUpdateSchema("jc-value", narrow, updateAllowed = true)
    }
    // widening id long->double passes one-way but fails MUTUAL read
    // (old reader can't read doubles as long)
    val widened = StructType(Seq(
      StructField("id", DoubleType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("extra", DoubleType, nullable = true)))
    reg.setOrUpdateSchema("jc2-value", v2, updateAllowed = false)
    intercept[IncompatibleSchemaException] {
      reg.setOrUpdateSchema("jc2-value", widened, updateAllowed = true, mutualReadCheck = true)
    }
    reg.setOrUpdateSchema("jc2-value", widened, updateAllowed = true) // one-way is fine
    // updateAllowed=false still refuses even compatible changes
    intercept[IncompatibleSchemaException] {
      reg.setOrUpdateSchema("jc-value", StructType(v2.fields :+
        StructField("extra2", StringType, nullable = true)), updateAllowed = false)
    }
  }

  test("to_confluent_json eagerCheck registers/validates at plan construction") {
    val df = Seq((1L, "a")).toDF("k", "v")
    // eagerCheck acts at plan-construction time, so it needs columns
    // bound to a DataFrame (unbound $"k" is an unresolved placeholder)
    df.select(to_confluent_json(struct(df("k"), df("v")), "je", SubjectType.value,
      client, eagerCheck = true).as("j"))
    assert(client.getLatest("je-value").isDefined)
    // and an incompatible eager write explodes at plan time, not run time
    intercept[IncompatibleSchemaException] {
      df.select(to_confluent_json(struct(df("k").cast("int").as("k")), "je",
        SubjectType.value, client, updateAllowed = true, eagerCheck = true))
    }
  }

  test("json roundtrip via registry-governed to/from_confluent_json") {
    val df = Seq((5L, "x"), (6L, "y")).toDF("k", "v")
    val jsonDf = df.select(
      to_confluent_json(struct($"k", $"v"), "jt", SubjectType.value, client).as("j"))
    val strs = jsonDf.as[String].collect().toSet
    assert(strs == Set("""{"k":5,"v":"x"}""", """{"k":6,"v":"y"}"""))
    // registration happened at plan time → from_confluent_json can parse
    val back = jsonDf.select(
      from_confluent_json($"j", "jt", SubjectType.value, client).as("r")).select("r.*")
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("references are part of schema identity: same doc, different refs → new id") {
    val c = client
    def rec(name: String) =
      s"""{"type":"record","name":"$name","fields":[{"name":"x","type":"long"}]}"""
    val baseId = c.register("refid-base-value", rec("b"))
    // Confluent includes the reference list in schema identity: the
    // SAME document registered bare, then with a reference, then with
    // the same reference again, yields two distinct ids with the second
    // deduping (round-11 advice: refs were dropped on the existing-id
    // path, so referencedBy under-reported)
    val bare = c.register("refid-user-value", rec("u"))
    val ref = graft.registry.SchemaReference("b", "refid-base-value", 1)
    val withRef = c.register("refid-user-value", rec("u"), Seq(ref))
    assert(bare != withRef, "refs must distinguish otherwise-identical schemas")
    assert(c.register("refid-user-value", rec("u"), Seq(ref)) == withRef)
    assert(c.register("refid-user-value", rec("u")) == bare)
    assert(c.referencedBy("refid-base-value", 1) == Seq(withRef))
    assert(c.versions("refid-user-value") == Seq(1, 2))
    assert(baseId != bare)
  }
}

class ConfluentSerdeSpec extends ConfluentSerdeBehaviors {
  private val regName = "serde-spec"
  override protected def client: SchemaRegistryClient = new InMemorySchemaRegistry(regName)
  override def beforeEach(): Unit = InMemorySchemaRegistry.reset(regName)
}

class HttpConfluentSerdeSpec extends ConfluentSerdeBehaviors
    with org.scalatest.BeforeAndAfterAll {
  private val regName = "serde-http"
  private var server: StubRegistryServer = _

  override def beforeAll(): Unit = { server = new StubRegistryServer(regName) }
  override def afterAll(): Unit = if (server != null) server.stop()
  override def beforeEach(): Unit = InMemorySchemaRegistry.reset(regName)
  override protected def client: SchemaRegistryClient = new HttpSchemaRegistry(server.url)

  test("http client: 404s map to None/empty, ids round-trip, errors surface") {
    val c = client
    assert(c.getById(999999).isEmpty)
    assert(c.getLatest("nope-value").isEmpty)
    val schema = """{"type":"record","name":"r","fields":[{"name":"x","type":"long"}]}"""
    val id = c.register("s p/ecial-value", schema) // subject needs URL-encoding
    assert(c.register("s p/ecial-value", schema) == id) // identical → same id
    assert(c.getById(id).contains(schema))
    assert(c.getLatest("s p/ecial-value").contains((id, schema)))
    assert(c.subjects.contains("s p/ecial-value"))
    intercept[graft.registry.SchemaRegistryHttpException] {
      new HttpSchemaRegistry(server.url + "/badroot").register("x-value", schema)
    }
  }

  test("http client: versions, by-version, references, and soft subject deletion") {
    val c = client
    def rec(name: String, extra: String = "") =
      s"""{"type":"record","name":"$name","fields":[{"name":"x","type":"long"}$extra]}"""
    // two versions under one subject → versions/by-version surface them
    val id1 = c.register("life-value", rec("r"))
    val id2 = c.register("life-value",
      rec("r", ""","""  + """{"name":"y","type":["null","long"],"default":null}"""))
    assert(id1 != id2)
    assert(c.versions("life-value") == Seq(1, 2))
    assert(c.getByVersion("life-value", 1).contains((id1, rec("r"))))
    assert(c.getByVersion("life-value", 2).map(_._1).contains(id2))
    assert(c.getByVersion("life-value", 3).isEmpty)
    assert(c.versions("life-unknown-value").isEmpty)
    // a referencing schema: registered with a reference at version 1
    val refId = c.register("uses-life-value", rec("u"),
      Seq(graft.registry.SchemaReference("r", "life-value", 1)))
    assert(c.referencedBy("life-value", 1) == Seq(refId))
    assert(c.referencedBy("life-value", 2).isEmpty)
    // soft delete: subject + versions gone, issued ids still resolve
    // (written Kafka messages must stay readable), re-delete is empty
    assert(c.deleteSubject("life-value") == Seq(1, 2))
    assert(!c.subjects.contains("life-value"))
    assert(c.versions("life-value").isEmpty)
    assert(c.getLatest("life-value").isEmpty)
    assert(c.getById(id1).contains(rec("r")))
    assert(c.getById(id2).isDefined)
    assert(c.deleteSubject("life-value").isEmpty)
  }

  test("racing setOrUpdateSchema writers: no lost registration, last-writer-wins, advisory compat") {
    import org.apache.avro.Schema
    import graft.registry.ConfluentAvroRegistry
    val reg = new ConfluentAvroRegistry(client)
    def rec(extra: String) = new Schema.Parser().parse(
      s"""{"type":"record","name":"r","fields":[{"name":"x","type":"long"}$extra]}""")
    val sA = rec(""",{"name":"a","type":["null","string"],"default":null}""")
    val sB = rec(""",{"name":"b","type":["null","long"],"default":null}""")
    def race[T](l: => T, r: => T): (Either[Throwable, T], Either[Throwable, T]) = {
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      def run(body: => T) = java.util.concurrent.CompletableFuture.supplyAsync { () =>
        barrier.await(); try Right(body) catch { case e: Throwable => Left(e) }
      }
      val (fa, fb) = (run(l), run(r))
      (fa.get(30, java.util.concurrent.TimeUnit.SECONDS),
        fb.get(30, java.util.concurrent.TimeUnit.SECONDS))
    }
    // identical-document race: the store dedupes under its version lock
    // — every writer gets the SAME id
    val sameIds = (0 until 4).map(_ => java.util.concurrent.CompletableFuture
      .supplyAsync(() => client.register("race-same-value", sA.toString)))
      .map(_.get(30, java.util.concurrent.TimeUnit.SECONDS)).toSet
    assert(sameIds.size == 1)
    // mutually COMPATIBLE writers (each adds its own optional field):
    // every interleaving passes the check, so BOTH must succeed, both
    // ids must permanently resolve to their own schema, and latest is
    // one of the two (last-writer-wins, never torn)
    for (round <- 0 until 10) {
      val subj = s"race-compat-$round-value"
      val (ra, rb) = race(
        reg.setOrUpdateSchema(subj, sA, updateAllowed = true),
        reg.setOrUpdateSchema(subj, sB, updateAllowed = true))
      val (idA, idB) = (ra.toOption.get._1, rb.toOption.get._1)
      assert(client.getById(idA).contains(sA.toString), s"round $round: lost A")
      assert(client.getById(idB).contains(sB.toString), s"round $round: lost B")
      val latest = client.getLatest(subj).map(_._2)
      assert(latest.contains(sA.toString) || latest.contains(sB.toString))
    }
    // mutually INCOMPATIBLE writers (x: string vs x: long — neither
    // reads the other; note string↔bytes WOULD be Avro-promotable):
    // each outcome is success (observed pre-race state) or a loud
    // IncompatibleSchemaException (observed the rival) — never a lost
    // registration, never a torn latest, and at least one lands (both
    // can only throw after observing a registered rival)
    val sX = rec("").toString.replace("\"long\"", "\"string\"")
    val sY = rec("").toString
    var sawBothLand = false
    var sawReject = false
    for (round <- 0 until 10) {
      val subj = s"race-incompat-$round-value"
      val (ra, rb) = race(
        reg.setOrUpdateSchema(subj, new Schema.Parser().parse(sX), updateAllowed = true),
        reg.setOrUpdateSchema(subj, new Schema.Parser().parse(sY), updateAllowed = true))
      val outcomes = Seq(ra, rb)
      outcomes.foreach {
        case Left(e) => assert(e.isInstanceOf[IncompatibleSchemaException],
          s"round $round: unexpected failure $e")
        case Right((id, s)) => assert(client.getById(id).contains(s.toString))
      }
      assert(outcomes.exists(_.isRight), s"round $round: nobody registered")
      if (outcomes.forall(_.isRight)) sawBothLand = true
      if (outcomes.exists(_.isLeft)) sawReject = true
      val latest = client.getLatest(subj).map(_._2)
      assert(outcomes.collect { case Right((_, s)) => s.toString }
        .exists(latest.contains), s"round $round: torn latest $latest")
    }
    // sequential (non-racing) incompatible update still throws — the
    // advisory gate is real whenever the read isn't stale
    val subj = "race-seq-value"
    reg.setOrUpdateSchema(subj, new Schema.Parser().parse(sX), updateAllowed = true)
    intercept[IncompatibleSchemaException] {
      reg.setOrUpdateSchema(subj, new Schema.Parser().parse(sY), updateAllowed = true)
    }
    info(s"race coverage over 10 rounds: bothLand=$sawBothLand reject=$sawReject")
  }

  test("enforcing server: racing incompatible writers can no longer both land") {
    import org.apache.avro.Schema
    import graft.registry.{ConfluentAvroRegistry, SchemaRegistryHttpException}
    val srv = new StubRegistryServer("serde-http-enforced", enforceCompat = true)
    try {
      val http = new HttpSchemaRegistry(srv.url)
      def rec(xType: String, extra: String = "") = new Schema.Parser().parse(
        s"""{"type":"record","name":"r","fields":[{"name":"x","type":"$xType"}$extra]}""")
      val sLong = rec("long")
      val sStr = rec("string") // long↔string: neither reads the other
      val sPlus = rec("long", """,{"name":"a","type":["null","string"],"default":null}""")

      // 1. the gate is server-side: a RAW register (no client-side check
      // at all) of an incompatible schema comes back HTTP 409, while a
      // compatible evolution and an identical re-register both succeed
      val id0 = http.register("enf-a-value", sLong.toString)
      val e = intercept[SchemaRegistryHttpException] {
        http.register("enf-a-value", sStr.toString)
      }
      assert(e.status == 409, s"expected 409, got ${e.status}: ${e.getMessage}")
      assert(http.register("enf-a-value", sPlus.toString) != id0)
      assert(http.register("enf-a-value", sPlus.toString) != id0) // identical dedupes, no check
      assert(http.getLatest("enf-a-value").map(_._2).contains(sPlus.toString))

      // 2. racing mutually incompatible writers: with the atomic
      // server-side gate EXACTLY ONE lands every round (the advisory-
      // only spec above shows both CAN land without it), the loser gets
      // the same IncompatibleSchemaException a sequential caller would,
      // and latest is the winner — never torn
      val reg = new ConfluentAvroRegistry(http)
      for (round <- 0 until 10) {
        val subj = s"enf-race-$round-value"
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        def run(s: Schema) = java.util.concurrent.CompletableFuture.supplyAsync { () =>
          barrier.await()
          try Right(reg.setOrUpdateSchema(subj, s, updateAllowed = true))
          catch { case t: Throwable => Left(t) }
        }
        val (fa, fb) = (run(sLong), run(sStr))
        val outcomes = Seq(fa, fb).map(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
        assert(outcomes.count(_.isRight) == 1,
          s"round $round: expected exactly one winner, got $outcomes")
        outcomes.collect { case Left(t) => t }.foreach { t =>
          assert(t.isInstanceOf[IncompatibleSchemaException],
            s"round $round: loser surfaced $t, not IncompatibleSchemaException")
        }
        val Right((_, winner)) = outcomes.find(_.isRight).get: @unchecked
        assert(http.getLatest(subj).map(_._2).contains(winner.toString),
          s"round $round: torn latest")
      }

      // 3. retry-on-409 re-judges against the schema that actually won:
      // a client whose first latest-read is stale (sees an empty
      // subject) registers, gets 409 from the server's gate, re-reads,
      // and converges to the sequential verdict instead of surfacing a
      // raw HTTP error
      http.register("enf-stale-value", sLong.toString)
      // delegate-all wrapper so the stale-read overrides below stay
      // focused on the one method they perturb
      class Delegating(u: graft.registry.SchemaRegistryClient)
          extends graft.registry.SchemaRegistryClient {
        override def register(s: String, j: String): Int = u.register(s, j)
        override def register(s: String, j: String,
            r: Seq[graft.registry.SchemaReference]): Int = u.register(s, j, r)
        override def getById(id: Int): Option[String] = u.getById(id)
        override def getLatest(s: String): Option[(Int, String)] = u.getLatest(s)
        override def versions(s: String): Seq[Int] = u.versions(s)
        override def getByVersion(s: String, v: Int): Option[(Int, String)] =
          u.getByVersion(s, v)
        override def deleteSubject(s: String): Seq[Int] = u.deleteSubject(s)
        override def referencedBy(s: String, v: Int): Seq[Int] =
          u.referencedBy(s, v)
        override def subjects: Set[String] = u.subjects
      }
      val staleOnce = new Delegating(http) {
        private val reads = new java.util.concurrent.atomic.AtomicInteger
        override def getLatest(s: String): Option[(Int, String)] =
          if (reads.getAndIncrement() == 0) None else http.getLatest(s)
      }
      val staleReg = new ConfluentAvroRegistry(staleOnce)
      val ex = intercept[IncompatibleSchemaException] {
        staleReg.setOrUpdateSchema("enf-stale-value", sStr, updateAllowed = true)
      }
      assert(ex.getMessage.contains("incompatible"))
      // same stale start, compatible schema: the server's gate passes it
      // straight through — staleness costs nothing when the write is legal
      val staleOnce2 = new Delegating(http) {
        private val reads = new java.util.concurrent.atomic.AtomicInteger
        override def getLatest(s: String): Option[(Int, String)] =
          if (reads.getAndIncrement() == 0) None else http.getLatest(s)
      }
      val (idP, _) = new ConfluentAvroRegistry(staleOnce2)
        .setOrUpdateSchema("enf-stale-value", sPlus, updateAllowed = true)
      assert(http.getById(idP).contains(sPlus.toString))
    } finally {
      srv.stop()
      InMemorySchemaRegistry.reset("serde-http-enforced")
    }
  }

  test("http client is task-serializable (registry lookups from executors)") {
    import SharedSpark.spark
    import spark.implicits._
    val c = client
    val schema = """{"type":"record","name":"r","fields":[{"name":"x","type":"long"}]}"""
    val id = c.register("ser-value", schema)
    // force the client through task serialization and back
    val got = spark.range(4).repartition(4)
      .mapPartitions(_ => Iterator(c.getById(id).get)).distinct().collect()
    assert(got.toSeq == Seq(schema))
  }
}
