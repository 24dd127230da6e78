package org.apache.spark.sql.graft

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType}

import graft.avro.{AvroCatalystSerde, AvroSchemaConverter}
import graft.registry.ConfluentAvroRegistry

/** Confluent wire framing: `0x00` magic byte + 4-byte big-endian schema
  * id + Avro binary payload
  * (reference: sql/confluent/avro/ConfluentAvroConnector.scala:86). */
private[graft] object ConfluentWire {
  val MagicByte: Byte = 0x0
  val HeaderLen = 5

  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(HeaderLen + payload.length)
    out.put(MagicByte).putInt(schemaId).put(payload)
    out.array()
  }

  /** Validates the framing and returns the schema id (payload starts at
    * [[HeaderLen]]). */
  def parseHeader(bytes: Array[Byte]): Int = {
    if (bytes.length < HeaderLen)
      throw new IllegalArgumentException(
        s"truncated wire-format frame: ${bytes.length} bytes (need >= $HeaderLen)")
    val buf = ByteBuffer.wrap(bytes)
    val magic = buf.get()
    if (magic != MagicByte)
      throw new IllegalArgumentException(s"unknown wire-format magic byte $magic")
    buf.getInt()
  }
}

/** BinaryType → struct: decodes Confluent-framed Avro. Each record's
  * embedded schema id selects a cached `GenericDatumReader(writer,
  * reader)`, so old records are evolved to the subject's latest schema
  * while reading (reference: sql/confluent/avro/ConfluentAvroDataToCatalyst.scala:17-67).
  *
  * Per-executor state (`@transient lazy`): reader schema, converter
  * closures, per-writer-id reader cache, reused decoder. Participates in
  * whole-stage codegen via the reference-object pattern.
  */
case class ConfluentAvroToCatalyst(
    child: Expression,
    subject: String,
    registry: ConfluentAvroRegistry) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def nullable: Boolean = true

  // resolved lazily on the driver during analysis (NOT at construction —
  // a same-plan writer may not have registered the subject yet); the JSON
  // string (not the Schema object) is what rides to executors
  private lazy val readerSchemaJson: String = registry.latest(subject)
    .getOrElse(throw new IllegalArgumentException(
      s"subject $subject not found in schema registry"))._2.toString

  @transient private lazy val readerSchema = new Schema.Parser().parse(readerSchemaJson)

  override lazy val dataType: DataType =
    AvroSchemaConverter.toSqlType(new Schema.Parser().parse(readerSchemaJson)).dataType

  @transient private lazy val toCatalyst =
    AvroCatalystSerde.avroToCatalyst(readerSchema, dataType)

  @transient private lazy val readerCache = mutable.Map.empty[Int, GenericDatumReader[Any]]
  @transient private var decoder: BinaryDecoder = _
  @transient private var reusedDatum: Any = _

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val writerId = ConfluentWire.parseHeader(bytes)
    val reader = readerCache.getOrElseUpdate(writerId,
      new GenericDatumReader[Any](registry.schemaById(writerId), readerSchema))
    decoder = DecoderFactory.get().binaryDecoder(
      bytes, ConfluentWire.HeaderLen, bytes.length - ConfluentWire.HeaderLen, decoder)
    reusedDatum = reader.read(reusedDatum, decoder)
    toCatalyst(reusedDatum)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("confluentAvroRead", this, classOf[ConfluentAvroToCatalyst].getName)
    val boxed = CodeGenerator.boxedType(dataType)
    defineCodeGen(ctx, ev, input => s"($boxed) $ref.nullSafeEval($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): ConfluentAvroToCatalyst =
    copy(child = newChild)
}

/** struct → BinaryType: registers/updates the subject schema
  * (compatibility-checked) and emits Confluent-framed Avro
  * (reference: sql/confluent/avro/CatalystDataToConfluentAvro.scala:16-68).
  * Registration happens lazily on first use per JVM; `test()` forces it
  * at plan time (eagerCheck). */
case class CatalystToConfluentAvro(
    child: Expression,
    subject: String,
    registry: ConfluentAvroRegistry,
    updateAllowed: Boolean,
    mutualReadCheck: Boolean,
    evolveToLatest: Boolean = false) extends UnaryExpression {

  /** Registration is triggered the first time the analyzer asks for this
    * expression's type with a resolved child — i.e. at analysis time on
    * the driver, so schema problems surface at plan construction (the
    * reference's analysis-time registry I/O,
    * CatalystDataToConfluentAvro.scala:24-32). Executors re-force the
    * lazy val; setOrUpdateSchema with an identical schema is a no-op. */
  override def dataType: DataType = {
    if (child.resolved) target
    BinaryType
  }

  /** Serialization target. Default: register the DATA's schema
    * (compat-checked) and write natively under it — the reference's
    * behavior. With `evolveToLatest` and a subject that already has a
    * DIFFERENT schema: write under the subject's LATEST schema instead,
    * field-name-resolved (missing target fields fill with their Avro
    * defaults; extra data fields are a loud error from the serde) — the
    * write-side evolution the reference's positional serializer
    * couldn't express (its ignore'd test at
    * ConfluentAvroCatalystTest.scala:79-91). No new version is
    * registered on that path: the point is emitting records an evolved
    * subject's readers consume natively. */
  @transient private lazy val target: (Int, Schema) = {
    val dataSchema = AvroSchemaConverter.toAvroType(
      child.dataType, nullable = false, recordName = "topLevelRecord")
    if (evolveToLatest) {
      registry.latest(subject) match {
        case Some((id, latest)) if latest != dataSchema => (id, latest)
        case _ => registry.setOrUpdateSchema(subject, dataSchema,
          updateAllowed, mutualReadCheck)
      }
    } else registry.setOrUpdateSchema(subject, dataSchema,
      updateAllowed, mutualReadCheck)
  }

  @transient private lazy val toAvro =
    AvroCatalystSerde.catalystToAvro(child.dataType, target._2)

  @transient private lazy val datumWriter = new GenericDatumWriter[Any](target._2)
  @transient private lazy val buffer = new ByteArrayOutputStream()
  @transient private var encoder: BinaryEncoder = _

  /** Force registry I/O + compatibility check at plan construction. */
  def test(): Unit = { target; () }

  override def nullSafeEval(input: Any): Any = {
    buffer.reset()
    encoder = EncoderFactory.get().directBinaryEncoder(buffer, encoder)
    datumWriter.write(toAvro(input), encoder)
    encoder.flush()
    ConfluentWire.frame(target._1, buffer.toByteArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("confluentAvroWrite", this, classOf[CatalystToConfluentAvro].getName)
    defineCodeGen(ctx, ev, input => s"(byte[]) $ref.nullSafeEval($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): CatalystToConfluentAvro =
    copy(child = newChild)
}
