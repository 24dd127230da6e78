package graft.registry

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaValidationException, SchemaValidatorBuilder}

/** Kafka message side a subject describes. Subjects follow the Confluent
  * naming convention `<topic>-key` / `<topic>-value`
  * (reference: sql/confluent/ConfluentClient.scala:46-49, 160-163). */
sealed abstract class SubjectType(val suffix: String)
object SubjectType {
  case object key extends SubjectType("key")
  case object value extends SubjectType("value")
}

/** Minimal schema-registry abstraction (the Confluent client jars are not
  * available offline — and the reference's tests mock the client anyway;
  * reference: sql/confluent/ConfluentClient.scala:37-133).
  *
  * Implementations must be usable from executors: either genuinely
  * remote (HTTP) or JVM-shared (in-memory for local/tests).
  */
trait SchemaRegistryClient extends Serializable {
  /** Register a new version (or return the existing id for an identical
    * schema). Returns the schema id. */
  def register(subject: String, schemaJson: String): Int
  /** Register with schema REFERENCES — named pointers at other
    * subjects' versions, the Confluent mechanism for composing schemas
    * without inlining (`references` array on POST …/versions). */
  def register(subject: String, schemaJson: String,
      references: Seq[SchemaReference]): Int
  def getById(id: Int): Option[String]
  def getLatest(subject: String): Option[(Int, String)]
  /** Version numbers (1-based, registration order) live under a subject. */
  def versions(subject: String): Seq[Int]
  /** One specific version: (schema id, schema document). */
  def getByVersion(subject: String, version: Int): Option[(Int, String)]
  /** Confluent soft delete (`DELETE /subjects/{s}`): the subject and its
    * version list disappear; already-issued SCHEMA IDS keep resolving
    * (written Kafka messages must stay readable). Returns the deleted
    * version numbers, empty for an unknown subject. */
  def deleteSubject(subject: String): Seq[Int]
  /** Schema ids whose references point at (subject, version) —
    * `GET /subjects/{s}/versions/{v}/referencedby`. */
  def referencedBy(subject: String, version: Int): Seq[Int]
  def subjects: Set[String]
}

/** A Confluent schema reference: `name` is how the referencing schema
  * mentions the type, resolved to `subject`'s `version`. */
case class SchemaReference(name: String, subject: String, version: Int)

/** JVM-wide in-memory registry. State lives in the companion keyed by a
  * registry name, so expression instances serialized into tasks reconnect
  * to the same store inside each executor JVM (exactly right for
  * `local[n]`; a multi-node deployment uses an HTTP-backed client
  * instead). */
class InMemorySchemaRegistry(name: String = "default") extends SchemaRegistryClient {
  private def store = InMemorySchemaRegistry.stores
    .computeIfAbsent(name, _ => new InMemorySchemaRegistry.Store)

  override def register(subject: String, schemaJson: String): Int =
    register(subject, schemaJson, Seq.empty)

  override def register(subject: String, schemaJson: String,
      references: Seq[SchemaReference]): Int = {
    val s = store
    s.synchronized {
      // schema-language-agnostic store: dedupe on the exact document
      // PLUS its reference list (Avro canonicalization happens in
      // ConfluentAvroRegistry). Confluent treats references as part of
      // schema identity, so the same document re-registered with
      // different references gets a NEW id — previously the refs were
      // silently dropped on the existing-id path and referencedBy
      // under-reported (round-11 advice).
      val canonical = schemaJson
      val versions = s.bySubject.computeIfAbsent(subject, _ => new java.util.ArrayList[Int])
      def refsOf(id: Int): Seq[SchemaReference] =
        Option(s.refsById.get(id)).getOrElse(Seq.empty)
      versions.asScala.find(id =>
          s.byId.get(id) == canonical && refsOf(id) == references) match {
        case Some(id) => id
        case None =>
          val id = s.nextId.getAndIncrement()
          s.byId.put(id, canonical)
          if (references.nonEmpty) s.refsById.put(id, references)
          versions.add(id)
          id
      }
    }
  }

  override def getById(id: Int): Option[String] = Option(store.byId.get(id))

  override def getLatest(subject: String): Option[(Int, String)] = {
    val s = store
    s.synchronized {
      Option(s.bySubject.get(subject)).filter(!_.isEmpty)
        .map(v => (v.get(v.size - 1), s.byId.get(v.get(v.size - 1))))
    }
  }

  override def versions(subject: String): Seq[Int] = {
    val s = store
    s.synchronized {
      Option(s.bySubject.get(subject))
        .map(v => (1 to v.size).toSeq).getOrElse(Seq.empty)
    }
  }

  override def getByVersion(subject: String, version: Int): Option[(Int, String)] = {
    val s = store
    s.synchronized {
      Option(s.bySubject.get(subject))
        .filter(v => version >= 1 && version <= v.size)
        .map(v => (v.get(version - 1), s.byId.get(v.get(version - 1))))
    }
  }

  override def deleteSubject(subject: String): Seq[Int] = {
    val s = store
    s.synchronized {
      // soft delete: the version list goes, issued ids keep resolving
      Option(s.bySubject.remove(subject))
        .map(v => (1 to v.size).toSeq).getOrElse(Seq.empty)
    }
  }

  override def referencedBy(subject: String, version: Int): Seq[Int] = {
    val s = store
    s.synchronized {
      s.refsById.asScala.collect {
        case (id, refs) if refs.exists(r =>
          r.subject == subject && r.version == version) => id.toInt
      }.toSeq.sorted
    }
  }

  override def subjects: Set[String] = store.bySubject.keySet.asScala.toSet

  /** References carried by a registered schema id (test/introspection). */
  def referencesOf(id: Int): Seq[SchemaReference] =
    Option(store.refsById.get(id)).getOrElse(Seq.empty)
}

object InMemorySchemaRegistry {
  private class Store {
    val byId = new ConcurrentHashMap[Int, String]()
    val bySubject = new ConcurrentHashMap[String, java.util.ArrayList[Int]]()
    val refsById = new ConcurrentHashMap[Int, Seq[SchemaReference]]()
    val nextId = new AtomicInteger(1)
  }
  private val stores = new ConcurrentHashMap[String, Store]()
  /** Test hook: wipe a named registry. */
  def reset(name: String = "default"): Unit = stores.remove(name)
}

/** Avro-typed governance layer over a [[SchemaRegistryClient]]:
  * compatibility-checked create/update and per-executor caching
  * (reference: sql/confluent/ConfluentClient.scala:46-131 +
  * avro validator usage at sql/confluent/avro/ConfluentAvroConnector.scala:97-118). */
class ConfluentAvroRegistry(val client: SchemaRegistryClient) extends Serializable {

  @transient private lazy val idCache =
    new ConcurrentHashMap[Int, Schema]()

  def subjectName(topic: String, subjectType: SubjectType): String =
    s"$topic-${subjectType.suffix}"

  def schemaById(id: Int): Schema =
    idCache.computeIfAbsent(id, _ =>
      new Schema.Parser().parse(client.getById(id).getOrElse(
        throw new IllegalArgumentException(s"schema id $id not found in registry"))))

  def latest(subject: String): Option[(Int, Schema)] =
    client.getLatest(subject).map { case (id, s) => (id, new Schema.Parser().parse(s)) }

  /** Register if absent; if present and different, check compatibility
    * (new-can-read-old, or mutual-read when `mutualReadCheck`) and
    * register the new version. Throws [[IncompatibleSchemaException]] on
    * violation, or if the subject exists and `updateAllowed` is false.
    *
    * CONCURRENCY SEMANTICS (pinned by HttpConfluentSerdeSpec's racing-
    * writers spec, against the real HTTP client): the get-latest →
    * check → register sequence is NOT atomic, so two writers racing an
    * empty or stale subject can each pass the client-side check before
    * the other's register lands. What holds regardless of
    * interleaving: no registration is ever lost (every successful call
    * returns an id that permanently resolves to its own schema), ids
    * are stable (identical documents dedupe to one id), and latest is
    * last-writer-wins. What does NOT hold with a check-free server: the
    * client-side compatibility gate alone is ADVISORY under concurrent
    * writers — a racing pair of mutually incompatible schemas can both
    * land if both observed the pre-race state. A production Confluent
    * server closes that window by enforcing compatibility server-side
    * ATOMICALLY at version-append (and the test StubRegistryServer
    * demonstrates it with `enforceCompat = true`): the losing racer's
    * register comes back HTTP 409. This method absorbs that verdict —
    * on 409 it re-reads latest, re-runs the client-side check against
    * the schema that actually won the race, and either retries (the
    * rival turned out compatible) or throws the same
    * [[IncompatibleSchemaException]] a stale-free sequential caller
    * would have gotten. */
  def setOrUpdateSchema(subject: String, schema: Schema,
      updateAllowed: Boolean = false, mutualReadCheck: Boolean = false): (Int, Schema) = {
    val maxAttempts = 3
    var attempt = 0
    var lastRejection: SchemaRegistryHttpException = null
    while (attempt < maxAttempts) {
      attempt += 1
      latest(subject) match {
        case None => ()
        case Some((id, existing)) if existing == schema => return (id, schema)
        case Some((_, existing)) =>
          if (!updateAllowed) throw new IncompatibleSchemaException(
            s"subject $subject already has a different schema and updateAllowed=false; " +
              s"diff: ${graft.avro.SchemaDiff.diff(schema, existing).mkString("; ")}")
          val problems = checkCompatibility(schema, existing, mutualReadCheck)
          if (problems.nonEmpty) throw new IncompatibleSchemaException(
            s"schema update for $subject is incompatible: ${problems.mkString("; ")}; " +
              s"diff: ${graft.avro.SchemaDiff.diff(schema, existing).mkString("; ")}")
      }
      try return (client.register(subject, schema.toString), schema)
      catch {
        // the server's atomic gate saw a version this client's read
        // missed — loop to re-read and re-judge against it
        case e: SchemaRegistryHttpException if e.status == 409 => lastRejection = e
      }
    }
    throw new IncompatibleSchemaException(
      s"schema update for $subject kept losing the register race and the " +
        s"server's compatibility gate rejected it: ${lastRejection.getMessage}")
  }

  /** Register if absent, otherwise return the existing latest schema. */
  def setOrGetSchema(subject: String, schema: Schema): (Int, Schema) =
    latest(subject).getOrElse((client.register(subject, schema.toString), schema))

  /** Empty = compatible. */
  def checkCompatibility(newSchema: Schema, existing: Schema,
      mutualRead: Boolean): Seq[String] = {
    def canRead(reader: Schema, writer: Schema, what: String): Option[String] =
      try {
        new SchemaValidatorBuilder().canReadStrategy.validateAll()
          .validate(reader, java.util.List.of(writer))
        None
      } catch {
        case e: SchemaValidationException => Some(s"$what: ${e.getMessage.linesIterator.next()}")
      }
    if (mutualRead) {
      (canRead(newSchema, existing, "new cannot read old") ++
        canRead(existing, newSchema, "old cannot read new")).toSeq
    } else canRead(newSchema, existing, "new cannot read old").toSeq
  }
}

class IncompatibleSchemaException(msg: String) extends Exception(msg)
