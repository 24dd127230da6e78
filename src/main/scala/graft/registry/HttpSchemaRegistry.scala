package graft.registry

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Remote schema registry over the Confluent REST contract
  * (reference semantics: sql/confluent/ConfluentClient.scala:37-133, which
  * delegates to `CachedSchemaRegistryClient`; this impl speaks the same
  * wire API directly on `java.net.http` so it carries no Confluent jar
  * dependency and compiles offline).
  *
  * Endpoints used:
  *  - `POST /subjects/{subject}/versions` body `{"schema": "...",
  *    "references": [{"name","subject","version"}...]}` → `{"id": n}`
  *  - `GET /schemas/ids/{id}` → `{"schema": "..."}`
  *  - `GET /subjects/{subject}/versions` → `[1, 2, ...]`
  *  - `GET /subjects/{subject}/versions/latest` → `{"id": n, "schema": "..."}`
  *  - `GET /subjects/{subject}/versions/{v}` → `{"id": n, "schema": "..."}`
  *  - `GET /subjects/{subject}/versions/{v}/referencedby` → `[id, ...]`
  *  - `DELETE /subjects/{subject}` → `[1, 2, ...]` (soft delete)
  *  - `GET /subjects` → `["a-value", ...]`
  *
  * Instances are Serializable (registry URL + timeout only); the
  * HttpClient is rebuilt lazily per executor JVM. Id→schema lookups are
  * immutable in the registry, so [[ConfluentAvroRegistry]]'s per-executor
  * id cache keeps steady-state deserialization free of HTTP calls.
  */
class HttpSchemaRegistry(baseUrl: String,
    timeoutMillis: Long = 10000L) extends SchemaRegistryClient {

  private val root = baseUrl.stripSuffix("/")
  private def timeout = Duration.ofMillis(timeoutMillis)

  @transient private lazy val http =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  private val ContentType = "application/vnd.schemaregistry.v1+json"

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8).replace("+", "%20")

  private def send(req: HttpRequest): HttpResponse[String] =
    http.send(req, HttpResponse.BodyHandlers.ofString())

  private def getJson(path: String): Option[JValue] = {
    val r = send(HttpRequest.newBuilder(URI.create(root + path))
      .timeout(timeout).header("Accept", ContentType).GET().build())
    r.statusCode() match {
      case 200 => Some(JsonMethods.parse(r.body()))
      case 404 => None
      case c => throw new SchemaRegistryHttpException(c, path, r.body())
    }
  }

  override def register(subject: String, schemaJson: String): Int =
    register(subject, schemaJson, Seq.empty)

  override def register(subject: String, schemaJson: String,
      references: Seq[SchemaReference]): Int = {
    val path = s"/subjects/${enc(subject)}/versions"
    val fields: List[(String, JValue)] =
      List("schema" -> JString(schemaJson)) ++
        (if (references.isEmpty) Nil
         else List("references" -> JArray(references.map(r => JObject(
           "name" -> JString(r.name),
           "subject" -> JString(r.subject),
           "version" -> JInt(r.version))).toList)))
    val body = JsonMethods.compact(JsonMethods.render(JObject(fields: _*)))
    val r = send(HttpRequest.newBuilder(URI.create(root + path))
      .timeout(timeout)
      .header("Content-Type", ContentType).header("Accept", ContentType)
      .POST(HttpRequest.BodyPublishers.ofString(body)).build())
    if (r.statusCode() != 200)
      throw new SchemaRegistryHttpException(r.statusCode(), path, r.body())
    JsonMethods.parse(r.body()) \ "id" match {
      case JInt(id) => id.toInt
      case other => throw new SchemaRegistryHttpException(200, path,
        s"malformed register response (id=$other): ${r.body()}")
    }
  }

  override def getById(id: Int): Option[String] =
    getJson(s"/schemas/ids/$id").map { j =>
      j \ "schema" match {
        case JString(s) => s
        case other => throw new SchemaRegistryHttpException(200,
          s"/schemas/ids/$id", s"malformed schema response: $other")
      }
    }

  override def getLatest(subject: String): Option[(Int, String)] =
    getJson(s"/subjects/${enc(subject)}/versions/latest").map { j =>
      (j \ "id", j \ "schema") match {
        case (JInt(id), JString(s)) => (id.toInt, s)
        case _ => throw new SchemaRegistryHttpException(200,
          s"/subjects/$subject/versions/latest", s"malformed version response: ${JsonMethods.compact(JsonMethods.render(j))}")
      }
    }

  override def subjects: Set[String] =
    getJson("/subjects") match {
      case Some(JArray(xs)) => xs.collect { case JString(s) => s }.toSet
      case None => Set.empty
      case Some(other) => throw new SchemaRegistryHttpException(200,
        "/subjects", s"malformed subjects response: $other")
    }

  private def intArray(path: String): Seq[Int] =
    getJson(path) match {
      case Some(JArray(xs)) => xs.collect { case JInt(v) => v.toInt }
      case None => Seq.empty
      case Some(other) => throw new SchemaRegistryHttpException(200,
        path, s"malformed int-array response: $other")
    }

  override def versions(subject: String): Seq[Int] =
    intArray(s"/subjects/${enc(subject)}/versions")

  override def getByVersion(subject: String, version: Int): Option[(Int, String)] =
    getJson(s"/subjects/${enc(subject)}/versions/$version").map { j =>
      (j \ "id", j \ "schema") match {
        case (JInt(id), JString(s)) => (id.toInt, s)
        case _ => throw new SchemaRegistryHttpException(200,
          s"/subjects/$subject/versions/$version",
          s"malformed version response: ${JsonMethods.compact(JsonMethods.render(j))}")
      }
    }

  override def deleteSubject(subject: String): Seq[Int] = {
    val path = s"/subjects/${enc(subject)}"
    val r = send(HttpRequest.newBuilder(URI.create(root + path))
      .timeout(timeout).header("Accept", ContentType).DELETE().build())
    r.statusCode() match {
      case 200 => JsonMethods.parse(r.body()) match {
        case JArray(xs) => xs.collect { case JInt(v) => v.toInt }
        case other => throw new SchemaRegistryHttpException(200, path,
          s"malformed delete response: $other")
      }
      case 404 => Seq.empty
      case c => throw new SchemaRegistryHttpException(c, path, r.body())
    }
  }

  override def referencedBy(subject: String, version: Int): Seq[Int] =
    intArray(s"/subjects/${enc(subject)}/versions/$version/referencedby")
}

class SchemaRegistryHttpException(val status: Int, path: String, body: String)
  extends Exception(s"schema registry HTTP $status at $path: ${body.take(500)}")
