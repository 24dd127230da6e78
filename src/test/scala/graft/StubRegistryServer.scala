package graft

import java.net.InetSocketAddress
import java.net.URLDecoder
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.registry.InMemorySchemaRegistry

/** In-test stub of the Confluent schema-registry REST API, backed by an
  * [[InMemorySchemaRegistry]] store — just enough surface for
  * [[graft.registry.HttpSchemaRegistry]]: subjects list, register,
  * latest-version, schema-by-id, plus proper 404s.
  *
  * With `enforceCompat = true` the server replicates a production
  * Confluent broker's AUTHORITATIVE compatibility gate: the
  * latest-read, Avro can-read check, and version-append happen under
  * one server-side lock, so no interleaving of racing writers can land
  * two mutually incompatible versions — the loser gets HTTP 409
  * (Confluent's incompatible-schema status). */
class StubRegistryServer(regName: String, enforceCompat: Boolean = false) {
  private val reg = new InMemorySchemaRegistry(regName)
  private val compat = new graft.registry.ConfluentAvroRegistry(reg)
  private val appendLock = new Object
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  server.createContext("/", (ex: HttpExchange) => {
    try route(ex)
    catch { case e: Throwable => respond(ex, 500, s"""{"error":"${e.getMessage}"}""") }
    finally ex.close()
  })
  server.start()

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/vnd.schemaregistry.v1+json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def notFound(ex: HttpExchange, code: Int, what: String): Unit =
    respond(ex, 404, s"""{"error_code":$code,"message":"$what not found"}""")

  private def jstr(s: String): String = JsonMethods.compact(JsonMethods.render(JString(s)))

  /** The server-side gate: check-and-append is ATOMIC (one lock spans
    * the latest read, the new-can-read-old validation, and the version
    * append), which is exactly the atomicity a client-side check cannot
    * have. Identical documents still dedupe to their existing id
    * without a check (re-registering the current schema is always
    * legal, matching Confluent). */
  private def checkedRegister(subject: String, schema: String,
      refs: Seq[graft.registry.SchemaReference] = Nil): Either[String, Int] =
    if (!enforceCompat) Right(reg.register(subject, schema, refs))
    else appendLock.synchronized {
      reg.getLatest(subject) match {
        case Some((_, existing)) if existing != schema =>
          val problems =
            try compat.checkCompatibility(
              new org.apache.avro.Schema.Parser().parse(schema),
              new org.apache.avro.Schema.Parser().parse(existing), mutualRead = false)
            catch { case e: Exception => Seq(s"unparseable schema: ${e.getMessage}") }
          if (problems.nonEmpty) Left(problems.mkString("; "))
          else Right(reg.register(subject, schema, refs))
        case _ => Right(reg.register(subject, schema, refs))
      }
    }

  private def route(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    // raw path: segments are still %-encoded, so an encoded '/' inside a
    // subject name doesn't split the segment
    val parts = ex.getRequestURI.getRawPath.split("/").filter(_.nonEmpty)
      .map(URLDecoder.decode(_, StandardCharsets.UTF_8))
    (method, parts.toList) match {
      case ("GET", List("subjects")) =>
        respond(ex, 200, JsonMethods.compact(JsonMethods.render(
          JArray(reg.subjects.toList.sorted.map(JString(_))))))
      case ("POST", List("subjects", subject, "versions")) =>
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val parsed = JsonMethods.parse(body)
        val refs = parsed \ "references" match {
          case JArray(xs) => xs.collect { case o: JObject =>
            (o \ "name", o \ "subject", o \ "version") match {
              case (JString(n), JString(s), JInt(v)) =>
                graft.registry.SchemaReference(n, s, v.toInt)
            }
          }
          case _ => Nil
        }
        parsed \ "schema" match {
          case JString(schema) =>
            checkedRegister(subject, schema, refs) match {
              case Right(id) => respond(ex, 200, s"""{"id":$id}""")
              case Left(problems) => respond(ex, 409,
                s"""{"error_code":409,"message":${jstr("incompatible schema: " + problems)}}""")
            }
          case _ => respond(ex, 422, """{"error_code":42201,"message":"invalid schema"}""")
        }
      case ("GET", List("subjects", subject, "versions", "latest")) =>
        reg.getLatest(subject) match {
          case Some((id, schema)) =>
            respond(ex, 200,
              s"""{"subject":${jstr(subject)},"version":${reg.versions(subject).size},"id":$id,"schema":${jstr(schema)}}""")
          case None => notFound(ex, 40401, "subject")
        }
      case ("GET", List("subjects", subject, "versions")) =>
        reg.versions(subject) match {
          case Seq() => notFound(ex, 40401, "subject")
          case vs => respond(ex, 200, vs.mkString("[", ",", "]"))
        }
      case ("GET", List("subjects", subject, "versions", v)) =>
        v.toIntOption.flatMap(reg.getByVersion(subject, _)) match {
          case Some((id, schema)) => respond(ex, 200,
            s"""{"subject":${jstr(subject)},"version":$v,"id":$id,"schema":${jstr(schema)}}""")
          case None => notFound(ex, 40402, "version")
        }
      case ("GET", List("subjects", subject, "versions", v, "referencedby")) =>
        // Confluent returns [] (200) for a live version with no referrers
        // and 404 for an unknown subject/version
        v.toIntOption.filter(ver => reg.getByVersion(subject, ver).isDefined) match {
          case Some(ver) => respond(ex, 200,
            reg.referencedBy(subject, ver).mkString("[", ",", "]"))
          case None => notFound(ex, 40402, "version")
        }
      case ("DELETE", List("subjects", subject)) =>
        reg.deleteSubject(subject) match {
          case Seq() => notFound(ex, 40401, "subject")
          case vs => respond(ex, 200, vs.mkString("[", ",", "]"))
        }
      case ("GET", List("schemas", "ids", id)) =>
        id.toIntOption.flatMap(reg.getById) match {
          case Some(schema) => respond(ex, 200, s"""{"schema":${jstr(schema)}}""")
          case None => notFound(ex, 40403, "schema")
        }
      case _ => notFound(ex, 40400, "route")
    }
  }
}
