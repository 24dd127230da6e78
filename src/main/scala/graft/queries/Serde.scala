package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.confluent._
import graft.registry.{InMemorySchemaRegistry, SubjectType}

/** Registry-governed serde exercised inside distributed plans, proven by
  * identity oracles: encode → Confluent-framed bytes → decode must
  * reproduce the source table exactly. */
object Serde {

  /** Avro roundtrip over orders (covers long/string/double/timestamp).
    * One narrow projection feeds the serde pair; both expressions ride
    * whole-stage codegen via the reference-object pattern. */
  def avroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val client = new InMemorySchemaRegistry("q-avro")
    val o = Tables.orders(s, dir)
    val encoded = o.select(to_confluent_avro(
      struct(o.columns.map(col).toIndexedSeq: _*),
      "orders", SubjectType.value, client).as("payload"))
    encoded.select(from_confluent_avro(
      col("payload"), "orders", SubjectType.value, client).as("r"))
      .select("r.*")
  }

  val avroRoundtripSql: String = "SELECT * FROM orders"

  /** JSON roundtrip over supplier via registry-registered JSON Schema. */
  def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val client = new InMemorySchemaRegistry("q-json")
    val sup = Tables.supplier(s, dir)
    val encoded = sup.select(to_confluent_json(
      struct(sup.columns.map(col).toIndexedSeq: _*),
      "supplier", SubjectType.value, client).as("j"))
    encoded.select(from_confluent_json(
      col("j"), "supplier", SubjectType.value, client).as("r"))
      .select("r.*")
  }

  val jsonRoundtripSql: String = "SELECT * FROM supplier"
}
