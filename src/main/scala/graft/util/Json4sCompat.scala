package graft.util

import scala.reflect.ClassTag

import org.json4s._

/** json4s shims matching the reference's cross-version helpers
  * (reference: util/Json4sCompat.scala:18-34). On json4s 4.x these are
  * thin delegations, kept so calling code has one stable surface. */
object Json4sCompat {

  def getCustomSerializer[A: ClassTag](
      ser: Formats => (PartialFunction[JValue, A], PartialFunction[Any, JValue]))
      : CustomSerializer[A] =
    new CustomSerializer[A](ser)

  def getCustomKeySerializer[A: ClassTag](
      ser: Formats => (PartialFunction[String, A], PartialFunction[Any, String]))
      : CustomKeySerializer[A] =
    new CustomKeySerializer[A](ser)

  /** Formats that fail loudly on unknown/missing fields. */
  def getStrictSerializationFormat: Formats =
    DefaultFormats.strict.withStrictArrayExtraction.withStrictMapExtraction
      .withStrictOptionParsing

  /** Strict serialization formats carrying type hints for polymorphic
    * (de)serialization (reference: util/Json4sCompat.scala:31-34). */
  def getStrictSerializationFormat(typeHints: TypeHints): Formats =
    org.json4s.jackson.Serialization.formats(typeHints)
      .withStrictArrayExtraction.withStrictMapExtraction.withStrictOptionParsing
}
