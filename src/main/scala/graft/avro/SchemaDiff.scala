package graft.avro

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.Schema.Type._

/** Recursive field-by-field Avro schema diff for actionable error
  * messages when a registry compatibility check fails
  * (reference: sql/confluent/avro/ConfluentAvroConnector.scala:48-82).
  * Unions are reduced before comparison and enum≈string is tolerated,
  * matching how the serde actually reads data. */
object SchemaDiff {

  /** Human-readable difference list; empty = structurally compatible. */
  def diff(s1: Schema, s2: Schema, path: String = ""): Seq[String] = {
    def at = if (path.isEmpty) "<root>" else path
    (reduce(s1), reduce(s2)) match {
      case (a, b) if a.getType != b.getType && !enumStringPair(a, b) =>
        Seq(s"$at: type ${a.getType} != ${b.getType}")
      case (a, b) => a.getType match {
        case RECORD =>
          val f1 = a.getFields.asScala.map(f => f.name -> f).toMap
          val f2 = b.getFields.asScala.map(f => f.name -> f).toMap
          val onlyA = (f1.keySet -- f2.keySet).toSeq.sorted.map(n => s"$at.$n: only in first")
          val onlyB = (f2.keySet -- f1.keySet).toSeq.sorted.map(n => s"$at.$n: only in second")
          val both = (f1.keySet & f2.keySet).toSeq.sorted.flatMap { n =>
            diff(f1(n).schema(), f2(n).schema(), s"$at.$n")
          }
          onlyA ++ onlyB ++ both
        case ARRAY => diff(a.getElementType, b.getElementType, s"$at[]")
        case MAP => diff(a.getValueType, b.getValueType, s"$at{}")
        case FIXED if a.getFixedSize != b.getFixedSize =>
          Seq(s"$at: fixed size ${a.getFixedSize} != ${b.getFixedSize}")
        case _ =>
          if (Option(a.getLogicalType).map(_.getName) != Option(b.getLogicalType).map(_.getName))
            Seq(s"$at: logical type ${a.getLogicalType} != ${b.getLogicalType}")
          else Seq.empty
      }
    }
  }

  /** Drop null branches; single-branch unions collapse to the branch. */
  private def reduce(s: Schema): Schema =
    if (s.getType != UNION) s
    else {
      val rest = s.getTypes.asScala.filter(_.getType != NULL)
      if (rest.size == 1) rest.head else Schema.createUnion(rest.asJava)
    }

  private def enumStringPair(a: Schema, b: Schema): Boolean =
    Set(a.getType, b.getType) == Set(ENUM, STRING)
}
