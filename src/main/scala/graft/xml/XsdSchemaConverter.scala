package graft.xml

import java.io.{File, FileInputStream, InputStreamReader, StringReader}
import java.nio.charset.StandardCharsets
import java.nio.file.Path

import scala.jdk.CollectionConverters._

import javax.xml.namespace.QName
import org.apache.ws.commons.schema._
import org.apache.ws.commons.schema.constants.Constants
import org.apache.ws.commons.schema.utils.XmlSchemaObjectBase
import org.apache.spark.sql.types._

/** XSD → Spark [[StructType]] converter (Spark has `from_xml` but no XSD
  * reader). Behavior mirrors the reference converter
  * (reference: sql/xml/XsdSchemaConverter.scala:39-268):
  *
  *  - simple types map to Catalyst primitives; `xs:decimal` takes its
  *    scale from the `fractionDigits` facet (default `(38,18)`),
  *    `xs:unsignedLong` → `Decimal(38,0)`;
  *  - complexType with sequence/choice/all particles → nested structs;
  *    `maxOccurs > 1` (on the element or its group) → ArrayType;
  *    `minOccurs == 0` → nullable;
  *  - attributes become `_`-prefixed fields (optional unless
  *    `use="required"`); `simpleContent` text becomes `_VALUE`;
  *    attributeGroup refs are expanded;
  *  - element `ref=` is resolved to its target (propagating occurs);
  *  - `xs:any` → a `xs_any` string column;
  *  - type recursion is cut off after `maxRecursion` occurrences of the
  *    same named type on the path (the field is dropped);
  *  - `xs:documentation` annotations land in StructField comment
  *    metadata (preferring lang="en").
  */
object XsdSchemaConverter {

  val WildcardColName = "xs_any"

  def read(xsdFile: File, maxRecursion: Int): StructType = {
    val collection = new XmlSchemaCollection()
    collection.setBaseUri(xsdFile.getParent)
    val schema = collection.read(
      new InputStreamReader(new FileInputStream(xsdFile), StandardCharsets.UTF_8))
    new XsdSchemaConverter(schema, maxRecursion).rootStructType
  }

  def read(xsdFile: Path, maxRecursion: Int): StructType =
    read(xsdFile.toFile, maxRecursion)

  def read(xsdString: String, maxRecursion: Int): StructType = {
    val schema = new XmlSchemaCollection().read(new StringReader(xsdString))
    new XsdSchemaConverter(schema, maxRecursion).rootStructType
  }

  /** QName → Catalyst type for XSD builtin simple types; anything not
    * listed degrades to string. */
  private val SimpleTypes: Map[QName, DataType] = Map(
    Constants.XSD_BOOLEAN -> BooleanType,
    Constants.XSD_DOUBLE -> DoubleType,
    Constants.XSD_FLOAT -> FloatType,
    Constants.XSD_BYTE -> ByteType,
    Constants.XSD_SHORT -> ShortType,
    Constants.XSD_UNSIGNEDBYTE -> ShortType,
    Constants.XSD_INT -> IntegerType,
    Constants.XSD_INTEGER -> IntegerType,
    Constants.XSD_NEGATIVEINTEGER -> IntegerType,
    Constants.XSD_NONNEGATIVEINTEGER -> IntegerType,
    Constants.XSD_NONPOSITIVEINTEGER -> IntegerType,
    Constants.XSD_POSITIVEINTEGER -> IntegerType,
    Constants.XSD_UNSIGNEDSHORT -> IntegerType,
    Constants.XSD_LONG -> LongType,
    Constants.XSD_UNSIGNEDINT -> LongType,
    Constants.XSD_UNSIGNEDLONG -> DecimalType(38, 0),
    Constants.XSD_DATE -> DateType,
    Constants.XSD_DATETIME -> TimestampType)
}

class XsdSchemaConverter(xmlSchema: XmlSchema, maxRecursion: Int) {
  import XsdSchemaConverter._

  /** Struct of all top-level elements of the schema. */
  def rootStructType: StructType = {
    val fields = xmlSchema.getElements.asScala.values.toSeq
      .flatMap { el =>
        val target = resolveTarget(el)
        convertType(target.getSchemaType, Seq(target.getName)).map { dt =>
          withDoc(StructField(target.getName, dt, el.getMinOccurs == 0), target)
        }
      }
    StructType(fields)
  }

  /** None = recursion cut-off (field dropped) or empty struct. */
  private def convertType(schemaType: XmlSchemaType, path: Seq[String]): Option[DataType] =
    schemaType match {
      case st: XmlSchemaSimpleType => Some(simpleType(st))
      case ct: XmlSchemaComplexType => complexType(ct, path)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported schema type $other at ${path.mkString("/")}")
    }

  private def simpleType(st: XmlSchemaSimpleType): DataType =
    st.getContent match {
      case r: XmlSchemaSimpleTypeRestriction =>
        // named builtin (element type="xs:decimal") carries its own QName;
        // an inline anonymous restriction carries the base type's QName
        val qn = Option(st.getQName).getOrElse(r.getBaseTypeName)
        qn match {
          case Constants.XSD_DECIMAL =>
            val scale = r.getFacets.asScala
              .collectFirst { case f: XmlSchemaFractionDigitsFacet => f.getValue.toString.toInt }
            DecimalType(38, scale.getOrElse(18))
          case q => SimpleTypes.getOrElse(q, StringType)
        }
      case _ => StringType
    }

  private def complexType(ct: XmlSchemaComplexType, path: Seq[String]): Option[DataType] = {
    // recursion guard on named types
    if (ct.getName != null && path.count(_ == ct.getName) >= maxRecursion) return None
    val extendedPath = path ++ Option(ct.getName)
    ct.getContentModel match {
      case sc: XmlSchemaSimpleContent =>
        sc.getContent match {
          case ext: XmlSchemaSimpleContentExtension =>
            val valueField = lookupType(ext.getBaseTypeName, path)
              .map(dt => StructField("_VALUE", dt))
            val attrFields = attributeFields(
              ct.getAttributes.asScala.toSeq ++ ext.getAttributes.asScala.toSeq, path)
            val fields = valueField.toSeq ++ attrFields
            if (fields.nonEmpty) Some(StructType(fields)) else None
          case other =>
            throw new IllegalArgumentException(
              s"unsupported simpleContent $other at ${path.mkString("/")}")
        }
      case cc: XmlSchemaComplexContent =>
        cc.getContent match {
          case ext: XmlSchemaComplexContentExtension =>
            val inherited = lookupType(ext.getBaseTypeName, path) match {
              case Some(StructType(fs)) => fs.toSeq
              case _ => Seq.empty
            }
            val own = particleFields(ext.getParticle, extendedPath, None)
            val attrs = attributeFields(
              ct.getAttributes.asScala.toSeq ++ ext.getAttributes.asScala.toSeq, path)
            val fields = inherited ++ own ++ attrs
            if (fields.nonEmpty) Some(StructType(fields)) else None
          case other =>
            throw new IllegalArgumentException(
              s"unsupported complexContent $other at ${path.mkString("/")}")
        }
      case null =>
        val fields = particleFields(ct.getParticle, extendedPath, None) ++
          attributeFields(ct.getAttributes.asScala.toSeq, extendedPath)
        if (fields.nonEmpty) Some(StructType(fields)) else None
      case other =>
        throw new IllegalArgumentException(
          s"unsupported content model $other at ${path.mkString("/")}")
    }
  }

  private def lookupType(name: QName, path: Seq[String]): Option[DataType] =
    convertType(xmlSchema.getParent.getTypeByQName(name), path)

  /** Resolve element `ref=` chains WITHOUT mutating the shared global
    * target (mutation would leak one ref site's occurs into every other
    * reference to the same element); occurrence constraints are taken
    * from the referencing particle at the use site. */
  private def resolveTarget(el: XmlSchemaElement): XmlSchemaElement =
    if (el.getRef != null && el.getRef.getTargetQName != null) {
      val target = el.getRef.getTarget
      require(target != null, s"reference '${el.getRef.getTargetQName}' not found")
      resolveTarget(target)
    } else el

  private def particleFields(particle: XmlSchemaParticle, path: Seq[String],
      groupMaxOccurs: Option[Long]): Seq[StructField] = particle match {
    case el: XmlSchemaElement =>
      val target = resolveTarget(el)
      // name/type/docs come from the resolved target; min/maxOccurs from
      // the particle at THIS use site (el), per XSD semantics
      convertType(target.getSchemaType, path :+ target.getName).map { dt =>
        val repeated = (Seq(el.getMaxOccurs) ++ groupMaxOccurs).max > 1
        val fieldType = if (repeated) ArrayType(dt) else dt
        withDoc(StructField(target.getName, fieldType, el.getMinOccurs == 0), target)
      }.toSeq
    case seq: XmlSchemaSequence =>
      groupFields(seq.getItems.asScala.toSeq, path, seq.getMaxOccurs)
    case choice: XmlSchemaChoice =>
      groupFields(choice.getItems.asScala.toSeq, path, choice.getMaxOccurs)
    case all: XmlSchemaAll =>
      groupFields(all.getItems.asScala.toSeq, path, all.getMaxOccurs)
    case any: XmlSchemaAny =>
      val repeated = (Seq(any.getMaxOccurs) ++ groupMaxOccurs).max > 1
      val dt = if (repeated) ArrayType(StringType) else StringType
      Seq(withDoc(StructField(WildcardColName, dt, any.getMinOccurs == 0), any))
    case null => Seq.empty
    case other =>
      throw new IllegalArgumentException(
        s"unsupported particle $other at ${path.mkString("/")}")
  }

  private def groupFields(items: Seq[XmlSchemaObjectBase], path: Seq[String],
      groupMaxOccurs: Long): Seq[StructField] =
    items.flatMap {
      case p: XmlSchemaParticle => particleFields(p, path, Some(groupMaxOccurs))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported group member $other at ${path.mkString("/")}")
    }

  private def attributeFields(attrs: Seq[XmlSchemaAttributeOrGroupRef],
      path: Seq[String]): Seq[StructField] =
    attrs.flatMap {
      case a: XmlSchemaAttribute => attributeField(a, path)
      case g: XmlSchemaAttributeGroupRef =>
        xmlSchema.getAttributeGroupByName(g.getTargetQName)
          .getAttributes.asScala.toSeq.flatMap {
            case a: XmlSchemaAttribute => attributeField(a, path)
            case other =>
              throw new IllegalArgumentException(s"unsupported attribute-group member $other")
          }
    }

  private def attributeField(a: XmlSchemaAttribute, path: Seq[String]): Option[StructField] = {
    val dt = a.getSchemaTypeName match {
      case null => Some(StringType)
      case q => lookupType(q, path :+ a.getName)
    }
    dt.map(t => withDoc(
      StructField(s"_${a.getName}", t, a.getUse != XmlSchemaUse.REQUIRED), a))
  }

  private def withDoc(field: StructField, annotated: XmlSchemaAnnotated): StructField = {
    val docs = Option(annotated.getAnnotation).flatMap(a => Option(a.getItems))
      .toSeq.flatMap(_.asScala)
      .collect { case d: XmlSchemaDocumentation => d }
    val chosen = docs.find(d => Option(d.getLanguage).exists(_.equalsIgnoreCase("en")))
      .orElse(docs.headOption)
    chosen.flatMap(d => Option(d.getSource)).map(field.withComment).getOrElse(field)
  }
}
