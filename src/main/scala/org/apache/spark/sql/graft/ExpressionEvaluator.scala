package org.apache.spark.sql.graft

import scala.reflect.ClassTag
import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.analysis.{Analyzer, FakeV2SessionCatalog, FunctionRegistry, Resolver, UnresolvedAttribute, caseInsensitiveResolution, caseSensitiveResolution}
import org.apache.spark.sql.catalyst.catalog.{CatalogDatabase, InMemoryCatalog, SessionCatalog}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BindReferences, Expression}
import org.apache.spark.sql.catalyst.optimizer.{ComputeCurrentTime, ReplaceCurrentLike, ReplaceExpressions, ReplaceUpdateFieldsExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils, UserDefinedFunctionUtils}
import org.apache.spark.sql.connector.catalog.CatalogManager
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.expressions.{SparkUserDefinedFunction, UserDefinedAggregator, UserDefinedFunction}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, StructType}

/** Evaluates a Spark SQL expression against a single case-class instance
  * — a complete miniature query pipeline (parse → analyze → optimize →
  * bind → interpreted eval) that needs **no SparkSession and no
  * cluster**. Useful for config-driven row-level rules evaluated outside
  * a job (driver-side validation, API services, tests).
  *
  * Mirrors the capability of the reference's standalone evaluator
  * (reference: sql/custom/ExpressionEvaluator.scala:48-83) rebuilt on
  * Spark 4 internals: the analyzer is assembled from an
  * [[InMemoryCatalog]]-backed [[SessionCatalog]] and a cloned builtin
  * [[FunctionRegistry]]; after analysis only the four finish-analysis
  * optimizer rules needed for correct evaluation are applied
  * (RuntimeReplaceable rewrite, current-time/current-like folding,
  * update_fields rewrite).
  *
  * @param exprCol expression to evaluate, e.g. `functions.expr("a + b")`
  * @tparam T input case class
  * @tparam R expected result type; use `Any` to skip the result-type
  *           check and receive plain Scala values
  */
class ExpressionEvaluator[T <: Product : TypeTag, R : TypeTag](exprCol: Column)(
    implicit classTagR: ClassTag[R]) {
  import ExpressionEvaluator._

  private val dataEncoder = ExpressionEncoder[T]()
  private val dataSerializer = dataEncoder.createSerializer()

  /** The analyzed, optimized, ordinal-bound expression. */
  val expr: Expression = resolveExpression(exprCol, dataEncoder.schema)

  require(expr.resolved, {
    val attrs = findUnresolvedAttributes(expr).map(_.name)
    "expression cannot be resolved" +
      (if (attrs.nonEmpty) s"; unresolved attributes: ${attrs.mkString(", ")}" else "")
  })

  /** Result decoding: typed via encoder when R is concrete; plain Scala
    * conversion when R == Any. */
  private val (resultType: DataType, resultDeserializer: (Any => R)) =
    if (classTagR.runtimeClass == classOf[Any]) {
      // R == Any: no type check; hand back plain Scala values.
      val toScala = CatalystTypeConverters.createToScalaConverter(expr.dataType)
      (expr.dataType, (result: Any) => toScala(result).asInstanceOf[R])
    } else {
      val encoder = ExpressionEncoder[R]()
      val structResult = expr.dataType.isInstanceOf[StructType] &&
        classOf[Product].isAssignableFrom(classTagR.runtimeClass)
      if (structResult) {
        // struct expression decoded into a multi-field case class/tuple:
        // the whole result struct is the row the deserializer reads.
        require(DataType.equalsStructurally(expr.dataType, encoder.schema, ignoreNullability = true),
          s"expression result type ${expr.dataType} does not match requested type ${encoder.schema}")
        val bound = encoder.resolveAndBind(DataTypeUtils.toAttributes(encoder.schema))
        val deser = bound.createDeserializer()
        (encoder.schema, (result: Any) => deser(result.asInstanceOf[InternalRow]))
      } else {
        val expected = encoder.schema.head.dataType
        require(DataType.equalsStructurally(expr.dataType, expected, ignoreNullability = true),
          s"expression result type ${expr.dataType} does not match requested type $expected")
        val bound = encoder.resolveAndBind(DataTypeUtils.toAttributes(encoder.schema))
        val deser = bound.createDeserializer()
        (expected, (result: Any) => deser(InternalRow(result)))
      }
    }

  def resultDataType: DataType = resultType

  /** Evaluate on one object: serialize → interpreted eval → deserialize.
    * Everything happens on the calling thread. */
  def apply(v: T): R = resultDeserializer(expr.eval(dataSerializer(v)))
}

object ExpressionEvaluator {

  /** Private clone of the builtin registry so UDF registration never
    * leaks into (or requires) a SparkSession. */
  private lazy val functionRegistry = FunctionRegistry.builtin.clone()

  private case class Pipeline(conf: SQLConf, analyzer: Analyzer,
      rules: Seq[Rule[LogicalPlan]])

  /** The conf must also be installed as the thread-local conf during
    * analysis — Spark 4's resolution reads `SQLConf.get`, not the
    * Analyzer instance. */
  private def makePipeline(caseSensitive: Boolean): Pipeline = {
    val conf = new SQLConf()
    conf.setConf(SQLConf.CASE_SENSITIVE, caseSensitive)
    val simpleCatalog = new SessionCatalog(new InMemoryCatalog, functionRegistry, conf) {
      override def createDatabase(dbDefinition: CatalogDatabase, ignoreIfExists: Boolean): Unit = ()
    }
    val catalogManager = new CatalogManager(FakeV2SessionCatalog, simpleCatalog)
    val analyzer = new Analyzer(catalogManager) {
      override def resolver: Resolver =
        if (caseSensitive) caseSensitiveResolution else caseInsensitiveResolution
    }
    Pipeline(conf, analyzer, Seq(ReplaceExpressions, ComputeCurrentTime,
      ReplaceCurrentLike(catalogManager), ReplaceUpdateFieldsExpression))
  }

  private lazy val sensitive = makePipeline(caseSensitive = true)
  private lazy val insensitive = makePipeline(caseSensitive = false)

  /** Make a UDF/UDAF available to subsequently-constructed evaluators. */
  def registerUdf(name: String, udf: UserDefinedFunction): Unit = udf match {
    case udaf: UserDefinedAggregator[_, _, _] =>
      functionRegistry.createOrReplaceTempFunction(
        name, children => ScalaAggregator(udaf, children), "scala_udf")
    case sudf: SparkUserDefinedFunction =>
      functionRegistry.createOrReplaceTempFunction(
        name, children => UserDefinedFunctionUtils.toScalaUDF(sudf, children), "scala_udf")
    case other =>
      throw new IllegalArgumentException(
        s"unsupported UserDefinedFunction implementation: ${other.getClass.getName}")
  }

  /** Analyze + minimally optimize + ordinal-bind a single expression
    * against a schema, using the synthetic-plan trick: wrap it in
    * `Project(expr as "result", LocalRelation(schema))`, run the
    * analyzer, then bind name references to ordinals. */
  def resolveExpression(exprCol: Column, schema: StructType,
      caseSensitive: Boolean = true): Expression = {
    val pipeline = if (caseSensitive) sensitive else insensitive
    val attributes = DataTypeUtils.toAttributes(schema)
    // Column → Expression eagerly (ExpressionUtils.expression would wrap
    // the ColumnNode in a lazy placeholder only a live session converts).
    val converted = ColumnNodeToExpressionConverter.apply(exprCol.alias("result").node)
    val rawPlan = Project(
      Seq(ExpressionUtils.toNamed(converted)),
      LocalRelation(attributes))
    SQLConf.withExistingConf(pipeline.conf) {
      val resolvedPlan = pipeline.analyzer.execute(rawPlan)
      val optimizedPlan = pipeline.rules.foldLeft(resolvedPlan)((p, r) => r.apply(p))
      val resolvedExpr = optimizedPlan.asInstanceOf[Project].projectList.head
      BindReferences.bindReference(resolvedExpr, attributes)
    }
  }

  /** Collect unresolved attributes for error messages. */
  def findUnresolvedAttributes(expr: Expression): Seq[UnresolvedAttribute] =
    if (expr.resolved) Seq.empty
    else expr match {
      case attr: UnresolvedAttribute => Seq(attr)
      case other => other.children.flatMap(findUnresolvedAttributes)
    }
}
