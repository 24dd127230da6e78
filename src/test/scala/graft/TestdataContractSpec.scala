package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DATA CONTRACTS the oracle SQL bakes in as constants, so the
  * next driver-side testdata regeneration that drifts a schema fails
  * HERE, loudly and named, instead of as a maze of hash-mismatches (the
  * round-8 incident: events.ts silently switched physical layout and 15
  * gates went red with no test naming the cause — EventsTsLayoutSpec
  * now owns that axis; this spec owns the rest).
  *
  * Each assertion names the gates that depend on it. If one fails, the
  * fix is usually in the oracle SQL constants, not in the operators.
  */
class TestdataContractSpec extends AnyFunSuite {
  import SharedSpark._

  test("embeddings: vec_id long, embedding array<float> of FIXED dim 64") {
    // s_ann_pq / s_ann_recall_pq SQL hardcode subspace width 16 = 64/4;
    // the Spark side derives dim dynamically, so a dim change would
    // hash-mismatch ONLY via the oracle — this names it first.
    val emb = Tables.embeddings(spark, sf001)
    assert(emb.schema("vec_id").dataType == LongType)
    assert(emb.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }, s"embedding type drifted: ${emb.schema("embedding").dataType}")
    val dims = emb.select(size(col("embedding")).as("d")).distinct().collect()
    assert(dims.map(_.getInt(0)).toSeq == Seq(64),
      s"embedding dim drifted from 64 (PQ oracle subspace width 16 = 64/4): " +
        dims.map(_.getInt(0)).mkString(","))
    // query-set contract: the five fixed BatchQueryIds must exist
    val n = emb.filter(col("vec_id").isin(0L, 100L, 200L, 300L, 400L)).count()
    assert(n == 5, s"fixed ANN query ids missing: found $n of 5")
  }

  test("documents: schema + non-null text (all t_*/d_* oracles tokenize it)") {
    val docs = Tables.documents(spark, sf001)
    val expected = Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
    expected.foreach { case (name, tpe) =>
      assert(docs.schema(name).dataType == tpe,
        s"documents.$name drifted: ${docs.schema(name).dataType}")
    }
    assert(docs.filter(col("text").isNull || col("lang").isNull ||
      col("source").isNull).count() == 0)
    // the nb/langid gates assume the 5-language label set
    val langs = docs.select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "zh")),
      s"lang label set drifted: $langs")
    // ids are non-negative — the max(id)-derived plant offsets
    // (LlmOps.plantBase) rely on it to stay above every natural id
    assert(docs.agg(min(col("doc_id"))).head.getLong(0) >= 0L)
    // byte-length == char-length where both appear in one gate: the
    // mm_dedup oracle now uses octet_length (byte-exact vs Spark's
    // binary length) so this is belt-and-braces, but a multibyte
    // testdata change should still announce itself here, not as a
    // downstream hash drift (round-10 advice)
    assert(docs.filter(length(col("text")) =!=
      length(col("text").cast("binary"))).count() == 0,
      "documents.text is no longer single-byte-per-char")
  }

  test("events: normalized schema is stable whatever the physical ts layout") {
    // normalizeEventTs owns the ts axis (EventsTsLayoutSpec); here: the
    // remaining columns the ev_*/st_* oracles select by name and type,
    // and props must parse as JSON (ev_json_props / x_jsonschema_parse)
    val ev = Tables.events(spark, sf001)
    val expected = Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType)
    expected.foreach { case (name, tpe) =>
      assert(ev.schema(name).dataType == tpe,
        s"events.$name drifted: ${ev.schema(name).dataType}")
    }
    val badJson = ev.select(from_json(col("props"),
        MapType(StringType, StringType)).as("m"))
      .filter(col("m").isNull).count()
    assert(badJson == 0, s"$badJson events.props rows no longer parse as JSON")
    // the click/view attribution family needs both event types present
    val types = ev.select(col("event_type")).distinct().collect()
      .map(_.getString(0)).toSet
    assert(Set("click", "view").subsetOf(types),
      s"event_type domain drifted: $types")
    // ev_anomaly / st_anomaly_stream turn value into exact integer
    // cents via CAST(value AS DECIMAL(12,2))·100 — that is only
    // lossless while the generator emits 2-decimal money values; a
    // drift to free doubles would silently round and the all-integer
    // z-test would stop matching the float reality it models
    val nonCents = ev.filter(
      (col("value").cast("decimal(12,2)") * 100).cast("long").cast("double")
        =!= round(col("value") * 100, 0)).count()
    assert(nonCents == 0,
      s"$nonCents events.value rows are not exact 2-decimal money")
  }

  test("tpch-ish tables: the columns the relational oracles name, by type") {
    // date columns: the generator has shipped both TIMESTAMP and
    // TIMESTAMP_NTZ (the round-8 regeneration moved them to NTZ along
    // with events.ts); the relational gates are proven green on either
    // because the session pins UTC and DuckDB agrees — so the contract
    // is "either timestamp flavor", anything else (e.g. a move to
    // DATE or epoch ints) fails here by name.
    val anyTs: DataType => Boolean =
      t => t == TimestampType || t == TimestampNTZType
    val exact: Seq[(String, Map[String, DataType])] = Seq(
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
        "l_returnflag" -> StringType),
      "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_totalprice" -> DoubleType),
      "customer" -> Map("c_custkey" -> LongType, "c_acctbal" -> DoubleType),
      "part" -> Map("p_partkey" -> LongType, "p_brand" -> StringType),
      "supplier" -> Map("s_suppkey" -> LongType),
      "nation" -> Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType),
      "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType))
    exact.foreach { case (table, cols) =>
      val df = Tables.load(spark, sf001, table)
      cols.foreach { case (name, tpe) =>
        assert(df.schema(name).dataType == tpe,
          s"$table.$name drifted: ${df.schema(name).dataType}")
      }
    }
    Seq("lineitem" -> "l_shipdate", "orders" -> "o_orderdate").foreach {
      case (table, name) =>
        val t = Tables.load(spark, sf001, table).schema(name).dataType
        assert(anyTs(t), s"$table.$name drifted beyond timestamp flavors: $t")
    }
  }
}
