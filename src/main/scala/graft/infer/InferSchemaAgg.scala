package graft.infer

import graft.types._
import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{DataType => SType, _}

/** Distributed schema inference: the reference's single-threaded fold
  * (`result = mergeType(result, pickType(doc))`,
  * JsonSchemaFinder.java:239-245) re-expressed as a Spark
  * `Aggregator`. `reduce` runs `pickType`+`merge` per document on the
  * executors (map-side partial aggregation), `merge` joins the partial
  * lattices at the combine/final step — sound because the lattice join
  * is associative, and made order-independent by canonicalizing union
  * branches in `finish` (SURVEY §3.4).
  *
  * At 100 TB this is the ideal shape: the shuffled state is one tiny
  * schema tree per partition (O(schema), not O(data)), so the single
  * "shuffle" is a negligible all-to-one of a few KB per task.
  */
class InferSchemaAgg extends Aggregator[String, HType, HType] {
  def zero: HType = HNull // two-sided identity of the lattice join
  def reduce(b: HType, doc: String): HType = HType.merge(b, JsonInfer.inferDoc(doc))
  def merge(a: HType, b: HType): HType = HType.merge(a, b)
  def finish(r: HType): HType = r.canonical
  def bufferEncoder: Encoder[HType] = Encoders.javaSerialization[HType]
  def outputEncoder: Encoder[HType] = Encoders.javaSerialization[HType]
}

/** Inference that also carries the *document* count in the same pass
  * (the reference counts documents in its fold loop,
  * JsonSchemaFinder.java:240-245,248-249) — one scan, not two. A row
  * carrying several concatenated docs counts each; a blank row counts
  * none. */
class InferSchemaCountAgg extends Aggregator[String, (HType, Long), (HType, Long)] {
  def zero: (HType, Long) = (HNull, 0L)
  def reduce(b: (HType, Long), doc: String): (HType, Long) = {
    val (t, n) = JsonInfer.inferDocCount(doc)
    (HType.merge(b._1, t), b._2 + n)
  }
  def merge(a: (HType, Long), b: (HType, Long)): (HType, Long) =
    (HType.merge(a._1, b._1), a._2 + b._2)
  def finish(r: (HType, Long)): (HType, Long) = (r._1.canonical, r._2)
  def bufferEncoder: Encoder[(HType, Long)] =
    Encoders.tuple(Encoders.javaSerialization[HType], Encoders.scalaLong)
  def outputEncoder: Encoder[(HType, Long)] = bufferEncoder
}

/** Same aggregation but finishing straight to a rendered string, so it
  * can be registered as a SQL UDAF (`infer_schema(json)`). `mode` is
  * "ddl" (reference `printTopType` dialect), "flat" (`printFlat`), or
  * "name" (`toString`). */
class InferSchemaStringAgg(mode: String) extends Aggregator[String, HType, String] {
  def zero: HType = HNull
  def reduce(b: HType, doc: String): HType = HType.merge(b, JsonInfer.inferDoc(doc))
  def merge(a: HType, b: HType): HType = HType.merge(a, b)
  def finish(r: HType): String = InferSchema.render(r.canonical, mode)
  def bufferEncoder: Encoder[HType] = Encoders.javaSerialization[HType]
  def outputEncoder: Encoder[String] = Encoders.STRING
}

object InferSchema {

  def render(t: HType, mode: String): String = mode match {
    case "ddl" => t match {
      case s: HStruct => HType.renderDDL(s)
      // reference printTopType casts to StructType and would crash
      // (JsonSchemaFinder.java:252-253); we render the type name instead.
      case other => other.toString
    }
    case "flat" => t.renderFlat("root")
    case _      => t.toString
  }

  /** Column aggregating a string column of JSON docs into the rendered
    * schema. Usable as `df.agg(InferSchema.of($"json", "ddl"))`. */
  def of(col: Column, mode: String = "ddl"): Column =
    udaf(new InferSchemaStringAgg(mode)).apply(col)

  /** Register `infer_schema` / `infer_schema_flat` for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("infer_schema", udaf(new InferSchemaStringAgg("ddl")))
    spark.udf.register("infer_schema_flat", udaf(new InferSchemaStringAgg("flat")))
    spark.udf.register("infer_schema_name", udaf(new InferSchemaStringAgg("name")))
  }

  /** Materializable Spark schema for a discovered type (SURVEY §1.4).
    *
    * Divergences forced by Spark's type system, each documented:
    *   - NULL → `NullType` (callers materializing data should cast to
    *     string);
    *   - DECIMAL: merged precision can exceed 38
    *     (e.g. decimal(30,10) ⊔ decimal(20,0) — the reference never
    *     re-checks after merge); cap at `DecimalType.MAX_PRECISION`,
    *     overflowing to double when intDigits alone exceed 38;
    *   - UNION: Spark has no union type — encode as
    *     struct<tag:tinyint, u0:…, u1:…> mirroring the flat printer's
    *     numeric branch naming (UnionType.java:104-110);
    *   - all fields nullable (the reference does not model presence).
    */
  def toSparkType(t: HType): SType = t match {
    case HNull => NullType
    case HBool => BooleanType
    case HNum(k, i, s) => k match {
      case NumKind.Byte    => ByteType
      case NumKind.Short   => ShortType
      case NumKind.Int     => IntegerType
      case NumKind.Long    => LongType
      case NumKind.Decimal =>
        if (i > DecimalType.MAX_PRECISION) DoubleType
        else DecimalType(math.min(i + s, DecimalType.MAX_PRECISION),
                         math.min(s, DecimalType.MAX_PRECISION - math.min(i, 38)))
      case NumKind.Float   => FloatType
      case NumKind.Double  => DoubleType
    }
    case HStr(k) => k match {
      case StrKind.Binary    => BinaryType
      case StrKind.Date      => DateType
      case StrKind.Timestamp => TimestampType
      case StrKind.Str       => StringType
    }
    case HList(e) => ArrayType(toSparkType(e), containsNull = true)
    case HStruct(fs) =>
      StructType(fs.iterator.map { case (k, v) =>
        StructField(k, toSparkType(v), nullable = true)
      }.toSeq)
    case HUnion(cs) =>
      StructType(
        StructField("tag", ByteType, nullable = true) +:
          cs.zipWithIndex.map { case (c, idx) =>
            StructField(s"u$idx", toSparkType(c), nullable = true)
          })
  }
}
