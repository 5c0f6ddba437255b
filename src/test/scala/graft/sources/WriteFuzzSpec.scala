package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.Random

/** Differential fuzz for the graftjson WRITE path ([[JsonRowText]]
  * rendering + read-back re-inference): seeded random DataFrames over
  * the value-exact type families (integral widths incl. the Long
  * edges, decimals of mixed scales, strings, booleans, binary,
  * whole-second timestamps, nested structs, integer arrays, random
  * nulls) are written through `df.write.format("graftjson")` and read
  * back.
  *
  * NDJSON is schema-on-read, so TYPES re-infer by rendered value (a
  * LongType column of small values reads back narrower; struct fields
  * come back alphabetically sorted) — the contract is VALUE
  * exactness, so the comparison is recursive by the ORIGINAL type
  * with name-based field access and numeric comparison by value, not
  * by class. An all-null column renders as omitted fields and must
  * come back absent. Append mode must land next to the first batch.
  *
  * Generator exclusions mirror the documented contract: no
  * NaN/Infinity (render as strings — a type flip, not a value loss),
  * no float/double columns (re-inference classifies by rendered form;
  * their exactness window is pinned in JsonDocWriteSpec), no
  * hex-shaped or timestamp-shaped string VALUES (those re-classify to
  * binary/timestamp by design — the reference's own semantics; typed
  * cases live in JsonDocWriteSpec), no unpaired surrogates. */
class WriteFuzzSpec extends SparkTestBase {

  private val Runs = 12

  // ---------------------------------------------------------------
  // generators
  // ---------------------------------------------------------------

  private case class ColGen(field: StructField, gen: Random => Any)

  private def strVal(r: Random): String = {
    // "s_" prefix keeps values out of the hex/timestamp classifier
    // buckets (those flips are correct behavior, tested elsewhere)
    val pool = Vector("", "abc", "héllo wörld", "🎉🎊", "line\nbreak",
      "tab\there", "quote\"back\\slash", "x" * 280, "0" * 7)
    "s_" + pool(r.nextInt(pool.size)) + (if (r.nextBoolean()) r.nextInt(1000) else "")
  }

  private def colGens(r: Random): Seq[ColGen] = {
    val candidates = Seq[ColGen](
      ColGen(StructField("i8", ByteType), rr => (rr.nextInt(256) - 128).toByte),
      ColGen(StructField("i16", ShortType), rr => (rr.nextInt(65536) - 32768).toShort),
      ColGen(StructField("i32", IntegerType), rr => rr.nextInt()),
      ColGen(StructField("i64", LongType), rr => rr.nextInt(4) match {
        case 0 => Long.MaxValue
        case 1 => Long.MinValue
        case _ => rr.nextLong()
      }),
      ColGen(StructField("dc", DecimalType(20, 4)), rr =>
        new java.math.BigDecimal(rr.nextLong() % 100000000L)
          .movePointLeft(rr.nextInt(5)).setScale(4)),
      // precision past double's ~16 significant digits: exact
      // round-trip requires the reader's exact-decimal parse (the r13
      // Jackson-double fix) — these values round-tripped thousands off
      // before it
      ColGen(StructField("bigdc", DecimalType(24, 4)), rr =>
        new java.math.BigDecimal("1234567890123456789")
          .add(new java.math.BigDecimal(rr.nextInt(1000000)))
          .movePointLeft(rr.nextInt(3)).setScale(4)),
      ColGen(StructField("st", StringType), strVal),
      ColGen(StructField("bl", BooleanType), rr => rr.nextBoolean()),
      ColGen(StructField("bin", BinaryType), rr =>
        Array.fill(rr.nextInt(12))(rr.nextInt(256).toByte)),
      ColGen(StructField("ts", TimestampType), rr =>
        // whole seconds across 1970–2033 (the rendering is
        // second-precision by contract)
        new java.sql.Timestamp(rr.nextInt(2000000000).toLong * 1000L)),
      ColGen(StructField("obj", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType)))), rr =>
        Row(rr.nextLong() % 100000L, strVal(rr))),
      ColGen(StructField("arr", ArrayType(LongType)), rr =>
        Seq.fill(rr.nextInt(5))(rr.nextLong() % 1000000L)))
    ColGen(StructField("id", LongType), _ => 0L) +: // filled per row
      r.shuffle(candidates).take(3 + r.nextInt(6))
  }

  private def genDf(r: Random, gens: Seq[ColGen], n: Int,
                    idBase: Long): DataFrame = {
    val schema = StructType(gens.map(_.field))
    val rows = (0 until n).map { i =>
      Row.fromSeq(gens.zipWithIndex.map { case (g, gi) =>
        if (gi == 0) idBase + i // the join key is never null
        else if (r.nextInt(100) < 12) null
        else g.gen(r)
      })
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      schema)
  }

  // ---------------------------------------------------------------
  // value comparison (recursive by ORIGINAL type, name-based fields)
  // ---------------------------------------------------------------

  private def sameValue(orig: Any, dt: DataType, back: Any,
                        where: String): Unit = (orig, back) match {
    case (null, null) => ()
    case (null, b) => fail(s"$where: wrote null, read back $b")
    case (o, null) => fail(s"$where: wrote $o, read back null")
    case _ => dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        assert(orig.asInstanceOf[Number].longValue ==
          back.asInstanceOf[Number].longValue, where)
      case _: DecimalType =>
        val b = back match {
          case d: java.math.BigDecimal => d
          case n: Number => new java.math.BigDecimal(n.toString)
          case other => fail(s"$where: decimal read back as $other")
        }
        assert(orig.asInstanceOf[java.math.BigDecimal].compareTo(b) == 0,
          s"$where: $orig vs $b")
      case StringType => assert(orig == back, s"$where: '$orig' vs '$back'")
      case BooleanType => assert(orig == back, where)
      case BinaryType =>
        def hex(a: Array[Byte]) = a.map("%02x".format(_)).mkString
        (orig.asInstanceOf[Array[Byte]], back) match {
          case (o, b: Array[Byte]) => assert(hex(o) == hex(b), where)
          case (o, b: String) =>
            // reference semantics: "" (and odd-length hex) classify
            // STRING, so ONE empty binary in the column collapses the
            // string-kind and every value reads back as its hex TEXT —
            // the value survives, the type follows the classifier
            assert(hex(o) == b, s"$where: ${hex(o)} vs '$b'")
          case (_, other) => fail(s"$where: binary read back as $other")
        }
      case TimestampType =>
        assert(orig.asInstanceOf[java.sql.Timestamp].getTime ==
          back.asInstanceOf[java.sql.Timestamp].getTime,
          s"$where: $orig vs $back")
      case st: StructType =>
        val ob = orig.asInstanceOf[Row]
        val bb = back.asInstanceOf[Row]
        st.fields.zipWithIndex.foreach { case (f, i) =>
          val bv = scala.util.Try(bb.getAs[Any](f.name)).getOrElse(null)
          sameValue(ob.get(i), f.dataType, bv, s"$where.${f.name}")
        }
      case ArrayType(e, _) =>
        val oa = orig.asInstanceOf[scala.collection.Seq[Any]]
        val ba = back.asInstanceOf[scala.collection.Seq[Any]]
        assert(oa.size == ba.size, s"$where: array sizes ${oa.size}/${ba.size}")
        oa.indices.foreach(i => sameValue(oa(i), e, ba(i), s"$where[$i]"))
      case other => fail(s"$where: ungenerated type $other")
    }
  }

  private def checkRoundTrip(written: Seq[Row], schema: StructType,
                             dir: String, what: String): Unit = {
    val back = spark.read.format("graftjson").option("refresh", "true")
      .load(dir)
    val backCols = back.columns.toSet
    val byId = back.collect()
      .map(r => r.getAs[Number]("id").longValue -> r).toMap
    assert(byId.size == written.size,
      s"$what: wrote ${written.size} rows, read ${byId.size}")
    schema.fields.zipWithIndex.foreach { case (f, fi) =>
      if (!backCols.contains(f.name)) {
        // omitted-fields rule: only an all-null column may vanish
        assert(written.forall(_.get(fi) == null),
          s"$what: column ${f.name} vanished with non-null values")
      } else written.foreach { w =>
        val id = w.getAs[Number](0).longValue
        sameValue(w.get(fi), f.dataType, byId(id).getAs[Any](f.name),
          s"$what id=$id col=${f.name}")
      }
    }
  }

  test("random typed frames round-trip the native write value-exactly (12 seeded runs, append included)") {
    (0 until Runs).foreach { run =>
      val r = new Random(0xBEEFL + run)
      val gens = colGens(r)
      val schema = StructType(gens.map(_.field))
      val df1 = genDf(r, gens, 20 + r.nextInt(40), idBase = 0L)
      val rows1 = df1.collect().toSeq
      val dir = graft.TempRoots.path(s"write_fuzz_$run")
      val w1 = df1.repartition(1 + r.nextInt(4))
        .write.format("graftjson").mode("overwrite")
      (if (r.nextInt(3) == 0) w1.option("refreshMeta", "true") else w1)
        .save(dir)
      checkRoundTrip(rows1, schema, dir, s"run $run overwrite")
      // append a second batch under the same schema
      val df2 = genDf(r, gens, 10 + r.nextInt(20), idBase = 1000000L)
      val rows2 = df2.collect().toSeq
      df2.write.format("graftjson").mode("append").save(dir)
      checkRoundTrip(rows1 ++ rows2, schema, dir, s"run $run append")
    }
  }
}
