package graft.infer

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Infer→materialize round trip over a heterogeneous corpus — the
  * union-typed path from_json cannot handle. */
class MaterializeSpec extends SparkTestBase {

  private val corpus = Seq(
    """{"u": true, "x": 1}""",
    """{"u": 5, "x": 2}""",
    """{"u": {"i": 1}, "x": 3}""",
    """{"u": "0a", "x": 4, "extra": [1.5]}""",
    """{"x": 5}""")

  test("heterogeneous corpus materializes with union encoding") {
    import spark.implicits._
    val ds = spark.createDataset(corpus)
    val inferred = ds.select(new InferSchemaAgg().toColumn).head()
    val df = Materialize.materialize(ds, inferred).orderBy(col("x"))

    // union field: struct<tag, u0..u3> with canonical branch order
    val uType = df.schema("u").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(uType.fieldNames.head == "tag")
    assert(uType.fields.length == 5) // tag + binary|boolean|struct|tinyint

    val rows = df.collect()
    assert(rows.length == corpus.length)
    // doc with u=true: exactly one branch set, the boolean one
    val r0 = rows(0).getAs[org.apache.spark.sql.Row]("u")
    val boolIdx = uType.fieldNames.indexWhere(n =>
      uType(n).dataType == org.apache.spark.sql.types.BooleanType)
    assert(r0.getAs[Boolean](boolIdx))
    // doc with u={"i":1}: struct branch set
    val r2 = rows(2).getAs[org.apache.spark.sql.Row]("u")
    val structIdx = uType.fieldNames.indexWhere(n =>
      uType(n).dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(r2.getAs[org.apache.spark.sql.Row](structIdx).getByte(0) == 1.toByte)
    // doc without u: null union
    assert(rows(4).isNullAt(rows(4).fieldIndex("u")))
    // tags are distinct branch indices
    val tags = rows.take(4).map(_.getAs[org.apache.spark.sql.Row]("u").getByte(0)).toSet
    assert(tags.size == 4)
  }

  test("DOM-based inferNode matches the streaming classifier on the same rendering") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val docs = Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 127, "b": 128, "c": 32768, "d": 2147483648, "e": 9223372036854775807}""",
      """{"n": 1.5, "m": 1.2e9}""",
      """{"t": "2024-01-01 10:00:00", "h": "deadbeef", "s": "plain"}""",
      """[1, "x", null, {"k": true}]""",
      """{"nested": {"deep": [[1.25], [2]]}, "nil": null}""",
      """true""", """null""", """"2024/01/02T03:04:05"""", """12.3456789""")
    for (d <- docs) {
      val tree = mapper.readTree(d)
      assert(graft.infer.JsonInfer.inferNode(tree) ==
        graft.infer.JsonInfer.inferDoc(tree.toString),
        s"DOM vs streaming divergence on $d")
    }
    // overflow edge: the DOM holds Double.POSITIVE_INFINITY, which
    // re-renders as the QUOTED string "Infinity" — the old round-trip
    // path classified that as a plain string; inferNode deliberately
    // classifies it as the double the raw literal implies
    import graft.types.{HNum, NumKind}
    assert(graft.infer.JsonInfer.inferNode(mapper.readTree("1e999")) ==
      HNum(NumKind.Double, 0, 0))
  }

  test("corrupt, empty, and non-object docs yield all-null rows, not failures") {
    import spark.implicits._
    val ds = spark.createDataset(corpus)
    val inferred = ds.select(new InferSchemaAgg().toColumn).head()
    val dirty = spark.createDataset(Seq("{{{not json", "", "5", null))
    val rows = Materialize.materialize(dirty, inferred).collect()
    assert(rows.length == 4)
    rows.foreach { r => (0 until r.length).foreach(i => assert(r.isNullAt(i))) }
  }

  test("a top-level-union corpus (mixed root shapes) materializes") {
    import spark.implicits._
    val mixed = Seq("5", """{"a": 1}""", "true", "not json at all")
    val ds = spark.createDataset(mixed)
    val inferred = ds.select(new InferSchemaAgg().toColumn).head()
    val df = Materialize.materialize(ds, inferred)
    val rows = df.collect()
    assert(rows.length == 4)
    assert(df.schema.fieldNames.head == "tag")
    // the corrupt doc is an all-null row; others carry distinct tags
    val tags = rows.flatMap(r => if (r.isNullAt(0)) None else Some(r.getByte(0)))
    assert(tags.toSet.size == 3)
  }

  test("materialized primitives carry inferred widths and kinds") {
    import spark.implicits._
    val docs = Seq(
      """{"n": 1, "d": 1.5, "b": "0a1b", "t": "2016-01-05T12:34:56Z"}""",
      """{"n": 40000, "d": 2.25}""")
    val ds = spark.createDataset(docs)
    val inferred = ds.select(new InferSchemaAgg().toColumn).head()
    val df = Materialize.materialize(ds, inferred).orderBy(col("n"))
    val rows = df.collect()
    assert(rows(0).getAs[Int]("n") == 1) // widened to int by doc 2
    assert(rows(0).getAs[java.math.BigDecimal]("d").toPlainString == "1.5" ||
      rows(0).getAs[java.math.BigDecimal]("d").toPlainString == "1.50")
    assert(rows(0).getAs[Array[Byte]]("b").toSeq == Seq(0x0a.toByte, 0x1b.toByte))
    assert(rows(0).getAs[java.sql.Timestamp]("t") ==
      java.sql.Timestamp.valueOf("2016-01-05 12:34:56"))
    assert(rows(1).isNullAt(rows(1).fieldIndex("b")))
  }

  test("queries run over the materialized union (branch histogram)") {
    import spark.implicits._
    val ds = spark.createDataset(corpus)
    val inferred = ds.select(new InferSchemaAgg().toColumn).head()
    val hist = Materialize.materialize(ds, inferred)
      .groupBy(col("u.tag")).agg(count(lit(1)).as("n"))
      .orderBy(col("tag")).collect()
      .map(r => Option(r.get(0)).map(_.toString).getOrElse("null") -> r.getLong(1))
    assert(hist.toMap.values.sum == corpus.length)
    assert(hist.length == 5) // 4 branches + null
  }

  /** Property: the MASKED conversion ([[Materialize.convertPruned]],
    * the graftjson nested-pruning path) equals [[Materialize.convert]]
    * under the FULL schema, and under any random PRUNED sub-schema it
    * equals the corresponding projection of the full conversion —
    * over generated heterogeneous corpora (unions, nesting, arrays,
    * hex/timestamp strings, decimals included). */
  test("convertPruned: full-schema parity and pruned-projection parity (property)") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val rnd = new scala.util.Random(20260814L)
    def genScalar(): String = rnd.nextInt(8) match {
      case 0 => rnd.nextInt(200).toString
      case 1 => (rnd.nextLong() % 100000000000L).toString
      case 2 => s"${rnd.nextInt(100)}.${rnd.nextInt(1000)}"
      case 3 => "\"" + ("w" + rnd.nextInt(50)) + "\""
      case 4 => "\"" + "0a1b" + "\"" // hex → binary
      case 5 => "\"2024-03-0" + (1 + rnd.nextInt(9)) + " 10:00:00\"" // timestamp
      case 6 => if (rnd.nextBoolean()) "true" else "false"
      case _ => "null"
    }
    def genJson(depth: Int): String =
      if (depth <= 0 || rnd.nextInt(4) == 0) genScalar()
      else rnd.nextInt(3) match {
        case 0 => // object over a small shared key pool → natural unions
          val n = rnd.nextInt(4)
          (0 until n).map(_ => "\"" + ("abcdef" (rnd.nextInt(6))) + "\": " +
            genJson(depth - 1)).mkString("{", ", ", "}")
        case 1 =>
          (0 until rnd.nextInt(3)).map(_ => genJson(depth - 1))
            .mkString("[", ", ", "]")
        case _ => genScalar()
      }
    // normalize values for equality: byte arrays and rows → vectors
    def norm(v: Any): Any = v match {
      case a: Array[Byte] => a.toVector
      case r: Row => r.toSeq.map(norm).toVector
      case s: Seq[_] => s.map(norm).toVector
      case x => x
    }
    // the expected pruned value: project the FULL conversion down to
    // the want-schema by name
    def project(v: Any, fullT: DataType, wantT: DataType): Any =
      (v, fullT, wantT) match {
        case (null, _, _) => null
        case (r: Row, f: StructType, w: StructType) =>
          Row.fromSeq(w.fields.toSeq.map { wf =>
            val i = f.fieldIndex(wf.name)
            project(r.get(i), f.fields(i).dataType, wf.dataType)
          })
        case (s: Seq[_], ArrayType(fe, _), ArrayType(we, _)) =>
          s.map(project(_, fe, we))
        case (x, _, _) => x
      }
    // random sub-schema: keep a nonempty subset of struct fields,
    // recursing into kept struct/array children
    def pruneType(t: DataType): DataType = t match {
      case st: StructType =>
        val kept = st.fields.filter(_ => rnd.nextInt(10) < 6)
        val ensure = if (kept.isEmpty && st.fields.nonEmpty)
          Array(st.fields(rnd.nextInt(st.fields.length))) else kept
        StructType(ensure.map(f => f.copy(dataType = pruneType(f.dataType))))
      case ArrayType(e, n) => ArrayType(pruneType(e), n)
      case other => other
    }
    (1 to 40).foreach { round =>
      val docs = Vector.fill(6)("{" + (0 until 1 + rnd.nextInt(4)).map(_ =>
        "\"" + ("abcdef" (rnd.nextInt(6))) + "\": " + genJson(3))
        .mkString(", ") + "}")
      val t = docs.map(JsonInfer.inferDoc)
        .reduce(graft.types.HType.merge(_, _)).canonical
      val fullSchema = Materialize.toMaterializableSparkType(t)
      docs.foreach { doc =>
        val node = Materialize.parseDoc(doc)
        val full = Materialize.convert(node, t)
        // full-schema parity: the masked walk IS the plain walk
        assert(norm(Materialize.convertPruned(node, t, fullSchema)) ==
          norm(full), s"round $round full-parity diverged on $doc")
        // pruned-projection parity over 3 random sub-schemas
        (1 to 3).foreach { _ =>
          val want = pruneType(fullSchema)
          val got = Materialize.convertPruned(node, t, want)
          val exp = project(full, fullSchema, want)
          assert(norm(got) == norm(exp),
            s"round $round pruned parity diverged on $doc\n want=$want")
        }
      }
    }
  }
}
