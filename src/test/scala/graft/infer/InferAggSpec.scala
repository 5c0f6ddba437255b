package graft.infer

import graft.SparkTestBase
import graft.types._
import org.apache.spark.sql.functions._

/** Distributed inference correctness: the Spark aggregation must equal
  * the local sequential fold (up to canonical form) at any
  * parallelism, and the inferred schema must be applicable via
  * from_json. */
class InferAggSpec extends SparkTestBase {

  private val corpus = Seq(
    """{"x": 1, "y": "00", "z": {"a": 1}, "l": [127]}""",
    """{"x": 1234.5, "y": "2016-01-05T12:34:56Z", "z": {"b": "s"}, "l": [50000000000]}""",
    """{"x": null, "z": null, "l": []}""",
    """{"u": true}""", """{"u": 5}""", """{"u": {"i": 1}}""")

  test("distributed aggregation equals the local fold at any parallelism") {
    import spark.implicits._
    val local = JsonInfer.inferAll(corpus).canonical
    for (parts <- Seq(1, 2, 7)) {
      val ds = spark.createDataset(corpus).repartition(parts)
      val distributed = ds.select(new InferSchemaAgg().toColumn).head()
      assert(distributed == local, s"parallelism $parts")
    }
  }

  test("distributed result is order-independent") {
    import spark.implicits._
    val a = spark.createDataset(corpus).repartition(3)
      .select(new InferSchemaAgg().toColumn).head()
    val b = spark.createDataset(corpus.reverse).repartition(5)
      .select(new InferSchemaAgg().toColumn).head()
    assert(a == b)
  }

  test("SQL udaf registration works") {
    import spark.implicits._
    InferSchema.register(spark)
    spark.createDataset(corpus).toDF("doc").createOrReplaceTempView("docs")
    val ddl = spark.sql("SELECT infer_schema(doc) AS d FROM docs")
      .as[String].head()
    assert(ddl.startsWith("create table tbl ("))
    assert(ddl.contains("u uniontype <"))
  }

  test("inferred schema applies via from_json (round trip)") {
    import spark.implicits._
    val docs = Seq(
      """{"a": 1, "b": "x", "c": [1.5], "t": "2016-01-05T12:34:56Z"}""",
      """{"a": 300000, "b": "0a", "c": [2.5, 3.25]}""")
    val ds = spark.createDataset(docs)
    val ht = ds.select(new InferSchemaAgg().toColumn).head()
    val schema = InferSchema.toSparkType(ht)
    val parsed = ds.select(from_json(col("value"), schema).as("p")).select("p.*")
    val rows = parsed.orderBy(col("a")).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Number]("a").intValue == 1)
    assert(rows(1).getAs[String]("b") == "0a" ||
      new String(rows(1).getAs[Array[Byte]]("b")) == "0a") // hex → binary
    assert(rows(1).getAs[scala.collection.Seq[Any]]("c")
      .map(_.toString.toDouble).toSeq == Seq(2.5, 3.25))
  }

  test("count-carrying aggregator counts documents like the reference") {
    import spark.implicits._
    // one line carries two concatenated docs → counts 2; blank lines
    // and nulls contribute no documents (reference counts
    // parser.next() yields, JsonSchemaFinder.java:240-245)
    val (ht, n) = spark.createDataset(corpus ++ Seq("""{"m":1}{"m":2}""", "", null))
      .select(new InferSchemaCountAgg().toColumn).head()
    assert(n == corpus.length + 2)
    assert(ht.canonical ==
      JsonInfer.inferAll(corpus :+ """{"m":1}{"m":2}""").canonical)
  }

  test("duplicate JSON keys: last value wins (Gson JsonObject semantics)") {
    assert(JsonInfer.inferDoc("""{"a": 1, "a": "x"}""").toString
      == "struct<a:string>")
  }

  test("fuzz: distributed inference equals local fold on random JSON") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    def randJson(depth: Int): String = {
      if (depth == 0) rnd.nextInt(6) match {
        case 0 => rnd.nextInt(100000).toString
        case 1 => s""""w${rnd.nextInt(5)}""""
        case 2 => "true"
        case 3 => "null"
        case 4 => s"${rnd.nextInt(100)}.${rnd.nextInt(1000)}"
        case _ => "\"2016-01-05T12:34:56Z\""
      } else rnd.nextInt(3) match {
        case 0 => (0 until rnd.nextInt(4))
          .map(i => s""""k${rnd.nextInt(4)}": ${randJson(depth - 1)}""")
          .mkString("{", ", ", "}")
        case 1 => (0 until rnd.nextInt(4)).map(_ => randJson(depth - 1))
          .mkString("[", ", ", "]")
        case _ => randJson(0)
      }
    }
    val docs = Seq.fill(300)(randJson(3))
    val local = JsonInfer.inferAll(docs).canonical
    val distributed = spark.createDataset(docs).repartition(7)
      .select(new InferSchemaAgg().toColumn).head()
    assert(distributed == local)
  }

  test("decimal cap: >38-digit merged precision degrades to double in Spark type") {
    val wide = HNum(NumKind.Decimal, 40, 5)
    assert(InferSchema.toSparkType(wide) ==
      org.apache.spark.sql.types.DoubleType)
  }
}
