package graft.streaming

import graft.SparkTestBase
import graft.infer.{InferSchemaCountAgg, Materialize}
import org.apache.spark.sql.functions._

/** [[EventStreams.streamJsonDocs]]: NDJSON directory tailing through
  * Spark's file stream source with the shared Materialize conversion —
  * stream rows equal the batch materialization of the same files
  * (union fields included), and files arriving after stream start are
  * picked up incrementally. */
class StreamJsonDocsSpec extends SparkTestBase {

  test("stream == batch materialization; late files arrive incrementally; unions materialize") {
    import spark.implicits._
    val dir = new java.io.File(graft.TempRoots.path("stream_jsondocs"))
    dir.mkdirs()
    def writeFile(name: String, lines: String*): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name))
      lines.foreach(w.println); w.close()
    }
    writeFile("a.json",
      """{"id": 1, "v": "x"}""",
      """{"id": 2, "v": 3.5}""")
    // inference from the representative prefix (the batch planning
    // pass) — fixed for the stream's lifetime
    val (t, _) = spark.read.textFile(s"$dir/*.json")
      .select(new InferSchemaCountAgg().toColumn).head()
    val inferred = t.canonical

    val q = EventStreams.streamJsonDocs(spark, s"$dir/*.json", inferred)
      .writeStream.format("memory").queryName("jsondocs")
      .option("checkpointLocation",
        graft.TempRoots.path("stream_jsondocs_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      def got = spark.table("jsondocs").collect().map(_.toString).sorted.toSeq
      def batch = Materialize.materialize(
        spark.read.textFile(s"$dir/*.json"), inferred)
        .collect().map(_.toString).sorted.toSeq
      assert(got == batch && got.length == 2)
      // a union-typed field materialized: v is struct<tag,...> with the
      // double branch populated for doc 2
      val vField = spark.table("jsondocs").schema("v")
      assert(vField.dataType.isInstanceOf[org.apache.spark.sql.types.StructType])

      // late file: same schema family, one doc that fits and one whose
      // v is a NEW shape (boolean — not a branch) → null v, not a crash
      writeFile("b.json",
        """{"id": 3, "v": "y"}""",
        """{"id": 4, "v": true}""")
      q.processAllAvailable()
      assert(got.length == 4)
      assert(got == batch) // stream caught up to the batch view exactly
      val row4 = spark.table("jsondocs").where(col("id") === 4).head()
      assert(row4.isNullAt(row4.fieldIndex("v")))
    } finally q.stop()
  }
}
