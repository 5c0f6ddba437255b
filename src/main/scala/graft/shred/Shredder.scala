package graft.shred

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import org.apache.spark.sql.{Dataset, SaveMode}

import scala.collection.mutable.ArrayBuffer

/** Column shredder: explodes each JSON document into one row per
  * primitive leaf, keyed by its dotted path.
  *
  * Distributed re-expression of the reference's `JsonShredder`
  * (reference `src/main/java/org/apache/hadoop/hive/json/JsonShredder.java:64-81`
  * recursive walk; `:52-62` per-path output files). Path semantics
  * match exactly: `root` prefix, `.field` for object members, `.list`
  * for every array element (positional flatten — an explode), nulls
  * skipped, primitives stringified from their raw token text (the
  * reference's `getAsString`, JsonShredder.java:67).
  *
  * Instead of one local file per path (unbounded fd cache in the
  * reference), the Spark sink partitions by path:
  * `write.partitionBy("path").text(out)` — one directory per column,
  * same content, scales horizontally. The flatMap itself is
  * pipeline-local (no shuffle); only the partitioned write shuffles.
  */
object Shredder {

  private val factory = new JsonFactory()

  /** Flatten all documents concatenated in `text` to (path, value). */
  def flatten(text: String, prefix: String = "root"): Seq[(String, String)] =
    flattenCount(text, prefix)._1

  /** As [[flatten]], also returning the number of top-level documents
    * walked — lets callers count records in the same parse pass
    * (the reference counts per document, JsonShredder.java:101-104). */
  def flattenCount(text: String,
                   prefix: String = "root"): (Seq[(String, String)], Long) = {
    val out = new ArrayBuffer[(String, String)]()
    if (text == null) return (out.toSeq, 0L)
    val p = factory.createParser(text)
    var n = 0L

    def walk(name: String): Unit = p.currentToken() match {
      case JsonToken.VALUE_NULL => // just skip it (JsonShredder.java:70-71)
      case JsonToken.START_ARRAY =>
        while (p.nextToken() != JsonToken.END_ARRAY) walk(name + ".list")
      case JsonToken.START_OBJECT =>
        while (p.nextToken() != JsonToken.END_OBJECT) {
          val field = p.currentName()
          p.nextToken()
          walk(name + "." + field)
        }
      case _ => out += ((name, p.getText))
    }

    try {
      try {
        while (p.nextToken() != null) { n += 1; walk(prefix) }
      } catch {
        // keep leaves already shredded; a corrupt doc must not kill the job
        case _: com.fasterxml.jackson.core.JacksonException =>
      }
    } finally p.close()
    (out.toSeq, n)
  }

  /** `Dataset[String]` of JSON docs → `Dataset[(path, value)]`. */
  def shred(docs: Dataset[String]): Dataset[(String, String)] = {
    import docs.sparkSession.implicits._
    docs.flatMap(flatten(_))
  }

  /** Shred and write one directory per column path. */
  def writeShredded(docs: Dataset[String], outDir: String): Unit =
    writeShreddedRows(shred(docs), outDir)

  /** Sink for an already-shredded (path, value) dataset — the single
    * source of truth for the output layout (mode, partition column,
    * format), shared by the library path and the CLI. */
  def writeShreddedRows(shredded: Dataset[(String, String)], outDir: String): Unit =
    shredded.toDF("path", "value")
      .write.mode(SaveMode.Overwrite).partitionBy("path").text(outDir)
}
