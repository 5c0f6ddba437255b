package graft.infer

import graft.SparkTestBase
import graft.types.{HStruct, HType}

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.util.zip.GZIPOutputStream

/** End-to-end golden-DDL smoke over the FIXTURES.md §A corpora — the
  * replicated githubarchive use of the reference (SURVEY §5 item 4):
  * gz corpus in, exact DDL string out, through the full distributed
  * path. */
class GoldenCorpusSpec extends SparkTestBase {

  private def writeGz(path: String, content: String): Unit = {
    val out = new GZIPOutputStream(new FileOutputStream(path))
    out.write(content.getBytes("UTF-8")); out.close()
  }

  test("FIXTURES A1 primitives corpus infers the golden DDL") {
    val dir = java.nio.file.Files.createTempDirectory("golden").toString
    writeGz(s"$dir/primitives.json.gz",
      """{"b": true, "tiny": 120, "small": 128, "i": 60000, "big": -4294967296,
        | "dec": 1234.567890, "bigdec": 9223372036854775808, "f": 1.2e9, "d": 1.2E40,
        | "bin": "0123456789abcdefABCDEF", "s": "00x0",
        | "ts": "2016-01-05T12:34:56Z", "ts2": "2016/01/05 12:34:56", "dateonly": "2016/01/05",
        | "n": null}""".stripMargin.replace("\n", ""))
    val inferred = spark.read.textFile(s"$dir/primitives.json.gz")
      .select(new InferSchemaAgg().toColumn).head()
    val golden =
      """create table tbl (
        |  b boolean,
        |  big bigint,
        |  bigdec decimal(19,0),
        |  bin binary,
        |  d double,
        |  dateonly string,
        |  dec decimal(10,6),
        |  f float,
        |  i int,
        |  n void,
        |  s string,
        |  small smallint,
        |  tiny tinyint,
        |  ts timestamp,
        |  ts2 timestamp
        |)
        |""".stripMargin
    assert(HType.renderDDL(inferred.asInstanceOf[HStruct]) == golden)
  }

  test("FIXTURES A2/A3 widening + union corpus infers the golden flat schema") {
    val dir = java.nio.file.Files.createTempDirectory("golden").toString
    val corpus =
      """{"x": 1, "y": "00", "z": {"a": 1}, "l": [127]}
        |{"x": 1234.5, "y": "2016-01-05T12:34:56Z", "z": {"b": "s"}, "l": [50000000000]}
        |{"x": null, "z": null, "l": []}
        |{"u": true}
        |{"u": 5}
        |{"u": {"i": 1}}
        |""".stripMargin
    java.nio.file.Files.writeString(new File(s"$dir/widening.json").toPath, corpus)
    val inferred = spark.read.textFile(s"$dir/widening.json")
      .select(new InferSchemaAgg().toColumn).head()
    assert(inferred.renderFlat("root") ==
      """root.l._list: bigint
        |root.u.0: boolean
        |root.u.1.i: tinyint
        |root.u.2: tinyint
        |root.x: decimal(5,1)
        |root.y: string
        |root.z.a: tinyint
        |root.z.b: string
        |""".stripMargin)
  }
}
