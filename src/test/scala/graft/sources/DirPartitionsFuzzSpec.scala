package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.types._

import scala.util.Random

/** Differential fuzz harness for `dirPartitions=true` (r17, the
  * ZoneFuzzSpec tradition): random partition trees — canonical-long
  * and string value mixes, Hive-escaped specials, the null sentinel,
  * the empty string — probed with random predicate trees over the
  * partition column and the data columns, compared against SPARK'S
  * OWN semantics on an equivalent in-memory frame. The engine path
  * exercises every branch (consumed 3VL pruning, residual fallback,
  * mixed references, scoped metadata answering under zonemaps); the
  * ground truth never touches graftjson. A mismatch anywhere — one
  * row, one count — fails the trial. */
class DirPartitionsFuzzSpec extends SparkTestBase {

  private val Trials =
    sys.env.getOrElse("GRAFT_DIRPART_FUZZ_TRIALS", "12").toInt

  private def escape(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(v)

  /** @return (probes run, consumed-pruning firings, null tree?) */
  private def runTrial(t: Int): (Int, Int, Boolean) = {
    val r = new Random(11700 + t)
    val root = new java.io.File(graft.TempRoots.path(s"dirpart_fuzz_$t"))
    root.mkdirs()
    val colName = Seq("y", "dt", "part key", "a=b")(r.nextInt(4))
    val longMode = r.nextBoolean()
    // candidate partition values (None = the null sentinel)
    val candidates: Seq[Option[Any]] =
      if (longMode)
        Seq(Some(0L), Some(7L), Some(-3L), Some(2026L),
          Some(9000000000L), None).map(_.map(v => v: Any))
      else
        // all-ASCII on purpose: this host runs a POSIX locale whose
        // JVM cannot round-trip non-ASCII FILENAMES (sun.jnu.encoding
        // = ASCII) — an environment limit, not a code path: partition
        // values are opaque strings to the engine, and "a/b" already
        // exercises the escaped-separator (%2F) component parse
        Seq(Some("en"), Some("a b"), Some("x=y"), Some("p%q"),
          Some("07"), Some(""), Some("a/b"), None)
          .map(_.map(v => v: Any))
    val values = r.shuffle(candidates).take(2 + r.nextInt(3)).distinct
    var nextId = 0L
    val model = Seq.newBuilder[(Long, Option[Any])]
    values.foreach { v =>
      val dirName = colName match {
        case c => escape(c) + "=" + (v match {
          case None => DirPartitions.NullDir
          case Some(x) => escape(x.toString)
        })
      }
      val d = new java.io.File(root, dirName)
      d.mkdirs()
      (0 until (1 + r.nextInt(2))).foreach { fi =>
        val w = new java.io.PrintWriter(new java.io.File(d, s"f$fi.json"))
        (0 until (1 + r.nextInt(3))).foreach { _ =>
          nextId += 1
          w.println(s"""{"id": $nextId, "n": ${r.nextInt(100)}}""")
          model += ((nextId, v))
        }
        w.close()
      }
    }
    val rows = model.result()
    // ground truth: Spark's own semantics over an equivalent frame
    val partType = if (longMode) LongType else StringType
    val truthDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) =>
        Row(id, v.orNull)
      }, 2),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField(colName, partType, nullable = true))))
    val df = spark.read.format("graftjson")
      .option("dirPartitions", "true")
      .option("zonemaps", r.nextBoolean().toString)
      .load(root.toString)
    assert(df.schema.fields.last.name == colName)
    assert(df.schema.fields.last.dataType == partType,
      s"trial $t: derived ${df.schema.fields.last.dataType}, " +
        s"wanted $partType for values $values")

    // random predicate trees over the partition column (+ sometimes id)
    def lit0(): Any =
      if (longMode) Seq(0L, 7L, -3L, 2026L, 9000000000L, 5L)(r.nextInt(6))
      else Seq("en", "a b", "x=y", "p%q", "07", "", "a/b",
        "zz")(r.nextInt(8))
    def leaf(): Column = {
      val c = col(colName)
      r.nextInt(10) match {
        case 0 => c === lit(lit0())
        case 1 => c =!= lit(lit0())
        case 2 => c.isNull
        case 3 => c.isNotNull
        case 4 => c.isin(lit0(), lit0())
        case 5 => c > lit(lit0())
        case 6 => c <= lit(lit0())
        case 7 => c.cast("string").startsWith(
          lit0().toString.take(1 + r.nextInt(2)))
        case 8 => c.cast("string").contains("a")
        case 9 => col("id") > lit(nextId / 2) // mixed-reference material
      }
    }
    def tree(depth: Int): Column = {
      if (depth == 0 || r.nextInt(3) == 0) leaf()
      else r.nextInt(3) match {
        case 0 => tree(depth - 1) && tree(depth - 1)
        case 1 => tree(depth - 1) || tree(depth - 1)
        case 2 => !tree(depth - 1)
      }
    }
    var probes = 0
    var prunings = 0
    (0 until 15).foreach { _ =>
      probes += 1
      val p = tree(2)
      val q = df.filter(p)
      val got = q.select(col("id").cast("long")).collect()
        .map(_.getLong(0)).sorted.toSeq
      val want = truthDf.filter(p).select(col("id").cast("long"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want,
        s"trial $t: predicate $p diverged " +
          s"(got ${got.take(6)}, want ${want.take(6)}, values $values)")
      val desc = q.queryExecution.executedPlan.toString
      val k = "DirPartitions: "
      val i = desc.indexOf(k)
      if (i >= 0) {
        val kept = desc.substring(i).split(" kept ")(1).split("/")
        if (kept(0).trim.toInt < kept(1).trim.takeWhile(_.isDigit).toInt)
          prunings += 1
      }
      // count through whatever path plans (scan or scoped metadata)
      assert(q.count() == want.size.toLong,
        s"trial $t: count diverged for $p")
    }
    (probes, prunings, values.contains(None))
  }

  test("random partition trees x random predicate trees match Spark's own semantics on an equivalent frame, with real pruning firings") {
    var probes = 0; var prunings = 0; var nullTrees = 0
    (0 until Trials).foreach { t =>
      val (p, pr, n) = runTrial(t)
      probes += p; prunings += pr
      if (n) nullTrees += 1
    }
    info(s"dirPartitions fuzz: $Trials trials, $probes probes, " +
      s"$prunings pruned plans, $nullTrees null-sentinel trees")
    assert(probes >= Trials * 15)
    // non-vacuous: consumed pruning actually fired across the sweep,
    // and the null sentinel was exercised
    assert(prunings >= 10, s"only $prunings pruned plans")
    assert(nullTrees >= 2, s"only $nullTrees null-sentinel trees")
  }
}
