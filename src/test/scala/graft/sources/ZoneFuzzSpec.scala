package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.Random

/** Differential fuzz harness for the zone-proof surface (VERDICT r12
  * next-round #1): random NDJSON corpora (nested structs, dirty and
  * blank lines, duplicate top-level keys, multi-doc lines, union
  * columns, every classifier bucket — integral widths, the 19-digit
  * boundary, decimals incl. -0.0 and trailing zeros, sci-notation
  * floats/doubles, timestamp-shaped strings incl. shape-valid-but-
  * unparseable ones, hex/binary, >256-char strings, emoji) × random
  * pushable predicates × random aggregate / GROUP BY / DISTINCT /
  * TopN / LIMIT probes.
  *
  * Ground truth per corpus: ONE unfiltered full graftjson scan,
  * collected, re-wrapped as a local DataFrame under the same schema.
  * That path consults no zone, no pushed filter, no metadata answer —
  * every probe then runs the SAME Column expressions against the
  * zonemaps-enabled source handle and the local frame, so any
  * divergence isolates the proof surface (file skipping, exact-filter
  * full pushdown, reader early-skip, SUM/COUNT/MIN/MAX/AVG/GROUP-BY
  * metadata answering, TopN/LIMIT pruning). Multiset row equality also
  * subsumes the skip-set ⊆ brute-force-matching-set soundness check:
  * an unsoundly skipped file's rows are missing from the multiset.
  *
  * Determinism: fixed seeds; results compare as sorted canonical
  * renderings (order-insensitive except TopN, which compares the
  * first-sort-key multiset — the only thing a valid top-k guarantees
  * under ties). Double SUM/AVG probes are confined to the small-value
  * integral column so both sides stay inside the exact-double window
  * (an order-dependent last-ulp is a layout artifact, not a bug).
  *
  * Reference soundness bar: the reference's own exhaustive bucket
  * tests, TestJsonSchemaFinder.java:70-117. */
class ZoneFuzzSpec extends SparkTestBase {

  // delete-leg outcome tally (asserted non-vacuous at the end: the leg
  // must exercise BOTH the success and the refusal branch across the
  // corpus population, or its soundness claim is fiction)
  private var deleteSucceeded = 0
  private var deleteRefused = 0

  private val Corpora = 12 // seed 11 found the Jackson-double decimal bug (r13)
  // case arithmetic (quoted identically in CLAUDE.md / SURVEY §2 /
  // ARCHITECTURE — VERDICT r13 #6): 12 corpora × (105 probe attempts
  // + 20 lifecycle replays + 2 delete decisions) = 1524 generated,
  // minus generation dead-ends (≤ 15/corpus asserted) ⇒ ≈ 1460 ran;
  // hard gate ≥ 1000
  private val ProbesPerCorpus = 105

  // ---------------------------------------------------------------
  // corpus generation
  // ---------------------------------------------------------------

  /** Raw-literal generators per logical column; emitting raw JSON text
    * keeps full control of the literal form (classifier buckets). */
  private def intLit(r: Random): String = r.nextInt(8) match {
    case 0 => r.nextInt(256).-(128).toString                  // byte
    case 1 => (r.nextInt(65536) - 32768).toString             // short
    case 2 => r.nextInt().toString                            // int
    case 3 => r.nextLong().toString                           // long
    case 4 => "127"
    case 5 => "128"                                           // short edge
    case 6 => "9223372036854775807"                           // 2^63-1
    case 7 => "-9223372036854775808"
  }
  private def decLit(r: Random): String = r.nextInt(8) match {
    case 0 => s"${r.nextInt(2000) - 1000}.${r.nextInt(100)}"
    case 1 => "-0.0"
    case 2 => "0.000"
    case 3 => s"${r.nextInt(100)}.50"                          // trailing zero
    case 4 => "12345678901234567890.12"                        // p22
    case 5 => s"-${r.nextInt(1000)}.${1000 + r.nextInt(9000)}"
    case 6 => "0.5"
    case 7 => s"${r.nextInt(10)}.${r.nextInt(10)}"
  }
  private def dblLit(r: Random): String = r.nextInt(6) match {
    case 0 => s"${r.nextInt(1000)}.5e${r.nextInt(3)}"          // float range
    case 1 => s"-${r.nextInt(100)}.25E-${1 + r.nextInt(4)}"    // negative→double
    case 2 => "1.2E40"                                         // past float
    case 3 => s"${r.nextInt(50)}e${r.nextInt(2)}"
    case 4 => "3.5e1"
    case 5 => "-0.0e0"
  }
  private val strPool = Vector(
    "", "a", "ab", "pre_a", "pre_b", "pre_c", "zzz", "héllo", "🎉x",
    "line\nbreak", "tab\tsep", "quote\"inside", "\u0000nul",
    "x" * 300, "y" * 257, "mid" + "m" * 280 + "end")
  private def strLit(r: Random): String =
    "\"" + org.apache.commons.text.StringEscapeUtils.escapeJson(
      strPool(r.nextInt(strPool.size)) +
        (if (r.nextInt(4) == 0) r.nextInt(100).toString else "")) + "\""
  private def tsLit(r: Random): String = r.nextInt(5) match {
    case 0 => s""""2021-0${1 + r.nextInt(9)}-1${r.nextInt(10)} 0${r.nextInt(10)}:1${r.nextInt(5)}:2${r.nextInt(10)}""""
    case 1 => "\"2021-03-04T05:06:07Z\""
    case 2 => "\"2020-12-31 23:59:59 +08:30\""
    case 3 => "\"2021-13-40 99:99:99\"" // shape-valid, materializes null
    case 4 => s""""19${70 + r.nextInt(30)}-11-11 11:11:1${r.nextInt(10)}""""
  }
  private def hexLit(r: Random): String = r.nextInt(4) match {
    case 0 => "\"0a1b\""
    case 1 => "\"" + Seq.fill(1 + r.nextInt(4))("%02x".format(r.nextInt(256))).mkString + "\""
    case 2 => "\"ff\""
    case 3 => "\"deadbeef\""
  }
  private def boolLit(r: Random): String = if (r.nextBoolean()) "true" else "false"

  private case class ColSpec(name: String, gen: Random => String)

  /** Per-corpus column recipe: `id` (integral, may be huge), `n`
    * (small integral — the only avg/double-sum probe target), plus a
    * random subset of the stress columns. */
  private def columnsFor(r: Random): Seq[ColSpec] = {
    val always = Seq(
      ColSpec("id", intLit),
      ColSpec("n", rr => (rr.nextInt(10000)).toString))
    val optional = Seq(
      ColSpec("amt", decLit),
      ColSpec("x", dblLit),
      ColSpec("s", strLit),
      ColSpec("ts", tsLit),
      ColSpec("hx", hexLit),
      ColSpec("b", boolLit),
      // union-inducing flip: integral in some rows, string in others
      ColSpec("u", rr => if (rr.nextBoolean()) rr.nextInt(100).toString
        else strLit(rr)),
      // literal-dot field name (route-ambiguity stressor)
      ColSpec("a.b", rr => rr.nextInt(50).toString),
      // hex that sometimes breaks shape → kind collapse to STRING
      ColSpec("hs", rr => if (rr.nextInt(3) == 0) "\"abc\"" else hexLit(rr)))
    always ++ r.shuffle(optional).take(3 + r.nextInt(5))
  }

  /** One rendered NDJSON line under the recipe: random field presence,
    * nulls, a nested `meta` struct, and (per corpus flags) dup keys or
    * multi-doc tails. */
  private def genLine(r: Random, cols: Seq[ColSpec], dupKeys: Boolean,
                      multiDoc: Boolean, nested: Boolean): String = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    cols.foreach { c =>
      if (r.nextInt(100) >= 15) { // present with p=.85
        val v = if (r.nextInt(100) < 10) "null" else c.gen(r)
        fields += s""""${c.name.replace("\"", "")}": $v"""
      }
    }
    if (nested && r.nextInt(100) >= 20) {
      val inner = scala.collection.mutable.ArrayBuffer.empty[String]
      inner += s""""a": ${r.nextInt(1000)}"""
      if (r.nextBoolean()) inner += s""""b": ${strLit(r)}"""
      if (r.nextInt(3) == 0)
        inner += s""""deep": {"d": ${r.nextInt(100) - 50}}"""
      fields += s""""meta": {${inner.mkString(", ")}}"""
    }
    if (dupKeys && r.nextInt(8) == 0)
      fields += s""""id": ${r.nextInt(100)}""" // duplicate top-level key
    val doc = s"{${fields.mkString(", ")}}"
    if (multiDoc && r.nextInt(10) == 0)
      doc + s"""{"id": ${r.nextInt(10)}}"""
    else doc
  }

  private case class Corpus(dir: String, clustered: Boolean,
                            clean: Boolean)

  private def writeCorpus(idx: Int): (Corpus, Seq[ColSpec]) = {
    val r = new Random(0xD00DL + idx)
    val cols = columnsFor(r)
    val nested = r.nextBoolean()
    // corpus 0 is forced quality-flag-free (flags still drawn so the
    // seeded stream is unchanged): the crafted delete-decision probe
    // needs at least one corpus where success is REQUIRED, whatever
    // the other seeds roll
    val dupKeys = r.nextInt(3) == 0 && idx != 0
    val multiDoc = r.nextInt(3) == 0 && idx != 0
    val dirty = r.nextInt(3) == 0 && idx != 0
    val blanks = r.nextBoolean() && idx != 0
    val clustered = r.nextBoolean()
    val nFiles = 4 + r.nextInt(4)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val nLines = nFiles * (6 + r.nextInt(25))
    (0 until nLines).foreach { _ =>
      lines += genLine(r, cols, dupKeys, multiDoc, nested)
    }
    if (dirty) (0 until 1 + r.nextInt(3)).foreach { _ =>
      lines.insert(r.nextInt(lines.size), "{corrupt json" + r.nextInt(10))
    }
    if (blanks) (0 until 1 + r.nextInt(3)).foreach { _ =>
      lines.insert(r.nextInt(lines.size), "")
    }
    // clustered layout: sort lines by a crude extracted id so zones get
    // tight disjoint ranges (the TopN/GROUP-BY-answerable shape);
    // interleaved otherwise (the nothing-prunes shape)
    val ordered =
      if (clustered)
        lines.sortBy { l =>
          val m = """"id":\s*(-?\d+)""".r.findFirstMatchIn(l)
          m.map(_.group(1).toLong).getOrElse(Long.MinValue)
        }
      else lines
    val dir = new java.io.File(graft.TempRoots.path(s"zone_fuzz_$idx"))
    dir.mkdirs()
    val per = math.max(1, ordered.size / nFiles)
    ordered.grouped(per).zipWithIndex.foreach { case (chunk, fi) =>
      val w = new java.io.PrintWriter(
        new java.io.File(dir, f"f$fi%03d.json"), "UTF-8")
      chunk.foreach(w.println)
      w.close()
    }
    (Corpus(dir.toString, clustered,
      clean = !dirty && !blanks && !multiDoc && !dupKeys), cols)
  }

  // ---------------------------------------------------------------
  // canonical rendering + comparison
  // ---------------------------------------------------------------

  private def render(v: Any): String = v match {
    case null => "∅"
    case b: Array[Byte] => "0x" + b.map("%02x".format(_)).mkString
    case d: java.math.BigDecimal => d.toPlainString
    case d: Double => java.lang.Double.toString(d)
    case f: Float => java.lang.Float.toString(f)
    case r: Row => r.toSeq.map(render).mkString("{", "|", "}")
    case s: scala.collection.Seq[_] => s.map(render).mkString("[", "|", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => s"${render(k)}→${render(x)}" }
        .sorted.mkString("⟨", "|", "⟩")
    case other => other.toString
  }

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(r => r.toSeq.map(render).mkString("⟪", "¦", "⟫"))
      .sorted

  private def assertSame(got: DataFrame, want: DataFrame, what: String): Unit = {
    val skipBefore = JsonDocSource.zoneSkippedFiles.get()
    val g = rowsOf(got)
    val skipped = JsonDocSource.zoneSkippedFiles.get() - skipBefore
    val w = rowsOf(want)
    assert(g == w,
      s"""FUZZ DIVERGENCE [$what] (zone-skipped files during probe: $skipped)
         |  zone-side (${g.size} rows): ${g.take(8).mkString(" ")}
         |  truth     (${w.size} rows): ${w.take(8).mkString(" ")}
         |  PLAN: ${got.queryExecution.executedPlan.toString.take(1500)}""".stripMargin)
  }

  // ---------------------------------------------------------------
  // probe generation
  // ---------------------------------------------------------------

  /** Leaf probe paths: top-level atomic columns plus struct-nested
    * chains (unions surface their struct encoding too — truth is the
    * local frame either way). */
  private def probePaths(schema: StructType): Seq[(String, DataType)] = {
    def walk(prefix: String, st: StructType): Seq[(String, DataType)] =
      st.fields.toSeq.flatMap { f =>
        val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: StructType => walk(name, s)
          case a: ArrayType => Seq.empty // no array probes
          case _ if f.name.contains(".") && prefix.isEmpty =>
            Seq.empty // literal-dot top-level names need backtick care
          case d => Seq((name, d))
        }
      }
    walk("", schema)
  }

  /** A typed literal Column matching the column's class (so the exact
    * pushdown path is actually exercised), value drawn from observed
    * data (p≈.6) or perturbed. */
  private def litFor(r: Random, dt: DataType, observed: Seq[Any]): Option[Column] = {
    def pick[A](mk: => A): Any =
      if (observed.nonEmpty && r.nextInt(10) < 6)
        observed(r.nextInt(observed.size))
      else mk
    dt match {
      case ByteType => Some(lit(pick((r.nextInt(256) - 128).toByte) match {
        case b: Byte => b
        case o: Number => o.byteValue }))
      case ShortType => Some(lit(pick((r.nextInt(65536) - 32768).toShort) match {
        case s: Short => s
        case o: Number => o.shortValue }))
      case IntegerType => Some(lit(pick(r.nextInt()) match {
        case i: Int => if (r.nextInt(4) == 0) i + 1 else i
        case o: Number => o.intValue }))
      case LongType => Some(lit(pick(r.nextLong()) match {
        case l: Long => if (r.nextInt(4) == 0) l - 1 else l
        case o: Number => o.longValue }))
      case StringType => Some(lit(pick(strPool(r.nextInt(strPool.size))) match {
        case s: String => if (r.nextInt(5) == 0) s + "x" else s
        case o => String.valueOf(o) }))
      case BooleanType => Some(lit(r.nextBoolean()))
      case DoubleType => Some(lit(pick(r.nextDouble() * 100) match {
        case d: Double => d
        case o: Number => o.doubleValue }))
      case FloatType => Some(lit(pick(r.nextFloat() * 100) match {
        case f: Float => f
        case o: Number => o.floatValue }))
      case d: DecimalType => Some(lit(pick(
        new java.math.BigDecimal(r.nextInt(2000) - 1000).movePointLeft(1)) match {
        case b: java.math.BigDecimal => b
        case o => new java.math.BigDecimal(String.valueOf(o))
      }).cast(d))
      case TimestampType => observed.headOption.map(v =>
        lit(observed(r.nextInt(observed.size))))
      case _ => None
    }
  }

  /** One random predicate over the probe paths (possibly And/Or of two
    * leaves). Returns the Column plus a description for failures. */
  private def genPredicate(r: Random, paths: Seq[(String, DataType)],
                           values: Map[String, Seq[Any]],
                           depth: Int = 0): Option[(Column, String)] = {
    if (depth < 1 && r.nextInt(4) == 0) {
      (genPredicate(r, paths, values, 1), genPredicate(r, paths, values, 1)) match {
        case (Some((l, ld)), Some((rt, rd))) =>
          if (r.nextBoolean()) Some((l && rt, s"($ld AND $rd)"))
          else Some((l || rt, s"($ld OR $rd)"))
        case _ => None
      }
    } else {
      val (name, dt) = paths(r.nextInt(paths.size))
      val c = col(name)
      val obs = values.getOrElse(name, Seq.empty)
      r.nextInt(10) match {
        case 0 => Some((c.isNull, s"$name IS NULL"))
        case 1 => Some((c.isNotNull, s"$name IS NOT NULL"))
        case 2 | 3 => litFor(r, dt, obs).map(v => (c === v, s"$name = $v"))
        case 4 => litFor(r, dt, obs).map(v => (c > v, s"$name > $v"))
        case 5 => litFor(r, dt, obs).map(v => (c < v, s"$name < $v"))
        case 6 => litFor(r, dt, obs).map(v => (c >= v, s"$name >= $v"))
        case 7 =>
          val vs = (0 until 1 + r.nextInt(3)).flatMap(_ => litFor(r, dt, obs))
          if (vs.isEmpty) None else Some((c.isin(vs: _*), s"$name IN (${vs.size})"))
        case 8 if dt == StringType =>
          val p = strPool(r.nextInt(strPool.size)).take(1 + r.nextInt(4))
          r.nextInt(3) match {
            case 0 => Some((c.startsWith(p), s"$name LIKE '$p%'"))
            case 1 => Some((c.endsWith(p), s"$name LIKE '%$p'"))
            case 2 => Some((c.contains(p), s"$name LIKE '%$p%'"))
          }
        case _ => litFor(r, dt, obs).map(v => (c <= v, s"$name <= $v"))
      }
    }
  }

  /** One random whole-table DELETE probe over the top-level simple
    * columns: the V1 filter the engine hands [[JsonDocDelete]], its
    * Column twin for ground truth, and a description. Dotted literal
    * names are excluded (col("a.b") would resolve as a nested path —
    * not the attribute the filter names). */
  private def genDeleteProbe(r: Random, tops: Seq[(String, DataType)],
                             values: Map[String, Seq[Any]])
      : Option[(org.apache.spark.sql.sources.Filter, Column, String)] = {
    import org.apache.spark.sql.sources._
    if (tops.isEmpty) return None
    val (name, _) = tops(r.nextInt(tops.size))
    val c = col(name)
    val obs = values.getOrElse(name, Seq.empty).filterNot(_ == null)
    def rawLit: Option[Any] =
      if (obs.nonEmpty) Some(obs(r.nextInt(obs.size))) else None
    r.nextInt(8) match {
      case 0 => Some((IsNull(name), c.isNull, s"$name IS NULL"))
      case 1 => Some((IsNotNull(name), c.isNotNull, s"$name IS NOT NULL"))
      case 2 | 3 => rawLit.map(v =>
        (EqualTo(name, v), c === lit(v), s"$name = $v"))
      case 4 => rawLit.map(v =>
        (GreaterThan(name, v), c > lit(v), s"$name > $v"))
      case 5 => rawLit.map(v =>
        (LessThan(name, v), c < lit(v), s"$name < $v"))
      case 6 => rawLit.map(v =>
        (GreaterThanOrEqual(name, v), c >= lit(v), s"$name >= $v"))
      case _ =>
        val vs = (0 until 1 + r.nextInt(3)).flatMap(_ => rawLit).distinct
        if (vs.isEmpty) None
        else Some((In(name, vs.toArray),
          c.isin(vs.map(lit): _*), s"$name IN (${vs.size})"))
    }
  }

  // ---------------------------------------------------------------
  // the harness
  // ---------------------------------------------------------------

  private def runCorpus(idx: Int): (Int, Int) = {
    val (corpus, _) = writeCorpus(idx)
    val zdf = spark.read.format("graftjson")
      .option("zonemaps", "true").load(corpus.dir)
    val schema = zdf.schema
    // ground truth: one unfiltered, zone-free full scan, re-wrapped as
    // a LOCAL frame — no zones, no pushdown, no early skip
    val baseRows = spark.read.format("graftjson").load(corpus.dir).collect()
    val truth = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(baseRows: _*)),
      schema)
    truth.persist()
    try {
      val paths = probePaths(schema)
      assert(paths.nonEmpty, s"corpus $idx produced no probe paths")
      // observed values per path for literal generation
      val values: Map[String, Seq[Any]] = paths.map { case (n, _) =>
        n -> truth.select(col(n)).where(col(n).isNotNull)
          .distinct().limit(40).collect().toSeq.map(_.get(0))
      }.toMap
      val integralPaths = paths.filter(p => p._2 match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
      val decimalPaths = paths.filter(_._2.isInstanceOf[DecimalType])
      val orderable = paths.filter(p => p._2 match {
        case ByteType | ShortType | IntegerType | LongType | StringType => true
        case _: DecimalType => true
        case _ => false
      })
      val groupable = paths.filter(p => p._2 match {
        case StringType | ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
      val r = new Random(0xF0CCL + idx)
      var ran = 0
      var skippedGen = 0
      (0 until ProbesPerCorpus).foreach { pi =>
        val what = s"corpus $idx probe $pi"
        r.nextInt(7) match {
          // --- filtered row probes (the skip/early-skip/exact surface)
          case 0 | 1 | 2 =>
            genPredicate(r, paths, values) match {
              case Some((p, d)) =>
                assertSame(zdf.where(p), truth.where(p), s"$what WHERE $d")
                ran += 1
              case None => skippedGen += 1
            }
          // --- aggregates, optionally filtered (metadata answering)
          case 3 | 4 =>
            val aggs = scala.collection.mutable.ArrayBuffer[Column](
              count(lit(1)).as("cnt"))
            if (integralPaths.nonEmpty) {
              val (n, _) = integralPaths(r.nextInt(integralPaths.size))
              // SUM only over the small-value column: ANSI mode makes a
              // Long-overflowing sum THROW (deterministically on both
              // sides, but an exception is not a comparable result)
              aggs += sum(col("n")).as("s")
              aggs += min(col(n)).as("mn")
              aggs += max(col(n)).as("mx")
              aggs += count(col(n)).as("cc")
            }
            if (decimalPaths.nonEmpty && r.nextBoolean()) {
              val (n, _) = decimalPaths(r.nextInt(decimalPaths.size))
              aggs += sum(col(n)).as("ds")
              aggs += min(col(n)).as("dmn")
            }
            if (r.nextBoolean())
              aggs += avg(col("n")).as("av") // small values: exact window
            val fOpt = if (r.nextBoolean())
              genPredicate(r, paths, values) else None
            val (zq, tq) = fOpt match {
              case Some((p, _)) => (zdf.where(p), truth.where(p))
              case None => (zdf, truth)
            }
            val gOpt = if (groupable.nonEmpty && r.nextBoolean())
              Some(groupable(r.nextInt(groupable.size))._1) else None
            val tailAggs = aggs.tail.toSeq
            gOpt match {
              case Some(g) =>
                assertSame(zq.groupBy(col(g)).agg(aggs.head, tailAggs: _*),
                  tq.groupBy(col(g)).agg(aggs.head, tailAggs: _*),
                  s"$what GROUP BY $g${fOpt.fold("")(f => s" WHERE ${f._2}")}")
              case None =>
                assertSame(zq.agg(aggs.head, tailAggs: _*),
                  tq.agg(aggs.head, tailAggs: _*),
                  s"$what AGG${fOpt.fold("")(f => s" WHERE ${f._2}")}")
            }
            ran += 1
          // --- SELECT DISTINCT (group-pushdown keys-only shape)
          case 5 if groupable.nonEmpty =>
            val (g, _) = groupable(r.nextInt(groupable.size))
            assertSame(zdf.select(col(g)).distinct(),
              truth.select(col(g)).distinct(), s"$what DISTINCT $g")
            ran += 1
          // --- TopN / bare LIMIT (file-pruning guarantees)
          case _ if orderable.nonEmpty =>
            val (k, _) = orderable(r.nextInt(orderable.size))
            val limit = 1 + r.nextInt(12)
            if (r.nextInt(4) == 0) {
              // bare LIMIT: any n rows satisfy it — compare the count
              val got = zdf.limit(limit).count()
              val want = math.min(limit.toLong, truth.count())
              assert(got == want, s"$what LIMIT $limit: got $got want $want")
            } else {
              val ord = if (r.nextBoolean()) col(k).asc else col(k).desc
              val fOpt = if (r.nextInt(3) == 0)
                genPredicate(r, paths, values) else None
              val (zq, tq) = fOpt match {
                case Some((p, _)) => (zdf.where(p), truth.where(p))
                case None => (zdf, truth)
              }
              // ties make the row SET nondeterministic; the first-key
              // multiset is what any valid top-k guarantees
              val g = zq.orderBy(ord).limit(limit).select(col(k))
                .collect().toSeq.map(v => render(v.get(0))).sorted
              val w = tq.orderBy(ord).limit(limit).select(col(k))
                .collect().toSeq.map(v => render(v.get(0))).sorted
              assert(g == w,
                s"$what TOPN $k limit $limit${fOpt.fold("")(f => s" WHERE ${f._2}")}: $g vs $w")
            }
            ran += 1
          case _ => skippedGen += 1
        }
      }
      // --- maintenance-lifecycle leg: compact, then Z-order recluster,
      // replaying probes against the SAME ground truth — the rewrites
      // must preserve the row multiset verbatim and the REBUILT zones
      // must stay sound for every proof path
      def replay(stage: String, handle: DataFrame, n: Int): Unit =
        (0 until n).foreach { pi =>
          genPredicate(r, paths, values) match {
            case Some((p, d)) =>
              assertSame(handle.where(p), truth.where(p),
                s"corpus $idx $stage replay $pi WHERE $d")
              ran += 1
            case None => skippedGen += 1
          }
        }
      JsonCompact.compact(spark, corpus.dir, targetBytes = 16L << 10)
      replay("post-compact",
        spark.read.format("graftjson").option("zonemaps", "true")
          .load(corpus.dir), 8)
      JsonCompact.zorderRecluster(spark, corpus.dir, "n", "id",
        targetBytes = 2L << 10)
      replay("post-zorder",
        spark.read.format("graftjson").option("zonemaps", "true")
          .load(corpus.dir), 8)
      // time-travel leg: a save minted NOW reconstructs exactly the
      // current (= ground-truth) population through the as-of fold
      val saveId = JsonMeta.save(spark, corpus.dir).saveId
      if (saveId > 0) {
        replay("as-of-latest",
          spark.read.format("graftjson")
            .option("asOfSave", saveId.toString)
            .option("zonemaps", "true").load(corpus.dir), 4)
      }
      // --- SQL-DELETE decision leg (r14, LAST — it mutates): the
      // metadata-only deleteWhere must refuse with the named error or
      // remove EXACTLY the predicate's rows. One-sided like skip
      // soundness: refusal is always allowed (zones may be unable to
      // prove), success must be exact. Success can narrow the
      // re-inferred schema (whole files gone ⇒ fewer sightings), so
      // the exact check compares full rows only under an unchanged
      // schema and falls back to count + shared same-typed column
      // multisets otherwise — schema-on-read narrowing is legitimate,
      // a lost or resurrected ROW is not.
      {
        val tops = schema.fields.toSeq
          .filterNot(_.name.contains("."))
          .filter(_.dataType match {
            case ByteType | ShortType | IntegerType | LongType |
                 StringType | BooleanType => true
            case _ => false
          })
          .map(f => (f.name, f.dataType))
        genDeleteProbe(r, tops, values) match {
          case Some((f, p, d)) =>
            val survivorsWant = truth.where(!coalesce(p, lit(false)))
            val liveFiles = JsonDocSource.listFiles(
              spark, Seq(corpus.dir)).size
            val removed =
              try Some(JsonDocDelete.delete(spark, corpus.dir, Seq(f)))
              catch {
                case e: IllegalStateException =>
                  assert(e.getMessage.contains("PROVABLY decided"),
                    s"corpus $idx DELETE $d unexpected refusal: " +
                      e.getMessage)
                  None
              }
            removed.foreach(_ => deleteSucceeded += 1)
            if (removed.isEmpty) deleteRefused += 1
            removed match {
              case Some(n) if n == liveFiles =>
                // everything removed: a bare read of the emptied table
                // throws the strict no-files message by design
                assert(survivorsWant.count() == 0L,
                  s"corpus $idx DELETE $d removed all $n files but " +
                    s"ground truth kept rows")
              case Some(_) =>
                val after = spark.read.format("graftjson")
                  .load(corpus.dir)
                assert(after.count() == survivorsWant.count(),
                  s"corpus $idx post-DELETE $d row conservation")
                if (after.schema == schema)
                  assertSame(after, survivorsWant,
                    s"corpus $idx post-DELETE $d")
                else after.schema.fields
                  .filter(af => schema.fields.exists(gf =>
                    gf.name == af.name && gf.dataType == af.dataType))
                  .foreach { af =>
                    val g = after.select(col(af.name)).collect()
                      .map(row => render(row.get(0))).sorted.toSeq
                    val w = survivorsWant.select(col(af.name)).collect()
                      .map(row => render(row.get(0))).sorted.toSeq
                    assert(g == w,
                      s"corpus $idx post-DELETE $d column ${af.name}")
                  }
              case None =>
                assertSame(spark.read.format("graftjson").load(corpus.dir),
                  truth, s"corpus $idx refused-DELETE $d left a change")
            }
            ran += 1
          case None => skippedGen += 1
        }
        // crafted decidable probe: append a file whose every row has
        // n >= 20000 (clean, exact-integral, disjoint from the
        // generator's 0..9999 range and inside n's short width), then
        // DELETE n >= 20000. On a fully clean corpus the decision MUST
        // succeed — the crafted file proves all-match, every original
        // file proves empty by exact integral bounds — and restore the
        // pre-append table exactly; any quality flag anywhere declines
        // the whole statement by contract (the filtered-COUNT rule).
        // The random probe above may have legitimately removed files,
        // so restoration is checked against the CURRENT table, not the
        // pre-mutation ground truth (review r14).
        val liveNow = JsonDocSource.listFiles(spark, Seq(corpus.dir))
        if (liveNow.isEmpty) skippedGen += 1 // random probe emptied it
        else {
          val curHandle = spark.read.format("graftjson").load(corpus.dir)
          val curSchema = curHandle.schema
          val curRows = curHandle.collect()
          val curTruth = spark.createDataFrame(
            new java.util.ArrayList[Row](java.util.Arrays.asList(curRows: _*)),
            curSchema)
          val crafted = new java.io.File(corpus.dir, "zz_crafted_delete.json")
          val cw = new java.io.PrintWriter(crafted, "UTF-8")
          (0 until 5).foreach(i => cw.println("{\"n\": " + (20000 + i) + "}"))
          cw.close()
          val cf = org.apache.spark.sql.sources.GreaterThanOrEqual("n", 20000)
          val cRemoved =
            try Some(JsonDocDelete.delete(spark, corpus.dir, Seq(cf)))
            catch {
              case e: IllegalStateException =>
                assert(e.getMessage.contains("PROVABLY decided"),
                  s"corpus $idx crafted DELETE unexpected refusal: " +
                    e.getMessage)
                None
            }
          cRemoved match {
            case Some(nr) =>
              deleteSucceeded += 1
              assert(nr == 1,
                s"corpus $idx crafted delete removed $nr files, wanted 1")
              assertSame(spark.read.format("graftjson").load(corpus.dir),
                curTruth, s"corpus $idx crafted delete must restore the table")
            case None =>
              deleteRefused += 1
              // must-succeed only while the surviving corpus still
              // sights n somewhere (a random removal could have taken
              // every n-bearing file — the originals then prove
              // nothing about n, a legitimate decline)
              assert(!corpus.clean || !curSchema.fieldNames.contains("n"),
                s"corpus $idx is quality-flag-free but the crafted " +
                  "decidable delete refused")
              // the refused statement left the crafted rows in place;
              // unlink them so the corpus ends as it began
              assert(crafted.delete())
          }
          ran += 1
        }
      }
      (ran, skippedGen)
    } finally truth.unpersist()
  }

  test("1k+ randomized corpora×probes: zone-side results equal the local ground truth") {
    var total = 0
    (0 until Corpora).foreach { i =>
      val (ran, skipped) = runCorpus(i)
      // generation dead-ends (no eligible column for a probe kind) must
      // stay rare or the case count is fiction
      assert(ran >= ProbesPerCorpus - 15,
        s"corpus $i only ran $ran probes ($skipped skipped)")
      total += ran
    }
    info(s"zone fuzz: $total generated cases ran")
    info(s"delete leg: $deleteSucceeded succeeded, $deleteRefused refused")
    assert(total >= 1000, s"only $total generated cases ran")
    assert(deleteSucceeded >= 1 && deleteRefused >= 1,
      s"delete leg vacuous: $deleteSucceeded succeeded / $deleteRefused refused")
  }
}
