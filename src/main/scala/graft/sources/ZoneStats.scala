package graft.sources

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import java.math.{BigDecimal => JBigDecimal}

/** Per-file zone maps for the graftjson source (`zonemaps=true`): the
  * planning-time inference job already reads every byte of every file,
  * so min/max/presence statistics of the top-level fields ride the
  * same job and let [[JsonDocScan]] skip whole files whose zone
  * provably excludes a pushed predicate — the parquet row-group-stats
  * idea applied at file granularity to schemaless NDJSON. At 100 TB
  * the scan that never runs is the cheapest scan; a date- or
  * id-partitioned corpus (the common layout: one file set per day /
  * per shard) prunes to the files the filter actually touches.
  *
  * SOUNDNESS RULES (skip only what is PROVABLY empty):
  *   - numeric bounds are exact `BigDecimal`s of the raw JSON literal
  *     text and are consulted only for columns whose final inferred
  *     type is integral or decimal — those materialize the same exact
  *     value. FLOAT/DOUBLE columns are never zone-skipped: their
  *     binary rounding could disagree with the decimal text at a
  *     boundary literal (the 0.1f class of corners).
  *   - string bounds are the raw JSON string values and are consulted
  *     only for columns whose final type is plain STRING (the
  *     materialized value IS the raw string). Timestamp/binary-typed
  *     string columns are never skipped: their materialized ordering
  *     is not the lexicographic text ordering.
  *   - only literals whose JVM class converts exactly
  *     (Byte/Short/Integer/Long/BigInteger/BigDecimal, String) take
  *     part; Double/Float literals never prove a skip.
  *   - a file whose stats walk hit ANY parse anomaly is `dirty` and is
  *     never skipped (the materializing reader is more tolerant than
  *     a provability argument can be).
  *   - a line carrying several concatenated docs contributes every
  *     doc's values to the bounds (a superset of what the reader
  *     materializes — the reader takes the line's first doc — which
  *     can only make skipping MORE conservative).
  *
  * State volume: one small FieldZone record per (file, field),
  * aggregated SHARDED BY FILE ([[ZoneFileAgg]] under a
  * `groupByKey(file)`) — map-side partials per file, shuffle of tiny
  * buffers, no task or buffer ever holding more than its own files'
  * state; the driver collects one row per file. The option is off by
  * default because the stats walk re-parses each unit (planning-time
  * CPU), not because of state: the per-file shard shape carries a
  * million-file table. */
object ZoneStats {

  /** Max distinct values retained per field per file before the exact
    * set declares overflow (`null` set = unbounded); and the longest
    * string a set will hold — min/max already store two full strings,
    * the set must not multiply that by 64 on MB-sized text fields. */
  private[sources] val SetCutoff = 64
  private[sources] val SetMaxStrLen = 128

  /** Longest string a min/max BOUND will hold. Document-sized text
    * fields would otherwise put two full documents into every file's
    * zone, multiplied across 10^5 files into the driver-held ZoneMap
    * and the durable meta — unbounded state for the feature whose
    * whole point is bounded planning state. A longer value folds as a
    * LOOSENED bound (min truncated — a prefix orders ≤ the value; max
    * prefix-successor-raised — orders ≥ every value with that prefix)
    * and flips `strInexact`, which declines MIN/MAX answering while
    * keeping skip decisions sound (looser bounds only skip less). */
  private[sources] val BoundMaxStrLen = 256

  /** Least string strictly above every string with prefix `p` in
    * CODE-POINT order, if one safely exists. Only a char strictly
    * below U+D7FF increments (c+1 stays a plain BMP scalar, ordered
    * identically in code-unit and code-point terms); surrogates,
    * U+D7FF, and U+FFFF positions are skipped — truncating after an
    * incremented earlier char remains a correct (looser) upper
    * bound, and a prefix with no incrementable char has none. */
  private[sources] def prefixSuccessor(p: String): Option[String] = {
    var i = p.length - 1
    while (i >= 0 && p.charAt(i) >= 0xD7FF.toChar) i -= 1
    if (i < 0) None
    else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }

  /** Truncate a SANITIZED (well-formed) string to the bound cap
    * without splitting a surrogate pair — the result is a well-formed
    * prefix, which orders ≤ the value in code-point terms. */
  private def truncBound(v: String): String = {
    val cut =
      if (Character.isHighSurrogate(v.charAt(BoundMaxStrLen - 1)))
        BoundMaxStrLen - 1
      else BoundMaxStrLen
    v.substring(0, cut)
  }

  /** Bounds/presence of one top-level field within one file.
    * `present` counts non-null scalar (number/string) occurrences,
    * `others` counts booleans and nested values — both materialize
    * non-null, so null-reasoning must account for them; implicit
    * nulls are `docs - present - others` (missing field, explicit
    * null, or a concatenated-doc undercount — see dirty).
    *
    * `numSet`/`strSet` are EXACT distinct-value sets up to
    * [[SetCutoff]] values (`null` once overflowed): the categorical-
    * field complement to min/max — `src = 'delta'` can be provably
    * empty even when 'delta' sits inside [strMin, strMax], which for
    * label-like fields (language, source, category) it almost always
    * does. Numbers are stored `stripTrailingZeros`-canonical so set
    * membership coincides with `compareTo`-equality (2 vs 2.0);
    * strings are stored sanitized, like the bounds. */
  final case class FieldZone(present: Long, others: Long,
                             numMin: JBigDecimal, numMax: JBigDecimal,
                             strMin: String, strMax: String,
                             numSet: Set[JBigDecimal], strSet: Set[String],
                             strInexact: Boolean,
                             numSum: JBigDecimal)
      extends Serializable {
    def addNum(v: JBigDecimal): FieldZone = copy(
      present = present + 1,
      numMin = if (numMin == null || v.compareTo(numMin) < 0) v else numMin,
      numMax = if (numMax == null || v.compareTo(numMax) > 0) v else numMax,
      numSet =
        if (numSet == null || v.precision > 38) null
        else capSet(numSet + v.stripTrailingZeros),
      // EXACT running sum of every numeric occurrence (BigDecimal add
      // never rounds) — what SUM(col) pushdown answers from; null ⟺
      // no numeric value folded yet
      numSum = if (numSum == null) v else numSum.add(v))
    def addStr(raw: String): FieldZone = {
      // record the UTF-8-SANITIZED form: Spark materializes strings
      // through UTF8String.fromString (Java's UTF-8 encoder), which
      // replaces unpaired surrogates with '?'. Bounds over the raw
      // UTF-16 form would order an escaped lone \uD800 very high
      // while the engine compares the very low '?' — a skip decided
      // on the raw form could prune rows the engine matches.
      val v = utf8Sanitize(raw)
      // bound-length cap: a value past BoundMaxStrLen folds LOOSENED
      // bounds (truncated prefix as lower, prefix-successor as upper —
      // full value when no successor exists) and flips strInexact so
      // MIN/MAX answering declines; skipping stays sound either way
      val (lo, hi, inexact) =
        if (v.length <= BoundMaxStrLen) (v, v, false)
        else {
          val t = truncBound(v)
          (t, prefixSuccessor(t).getOrElse(v), true)
        }
      copy(present = present + 1,
        strMin = if (strMin == null || cpCompare(lo, strMin) < 0) lo else strMin,
        strMax = if (strMax == null || cpCompare(hi, strMax) > 0) hi else strMax,
        strSet =
          if (strSet == null || v.length > SetMaxStrLen) null
          else capSet(strSet + v),
        strInexact = strInexact || inexact)
    }
    def addOther: FieldZone = copy(others = others + 1)
    def merge(o: FieldZone): FieldZone = FieldZone(
      present + o.present, others + o.others,
      minBd(numMin, o.numMin), maxBd(numMax, o.numMax),
      minStr(strMin, o.strMin), maxStr(strMax, o.strMax),
      unionSets(numSet, o.numSet), unionSets(strSet, o.strSet),
      strInexact || o.strInexact,
      if (numSum == null) o.numSum
      else if (o.numSum == null) numSum
      else numSum.add(o.numSum))
  }
  private def capSet[T](s: Set[T]): Set[T] =
    if (s.size > SetCutoff) null else s
  private def unionSets[T](a: Set[T], b: Set[T]): Set[T] =
    if (a == null || b == null) null else capSet(a ++ b)
  private[sources] val emptyField =
    FieldZone(0L, 0L, null, null, null, null, Set.empty, Set.empty,
      strInexact = false, numSum = null)

  private def minBd(a: JBigDecimal, b: JBigDecimal) =
    if (a == null) b else if (b == null) a
    else if (a.compareTo(b) <= 0) a else b
  private def maxBd(a: JBigDecimal, b: JBigDecimal) =
    if (a == null) b else if (b == null) a
    else if (a.compareTo(b) >= 0) a else b
  private def minStr(a: String, b: String) =
    if (a == null) b else if (b == null) a
    else if (cpCompare(a, b) <= 0) a else b
  private def maxStr(a: String, b: String) =
    if (a == null) b else if (b == null) a
    else if (cpCompare(a, b) >= 0) a else b

  /** Replace unpaired surrogates with '?', exactly as Java's UTF-8
    * encoder (and therefore Spark's `UTF8String.fromString`) does on
    * materialization — zone bounds and filter literals must compare
    * in the SANITIZED domain or an escaped lone surrogate in a doc
    * would order completely differently than its materialized form. */
  def utf8Sanitize(s: String): String = {
    var i = 0
    while (i < s.length && !Character.isSurrogate(s.charAt(i))) i += 1
    if (i == s.length) return s // fast path: no surrogates at all
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, i)
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c) && i + 1 < s.length &&
        Character.isLowSurrogate(s.charAt(i + 1))) {
        sb.append(c).append(s.charAt(i + 1)); i += 2
      } else if (Character.isSurrogate(c)) { sb.append('?'); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** CODE-POINT string comparison — the order Spark's binary
    * UTF8String comparison realizes (for well-formed input; ill-
    * formed strings are [[utf8Sanitize]]d before they reach bounds or
    * tests). Java's `String.compareTo` is UTF-16 code-UNIT order,
    * which ranks a surrogate-pair emoji (≥ U+10000) BELOW BMP
    * characters in [U+E000, U+FFFF]; using it for zone bounds would
    * let a skip or a pushed min/max contradict what the engine
    * actually computes on emoji-bearing text. */
  def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Total bytes of exact distinct-set state one FILE's zone may
    * retain across all its paths. Sets are already capped per path
    * (≤ [[SetCutoff]] values of ≤ [[SetMaxStrLen]] chars), but a
    * map-shaped file can hold [[MaxPathsPerFile]] such paths — ~8 MB
    * of driver-held (and durably persisted) state per file in the
    * pathological case, multiplied by the file count the feature
    * exists to scale to. [[trimFile]] drops whole sets (→ null, the
    * established overflow rendering every proof already declines on),
    * largest first, until the file fits the budget; min/max bounds
    * (512 bytes/path worst) always survive, so range pruning never
    * degrades. 256 KB keeps every realistic categorical profile
    * (dozens of label-like paths) intact. */
  private[sources] val SetBytesPerFileBudget: Long = 256L << 10

  /** Deterministic set-budget enforcement for one FINISHED file zone —
    * applied by [[ZoneFileAgg.finish]] AND the write-time capture
    * ([[graft.sources.JsonDocWrite]]), which must stay byte-identical:
    * the decision depends only on the final folded state (path names
    * and set contents), never on fold order. */
  private[sources] def trimFile(z: FileZone): FileZone = {
    def setBytes(f: FieldZone): Long = {
      val s = if (f.strSet == null) 0L
        else f.strSet.iterator.map(_.length.toLong).sum
      val n = if (f.numSet == null) 0L
        else f.numSet.iterator.map(_.toString.length.toLong).sum
      s + n
    }
    val total = z.fields.valuesIterator.map(setBytes).sum
    if (total <= SetBytesPerFileBudget) return z
    // drop the largest sets first (path name as the unique tiebreak)
    val byCost = z.fields.toSeq
      .map { case (p, f) => (p, f, setBytes(f)) }
      .filter(_._3 > 0)
      .sortBy { case (p, _, b) => (-b, p) }
    var over = total - SetBytesPerFileBudget
    var fields = z.fields
    val it = byCost.iterator
    while (over > 0 && it.hasNext) {
      val (p, f, b) = it.next()
      fields = fields.updated(p, f.copy(numSet = null, strSet = null))
      over -= b
    }
    z.copy(fields = fields)
  }

  /** Most distinct paths one file's zone will hold — map-shaped JSON
    * (objects used as dictionaries: one key per uuid/user/day) would
    * otherwise make zone state per file UNBOUNDED, and nested
    * recursion amplifies it. Once a file hits the cap, NEW paths stop
    * recording and [[FileZone.overflow]] flips: recorded paths keep
    * folding every value (their stats stay complete and provable),
    * while a path MISSING from an overflowed file is indistinguishable
    * from all-null — so every absence-based proof gates on
    * `fields.contains(path) || !overflow`. */
  private[sources] val MaxPathsPerFile = 1024

  /** One file's zone: doc count, INPUT-UNIT count (`units` — NDJSON
    * lines / whole-mode files — exactly the rows the scan emits, blank
    * and corrupt lines included, because both the planning read and
    * the scan split on the same Hadoop line rule), parse-anomaly flag,
    * PER-LINE concatenation flag (`multiDoc` — some single unit
    * carried more than one document, so bounds include values the
    * reader, which takes a line's FIRST doc, never materializes:
    * still sound for skipping, unanswerable for min/max — a per-FILE
    * docs-vs-units comparison could be masked by blank lines),
    * duplicate-key flag (`dupKey` — some doc repeated a key at any
    * depth, so per-field sighting counts can exceed doc counts and
    * the "every row is non-null" argument breaks: IsNull skipping
    * declines; bounds/sets stay sound — duplicates only fold extra
    * values, a superset), path-cap flag (`overflow` — see
    * [[MaxPathsPerFile]]), and per-path zones. */
  final case class FileZone(docs: Long, units: Long, dirty: Boolean,
                            multiDoc: Boolean, dupKey: Boolean,
                            overflow: Boolean,
                            fields: Map[String, FieldZone])
      extends Serializable {
    /** Merge two PARTIAL buffers of one file. The proof system's
      * invariant is "a RECORDED path's stats are complete" — but a
      * path one side REFUSED at its [[MaxPathsPerFile]] cap (absent
      * there while that side overflowed) while the other side
      * recorded it would merge into a CONTAINED path with
      * one-side-only bounds/sets/sums, which every proof would trust
      * (review r12: a multi-split file could then zone-skip rows the
      * missing split holds). Such paths are DROPPED entirely: absence
      * + the overflow flag is the established "proves nothing"
      * rendering. The union is also re-capped (two no-overflow
      * buffers can union past the per-file cap), keeping the
      * lexicographically-first paths — deterministic given the two
      * inputs, and any sound subset is a valid zone. */
    def merge(o: FileZone): FileZone = {
      val keys = fields.keySet ++ o.fields.keySet
      val complete = keys.filter(k =>
        (fields.contains(k) || !overflow) &&
          (o.fields.contains(k) || !o.overflow))
      val kept =
        if (complete.size <= MaxPathsPerFile) complete
        else complete.toSeq.sorted.take(MaxPathsPerFile).toSet
      FileZone(
        docs + o.docs, units + o.units, dirty || o.dirty,
        multiDoc || o.multiDoc, dupKey || o.dupKey,
        overflow || o.overflow || kept.size < keys.size,
        kept.iterator.map { k =>
          k -> fields.getOrElse(k, emptyField)
            .merge(o.fields.getOrElse(k, emptyField))
        }.toMap)
    }
  }
  private[sources] val emptyFile =
    FileZone(0L, 0L, dirty = false, multiDoc = false, dupKey = false,
      overflow = false, Map.empty)

  type ZoneMap = Map[String, FileZone]

  private val factory = new JsonFactory()

  /** One rendering for file names on BOTH sides of the per-file maps:
    * `input_file_name()` returns a URL-ENCODED URI ("a%20b.json")
    * while the planner's `FileStatus.getPath.toString` renders
    * decoded ("a b.json") — keying on mismatched renderings would
    * silently record a real file as empty. Decode through
    * `java.net.URI` when the string parses as one; fall back to the
    * plain Path rendering. */
  def normalizeFileName(f: String): String =
    try new org.apache.hadoop.fs.Path(new java.net.URI(f)).toString
    catch { case _: Exception => new org.apache.hadoop.fs.Path(f).toString }

  /** Deepest zone path recorded, in SEGMENTS (a leaf at depth
    * [[MaxPathDepth]] has that many dot-joined segments). The walker
    * and the eligibility map ([[ZoneSkip.eligiblePaths]]) MUST share
    * this cap: a path the map offers but the walker never recorded
    * would read as "all null" and mis-prove IsNotNull skips. */
  private[sources] val MaxPathDepth = 8

  /** Walk every document concatenated in one input unit (an NDJSON
    * line, or a whole file's text), folding scalar values into the
    * zone under their DOTTED path — top-level fields as before, and
    * fields of nested objects as `parent.child` down to
    * [[MaxPathDepth]] segments (the shredder's path vocabulary,
    * reference JsonShredder.java:64-81). A nested object ALSO records
    * an `addOther` at its own path (the object itself materializes
    * non-null there — IsNull reasoning needs the sighting); arrays
    * stay opaque (positional semantics — their elements' paths are
    * not column paths). Non-object roots record under the `value`
    * column the materializer wraps them in. Duplicate keys at ANY
    * depth set the file's dupKey flag: a repeated key double-counts
    * sightings, which would break the sightings==units null proof. */
  private[sources] def walkUnit(text: String, into: FileZone): FileZone = {
    if (text == null || text.trim.isEmpty) return into
    var z = into
    val p = factory.createParser(text)
    try {
      try {
        var tok = p.nextToken()
        while (tok != null) {
          var fields = z.fields
          var docs = z.docs + 1
          var dup = z.dupKey
          var over = z.overflow
          var numBad = false
          // a numeric literal BigDecimal cannot hold (exponent beyond
          // int range: 1e2147483648 — valid JSON the plain load reads
          // as an infinite double) must not kill the planning job;
          // the file folds as DIRTY (never skipped, never answers)
          def exactNum(text: String): Option[JBigDecimal] =
            try Some(new JBigDecimal(text))
            catch { case _: NumberFormatException => numBad = true; None }
          // record a sighting at `path`, refusing NEW paths past the
          // per-file cap (the overflow flag then blocks absence-based
          // proofs — see MaxPathsPerFile); existing paths always fold
          def record(path: String, f: FieldZone => FieldZone): Unit =
            fields.get(path) match {
              case Some(cur) => fields = fields.updated(path, f(cur))
              case None =>
                if (fields.size >= MaxPathsPerFile) over = true
                else fields = fields.updated(path, f(emptyField))
            }
          // fold the object whose START_OBJECT was just consumed,
          // prefixing its field paths with `prefix` (empty at root);
          // depth = segments already in the prefix
          def foldObject(prefix: String, depth: Int): Unit = {
            val seen = new java.util.HashSet[String]()
            while (p.nextToken() != JsonToken.END_OBJECT) {
              val name = p.currentName()
              if (!seen.add(name)) dup = true
              val path = if (prefix.isEmpty) name else s"$prefix.$name"
              p.nextToken() match {
                case JsonToken.VALUE_NUMBER_INT |
                     JsonToken.VALUE_NUMBER_FLOAT =>
                  exactNum(p.getText).foreach(bd =>
                    record(path, _.addNum(bd)))
                case JsonToken.VALUE_STRING =>
                  val s = p.getText
                  record(path, _.addStr(s))
                case JsonToken.VALUE_NULL => ()
                case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE =>
                  record(path, _.addOther)
                case JsonToken.START_OBJECT =>
                  // the object itself is a non-null sighting at its
                  // own path; its fields fold at path.child while the
                  // depth budget lasts, opaque beyond it
                  record(path, _.addOther)
                  if (depth + 1 < MaxPathDepth) foldObject(path, depth + 1)
                  else p.skipChildren()
                case JsonToken.START_ARRAY =>
                  p.skipChildren()
                  record(path, _.addOther)
                case _ =>
                  record(path, _.addOther)
              }
            }
          }
          tok match {
            case JsonToken.START_OBJECT =>
              foldObject("", 0)
            case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
              exactNum(p.getText).foreach(bd =>
                record("value", _.addNum(bd)))
            case JsonToken.VALUE_STRING =>
              val s = p.getText
              record("value", _.addStr(s))
            case JsonToken.VALUE_NULL => // implicit null
            case JsonToken.START_ARRAY =>
              p.skipChildren()
              record("value", _.addOther)
            case _ =>
              record("value", _.addOther)
          }
          // docs beyond the first within THIS unit → concatenated
          // line: bounds exceed what the reader materializes
          z = FileZone(docs, z.units, z.dirty || numBad,
            z.multiDoc || docs - into.docs > 1, dup, over, fields)
          tok = p.nextToken()
        }
      } catch {
        // partial docs already folded stay (their values DO
        // materialize); the anomaly poisons skipping for this file
        case _: com.fasterxml.jackson.core.JacksonException =>
          z = z.copy(dirty = true)
      }
      z
    } finally p.close()
  }
}

/** PER-FILE schema inference, SHARDED BY FILE: the planning job groups
  * (fileName, unitText) pairs by file and folds each group through a
  * single-file buffer — `groupByKey(file).agg(...)` plans a partial +
  * final aggregation, so map tasks fold the units they read into small
  * per-file partial buffers, the shuffle carries only those buffers,
  * and no task (and no single aggregation buffer) ever holds more
  * than its own files' state. The driver collects one small row per
  * file. (The previous shape folded the WHOLE corpus's file→result
  * map through one buffer pair and a driver `head()` — planning state
  * capped the feature at ~10^5 files exactly where it pays most;
  * review r11.)
  *
  * Uses exactly the golden-pinned
  * [[graft.infer.JsonInfer.inferDocCount]] walker per unit. The
  * per-file grain is what makes planning INCREMENTAL: the lattice
  * join is associative+commutative and union order is fixed by
  * `canonical` at the end, so a global schema assembled from per-file
  * results is byte-identical to a monolithic fold — and a changed
  * file invalidates only its own entry. */
class InferFileAgg extends Aggregator[(String, String),
    (graft.types.HType, Long), (graft.types.HType, Long)] {
  import graft.types.{HNull, HType}
  def zero: (HType, Long) = (HNull, 0L)
  def reduce(b: (HType, Long), in: (String, String)): (HType, Long) = {
    val (t, n) = graft.infer.JsonInfer.inferDocCount(in._2)
    (HType.merge(b._1, t), b._2 + n)
  }
  def merge(a: (HType, Long), b: (HType, Long)): (HType, Long) =
    (HType.merge(a._1, b._1), a._2 + b._2)
  def finish(r: (HType, Long)): (HType, Long) = r
  def bufferEncoder: Encoder[(HType, Long)] =
    Encoders.javaSerialization[(HType, Long)]
  def outputEncoder: Encoder[(HType, Long)] = bufferEncoder
}

/** Single-file zone-stats fold — the zone half of the sharded
  * planning aggregation, riding the SAME per-file groups as
  * [[InferFileAgg]] (one scan of the data, two agg columns). */
class ZoneFileAgg
    extends Aggregator[(String, String), ZoneStats.FileZone, ZoneStats.FileZone] {
  import ZoneStats._
  def zero: FileZone = emptyFile
  // units counts EVERY input unit, blank or corrupt included — the
  // scan emits exactly one row per unit, so Σunits IS count(*)
  def reduce(b: FileZone, in: (String, String)): FileZone =
    walkUnit(in._2, b.copy(units = b.units + 1))
  def merge(a: FileZone, b: FileZone): FileZone = a.merge(b)
  // the per-file set-byte budget applies to the FINISHED zone (the
  // decision depends only on final state, so partial-order never
  // changes it); the write-time capture applies the same trim
  def finish(r: FileZone): FileZone = trimFile(r)
  def bufferEncoder: Encoder[FileZone] = Encoders.javaSerialization[FileZone]
  def outputEncoder: Encoder[FileZone] = Encoders.javaSerialization[FileZone]
}

/** Decides whether a pushed filter PROVABLY matches no row of a file,
  * given the file's zone and a map of each consultable column PATH to
  * its materialized type (which fixes the soundness gate). Paths are
  * the dotted vocabulary the zone walker records — top-level names
  * and nested `parent.child` chains — exactly matching the attribute
  * rendering Spark's nested predicate pushdown hands to V1 filters. */
object ZoneSkip {
  import ZoneStats.{FieldZone, FileZone}
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.types._

  /** Every zone-consultable column path of a table, with its
    * materialized type: all dotted paths reachable through STRUCT
    * nodes only (a union-encoded field stops the chain — its filters
    * arrive as `x.u0.y`, not a JSON path), capped at
    * [[ZoneStats.MaxPathDepth]] segments exactly like the walker (a
    * deeper path the walker never recorded would read as all-null and
    * mis-prove an IsNotNull skip).
    *
    * COLLISION SOUNDNESS: a field name containing a literal '.'
    * renders the same dotted string as a genuine nested chain
    * (`{"a.b": 1}` vs `{"a": {"b": 1}}`), and the walker folds both
    * into ONE zone entry. Merged bounds/sets are supersets (skips
    * only get harder — sound), but the sightings count is INFLATED,
    * which could mis-prove the sightings==units IsNull skip. Any
    * rendering produced by more than one distinct path is therefore
    * dropped entirely. */
  def eligiblePaths(t: graft.types.HType): Map[String, DataType] =
    eligibleRoutes(t).map { case (p, (_, ht)) =>
      p -> graft.infer.Materialize.toMaterializableSparkType(ht)
    }

  /** [[eligiblePaths]] with each path's ROUTE — the exact field-name
    * segments (a segment may itself contain a literal '.') and the
    * leaf HType — so a consumer that must WALK the document (the
    * reader's nested-filter early-skip) never re-splits the rendered
    * string ambiguously. Same collision and depth rules. */
  private[sources] def eligibleRoutes(t: graft.types.HType)
      : Map[String, (List[String], graft.types.HType)] = {
    val routes = scala.collection.mutable.HashMap.empty[String, Int]
    val found =
      scala.collection.mutable.HashMap.empty[String, (List[String], graft.types.HType)]
    def walk(prefix: String, path: List[String], segs: Int,
             ht: graft.types.HType): Unit =
      ht match {
        case s: graft.types.HStruct if segs < ZoneStats.MaxPathDepth =>
          s.fields.foreach { case (name, child) =>
            val p = if (prefix.isEmpty) name else s"$prefix.$name"
            // a literal '.' in the name makes the rendering span extra
            // segments — count them so the depth cap matches what a
            // pure nested chain of the same rendering would have
            val childSegs = segs + 1 + name.count(_ == '.')
            if (childSegs <= ZoneStats.MaxPathDepth) {
              routes(p) = routes.getOrElse(p, 0) + 1
              found(p) = (path :+ name, child)
              walk(p, path :+ name, childSegs, child)
            }
          }
        case _ => ()
      }
    walk("", Nil, 0, t)
    // a non-struct-materializing root is wrapped in a `value` column,
    // which is also the walker's key for non-object roots (a UNION
    // root materializes as its own struct — no wrap, no entry)
    graft.infer.Materialize.toMaterializableSparkType(t) match {
      case _: StructType => ()
      case _ =>
        routes("value") = routes.getOrElse("value", 0) + 1
        found("value") = (Nil, t)
    }
    // a decimal leaf whose intDigits+scale exceeds the engine's
    // 38-digit cap ROUNDS on materialization (the encoder's
    // changePrecision), so the raw-text values the zone walker
    // recorded and the values the engine compares can differ — such
    // a path must never be consulted: not for skipping, not for
    // metadata answers, and not for the reader's early skip (a
    // best-effort drop decided on the unrounded value would remove
    // rows the engine's rounded comparison keeps, and the residual
    // never sees a dropped row)
    found.iterator.filter { case (p, (_, ht)) =>
      routes(p) == 1 && !capRounded(ht)
    }.toMap
  }

  /** Does materializing this leaf ROUND? — the decimal 38-digit cap
    * (InferSchemaAgg.toSparkType: intDigits > 38 becomes DOUBLE,
    * intDigits+scale > 38 loses scale). Raw-vs-materialized equality
    * is the foundation of every zone proof, so capped leaves are
    * excluded from the consultable-path map entirely. */
  private def capRounded(ht: graft.types.HType): Boolean = ht match {
    case graft.types.HNum(graft.types.NumKind.Decimal, i, s) =>
      i.toLong + s.toLong >
        org.apache.spark.sql.types.DecimalType.MAX_PRECISION
    case _ => false
  }

  /** Top-level-only view (SPEC-ONLY convenience; the pre-nested call
    * shape): each field of the schema by its own name. Production
    * paths MUST consult [[eligiblePaths]] instead — this view cannot
    * apply the capRounded decimal gate (a StructType alone does not
    * reveal whether the 38-digit cap engaged), so proofs built on it
    * would compare raw-text bounds against engine-ROUNDED values for
    * capped columns. Every production consumer goes through the
    * HType-derived map; grep-verified. */
  def topLevelPaths(schema: StructType): Map[String, DataType] =
    schema.fields.map(f => f.name -> f.dataType).toMap

  /** Exact-decimal view of a filter literal, or None when the class
    * does not convert exactly (Double/Float literals never prove). */
  private def exactNum(v: Any): Option[JBigDecimal] = v match {
    case x: java.lang.Byte => Some(JBigDecimal.valueOf(x.longValue))
    case x: java.lang.Short => Some(JBigDecimal.valueOf(x.longValue))
    case x: java.lang.Integer => Some(JBigDecimal.valueOf(x.longValue))
    case x: java.lang.Long => Some(JBigDecimal.valueOf(x))
    case x: java.math.BigInteger => Some(new JBigDecimal(x))
    case x: java.math.BigDecimal => Some(x)
    case x: scala.math.BigDecimal => Some(x.bigDecimal)
    case x: scala.math.BigInt => Some(new JBigDecimal(x.bigInteger))
    case _ => None
  }

  /** Is the column's materialized value EXACTLY the recorded bound
    * domain? integral/decimal ↔ numeric bounds, plain string ↔ string
    * bounds. Everything else (float/double, timestamp, binary, bool,
    * nested) never zone-skips. */
  private def numeric(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _: DecimalType => true
    case _ => false
  }

  private def colType(types: Map[String, DataType],
                      name: String): Option[DataType] = types.get(name)

  /** Types whose every walker-sighted value provably materializes
    * NON-null: numbers parse into the width their own values induced,
    * plain strings pass through, booleans/structs/arrays materialize
    * as themselves. Excluded: TIMESTAMP (the shape regex admits
    * strings Timestamp.valueOf rejects — month 13 — which materialize
    * SQL null) and BINARY (defensively, matching the COUNT(col)
    * eligibility rule). The sightings==units null/not-null proofs are
    * only sound under this predicate. */
  private def sightedNeverNull(dt: DataType): Boolean = dt match {
    case TimestampType | BinaryType => false
    case _ => true
  }

  private def prefixSuccessor(p: String): Option[String] =
    ZoneStats.prefixSuccessor(p)

  /** Spec-facing/legacy shape: top-level columns only. */
  def provablyEmpty(f: Filter, zone: FileZone, schema: StructType): Boolean =
    provablyEmpty(f, zone, topLevelPaths(schema))

  /** true ⟹ EVERY row this file's scan emits satisfies `f` — the
    * complement of [[provablyEmpty]], the second leg of filtered
    * COUNT(*) metadata answering (all-match files contribute their
    * full unit count, provably-empty files contribute zero, anything
    * undecidable declines the push). Never called for dirty files.
    *
    * Value proofs need FULL PRESENCE: every scan row carries a value
    * at the path (present == units, no multiDoc/dupKey inflation, no
    * blank lines — they bump units without sightings, correctly
    * blocking), since a null row fails every comparison. Set proofs
    * (⊆ the filter's values) tolerate the length-capped bounds;
    * bound proofs tolerate strInexact because loosening only makes
    * the proof harder (a loosened min above the literal puts the true
    * min above it too). */
  def provablyAllMatch(f: Filter, zone: FileZone,
                       schema: Map[String, DataType]): Boolean = {
    def fz(a: String): FieldZone = zone.fields.getOrElse(a, ZoneStats.emptyField)
    val counted = !zone.multiDoc && !zone.dupKey
    def numFull(a: String): Option[FieldZone] =
      colType(schema, a).filter(numeric).map(_ => fz(a)).filter(z =>
        counted && z.others == 0 && z.present > 0 && z.present == zone.units)
    def strFull(a: String): Option[FieldZone] =
      colType(schema, a).filter(_ == StringType).map(_ => fz(a)).filter(z =>
        counted && z.others == 0 && z.present > 0 && z.present == zone.units)
    f match {
      case EqualTo(a, v) => exactNum(v) match {
        case Some(n) => numFull(a).exists(z =>
          z.numSet != null && z.numSet == Set(n.stripTrailingZeros))
        case None => v match {
          case raw: String => val s = ZoneStats.utf8Sanitize(raw)
            strFull(a).exists(z => z.strSet != null && z.strSet == Set(s))
          case _ => false
        }
      }
      case In(a, vs) => vs != null && vs.nonEmpty && {
        val nums = vs.flatMap(v => exactNum(v))
        if (nums.length == vs.length)
          numFull(a).exists(z => z.numSet != null &&
            z.numSet.subsetOf(nums.map(_.stripTrailingZeros).toSet))
        else if (vs.forall(_.isInstanceOf[String]))
          strFull(a).exists(z => z.strSet != null && z.strSet.subsetOf(
            vs.iterator.map(v => ZoneStats.utf8Sanitize(v.asInstanceOf[String])).toSet))
        else false
      }
      case GreaterThan(a, v) => exactNum(v) match {
        case Some(n) => numFull(a).exists(z =>
          z.numMin != null && z.numMin.compareTo(n) > 0)
        case None => v match {
          case raw: String => val s = ZoneStats.utf8Sanitize(raw)
            strFull(a).exists(z => z.strMin != null &&
              ZoneStats.cpCompare(z.strMin, s) > 0)
          case _ => false
        }
      }
      case GreaterThanOrEqual(a, v) => exactNum(v) match {
        case Some(n) => numFull(a).exists(z =>
          z.numMin != null && z.numMin.compareTo(n) >= 0)
        case None => v match {
          case raw: String => val s = ZoneStats.utf8Sanitize(raw)
            strFull(a).exists(z => z.strMin != null &&
              ZoneStats.cpCompare(z.strMin, s) >= 0)
          case _ => false
        }
      }
      case LessThan(a, v) => exactNum(v) match {
        case Some(n) => numFull(a).exists(z =>
          z.numMax != null && z.numMax.compareTo(n) < 0)
        case None => v match {
          case raw: String => val s = ZoneStats.utf8Sanitize(raw)
            strFull(a).exists(z => z.strMax != null &&
              ZoneStats.cpCompare(z.strMax, s) < 0)
          case _ => false
        }
      }
      case LessThanOrEqual(a, v) => exactNum(v) match {
        case Some(n) => numFull(a).exists(z =>
          z.numMax != null && z.numMax.compareTo(n) <= 0)
        case None => v match {
          case raw: String => val s = ZoneStats.utf8Sanitize(raw)
            strFull(a).exists(z => z.strMax != null &&
              ZoneStats.cpCompare(z.strMax, s) <= 0)
          case _ => false
        }
      }
      case IsNotNull(a) =>
        // sightings == rows ⟹ every row non-null — but ONLY for types
        // whose sighted value always materializes: a timestamp-SHAPED
        // string can still fail Timestamp.valueOf ("2024-13-01 …")
        // and materialize SQL null, and binary stays gated with it
        // defensively (the countOf() rule). Everything else — numbers
        // always parse into their inferred width, plain strings pass
        // through, bools/structs/arrays materialize as themselves.
        counted && colType(schema, a).exists(sightedNeverNull) && {
          val z = fz(a); z.present + z.others == zone.units
        }
      case IsNull(a) =>
        // zero sightings ⟹ every row null (sound even under multiDoc:
        // concatenation only ever ADDS sightings) — but an overflowed
        // file may have REFUSED the path's sightings, so absence
        // proves nothing there
        colType(schema, a).isDefined &&
          (zone.fields.contains(a) || !zone.overflow) && {
            val z = fz(a); z.present == 0 && z.others == 0
          }
      case EqualNullSafe(a, v) =>
        if (v == null) provablyAllMatch(IsNull(a), zone, schema)
        else provablyAllMatch(EqualTo(a, v), zone, schema)
      case StringStartsWith(a, rawP) =>
        val p = ZoneStats.utf8Sanitize(rawP)
        strFull(a).exists(z => z.strSet != null && z.strSet.forall(_.startsWith(p)))
      // substring/suffix tests on SANITIZED well-formed strings agree
      // with the engine's UTF8String byte-level tests: UTF-8 is
      // self-synchronizing, so a byte substring always aligns on
      // code-point boundaries — Java's char-sequence contains/endsWith
      // decides exactly the engine's predicate
      case StringEndsWith(a, rawP) =>
        val p = ZoneStats.utf8Sanitize(rawP)
        strFull(a).exists(z => z.strSet != null && z.strSet.forall(_.endsWith(p)))
      case StringContains(a, rawP) =>
        val p = ZoneStats.utf8Sanitize(rawP)
        strFull(a).exists(z => z.strSet != null && z.strSet.forall(_.contains(p)))
      case And(l, r) =>
        provablyAllMatch(l, zone, schema) && provablyAllMatch(r, zone, schema)
      case Or(l, r) =>
        provablyAllMatch(l, zone, schema) || provablyAllMatch(r, zone, schema)
      case _ => false
    }
  }

  /** true ⟹ no row of this file can satisfy `f`. Never called for
    * dirty files (the scan guards). A comparison/IN/prefix on an
    * all-null column (present==0 && others==0) is provably false for
    * every row — SQL null semantics. Attribute names resolve through
    * the `schema` PATH map ([[eligiblePaths]]) — nested chains
    * included. */
  def provablyEmpty(f: Filter, zone: FileZone,
                    schema: Map[String, DataType]): Boolean = {
    def fz(a: String): FieldZone = zone.fields.getOrElse(a, ZoneStats.emptyField)
    // a path MISSING from an OVERFLOWED file may simply have been
    // refused by the per-file cap — absence proves nothing there;
    // recorded paths always folded every value, so they stay provable
    def known(a: String): Boolean =
      zone.fields.contains(a) || !zone.overflow
    def allNull(a: String): Boolean = known(a) && {
      val z = fz(a); z.present == 0 && z.others == 0
    }
    def numDisjoint(a: String, test: (JBigDecimal, JBigDecimal) => Boolean): Boolean =
      known(a) && colType(schema, a).exists(numeric) && {
        val z = fz(a)
        // others>0 cannot happen for a numeric column (a non-number
        // value would have widened the type) except via dirty corners
        // — require pure numeric evidence anyway
        z.others == 0 && (z.present == 0 ||
          (z.numMin != null && z.numMax != null && test(z.numMin, z.numMax)))
      }
    def strDisjoint(a: String, test: (String, String) => Boolean): Boolean =
      known(a) && colType(schema, a).contains(StringType) && {
        val z = fz(a)
        z.others == 0 && (z.present == 0 ||
          (z.strMin != null && z.strMax != null && test(z.strMin, z.strMax)))
      }
    // Distinct-set variants: the set is EXACT (complete) whenever it
    // is non-null — including over multi-doc lines, where it is a
    // SUPERSET of materialized values (superset only weakens a skip).
    // The same type gates as the bound tests apply; present > 0 avoids
    // double-claiming the all-null case the disjoint tests own.
    def numAbsent(a: String, test: FieldZone => Boolean): Boolean =
      colType(schema, a).exists(numeric) && {
        val z = fz(a)
        z.others == 0 && z.present > 0 && z.numSet != null && test(z)
      }
    def strAbsent(a: String, test: FieldZone => Boolean): Boolean =
      colType(schema, a).contains(StringType) && {
        val z = fz(a)
        z.others == 0 && z.present > 0 && z.strSet != null && test(z)
      }
    f match {
      case EqualTo(a, v) => exactNum(v) match {
        case Some(n) => numDisjoint(a,
          (lo, hi) => n.compareTo(lo) < 0 || n.compareTo(hi) > 0) ||
          // exact distinct set: absence proves emptiness even inside
          // the bounds (the categorical-equality case min/max misses);
          // membership is canonical-form equality == compareTo-equality
          numAbsent(a, z => !z.numSet.contains(n.stripTrailingZeros))
        case None => v match {
          case raw: String => val s = ZoneStats.utf8Sanitize(raw)
          strDisjoint(a, (lo, hi) =>
            ZoneStats.cpCompare(s, lo) < 0 || ZoneStats.cpCompare(s, hi) > 0) ||
            strAbsent(a, z => !z.strSet.contains(s))
          case _ => false
        }
      }
      case GreaterThan(a, v) => exactNum(v) match {
        case Some(n) => numDisjoint(a, (_, hi) => hi.compareTo(n) <= 0)
        case None => v match {
          case raw: String => val s = ZoneStats.utf8Sanitize(raw)
          strDisjoint(a, (_, hi) => ZoneStats.cpCompare(hi, s) <= 0)
          case _ => false
        }
      }
      case GreaterThanOrEqual(a, v) => exactNum(v) match {
        case Some(n) => numDisjoint(a, (_, hi) => hi.compareTo(n) < 0)
        case None => v match {
          case raw: String => val s = ZoneStats.utf8Sanitize(raw)
          strDisjoint(a, (_, hi) => ZoneStats.cpCompare(hi, s) < 0)
          case _ => false
        }
      }
      case LessThan(a, v) => exactNum(v) match {
        case Some(n) => numDisjoint(a, (lo, _) => lo.compareTo(n) >= 0)
        case None => v match {
          case raw: String => val s = ZoneStats.utf8Sanitize(raw)
          strDisjoint(a, (lo, _) => ZoneStats.cpCompare(lo, s) >= 0)
          case _ => false
        }
      }
      case LessThanOrEqual(a, v) => exactNum(v) match {
        case Some(n) => numDisjoint(a, (lo, _) => lo.compareTo(n) > 0)
        case None => v match {
          case raw: String => val s = ZoneStats.utf8Sanitize(raw)
          strDisjoint(a, (lo, _) => ZoneStats.cpCompare(lo, s) > 0)
          case _ => false
        }
      }
      case EqualNullSafe(a, v) =>
        // null literal ⟺ IsNull; non-null literal can only match a
        // non-null equal cell, so EqualTo's proof carries over
        if (v == null) provablyEmpty(IsNull(a), zone, schema)
        else provablyEmpty(EqualTo(a, v), zone, schema)
      case In(a, vs) =>
        // provably empty iff EVERY list element is provably absent;
        // an empty IN list is false for every row
        vs.isEmpty && (colType(schema, a).exists(numeric) ||
          colType(schema, a).contains(StringType)) ||
          (vs.nonEmpty && vs.forall(v => provablyEmpty(EqualTo(a, v), zone, schema)))
      case IsNotNull(a) =>
        // sound for ANY column TYPE — but only for names that ARE
        // walker paths (the consultable-path map): zero sightings at a
        // rendering the walker never records proves nothing. Spark
        // offers IsNotNull constraints on union-BRANCH renderings
        // (`u.u1` of the struct<tag,u0,u1> encoding) and beyond-cap
        // chains, whose zones are vacuously empty while the rows are
        // not null (fuzzer-discovered, r13)
        colType(schema, a).isDefined && allNull(a)
      case IsNull(a) =>
        // provably empty iff EVERY emitted row materializes non-null:
        // with no concatenation and no duplicate keys, each non-null
        // sighting (present + others) belongs to exactly one doc and
        // each doc to exactly one unit, so sightings == units means
        // every row — blank lines included (they bump units but add
        // no sighting, correctly blocking the proof) — carries a
        // value. multiDoc/dupKey make sightings overcount; explicit
        // nulls never count. Gated on types whose sighted value
        // always MATERIALIZES non-null (a timestamp-shaped string can
        // fail Timestamp.valueOf and materialize SQL null — skipping
        // the file would drop the IS NULL row it actually holds; the
        // IsNotNull all-match leg carries the same gate). Top-level
        // `value` for object-rooted docs stays null and its zone
        // stays empty, so this never misfires there.
        !zone.multiDoc && !zone.dupKey &&
          colType(schema, a).exists(sightedNeverNull) && {
            val z = fz(a)
            z.present + z.others == zone.units
          }
      case StringStartsWith(a, rawP) =>
        // sanitize like any literal; a prefix containing an unpaired
        // surrogate cannot prove anything (its materialized matches
        // are '?'-rewritten) — utf8Sanitize + the successor's
        // surrogate cutoff keep this conservative
        val p = ZoneStats.utf8Sanitize(rawP)
        strDisjoint(a, (lo, hi) =>
          ZoneStats.cpCompare(hi, p) < 0 ||
            prefixSuccessor(p).exists(up => ZoneStats.cpCompare(lo, up) >= 0)) ||
          // set variant: no stored value carries the prefix. Sanitized
          // p never ends in an unpaired high surrogate, so Java
          // code-unit startsWith == code-point prefix == the UTF-8
          // byte prefix the engine's StartsWith tests. A value longer
          // than SetMaxStrLen overflowed the set to null, so a prefix
          // whose matches were all "too long to store" cannot misfire.
          strAbsent(a, z => !z.strSet.exists(_.startsWith(p)))
      // suffix/substring: bounds prove nothing (no ordering relation),
      // but the EXACT distinct set does — no stored value carries the
      // suffix/substring ⟹ no row matches. Same sanitized-domain
      // byte-vs-char equivalence as the all-match leg; a value too
      // long for the set overflowed it to null, so "all matches were
      // unstored" cannot happen.
      case StringEndsWith(a, rawP) =>
        val p = ZoneStats.utf8Sanitize(rawP)
        (colType(schema, a).contains(StringType) && allNull(a)) ||
          strAbsent(a, z => !z.strSet.exists(_.endsWith(p)))
      case StringContains(a, rawP) =>
        val p = ZoneStats.utf8Sanitize(rawP)
        (colType(schema, a).contains(StringType) && allNull(a)) ||
          strAbsent(a, z => !z.strSet.exists(_.contains(p)))
      case And(l, r) =>
        provablyEmpty(l, zone, schema) || provablyEmpty(r, zone, schema)
      case Or(l, r) =>
        provablyEmpty(l, zone, schema) && provablyEmpty(r, zone, schema)
      case _ => false
    }
  }
}
