package graft.types

import scala.collection.immutable.TreeMap

/** The discovered type of a collection of JSON values.
  *
  * Immutable, functional re-expression of the reference's mutable
  * `HiveType` subsumption lattice (reference: hortonworks/hive-json,
  * `src/main/java/org/apache/hadoop/hive/json/HiveType.java:28-47` for
  * the kind/rank table; each concrete subclass holds its own
  * subsume/merge rules — see the per-case scaladoc below).
  *
  * `HType.merge` is the lattice join; it is associative, and after
  * [[HType.canonical]] union-branch normalization it is commutative,
  * which is what makes the distributed `treeAggregate`-style schema
  * inference in [[graft.infer.InferSchemaAgg]] deterministic at any
  * parallelism (reference folds strictly left-to-right in document
  * order — `JsonSchemaFinder.java:240-245` — and so is order-dependent
  * for union branch order; we canonicalize instead, the one documented
  * divergence).
  */
sealed trait HType extends Serializable {

  /** Subsumption rank (reference `HiveType.Kind` rank values). */
  def rank: Int

  /** Does this type include all values of `other`?
    * Port of each `HiveType.subsumes` (NullType.java:35-38,
    * BooleanType.java:35-38, NumericType.java:74-77, StringType.java:47-50,
    * ListType.java:58-61, StructType.java:72-75, UnionType.java:78-80).
    */
  def subsumes(other: HType): Boolean = (this, other) match {
    case (HNull, o)            => o == HNull
    case (HBool, o)            => o == HBool || o == HNull
    case (_: HNum, o)          => o.isInstanceOf[HNum] || o == HNull
    case (_: HStr, o)          => o.isInstanceOf[HStr] || o == HNull
    case (_: HList, o)         => o == HNull || o.isInstanceOf[HList]
    case (_: HStruct, o)       => o == HNull || o.isInstanceOf[HStruct]
    case (_: HUnion, _)        => true
  }

  /** Merge `other` into this type; requires `this.subsumes(other)`.
    * Functional port of each `HiveType.merge`. */
  def mergeIn(other: HType): HType = (this, other) match {
    // NullType.java:40-42 / BooleanType.java:40-42: nothing to do.
    case (HNull, _) | (HBool, _) => this
    // NumericType.java:79-88: max digits, max scale, max rank.
    case (a: HNum, b: HNum) =>
      HNum(if (a.kind.rank < b.kind.rank) b.kind else a.kind,
           math.max(a.intDigits, b.intDigits), math.max(a.scale, b.scale))
    case (_: HNum, _) => this // numeric ⊔ null
    // StringType.java:52-57: differing string kinds collapse to STRING.
    case (a: HStr, b: HStr) => if (a.kind == b.kind) a else HStr(StrKind.Str)
    case (_: HStr, _) => this // string ⊔ null
    // ListType.java:63-75: recursive element merge, union fallback.
    case (a: HList, b: HList) => HList(HType.merge(a.elem, b.elem))
    case (_: HList, _) => this // list ⊔ null
    // StructType.java:77-95: field-wise merge; conflicting field → union.
    case (a: HStruct, b: HStruct) =>
      HStruct(b.fields.foldLeft(a.fields) { case (acc, (name, bt)) =>
        acc.get(name) match {
          case None     => acc.updated(name, bt)
          case Some(at) => acc.updated(name, HType.merge(at, bt))
        }
      })
    case (_: HStruct, _) => this // struct ⊔ null
    // UnionType.java:83-102: union-of-union folds branch by branch;
    // non-union folds into the first compatible branch else appends.
    case (a: HUnion, b: HUnion) =>
      b.children.foldLeft(a: HType)((acc, c) => acc.mergeIn(c))
    case (a: HUnion, b) =>
      val idx = a.children.indexWhere(c => c.subsumes(b) || b.subsumes(c))
      if (idx < 0) HUnion(a.children :+ b)
      else {
        val c = a.children(idx)
        val merged = if (c.subsumes(b)) c.mergeIn(b) else b.mergeIn(c)
        HUnion(a.children.updated(idx, merged))
      }
  }

  /** Rendered type name, matching each reference `toString` exactly
    * (e.g. `decimal(p,s)` with p = intDigits + scale, NumericType.java:63;
    * `list<...>` ListType.java:38-44; `uniontype<...>` UnionType.java:46-60;
    * sorted `struct<k:v,...>` StructType.java:36-51). */
  override def toString: String = this match {
    case HNull          => "void"
    case HBool          => "boolean"
    case HNum(k, i, s)  => k match {
      case NumKind.Byte    => "tinyint"
      case NumKind.Short   => "smallint"
      case NumKind.Int     => "int"
      case NumKind.Long    => "bigint"
      case NumKind.Decimal => s"decimal(${i + s},$s)"
      case NumKind.Float   => "float"
      case NumKind.Double  => "double"
    }
    case HStr(k)        => k match {
      case StrKind.Binary    => "binary"
      case StrKind.Date      => "date"
      case StrKind.Timestamp => "timestamp"
      case StrKind.Str       => "string"
    }
    case HList(e)       => s"list<$e>"
    case HStruct(fs)    =>
      fs.iterator.map { case (k, v) => s"$k:$v" }.mkString("struct<", ",", ">")
    case HUnion(cs)     => cs.mkString("uniontype<", ",", ">")
  }

  /** Flat one-line-per-leaf rendering (reference `printFlat`:
    * HiveType.java:84-90 primitive; StructType.java:97-102 `.field`;
    * ListType.java:77-79 `._list`; UnionType.java:104-110 `.0`,`.1`...). */
  def renderFlat(prefix: String): String = {
    val sb = new StringBuilder
    def walk(t: HType, p: String): Unit = t match {
      case HStruct(fs) => fs.foreach { case (k, v) => walk(v, s"$p.$k") }
      case HList(e)    => walk(e, p + "._list")
      case HUnion(cs)  => cs.zipWithIndex.foreach { case (c, i) => walk(c, s"$p.$i") }
      case prim        => sb.append(p).append(": ").append(prim.toString).append('\n')
    }
    walk(this, prefix)
    sb.toString
  }

  /** Canonical form: recursively sorts union branches by (rank, rendered
    * form) so that distributed merges are order-independent (SURVEY §3.4;
    * the reference's union branch order is document-order-dependent,
    * UnionType.java:89-100). */
  def canonical: HType = this match {
    case HList(e)    => HList(e.canonical)
    case HStruct(fs) => HStruct(fs.map { case (k, v) => k -> v.canonical })
    case HUnion(cs)  =>
      HUnion(cs.map(_.canonical).sortBy(c => (c.rank, c.toString)))
    case prim        => prim
  }
}

/** Numeric kinds with the reference's subsumption ranks
  * (HiveType.java:30: BYTE(1) SHORT(2) INT(3) LONG(4) DECIMAL(5)
  * FLOAT(6) DOUBLE(7)). */
sealed abstract class NumKind(val rank: Int) extends Serializable
object NumKind {
  case object Byte    extends NumKind(1)
  case object Short   extends NumKind(2)
  case object Int     extends NumKind(3)
  case object Long    extends NumKind(4)
  case object Decimal extends NumKind(5)
  case object Float   extends NumKind(6)
  case object Double  extends NumKind(7)
}

/** String-ish kinds (HiveType.java:31: BINARY(1) DATE(1) TIMESTAMP(1)
  * STRING(2)). */
sealed abstract class StrKind(val rank: Int) extends Serializable
object StrKind {
  case object Binary    extends StrKind(1)
  case object Date      extends StrKind(1)
  case object Timestamp extends StrKind(1)
  case object Str       extends StrKind(2)
}

case object HNull extends HType { val rank = 0 }
case object HBool extends HType { val rank = 1 }

/** byte/short/int/long/decimal/float/double with max observed digits
  * before (`intDigits`) and after (`scale`) the decimal point
  * (NumericType.java:26-35). */
final case class HNum(kind: NumKind, intDigits: Int, scale: Int) extends HType {
  def rank: Int = kind.rank
}

final case class HStr(kind: StrKind) extends HType { def rank: Int = kind.rank }

final case class HList(elem: HType) extends HType { val rank = 1 }

/** Struct with alphabetically sorted field names — the reference keeps a
  * TreeMap (StructType.java:29) so output is deterministic regardless of
  * JSON key order. */
final case class HStruct(fields: TreeMap[String, HType]) extends HType {
  val rank = 1
}

/** Union branches in merge order (canonicalize before rendering
  * distributed results — see [[HType.canonical]]). */
final case class HUnion(children: Vector[HType]) extends HType { val rank = 8 }

object HType {

  /** The lattice join (port of `JsonSchemaFinder.mergeType`,
    * JsonSchemaFinder.java:136-151): the subsuming side wins; mutually
    * incompatible types form a union. */
  def merge(previous: HType, t: HType): HType =
    if (previous == null) t
    else if (t == null) previous
    else if (previous.subsumes(t)) previous.mergeIn(t)
    else if (t.subsumes(previous)) t.mergeIn(previous)
    else HUnion(Vector(previous, t))

  def struct(fields: (String, HType)*): HStruct = HStruct(TreeMap(fields: _*))

  /** Hive `CREATE TABLE` DDL rendering, byte-for-byte port of
    * `JsonSchemaFinder.printTopType`/`printType`
    * (JsonSchemaFinder.java:153-221; INDENT=2 :50). Note the printer
    * dialect: `struct <`, `array <` (not `list<`), `uniontype <`. */
  def renderDDL(top: HStruct, tableName: String = "tbl"): String = {
    val sb = new StringBuilder
    val indent = 2
    def printType(t: HType, margin: Int): Unit = t match {
      case HStruct(fs) =>
        sb.append("struct <\n")
        var first = true
        fs.foreach { case (k, v) =>
          if (!first) sb.append(",\n") else first = false
          sb.append(" " * margin).append(k).append(": ")
          printType(v, margin + indent)
        }
        sb.append(">")
      case HList(e) =>
        sb.append("array <"); printType(e, margin + indent); sb.append(">")
      case HUnion(cs) =>
        sb.append("uniontype <")
        var first = true
        cs.foreach { c =>
          if (!first) sb.append(',') else first = false
          printType(c, margin + indent)
        }
        sb.append(">")
      case prim => sb.append(prim.toString)
    }
    sb.append(s"create table $tableName (\n")
    var first = true
    top.fields.foreach { case (k, v) =>
      if (!first) sb.append(",\n") else first = false
      sb.append(" " * indent).append(k).append(" ")
      printType(v, 2 * indent)
    }
    sb.append("\n)\n")
    sb.toString
  }
}
