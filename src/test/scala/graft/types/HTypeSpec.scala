package graft.types

import graft.infer.JsonInfer
import org.scalatest.funsuite.AnyFunSuite

/** Golden-string parity suite: ports every assertion of the reference's
  * `TestJsonSchemaFinder` (reference
  * `src/test/java/org/apache/hadoop/hive/json/TestJsonSchemaFinder.java`,
  * cited per test). `pick` goes through the real JSON parse path.
  */
class HTypeSpec extends AnyFunSuite {

  private def pick(json: String): String = JsonInfer.inferDoc(json).toString
  private def num(k: NumKind, i: Int, s: Int) = HNum(k, i, s)
  private def merged(a: HType, b: HType): String = HType.merge(a, b).toString
  private def union(ts: HType*) = HUnion(ts.toVector)
  private val int50 = num(NumKind.Int, 5, 0)

  test("binary patterns (TestJsonSchemaFinder.java:32-44)") {
    assert(JsonInfer.classifyString("00000000").toString == "binary")
    assert(JsonInfer.classifyString("0000000").toString == "string")
    assert(JsonInfer.classifyString("").toString == "string")
    assert(JsonInfer.classifyString("0123456789abcdefABCDEF").toString == "binary")
    assert(JsonInfer.classifyString("00x0").toString == "string")
  }

  test("timestamp patterns (TestJsonSchemaFinder.java:46-58)") {
    assert(JsonInfer.classifyString("2016-01-05T12:34:56Z").toString == "timestamp")
    assert(JsonInfer.classifyString("2016/01/05 12:34:56").toString == "timestamp")
    assert(JsonInfer.classifyString("2016/01/05").toString == "string")
    assert(JsonInfer.classifyString("2016-01-01 56:00:00 +08").toString == "timestamp")
    assert(JsonInfer.classifyString("2016-01-01 56:00:00 -08:30").toString == "timestamp")
  }

  test("booleans (TestJsonSchemaFinder.java:60-68)") {
    assert(pick("true") == "boolean")
    assert(pick("null") == "void")
    assert(pick("false") == "boolean")
  }

  test("numbers (TestJsonSchemaFinder.java:70-117)") {
    assert(JsonInfer.classifyNumber("120").toString == "tinyint")
    assert(JsonInfer.classifyNumber("-128").toString == "tinyint")
    assert(JsonInfer.classifyNumber("-24120").toString == "smallint")
    assert(JsonInfer.classifyNumber("128").toString == "smallint")
    assert(JsonInfer.classifyNumber("60000").toString == "int")
    assert(JsonInfer.classifyNumber("-4294967296").toString == "bigint")
    assert(JsonInfer.classifyNumber("-9223372036854775808").toString == "bigint")
    assert(JsonInfer.classifyNumber("9223372036854775807").toString == "bigint")
    assert(JsonInfer.classifyNumber("9223372036854775808").toString == "decimal(19,0)")
    assert(JsonInfer.classifyNumber("-9223372036854775809").toString == "decimal(19,0)")
    assert(JsonInfer.classifyNumber("1234.567890").toString == "decimal(10,6)")
    assert(JsonInfer.classifyNumber("-1234567890.1234567890").toString == "decimal(20,10)")
    assert(JsonInfer.classifyNumber("1.2e9").toString == "float")
    assert(JsonInfer.classifyNumber(
      "1234567890123456789012345678901234567890").toString == "double")
    assert(JsonInfer.classifyNumber("1.2E40").toString == "double")
  }

  test("lists (TestJsonSchemaFinder.java:119-132)") {
    assert(pick("[]") == "list<void>")
    assert(pick("[50000]") == "list<int>")
    assert(pick("[127, 50000, 50000000000, -100]") == "list<bigint>")
  }

  test("structs (TestJsonSchemaFinder.java:134-147)") {
    assert(pick("{}") == "struct<>")
    assert(pick("""{"bool": true}""") == "struct<bool:boolean>")
    // declared str-then-i; fields sort alphabetically (StructType.java:29)
    assert(pick("""{"str": "value", "i": 124567}""") == "struct<i:int,str:string>")
  }

  test("null merges (TestJsonSchemaFinder.java:149-177)") {
    assert(merged(HNull, HNull) == "void")
    assert(merged(HBool, HNull) == "boolean")
    assert(merged(HNull, num(NumKind.Int, 4, 0)) == "int")
    assert(merged(HNull, HStr(StrKind.Str)) == "string")
    assert(merged(HType.struct("i" -> int50), HNull) == "struct<i:int>")
    assert(merged(HList(int50), HNull) == "list<int>")
    assert(merged(union(int50), HNull) == "uniontype<int>")
  }

  test("boolean merges (TestJsonSchemaFinder.java:179-204)") {
    assert(merged(HBool, HBool) == "boolean")
    assert(merged(HBool, num(NumKind.Int, 4, 0)) == "uniontype<boolean,int>")
    assert(merged(HBool, HStr(StrKind.Str)) == "uniontype<boolean,string>")
    assert(merged(HType.struct("i" -> int50), HBool) == "uniontype<struct<i:int>,boolean>")
    assert(merged(HList(int50), HBool) == "uniontype<list<int>,boolean>")
    assert(merged(union(int50), HBool) == "uniontype<int,boolean>")
  }

  test("numeric merges (TestJsonSchemaFinder.java:206-250)") {
    assert(merged(num(NumKind.Byte, 2, 0), num(NumKind.Short, 4, 0)) == "smallint")
    assert(merged(num(NumKind.Int, 6, 0), num(NumKind.Short, 4, 0)) == "int")
    assert(merged(num(NumKind.Int, 6, 0), num(NumKind.Long, 10, 0)) == "bigint")
    assert(merged(num(NumKind.Short, 4, 0), num(NumKind.Decimal, 20, 0)) == "decimal(20,0)")
    assert(merged(num(NumKind.Float, 21, 4), num(NumKind.Decimal, 20, 0)) == "float")
    assert(merged(num(NumKind.Double, 31, 4), num(NumKind.Decimal, 20, 10)) == "double")
    assert(merged(num(NumKind.Decimal, 20, 10), HStr(StrKind.Str))
      == "uniontype<decimal(30,10),string>")
    assert(merged(HType.struct("i" -> int50), num(NumKind.Short, 4, 0))
      == "uniontype<struct<i:int>,smallint>")
    assert(merged(num(NumKind.Short, 4, 0), HList(int50))
      == "uniontype<smallint,list<int>>")
    assert(merged(union(int50, HStr(StrKind.Str)), num(NumKind.Decimal, 20, 0))
      == "uniontype<decimal(20,0),string>")
  }

  test("string merges (TestJsonSchemaFinder.java:252-276)") {
    assert(merged(HStr(StrKind.Binary), HStr(StrKind.Str)) == "string")
    assert(merged(HStr(StrKind.Str), HStr(StrKind.Timestamp)) == "string")
    assert(merged(HType.struct("i" -> int50), HStr(StrKind.Timestamp))
      == "uniontype<struct<i:int>,timestamp>")
    assert(merged(HStr(StrKind.Binary), HList(int50))
      == "uniontype<binary,list<int>>")
    assert(merged(union(int50, HStr(StrKind.Str)), HStr(StrKind.Timestamp))
      == "uniontype<int,string>")
  }

  test("list merges (TestJsonSchemaFinder.java:278-298)") {
    assert(merged(HList(num(NumKind.Int, 10, 0)), HList(num(NumKind.Long, 20, 0)))
      == "list<bigint>")
    assert(merged(HList(num(NumKind.Int, 10, 0)), HList(HStr(StrKind.Str)))
      == "list<uniontype<int,string>>")
    assert(merged(HType.struct("foo" -> num(NumKind.Int, 10, 0)), HList(int50))
      == "uniontype<struct<foo:int>,list<int>>")
    assert(merged(union(int50, HStr(StrKind.Str)), HList(HBool))
      == "uniontype<int,string,list<boolean>>")
  }

  test("struct merges (TestJsonSchemaFinder.java:300-319)") {
    assert(merged(
      HType.struct("foo" -> num(NumKind.Int, 10, 0)),
      HType.struct("bar" -> HStr(StrKind.Timestamp)))
      == "struct<bar:timestamp,foo:int>")
    assert(merged(
      HType.struct("foo" -> num(NumKind.Int, 10, 0), "bar" -> HStr(StrKind.Binary)),
      HType.struct("bar" -> HStr(StrKind.Timestamp)))
      == "struct<bar:string,foo:int>")
    assert(merged(
      union(int50, HStr(StrKind.Str)),
      HType.struct("foo" -> HBool))
      == "uniontype<int,string,struct<foo:boolean>>")
  }

  test("union merges (TestJsonSchemaFinder.java:321-345)") {
    assert(merged(
      union(num(NumKind.Decimal, 2, 10), HBool, HStr(StrKind.Binary)),
      union(HStr(StrKind.Timestamp), int50))
      == "uniontype<decimal(15,10),boolean,string>")
    assert(merged(
      union(num(NumKind.Int, 10, 0), HStr(StrKind.Binary)),
      HType.struct("bar" -> HStr(StrKind.Timestamp)))
      == "uniontype<int,binary,struct<bar:timestamp>>")
    assert(merged(
      union(int50, HStr(StrKind.Binary)),
      HStr(StrKind.Timestamp))
      == "uniontype<int,string>")
  }

  test("flat rendering (StructType.java:97-102, ListType.java:77-79, UnionType.java:104-110)") {
    val t = HType.struct(
      "a" -> num(NumKind.Int, 5, 0),
      "b" -> HList(HStr(StrKind.Str)),
      "u" -> union(HBool, int50))
    assert(t.renderFlat("root") ==
      "root.a: int\nroot.b._list: string\nroot.u.0: boolean\nroot.u.1: int\n")
  }

  test("DDL rendering (JsonSchemaFinder.java:153-221)") {
    val t = HType.struct(
      "i" -> num(NumKind.Int, 5, 0),
      "s" -> HType.struct("x" -> HStr(StrKind.Str)),
      "l" -> HList(num(NumKind.Long, 12, 0)))
    assert(HType.renderDDL(t) ==
      """create table tbl (
        |  i int,
        |  l array <bigint>,
        |  s struct <
        |    x: string>
        |)
        |""".stripMargin)
  }

  test("canonical union ordering is rank-then-rendered-form") {
    val u = union(HStr(StrKind.Str), HBool, num(NumKind.Int, 3, 0))
    assert(u.canonical.toString == "uniontype<boolean,string,int>")
  }
}
