package graft.shred

import graft.SparkTestBase

/** Shredder path/value semantics (reference JsonShredder.java:64-81;
  * FIXTURES.md A4). */
class ShredderSpec extends SparkTestBase {

  private val doc =
    """{"a": "aaaa", "b": {"c": 12, "d": true}, "e": "eeee", "arr": [1, [2]], "n": null}"""

  test("flatten reproduces the reference walk") {
    assert(Shredder.flatten(doc) == Seq(
      "root.a" -> "aaaa",
      "root.b.c" -> "12",
      "root.b.d" -> "true",
      "root.e" -> "eeee",
      "root.arr.list" -> "1",
      "root.arr.list.list" -> "2"))
  }

  test("nulls are skipped, raw literals preserved") {
    assert(Shredder.flatten("""{"x": 1.50e2, "y": null}""") ==
      Seq("root.x" -> "1.50e2"))
  }

  test("multiple concatenated docs shred in order") {
    assert(Shredder.flatten("""{"a": 1}{"a": 2}""") ==
      Seq("root.a" -> "1", "root.a" -> "2"))
  }

  test("corrupt tail keeps already-shredded leaves") {
    assert(Shredder.flatten("""{"a": 1} {{{nope""") == Seq("root.a" -> "1"))
  }

  test("distributed shred matches local flatten") {
    import spark.implicits._
    val docs = Seq(doc, """{"z": [1, 2, 3]}""", """{"q": {"r": "s"}}""")
    val got = Shredder.shred(spark.createDataset(docs).repartition(3))
      .collect().toSet
    assert(got == docs.flatMap(d => Shredder.flatten(d)).toSet)
  }
}
