package graft.types

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.TreeMap

/** Algebraic properties of the lattice join that the distributed
  * aggregation relies on (SURVEY §3.4): associativity (required for
  * partial aggregation correctness), commutativity up to union
  * canonicalization (required for deterministic results at any
  * parallelism), idempotence, and identity of [[HNull]].
  *
  * Uses ScalaCheck generators with explicit seeded sampling (the
  * scalatest/scalacheck bridge artifact is not on the offline
  * classpath).
  */
class HTypePropertiesSpec extends AnyFunSuite {

  private val genPrim: Gen[HType] = Gen.oneOf(
    Gen.const(HNull),
    Gen.const(HBool),
    for {
      k <- Gen.oneOf(NumKind.Byte, NumKind.Short, NumKind.Int, NumKind.Long,
        NumKind.Decimal, NumKind.Float, NumKind.Double)
      i <- Gen.choose(0, 30)
      s <- Gen.choose(0, 10)
    } yield HNum(k, i, s),
    Gen.oneOf(StrKind.Binary, StrKind.Timestamp, StrKind.Str).map(HStr(_)))

  private def genType(depth: Int): Gen[HType] =
    if (depth <= 0) genPrim
    else Gen.frequency(
      5 -> genPrim,
      2 -> Gen.lzy(genType(depth - 1).map(HList(_))),
      2 -> Gen.lzy(for {
        n <- Gen.choose(0, 3)
        keys <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
        vals <- Gen.listOfN(n, genType(depth - 1))
      } yield HStruct(TreeMap(keys.zip(vals): _*))),
      // a union reachable by actual merges (arbitrary branch sets could
      // violate the pairwise-incompatibility invariant the algebra keeps)
      1 -> Gen.lzy(for {
        n <- Gen.choose(1, 3)
        cs <- Gen.listOfN(n, genType(depth - 1))
      } yield cs.reduceLeft(HType.merge) match {
        case u: HUnion => u
        case other     => HUnion(Vector(other))
      }))

  /** Deterministic sample stream. */
  private def samples(n: Int): Vector[HType] = {
    val params = Gen.Parameters.default.withSize(20)
    var seed = Seed(42L)
    Vector.fill(n) {
      val t = genType(3).pureApply(params, seed)
      seed = seed.next
      t
    }
  }

  private val xs = samples(900)

  test("merge is associative (up to canonical form)") {
    xs.grouped(3).filter(_.size == 3).foreach { case Vector(a, b, c) =>
      val left = HType.merge(HType.merge(a, b), c).canonical
      val right = HType.merge(a, HType.merge(b, c)).canonical
      assert(left == right, s"\n  ($a ⊔ $b) ⊔ $c = $left\n  $a ⊔ ($b ⊔ $c) = $right")
    }
  }

  test("merge is commutative up to canonical union order") {
    xs.grouped(2).filter(_.size == 2).foreach { case Vector(a, b) =>
      assert(HType.merge(a, b).canonical == HType.merge(b, a).canonical,
        s"\n  $a ⊔ $b vs $b ⊔ $a")
    }
  }

  test("merge is idempotent") {
    xs.foreach { a => assert(HType.merge(a, a).canonical == a.canonical, s"\n  $a") }
  }

  test("HNull is a two-sided identity") {
    xs.foreach { a =>
      assert(HType.merge(a, HNull) == a)
      assert(HType.merge(HNull, a) == a)
    }
  }

  test("canonical is idempotent") {
    xs.foreach { a => assert(a.canonical.canonical == a.canonical) }
  }

  test("pickType is total on generated JSON-ish docs") {
    // exercise the parser on a spread of literals incl. boundary numbers
    val docs = Seq(
      """{"a": [1, 2.5, "x", null, {"b": true}], "c": {"d": [[1],[2.0e10]]}}""",
      """{"n": 127}{"n": 128}{"n": 32768}{"n": 2147483648}""",
      """{"n": 9223372036854775807}{"n": 9223372036854775808}""",
      """{"s": "0a1b"}{"s": "2016-01-05T12:34:56Z"}{"s": ""}""",
      "[]", "{}", "null", "true", "3.14", "\"x\"")
    docs.foreach { d => graft.infer.JsonInfer.inferDoc(d) } // must not throw
  }
}
