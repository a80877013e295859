package graft.streaming

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property obligations for [[JdbcApplySink.rowKey]] — the partition key
 * of the executor-parallel apply mode. The ONE hazard parallelism adds
 * is a SPLIT: two statements for the same logical row landing in
 * different partitions and losing their relative order. CDC payloads
 * render the same PK value many ways (5, 5.0, 5e0, "5", "5.0" — audit
 * payloads commonly stringify), so the key must canonicalize every
 * numeric rendering of one value identically, across INSERT/UPDATE
 * (new_values) and DELETE (old_values) alike.
 */
class RowKeyProperties extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    graft.PropertySamples.samples(g, n, 11077L)

  private val pks = Map(("public", "t") -> Seq("id"))

  private def key(action: String, payload: String): String = {
    val (nv, ov) =
      if (action == "DELETE") (null: String, payload) else (payload, null)
    JdbcApplySink.rowKey(action, "public", "t", nv, ov, pks)
  }

  private val numGen: Gen[Long] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L), Gen.choose(-20L, 20L),
    Gen.const(0L), Gen.const(Long.MaxValue), Gen.const(Long.MinValue))

  test("property: every JSON rendering of one numeric PK keys identically") {
    samples(numGen, 60).foreach { n =>
      // renderings a CDC decoder can emit for the same logical value
      val renderings = Seq(
        s"""{"id": $n}""",          // bare integer
        s"""{"id": $n.0}""",        // decimal point
        s"""{"id": "$n"}""",        // stringified
        s"""{"id": "$n.0"}""",      // stringified decimal
        s"""{"id": ${n}e0}""",      // scientific
        s"""{"id": $n.000}""")      // trailing zeros
      val keys = renderings.map(key("INSERT", _)).distinct
      assert(keys.sizeIs == 1,
        s"renderings of $n split into ${keys.size} keys: $keys")
      // the DELETE (old_values-side) key matches the INSERT key — one
      // row's INSERT and DELETE must co-locate
      assert(key("DELETE", renderings.head) == keys.head)
    }
  }

  test("property: distinct PK values never collide across renderings") {
    val pairs = for {
      a <- numGen; b <- numGen if a != b
    } yield (a, b)
    samples(pairs, 60).foreach { case (a, b) =>
      assert(key("INSERT", s"""{"id": $a}""") !=
        key("INSERT", s"""{"id": "$b.0"}"""),
        s"$a and $b collided")
    }
  }

  test("degenerate-exponent PKs key identically bare and stringified") {
    // past the precision/scale guard the key falls back to BigDecimal's
    // scientific rendering, so the bare float (already scientific via
    // the exact-decimal parse) and the stringified raw text agree
    assert(key("INSERT", """{"id": 1e999999}""") ==
      key("DELETE", """{"id": "1e999999"}"""))
    assert(key("INSERT", """{"id": 1.0e999999}""") ==
      key("INSERT", """{"id": "1e999999"}"""))
    // and distinct degenerate values still key apart
    assert(key("INSERT", """{"id": 1e999999}""") !=
      key("INSERT", """{"id": 2e999999}"""))
  }

  test("non-numeric and null PKs key consistently without canonicalizing away") {
    // strings that merely LOOK numeric-ish must not collide with numbers
    assert(key("INSERT", """{"id": "5x"}""") !=
      key("INSERT", """{"id": 5}"""))
    // a true string PK keys by its text
    assert(key("INSERT", """{"id": "alpha"}""") ==
      key("DELETE", """{"id": "alpha"}"""))
    // missing column / null payload both key to the literal null form —
    // consistent, never throwing
    assert(key("INSERT", """{"other": 1}""") == key("INSERT", null))
  }
}
