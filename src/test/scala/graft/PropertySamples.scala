package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic ScalaCheck sampling shared by every property suite (no
  * scalatest-scalacheck bridge in the offline cache): `n` draws of `g`
  * from the fixed seeds `seedBase .. seedBase+n-1`, so a failure replays
  * exactly from the printed inputs. Each suite passes its own seed base
  * to keep its historical cases stable. */
object PropertySamples {
  def samples[T](g: Gen[T], n: Int, seedBase: Long): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seedBase + i)))
}
