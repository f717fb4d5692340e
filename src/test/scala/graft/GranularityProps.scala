package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.model.Granularity

/** Pure (driver-side) granularity-ladder laws — SURVEY §5.3. */
object GranularityProps extends Properties("Granularity") {

  val epochs: Gen[Long] = Gen.choose(0L, 4102444800L) // 1970..2100
  val grans: Gen[Granularity] = Gen.oneOf(Granularity.ladder)

  property("roundIsIdempotent") = forAll(epochs, grans) { (e, g) =>
    g.roundEpochSeconds(g.roundEpochSeconds(e)) == g.roundEpochSeconds(e)
  }

  property("roundFloors") = forAll(epochs, grans) { (e, g) =>
    val r = g.roundEpochSeconds(e)
    r <= e && e - r < g.seconds && r % g.seconds == 0
  }

  property("ladderNests") = forAll(epochs) { e =>
    // every level's bucket start is inside the coarser level's bucket —
    // the property that makes hierarchical folding correct
    Granularity.ladder.sliding(2).forall { case Seq(f, c) =>
      c.roundEpochSeconds(f.roundEpochSeconds(e)) == c.roundEpochSeconds(e)
    }
  }

  property("coarserThanIsStrict") = forAll(grans) { g =>
    Granularity.coarserThan(g).forall(_.seconds > g.seconds) &&
      !Granularity.coarserThan(g).contains(g)
  }

  property("unknownNameRaises") = Prop {
    try { Granularity("fortnights"); false }
    catch { case _: graft.model.UnsupportedGranularity => true }
  }
}
