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

  // DimStats mergeability law — the 100 TB contract: ANY partitioning of
  // the rows, folded partial-by-partial in any grouping, must equal the
  // sequential fold bit-for-bit (integer fixed-point sums make this an
  // == property, not a tolerance). Pure driver-side: exercises the
  // Aggregator's reduce/merge directly.
  import graft.operators.DimStats
  private val vecsGen: Gen[List[List[Double]]] = for {
    d <- Gen.choose(1, 6)
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n,
      Gen.listOfN(d, Gen.choose(-2.0, 2.0)))
  } yield rows

  private def foldAll(rows: Seq[Seq[Double]]): DimStats.Buf =
    rows.foldLeft(DimStats.aggregator.zero)(DimStats.aggregator.reduce)

  private def eq(a: DimStats.Buf, b: DimStats.Buf): Boolean =
    a.n == b.n && a.sumFp.sameElements(b.sumFp) &&
      a.sumSqFp.sameElements(b.sumSqFp) &&
      a.mn.sameElements(b.mn) && a.mx.sameElements(b.mx)

  property("dimStatsMergeAssociative") =
    forAll(vecsGen, Gen.choose(0, 29)) { (rows, cutRaw) =>
      val cut = cutRaw % rows.length
      val (l, r) = rows.splitAt(cut)
      val merged = DimStats.aggregator.merge(foldAll(l), foldAll(r))
      eq(merged, foldAll(rows)) && {
        // empty-side identities
        val z = DimStats.aggregator.zero
        eq(DimStats.aggregator.merge(foldAll(rows),
          DimStats.aggregator.zero), foldAll(rows)) &&
          eq(DimStats.aggregator.merge(z, foldAll(rows)), foldAll(rows))
      }
    }
}
