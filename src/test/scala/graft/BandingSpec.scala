package graft

import graft.operators.Banding
import org.apache.spark.sql.functions._

/** The band-geometry scale policy, demonstrated: deeper bands cut the
  * random-pair candidate rate ~2^-Δbits per band while retaining strong
  * (cos ≈ 0.99) near-duplicate pairs per the sign-LSH S-curve. This is the
  * property SCALE.md's candidate-slope section rests on — banding with a
  * FIXED bit budget is Θ(N²·bands·2^-bits), so bit depth must track
  * log2(N); the spec constructs a corpus where both regimes are visible
  * (tight clusters = the true near-dups deep bands must keep; a random
  * background = the bulk the deep bands must shed).
  */
class BandingSpec extends SparkSpec {

  private val dim = 16

  test("deeper bands shed random collisions, keep near-dup clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def gauss(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    // 50 tight clusters of 4 (cos ≈ 0.99 within) + 400 random singletons
    val clustered = (0 until 50).flatMap { c =>
      val base = gauss().map(_.toDouble)
      (0 until 4).map { m =>
        val noisy = base.map(x => x + 0.05 * rnd.nextGaussian())
        val n = math.sqrt(noisy.map(x => x * x).sum)
        (c * 4 + m).toLong -> noisy.map(x => (x / n).toFloat)
      }
    }
    val background = (0 until 400).map(i => (200 + i).toLong -> gauss())
    val all = (clustered ++ background).toArray
    val df = all.toSeq.toDF("id", "emb")

    // ground truth on the driver: pairs above cos 0.9 (dots of unit vectors)
    val truePairs = (for {
      i <- all.indices.iterator; j <- (i + 1) until all.length
      d = all(i)._2.lazyZip(all(j)._2).map(_.toDouble * _).sum
      if d > 0.9
    } yield (math.min(all(i)._1, all(j)._1), math.max(all(i)._1, all(j)._1))).toSet
    assert(truePairs.size >= 250, s"cluster construction broke: ${truePairs.size} true pairs")

    def pairs(bands: Int, bits: Int): Set[(Long, Long)] =
      Banding.bandedCandidates(df, "id", "emb", dim, bands, bits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val shallow = pairs(4, 4) // the q28/q46 geometry
    val deep = pairs(4, 8)    // the scale geometry for a 16x bigger corpus

    // S-curve retention: at cos≈0.99 per-bit agreement ≈ 0.955, so even
    // 8-bit bands keep ~1-(1-0.955^8)^4 ≈ 0.99 of true pairs
    val recallShallow = (truePairs & shallow).size.toDouble / truePairs.size
    val recallDeep = (truePairs & deep).size.toDouble / truePairs.size
    assert(recallShallow > 0.9, f"4x4 recall $recallShallow%.3f")
    assert(recallDeep > 0.9, f"4x8 recall $recallDeep%.3f")

    // collision shedding: random pairs collide per band at 2^-bits, so the
    // FALSE-candidate volume must drop by roughly 2^4; assert a safe 5x
    val falseShallow = (shallow -- truePairs).size.toDouble
    val falseDeep = (deep -- truePairs).size.toDouble
    assert(falseShallow > 1000, s"background too clean to measure: $falseShallow")
    assert(falseDeep * 5 < falseShallow,
      f"expected ~16x fewer random collisions, got $falseShallow%.0f -> $falseDeep%.0f")
  }

  test("derived band depth: integer rule, floor 4, cap 15, exact power-of-two boundaries") {
    import queries.VectorOps.derivedBandBits
    // floor: tiny corpora keep the historical 4x4 geometry
    assert(derivedBandBits(0) == 4 && derivedBandBits(500) == 4)
    // exact boundary at 2^b * 64: 1024 still fits 4 bits, 1025 needs 5 —
    // integer comparisons, so no log2 rounding hazard at the flip points
    assert(derivedBandBits(1024) == 4 && derivedBandBits(1025) == 5)
    assert(derivedBandBits(2000) == 5) // the sf0.1 corpus
    assert(derivedBandBits((1L << 14) * 64) == 14)
    assert(derivedBandBits((1L << 15) * 64) == 15)
    // cap: 4 bands x 15 bits rides a 63-bit long
    assert(derivedBandBits(Long.MaxValue) == 15)
    // monotone: a bigger corpus never gets a shallower geometry
    val pts = Seq(1L, 100L, 1024L, 4096L, 100000L, 10000000L, 1L << 40)
    assert(pts.map(derivedBandBits).sliding(2).forall(s => s.head <= s.last))
  }
}
