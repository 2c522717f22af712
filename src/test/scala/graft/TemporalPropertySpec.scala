package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** Property-based oracle for the temporal joins: for random small event
  * sets the bucket-trick formulations must equal brute-force in-memory
  * pair enumeration — this is what guards the ±1-bucket coverage math
  * and the |gap| == maxGap / window boundary cases.
  */
class TemporalPropertySpec extends SparkSpec {
  import spark.implicits._

  // few keys + a narrow secs range force collisions, boundary gaps, and
  // bucket-edge alignment (secs spans several maxGap buckets)
  private val rowGen = for {
    k <- Gen.chooseNum(0L, 2L)
    s <- Gen.chooseNum(0L, 400L)
  } yield (k, s)
  private val rowsGen = Gen.chooseNum(2, 40)
    .flatMap(n => Gen.listOfN(n, rowGen))
    .map(_.zipWithIndex.map { case ((k, s), i) => (k, i.toLong, s) })

  private def run(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("range self-join equals brute-force pair enumeration") {
    run(Prop.forAll(rowsGen, Gen.chooseNum(1L, 120L)) { (rows, gap) =>
      val expected = (for {
        Seq((ka, ia, sa), (kb, ib, sb)) <- rows.combinations(2).map(_.sortBy(_._2)).toSeq
        if ka == kb && math.abs(sb - sa) <= gap
      } yield (ka, ia, ib, sb - sa)).toSet
      val got = TemporalJoins.rangeSelfJoinPairs(
        rows.toDF("k", "id", "secs"), "k", "id", "secs", gap)
        .as[(Long, Long, Long, Long)].collect().toSet
      got == expected
    })
  }

  test("two-frame range join equals brute-force window enumeration") {
    run(Prop.forAll(rowsGen, rowsGen,
      Gen.chooseNum(0L, 90L), Gen.chooseNum(1L, 90L)) {
      (ls, rs0, before, after) =>
        {
          // right ids offset so the two frames have disjoint id spaces
          val rs = rs0.map { case (k, i, s) => (k, i + 1000L, s) }
          val expected = (for {
            (kl, il, sl) <- ls
            (kr, ir, sr) <- rs
            if kl == kr && sr >= sl - before && sr <= sl + after
          } yield (kl, il, sl, ir, sr)).toSet
          val got = TemporalJoins.rangeJoin(
            ls.toDF("k", "id", "secs"), rs.toDF("k", "id", "secs"),
            "k", "id", "secs", before, after)
            .as[(Long, Long, Long, Long, Long)].collect().toSet
          got == expected
        }
    })
  }

  test("as-of join equals brute-force latest-at-or-before lookup") {
    run(Prop.forAll(rowsGen, rowsGen) { (ls, rs) =>
      // right side pre-aggregated to one row per (key, ts): keep max id
      val rAgg = rs.groupBy(r => (r._1, r._3)).map { case ((k, s), g) =>
        (k, s, g.map(_._2).max)
      }.toSeq
      val expected = ls.map { case (k, i, s) =>
        val m = rAgg.filter(r => r._1 == k && r._2 <= s)
          .sortBy(r => (r._2, r._3)).lastOption
        (k, i, s, m.map(_._2), m.map(_._3))
      }.toSet
      val got = TemporalJoins.asofJoin(
        ls.toDF("k", "id", "secs"),
        rAgg.toDF("k", "secs", "rid"), "k", "secs")
        .select(col("k"), col("id"), col("secs"),
          col("asof_secs"), col("asof_rid"))
        .as[(Long, Long, Long, Option[Long], Option[Long])]
        .collect().toSet
      got == expected
    }, n = 20)
  }
}
