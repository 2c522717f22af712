package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks latest right at-or-before each left ts, else null") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (1L, 50L, "c"),
      (2L, 500L, "d")).toDF("k", "secs", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 150L, 20.0), (3L, 1L, 99.0))
      .toDF("k", "secs", "v")
    val got = TemporalJoins.asofJoin(left, right, "k", "secs")
      .select("tag", "asof_secs", "asof_v")
      .as[(String, Option[Long], Option[Double])].collect()
      .map { case (k, s, v) => k -> ((s, v)) }.toMap
    assert(got("a") == (Some(100L), Some(10.0)), "tie: right at same ts matches")
    assert(got("b") == (Some(150L), Some(20.0)))
    assert(got("c") == (None, None), "no right before -> nulls (left outer)")
    assert(got("d") == (None, None), "key with no right rows at all")
  }

  test("range self-join pairs within gap, once per pair, signed gap") {
    val rows = Seq(
      (1L, 10L, 1000L), (1L, 11L, 1030L), (1L, 12L, 1090L),
      (1L, 13L, 5000L), (2L, 20L, 1000L))
      .toDF("k", "id", "secs")
    val got = TemporalJoins.rangeSelfJoinPairs(rows, "k", "id", "secs", 60L)
      .select("id_a", "id_b", "gap").as[(Long, Long, Long)].collect().toSet
    // 10-11 (gap 30), 11-12 (gap 60 inclusive), 10-12 (gap 90 > 60: out)
    assert(got == Set((10L, 11L, 30L), (11L, 12L, 60L)))
  }

  test("range join matches pairs across bucket boundaries") {
    // secs 59 and 61 are in different floor(secs/60) buckets but gap=2
    val rows = Seq((1L, 1L, 59L), (1L, 2L, 61L)).toDF("k", "id", "secs")
    val got = TemporalJoins.rangeSelfJoinPairs(rows, "k", "id", "secs", 60L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }
}
