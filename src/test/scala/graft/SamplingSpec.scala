package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(_.toLong).toDF("id")

  test("hash sample is a pure function of the key — partitioning-invariant") {
    val df = ids(2000)
    val a = Sampling.hashSample(df, "id", 0.3).as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(7), "id", 0.3)
      .as[Long].collect().toSet
    assert(a == b, "sample must not depend on physical partitioning")
    // ~30% within generous tolerance (hash uniformity, not an RNG test)
    assert(a.size > 450 && a.size < 750, s"got ${a.size} of 2000")
  }

  test("hash split covers every row once with roughly right proportions") {
    val splits = Sampling.hashSplit(ids(2000), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits.values.sum == 2000L)
    assert(splits("train") > 1480 && splits("train") < 1700, s"got $splits")
    assert(splits.keySet == Set("train", "val", "test"))
    // deterministic: same call, same assignment
    val again = Sampling.hashSplit(ids(2000), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(splits == again)
  }

  test("group cap keeps at most n stable rows per group") {
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
    val capped = Sampling.groupCap(df, Seq("g"), "id", n = 5)
    val byGroup = capped.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byGroup.values.forall(_ == 5L), s"got $byGroup")
    val again = Sampling.groupCap(df.repartition(11), Seq("g"), "id", n = 5)
    assert(capped.as[(String, Long)].collect().toSet ==
      again.as[(String, Long)].collect().toSet)
  }

  test("cluster-safe split keeps every near-dup cluster in one split") {
    val df = ids(500)
    // clusters of 5 consecutive ids each over 1..200; 201..500 singletons
    val comps = (1 to 200).map(i => (i.toLong, (((i - 1) / 5) * 5 + 1).toLong))
      .toDF("id", "component")
    val split = Sampling.clusterSafeSplit(df, "id", comps,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val rows = split.select("id", "split_key", "split")
      .as[(Long, Long, String)].collect()
    assert(rows.length === 500, "every row assigned exactly once")
    // all members of a cluster share the split label
    val byCluster = rows.filter(_._1 <= 200).groupBy(_._2)
    assert(byCluster.size === 40)
    byCluster.foreach { case (c, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"cluster $c straddles splits: ${members.toSeq}")
    }
    // singletons fall back to their own id and agree with plain hashSplit
    val single = rows.filter(_._1 > 200)
    assert(single.forall(r => r._2 == r._1))
    val plain = Sampling.hashSplit(df.filter($"id" > 200), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(single.forall(r => plain(r._1) == r._3))
  }

  test("source mix keeps per-source fractions, consistent with hashSample") {
    val df = (1 to 3000)
      .map(i => (i.toLong, s"s${i % 3}")).toDF("id", "src")
    val mixed = Sampling.sourceMix(df, "id", "src",
      Seq("s0" -> 1.0, "s1" -> 0.3), defaultFraction = 0.0)
    val bySrc = mixed.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(bySrc.getOrElse("s0", 0L) == 1000L, s"got $bySrc") // keep all
    assert(!bySrc.contains("s2"), s"got $bySrc")              // keep none
    assert(bySrc("s1") > 200 && bySrc("s1") < 400, s"got $bySrc")
    // the decision is the SAME hash as hashSample: a row kept at
    // fraction f for its source is exactly a hashSample(f) member, so
    // separate jobs can re-derive the mix without coordination
    val viaSample = Sampling
      .hashSample(df.filter(col("src") === "s1"), "id", 0.3)
      .select("id").as[Long].collect().toSet
    val viaMix = mixed.filter(col("src") === "s1")
      .select("id").as[Long].collect().toSet
    assert(viaMix == viaSample)
    // partitioning-invariant
    val again = Sampling.sourceMix(df.repartition(13), "id", "src",
      Seq("s0" -> 1.0, "s1" -> 0.3), defaultFraction = 0.0)
      .select("id").as[Long].collect().toSet
    assert(again == mixed.select("id").as[Long].collect().toSet)
  }
}
