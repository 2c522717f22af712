package graft

import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.operators.Kmv

/** Bottom-k (KMV) distinct-value sketches and the cross-group Jaccard
  * estimator.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("kmvSketch keeps exactly the k smallest distinct hashes") {
    val df = Seq.tabulate(100)(i => ("g", s"v$i")) // 100 distinct values
      .toDF("grp", "value")
    val sketch = Kmv.kmvSketch(df, "grp", "value", k = 10)
      .select("sketch").as[Seq[Long]].head()
    val full = df.select(HashFunctions.md5Long(col("value")).as("h"))
      .distinct().as[Long].collect().sorted
    assert(sketch == full.take(10).toSeq)
  }

  test("duplicate values do not change the sketch (distinct semantics)") {
    val once = Seq.tabulate(30)(i => ("g", s"v$i")).toDF("grp", "value")
    val thrice = Seq.tabulate(90)(i => ("g", s"v${i % 30}"))
      .toDF("grp", "value")
    val a = Kmv.kmvSketch(once, "grp", "value", k = 8)
      .select("sketch").as[Seq[Long]].head()
    val b = Kmv.kmvSketch(thrice, "grp", "value", k = 8)
      .select("sketch").as[Seq[Long]].head()
    assert(a == b)
  }

  test("sketches are union-mergeable: sketch(A ∪ B) == " +
    "bottom-k(sketch(A) ∪ sketch(B))") {
    val va = Seq.tabulate(50)(i => ("a", s"x$i"))
    val vb = Seq.tabulate(50)(i => ("b", s"x${i + 25}")) // 25 shared
    val k = 12
    def sk(rows: Seq[(String, String)], g: String): Seq[Long] =
      Kmv.kmvSketch(rows.toDF("grp", "value")
          .withColumn("grp", lit(g)), "grp", "value", k)
        .select("sketch").as[Seq[Long]].head()
    val merged = (sk(va, "u") ++ sk(vb, "u")).distinct.sorted.take(k)
    val direct = sk(va ++ vb, "u")
    assert(merged == direct)
  }

  test("kmvCrossJaccard is exact when the union fits in the sketch") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8", "x"),
      (2L, "w5 w6 w7 w8 w9 w10 w11 w12", "y"))
      .toDF("doc_id", "text", "source")
    val est = Kmv.kmvCrossJaccard(
      Kmv.vocabSketch(docs, "source", "text", k = 64), "source", k = 64)
      .select("group_a", "group_b", "n_union_sample", "n_shared",
        "est_jaccard")
      .as[(String, String, Int, Int, Double)].collect()
    // |A ∩ B| = 4, |A ∪ B| = 12 → exact 4/12, union sample = 12 < k
    assert(est.toSeq == Seq(("x", "y", 12, 4, 0.333333)))
  }
}
