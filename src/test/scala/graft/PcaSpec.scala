package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Covariance, Jacobi eigendecomposition, and PCA projection. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(xs: (Long, Seq[Double])*) =
    xs.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")

  test("covariance matches the hand-computed matrix") {
    // (1,0) (0,1) (1,1): means (2/3, 2/3); cov = [[2/9, -1/9], [-1/9, 2/9]]
    val df = vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0), 3L -> Seq(1.0, 1.0))
    val m = Pca.covariance(df, "vec_id", "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(m((0, 0)) == 0.222222 && m((1, 1)) == 0.222222)
    assert(m((0, 1)) == -0.111111 && m((1, 0)) == -0.111111)
  }

  test("bit-exact and scale (plain-sum) covariance agree to 1e-9") {
    val rnd = new scala.util.Random(7)
    val df = vecs(Seq.tabulate(40)(i =>
      i.toLong -> Seq.fill(6)(rnd.nextDouble() * 2 - 1)): _*)
      .repartition(5)
    def run(exact: Boolean): Map[(Int, Int), Double] =
      Pca.covariance(df, "vec_id", "embedding", bitExact = exact)
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val a = run(true)
    val b = run(false)
    assert(a.keySet == b.keySet && a.keySet.size == 36)
    a.foreach { case (k, v) =>
      assert(math.abs(v - b(k)) <= 1e-9, s"$k: $v vs ${b(k)}")
    }
  }

  test("jacobiEigen recovers a known eigensystem") {
    // [[2,1],[1,2]] → eigenvalues {1, 3}, eigenvectors (1,∓1)/√2
    val (evals, evecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = evals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 &&
      math.abs(sorted(1) - 3.0) < 1e-12)
    val k3 = evals.indexWhere(e => math.abs(e - 3.0) < 1e-12)
    val v3 = Array(evecs(0)(k3), evecs(1)(k3))
    assert(math.abs(math.abs(v3(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v3(0) - v3(1)) < 1e-12) // (1,1) direction
  }

  test("principalComponents finds the dominant direction with a " +
    "deterministic sign and descending eigenvalues") {
    // points on the line t·(1,1): all variance along (1,1)/√2
    val df = vecs(1L -> Seq(0.0, 0.0), 2L -> Seq(1.0, 1.0),
      3L -> Seq(2.0, 2.0), 4L -> Seq(3.0, 3.0))
    val comps = Pca.principalComponents(df, "vec_id", "embedding", m = 2)
      .orderBy("component")
      .collect().map(r => (r.getInt(0), r.getDouble(1),
        r.getSeq[Double](2), r.getDouble(3)))
    assert(comps(0)._2 > comps(1)._2 - 1e-12) // descending
    assert(math.abs(comps(1)._2) < 1e-6)      // line data: rank 1
    val b0 = comps(0)._3
    assert(math.abs(b0(0) - math.sqrt(0.5)) < 1e-6 &&
      math.abs(b0(1) - math.sqrt(0.5)) < 1e-6, s"basis $b0")
  }

  test("project yields centered coordinates along the component") {
    val df = vecs(1L -> Seq(0.0, 0.0), 2L -> Seq(1.0, 1.0),
      3L -> Seq(2.0, 2.0), 4L -> Seq(3.0, 3.0))
    val comps = Pca.principalComponents(df, "vec_id", "embedding", m = 1)
    val proj = Pca.project(df, "vec_id", "embedding", comps)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // mean is (1.5, 1.5); coord of (3,3) along (1,1)/√2 is 1.5·√2
    assert(math.abs(proj(4L).head - 1.5 * math.sqrt(2.0)) < 1e-6)
    assert(math.abs(proj(1L).head + 1.5 * math.sqrt(2.0)) < 1e-6)
    // centering: coordinates sum to zero
    assert(math.abs(proj.values.map(_.head).sum) < 1e-6)
  }

  test("fixture components are orthonormal and satisfy the eigen equation") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val comps = Pca.principalComponents(embs, "vec_id", "embedding", m = 4)
      .orderBy("component")
      .collect().map(r => (r.getDouble(1), r.getSeq[Double](2).toArray))
    val cov = Pca.covariance(embs, "vec_id", "embedding", bitExact = false)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val d = comps.head._2.length
    for (a <- comps.indices; b <- a until comps.length) {
      val dot = (0 until d).map(i => comps(a)._2(i) * comps(b)._2(i)).sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-6, s"<$a,$b> = $dot")
    }
    // eigen residual ‖Cv − λv‖∞ small (covariance rounded to 6 dp, so
    // the residual is bounded by that rounding, not machine epsilon)
    comps.foreach { case (lambda, v) =>
      (0 until d).foreach { i =>
        val cv = (0 until d).map(j => cov((i, j)) * v(j)).sum
        assert(math.abs(cv - lambda * v(i)) < 1e-3,
          s"eigen residual at $i: $cv vs ${lambda * v(i)}")
      }
    }
    // eigenvalues descending
    assert(comps.map(_._1).sliding(2).forall(p => p(0) >= p(1) - 1e-12))
  }
}
