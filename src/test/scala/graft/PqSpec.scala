package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Product quantization: codes, ADC ranking, Lloyd refinement. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val d = 16
  private val m = 4
  private val ksub = 4

  // 40 vectors in 4 well-separated clusters per subspace: cluster c of
  // vector i is (i % 4), offset by 10*c in every dimension, plus a
  // small deterministic jitter so centroids move under refinement.
  private lazy val embs = {
    val rnd = new scala.util.Random(11)
    Seq.tabulate(40) { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(d)(_ => 10f * c + rnd.nextFloat()))
    }.toDF("vec_id", "embedding")
  }

  test("pqEncode emits m codes per vector, each a codebook entry id") {
    val cb = Pq.pqSeedCodebooks(embs, "vec_id", "embedding", m, ksub)
    val cids = cb.select("cid").distinct().as[Long].collect().toSet
    val codes = Pq.pqEncode(embs, "vec_id", "embedding", cb)
      .select(col("vec_id"), col("codes")).as[(Long, Seq[Long])].collect()
    assert(codes.length == 40)
    codes.foreach { case (id, cs) =>
      assert(cs.length == m, s"vec $id: ${cs.length} codes")
      cs.foreach(c => assert(cids.contains(c), s"vec $id: code $c not a cid"))
    }
  }

  test("seed vectors quantize to themselves: ADC self-distance 0, rank 1") {
    val cb = Pq.pqSeedCodebooks(embs, "vec_id", "embedding", m, ksub)
    val codes = Pq.pqEncode(embs, "vec_id", "embedding", cb)
    // seeds are the ksub lowest ids — each IS a codebook entry in every
    // subspace, so its own code word reconstructs it exactly
    val top = Pq.pqTopK(codes, embs.filter(col("vec_id") < ksub), cb,
      "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id", "adc")
      .as[(Long, Long, Double)].collect()
    assert(top.length == ksub)
    top.foreach { case (q, n, adc) =>
      assert(n == q, s"query $q: rank-1 neighbor $n is not itself")
      assert(adc == 0.0, s"query $q: self ADC $adc != 0")
    }
  }

  test("ADC equals the exact table-lookup reconstruction distance") {
    // recompute each (query, neighbor) ADC on the driver from the
    // collected codebooks and codes; must match the operator bitwise
    val cb = Pq.pqSeedCodebooks(embs, "vec_id", "embedding", m, ksub)
    val codes = Pq.pqEncode(embs, "vec_id", "embedding", cb)
    val cbMap = cb.select(col("sub"), col("cid"), col("cvec"))
      .as[(Int, Long, Seq[Double])].collect()
      .map { case (s, c, v) => (s, c) -> v }.toMap
    val codeMap = codes.select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Long])].collect().toMap
    val vecMap = embs.as[(Long, Seq[Float])].collect().toMap
    val got = Pq.pqTopK(codes, embs.filter(col("vec_id") < 3), cb,
      "vec_id", "embedding", k = 40)
      .select("query_id", "neighbor_id", "adc")
      .as[(Long, Long, Double)].collect()
    assert(got.length == 3 * 40)
    val dsub = d / m
    got.foreach { case (q, n, adc) =>
      val expect = (0 until m).map { s =>
        val qsub = vecMap(q).slice(s * dsub, (s + 1) * dsub)
          .map(_.toDouble)
        val cvec = cbMap((s, codeMap(n)(s)))
        qsub.zip(cvec).foldLeft(0.0) { case (acc, (x, y)) =>
          acc + (x - y) * (x - y)
        }
      }.foldLeft(0.0)(_ + _)
      assert(adc == expect, s"($q,$n): adc $adc != exact $expect")
    }
  }

  test("IVFADC with all cells probed equals plain ADC minus self-matches") {
    // 4 centroids = the 4 cluster representatives (ids 0-3); probing
    // every cell removes the coarse bound, so the composed result must
    // equal pqTopK over the full corpus with self-pairs dropped
    val cb = Pq.pqSeedCodebooks(embs, "vec_id", "embedding", m, ksub)
    val cents = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val queries = embs.filter(col("vec_id") < 6)
    val composed = Pq.ivfPqTopK(embs, queries, cents, cb,
      "vec_id", "embedding", k = 3, nprobe = 4)
      .select("query_id", "rank", "neighbor_id", "adc")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val codes = Pq.pqEncode(embs, "vec_id", "embedding", cb)
    // k+1 then re-rank after dropping self: pqTopK keeps self-matches
    val full = Pq.pqTopK(codes, queries, cb, "vec_id", "embedding", k = 4)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "adc")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(3).zipWithIndex
          .map { case ((_, n, adc), i) => (q, i + 1, n, adc) }
      }.sortBy(r => (r._1, r._2))
    assert(composed.length == full.length)
    composed.zip(full).foreach { case (c, f) =>
      assert(c._1 == f._1 && c._2 == f._2 && c._3 == f._3,
        s"composed $c != full $f")
      assert(math.abs(c._4 - f._4) < 1e-12)
    }
  }

  test("residuals subtract the assigned centroid exactly; encode carries the cell") {
    val cents = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val assigned = graft.operators.Knn
      .ivfAssign(embs, "vec_id", "embedding", cents)
      .as[(Long, Long)].collect().toMap
    val vecMap = embs.as[(Long, Seq[Float])].collect().toMap
    val r = Pq.residuals(embs, "vec_id", "embedding", cents)
      .select("vec_id", "cell", "rvec")
      .as[(Long, Long, Seq[Double])].collect()
    assert(r.length == 40)
    r.foreach { case (id, cell, rv) =>
      assert(cell == assigned(id), s"vec $id: cell $cell != assignment")
      val x = vecMap(id); val cv = vecMap(cell)
      rv.indices.foreach { i =>
        assert(rv(i) == x(i).toDouble - cv(i).toDouble,
          s"vec $id dim $i: residual mismatch")
      }
      // a centroid's own residual is exactly zero (cos(x,x)=1 is the
      // strict argmax — the jitter makes every vector unique)
      if (id < 4) assert(rv.forall(_ == 0.0), s"centroid $id: nonzero residual")
    }
    val cb = Pq.pqSeedCodebooks(
      Pq.residuals(embs, "vec_id", "embedding", cents)
        .filter(col("vec_id") >= 4), "vec_id", "rvec", m, ksub)
    val cids = cb.select("cid").distinct().as[Long].collect().toSet
    val codes = Pq.pqEncodeResidual(embs, "vec_id", "embedding", cents, cb)
      .select("vec_id", "cell", "codes")
      .as[(Long, Long, Seq[Long])].collect()
    assert(codes.length == 40)
    codes.foreach { case (id, cell, cs) =>
      assert(cell == assigned(id), s"vec $id: encode cell != assignment")
      assert(cs.length == m && cs.forall(cids.contains), s"vec $id: bad codes")
    }
  }

  test("ivfPqTopKSweepResidual per width == independent ivfPqTopKResidual " +
    "runs, bitwise ADC") {
    val cents = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val cb = Pq.pqSeedCodebooks(
      Pq.residuals(embs, "vec_id", "embedding", cents)
        .filter(col("vec_id") >= 4), "vec_id", "rvec", m, ksub)
    val queries = embs.filter(col("vec_id") < 6)
    val widths = Seq(1, 2, 4)
    val sweep = Pq.ivfPqTopKSweepResidual(embs, queries, cents, cb,
      "vec_id", "embedding", k = 3, nprobes = widths)
      .select("nprobe", "query_id", "rank", "neighbor_id", "adc")
      .as[(Int, Long, Int, Long, Double)].collect()
    widths.foreach { w =>
      val single = Pq.ivfPqTopKResidual(embs, queries, cents, cb,
        "vec_id", "embedding", k = 3, nprobe = w)
        .select("query_id", "rank", "neighbor_id", "adc")
        .as[(Long, Int, Long, Double)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      val sw = sweep.filter(_._1 == w)
        .map(r => (r._2, r._3, r._4, r._5))
        .sortBy(r => (r._1, r._2)).toSeq
      assert(sw == single, s"width $w: sweep != independent run")
    }
  }

  test("ivfPqTopKSweep per width == independent ivfPqTopK runs, " +
    "bitwise ADC") {
    val cb = Pq.pqSeedCodebooks(embs, "vec_id", "embedding", m, ksub)
    val cents = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val queries = embs.filter(col("vec_id") < 6)
    val widths = Seq(1, 2, 4)
    val sweep = Pq.ivfPqTopKSweep(embs, queries, cents, cb,
      "vec_id", "embedding", k = 3, nprobes = widths)
      .select("nprobe", "query_id", "rank", "neighbor_id", "adc")
      .as[(Int, Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4, r._5))
        .sortBy(r => (r._1, r._2))).toMap
    widths.foreach { p =>
      val single = Pq.ivfPqTopK(embs, queries, cents, cb,
        "vec_id", "embedding", k = 3, nprobe = p)
        .select("query_id", "rank", "neighbor_id", "adc")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
      val level = sweep.getOrElse(p, Array.empty[(Long, Int, Long, Double)])
      assert(level.length == single.length,
        s"nprobe=$p: sweep ${level.length} rows vs single ${single.length}")
      level.zip(single).foreach { case (a, b) =>
        assert(a == b, s"nprobe=$p: sweep row $a != single row $b")
      }
    }
  }

  test("IVFADC candidates never leave the probed cells") {
    val cb = Pq.pqSeedCodebooks(embs, "vec_id", "embedding", m, ksub)
    val cents = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val queries = embs.filter(col("vec_id") === 5L)
    val out = Pq.ivfPqTopK(embs, queries, cents, cb,
      "vec_id", "embedding", k = 40, nprobe = 1)
      .select("neighbor_id").as[Long].collect().toSet
    val probedCell = graft.operators.Knn
      .probeCells(queries, cents, "vec_id", "embedding", 1)
      .select("cid").as[Long].collect().toSet
    val members = graft.operators.Knn
      .ivfAssign(embs, "vec_id", "embedding", cents)
      .filter(col("cid").isin(probedCell.toSeq: _*))
      .select("vec_id").as[Long].collect().toSet
    assert(out.nonEmpty && out.subsetOf(members - 5L),
      s"neighbors $out escape probed-cell members $members")
  }

  test("Lloyd refinement does not increase total quantization error") {
    def sqErr(cb: org.apache.spark.sql.DataFrame): Double = {
      val cbMap = cb.select(col("sub"), col("cid"), col("cvec"))
        .as[(Int, Long, Seq[Double])].collect()
        .map { case (s, c, v) => (s, c) -> v }.toMap
      val codeMap = Pq.pqEncode(embs, "vec_id", "embedding", cb)
        .select(col("vec_id"), col("codes"))
        .as[(Long, Seq[Long])].collect().toMap
      val dsub = d / m
      embs.as[(Long, Seq[Float])].collect().map { case (id, v) =>
        (0 until m).map { s =>
          val sub = v.slice(s * dsub, (s + 1) * dsub).map(_.toDouble)
          sub.zip(cbMap((s, codeMap(id)(s))))
            .map { case (x, y) => (x - y) * (x - y) }.sum
        }.sum
      }.sum
    }
    val cb0 = Pq.pqSeedCodebooks(embs, "vec_id", "embedding", m, ksub)
    val cb1 = Pq.pqRefine(embs, "vec_id", "embedding", cb0, iters = 1)
    val cb2 = Pq.pqRefine(embs, "vec_id", "embedding", cb1, iters = 1)
    val (e0, e1, e2) = (sqErr(cb0), sqErr(cb1), sqErr(cb2))
    assert(e1 <= e0, s"one round worsened error: $e0 -> $e1")
    assert(e2 <= e1, s"second round worsened error: $e1 -> $e2")
    assert(e1 < e0 * 0.9, s"refinement barely moved: $e0 -> $e1")
  }

  test("refinement preserves codebook shape and empty entries keep seeds") {
    // one far-away outlier entry never wins an assignment → its vector
    // must survive refinement unchanged
    val far = Seq((999L, Array.fill(d)(1e6f))).toDF("vec_id", "embedding")
    val cb0 = Pq.pqSeedCodebooks(
      embs.union(far).orderBy(col("vec_id").desc), "vec_id", "embedding",
      m, ksub)
    // seed set here = lowest ksub ids of the UNION = 0..3 plus none of
    // the outlier; instead force the outlier in by unioning codebooks
    val cbOut = Pq.pqSeedCodebooks(far, "vec_id", "embedding", m, 1)
    val cb = cb0.union(cbOut)
    val cb1 = Pq.pqRefine(embs, "vec_id", "embedding", cb, iters = 1)
    assert(cb1.count() == cb.count())
    val outRows = cb1.filter(col("cid") === 999L)
      .select("cvec").as[Seq[Double]].collect()
    assert(outRows.length == m)
    outRows.foreach(v => assert(v.forall(_ == 1e6), s"outlier moved: $v"))
  }
}
