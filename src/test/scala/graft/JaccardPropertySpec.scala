package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.corpus.Corpus
import graft.operators.Jaccard

/** Property-based oracle (SURVEY §5): for random small corpora the engine
  * must equal a brute-force in-memory Set computation, and must be
  * invariant under token permutation and within-doc token duplication.
  */
class JaccardPropertySpec extends SparkSpec {
  import spark.implicits._

  private val word = Gen.oneOf(
    "apple", "banana", "cherry", "date", "elder", "fig", "grape", "kiwi",
    "lemon", "mango", "nine9", "zero0")
  private val docGen = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, word))
  private val corpusGen = Gen.chooseNum(2, 8)
    .flatMap(n => Gen.listOfN(n, docGen))

  /** Brute-force reference: unique-token sets, all i<j pairs with
    * non-empty intersection, J = inter / union.
    */
  private def brute(docs: Seq[(String, Seq[String])]): Map[(String, String), (Long, Double)] = {
    val sets = docs.map { case (id, ws) => id -> ws.toSet }
      .filter(_._2.nonEmpty).toMap
    (for {
      Seq(a, b) <- sets.keys.toSeq.sorted.combinations(2)
      inter = (sets(a) & sets(b)).size
      if inter > 0
    } yield (a, b) -> (inter.toLong,
      inter.toDouble / (sets(a) | sets(b)).size)).toMap
  }

  private def engine(lines: Seq[String]): Map[(String, String), (Long, Double)] =
    Jaccard.allPairs(Corpus.parse(lines.toDF("value")))
      .select("docA", "docB", "inter", "similarity")
      .as[(String, String, Long, Double)].collect()
      .map { case (a, b, i, j) => (a, b) -> ((i, j)) }.toMap

  private def run(prop: Prop, n: Int = 25): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("engine equals brute-force Set jaccard on random corpora") {
    run(Prop.forAll(corpusGen) { corpus =>
      val docs = corpus.zipWithIndex.map { case (ws, i) => (s"D$i", ws) }
      val lines = docs.map { case (id, ws) => s"$id ${ws.mkString(" ")}" }
      val got = engine(lines)
      val want = brute(docs)
      got.keySet == want.keySet && got.forall { case (k, (i, j)) =>
        want(k)._1 == i && math.abs(want(k)._2 - j) < 1e-12
      }
    })
  }

  test("similarity is invariant under token order and within-doc duplication") {
    val seedGen = Gen.chooseNum(0L, Long.MaxValue)
    run(Prop.forAll(corpusGen, seedGen) { (corpus, seed) =>
      val rnd = new scala.util.Random(seed)
      val docs = corpus.zipWithIndex.map { case (ws, i) => (s"D$i", ws) }
      val base = engine(docs.map { case (id, ws) => s"$id ${ws.mkString(" ")}" })
      val mutated = engine(docs.map { case (id, ws) =>
        val dup = ws ++ (if (ws.nonEmpty) Seq(ws(rnd.nextInt(ws.length))) else Nil)
        s"$id ${rnd.shuffle(dup).mkString(" ")}"
      })
      base == mutated
    }, n = 15)
  }
}
