package graft

import org.apache.spark.sql.Row

import graft.functions.TextAnalysis

/** Gopher §A1.1 document-rule verdicts. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, Row] =
    TextAnalysis.gopherRules(rows.toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  private def rule(r: Row, name: String): Boolean =
    r.getBoolean(r.fieldIndex(name))

  // 60 words, mean length ~4.5, two required stopwords, no symbols
  private val goodText = (Seq("the", "with") ++
    Seq.fill(29)(Seq("clear", "prose"))
      .flatten).mkString(" ")

  test("a clean document passes every rule") {
    val r = run(1L -> goodText)(1L)
    Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
      "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
      "r_stopwords", "keep").foreach(n =>
      assert(rule(r, n), s"$n should pass: $r"))
  }

  test("each rule fails on its targeted defect") {
    val bullets = Seq.fill(10)("- item in a list").mkString("\n")
    val ellipses = Seq.fill(10)("this trails off...").mkString("\n")
    val symbols = goodText + " " + Seq.fill(40)("#").mkString(" ")
    val digits = Seq.fill(60)("1234").mkString(" ")
    val m = run(1L -> "too short", 2L -> bullets, 3L -> ellipses,
      4L -> symbols, 5L -> digits)
    assert(!rule(m(1L), "r_word_count"))
    assert(!rule(m(2L), "r_bullet_lines"))
    assert(!rule(m(3L), "r_ellipsis_lines"))
    assert(!rule(m(4L), "r_symbol_ratio"))
    assert(!rule(m(5L), "r_alpha_words"))
    m.values.foreach(r => assert(!rule(r, "keep")))
  }

  test("empty and punctuation-only docs fail word rules without error") {
    val m = run(1L -> "", 2L -> "!!! ???")
    Seq(1L, 2L).foreach { id =>
      assert(!rule(m(id), "r_word_count"))
      assert(!rule(m(id), "r_mean_word_len"))
      assert(!rule(m(id), "r_alpha_words"))
      assert(!rule(m(id), "keep"))
    }
  }
}
