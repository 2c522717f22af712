package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

import graft.functions.{GraftFunctions, HashFunctions, TextAnalysis, TextFunctions}
import graft.operators.{Bpe, CountMin, Decontaminate, Dedup, Jaccard, Kmv, Knn, Pca, Pq, QualityLr, Scrub, TemporalJoins}
import graft.QShared._

/** The reference pipeline surface: per-stage jaccard queries gated against the duckdb oracle (the golden byte parity lives in jaccardgoldenspec) — one registry slice of [[SparkEntry]]
  * (queries and their DuckDB oracles; see SparkEntry for the
  * hash-parity conventions every entry follows).
  */
private[graft] object JaccardQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- the reference's own query family, over the documents table
    "q20_jac_doc_sizes" -> ((s, dir) => {
      Jaccard.docSizes(Jaccard.tokenized(docsAsCorpus(s, dir)))
        .select(col("docId").as("doc_id"), col("size"))
        .orderBy("doc_id")
    }),
    "q21_jac_word_df" -> ((s, dir) => {
      Jaccard.postings(Jaccard.tokenized(docsAsCorpus(s, dir)))
        .groupBy("word")
        .agg(count(lit(1)).as("df"))
        .orderBy("word")
    }),
    "q22_jac_pairs" -> ((s, dir) => {
      val docs = docsAsCorpus(s, dir).filter(col("docId") < 120)
      Jaccard.pairIntersections(Jaccard.postings(Jaccard.tokenized(docs)))
        .select(col("docA").as("doc_a"), col("docB").as("doc_b"), col("inter"))
        .orderBy("doc_a", "doc_b")
    }),
    "q23_jac_sim" -> ((s, dir) => {
      val docs = docsAsCorpus(s, dir).filter(col("docId") < 120)
      Jaccard.allPairs(docs)
        .select(col("docA").as("doc_a"), col("docB").as("doc_b"),
          col("inter"), col("sizeA").as("size_a"), col("sizeB").as("size_b"),
          round(col("similarity"), 4).as("similarity"))
        .orderBy("doc_a", "doc_b")
    }),
    "q24_jac_topk" -> ((s, dir) => {
      val docs = docsAsCorpus(s, dir).filter(col("docId") < 120)
      Jaccard.topKNeighbors(Jaccard.allPairs(docs), 3)
        .select(col("doc").as("doc_id"), col("neighbor").as("neighbor_id"),
          round(col("similarity"), 4).as("similarity"),
          col("rank").cast("long").as("rank"))
        .orderBy("doc_id", "rank")
    }),
    // G1 — the materialized posting lists themselves (word → sorted doc
    // set), oracle-gated: the one §2.1 operator that was previously
    // spec-gated only. The list is serialized with array_join (the q16
    // precedent) because the driver's pandas comparator cannot sort raw
    // array columns.
    "q68_posting_lists" -> ((s, dir) => {
      val toks = Jaccard.tokenized(docsAsCorpus(s, dir))
      Jaccard.postingLists(Jaccard.postings(toks))
        .select(col("word"), array_join(col("docIds"), ",").as("doc_ids"))
        .orderBy("word")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q20_jac_doc_sizes" ->
      s"""WITH $ToksCte
         |SELECT doc_id, CAST(len(tokens) AS BIGINT) AS size
         |FROM toks WHERE len(tokens) > 0
         |ORDER BY doc_id""".stripMargin,
    "q21_jac_word_df" ->
      s"""WITH $ToksCte
         |SELECT word, count(*) AS df FROM (
         |  SELECT doc_id, unnest(tokens) AS word FROM toks WHERE len(tokens) > 0) p
         |GROUP BY word
         |ORDER BY word""".stripMargin,
    "q22_jac_pairs" ->
      s"""WITH $ToksCte,
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM toks
         |          WHERE len(tokens) > 0 AND doc_id < 120)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |FROM posts a JOIN posts b ON a.word = b.word AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q23_jac_sim" ->
      s"""WITH $ToksCte,
         |sizes AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS sz FROM toks
         |          WHERE len(tokens) > 0 AND doc_id < 120),
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM toks
         |          WHERE len(tokens) > 0 AND doc_id < 120),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM posts a JOIN posts b ON a.word = b.word AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, inter, sa.sz AS size_a, sb.sz AS size_b,
         |  round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS similarity
         |FROM pairs
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q24_jac_topk" ->
      s"""WITH $ToksCte,
         |sizes AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS sz FROM toks
         |          WHERE len(tokens) > 0 AND doc_id < 120),
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM toks
         |          WHERE len(tokens) > 0 AND doc_id < 120),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM posts a JOIN posts b ON a.word = b.word AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |sims AS (
         |  SELECT doc_a, doc_b,
         |    CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS similarity
         |  FROM pairs
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id),
         |directed AS (
         |  SELECT doc_a AS doc_id, doc_b AS neighbor_id, similarity FROM sims
         |  UNION ALL
         |  SELECT doc_b AS doc_id, doc_a AS neighbor_id, similarity FROM sims)
         |SELECT doc_id, neighbor_id, round(similarity, 4) AS similarity, rank
         |FROM (
         |  SELECT doc_id, neighbor_id, similarity,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY similarity DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM directed) ranked
         |WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,
    // tokens are distinct per doc (array_distinct in the tokenizer), so
    // (doc, word) postings are unique and the plain ordered list IS the
    // sorted doc set
    "q68_posting_lists" ->
      s"""WITH $ToksCte,
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM toks
         |          WHERE len(tokens) > 0)
         |SELECT word,
         |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids
         |FROM posts GROUP BY word
         |ORDER BY word""".stripMargin,
  )
}
