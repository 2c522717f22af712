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
    // Exact Jaccard-threshold join via AllPairs/PPJoin prefix filtering.
    // The oracle is the BRUTE-FORCE all-co-occurring-pairs join filtered
    // at the threshold — equality proves the prefix + length + positional
    // pruning loses no true pair (the whole point of the operator).
    "q172_jac_threshold_join" -> ((s, dir) => {
      val docs = docsAsCorpus(s, dir).filter(col("docId") < 120)
      Jaccard.thresholdJoin(Jaccard.tokenized(docs), 0.9)
        .select(col("docA").as("doc_a"), col("docB").as("doc_b"),
          col("inter"), col("sizeA").as("size_a"), col("sizeB").as("size_b"),
          round(col("similarity"), 4).as("similarity"))
        .orderBy("doc_a", "doc_b")
    }),
    // The pruning math itself: candidate counts after prefix+length,
    // after the positional filter, and after exact verification. The
    // oracle replays the df-ordered prefix construction in SQL, so a
    // formula drift (prefix length, minOverlap, ubound) fails the gate
    // even when q172's final answer happens to survive it.
    "q173_jac_prefix_stats" -> ((s, dir) => {
      val docs = docsAsCorpus(s, dir).filter(col("docId") < 120)
      val toks = Jaccard.tokenized(docs)
      val ordered = Jaccard.dfOrderedSets(toks)
      Jaccard.prefixCandidates(ordered, 0.9, positional = false)
        .agg(count(lit(1)).as("n_candidates"))
        .crossJoin(Jaccard.prefixCandidates(ordered, 0.9)
          .agg(count(lit(1)).as("n_positional")))
        .crossJoin(Jaccard.thresholdJoin(toks, 0.9)
          .agg(count(lit(1)).as("n_verified")))
    }),
    // Exact-threshold incremental matches: src0 arrivals vs the indexed
    // rest of the corpus (the q163 fixture split), J >= 0.9, verified
    // values — oracle is the pruning-free cross-source brute force.
    "q177_jac_threshold_matches" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id").as("docId"), col("text"), col("source"))
      val idx = Jaccard.dfOrderedSets(
        Jaccard.tokenized(docs.filter(col("source") =!= "src0")))
      Jaccard.thresholdMatches(
        Jaccard.tokenized(docs.filter(col("source") === "src0")), idx, 0.9)
        .select(col("docId").as("doc_id"), col("matchId").as("match_id"),
          col("inter"), col("size"), col("matchSize").as("match_size"),
          round(col("similarity"), 4).as("similarity"))
        // one-partition sortWithinPartitions, NOT orderBy: a range
        // exchange samples its child for bounds, re-running the whole
        // probe→verify pipeline twice (measured 2× at sf0.1); the
        // result is report-sized, so a single sorted partition is free
        .repartition(1).sortWithinPartitions("doc_id", "match_id")
    }),
    // ...and the gate: arrivals with NO exact match at the bar survive
    "q176_jac_threshold_gate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id").as("docId"), col("text"), col("source"))
      val idx = Jaccard.dfOrderedSets(
        Jaccard.tokenized(docs.filter(col("source") =!= "src0")))
      Jaccard.thresholdGate(
        Jaccard.tokenized(docs.filter(col("source") === "src0")), idx, 0.9)
        .select(col("docId").as("doc_id"))
        .repartition(1).sortWithinPartitions("doc_id")  // see q177
    }),
    // Incremental index compaction: merge the src0 micro-batch into
    // the dfOrderedSets index of the rest (the q177 split). The oracle
    // is the from-scratch rebuild over the UNION replayed in SQL, so a
    // drift in the additive df merge, the affected-doc pruning, or the
    // (df, word) re-rank breaks the serialized per-doc token ORDER.
    "q178_jac_compact_index" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id").as("docId"), col("text"), col("source"))
      // both sides materialized (the operator's consumption contract:
      // index referenced 4x across its two layouts, batch 2x — a lazy
      // chain would re-run the tokenizer + rank per reference; at
      // ingest the index is persisted state anyway)
      val idx = Jaccard.dfOrderedSets(
        Jaccard.tokenized(docs.filter(col("source") =!= "src0")))
        .localCheckpoint()
      Jaccard.compactIndex(idx,
        Jaccard.tokenized(docs.filter(col("source") === "src0"))
          .localCheckpoint())
        .select(col("docId").as("doc_id"), col("sz"),
          concat_ws(",", col("sorted_tokens")).as("sorted_tokens"))
        .repartition(1).sortWithinPartitions("doc_id")  // see q177
    }),
    // Deletion-side compaction (q178's mirror): remove the src0 docs
    // from the full-corpus dfOrderedSets index. The oracle is the
    // from-scratch rebuild over the SURVIVORS replayed in SQL, so a
    // drift in the subtractive df merge, the vanished-word handling,
    // or the affected-survivor re-rank breaks the serialized per-doc
    // token ORDER.
    "q184_jac_compact_deleted" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id").as("docId"), col("text"), col("source"))
      // index materialized (consumed 5x across its two layouts); the
      // delete set is id-width
      val idx = Jaccard.dfOrderedSets(Jaccard.tokenized(docs))
        .localCheckpoint()
      Jaccard.compactIndexDeleted(idx,
        docs.filter(col("source") === "src0").select(col("docId")))
        .select(col("docId").as("doc_id"), col("sz"),
          concat_ws(",", col("sorted_tokens")).as("sorted_tokens"))
        .repartition(1).sortWithinPartitions("doc_id")  // see q177
    }),
    // Directed containment join (|A∩B|/|A| >= t) — again gated against
    // the pruning-free brute force.
    "q174_jac_containment_join" -> ((s, dir) => {
      val docs = docsAsCorpus(s, dir).filter(col("docId") < 120)
      Jaccard.containmentJoin(Jaccard.tokenized(docs), 0.95)
        .select(col("docA").as("doc_a"), col("docB").as("doc_b"),
          col("inter"), col("sizeA").as("size_a"), col("sizeB").as("size_b"),
          round(col("containment"), 4).as("containment"))
        .orderBy("doc_a", "doc_b")
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
    // Brute force: every co-occurring pair, then the threshold — no
    // prefix filtering anywhere in the oracle (that's the proof).
    "q172_jac_threshold_join" ->
      s"""WITH $ToksCte,
         |base AS (SELECT doc_id, tokens, CAST(len(tokens) AS BIGINT) AS sz
         |         FROM toks WHERE len(tokens) > 0 AND doc_id < 120),
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM base),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM posts a JOIN posts b ON a.word = b.word AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, inter, sa.sz AS size_a, sb.sz AS size_b,
         |  round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS similarity
         |FROM pairs
         |JOIN base sa ON doc_a = sa.doc_id
         |JOIN base sb ON doc_b = sb.doc_id
         |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter)
         |      >= CAST(0.9 AS DOUBLE)
         |ORDER BY doc_a, doc_b""".stripMargin,
    // Full SQL replay of the prefix machinery: df-ordered token lists
    // (ties broken lexicographically, as sort_array on the (df, word)
    // struct does), prefix slice with the same 1e-9 ceil slack, the
    // length filter in the join, and PPJoin's max-ubound positional
    // filter. Parallel unnests zip in DuckDB, giving 0-based positions.
    "q173_jac_prefix_stats" ->
      s"""WITH $ToksCte,
         |base AS (SELECT doc_id, tokens, CAST(len(tokens) AS BIGINT) AS sz
         |         FROM toks WHERE len(tokens) > 0 AND doc_id < 120),
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM base),
         |df AS (SELECT word, count(*) AS df FROM posts GROUP BY word),
         |ordered AS (
         |  SELECT p.doc_id, any_value(b.sz) AS sz,
         |         list(p.word ORDER BY d.df, p.word) AS sorted_tokens
         |  FROM posts p JOIN df d ON d.word = p.word
         |  JOIN base b ON b.doc_id = p.doc_id
         |  GROUP BY p.doc_id),
         |pref AS (
         |  SELECT doc_id, sz,
         |    list_slice(sorted_tokens, 1,
         |      CAST(sz - ceil(CAST(0.9 AS DOUBLE) * sz - 1e-9) + 1 AS BIGINT))
         |      AS prefix
         |  FROM ordered),
         |prefpos AS (
         |  SELECT doc_id, sz, unnest(prefix) AS word,
         |         unnest(generate_series(0, len(prefix) - 1)) AS pos
         |  FROM pref),
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    any_value(a.sz) AS sa, any_value(b.sz) AS sb,
         |    max(1 + least(a.sz - a.pos - 1, b.sz - b.pos - 1)) AS ub
         |  FROM prefpos a JOIN prefpos b
         |    ON a.word = b.word AND a.doc_id < b.doc_id
         |  WHERE least(a.sz, b.sz)
         |        >= CAST(0.9 AS DOUBLE) * greatest(a.sz, b.sz)
         |  GROUP BY a.doc_id, b.doc_id),
         |poscand AS (
         |  SELECT * FROM cand
         |  WHERE ub >= ceil(CAST(0.9 AS DOUBLE) / (1.0 + CAST(0.9 AS DOUBLE))
         |                   * (sa + sb) - 1e-9)),
         |verified AS (
         |  SELECT c.doc_a,
         |    CAST(len(list_intersect(ba.tokens, bb.tokens)) AS BIGINT) AS inter,
         |    c.sa, c.sb
         |  FROM poscand c
         |  JOIN base ba ON ba.doc_id = c.doc_a
         |  JOIN base bb ON bb.doc_id = c.doc_b)
         |SELECT (SELECT count(*) FROM cand) AS n_candidates,
         |       (SELECT count(*) FROM poscand) AS n_positional,
         |       (SELECT count(*) FROM verified
         |        WHERE CAST(inter AS DOUBLE) / (sa + sb - inter)
         |              >= CAST(0.9 AS DOUBLE)) AS n_verified""".stripMargin,
    // Pruning-free cross-source brute force (the q172 proof pattern over
    // the q163 src0 split): EVERY co-occurring (arrival, indexed) pair
    // via full posting joins — no prefix, no df ordering, no size filter
    // anywhere — then the threshold. Equality proves the one-sided
    // prefix probe loses no true match.
    "q177_jac_threshold_matches" ->
      s"""WITH $ToksCte,
         |base AS (SELECT t.doc_id, t.tokens, CAST(len(t.tokens) AS BIGINT) AS sz,
         |                d.source
         |         FROM toks t JOIN documents d USING (doc_id)
         |         WHERE len(t.tokens) > 0),
         |arr AS (SELECT * FROM base WHERE source = 'src0'),
         |idx AS (SELECT * FROM base WHERE source <> 'src0'),
         |pairs AS (
         |  SELECT a.doc_id, b.doc_id AS match_id, count(*) AS inter
         |  FROM (SELECT doc_id, unnest(tokens) AS word FROM arr) a
         |  JOIN (SELECT doc_id, unnest(tokens) AS word FROM idx) b
         |    ON a.word = b.word
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT p.doc_id, p.match_id, p.inter, sa.sz AS size,
         |  sb.sz AS match_size,
         |  round(CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter), 4)
         |    AS similarity
         |FROM pairs p
         |JOIN arr sa ON p.doc_id = sa.doc_id
         |JOIN idx sb ON p.match_id = sb.doc_id
         |WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter)
         |      >= CAST(0.9 AS DOUBLE)
         |ORDER BY p.doc_id, p.match_id""".stripMargin,
    // ...and the gate's complement form: tokenized src0 arrivals whose
    // doc_id appears in NO brute-force pair at the bar.
    "q176_jac_threshold_gate" ->
      s"""WITH $ToksCte,
         |base AS (SELECT t.doc_id, t.tokens, CAST(len(t.tokens) AS BIGINT) AS sz,
         |                d.source
         |         FROM toks t JOIN documents d USING (doc_id)
         |         WHERE len(t.tokens) > 0),
         |arr AS (SELECT * FROM base WHERE source = 'src0'),
         |idx AS (SELECT * FROM base WHERE source <> 'src0'),
         |pairs AS (
         |  SELECT a.doc_id, b.doc_id AS match_id, count(*) AS inter
         |  FROM (SELECT doc_id, unnest(tokens) AS word FROM arr) a
         |  JOIN (SELECT doc_id, unnest(tokens) AS word FROM idx) b
         |    ON a.word = b.word
         |  GROUP BY a.doc_id, b.doc_id),
         |hit AS (
         |  SELECT DISTINCT p.doc_id
         |  FROM pairs p
         |  JOIN arr sa ON p.doc_id = sa.doc_id
         |  JOIN idx sb ON p.match_id = sb.doc_id
         |  WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter)
         |        >= CAST(0.9 AS DOUBLE))
         |SELECT doc_id FROM arr
         |WHERE doc_id NOT IN (SELECT doc_id FROM hit)
         |ORDER BY doc_id""".stripMargin,
    // The rebuild itself, over ALL docs (the src0 split is exhaustive):
    // df from the union's postings, per-doc token list ordered by
    // (df, word) — exactly dfOrderedSets' sort_array on the (df, word)
    // struct (ties lexicographic; tokens are [a-z0-9]+ so DuckDB's
    // collation agrees with Spark's binary compare).
    "q178_jac_compact_index" ->
      s"""WITH $ToksCte,
         |base AS (SELECT doc_id, tokens FROM toks WHERE len(tokens) > 0),
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM base),
         |df AS (SELECT word, count(*) AS df FROM posts GROUP BY word)
         |SELECT p.doc_id, CAST(count(*) AS BIGINT) AS sz,
         |  array_to_string(list(p.word ORDER BY d.df, p.word), ',')
         |    AS sorted_tokens
         |FROM posts p JOIN df d ON d.word = p.word
         |GROUP BY p.doc_id
         |ORDER BY p.doc_id""".stripMargin,
    // The survivor rebuild: toks joined back to documents for the
    // source split (the q177 pattern), df from the SURVIVORS' postings
    // only, per-doc token list ordered by (df, word) — a deleted doc
    // leaking into the df counts or a skipped survivor re-rank breaks
    // the order
    "q184_jac_compact_deleted" ->
      s"""WITH $ToksCte,
         |base AS (SELECT t.doc_id, t.tokens
         |         FROM toks t JOIN documents d USING (doc_id)
         |         WHERE len(t.tokens) > 0 AND d.source <> 'src0'),
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM base),
         |df AS (SELECT word, count(*) AS df FROM posts GROUP BY word)
         |SELECT p.doc_id, CAST(count(*) AS BIGINT) AS sz,
         |  array_to_string(list(p.word ORDER BY d.df, p.word), ',')
         |    AS sorted_tokens
         |FROM posts p JOIN df d ON d.word = p.word
         |GROUP BY p.doc_id
         |ORDER BY p.doc_id""".stripMargin,
    "q174_jac_containment_join" ->
      s"""WITH $ToksCte,
         |base AS (SELECT doc_id, tokens, CAST(len(tokens) AS BIGINT) AS sz
         |         FROM toks WHERE len(tokens) > 0 AND doc_id < 120),
         |posts AS (SELECT doc_id, unnest(tokens) AS word FROM base),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM posts a JOIN posts b ON a.word = b.word AND a.doc_id != b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, inter, sa.sz AS size_a, sb.sz AS size_b,
         |  round(CAST(inter AS DOUBLE) / sa.sz, 4) AS containment
         |FROM pairs
         |JOIN base sa ON doc_a = sa.doc_id
         |JOIN base sb ON doc_b = sb.doc_id
         |WHERE CAST(inter AS DOUBLE) / sa.sz >= CAST(0.95 AS DOUBLE)
         |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
