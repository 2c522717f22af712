package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

import graft.functions.{GraftFunctions, HashFunctions, TextAnalysis, TextFunctions}
import graft.operators.{Bpe, CountMin, Decontaminate, Dedup, Jaccard, Kmv, Knn, Pca, Pq, QualityLr, Scrub, TemporalJoins}
import graft.QShared._

/** Text analysis and tokenization: quality/langid/fingerprints, term scoring, repetition stats, c4/gopher rules, screening, bpe (learning, encoding, packing), lm scoring, winnowing, sampling/reports, and the native text-kernel sql surface — one registry slice of [[SparkEntry]]
  * (queries and their DuckDB oracles; see SparkEntry for the
  * hash-parity conventions every entry follows).
  */
private[graft] object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the same SimHash via the SQL-TEXT entry path: parser → analyzer →
    // the registry-registered native kernels (graft_simhash), proving the
    // SparkSessionExtensions/SQL surface end to end; gated by the SAME
    // oracle as q33
    "q55_sql_native_simhash" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id,
          |  graft_simhash(transform(tokens,
          |    t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)),
          |    32) AS simhash
          |FROM (
          |  SELECT doc_id, array_distinct(filter(
          |    split(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '), '\\s+'),
          |    x -> x != '')) AS tokens
          |  FROM documents_v
          |  WHERE lower(text) RLIKE '[a-z0-9]')
          |ORDER BY doc_id""".stripMargin)
    }),

    // ---- text analysis (training-data curation)
    "q50_token_counts" -> ((s, dir) => {
      docsSorted(s, dir)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_words"),
          TextAnalysis.subwordCountApprox(col("text")).as("n_subwords"))
    }),
    "q51_quality" -> ((s, dir) => {
      TextAnalysis.qualityStats(docsSorted(s, dir), "doc_id", "text")
    }),
    "q52_langid" -> ((s, dir) => {
      TextAnalysis.langId(docsSorted(s, dir), "doc_id", "text")
    }),
    // char-shingle near-dup primitive: gate the full shingle SET per doc
    // (count + md5 of the sorted joined shingles), not just a count
    "q54_char_shingles" -> ((s, dir) => {
      GraftFunctions.register(s)
      docsSorted(s, dir)
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(col("doc_id"),
          TextFunctions.charShingles(col("text"), 5).as("sh"))
        .select(col("doc_id"),
          size(col("sh")).cast("long").as("n_shingles"),
          md5(array_join(array_sort(col("sh")), "|")).as("shingle_md5"))
    }),

    // TF-IDF + BM25 relevance weights over the inverted index
    "q58_term_scores" -> ((s, dir) => {
      TextAnalysis.termScores(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("word"), col("tf"),
          round(col("tfidf"), 6).as("tfidf"),
          round(col("bm25"), 6).as("bm25"))
        .orderBy("doc_id", "word")
    }),
    // keyword extraction: top-3 terms per doc by tf-idf (rank on the
    // UNROUNDED score, ties by word — deterministic in both engines)
    "q59_keywords" -> ((s, dir) => {
      val scores = TextAnalysis.termScores(t(s, dir, "documents"),
        "doc_id", "text")
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("word").asc)
      scores.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("word"),
          round(col("tfidf"), 6).as("tfidf"), col("rank"))
        .orderBy("doc_id", "rank")
    }),

    // ---- repetition / sub-document duplication / frequency sketches
    // Gopher-style repetition gate: top-n-gram and duplicate-n-gram
    // fractions per doc (word bigrams + trigrams off one tokenizer pass)
    "q75_repetition_stats" -> ((s, dir) => {
      TextAnalysis.repetitionStats(t(s, dir, "documents"), "doc_id", "text",
        ns = Seq(2, 3))
        .orderBy("doc_id")
    }),
    // C4/RefinedWeb-style sub-document duplication: 8-word chunks counted
    // corpus-wide; per-doc fraction of chunks that appear elsewhere
    "q76_chunk_stats" -> ((s, dir) => {
      Dedup.chunkStats(t(s, dir, "documents"), "doc_id", "text",
        chunkWords = 8)
        .orderBy("doc_id")
    }),
    // sequence packing: deterministic doc → token-budget pack assignment
    // (hash-sharded, per-shard prefix sums — no global sort anywhere)
    "q82_token_packing" -> ((s, dir) => {
      graft.operators.Packing.assignPacks(t(s, dir, "documents"),
        "doc_id", "text", budget = 512, shards = 8)
        .orderBy("doc_id")
    }),
    // pack-level rollup with an order-sensitive digest of each pack's
    // concatenated text — proves the assembled training sequences are
    // byte-deterministic, not just the assignment
    "q83_pack_digests" -> ((s, dir) => {
      graft.operators.Packing.packDigests(t(s, dir, "documents"),
        "doc_id", "text", budget = 512, shards = 8)
        .orderBy("shard", "pack_id")
    }),

    // C4-style blocklist screening: the list folds into the expression
    // tree — a pure narrow projection, no join, no shuffle
    "q84_blocklist" -> ((s, dir) => {
      graft.operators.Scrub.blocklistStats(t(s, dir, "documents"),
        "doc_id", "text", terms = Seq("slow", "dup", "batch"),
        maxBlocked = 2)
        .orderBy("doc_id")
    }),
    // PII-shaped regex redaction over event payloads (digit runs →
    // <NUM>); match counts via engine-portable split cardinality
    "q85_redact" -> ((s, dir) => {
      graft.operators.Scrub.redact(
        t(s, dir, "events").select(col("event_id"), col("props")),
        "props", rules = Seq(("[0-9]+", "<NUM>")))
        .orderBy("event_id")
    }),
    // temperature-rebalanced (T=2) source mixing with rates derived from
    // the data in one tiny broadcast agg — corpus never shuffles
    "q86_temperature_mix" -> ((s, dir) => {
      graft.operators.Sampling.temperatureMix(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source", keepLargest = 0.5)
        .orderBy("doc_id")
    }),
    // corpus-relative quality gate: drop the worst quartile by alpha
    // ratio — threshold is one exact-percentile scalar joined back by
    // broadcast, so the corpus never shuffles
    "q88_quality_gate" -> ((s, dir) => {
      graft.functions.TextAnalysis.qualityPercentileGate(
        t(s, dir, "documents"), "doc_id", "text",
        metric = "alpha_ratio", q = 0.25)
        .orderBy("doc_id")
    }),
    // context-length chunking: 32-token windows, stride 16 (50% overlap)
    // — fixed-width training/RAG pieces, digest-gated like q83's packs
    "q89_token_chunks" -> ((s, dir) => {
      graft.operators.Chunking.tokenChunks(t(s, dir, "documents"),
        "doc_id", "text", width = 32, stride = 16)
        .orderBy("doc_id", "chunk_idx")
    }),
    // CCNet-style perplexity proxy: unigram LM counted on src0, scoring
    // every other source with add-one smoothing (OOV path exercised by
    // construction). Per-doc sums fold token-sorted — bit-reproducible
    "q91_unigram_logprob" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.unigramLogProb(docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("sum_logprob"), 6).as("sum_logprob"),
          round(col("avg_logprob"), 6).as("avg_logprob"))
        .orderBy("doc_id")
    }),
    // winnowing fingerprints (MOSS): window-min selection over char
    // 5-gram hashes, window 4 — guaranteed detection of shared
    // substrings ≥ 8 chars at ~2/5 storage density
    "q101_winnow" -> ((s, dir) => {
      TextAnalysis.winnowFingerprints(t(s, dir, "documents"),
        "doc_id", "text", k = 5, w = 4)
        .orderBy("doc_id", "fingerprint")
    }),
    // MOSS overlap detection over the q101 fingerprints at detection
    // selectivity (k=16): posting join on fingerprint, stop-gram-like
    // hot fingerprints (df > 5) pruned via broadcast anti-join
    "q102_winnow_overlap" -> ((s, dir) => {
      TextAnalysis.winnowOverlapPairs(t(s, dir, "documents"),
        "doc_id", "text", k = 16, w = 8, minShared = 2L,
        maxDocFrequency = 5L)
        .orderBy("id_a", "id_b")
    }),
    // corpus composition report: docs/tokens/mean-length by source ×
    // predicted language with rollup subtotals — one tokenizer pass,
    // group count bounded by |sources| × |languages|
    "q100_corpus_report" -> ((s, dir) => {
      TextAnalysis.corpusReport(t(s, dir, "documents"), "text", "source")
        .orderBy(col("source").asc_nulls_first,
          col("lang_pred").asc_nulls_first)
    }),
    // native one-pass text canonicalization (NFC + control-char strip +
    // whitespace collapse + trim) — the zeroth stage of a web curation
    // cascade, one codegen kernel instead of three regex passes
    "q99_clean_text" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.GraftFunctions.cleanText(col("text"))
            .as("clean_text"))
        .withColumn("clean_len", length(col("clean_text")).cast("long"))
        .orderBy("doc_id")
    }),
    // CCNet-style perplexity bucketing over the q91 scores: tercile cut
    // points (exact percentile, rounded 6 dp, broadcast) split the
    // scored corpus into head / middle / tail — the relative LM gate
    "q97_ppl_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.perplexityBuckets(docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logprob"), 6).as("avg_logprob"), col("bucket"))
        .orderBy("doc_id")
    }),
    // DSIR importance weights: log-likelihood ratio of a target model
    // (src0) vs a raw-pool model (src1) over the remaining 18 sources —
    // one tokenizer pass, two vocabulary-sized count joins
    "q98_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.dsirWeights(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") === "src1"),
        docs.filter(!col("source").isin("src0", "src1")), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("log_weight"), 6).as("log_weight"),
          round(col("avg_log_weight"), 6).as("avg_log_weight"))
        .orderBy("doc_id")
    }),
    // frequency-ranked vocabulary with min-count 2: ids via the
    // two-level ranking (offset over distinct counts + partitioned
    // within-count rank) — equals the oracle's global row_number
    "q92_vocab" -> ((s, dir) => {
      TextAnalysis.buildVocab(t(s, dir, "documents"), "text",
        minCount = 2L)
        .orderBy("token_id")
    }),
    // numericalization under q92's vocabulary: every doc's token-id
    // sequence (position-sorted, OOV → 0) — the trainer-input array the
    // packing (q82/q83) and chunking (q89) stages consume upstream of
    // the tokenizer itself. The id array is serialized with array_join
    // (the q16 precedent) for the driver's pandas comparator.
    "q93_token_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.tokenIds(docs,
        TextAnalysis.buildVocab(docs, "text", minCount = 2L),
        "doc_id", "text")
        .select(col("doc_id"),
          array_join(col("token_ids").cast("array<string>"), ",")
            .as("token_ids"),
          col("n_tokens"))
        .orderBy("doc_id")
    }),
    // BPE training, iteration 0: adjacent character-pair counts over
    // the word-frequency vocabulary — the one corpus-scale pass of
    // tokenizer training; everything after it is vocab-sized
    "q103_bpe_pairs" -> ((s, dir) => {
      Bpe.initialPairStats(t(s, dir, "documents"), "text")
        .orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
    }),
    // the learned BPE merge table (8 merges): driver loop over the
    // vocabulary table only; argmax ties break on the pair ascending so
    // the table is partitioning-invariant. The loop isn't SQL, but its
    // OUTPUT is: the oracle replays each step's argmax over the
    // vocabulary rewritten by the prior merges fixed as literals;
    // exact merges also hand-verified in BpeSpec
    "q104_bpe_merges" -> ((s, dir) => {
      Bpe.learnMerges(t(s, dir, "documents"), "text", numMerges = 8)
        .orderBy("merge_rank")
    }),
    // BPE encoding of the corpus vocabulary with a FIXED merge table
    // (rank order (a,n) (s,c) (sc,an) (e,r) — merge 3 consumes the
    // products of merges 1-2, exercising merged-symbol reuse). Fixed
    // merges make the kernel value-checkable in SQL; composing with the
    // LEARNED table is BpeSpec's job (iterative argmax isn't
    // SQL-expressible). Pieces serialized — the array-column trap
    "q106_bpe_encode" -> ((s, dir) => {
      Bpe.encodeWords(t(s, dir, "documents"), "text", BpeFixedMerges)
        .select(col("word"), col("freq"),
          array_join(col("pieces"), " ").as("pieces"), col("n_pieces"))
        .orderBy("word")
    }),
    // unigram-LM (SentencePiece) segmentation under a FIXED piece
    // table (the q106 fixed-vocabulary convention): the native Viterbi
    // kernel's best split, tie-broken (score, fewer pieces, longer
    // final piece) — the oracle replays the whole DP as a list_reduce
    // over positions and backtraces through the same cells. Composing
    // with the EM-LEARNED table is UnigramSpec's job
    "q168_unigram_segment" -> ((s, dir) => {
      graft.operators.Unigram
        .segmentWords(t(s, dir, "documents"), "text", UnigramFixedPieces)
        .select(col("word"), col("freq"),
          array_join(col("pieces"), " ").as("pieces"), col("n_pieces"),
          round(col("logprob"), 6).as("logprob"))
        .orderBy("word")
    }),
    // SUBSTRING blocklist screening via ONE Aho–Corasick walk per doc:
    // nested terms ('ar'/'art'/'park' inside spark/part) must all
    // count, including overlaps — K contains() scans or a misrouted
    // suffix link break the sums
    "q170_substring_blocklist" -> ((s, dir) => {
      graft.operators.Scrub.substringBlocklistStats(
        t(s, dir, "documents"), "doc_id", "text", MultiMatchTerms,
        maxHits = 40)
        .orderBy("doc_id")
    }),
    // the rewrite stage the q170 gate fronts: every character covered
    // by any (overlapping, nested) term occurrence masks to '*' in one
    // automaton walk — the oracle recomputes coverage positionally
    "q171_substring_redact" -> ((s, dir) => {
      graft.operators.Scrub.redactSubstrings(
        t(s, dir, "documents"), "doc_id", "text", MultiMatchTerms)
        .select(col("doc_id"), md5(col("clean_text")).as("text_md5"),
          length(col("clean_text")).cast("long").as("n_chars"),
          col("n_masked"))
        .orderBy("doc_id")
    }),
    // per-document token budget under the same fixed table — the "how
    // many tokens is this corpus under tokenizer X" readout (the q109
    // shape with the unigram model instead of BPE)
    "q169_unigram_token_counts" -> ((s, dir) => {
      graft.operators.Unigram.unigramTokenCounts(
        t(s, dir, "documents"), "doc_id", "text", UnigramFixedPieces)
        .orderBy("doc_id")
    }),
    // bigram LM with stupid backoff: counted on src0, scoring every
    // other source; seen bigrams score the conditional MLE, unseen back
    // off to 0.4x the smoothed unigram. Pair-sorted fold — bit-
    // reproducible (the q91 contract, one order of ngram up)
    "q107_bigram_logprob" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.bigramLogProb(docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"),
          round(col("sum_logprob"), 6).as("sum_logprob"),
          round(col("avg_logprob"), 6).as("avg_logprob"))
        .orderBy("doc_id")
    }),
    // cross-source vocabulary overlap from bottom-64 KMV sketches: the
    // corpus collapses to one 64-long sketch per source, every pairwise
    // Jaccard estimate reads sketches only — no corpus join
    "q108_kmv_overlap" -> ((s, dir) => {
      Kmv.kmvCrossJaccard(
        Kmv.vocabSketch(t(s, dir, "documents"), "source", "text", k = 64),
        "source", k = 64)
        .orderBy("group_a", "group_b")
    }),
    // corpus token budget under the q106 tokenizer: per-doc BPE token
    // counts via the vocabulary join — the merge fold never touches the
    // corpus, only distinct words
    "q109_bpe_token_counts" -> ((s, dir) => {
      Bpe.bpeTokenCounts(t(s, dir, "documents"), "doc_id", "text",
        BpeFixedMerges)
        .orderBy("doc_id")
    }),
    // Gopher §A1.1 document rules, published thresholds — per-rule
    // verdicts + conjunction, one scan, zero shuffle
    "q114_gopher_rules" -> ((s, dir) => {
      TextAnalysis.gopherRules(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),
    // C4 line-level cleaning (Raffel et al. §2.2) over a deterministic
    // page rendering of the fixture: every 8th word boundary becomes a
    // sentence end + line break (the fixture has no native line
    // structure — the SAME regex renders the page on both engines), and
    // the line-drop token is the fixture word "slow" so the published
    // javascript rule fires on real rows (~23% of 8-word lines). Short
    // docs (< 3 surviving sentences) fail the page gate — real per-doc
    // verdict variation, not a degenerate all-pass
    "q118_c4_clean" -> ((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "((?:[a-z]+ ){7}[a-z]+)( |$)", "$1.\n")
          .as("page"))
      Scrub.c4Clean(pages, "doc_id", "page", lineDropToken = "slow")
        .withColumnRenamed("text_clean", "page_clean")
        .orderBy("doc_id")
    }),

    // SQL-text registry gates (the q55 pattern) for the remaining
    // native kernels: the Spark side is spark.sql(...) through the
    // function registry, hash-gated by the SAME oracles as the Column-
    // API queries (q101/q54/q99)
    "q123_sql_native_winnow" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id, fingerprint FROM (
          |  SELECT doc_id,
          |    explode_outer(graft_winnow(concat_ws(' ',
          |      filter(split(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '),
          |        '\\s+'), x -> x != '')), 5, 4)) AS fingerprint
          |  FROM documents_v WHERE doc_id IS NOT NULL)
          |WHERE fingerprint IS NOT NULL
          |ORDER BY doc_id, fingerprint""".stripMargin)
    }),
    "q124_sql_native_char_ngrams" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      // sort INSIDE, kernel OUTSIDE (the q54 docsSorted shape): a global
      // sort above the kernel would run it twice — once for the range
      // partitioner's sampling pass, once for the sort itself
      s.sql(
        """SELECT doc_id, CAST(size(sh) AS BIGINT) AS n_shingles,
          |  md5(array_join(array_sort(sh), '|')) AS shingle_md5
          |FROM (
          |  SELECT doc_id, graft_char_ngrams(concat_ws(' ',
          |    filter(split(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '),
          |      '\\s+'), x -> x != '')), 5) AS sh
          |  FROM (SELECT doc_id, text FROM documents_v ORDER BY doc_id)
          |  WHERE lower(text) RLIKE '[a-z0-9]')""".stripMargin)
    }),
    "q125_sql_native_clean_text" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id, graft_clean_text(text) AS clean_text,
          |  CAST(length(graft_clean_text(text)) AS BIGINT) AS clean_len
          |FROM documents_v ORDER BY doc_id""".stripMargin)
    }),

    // token-budget selection: the greedy (quality DESC, id) prefix of
    // the corpus that fills a 12k-token budget with whole documents —
    // value-keyed cumulative table + one boundary-group window, never
    // a corpus-wide window (the single-partition cumsum trap)
    "q127_token_budget" -> ((s, dir) => {
      TextAnalysis.tokenBudgetSelect(t(s, dir, "documents"),
        "doc_id", "text", budgetTokens = 12000L)
        .orderBy("doc_id")
    }),

    // SQL-text registry gates for the last four native kernels
    // (the q123–q125 pattern): the Spark side goes parser → analyzer →
    // registry-registered kernel, hash-gated by the same oracle family
    // as the Column-API twin.
    "q129_sql_native_word_ngrams" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      // sort INSIDE, kernel OUTSIDE (the q124 docsSorted shape): a
      // global sort above the kernel would run it twice — once for the
      // range partitioner's sampling pass, once for the sort itself.
      // DELIBERATE FRAGILITY, pinned at Spark 4.1: the output order
      // relies on the subquery's ORDER BY surviving optimization, which
      // Spark preserves today but does not contractually guarantee. A
      // top-level ORDER BY was tried (round 10) and made it WORSE:
      // EliminateSorts keeps the OUTER sort and removes the inner one,
      // putting the kernel below the range shuffle — kernel ×2 at
      // scale. If a version bump unsorts this, the driver comparator
      // (tools/compare.py) row-sorts before hashing so the GATE stays
      // green; re-pin by re-checking the executed plan's Sort position.
      s.sql(
        """SELECT doc_id, CAST(size(ng) AS BIGINT) AS n_ngrams,
          |  md5(array_join(array_sort(ng), '|')) AS ngram_md5
          |FROM (
          |  SELECT doc_id, array_distinct(graft_word_ngrams(
          |    filter(split(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '),
          |      '\\s+'), x -> x != ''), 3)) AS ng
          |  FROM (SELECT doc_id, text FROM documents_v ORDER BY doc_id)
          |  WHERE lower(text) RLIKE '[a-z0-9]')""".stripMargin)
    }),
    // q31's signature table through SQL text: the tokenize → md5-hash →
    // native k-permutation kernel chain as nested subqueries (Catalyst
    // collapses them exactly like the Column API's .select chain), outer
    // posexplode_outer so no inferred size()>0 filter re-runs the chain
    // in the scan
    "q130_sql_native_minhash" -> ((s, dir) => {
      GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql(
        """SELECT doc_id, CAST(perm AS BIGINT) AS perm, min_hash FROM (
          |  SELECT doc_id,
          |    posexplode_outer(graft_minhash_sig(hashes, 8)) AS (perm, min_hash)
          |  FROM (
          |    SELECT doc_id, transform(tokens,
          |      t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)
          |        % 2147483629) AS hashes
          |    FROM (
          |      SELECT doc_id, array_distinct(graft_word_ngrams(
          |        filter(split(regexp_replace(lower(text), '[^a-z0-9\\s]', ' '),
          |          '\\s+'), x -> x != ''), 3)) AS tokens
          |      FROM documents_v
          |      WHERE lower(text) RLIKE '[a-z0-9]')))
          |ORDER BY doc_id, perm""".stripMargin)
    }),

    // Okapi BM25 retrieval over the doc_id < 120 corpus slice, queried
    // by three of its own docs: every (query, matching doc) score
    // replayed by the oracle through the identical idf /
    // tf-normalization arithmetic (explicit exact-sum avgdl, the
    // CAST-as-DOUBLE ulp conventions) and the same term-sorted double
    // fold — a drift in df, dl, idf form, or fold order breaks rows
    "q179_bm25_scores" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").where(col("doc_id") < 120)
      val qs = corpus.where(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("text"))
      // tf materialized (the indexed operator's consumption contract:
      // referenced 3x with DIFFERENT column prunings, so no exchange
      // reuse — at ingest it's the persisted word-bucketed table)
      val tf = graft.operators.Retrieval
        .termFrequencies(corpus, "doc_id", "text").localCheckpoint()
      graft.operators.Retrieval.bm25ScoresIndexed(tf,
        qs, "query_id", "text")
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"))
        .orderBy("query_id", "doc_id")
    }),
    // Hybrid retrieval via reciprocal-rank fusion: the q179 BM25
    // top-10 fused with an exact-Jaccard top-10 over the same
    // (query, corpus) pairs — two incomparable score scales combined
    // by RANK only. Every fused score is a sum of exact 1/(60+r)
    // rationals (no transcendentals), so the oracle's replay agrees
    // bitwise and the 9-dp rounding is cosmetic.
    "q181_rrf_fusion" -> ((s, dir) => {
      import graft.operators.{Jaccard, Retrieval}
      val corpus = t(s, dir, "documents").where(col("doc_id") < 120)
      val qs = corpus.where(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"), col("text"))
      val tf = Retrieval.termFrequencies(corpus, "doc_id", "text")
        .localCheckpoint() // see q179
      val bm25 = Retrieval.bm25TopK(
        Retrieval.bm25ScoresIndexed(tf, qs, "query_id", "text"), 10)
        .select("queryId", "docId", "rank")
      val corpusToks = Jaccard.tokenized(
        corpus.select(col("doc_id").as("docId"), col("text")))
        .localCheckpoint() // thresholdMatches' consumption contract
      val jac = Jaccard.thresholdMatches(
        Jaccard.tokenized(qs.select(col("query_id").as("docId"),
          col("text"))),
        Jaccard.dfOrderedSets(corpusToks), 0.3)
      val jacRank = jac.withColumn("rank", row_number().over(
          Window.partitionBy(col("docId"))
            .orderBy(col("similarity").desc, col("matchId").asc)))
        .filter(col("rank") <= 10)
        .select(col("docId").as("queryId"), col("matchId").as("docId"),
          col("rank"))
      Retrieval.rrfFuse(Seq(bm25, jacRank), k = 10)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("rrf_score"), 9).as("rrf_score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // ...and the retrieval shape over the FULL corpus: SHORT queries
    // (each query doc's first 40 chars — keyword-sized, the shape BM25
    // retrieval actually serves; whole-doc queries are q179's scoring
    // shape and scale like similarity search), top-5 per query, ranked
    // score descending with docId ascending ties — bm25TopK's
    // deterministic full-precision ordering (rounding happens only in
    // the emitted score column)
    "q180_bm25_topk" -> ((s, dir) => {
      val ix = docsIndexFixture(s, dir) // the persisted-layout probe
      val (tf, qs) = (ix.tf, ix.qs)
      graft.operators.Retrieval.bm25TopK(
        graft.operators.Retrieval.bm25ScoresIndexed(tf,
          qs, "query_id", "text"), 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // WAND-style SCORE-EXACT pruned top-k over the shared Zipf fixture
    // (the documents vocabulary is df-flat — no rare/hot structure for
    // the bound to act on; the Zipf corpus is the df shape retrieval
    // actually faces). The ORACLE IS THE UNPRUNED RANKING — equality
    // proves the per-term upper bound and the candidate restriction
    // lose no true top-k row. Queries mix 4 head-biased draws with 2
    // rare-tail draws; the hot cut is DERIVED (N/10 — an absolute cut
    // calibrated at one SF degenerates at another: 50 split the terms
    // at sf0.01 but made every term hot at sf0.1, sending all 100
    // queries through the fallback — measured 7.1 s vs 2.5 s warm).
    // Every (250k+50)-id query is deliberately HOT-ONLY and must come back
    // through the exact fallback — both decision branches are inside
    // the gate at any SF.
    "q182_bm25_wand_topk" -> ((s, dir) => {
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      graft.operators.Retrieval.bm25TopKWand(tf, qs, "query_id", "text",
        k = 5, hotDf = hotCut)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // ...and the WAND decision table ITSELF (the q173 convention: gate
    // the pruning math, not just the answer): per query the rare/hot
    // term split, the candidate-set size, the hot-only bound ub, the
    // kth candidate score theta, and the safe/fallback routing — a
    // bound-formula or candidate-set drift fails HERE even when q182's
    // final top-k happens to survive it
    "q187_bm25_wand_stats" -> ((s, dir) => {
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      graft.operators.Retrieval.bm25WandStats(tf, qs, "query_id", "text",
        k = 5, hotDf = hotCut)
        .select(col("queryId").as("query_id"),
          col("n_rare_terms"), col("n_hot_terms"), col("n_candidates"),
          round(col("ub"), 6).as("ub"),
          round(col("theta"), 6).as("theta"), col("safe"))
        .orderBy("query_id")
    }),
    // BM25 incremental index compaction (the q178 pattern on the
    // retrieval side): src0 arrives as a micro-batch into the persisted
    // (tf, df, stats) triple; q180's probe through the COMPACTED tables
    // must equal the DuckDB replay over the FULL corpus rebuild — a
    // drift in the tf append, the additive df merge, or the exact
    // scalar sums shifts idf/avgdl and breaks score rows
    "q183_bm25_compact_index" -> ((s, dir) => {
      import graft.operators.Retrieval
      val docs = t(s, dir, "documents")
      // persisted-state stand-ins (the operator's consumption contract:
      // tf0 referenced 3x building the triple, batchTf 3x merging it)
      val tf0 = Retrieval.termFrequencies(
        docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .localCheckpoint()
      val (tfM, dfM, stM) = Retrieval.compactTermIndex(tf0,
        Retrieval.dfTable(tf0), Retrieval.corpusStats(tf0),
        Retrieval.termFrequencies(
          docs.filter(col("source") === "src0"), "doc_id", "text")
          .localCheckpoint())
      val qs = docs.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"))
      Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tfM, dfM, stM,
          qs, "query_id", "text"), 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // ...and the deletion side (q184's retrieval mirror): take the
    // src0 docs OUT of the full-corpus triple; q180's probe through
    // the DELETED triple must equal the replay over the survivor
    // rebuild — a leaked tf row, a df under/over-subtraction, or a
    // drifted scalar shifts idf/avgdl and breaks score rows
    "q186_bm25_compact_deleted" -> ((s, dir) => {
      import graft.operators.Retrieval
      // base triple from the persisted-layout fixture (tf referenced
      // 4x: anti, semi, df, stats); the DELETE batch stays in-gate —
      // the compaction is the claim under test
      val ix = docsIndexFixture(s, dir)
      val (docs, tf0, qs) = (ix.docs, ix.tf, ix.qs)
      val delIds = docs.filter(col("source") === "src0")
        .select(col("doc_id").as("docId")).localCheckpoint()
      val (tfD, dfD, stD) = Retrieval.compactTermIndexDeleted(tf0,
        ix.dfT, ix.st, delIds)
      Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tfD, dfD, stD,
          qs, "query_id", "text"), 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // champion-list MAINTENANCE (the q183/q186 pattern for the one
    // layout that was rebuild-only): base champion tier (m = 3), the
    // src0 batch appended through the max-merge, then doc_id % 11
    // deleted through the affected-term recompute — probe scores
    // through the twice-compacted layout must equal the replay over a
    // champion tier REBUILT from the survivor corpus (the oracle
    // never sees a merge or a delete). A refill miss (deleted member
    // not replaced from outside the pruned layout), an unaffected
    // list touched, or a leaked deleted row all shift the kept set
    "q225_champion_compact" -> ((s, dir) => {
      import graft.operators.Retrieval
      val docs = t(s, dir, "documents")
      val tf0 = Retrieval.termFrequencies(
        docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .localCheckpoint()
      val batchTf = Retrieval.termFrequencies(
        docs.filter(col("source") === "src0"), "doc_id", "text")
        .localCheckpoint()
      val (tfM, dfM, stM) = Retrieval.compactTermIndex(tf0,
        Retrieval.dfTable(tf0), Retrieval.corpusStats(tf0), batchTf)
      val champM = Retrieval.compactChampionPostings(
        Retrieval.championPostings(tf0, m = 3).localCheckpoint(),
        batchTf, m = 3).localCheckpoint()
      val delIds = docs.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id").as("docId")).localCheckpoint()
      val tfMck = tfM.localCheckpoint() // consumed 5x (triple + champ)
      val (_, dfD, stD) = Retrieval.compactTermIndexDeleted(tfMck,
        dfM.localCheckpoint(), stM.localCheckpoint(), delIds)
      val champD = Retrieval.compactChampionPostingsDeleted(champM,
        tfMck, delIds, m = 3)
      val qs = docs.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"))
      Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(champD, dfD, stD,
          qs, "query_id", "text"), 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // Exact phrase containment over the positional posting layout:
    // each query phrase is words 2..4 of its own doc (self-match
    // guaranteed; the fixture's flat vocabulary guarantees
    // cross-document and overlapping matches too). The oracle replays
    // positions + the aligned-start aggregate from first principles —
    // an off-by-one in the position stream, the start alignment, or
    // the all-offsets-matched test breaks occurrence counts
    "q188_phrase_matches" -> ((s, dir) => {
      import graft.operators.Retrieval
      val docs = t(s, dir, "documents")
      val posts = docsPostingsFixture(s, dir) // the persisted layout at ingest
      val qs = docs.where(col("doc_id") % 101 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ",
            slice(TextFunctions.normalizedWords(col("text")), 2, 3))
            .as("text"))
      Retrieval.phraseMatches(posts, qs, "query_id", "text")
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          col("n_occurrences"))
        .orderBy("query_id", "doc_id")
    }),
    // positional-index compaction (q183's pattern on the phrase
    // layout): src0's positional rows arrive as a micro-batch into the
    // persisted table; the phrase probe through the COMPACTED layout
    // must equal the replay over the FULL corpus — a leaked/dropped
    // position row shifts occurrence counts or anchor choices
    "q193_pos_compact_index" -> ((s, dir) => {
      import graft.operators.Retrieval
      val docs = t(s, dir, "documents")
      val posts0 = Retrieval.positionalPostings(
        docs.filter(col("source") =!= "src0"), "doc_id", "text")
        .localCheckpoint() // the persisted layout stand-in
      val postsM = Retrieval.compactPositionalIndex(posts0,
        Retrieval.positionalPostings(
          docs.filter(col("source") === "src0"), "doc_id", "text"))
      val qs = docs.where(col("doc_id") % 101 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ",
            slice(TextFunctions.normalizedWords(col("text")), 2, 3))
            .as("text"))
      Retrieval.phraseMatches(postsM, qs, "query_id", "text")
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          col("n_occurrences"))
        .orderBy("query_id", "doc_id")
    }),
    // ...and the deletion side: src0's rows leave the persisted table
    // by anti-join; the probe (phrases still drawn from the FULL doc
    // set — deleting an indexed doc must not delete its queries) must
    // equal the survivor replay
    "q194_pos_compact_deleted" -> ((s, dir) => {
      import graft.operators.Retrieval
      val docs = t(s, dir, "documents")
      val posts0 = docsPostingsFixture(s, dir) // base layout; the
      // delete batch below is the claim under test
      val postsD = Retrieval.compactPositionalIndexDeleted(posts0,
        docs.filter(col("source") === "src0")
          .select(col("doc_id").as("docId")))
      val qs = docs.where(col("doc_id") % 101 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ",
            slice(TextFunctions.normalizedWords(col("text")), 2, 3))
            .as("text"))
      Retrieval.phraseMatches(postsD, qs, "query_id", "text")
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          col("n_occurrences"))
        .orderBy("query_id", "doc_id")
    }),
    // phrase-constrained retrieval: `"exact phrase"` + BM25 rank in
    // one operator — candidates from the rarest-term-anchored phrase
    // probe, scored WITHIN candidates through the forward layout.
    // The oracle replays BOTH halves (q188's positional containment ×
    // q180's scoring chain) and semi-joins them — a drift in either
    // half, or in the candidate restriction, breaks rows
    "q195_bm25_phrase_topk" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (docs, tf, dfT, st) = (ix.docs, ix.tf, ix.dfT, ix.st)
      val posts = docsPostingsFixture(s, dir)
      val qs = docs.where(col("doc_id") % 101 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ",
            slice(TextFunctions.normalizedWords(col("text")), 2, 3))
            .as("text"))
      Retrieval.bm25TopKPhrase(tf, dfT, st, posts, qs,
        "query_id", "text", k = 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // proximity (sloppy-phrase) matching: the q188 phrases (restricted
    // to full 3-term slices) matched IN ORDER within a window of
    // n + slop = 5, with the MINIMAL window per (query, doc). The
    // operator runs the banded greedy-latest chain; the oracle
    // enumerates qualifying position tuples from FIRST PRINCIPLES
    // (a 3-way ordered self-join with the window cap) and takes the
    // min — two independent formulations of the same semantics
    "q196_proximity_matches" -> ((s, dir) => {
      import graft.operators.Retrieval
      val docs = t(s, dir, "documents")
      val posts = docsPostingsFixture(s, dir)
      val qs = docs.where(col("doc_id") % 101 === 0 &&
        size(TextFunctions.normalizedWords(col("text"))) >= 4)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ",
            slice(TextFunctions.normalizedWords(col("text")), 2, 3))
            .as("text"))
      Retrieval.proximityMatches(posts, qs, "query_id", "text", slop = 2)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          col("min_window"))
        .orderBy("query_id", "doc_id")
    }),
    // RM3 pseudo-relevance feedback: the expansion WEIGHT TABLE itself
    // (k=10 feedback docs, m=10 expansion terms, λ=0.5) — every
    // feedback mass, truncation rank, renormalization, and
    // interpolation replayed; a drift in any Σ's fold order, the
    // top-m tie-break, or the λ mix breaks weight rows
    "q189_rm3_expansion" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (tf, dfT, st, qs) = (ix.tf, ix.dfT, ix.st, ix.qs)
      Retrieval.rm3ExpandedTerms(tf, dfT, st, qs, "query_id", "text",
        k = 10, m = 10, lambda = 0.5)
        .select(col("queryId").as("query_id"), col("word"),
          round(col("weight"), 6).as("weight"))
        .orderBy("query_id", "word")
    }),
    // ...and the second-pass retrieval through the expanded weights
    // (the full RM3 composition: score → feedback → expand → rescore)
    "q190_rm3_rescore" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (tf, dfT, st, qs) = (ix.tf, ix.dfT, ix.st, ix.qs)
      val exp = Retrieval.rm3ExpandedTerms(tf, dfT, st, qs,
        "query_id", "text", k = 10, m = 10, lambda = 0.5)
        .localCheckpoint() // result-sized probe boundary
      Retrieval.bm25TopK(
        Retrieval.bm25ScoresWeighted(tf, dfT, st, exp), 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // best-window snippet extraction (the RAG retrieve→rank→snippet
    // tail): q180's retrieval (short queries, BM25 top-5) then the
    // width-8 window covering the most distinct query terms per kept
    // (query, doc), ties leftmost — candidate starts are exactly the
    // query-term occurrences, counted through a RANGE frame; the
    // oracle counts every banded window from first principles
    "q198_snippet_windows" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (tf, qs) = (ix.tf, ix.qs)
      val posts = docsPostingsFixture(s, dir)
      val top5 = Retrieval.bm25TopK(
        Retrieval.bm25ScoresIndexed(tf, qs, "query_id", "text"), 5)
        .select(col("queryId"), col("docId"))
        .localCheckpoint() // result-sized restriction
      Retrieval.snippetWindows(posts, qs, "query_id", "text",
        width = 8, pairs = Some(top5))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          col("window_start"), col("n_matched_terms"))
        .orderBy("query_id", "doc_id")
    }),
    // ...and the snippet TEXT itself (q198 + the documented slice
    // fetch as an operator): the best window's normalized words
    // re-joined, broadcast-joined back to the corpus — the oracle
    // replays the window AND the list_slice verbatim
    "q230_snippet_texts" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (docs, tf, qs) = (ix.docs, ix.tf, ix.qs)
      val posts = docsPostingsFixture(s, dir)
      val top5 = Retrieval.bm25TopK(
        Retrieval.bm25ScoresIndexed(tf, qs, "query_id", "text"), 5)
        .select(col("queryId"), col("docId"))
        .localCheckpoint() // result-sized restriction
      val wins = Retrieval.snippetWindows(posts, qs, "query_id", "text",
        width = 8, pairs = Some(top5))
        .localCheckpoint() // result-sized, consumed by the text fetch
      Retrieval.snippetTexts(docs, "doc_id", "text", wins, width = 8)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          col("window_start"), col("n_matched_terms"), col("snippet"))
        .orderBy("query_id", "doc_id")
    }),
    // query-likelihood retrieval with Dirichlet smoothing (Zhai &
    // Lafferty) — the second classical ranker over the SAME persisted
    // layouts: matching-postings sum + the closed-form length
    // normalizer, |q| over corpus-present terms, top-5
    "q199_ql_dirichlet_topk" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (tf, cfT, st, qs) = (ix.tf, ix.cfT, ix.st, ix.qs)
      Retrieval.bm25TopK(
        Retrieval.qlDirichletScores(tf, cfT, st, qs,
          "query_id", "text"), 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // passage-level retrieval with MaxP evidence (Callan'94 / Dai &
    // Callan): docs segment into width-32 stride-16 token windows,
    // the PASSAGES score as pseudo-docs (passage-level dl/df/avgdl —
    // the passage collection IS the corpus), and each doc ranks by
    // its best passage. The oracle replays the segmentation (window
    // arithmetic included), the passage scoring chain, and the max
    "q203_passage_maxp_topk" -> ((s, dir) => {
      import graft.operators.Passages
      // r18 re-shape: the probe runs THROUGH the persisted passage
      // layout; scores bitwise unchanged, so the oracle is untouched.
      // q235 gates the layout's append/delete lifecycle against this
      // same replay. r19: the layout comes from the memoized
      // passageLayoutFixture (built once, shared with q245/q246) —
      // the gate measures the serving probe, the build is ingest-time
      // state exactly as the operator scaladoc claims
      val (layout, qs, _) = passageLayoutFixture(s, dir)
      Passages.maxPassageTopK(layout, qs, "query_id", "text", k = 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // the passage-index LIFECYCLE (the q183/q186 convention for the
    // passage layout): build on half the corpus + phantom docs,
    // append the other half, delete the phantoms — the final layout
    // must probe indistinguishably from a fresh build over the full
    // corpus, so the oracle is q203's fresh-build replay VERBATIM
    "q235_passage_index_lifecycle" -> ((s, dir) => {
      import graft.operators.Passages
      val docs = t(s, dir, "documents")
      val phantom = docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
      val half0 = docs.where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text")).unionByName(phantom)
      val half1 = docs.where(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("text"))
      // materialization discipline (measured on this tiny-but-deep
      // plan — the fixture is 500 docs at every SF): each corpus half
      // segments and tf-aggregates ONCE (the q203 checkpoint shape —
      // the merge chains for tf/df/stats/membership all reuse the two
      // checkpoints), and the DELETE stage's twice-read inputs (tf
      // semi+anti, membership resolve+anti) checkpoint; blanket
      // checkpointing all 12 stage tables measured 25.7 s of pure job
      // overhead, fully-lazy chains 17.6 s of re-segmentation
      def buildCk(d: org.apache.spark.sql.DataFrame)
          : graft.operators.Passages.PassageLayout = {
        import graft.operators.{Chunking, Retrieval}
        val pass = Chunking.tokenPassages(d, "doc_id", "text", 32, 16)
          .localCheckpoint()
        val tf = Retrieval.termFrequencies(pass, "passageId", "text")
          .localCheckpoint()
        Passages.PassageLayout(tf, Retrieval.dfTable(tf),
          Retrieval.corpusStats(tf), pass.select("passageId", "docId"))
      }
      val appended0 = Passages.compactPassageIndex(buildCk(half0),
        buildCk(half1), assertDisjoint = false)
      val appended = appended0.copy(
        tf = appended0.tf.localCheckpoint(),
        membership = appended0.membership.localCheckpoint())
      val fin = Passages.compactPassageIndexDeleted(appended,
        phantom.select(col("doc_id").as("docId")))
      val qs = docs.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"))
      Passages.maxPassageTopK(fin, qs, "query_id", "text", k = 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // SCORE-EXACT passage WAND (closing the r18 residue where the
    // fast passage probe was the score-CHANGING maxDocFrequency cap):
    // the pruned MaxP top-k through the persisted layout + its
    // forward/impact pruning tables must be BITWISE the unpruned MaxP
    // replay — the oracle is q203's fresh-build replay VERBATIM, so
    // the gate is the passage score-exactness claim itself
    "q245_passage_wand_topk" -> ((s, dir) => {
      import graft.operators.Passages
      // the q203 probe through the same memoized layout, WAND-pruned
      // — score-exact, so the oracle is the fresh-build MaxP replay
      val (layout, qs, hotCut) = passageLayoutFixture(s, dir)
      Passages.maxPassageTopKWand(layout, qs, "query_id", "text",
        k = 5, hotDf = hotCut)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // ...and the MaxP decision table (the q205/q240 convention): the
    // oracle recomputes the per-word passage-level (max_tf, min_dl)
    // extremes, the impact-tightened word-sorted ceiling fold
    // ×(1+1e-9), candidate (query, passage) pairs from the rare
    // postings, θ as the kth DOCUMENT-level max among candidates (the
    // doc-level routing cutoff the safety proof needs), and the
    // routing predicate verbatim
    "q246_passage_wand_stats" -> ((s, dir) => {
      import graft.operators.Passages
      val (layout, qs, hotCut) = passageLayoutFixture(s, dir)
      Passages.maxPassageWandStats(layout, qs, "query_id", "text",
        k = 5, hotDf = hotCut)
        .select(col("queryId").as("query_id"),
          col("n_rare_terms"), col("n_hot_terms"), col("n_candidates"),
          round(col("ub"), 6).as("ub"),
          round(col("theta"), 6).as("theta"), col("safe"))
        .orderBy("query_id")
    }),
    // BM25F fielded retrieval: fields (title = the doc's first 40
    // chars, body = the remainder) combine into ONE pseudo term
    // frequency BEFORE saturation — the Robertson/Zaragoza/Taylor
    // form; title weighted 2.0 with gentler length normalization
    // (b = 0.5). The oracle rebuilds the fielded corpus and replays
    // per-field lengths, the field-sorted pseudo-tf fold,
    // document-level idf, and the word-sorted score fold
    "q202_bm25f_topk" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (ftf, fs, ds, dfF) = docsFieldedFixture(s, dir)
      val qs = docsIndexFixture(s, dir).qs
      Retrieval.bm25TopK(
        Retrieval.bm25fScores(ftf,
          Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75)),
          qs, "query_id", "text", fStats = Some((fs, ds, dfF))), 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // conjunctive (match-ALL-terms) retrieval — the boolean-AND query
    // mode: candidates are the posting intersection (count of matched
    // distinct terms == |q|, absent terms fail the conjunction),
    // scored within candidates through the forward fetch
    "q200_bm25_conjunctive_topk" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (tf, dfT, st, qs) = (ix.tf, ix.dfT, ix.st, ix.qs)
      Retrieval.bm25TopKConjunctive(tf, dfT, st, qs,
        "query_id", "text", k = 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // normalized linear score fusion (rrfFuse's score-aware sibling):
    // BM25 top-10 and QL-Dirichlet top-10 min-max normalized per
    // query, fused 0.7/0.3 — both component chains AND the
    // normalization/fold replay in one oracle
    "q201_linear_fusion" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (tf, dfT, cfT, st, qs) = (ix.tf, ix.dfT, ix.cfT, ix.st, ix.qs)
      val bm = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
          "query_id", "text"), 10)
        .select("queryId", "docId", "score")
      val ql = Retrieval.bm25TopK(
        Retrieval.qlDirichletScores(tf, cfT, st, qs,
          "query_id", "text"), 10)
        .select("queryId", "docId", "score")
      Retrieval.linearFuse(Seq((bm, 0.7), (ql, 0.3)), k = 10)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("fused_score"), 9).as("fused_score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // the retrieval-quality readout (q94's ann_recall pattern on the
    // lexical side): recall@5 of the SCORE-CHANGING stop-term prune
    // (maxDocFrequency = the WAND hot cut) against the exact ranking,
    // per query — what the pruning knob actually costs in result
    // quality, not just wall-clock. The hot-only query slice drops to
    // recall 0 (every term pruned), tail-anchored queries stay high —
    // the table IS the knob's quality curve over the fixture
    "q197_bm25_pruned_recall" -> ((s, dir) => {
      import graft.operators.{Knn, Retrieval}
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      def top5(maxDf: Option[Long]) = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
          "query_id", "text", maxDocFrequency = maxDf), 5)
        .select(col("queryId").as("query_id"),
          col("docId").as("neighbor_id"))
      Knn.recallAtK(top5(Some(hotCut)), top5(None))
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          round(col("recall"), 6).as("recall"))
        .orderBy("query_id")
    }),
    // the full RM3 composition through the SCORE-EXACT WAND plans at
    // BOTH passes, over the Zipf fixture: the first pass (feedback
    // selection) routes through bm25TopKWand, the weighted second
    // pass through bm25TopKWandWeighted — while the oracle replays
    // the canonical UNPRUNED composition. Bitwise equality is the
    // exactness proof for the weighted bound
    "q191_rm3_wand_rescore" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      val exp = Retrieval.rm3ExpandedTerms(tf, dfT, st, qs,
        "query_id", "text", k = 10, m = 10, lambda = 0.5,
        wandHotDf = Some(hotCut))
        .localCheckpoint() // result-sized probe boundary
      Retrieval.bm25TopKWandWeighted(tf, exp, k = 5, hotDf = hotCut,
        dfStats = Some((dfT, st)))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // ...and the WEIGHTED WAND decision table itself (the q187
    // convention on the weighted operator): rare/hot split of the
    // EXPANDED term table, candidate counts, the weighted hot-only
    // bound ub, theta, and the routing — a weighted-bound drift fails
    // here even when q191's final top-k survives it
    "q192_rm3_wand_stats" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      val exp = Retrieval.rm3ExpandedTerms(tf, dfT, st, qs,
        "query_id", "text", k = 10, m = 10, lambda = 0.5,
        wandHotDf = Some(hotCut))
        .localCheckpoint()
      Retrieval.bm25WandWeightedStats(tf, exp, k = 5, hotDf = hotCut,
        dfStats = Some((dfT, st)))
        .select(col("queryId").as("query_id"),
          col("n_rare_terms"), col("n_hot_terms"), col("n_candidates"),
          round(col("ub"), 6).as("ub"),
          round(col("theta"), 6).as("theta"), col("safe"))
        .orderBy("query_id")
    }),
    // impact-bound (MaxScore / block-max style) TIGHTENED WAND: the
    // same score-exact pruned top-k as q182, with the hot-term ceiling
    // tightened from the tf→∞ saturation limit idf·(k1+1) to the
    // corpus-extremal contribution idf·f(max_tf, min_dl) read off the
    // persisted impactStats metadata. The oracle is STILL the unpruned
    // ranking — equality proves the tightened bound loses no true
    // top-k row either
    "q204_bm25_wand_impact_topk" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      Retrieval.bm25TopKWand(tf, qs, "query_id", "text",
        k = 5, hotDf = hotCut,
        impact = Some(zipfStatsFixture(s, dir)._4))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // ...and the TIGHTENED decision table (the q187 convention): same
    // splits/candidates/theta, but ub folds per-term
    // idf·f(max_tf, min_dl) — the oracle recomputes max_tf/min_dl from
    // first principles and replays the exact contribution tree at the
    // extremes, so a metadata drift or a bound-formula drift fails
    // here even when q204's final top-k survives it
    "q205_bm25_wand_impact_stats" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      Retrieval.bm25WandStats(tf, qs, "query_id", "text",
        k = 5, hotDf = hotCut,
        impact = Some(zipfStatsFixture(s, dir)._4))
        .select(col("queryId").as("query_id"),
          col("n_rare_terms"), col("n_hot_terms"), col("n_candidates"),
          round(col("ub"), 6).as("ub"),
          round(col("theta"), 6).as("theta"), col("safe"))
        .orderBy("query_id")
    }),
    // the trec_eval battery over the Zipf fixture: run = the
    // score-CHANGING stop-term prune's top-5 (q197's setup), qrels =
    // the exact top-10 graded by rank (grade = 11 − rank) — P@5,
    // recall@5, RR, AP@5, and graded nDCG@5 per query, every fold and
    // the ideal re-ranking replayed from first principles. The
    // hot-only query slice returns NOTHING under the prune and must
    // come back all-zeros (the judged-but-empty-run convention)
    "q206_ranking_metrics" -> ((s, dir) => {
      import graft.operators.{IrEval, Retrieval}
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      val run = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
          "query_id", "text", maxDocFrequency = Some(hotCut)), 5)
        .select("queryId", "docId", "rank")
        .localCheckpoint() // result-sized; rankingMetrics' contract
      val qrels = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
          "query_id", "text"), 10)
        .select(col("queryId"), col("docId"),
          (lit(11L) - col("rank")).as("grade"))
        .localCheckpoint() // consumed 3x inside rankingMetrics
      IrEval.rankingMetrics(run, qrels, k = 5)
        .select(col("queryId").as("query_id"), col("n_rel"),
          col("n_ret_rel"),
          round(col("p_at_k"), 6).as("p_at_k"),
          round(col("recall_at_k"), 6).as("recall_at_k"),
          round(col("rr"), 6).as("rr"),
          round(col("ap"), 6).as("ap"),
          round(col("ndcg"), 6).as("ndcg"))
        .orderBy("query_id")
    }),
    // ...and the macro means (the trec_eval "all" line): rr averaged
    // IS MRR, ap averaged IS MAP — one row, queryId-sorted folds
    "q207_ranking_metrics_mean" -> ((s, dir) => {
      import graft.operators.{IrEval, Retrieval}
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      val run = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
          "query_id", "text", maxDocFrequency = Some(hotCut)), 5)
        .select("queryId", "docId", "rank")
        .localCheckpoint()
      val qrels = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
          "query_id", "text"), 10)
        .select(col("queryId"), col("docId"),
          (lit(11L) - col("rank")).as("grade"))
        .localCheckpoint()
      IrEval.meanRankingMetrics(
        IrEval.rankingMetrics(run, qrels, k = 5))
        .select(col("n_queries"),
          round(col("mean_p_at_k"), 6).as("mean_p_at_k"),
          round(col("mean_recall_at_k"), 6).as("mean_recall_at_k"),
          round(col("mrr"), 6).as("mrr"),
          round(col("map"), 6).as("map"),
          round(col("mean_ndcg"), 6).as("mean_ndcg"))
    }),
    // SymSpell fuzzy term matching: every vocabulary word within edit
    // distance 1 of each (deterministically misspelled) query term,
    // ranked dist asc / df desc / word. The operator is the
    // deletion-neighborhood EQUI-join + levenshtein verify; the oracle
    // is a brute-force cross join + levenshtein — two INDEPENDENT
    // formulations of the same semantics, so a completeness hole in
    // the neighborhood join (a missed ed-1 pair) fails rows here
    "q208_fuzzy_term_match" -> ((s, dir) => {
      import graft.operators.{Fuzzy, Retrieval}
      val ix = docsIndexFixture(s, dir)
      val (docs, vocab) = (ix.docs, ix.dfT)
      // the misspelling: word 3 of the doc with its 2nd char dropped
      val qs = docs.where(col("doc_id") % 103 === 0)
        .select(col("doc_id").as("queryId"),
          concat_ws("",
            slice(TextFunctions.normalizedWords(col("text")), 3, 1))
            .as("__w"))
        .filter(length(col("__w")) >= 3)
        .select(col("queryId"),
          concat(col("__w").substr(lit(1), lit(1)),
            col("__w").substr(lit(3), length(col("__w")))).as("word"))
      Fuzzy.fuzzyMatchTerms(vocab, qs)
        .select(col("queryId").as("query_id"), col("word"), col("match"),
          col("df"), col("dist"), col("rank"))
        .orderBy("query_id", "word", "rank")
    }),
    // ...and typo-tolerant retrieval: a 3-word query (words 2..4 of
    // the doc) whose FIRST word is misspelled — OOV terms replaced by
    // their best fuzzy match (df-ranked), in-vocab terms verbatim,
    // then the ordinary scoring chain over the corrected term table.
    // The oracle replays the OOV split, the brute-force best
    // correction, the collision-deduped union, and the scoring tree
    "q209_bm25_fuzzy_topk" -> ((s, dir) => {
      import graft.operators.{Fuzzy, Retrieval}
      val ix = docsIndexFixture(s, dir)
      val (docs, tf, dfT, st) = (ix.docs, ix.tf, ix.dfT, ix.st)
      val ws = TextFunctions.normalizedWords(col("text"))
      val qs = docs.where(col("doc_id") % 101 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws("", slice(ws, 2, 1)).as("__w2"),
          concat_ws("", slice(ws, 3, 1)).as("__w3"),
          concat_ws("", slice(ws, 4, 1)).as("__w4"))
        .filter(length(col("__w2")) >= 3 && length(col("__w4")) > 0)
        .select(col("query_id"), concat_ws(" ",
          concat(col("__w2").substr(lit(1), lit(1)),
            col("__w2").substr(lit(3), length(col("__w2")))),
          col("__w3"), col("__w4")).as("text"))
      Fuzzy.bm25TopKFuzzy(tf, dfT, st, qs, "query_id", "text", k = 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // edit-distance-2 fuzzy matching (the q208 gate one level deeper):
    // the misspelling drops the 2nd AND 4th chars — two deletions —
    // and the delete-<=2 neighborhood join must find every vocabulary
    // word within ed 2, ranked (dist, df desc, word). The oracle is
    // the brute-force query x vocabulary levenshtein cross-join at
    // dist <= 2 — two independent formulations of the same semantics
    "q226_fuzzy_match_ed2" -> ((s, dir) => {
      import graft.operators.{Fuzzy, Retrieval}
      val ix = docsIndexFixture(s, dir)
      val (docs, vocab) = (ix.docs, ix.dfT)
      val qs = docs.where(col("doc_id") % 17 === 0)
        .select(col("doc_id").as("queryId"),
          concat_ws("",
            slice(TextFunctions.normalizedWords(col("text")), 3, 1))
            .as("__w"))
        .filter(length(col("__w")) >= 5)
        .select(col("queryId"),
          concat(col("__w").substr(lit(1), lit(1)),
            col("__w").substr(lit(3), lit(1)),
            col("__w").substr(lit(5), length(col("__w")))).as("word"))
      Fuzzy.fuzzyMatchTerms(vocab, qs, maxEdit = 2)
        .select(col("queryId").as("query_id"), col("word"), col("match"),
          col("df"), col("dist"), col("rank"))
        .orderBy("query_id", "word", "rank")
    }),
    // ...and typo-tolerant retrieval at ed 2: the first query word is
    // DOUBLY misspelled (chars 2 and 4 dropped), so ed-1 correction
    // cannot reach the original — the ed-2 neighborhood restores it
    // (or a closer/hotter neighbor, per the dist-then-df ranking).
    // The oracle replays the OOV split, the brute-force best match at
    // dist <= 2, the deduped union, and the scoring tree
    "q227_bm25_fuzzy_ed2_topk" -> ((s, dir) => {
      import graft.operators.{Fuzzy, Retrieval}
      val ix = docsIndexFixture(s, dir)
      val (docs, tf, dfT, st) = (ix.docs, ix.tf, ix.dfT, ix.st)
      val ws = TextFunctions.normalizedWords(col("text"))
      val qs = docs.where(col("doc_id") % 17 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws("", slice(ws, 2, 1)).as("__w2"),
          concat_ws("", slice(ws, 3, 1)).as("__w3"),
          concat_ws("", slice(ws, 4, 1)).as("__w4"))
        .filter(length(col("__w2")) >= 5 && length(col("__w4")) > 0)
        .select(col("query_id"), concat_ws(" ",
          concat(col("__w2").substr(lit(1), lit(1)),
            col("__w2").substr(lit(3), lit(1)),
            col("__w2").substr(lit(5), length(col("__w2")))),
          col("__w3"), col("__w4")).as("text"))
      // the expanded disjunction serves through SCORE-EXACT weighted
      // WAND (r18: expansion queries are where pruning pays — the
      // oracle is unchanged, the rows bitwise identical); |D| reads
      // off the checkpointed one-row stats, never a corpus pass
      val hotCut = st.select(col("n_docs")).collect()(0).getLong(0) / 10
      Fuzzy.bm25TopKFuzzy(tf, dfT, st, qs, "query_id", "text", k = 5,
        maxEdit = 2, wandHotDf = Some(hotCut),
        impact = Some(docsImpactFixture(s, dir)))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // faceted search: each query's FULL match set (every doc sharing
    // a term — bscores' row set, not a top-k) distributed over the
    // source column, top-3 facet values by matched-doc count. The
    // oracle replays the match set and the count/rank from first
    // principles — a dropped match, a pair-collapse bug, or a
    // tie-break drift moves counts or ranks
    "q210_facet_counts" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (docs, tf, qs) = (ix.docs, ix.tf, ix.qs)
      Retrieval.facetCounts(
        Retrieval.bm25ScoresIndexed(tf, qs, "query_id", "text"),
        docs.select(col("doc_id").as("docId"), col("source")),
        "source", topV = 3)
        .select(col("queryId").as("query_id"), col("facet"),
          col("n_docs"), col("rank"))
        .orderBy("query_id", "rank")
    }),
    // prefix (wildcard) term expansion over the Zipf vocabulary:
    // 'wN' prefixes expand to their df-ranked vocabulary terms, capped
    // at 8 — the Zipf head guarantees the cap BINDS (w1* matches w1,
    // w1x, w1xx, ...), so the rewrite convention is inside the gate.
    // The oracle replays the starts_with scan, the df-desc rank, and
    // the cap from first principles
    "q211_prefix_term_match" -> ((s, dir) => {
      import graft.operators.{Fuzzy, Retrieval}
      val (tf, _, _) = zipfWandFixture(s, dir)
      val vocab = Retrieval.dfTable(tf).localCheckpoint()
      val qs = t(s, dir, "documents").where(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("queryId"),
          concat(lit("w"),
            (pmod(col("doc_id"), lit(9)) + 1).cast("string"))
            .as("prefix"))
      Fuzzy.prefixMatchTerms(vocab, qs, maxExpansions = 8)
        .select(col("queryId").as("query_id"), col("prefix"),
          col("word"), col("df"), col("rank"))
        .orderBy("query_id", "prefix", "rank")
    }),
    // ...and prefix-query retrieval: the capped expansion set scored
    // disjunctively at unit weight through the ordinary chain — the
    // oracle replays expansion + dedup + the exact scoring tree
    "q212_bm25_prefix_topk" -> ((s, dir) => {
      import graft.operators.{Fuzzy, Retrieval}
      val (tf, _, hotCut) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      val qs = t(s, dir, "documents").where(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("queryId"),
          concat(lit("w"),
            (pmod(col("doc_id"), lit(9)) + 1).cast("string"))
            .as("prefix"))
      // served through SCORE-EXACT weighted WAND (r18) — same oracle,
      // same rows; the Zipf head terms are exactly the hot postings
      // the pruned path skips for safe queries
      Fuzzy.bm25TopKPrefix(tf, dfT, st, qs, k = 5, maxExpansions = 8,
        wandHotDf = Some(hotCut),
        impact = Some(zipfStatsFixture(s, dir)._4))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // PMI collocations at document co-occurrence granularity: every
    // distinct-word pair sharing >= 3 documents, with
    // ln(N·c/(df_a·df_b)) over document counts — the oracle replays
    // the distinct (doc, word) table, the exact support prune, the
    // ordered pair join, and the PMI arithmetic from first principles
    "q213_pmi_collocations" -> ((s, dir) => {
      import graft.functions.TextAnalysis
      val docs = t(s, dir, "documents")
      TextAnalysis.pmiCollocations(docs, "doc_id", "text", minCount = 3L)
        .select(col("word_a"), col("word_b"), col("n_both"),
          col("df_a"), col("df_b"), round(col("pmi"), 6).as("pmi"))
        .orderBy("word_a", "word_b")
    }),
    // GloVe-style windowed co-occurrence: every occurrence pair within
    // 4 tokens contributes 1/distance to its unordered word pair; the
    // oracle replays the banded equi-join, the per-distance integer
    // counts, and the d-ascending harmonic fold from first principles
    "q214_windowed_cooc" -> ((s, dir) => {
      import graft.functions.TextAnalysis
      // consumed 2x by the band self-join — the fixture layout is
      // already checkpointed
      val posts = docsPostingsFixture(s, dir)
      TextAnalysis.windowedCooccurrence(posts, window = 4, minCount = 3L)
        .select(col("word_a"), col("word_b"), col("n_events"),
          round(col("cooc"), 6).as("cooc"))
        .orderBy("word_a", "word_b")
    }),
    // CORI resource selection over a 4-shard split: rank SHARDS per
    // query from shard-level metadata alone (per-shard df + token
    // counts) — the routing layer in front of per-shard indexes. The
    // oracle replays the metadata aggregates, the T·I belief, the
    // absent-term prior, and the word-sorted mean from first
    // principles
    "q215_cori_shards" -> ((s, dir) => {
      import graft.operators.{Federation, Retrieval}
      val ix = docsIndexFixture(s, dir)
      val (docs, tf, qs) = (ix.docs, ix.tf, ix.qs)
      val shards = docs.select(col("doc_id").as("docId"),
        pmod(col("doc_id"), lit(4)).as("shard"))
      val sdf = Federation.shardTermStats(tf, shards).localCheckpoint()
      val scw = Federation.shardSizes(tf, shards).localCheckpoint()
      Federation.coriShardScores(sdf, scw, qs, "query_id", "text")
        .select(col("queryId").as("query_id"), col("shard"),
          round(col("score"), 6).as("score"), col("rank"))
        .orderBy("query_id", "rank")
    }),
    // MMR result diversification: BM25 top-10 pool, token-Jaccard
    // similarity matrix, greedy k = 3 selection at λ = 0.7. The
    // oracle UNROLLS the greedy recursion (the fixed-k convention):
    // step-1 argmax, the max-sim-to-selected aggregates, and both
    // marginal-score argmaxes — with (1 − λ) as the operator's exact
    // double constant (toString round-trip), since 1.0 − 0.7 is NOT
    // the literal 0.3 in IEEE doubles
    "q216_mmr_rerank" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (tf, qs) = (ix.tf, ix.qs)
      val pool = Retrieval.bm25TopK(
        Retrieval.bm25ScoresIndexed(tf, qs, "query_id", "text"), 10)
        .select("queryId", "docId", "score")
        .localCheckpoint() // consumed per greedy step
      val sims = Retrieval.poolTokenSims(tf, pool).localCheckpoint()
      Retrieval.mmrRerank(pool, sims, k = 3, lambda = 0.7)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("mmr_score"), 6).as("mmr_score"), col("rank"))
        .orderBy("query_id", "rank")
    }),
    // boolean-NOT retrieval: rank on the positive prefix, exclude
    // every doc containing the query doc's 5th word — the oracle
    // replays the negative posting pull and the anti-join; a leaked
    // excluded doc or an over-broad exclusion breaks rows
    "q217_bm25_not_topk" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (docs, tf, dfT, st) = (ix.docs, ix.tf, ix.dfT, ix.st)
      val qs = docs.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"),
          concat_ws("",
            slice(TextFunctions.normalizedWords(col("text")), 5, 1))
            .as("neg"))
        .filter(length(col("neg")) > 0)
      Retrieval.bm25TopKNot(tf, dfT, st, qs, "query_id", "text",
        "neg", k = 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // paired run comparison with t-statistics: the pruned run (A, the
    // q206 setup) against the exact top-5 run (B) over the SAME
    // graded qrels — per metric, the mean per-query delta and the
    // paired t. The oracle replays BOTH metric chains, the paired
    // differences, and the two-pass mean/variance folds from first
    // principles
    "q218_paired_metrics_ttest" -> ((s, dir) => {
      import graft.operators.{IrEval, Retrieval}
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      val runA = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
          "query_id", "text", maxDocFrequency = Some(hotCut)), 5)
        .select("queryId", "docId", "rank").localCheckpoint()
      val exact = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
          "query_id", "text"), 10).localCheckpoint()
      val runB = exact.filter(col("rank") <= 5)
        .select("queryId", "docId", "rank").localCheckpoint()
      val qrels = exact
        .select(col("queryId"), col("docId"),
          (lit(11L) - col("rank")).as("grade")).localCheckpoint()
      val mA = IrEval.rankingMetrics(runA, qrels, k = 5)
        .localCheckpoint()
      val mB = IrEval.rankingMetrics(runB, qrels, k = 5)
        .localCheckpoint()
      val ms = Seq("p_at_k", "recall_at_k", "rr", "ap", "ndcg")
      IrEval.pairedComparison(mA, mB)
        .select(col("n_queries") +: ms.flatMap(c => Seq(
          round(col(s"d_$c"), 6).as(s"d_$c"),
          round(col(s"t_$c"), 6).as(s"t_$c"))): _*)
    }),
    // LTR feature assembly: per matched (query, doc) pair the lexical
    // feature set off ONE shared posting join — bm25 and ql must come
    // out BITWISE the standalone scorers (the oracle literally joins
    // bscores and qlsc), plus match counts, coverage, dl, and the
    // matched-idf mass replayed from first principles
    "q219_ltr_features" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (tf, dfT, cfT, st, qs) = (ix.tf, ix.dfT, ix.cfT, ix.st, ix.qs)
      Retrieval.ltrFeatures(tf, dfT, cfT, st, qs, "query_id", "text")
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("bm25"), 6).as("bm25"), round(col("ql"), 6).as("ql"),
          col("n_matched"), round(col("coverage"), 6).as("coverage"),
          col("dl"), round(col("sum_idf"), 6).as("sum_idf"))
        .orderBy("query_id", "doc_id")
    }),
    // LTR model APPLICATION (the loop-closing half of q219): a PINNED
    // linear model re-scores the feature table in one projection —
    // score = bias + Σ w_f·x_f left-associated in the model's weight
    // order — and the re-ranked top-5 replays in SQL off the pinned
    // (name, weight) list alone. Training (Ltr.ltrTrainPointwise) is
    // iterative driver-side descent and is spec-gated (LtrSpec trains
    // on qrels, re-ranks, and measures the IrEval delta); the oracle
    // gates the application contract every trained model flows through
    "q228_ltr_rerank" -> ((s, dir) => {
      import graft.operators.{Ltr, Retrieval}
      val ix = docsIndexFixture(s, dir)
      val (tf, dfT, cfT, st, qs) = (ix.tf, ix.dfT, ix.cfT, ix.st, ix.qs)
      val feats = Retrieval.ltrFeatures(tf, dfT, cfT, st, qs,
        "query_id", "text")
      val m = Ltr.LtrModel(Seq("bm25" -> 0.6, "ql" -> 0.05,
        "n_matched" -> 0.3, "coverage" -> 1.5, "dl" -> -0.01,
        "sum_idf" -> 0.2), 0.1)
      Ltr.ltrRerank(feats, m, 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // proximity LTR features riding the positional layout: for every
    // scored (query, doc) pair, the consecutive different-term gap
    // stats (MinDist + mean transition gap + count), LEFT-joined onto
    // the feature table — pairs matching < 2 distinct terms carry
    // NULLs (no proximity signal), and the oracle replays the lag
    // window, the gap filter, and the exact-integer fold
    "q229_ltr_features_prox" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (tf, dfT, cfT, st, qs) = (ix.tf, ix.dfT, ix.cfT, ix.st, ix.qs)
      val posts = docsPostingsFixture(s, dir) // the persisted layout at ingest
      val feats = Retrieval.ltrFeatures(tf, dfT, cfT, st, qs,
        "query_id", "text")
      val prox = Retrieval.proximityFeatures(posts, qs,
        "query_id", "text")
      feats.join(prox, Seq("queryId", "docId"), "left_outer")
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("bm25"), 6).as("bm25"), col("min_dist"),
          round(col("avg_dist"), 6).as("avg_dist"), col("n_gaps"))
        .orderBy("query_id", "doc_id")
    }),
    // the serving-time CASCADE (candidate generation → feature
    // re-rank): exact top-20 candidates, pair-restricted LTR features
    // fetched doc-wise through the forward shape, the pinned linear
    // model's top-5 — the whole production re-ranking chain in one
    // gate, every stage replayed (candidates, the semi-joined feature
    // table, the projection, the rank)
    "q232_cascade_rerank" -> ((s, dir) => {
      import graft.operators.{Ltr, Retrieval}
      val ix = docsIndexFixture(s, dir)
      val (tf, dfT, cfT, st, qs) = (ix.tf, ix.dfT, ix.cfT, ix.st, ix.qs)
      val top20 = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
          "query_id", "text"), 20)
        .select(col("queryId"), col("docId"))
        .localCheckpoint() // result-sized candidates
      val feats = Retrieval.ltrFeaturesForPairs(tf, dfT, cfT, st, qs,
        "query_id", "text", top20)
      val m = Ltr.LtrModel(Seq("bm25" -> 0.6, "ql" -> 0.05,
        "n_matched" -> 0.3, "coverage" -> 1.5, "dl" -> -0.01,
        "sum_idf" -> 0.2), 0.1)
      Ltr.ltrRerank(feats, m, 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // Kendall rank agreement between the pruned and exact top-10
    // runs: concordant/discordant pairs over the common docs and
    // τ = (C − D)/(n(n−1)/2) — the hot-only query slice shares NO
    // docs under the prune and must come back n_common = 0 with a
    // null τ (fully diverged, not "perfect agreement")
    "q220_kendall_tau" -> ((s, dir) => {
      import graft.operators.{IrEval, Retrieval}
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      val runA = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
          "query_id", "text", maxDocFrequency = Some(hotCut)), 10)
        .select("queryId", "docId", "rank").localCheckpoint()
      val runB = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
          "query_id", "text"), 10)
        .select("queryId", "docId", "rank").localCheckpoint()
      IrEval.kendallTau(runA, runB)
        .select(col("queryId").as("query_id"), col("n_common"),
          col("n_concordant"), col("n_discordant"),
          round(col("tau"), 6).as("tau"))
        .orderBy("query_id")
    }),
    // champion-list static index pruning over the Zipf corpus: each
    // term keeps its 20 highest-tf postings (tf desc, dl asc, docId
    // ties), probes score through the PRUNED table with the FULL
    // stats — surviving contributions bitwise unchanged, docs merely
    // drop. The oracle replays the per-term ranking, the cut, and the
    // scoring over the kept rows; a kept-set drift (wrong tie-break,
    // wrong ranking key) moves rows even when scores survive
    "q221_champion_topk" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (tf, qs, _) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      val champ = Retrieval.championPostings(tf, m = 20)
        .localCheckpoint() // the pruned persisted layout stand-in
      Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(champ, dfT, st, qs,
          "query_id", "text"), 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // TIERED retrieval: m = 3 champion tier at k = 5 — single-word
    // queries (every doc_id % 194 == 0) can reach at most 3 champion
    // docs, under-fill, and route to the exact tier 2; full-prefix
    // queries fill from tier 1. Both branches and the routing rule
    // replay from first principles; a query with zero champion
    // matches must route (not vanish)
    "q222_bm25_tiered_topk" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (docs, tf, dfT, st) = (ix.docs, ix.tf, ix.dfT, ix.st)
      val champ = Retrieval.championPostings(tf, m = 3)
        .localCheckpoint()
      val qs = docs.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          when(pmod(col("doc_id"), lit(194)) === 0,
            concat_ws("",
              slice(TextFunctions.normalizedWords(col("text")), 2, 1)))
            .otherwise(substring(col("text"), 1, 40)).as("text"))
        .filter(length(col("text")) > 0)
      // tier 2 rides score-exact WAND (derived N/10 hot cut + impact
      // metadata) — the oracle is UNCHANGED from the unpruned tier-2
      // replay, so the gate IS the exactness claim for the routed tier.
      // |D| reads off the persisted 1-row stats (same value as the
      // pre-r19 distinct().count() — corpusStats counts exactly the
      // tf table's distinct docIds — without the per-sample corpus
      // aggregate job)
      Retrieval.bm25TopKTiered(champ, tf, dfT, st, qs,
        "query_id", "text", k = 5,
        hotDf = Some(st.select(col("n_docs"))
          .collect()(0).getLong(0) / 10),
        impact = Some(docsImpactFixture(s, dir)))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"), col("tier"))
        .orderBy("query_id", "rank")
    }),
    // TIERED serving for the SECOND scorer (q222's fixture, QL
    // scoring, WAND tier-2): the champion tier scores through the
    // full cf/stats tables, under-filled queries route to the exact
    // tier via score-exact qlTopKWand — both branches, the routing
    // rule, and the QL arithmetic replay from first principles
    "q231_ql_tiered_topk" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (docs, tf, dfT, cfT, st) =
        (ix.docs, ix.tf, ix.dfT, ix.cfT, ix.st)
      val champ = Retrieval.championPostings(tf, m = 3)
        .localCheckpoint()
      val qs = docs.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          when(pmod(col("doc_id"), lit(194)) === 0,
            concat_ws("",
              slice(TextFunctions.normalizedWords(col("text")), 2, 1)))
            .otherwise(substring(col("text"), 1, 40)).as("text"))
        .filter(length(col("text")) > 0)
      // |D| off the 1-row stats — see q222
      Retrieval.qlTopKTiered(champ, tf, cfT, st, dfT, qs,
        "query_id", "text", k = 5,
        hotDf = Some(st.select(col("n_docs"))
          .collect()(0).getLong(0) / 10),
        impact = Some(docsImpactFixture(s, dir)))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"), col("tier"))
        .orderBy("query_id", "rank")
    }),
    // LM-NATIVE RM3 (the full QL feedback loop): first-pass QL
    // top-10, SOFTMAX likelihood doc weights (QL scores are
    // log-likelihoods — score/Σ weighting is meaningless), the shared
    // RM3 tail, then the WEIGHTED QL second pass with the
    // mass-proportional length normalizer — every stage replayed,
    // softmax and folds included
    "q233_ql_rm3_rescore" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (tf, dfT, cfT, st, qs) = (ix.tf, ix.dfT, ix.cfT, ix.st, ix.qs)
      val tw = Retrieval.rm3ExpandedTermsQl(tf, cfT, st, dfT, qs,
        "query_id", "text").localCheckpoint() // consumed 2x below
      Retrieval.bm25TopK(
        Retrieval.qlScoresWeighted(tf, cfT, st, tw), 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // ...and the ROUTED second pass (r18): the same QL-RM3 expansion
    // through qlTopKWandWeightedRouted — the production default that
    // consults |D| off the persisted stats row and serves small
    // corpora unpruned / large ones through score-exact weighted QL
    // WAND (both branches bitwise the same answer, so the oracle is
    // STILL q233's unpruned replay verbatim; the 500-doc fixture
    // routes unpruned here, and q241 keeps a forced-WAND exactness
    // gate on the Zipf fixture). The pre-r18 gate forced WAND at this
    // shape AND paid a full-corpus distinct().count() for |D| —
    // 15.9 s vs q233's 14.3 s, the BENCH_r17 routing-economics miss
    "q234_ql_rm3_wand_rescore" -> ((s, dir) => {
      import graft.operators.Retrieval
      val ix = docsIndexFixture(s, dir)
      val (tf, dfT, cfT, st, qs) = (ix.tf, ix.dfT, ix.cfT, ix.st, ix.qs)
      val tw = Retrieval.rm3ExpandedTermsQl(tf, cfT, st, dfT, qs,
        "query_id", "text").localCheckpoint() // consumed 2x below
      Retrieval.qlTopKWandWeightedRouted(tf, tw, k = 5,
        dfStats = Some((dfT, st)), cf = Some(cfT),
        impact = Some(docsImpactFixture(s, dir)))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // the FORCED weighted QL WAND exactness gate (the q191 convention
    // for the LM loop, moved to the fixture whose df shape actually
    // exercises the rare/hot split): the full QL-RM3 expansion over
    // the Zipf corpus, second pass through qlTopKWandWeighted with
    // impact bounds — the oracle is the UNPRUNED LM-loop replay
    // verbatim, so the gate is the weighted exactness claim itself
    "q241_ql_rm3_wand_zipf" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      val (dfT, cfT, st, _) = zipfStatsFixture(s, dir)
      val tw = Retrieval.rm3ExpandedTermsQl(tf, cfT, st, dfT, qs,
        "query_id", "text").localCheckpoint() // consumed 2x below
      Retrieval.qlTopKWandWeighted(tf, tw, k = 5, hotDf = hotCut,
        dfStats = Some((dfT, st)), cf = Some(cfT),
        impact = Some(zipfStatsFixture(s, dir)._4))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // the pairwise-LTR training VIEW (RankNet's input): within-query
    // label-differing pairs as winner-minus-loser feature deltas —
    // the oracle replays the q219 feature assembly, the top-3 qrel
    // labeling, and the preference self-join from first principles
    // (a lost pair, a direction flip, or a delta drift moves rows)
    "q236_ltr_pref_pairs" -> ((s, dir) => {
      import graft.operators.{Ltr, Retrieval}
      val ix = docsIndexFixture(s, dir)
      val (tf, dfT, cfT, st, qs) = (ix.tf, ix.dfT, ix.cfT, ix.st, ix.qs)
      val feats = Retrieval.ltrFeatures(tf, dfT, cfT, st, qs,
        "query_id", "text").localCheckpoint()
      val qrels = Retrieval.bm25TopK(
        Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
          "query_id", "text"), 3)
        .select(col("queryId"), col("docId"), lit(1.0).as("label"))
      // consumed 2x (both sides of the preference self-join) — the
      // qrels scoring chain must not re-run per side
      val labeled = feats.join(qrels, Seq("queryId", "docId"),
        "left_outer").na.fill(0.0, Seq("label")).localCheckpoint()
      Ltr.ltrPreferencePairs(labeled,
        Seq("bm25", "ql", "n_matched", "coverage", "dl", "sum_idf"),
        "label")
        .select(col("queryId").as("query_id"),
          col("docId").as("pair_id"),
          round(col("bm25"), 6).as("bm25"), round(col("ql"), 6).as("ql"),
          col("n_matched"), round(col("coverage"), 6).as("coverage"),
          col("dl"), round(col("sum_idf"), 6).as("sum_idf"))
        .orderBy("query_id", "pair_id")
    }),
    // TRAINED pairwise-LTR weights replayed end to end (the q228
    // convention over ltrTrainPairwise, closing the r18 residue where
    // the pairwise model's application was spec-only): the gate
    // TRAINS at runtime on the SF-independent doc_id<500 Zipf fixture
    // (see ltrPairwiseFixture) and re-ranks with the TRAINED model;
    // the oracle replays the feature assembly + the pinned weight
    // literals (regenerate with `runMain graft.Scratch ltr_pin`) in
    // the model's exact left association — so a drift in the training
    // fold, the RMS fold-back, or the application projection fails
    // the gate even when LtrSpec's quality checks survive it
    "q244_ltr_pairwise_rerank" -> ((s, dir) => {
      import graft.operators.Ltr
      val (m, feats) = ltrPairwiseFixture(s, dir)
      Ltr.ltrRerank(feats, m, 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // federated retrieval END TO END (select → probe → merge): CORI
    // picks 2 of the 4 doc_id%4 shards per query, only their posting
    // rows score — with GLOBAL statistics, so the merged ranking is
    // exactly the unsharded ranking restricted to probed pairs. The
    // oracle replays the CORI selection (q215's CTEs), the shard
    // restriction, and the rank from first principles
    "q237_federated_topk" -> ((s, dir) => {
      import graft.operators.Federation
      val ix = docsIndexFixture(s, dir)
      val (dfT, st, qs) = (ix.dfT, ix.st, ix.qs)
      // the shard-partitioned index layout + CORI metadata (persisted
      // at ingest — the fixture rule)
      val fed = docsFederationFixture(s, dir)
      val (shardTf, sdf, scw) = (fed.shardTf, fed.sdf, fed.scw)
      Federation.coriTopK(shardTf, sdf, scw, dfT, st, qs,
        "query_id", "text", k = 5, nProbe = 2)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // the FIELDED stat lifecycle (the q183/q235 convention for the
    // BM25F layout): build the fielded triple on half the corpus +
    // phantoms, append the other half's, negate the phantoms' off —
    // the probe through the compacted (per-field stats, doc scalar,
    // document-level df) triple must be bitwise the fresh build, so
    // the oracle is q202's replay verbatim
    "q243_bm25f_compacted_stats" -> ((s, dir) => {
      import graft.operators.Retrieval
      val docs = t(s, dir, "documents")
      def fieldedOf(d: org.apache.spark.sql.DataFrame) =
        d.select(col("doc_id"), lit("title").as("field"),
          substring(col("text"), 1, 40).as("ftext"))
          .unionByName(d.select(col("doc_id"), lit("body").as("field"),
            substring(col("text"), 41, 1 << 30).as("ftext")))
      val phantom = docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(2000000L)).as("doc_id"),
          col("text"))
      val half0 = docs.where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text")).unionByName(phantom)
      val half1 = docs.where(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("text"))
      // per-half fielded tf checkpoints feed the three stat
      // aggregates AND the posting union (the landing-table rule)
      def triple(d: org.apache.spark.sql.DataFrame) = {
        val f = Retrieval.termFrequenciesFielded(fieldedOf(d),
          "doc_id", "field", "ftext").localCheckpoint()
        (f, Retrieval.fieldedFieldStats(f),
          Retrieval.fieldedDocStats(f), Retrieval.fieldedDfTable(f))
      }
      val (f0, fs0, ds0, df0) = triple(half0)
      val (f1, fs1, ds1, df1) = triple(half1)
      val (fsA, dsA, dfA) =
        Retrieval.compactFieldedStats(fs0, ds0, df0, fs1, ds1, df1)
      val ftfA = f0.unionByName(f1)
      val delIds = phantom.select(col("doc_id").as("docId"))
      val fDel = ftfA.join(delIds, Seq("docId"), "left_semi")
        .localCheckpoint() // consumed 3x (the negated aggregates)
      val (fsF, dsF, dfF) = Retrieval.compactFieldedStats(fsA, dsA, dfA,
        Retrieval.fieldedFieldStats(fDel),
        Retrieval.fieldedDocStats(fDel),
        Retrieval.fieldedDfTable(fDel), negate = true)
      val ftfF = ftfA.join(delIds, Seq("docId"), "left_anti")
      val qs = docs.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"))
      Retrieval.bm25TopK(Retrieval.bm25fScores(ftfF,
        Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75)),
        qs, "query_id", "text", fStats = Some((fsF, dsF, dfF))), 5)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // federation is scorer-agnostic: the SAME select → probe → merge
    // with the QL Dirichlet ranker and GLOBAL cf/|C| statistics — the
    // oracle replays the CORI selection, the shard restriction of the
    // unsharded QL scores, and the merged rank
    "q242_federated_ql_topk" -> ((s, dir) => {
      import graft.operators.Federation
      val ix = docsIndexFixture(s, dir)
      val (cfT, st, qs) = (ix.cfT, ix.st, ix.qs)
      val fed = docsFederationFixture(s, dir)
      val (shardTf, sdf, scw) = (fed.shardTf, fed.sdf, fed.scw)
      Federation.coriTopKQl(shardTf, sdf, scw, cfT, st, qs,
        "query_id", "text", k = 5, nProbe = 2)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // SCORE-EXACT federated WAND (select → probe → WAND-prune →
    // merge) over the Zipf fixture sharded doc_id%4: the pruned
    // probes inside the 2 selected shards must merge BITWISE into the
    // unpruned federated ranking — the oracle is the q237 replay over
    // the zipf corpus, so the gate is the federated score-exactness
    // claim itself
    "q248_federated_wand_topk" -> ((s, dir) => {
      import graft.operators.{Federation, Retrieval}
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      val fed = zipfFederationFixture(s, dir)
      val (shardTf, sdf, scw) = (fed.shardTf, fed.sdf, fed.scw)
      Federation.coriTopKWand(shardTf, sdf, scw, dfT, st, qs,
        "query_id", "text", k = 5, nProbe = 2, hotDf = hotCut,
        impact = Some(zipfStatsFixture(s, dir)._4))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // ...and the federated decision table (the q205/q246 convention):
    // the oracle recomputes the CORI selection, the SHARD-RESTRICTED
    // rare-posting candidates, the GLOBAL (max_tf, min_dl) ceilings
    // ×(1+1e-9), θ from the probed candidate scores, and the routing
    // predicate verbatim — a selection or restriction drift moves
    // n_candidates/θ even when q248's top-k survives it
    "q249_federated_wand_stats" -> ((s, dir) => {
      import graft.operators.{Federation, Retrieval}
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      val fed = zipfFederationFixture(s, dir)
      val (shardTf, sdf, scw) = (fed.shardTf, fed.sdf, fed.scw)
      Federation.coriWandStats(shardTf, sdf, scw, dfT, st, qs,
        "query_id", "text", k = 5, nProbe = 2, hotDf = hotCut,
        impact = Some(zipfStatsFixture(s, dir)._4))
        .select(col("queryId").as("query_id"),
          col("n_rare_terms"), col("n_hot_terms"), col("n_candidates"),
          round(col("ub"), 6).as("ub"),
          round(col("theta"), 6).as("theta"), col("safe"))
        .orderBy("query_id")
    }),
    // federated top-k through POST-DELETE shard metadata (the q238
    // convention for the federation layer): delete a doc slice, route
    // the shard df/size tables through the deletion-side merges and
    // the index through compactTermIndexDeleted — the select → probe
    // → merge through the compacted metadata must be
    // indistinguishable from a federation rebuilt on the survivors
    // (the oracle recomputes ALL shard stats from surviving rows), so
    // CORI routing tracks deletions exactly instead of drifting
    // toward shards whose mass left
    "q250_federated_topk_deleted" -> ((s, dir) => {
      import graft.operators.{Federation, Retrieval}
      val ix = docsIndexFixture(s, dir)
      val (docs, tf, dfT, st, qs) =
        (ix.docs, ix.tf, ix.dfT, ix.st, ix.qs)
      val fed = docsFederationFixture(s, dir)
      val shards = fed.shards
      val del = docs.where(col("doc_id") % 9 === 3)
        .select(col("doc_id").as("docId")).localCheckpoint()
      val (tfD0, dfD0, stD0) =
        Retrieval.compactTermIndexDeleted(tf, dfT, st, del)
      val shardTfD = tfD0.join(shards, Seq("docId"))
        .select(col("shard"), col("docId"), col("dl"), col("word"),
          col("tf"))
        .localCheckpoint()
      val sdfD = Federation.compactShardTermStatsDeleted(
        fed.sdf, tf, shards, del)
        .localCheckpoint()
      val scwD = Federation.compactShardSizesDeleted(
        fed.scw, tf, shards, del)
        .localCheckpoint()
      Federation.coriTopK(shardTfD, sdfD, scwD,
        dfD0.localCheckpoint(), stD0.localCheckpoint(), qs,
        "query_id", "text", k = 5, nProbe = 2)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // the ROUTED federated default (the q234/q251 convention: routing
    // is pure economics, both branches score-exact) — this fixture's
    // 500 docs sit under minWandDocs, so the route serves the
    // unpruned coriTopK and must answer bitwise the SAME shared
    // oracle q248 pins through the forced-WAND branch
    "q251_federated_topk_routed" -> ((s, dir) => {
      import graft.operators.{Federation, Retrieval}
      val (tf, qs, _) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      val fed = zipfFederationFixture(s, dir)
      val (shardTf, sdf, scw) = (fed.shardTf, fed.sdf, fed.scw)
      Federation.coriTopKRouted(shardTf, sdf, scw, dfT, st, qs,
        "query_id", "text", k = 5, nProbe = 2,
        impact = Some(zipfStatsFixture(s, dir)._4))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // the QL decision table through a POST-DELETE index whose impact
    // metadata went through compactImpactStatsDeleted (the q224
    // convention over the deleted lifecycle): the oracle recomputes
    // (max_tf, min_dl) from the SURVIVING postings — so a stale or
    // wrongly-merged row moves ub/safe even when the top-k survives
    "q238_ql_wand_stats_deleted" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (tf, qs, _) = zipfWandFixture(s, dir)
      val (dfT, _, st, _) = zipfStatsFixture(s, dir)
      val del = t(s, dir, "documents").where(col("doc_id") % 9 === 3)
        .select(col("doc_id").as("docId")).localCheckpoint()
      val (tfD0, dfD0, stD0) =
        Retrieval.compactTermIndexDeleted(tf, dfT, st, del)
      val tfD = tfD0.localCheckpoint()
      val dfD = dfD0.localCheckpoint()
      val stD = stD0.localCheckpoint()
      val impDel = Retrieval.compactImpactStatsDeleted(
        zipfStatsFixture(s, dir)._4, tf, del).localCheckpoint()
      val hotCut = stD.select(col("n_docs")).collect()(0).getLong(0) / 10
      Retrieval.qlWandStats(tfD, qs, "query_id", "text",
        k = 5, hotDf = hotCut,
        dfStats = Some((dfD, stD)), impact = Some(impDel))
        .select(col("queryId").as("query_id"),
          col("n_rare_terms"), col("n_hot_terms"), col("n_candidates"),
          round(col("ub"), 6).as("ub"),
          round(col("theta"), 6).as("theta"), col("safe"))
        .orderBy("query_id")
    }),
    // BM25F WAND over the fielded Zipf fixture (title = the corpus
    // text's first 40 chars, body = the rest — the q202 split over
    // the df shape that exercises the rare/hot divide): pruned top-5
    // with composed per-field impact ceilings — the oracle is the
    // UNPRUNED fielded replay, so the gate is the fielded
    // score-exactness claim itself
    "q239_bm25f_wand_topk" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (ftf, qs, hotCut) = fieldedZipfFixture(s, dir)
      val (fs, ds, dfF, impF) = fieldedZipfStatsFixture(s, dir)
      Retrieval.bm25fTopKWand(ftf,
        Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75)),
        qs, "query_id", "text", k = 5, hotDf = hotCut,
        impactF = Some(impF), fStats = Some((fs, ds, dfF)))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // ...and the fielded decision table (the q224 convention): the
    // oracle recomputes the per-(word, field) (max_tf, min_fl)
    // extremes, the field-sorted composed pseudo-tf ceiling, the
    // idf·t̃f_ub/(k1+t̃f_ub) per-term bound, the ×(1+1e-9) margin, θ
    // from the fielded candidate scores, and the routing predicate
    "q240_bm25f_wand_stats" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (ftf, qs, hotCut) = fieldedZipfFixture(s, dir)
      val (fs, ds, dfF, impF) = fieldedZipfStatsFixture(s, dir)
      Retrieval.bm25fWandStats(ftf,
        Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75)),
        qs, "query_id", "text", k = 5, hotDf = hotCut,
        impactF = Some(impF), fStats = Some((fs, ds, dfF)))
        .select(col("queryId").as("query_id"),
          col("n_rare_terms"), col("n_hot_terms"), col("n_candidates"),
          round(col("ub"), 6).as("ub"),
          round(col("theta"), 6).as("theta"), col("safe"))
        .orderBy("query_id")
    }),
    // the fielded-impact DELETED lifecycle (the q238 convention for
    // the BM25F layout): delete a doc slice, route the fielded stat
    // triple through the negated merge (the q243 shape) and the
    // impact table through compactImpactStatsFieldedDeleted — the
    // decision table through the post-delete layout must read
    // indistinguishably from metadata rebuilt on the survivors, so a
    // stale (max_tf, min_fl) cell moves ub/safe even when q239's
    // top-k would survive it
    "q247_bm25f_wand_stats_deleted" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (ftf, qs, _) = fieldedZipfFixture(s, dir)
      val del = t(s, dir, "documents").where(col("doc_id") % 9 === 3)
        .select(col("doc_id").as("docId")).localCheckpoint()
      // survivors probe-side (consumed by candidates + fold + fallback)
      val ftfD = ftf.join(del, Seq("docId"), "left_anti")
        .localCheckpoint()
      // deleted docs' fielded rows feed the three negated aggregates
      val fDel = ftf.join(del, Seq("docId"), "left_semi")
        .localCheckpoint()
      val (fsD0, dsD0, dfD0) = Retrieval.compactFieldedStats(
        Retrieval.fieldedFieldStats(ftf), Retrieval.fieldedDocStats(ftf),
        Retrieval.fieldedDfTable(ftf),
        Retrieval.fieldedFieldStats(fDel), Retrieval.fieldedDocStats(fDel),
        Retrieval.fieldedDfTable(fDel), negate = true)
      // the doc scalar is consumed 2x (the N/10 hot cut + the probe)
      val dsD = dsD0.localCheckpoint()
      val impDel = Retrieval.compactImpactStatsFieldedDeleted(
        Retrieval.impactStatsFielded(ftf), ftf, del)
      val hotCut = dsD.select(col("n_docs")).collect()(0).getLong(0) / 10
      Retrieval.bm25fWandStats(ftfD,
        Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75)),
        qs, "query_id", "text", k = 5, hotDf = hotCut,
        impactF = Some(impDel), fStats = Some((fsD0, dsD, dfD0)))
        .select(col("queryId").as("query_id"),
          col("n_rare_terms"), col("n_hot_terms"), col("n_candidates"),
          round(col("ub"), 6).as("ub"),
          round(col("theta"), 6).as("theta"), col("safe"))
        .orderBy("query_id")
    }),
    // the QL-Dirichlet WAND analog: pruned top-5 over the Zipf WAND
    // fixture, impact-tightened bounds — the oracle replays the
    // UNPRUNED QL chain (q199's CTEs over this fixture), so the gate
    // is the score-exactness claim itself
    "q223_ql_wand_topk" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      Retrieval.qlTopKWand(tf, qs, "query_id", "text",
        k = 5, hotDf = hotCut,
        impact = Some(zipfStatsFixture(s, dir)._4))
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
    // ...and its decision table (the q205 convention): the oracle
    // recomputes the per-term QL ceilings at (max_tf, min_dl), the
    // dl-floor normalizer bound, the sign-aware margins, θ from the
    // QL candidate scores, and the routing predicate — a bound or
    // margin drift fails here even when q223's top-k survives it
    "q224_ql_wand_stats" -> ((s, dir) => {
      import graft.operators.Retrieval
      val (tf, qs, hotCut) = zipfWandFixture(s, dir)
      Retrieval.qlWandStats(tf, qs, "query_id", "text",
        k = 5, hotDf = hotCut,
        impact = Some(zipfStatsFixture(s, dir)._4))
        .select(col("queryId").as("query_id"),
          col("n_rare_terms"), col("n_hot_terms"), col("n_candidates"),
          round(col("ub"), 6).as("ub"),
          round(col("theta"), 6).as("theta"), col("safe"))
        .orderBy("query_id")
    }),
    // the production hybrid pairing (q181 fused BM25 with exact
    // Jaccard; this fuses it with the IVFADC ANN stack): BM25 top-10
    // over short queries + residual-IVFADC top-10 over the same query
    // ids, combined by RANK only — both component rankings AND the
    // exact-rational fusion replay in ONE oracle
    "q185_hybrid_dense_sparse" -> ((s, dir) => {
      import graft.operators.{Pq, Retrieval}
      val ix = docsIndexFixture(s, dir)
      val (docs, tf) = (ix.docs, ix.tf)
      val qs = docs.where(col("doc_id") < 20)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 1, 40).as("text"))
      val bm25 = Retrieval.bm25TopK(
        Retrieval.bm25ScoresIndexed(tf, qs, "query_id", "text"), 10)
        .select(col("queryId"), col("docId"), col("rank"))
      val embs = t(s, dir, "embeddings")
      val (cents, cb, annQueries) = ivfAdcIndex(embs)
      val ann = Pq.ivfPqTopKResidual(embs, annQueries, cents, cb,
        "vec_id", "embedding", k = 10, nprobe = 2)
        .select(col("query_id").as("queryId"),
          col("neighbor_id").as("docId"), col("rank"))
      Retrieval.rrfFuse(Seq(bm25, ann), k = 10)
        .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
          round(col("rrf_score"), 9).as("rrf_score"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),
  )

  /** The BM25 scoring chain replayed in SQL (shared by q179/q180):
    * same tokenizer, (doc, term) tf with non-dedup doc length, exact
    * integer-sum avgdl, Lucene-form idf, and the term-sorted
    * list_reduce fold matching the operator's sorted aggregate.
    * `corpusFrom`/`corpusId` swap the corpus SOURCE (q203 scores a
    * passages CTE as pseudo-docs; the id aliases to `doc_id` so every
    * downstream CTE is untouched); queries always read `documents`.
    */
  /** The champion tier (per-term top-`m` of the tfv rows under
    * [[graft.operators.Retrieval.championPostings]]'s total key
    * `(tf desc, dl asc, doc_id asc)`) replayed in SQL — ONE
    * definition shared by q221/q222/q225/q231 (the shared-fragment
    * rule: a tie-break drift must fail EVERY gate that claims to
    * read "the champion tier", not silently fork its meaning).
    * Emits `champ` downstream of `tfv`/`lens`.
    */
  private def championCte(m: Int): String =
    s"""champ AS (
       |  SELECT doc_id, word, tf FROM (
       |    SELECT t.doc_id, t.word, t.tf,
       |      row_number() OVER (PARTITION BY t.word
       |        ORDER BY t.tf DESC, l.dl ASC, t.doc_id ASC) AS r
       |    FROM tfv t JOIN lens l ON l.doc_id = t.doc_id) x
       |  WHERE r <= $m)""".stripMargin

  private def bm25Cte(corpusWhere: String, queryWhere: String,
                      queryText: String = "text",
                      corpusText: String = "text",
                      corpusFrom: String = "documents",
                      corpusId: String = "doc_id"): String =
    s"""corpus AS (
       |  SELECT $corpusId AS doc_id, list_filter(string_split_regex(
       |      regexp_replace(lower($corpusText), '[^a-z0-9$WsClass]', ' ', 'g'),
       |      '[$WsClass]+'), x -> x != '') AS ws
       |  FROM $corpusFrom
       |  WHERE $corpusId IS NOT NULL AND $corpusWhere
       |    AND regexp_matches(lower($corpusText), '[a-z0-9]')),
       |tfv AS (
       |  SELECT doc_id, word, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(ws) AS word FROM corpus)
       |  GROUP BY 1, 2),
       |lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM corpus),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
       |  FROM lens),
       |dft AS (SELECT word, count(*) AS df FROM tfv GROUP BY 1),
       |qterms AS (
       |  SELECT doc_id AS query_id, unnest(list_distinct(list_filter(
       |      string_split_regex(
       |        regexp_replace(lower($queryText), '[^a-z0-9$WsClass]', ' ', 'g'),
       |        '[$WsClass]+'), x -> x != ''))) AS word
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND $queryWhere
       |    AND regexp_matches(lower($queryText), '[a-z0-9]')),
       |enriched AS (
       |  SELECT query_id, word, avgdl,
       |    ln(1.0 + (n_docs - CAST(df AS DOUBLE) + 0.5)
       |             / (CAST(df AS DOUBLE) + 0.5)) AS idf
       |  FROM qterms JOIN dft USING (word) CROSS JOIN stats),
       |contrib AS (
       |  SELECT query_id, t.doc_id, t.word,
       |    idf * (CAST(t.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
       |      / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
       |         (1.0 - CAST(0.75 AS DOUBLE) +
       |          CAST(0.75 AS DOUBLE) * CAST(l.dl AS DOUBLE) / avgdl))
       |      AS c
       |  FROM tfv t JOIN enriched e ON e.word = t.word
       |  JOIN lens l ON l.doc_id = t.doc_id),
       |bscores AS (
       |  SELECT query_id, doc_id,
       |    list_reduce(list(c ORDER BY word), (a, x) -> a + x) AS score
       |  FROM contrib GROUP BY 1, 2)""".stripMargin

  /** q182/q187's shared Zipf WAND fixture — ONE definition (the
    * ivfAdcIndex rule: the exactness gate and the decision-table gate
    * that explains it must read the SAME corpus, queries, and hot
    * cut): the checkpointed Zipf tf table, the mixed head+tail query
    * batch with the (250k+50)-id hot-only slice, and the DERIVED N/10
    * hot cut (an absolute cut calibrated at one SF degenerates at
    * another — 50 split the terms at sf0.01 but made every term hot
    * at sf0.1, sending all 100 queries through the fallback).
    * [[ZipfWandCorpusTextSql]]/[[ZipfWandQueryTextSql]] are the
    * oracle-side halves of the same definition.
    */
  /** The FIELDED Zipf WAND fixture (q239/q240): the
    * [[zipfWandFixture]] corpus split title/body at char 40 (the
    * q202 convention) with the same queries and N/10 hot cut —
    * memoized size-one like the unfielded fixture.
    */
  private def fieldedZipfFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, Long) =
    fieldedZipfFixtureCache.synchronized {
      fieldedZipfFixtureCache.get((s, dir)).getOrElse {
        val (_, qs, hotCut) = zipfWandFixture(s, dir)
        val corpus = t(s, dir, "documents")
          .where(col("doc_id").isNotNull)
          .select(col("doc_id"),
            zipfText(col("doc_id"), 30, 2000, "zc", 2000).as("text"))
        val fielded = corpus.select(col("doc_id"),
          lit("title").as("field"),
          substring(col("text"), 1, 40).as("ftext"))
          .unionByName(corpus.select(col("doc_id"),
            lit("body").as("field"),
            substring(col("text"), 41, 1 << 30).as("ftext")))
        val ftf = graft.operators.Retrieval
          .termFrequenciesFielded(fielded, "doc_id", "field", "ftext")
          .localCheckpoint()
        val built = (ftf, qs, hotCut)
        fieldedZipfFixtureCache.clear()
        fieldedZipfFixtureCache.put((s, dir), built)
        built
      }
    }

  private val fieldedZipfFixtureCache =
    scala.collection.mutable.Map
      .empty[(SparkSession, String), (DataFrame, DataFrame, Long)]

  /** The persisted stat family of the [[fieldedZipfFixture]] layout —
    * `(fieldedFieldStats, fieldedDocStats, fieldedDfTable,
    * impactStatsFielded)`, all checkpointed: the exact tables q243's
    * lifecycle maintains (`compactFieldedStats` +
    * `compactImpactStatsFielded`), which q239/q240 re-derived inside
    * the probe plan per sample. Values identical to the inline
    * aggregates (exact integers; q243's gate IS the
    * precomputed-equals-inline proof, its oracle being q202's replay
    * verbatim).
    */
  private def fieldedZipfStatsFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    fieldedZipfStatsFixtureCache.synchronized {
      fieldedZipfStatsFixtureCache.get((s, dir)).getOrElse {
        import graft.operators.Retrieval
        val (ftf, _, _) = fieldedZipfFixture(s, dir)
        val built = (Retrieval.fieldedFieldStats(ftf).localCheckpoint(),
          Retrieval.fieldedDocStats(ftf).localCheckpoint(),
          Retrieval.fieldedDfTable(ftf).localCheckpoint(),
          Retrieval.impactStatsFielded(ftf).localCheckpoint())
        fieldedZipfStatsFixtureCache.clear()
        fieldedZipfStatsFixtureCache.put((s, dir), built)
        built
      }
    }

  private val fieldedZipfStatsFixtureCache =
    scala.collection.mutable.Map.empty[(SparkSession, String),
      (DataFrame, DataFrame, DataFrame, DataFrame)]

  /** The persisted BM25F layout over the RAW documents corpus (the
    * title/body split q202 probes and q243's lifecycle maintains):
    * the fielded tf plus its stat triple, checkpointed — the
    * [[docsIndexFixture]] rule for the fielded index family.
    */
  private def docsFieldedFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    docsFieldedFixtureCache.synchronized {
      docsFieldedFixtureCache.get((s, dir)).getOrElse {
        import graft.operators.Retrieval
        val docs = t(s, dir, "documents")
        val fielded = docs.select(col("doc_id"),
          lit("title").as("field"),
          substring(col("text"), 1, 40).as("ftext"))
          .unionByName(docs.select(col("doc_id"),
            lit("body").as("field"),
            substring(col("text"), 41, 1 << 30).as("ftext")))
        val ftf = Retrieval.termFrequenciesFielded(fielded,
          "doc_id", "field", "ftext").localCheckpoint()
        val built = (ftf,
          Retrieval.fieldedFieldStats(ftf).localCheckpoint(),
          Retrieval.fieldedDocStats(ftf).localCheckpoint(),
          Retrieval.fieldedDfTable(ftf).localCheckpoint())
        docsFieldedFixtureCache.clear()
        docsFieldedFixtureCache.put((s, dir), built)
        built
      }
    }

  private val docsFieldedFixtureCache =
    scala.collection.mutable.Map.empty[(SparkSession, String),
      (DataFrame, DataFrame, DataFrame, DataFrame)]

  /** The PAIRWISE-LTR training fixture + its trained model (q244, and
    * `graft.Scratch ltr_pin` — the weight-pinning tool): the Zipf
    * corpus/query shapes RESTRICTED to `doc_id < 500`, which is the
    * doc-id set EVERY SF shares (sf0.001/0.01 are exactly 0..499,
    * sf0.1 a superset) — and `zipfText` is a pure function of doc_id,
    * so the training table, and therefore the trained weights, are
    * IDENTICAL at every SF. That is what lets q244's oracle pin the
    * weights as literals (the q228 convention) while the GATE trains
    * at runtime: a drift anywhere in [[graft.operators.Ltr
    * .ltrTrainPairwise]] (fold order, RMS scaling, the update rule)
    * moves the trained weights off the pinned ones and fails the
    * replay. Labels are the bm25 top-3 qrel convention (q236).
    * Returns (trained model, the checkpointed feature table).
    *
    * Memoized per (session, dir) since r19 (the sibling-fixture
    * lifetime rule): the trained model IS persisted state — the
    * oracle pins its weights as literals — so warm samples measure
    * the serving re-rank, and the training still runs (and is still
    * gated bitwise) on the first sample of every session.
    */
  private[graft] def ltrPairwiseFixture(s: SparkSession, dir: String)
      : (graft.operators.Ltr.LtrModel, DataFrame) =
    ltrPairwiseFixtureCache.synchronized {
      ltrPairwiseFixtureCache.get((s, dir)).getOrElse {
        val built = ltrPairwiseFixtureBuild(s, dir)
        ltrPairwiseFixtureCache.clear()
        ltrPairwiseFixtureCache.put((s, dir), built)
        built
      }
    }

  private val ltrPairwiseFixtureCache =
    scala.collection.mutable.Map.empty[(SparkSession, String),
      (graft.operators.Ltr.LtrModel, DataFrame)]

  private def ltrPairwiseFixtureBuild(s: SparkSession, dir: String)
      : (graft.operators.Ltr.LtrModel, DataFrame) = {
    import graft.operators.{Ltr, Retrieval}
    val docs = t(s, dir, "documents")
      .where(col("doc_id").isNotNull && col("doc_id") < 500)
    val corpus = docs.select(col("doc_id"),
      zipfText(col("doc_id"), 30, 2000, "zc", 2000).as("text"))
    val qs = docs.where(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        when(pmod(col("doc_id"), lit(250)) === 50,
          zipfText(col("doc_id"), 4, 2000, "zq", 2000))
          .otherwise(concat_ws(" ",
            zipfText(col("doc_id"), 4, 2000, "zq", 2000),
            zipfText(col("doc_id"), 2, 14, "zt", 2000))).as("text"))
    val tf = Retrieval.termFrequencies(corpus, "doc_id", "text")
      .localCheckpoint() // see q179
    val dfT = Retrieval.dfTable(tf).localCheckpoint()
    val cfT = Retrieval.cfTable(tf).localCheckpoint()
    val st = Retrieval.corpusStats(tf).localCheckpoint()
    // consumed 2x (the labeled table + the final re-rank)
    val feats = Retrieval.ltrFeatures(tf, dfT, cfT, st, qs,
      "query_id", "text").localCheckpoint()
    val qrels = Retrieval.bm25TopK(
      Retrieval.bm25ScoresPrecomputed(tf, dfT, st, qs,
        "query_id", "text"), 3)
      .select(col("queryId"), col("docId"), lit(1.0).as("label"))
    // consumed iters+2 times by the training loop — materialize
    val labeled = feats.join(qrels, Seq("queryId", "docId"),
      "left_outer").na.fill(0.0, Seq("label")).localCheckpoint()
    val m = Ltr.ltrTrainPairwise(labeled,
      Seq("bm25", "ql", "n_matched", "coverage", "dl", "sum_idf"),
      "label", iters = 10, lr = 0.5)
    (m, feats)
  }

  /** The persisted base-index family over the RAW documents corpus —
    * the [[zipfWandFixture]]/[[passageLayoutFixture]] convention
    * applied to the ~25 retrieval gates that probe the SAME canonical
    * layout: `termFrequencies(documents)` plus its vocabulary-sized
    * df/cf companions and the 1-row corpus scalars. These four tables
    * are EXACTLY the layout the operator scaladoc says every ingest
    * persists (`compactTermIndex`'s triple + [[graft.operators
    * .Retrieval.cfTable]], bucketed by word — BucketingSpec pins the
    * exchange-free probe); before r19 every gate re-built them inside
    * its own timed region, so the suite measured ~25 identical index
    * builds and only incidentally the probes the gates gate. Built
    * ONCE per (session, dir), size-one cache (the zipfWandFixture
    * lifetime rule); lifecycle gates (q183/q193/q225/q243 — the ones
    * whose CLAIM is building/merging a layout) keep building their
    * own tables in-gate. Results are untouched: each gate's plan
    * still reads the identical checkpointed tf (the pre-r19 bodies
    * already probed through `tf.localCheckpoint()`), and every oracle
    * recomputes from the parquet corpus.
    *
    * `qs` stays lazy (a narrow result-sized scan) and the canonical
    * `%97`/40-char derivation gates that differ (phrase/fuzzy
    * families) keep building their own query slices.
    */
  private[graft] final case class DocsIndex(docs: DataFrame,
      tf: DataFrame, dfT: DataFrame, cfT: DataFrame, st: DataFrame,
      qs: DataFrame)

  private[graft] def docsIndexFixture(s: SparkSession, dir: String)
      : DocsIndex = docsIndexFixtureCache.synchronized {
    docsIndexFixtureCache.get((s, dir)).getOrElse {
      import graft.operators.Retrieval
      val docs = t(s, dir, "documents")
      val tf = Retrieval.termFrequencies(docs, "doc_id", "text")
        .localCheckpoint() // see q179
      val built = DocsIndex(docs, tf,
        Retrieval.dfTable(tf).localCheckpoint(),
        Retrieval.cfTable(tf).localCheckpoint(),
        Retrieval.corpusStats(tf).localCheckpoint(),
        docs.where(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("query_id"),
            substring(col("text"), 1, 40).as("text")))
      docsIndexFixtureCache.clear()
      docsIndexFixtureCache.put((s, dir), built)
      built
    }
  }

  private val docsIndexFixtureCache =
    scala.collection.mutable.Map
      .empty[(SparkSession, String), DocsIndex]

  /** The canonical positional-postings layout over the raw documents
    * corpus (the [[docsIndexFixture]] rule for the phrase/proximity/
    * snippet family — `positionalPostings` is the SECOND table the
    * ingest persists, per the operator scaladoc). Same lifetime
    * contract; q193 (the positional lifecycle gate) keeps building
    * its own split layouts.
    */
  private def docsPostingsFixture(s: SparkSession, dir: String)
      : DataFrame = docsPostingsFixtureCache.synchronized {
    docsPostingsFixtureCache.get((s, dir)).getOrElse {
      val built = graft.operators.Retrieval
        .positionalPostings(t(s, dir, "documents"), "doc_id", "text")
        .localCheckpoint()
      docsPostingsFixtureCache.clear()
      docsPostingsFixtureCache.put((s, dir), built)
      built
    }
  }

  private val docsPostingsFixtureCache =
    scala.collection.mutable.Map
      .empty[(SparkSession, String), DataFrame]

  /** The [[graft.operators.Retrieval.impactStats]] pruning metadata of
    * the [[docsIndexFixture]] layout (the THIRD persisted table of the
    * ingest family — `compactImpactStats` maintains it next to the
    * triple). Same lifetime contract; q238 (the deleted-impact gate)
    * keeps building its own post-delete table in-gate.
    */
  private def docsImpactFixture(s: SparkSession, dir: String)
      : DataFrame = docsImpactFixtureCache.synchronized {
    docsImpactFixtureCache.get((s, dir)).getOrElse {
      val built = graft.operators.Retrieval
        .impactStats(docsIndexFixture(s, dir).tf).localCheckpoint()
      docsImpactFixtureCache.clear()
      docsImpactFixtureCache.put((s, dir), built)
      built
    }
  }

  private val docsImpactFixtureCache =
    scala.collection.mutable.Map
      .empty[(SparkSession, String), DataFrame]

  /** The persisted federation layout over the [[docsIndexFixture]]
    * corpus (the doc_id%4 shard split every federated docs gate
    * probes): the shard-partitioned posting table plus the CORI
    * shard-metadata pair — all ingest-persisted state per the
    * [[graft.operators.Federation]] metadata-lifecycle scaladoc.
    * Same lifetime contract as the sibling fixtures; the deletion
    * gate (q250) keeps its post-delete compactions in-gate (they ARE
    * its claim) but starts from this base layout, exactly as q238
    * starts from the base impact table.
    */
  private[graft] final case class DocsFederation(shards: DataFrame,
      shardTf: DataFrame, sdf: DataFrame, scw: DataFrame)

  private def docsFederationFixture(s: SparkSession, dir: String)
      : DocsFederation = docsFederationFixtureCache.synchronized {
    docsFederationFixtureCache.get((s, dir)).getOrElse {
      import graft.operators.Federation
      val ix = docsIndexFixture(s, dir)
      val shards = ix.docs.select(col("doc_id").as("docId"),
        pmod(col("doc_id"), lit(4)).as("shard"))
      val built = DocsFederation(shards,
        ix.tf.join(shards, Seq("docId"))
          .select(col("shard"), col("docId"), col("dl"), col("word"),
            col("tf"))
          .localCheckpoint(),
        Federation.shardTermStats(ix.tf, shards).localCheckpoint(),
        Federation.shardSizes(ix.tf, shards).localCheckpoint())
      docsFederationFixtureCache.clear()
      docsFederationFixtureCache.put((s, dir), built)
      built
    }
  }

  private val docsFederationFixtureCache =
    scala.collection.mutable.Map
      .empty[(SparkSession, String), DocsFederation]

  /** The full-corpus passage layout shared by q203/q245/q246 (the
    * [[zipfWandFixture]] convention applied to the passage family):
    * width-32/stride-16 segmentation of the documents fixture, the
    * checkpointed passage tf, and the derived df/stats/membership/
    * forward/impact tables — built ONCE per (session, dir) so the
    * three gates measure the PROBE (the serving path over a persisted
    * layout, exactly what the q203 scaladoc claims) instead of each
    * re-paying the ingest-time build. df/stats/impact checkpoint too:
    * vocabulary-sized, and every probe sample consumes them. The
    * derived N/10 hot cut rides along (the q187 rule — an absolute
    * cut degenerates across SFs). q235 deliberately does NOT use this
    * fixture: the lifecycle gate's whole point is building its own
    * half-corpus layouts.
    */
  private def passageLayoutFixture(s: SparkSession, dir: String)
      : (graft.operators.Passages.PassageLayout, DataFrame, Long) =
    passageLayoutFixtureCache.synchronized {
      passageLayoutFixtureCache.get((s, dir)).getOrElse {
        import graft.operators.{Chunking, Passages, Retrieval}
        val docs = t(s, dir, "documents")
        val pass = Chunking.tokenPassages(docs, "doc_id", "text",
          width = 32, stride = 16).localCheckpoint()
        val tf = Retrieval.termFrequencies(pass, "passageId", "text")
          .localCheckpoint()
        val st = Retrieval.corpusStats(tf).localCheckpoint()
        val layout = Passages.PassageLayout(tf,
          Retrieval.dfTable(tf).localCheckpoint(), st,
          pass.select("passageId", "docId").localCheckpoint(),
          forward = Some(tf),
          impact = Some(Retrieval.impactStats(tf).localCheckpoint()))
        val hotCut =
          st.select(col("n_docs")).collect()(0).getLong(0) / 10
        val qs = docs.where(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("query_id"),
            substring(col("text"), 1, 40).as("text"))
        val built = (layout, qs, hotCut)
        passageLayoutFixtureCache.clear()
        passageLayoutFixtureCache.put((s, dir), built)
        built
      }
    }

  private val passageLayoutFixtureCache =
    scala.collection.mutable.Map.empty[(SparkSession, String),
      (graft.operators.Passages.PassageLayout, DataFrame, Long)]

  private def zipfWandFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, Long) = zipfWandFixtureCache.synchronized {
    zipfWandFixtureCache.get((s, dir)).getOrElse {
      val corpus = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id"),
          zipfText(col("doc_id"), 30, 2000, "zc", 2000).as("text"))
      val qs = t(s, dir, "documents").where(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("query_id"),
          when(pmod(col("doc_id"), lit(250)) === 50,
            zipfText(col("doc_id"), 4, 2000, "zq", 2000))
            .otherwise(concat_ws(" ",
              zipfText(col("doc_id"), 4, 2000, "zq", 2000),
              zipfText(col("doc_id"), 2, 14, "zt", 2000))).as("text"))
      val tf = graft.operators.Retrieval
        .termFrequencies(corpus, "doc_id", "text")
        .localCheckpoint() // see q179
      // the hot cut counts the tf table's DISTINCT docIds — the
      // filtered corpus both sides actually score, exactly the q187
      // oracle's `count(*) // 10 FROM corpus` (the corpus CTE filters
      // non-alphanumeric texts; zipfText always emits alnum tokens so
      // the raw table count happened to agree, but the coupling is to
      // the SCORED corpus, not the raw fixture). Counting the
      // checkpointed tf is also one narrow pass, not a re-tokenize.
      val built = (tf, qs, tf.select("docId").distinct().count() / 10)
      // size-ONE cache: an unbounded map would pin every (session,
      // dir)'s checkpointed tf blocks for the JVM lifetime; Verify
      // runs one dir per JVM and the specs one session, so the last
      // entry is the only one worth keeping
      zipfWandFixtureCache.clear()
      zipfWandFixtureCache.put((s, dir), built)
      built
    }
  }

  /** The fixture is consumed by several gates (q182/q187 and the
    * weighted-WAND/recall family) — memoized per (session, dir), most
    * recent entry ONLY, so one checkpointed tf table and ONE hot-cut
    * job serve them all without pinning stale sessions' blocks.
    */
  private val zipfWandFixtureCache =
    scala.collection.mutable.Map
      .empty[(SparkSession, String), (DataFrame, DataFrame, Long)]

  /** The persisted stat family of the [[zipfWandFixture]] index —
    * `(dfTable, cfTable, corpusStats, impactStats)`, all
    * checkpointed: the SAME four companion tables
    * [[docsIndexFixture]]/[[docsImpactFixture]] persist for the raw
    * corpus, which ~15 Zipf gates each re-derived in-gate before r19
    * (each `localCheckpoint` is an eager job per bench sample; the
    * impact aggregate is a full posting pass). Values are identical
    * to the in-gate derivations — the consumers' plans merely read
    * the checkpoint instead of re-aggregating the checkpointed tf.
    */
  private def zipfStatsFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    zipfStatsFixtureCache.synchronized {
      zipfStatsFixtureCache.get((s, dir)).getOrElse {
        import graft.operators.Retrieval
        val (tf, _, _) = zipfWandFixture(s, dir)
        val built = (Retrieval.dfTable(tf).localCheckpoint(),
          Retrieval.cfTable(tf).localCheckpoint(),
          Retrieval.corpusStats(tf).localCheckpoint(),
          Retrieval.impactStats(tf).localCheckpoint())
        zipfStatsFixtureCache.clear()
        zipfStatsFixtureCache.put((s, dir), built)
        built
      }
    }

  private val zipfStatsFixtureCache =
    scala.collection.mutable.Map.empty[(SparkSession, String),
      (DataFrame, DataFrame, DataFrame, DataFrame)]

  /** The persisted federation layout over the [[zipfWandFixture]]
    * index (the doc_id%4 split q248/q249/q251 probe) — the
    * [[docsFederationFixture]] rule for the Zipf corpus.
    */
  private def zipfFederationFixture(s: SparkSession, dir: String)
      : DocsFederation = zipfFederationFixtureCache.synchronized {
    zipfFederationFixtureCache.get((s, dir)).getOrElse {
      import graft.operators.Federation
      val (tf, _, _) = zipfWandFixture(s, dir)
      val shards = t(s, dir, "documents")
        .select(col("doc_id").as("docId"),
          pmod(col("doc_id"), lit(4)).as("shard"))
      val built = DocsFederation(shards,
        tf.join(shards, Seq("docId"))
          .select(col("shard"), col("docId"), col("dl"), col("word"),
            col("tf"))
          .localCheckpoint(),
        Federation.shardTermStats(tf, shards).localCheckpoint(),
        Federation.shardSizes(tf, shards).localCheckpoint())
      zipfFederationFixtureCache.clear()
      zipfFederationFixtureCache.put((s, dir), built)
      built
    }
  }

  private val zipfFederationFixtureCache =
    scala.collection.mutable.Map
      .empty[(SparkSession, String), DocsFederation]

  private lazy val ZipfWandCorpusTextSql: String =
    zipfTextSql("doc_id", 30, 2000, "zc", 2000)

  private lazy val ZipfWandQueryTextSql: String =
    s"""CASE WHEN doc_id % 250 = 50
       |  THEN ${zipfTextSql("doc_id", 4, 2000, "zq", 2000)}
       |  ELSE ${zipfTextSql("doc_id", 4, 2000, "zq", 2000)} || ' ' ||
       |    ${zipfTextSql("doc_id", 2, 14, "zt", 2000)} END""".stripMargin

  /** The score-CHANGING pruned scoring chain (`maxDocFrequency` = the
    * derived N/10 hot cut) replayed in SQL, downstream of [[bm25Cte]]
    * over the Zipf fixture — ONE definition consumed by q197 (via its
    * own gate), [[RankingMetricsCtes]] (q206/q207/q218), and q220
    * (the shared-fragment rule: a prune-boundary or idf-tree drift
    * must fail EVERY gate that claims to read "the pruned run", not
    * silently fork its meaning). Emits `hotcut`, `penr`, `pcon`,
    * `psc`.
    */
  private lazy val PrunedScoresCtes =
    s"""hotcut AS (SELECT count(*) // 10 AS cut FROM corpus),
       |penr AS (
       |  SELECT query_id, word, avgdl,
       |    ln(1.0 + (n_docs - CAST(df AS DOUBLE) + 0.5)
       |             / (CAST(df AS DOUBLE) + 0.5)) AS idf
       |  FROM qterms JOIN dft USING (word) CROSS JOIN stats
       |  CROSS JOIN hotcut
       |  WHERE df <= cut),
       |pcon AS (
       |  SELECT query_id, t.doc_id, t.word,
       |    idf * (CAST(t.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
       |      / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
       |         (1.0 - CAST(0.75 AS DOUBLE) +
       |          CAST(0.75 AS DOUBLE) * CAST(l.dl AS DOUBLE) / avgdl))
       |      AS c
       |  FROM tfv t JOIN penr e ON e.word = t.word
       |  JOIN lens l ON l.doc_id = t.doc_id),
       |psc AS (
       |  SELECT query_id, doc_id,
       |    list_reduce(list(c ORDER BY word), (a, x) -> a + x) AS score
       |  FROM pcon GROUP BY 1, 2)""".stripMargin

  /** The ranking-metrics replay shared by q206/q207 (downstream of
    * [[bm25Cte]]'s `bscores`/`qterms`/`dft`/`stats`/`tfv`/`lens` over
    * the Zipf fixture): the pruned run ([[PrunedScoresCtes]]), graded
    * qrels (exact top-10, grade = 11 − rank), and the trec_eval
    * arithmetic — running prec@r, rank-ordered DCG/AP folds, the
    * ideal re-ranking for IDCG. Emits `met` (per-query UNROUNDED
    * metrics); the consuming gates round/aggregate it.
    */
  private lazy val RankingMetricsCtes =
    s"""$PrunedScoresCtes,
       |run AS (
       |  SELECT query_id, doc_id, CAST(r AS BIGINT) AS rank FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, doc_id) AS r
       |    FROM psc) x WHERE r <= 5),
       |qrels AS (
       |  SELECT query_id, doc_id, CAST(11 - r AS DOUBLE) AS grade FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, doc_id) AS r
       |    FROM bscores) y WHERE r <= 10),
       |nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
       |         FROM qrels GROUP BY 1),
       |hc AS (
       |  SELECT query_id, rank, grade,
       |    sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY query_id ORDER BY rank) AS nrelr
       |  FROM (
       |    SELECT r.query_id, r.rank, coalesce(q.grade, 0.0) AS grade
       |    FROM run r LEFT JOIN qrels q USING (query_id, doc_id))),
       |perq AS (
       |  SELECT query_id,
       |    CAST(sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_ret_rel,
       |    list_reduce(list_prepend(0.0, list(
       |      CASE WHEN grade > 0
       |        THEN CAST(nrelr AS DOUBLE) / CAST(rank AS DOUBLE)
       |        ELSE 0.0 END ORDER BY rank)), (a, x) -> a + x) AS psum,
       |    list_reduce(list_prepend(0.0, list(
       |      (power(2.0, grade) - 1.0)
       |        / (ln(CAST(rank + 1 AS DOUBLE)) / ln(2.0))
       |      ORDER BY rank)), (a, x) -> a + x) AS dcgs,
       |    min(CASE WHEN grade > 0 THEN rank END) AS frr
       |  FROM hc GROUP BY 1),
       |ideal AS (
       |  SELECT query_id, grade,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY grade DESC, doc_id) AS i
       |  FROM qrels),
       |idcgt AS (
       |  SELECT query_id,
       |    list_reduce(list_prepend(0.0, list(
       |      (power(2.0, grade) - 1.0)
       |        / (ln(CAST(i + 1 AS DOUBLE)) / ln(2.0)) ORDER BY i)),
       |      (a, x) -> a + x) AS idcg
       |  FROM ideal WHERE i <= 5 GROUP BY 1),
       |met AS (
       |  SELECT n.query_id, n_rel,
       |    CAST(coalesce(n_ret_rel, 0) AS BIGINT) AS n_ret_rel,
       |    CAST(coalesce(n_ret_rel, 0) AS DOUBLE) / 5.0 AS p_at_k,
       |    CAST(coalesce(n_ret_rel, 0) AS DOUBLE) / CAST(n_rel AS DOUBLE)
       |      AS recall_at_k,
       |    CASE WHEN frr IS NULL THEN 0.0
       |         ELSE 1.0 / CAST(frr AS DOUBLE) END AS rr,
       |    coalesce(psum, 0.0) / CAST(n_rel AS DOUBLE) AS ap,
       |    coalesce(dcgs, 0.0) / idcg AS ndcg
       |  FROM nrel n
       |  LEFT JOIN perq USING (query_id)
       |  LEFT JOIN idcgt USING (query_id))""".stripMargin

  /** The RM3 expansion chain replayed in SQL, downstream of
    * [[bm25Cte]]'s `bscores`/`tfv`/`lens`/`qterms` (shared by
    * q189/q190): top-10 feedback set, docId-ordered score normalizer
    * fold, docId-ordered feedback-mass folds, top-10 truncation
    * (mass desc, word ties), word-ordered renormalizer fold, and the
    * λ=0.5 interpolation with the uniform original query — each Σ the
    * exact tree the operator folds.
    */
  /** The LM-native RM3 composition replayed in SQL (q233's chain;
    * q234 shares it verbatim — its weighted QL WAND second pass is
    * score-exact, so the unpruned replay is both gates' contract).
    */
  private lazy val QlRm3RescoreOracle = qlRm3RescoreOracle(
    bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)"))

  /** The q233 QL-RM3 replay on the ZIPF WAND fixture — q241's oracle:
    * the same LM feedback loop verbatim over the corpus whose df
    * shape actually exercises the rare/hot split, so the weighted QL
    * WAND exactness claim keeps a forced-pruned gate after q234
    * moved to the routed default (which serves the 500-doc fixture
    * unpruned).
    */
  private lazy val QlRm3RescoreZipfOracle = qlRm3RescoreOracle(
    bm25Cte("TRUE", "doc_id % 50 = 0",
      ZipfWandQueryTextSql, ZipfWandCorpusTextSql))

  /** The full LM-native RM3 replay (first-pass QL top-10, softmax
    * likelihood doc weights, the shared RM3 tail, the weighted QL
    * second pass with the mass-proportional normalizer) over a
    * caller-supplied corpus/query CTE prefix — shared by q233/q234
    * (documents) and q241 (Zipf), the one-definition rule for "the
    * LM feedback loop".
    */
  private def qlRm3RescoreOracle(cte: String): String = s"""WITH $cte,
         |$QlCtes,
         |qltop AS (
         |  SELECT query_id, doc_id, score FROM (
         |    SELECT query_id, doc_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM qlsc) x WHERE r <= 10),
         |qmx AS (
         |  SELECT query_id, max(score) AS mx FROM qltop GROUP BY 1),
         |qex AS (
         |  SELECT t.query_id, t.doc_id, exp(t.score - m.mx) AS e
         |  FROM qltop t JOIN qmx m USING (query_id)),
         |qzz AS (
         |  SELECT query_id,
         |    list_reduce(list_prepend(0.0, list(e ORDER BY doc_id)),
         |      (a, x) -> a + x) AS z
         |  FROM qex GROUP BY 1),
         |qfbm AS (
         |  SELECT e.query_id, t.word,
         |    list_reduce(list_prepend(0.0, list(
         |      (CAST(t.tf AS DOUBLE) / CAST(l.dl AS DOUBLE)) * (e.e / z.z)
         |      ORDER BY t.doc_id)), (a, x) -> a + x) AS pw
         |  FROM qex e
         |  JOIN tfv t ON t.doc_id = e.doc_id
         |  JOIN lens l ON l.doc_id = t.doc_id
         |  JOIN qzz z ON z.query_id = e.query_id
         |  GROUP BY e.query_id, t.word),
         |qfbkept AS (
         |  SELECT query_id, word, pw FROM (
         |    SELECT query_id, word, pw,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY pw DESC, word) AS r
         |    FROM qfbm) y WHERE r <= 10),
         |qfbnorm AS (
         |  SELECT query_id,
         |    list_reduce(list_prepend(0.0, list(pw ORDER BY word)),
         |      (a, x) -> a + x) AS s
         |  FROM qfbkept GROUP BY 1),
         |qfbw AS (
         |  SELECT k.query_id, k.word, k.pw / n.s AS fw
         |  FROM qfbkept k JOIN qfbnorm n USING (query_id)),
         |qown AS (SELECT query_id, count(*) AS n FROM qterms GROUP BY 1),
         |qow AS (
         |  SELECT q.query_id, q.word, 1.0 / CAST(o.n AS DOUBLE) AS owt
         |  FROM qterms q JOIN qown o USING (query_id)),
         |qfbq AS (SELECT DISTINCT query_id FROM qfbw),
         |qfinalw AS (
         |  SELECT coalesce(a.query_id, f.query_id) AS query_id,
         |    coalesce(a.word, f.word) AS word,
         |    CAST(0.5 AS DOUBLE) * coalesce(owt, 0.0) +
         |      CAST(0.5 AS DOUBLE) * coalesce(fw, 0.0) AS weight
         |  FROM qow a FULL OUTER JOIN qfbw f
         |    ON a.query_id = f.query_id AND a.word = f.word
         |  WHERE coalesce(a.query_id, f.query_id) IN
         |    (SELECT query_id FROM qfbq)
         |  UNION ALL
         |  SELECT query_id, word, owt AS weight FROM qow
         |  WHERE query_id NOT IN (SELECT query_id FROM qfbq)),
         |wqenr AS (
         |  SELECT f.query_id, f.word, f.weight, c.cf
         |  FROM qfinalw f JOIN cft c USING (word)),
         |wqn AS (
         |  SELECT query_id,
         |    list_reduce(list_prepend(0.0, list(weight ORDER BY word)),
         |      (a, x) -> a + x) AS nqw
         |  FROM wqenr GROUP BY 1),
         |wqcon AS (
         |  SELECT e.query_id, t.doc_id, t.word,
         |    e.weight * ln(1.0 + CAST(t.tf AS DOUBLE) * ctokens
         |      / (CAST(2000 AS DOUBLE) * CAST(e.cf AS DOUBLE))) AS c,
         |    l.dl
         |  FROM tfv t JOIN wqenr e ON e.word = t.word
         |  JOIN lens l ON l.doc_id = t.doc_id
         |  CROSS JOIN ctok),
         |wqsc AS (
         |  SELECT query_id, doc_id,
         |    list_reduce(list(c ORDER BY word), (a, x) -> a + x)
         |      + nqw * ln(CAST(2000 AS DOUBLE)
         |          / (CAST(dl AS DOUBLE) + CAST(2000 AS DOUBLE)))
         |      AS score
         |  FROM wqcon JOIN wqn USING (query_id)
         |  GROUP BY query_id, doc_id, nqw, dl)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM wqsc) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin

  private lazy val Rm3Ctes =
    s"""rtop AS (
       |  SELECT query_id, doc_id, score FROM (
       |    SELECT query_id, doc_id, score,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, doc_id) AS r
       |    FROM bscores) x WHERE r <= 10),
       |zq AS (
       |  SELECT query_id,
       |    list_reduce(list_prepend(0.0, list(score ORDER BY doc_id)),
       |      (a, x) -> a + x) AS z
       |  FROM rtop GROUP BY 1),
       |fbm AS (
       |  SELECT r.query_id, t.word,
       |    list_reduce(list_prepend(0.0, list(
       |      (CAST(t.tf AS DOUBLE) / CAST(l.dl AS DOUBLE)) * (r.score / z.z)
       |      ORDER BY t.doc_id)), (a, x) -> a + x) AS pw
       |  FROM rtop r
       |  JOIN tfv t ON t.doc_id = r.doc_id
       |  JOIN lens l ON l.doc_id = t.doc_id
       |  JOIN zq z ON z.query_id = r.query_id
       |  GROUP BY r.query_id, t.word),
       |fbkept AS (
       |  SELECT query_id, word, pw FROM (
       |    SELECT query_id, word, pw,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY pw DESC, word) AS r
       |    FROM fbm) y WHERE r <= 10),
       |fbnorm AS (
       |  SELECT query_id,
       |    list_reduce(list_prepend(0.0, list(pw ORDER BY word)),
       |      (a, x) -> a + x) AS s
       |  FROM fbkept GROUP BY 1),
       |fbw AS (
       |  SELECT k.query_id, k.word, k.pw / n.s AS fw
       |  FROM fbkept k JOIN fbnorm n USING (query_id)),
       |own AS (SELECT query_id, count(*) AS n FROM qterms GROUP BY 1),
       |ow AS (
       |  SELECT q.query_id, q.word, 1.0 / CAST(o.n AS DOUBLE) AS owt
       |  FROM qterms q JOIN own o USING (query_id)),
       |fbq AS (SELECT DISTINCT query_id FROM fbw),
       |finalw AS (
       |  SELECT coalesce(a.query_id, f.query_id) AS query_id,
       |    coalesce(a.word, f.word) AS word,
       |    CAST(0.5 AS DOUBLE) * coalesce(owt, 0.0) +
       |      CAST(0.5 AS DOUBLE) * coalesce(fw, 0.0) AS weight
       |  FROM ow a FULL OUTER JOIN fbw f
       |    ON a.query_id = f.query_id AND a.word = f.word
       |  WHERE coalesce(a.query_id, f.query_id) IN
       |    (SELECT query_id FROM fbq)
       |  UNION ALL
       |  -- the RM3 empty-feedback fallback the operator implements:
       |  -- a query with NO feedback terms keeps its original uniform
       |  -- weights at any lambda (no fixture query triggers it —
       |  -- every query is a doc prefix that self-matches — but the
       |  -- oracle defines the semantics, not just the reachable rows)
       |  SELECT query_id, word, owt AS weight FROM ow
       |  WHERE query_id NOT IN (SELECT query_id FROM fbq))""".stripMargin

  /** The q188 positional-containment CTE chain (downstream of
    * [[QShared.LiveWordsCte]]'s `ws`), parameterized by the posts
    * CTE's doc condition — shared by q188/q193/q194 (occurrence
    * counts) and q195 (candidate restriction for phrase-constrained
    * ranking). Emits `posts`, `ph`, `qn`, `mt`, `occ`.
    */
  private def phraseCandCtes(postsCond: String): String =
    s"""posts AS (
       |  SELECT doc_id, CAST(j - 1 AS BIGINT) AS pos, w[CAST(j AS INT)] AS word
       |  FROM ws, unnest(generate_series(1, len(w))) AS t(j)
       |  WHERE $postsCond),
       |ph AS (
       |  SELECT doc_id AS query_id, CAST(i AS BIGINT) AS i,
       |    w[CAST(i + 2 AS INT)] AS word
       |  FROM ws, unnest(generate_series(0, least(2, len(w) - 2))) AS t(i)
       |  WHERE doc_id % 101 = 0 AND len(w) >= 2),
       |qn AS (SELECT query_id, count(*) AS n FROM ph GROUP BY 1),
       |mt AS (
       |  SELECT p.query_id, t.doc_id, t.pos - p.i AS s, p.i
       |  FROM ph p JOIN posts t USING (word)),
       |occ AS (
       |  SELECT query_id, doc_id, s, count(DISTINCT i) AS m
       |  FROM mt WHERE s >= 0 GROUP BY 1, 2, 3)""".stripMargin

  /** The q188 phrase-containment replay, parameterized by the posts
    * CTE's doc condition (shared by q188/q193/q194 — the full-corpus
    * and survivor replays are the SAME first-principles semantics over
    * different index populations; phrase queries always come from the
    * full doc set).
    */
  private def phraseProbeOracle(postsCond: String): String =
    s"""WITH $LiveWordsCte,
       |${phraseCandCtes(postsCond)}
       |SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
       |FROM occ JOIN qn USING (query_id)
       |WHERE m = n
       |GROUP BY query_id, doc_id
       |ORDER BY query_id, doc_id""".stripMargin

  /** q222's query TEXT: word 2 alone for every other query doc (the
    * deliberately under-filling single-term shape), the 40-char prefix
    * otherwise — one line (the zipfTextSql stripMargin rule).
    */
  private lazy val TieredQueryTextSql: String =
    s"CASE WHEN doc_id % 194 = 0 THEN array_to_string(list_slice(" +
      s"list_filter(string_split_regex(regexp_replace(lower(text), " +
      s"'[^a-z0-9$WsClass]', ' ', 'g'), '[$WsClass]+'), x -> x != ''), " +
      s"2, 2), '') ELSE substr(text, 1, 40) END"

  /** The q188 query shape's TEXT as a DuckDB expression (words 2..4 of
    * the doc, re-joined) — q195's bm25Cte query side must tokenize the
    * SAME string the Spark side builds with `slice(normalizedWords)`.
    */
  private lazy val PhraseQueryTextSql: String =
    s"array_to_string(list_slice(list_filter(string_split_regex(" +
      s"regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'), " +
      s"'[$WsClass]+'), x -> x != ''), 2, 4), ' ')"


  /** The QL WAND decision table from first principles over the Zipf
    * fixture, with the CORPUS membership parameterized — shared by
    * q224 (the full corpus) and q238 (the post-delete survivors,
    * whose impact metadata went through compactImpactStatsDeleted):
    * per-word (max_tf, min_dl) off the live posting rows, the
    * per-term ceiling ln(1 + max_tf·|C|/(mu·cf)) word-sorted-folded
    * x(1+1e-9), the dl-floor normalizer x(1-1e-9) (margin constants
    * exact toString round-trips), theta from the QL scores of the
    * rare-term candidate pairs, and the routing predicate verbatim.
    */
  private def qlWandStatsOracle(corpusWhere: String): String =
    s"""WITH ${bm25Cte(corpusWhere, "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |$QlCtes,
         |hotcut AS (SELECT count(*) // 10 AS cut FROM corpus),
         |split AS (
         |  SELECT query_id, word, df, cut
         |  FROM qterms JOIN dft USING (word) CROSS JOIN hotcut),
         |counts AS (
         |  SELECT query_id,
         |    CAST(sum(CASE WHEN df <= cut THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_rare_terms,
         |    CAST(sum(CASE WHEN df > cut THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_hot_terms
         |  FROM split GROUP BY 1),
         |cands AS (
         |  SELECT DISTINCT s.query_id, t.doc_id
         |  FROM split s JOIN tfv t USING (word) WHERE s.df <= s.cut),
         |ncand AS (
         |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates
         |  FROM cands GROUP BY 1),
         |imps AS (
         |  SELECT t.word, max(t.tf) AS max_tf, min(l.dl) AS min_dl
         |  FROM tfv t JOIN lens l ON l.doc_id = t.doc_id
         |  GROUP BY 1),
         |qlagg AS (
         |  SELECT s.query_id,
         |    list_reduce(list_prepend(0.0, list(
         |      ln(1.0 + CAST(i.max_tf AS DOUBLE) * ctokens
         |        / (CAST(2000 AS DOUBLE) * CAST(c.cf AS DOUBLE)))
         |      ORDER BY s.word)), (a, x) -> a + x) AS pos,
         |    min(i.min_dl) AS mdl
         |  FROM split s JOIN cft c USING (word) JOIN imps i USING (word)
         |  CROSS JOIN ctok
         |  WHERE s.df > s.cut
         |  GROUP BY s.query_id),
         |ubt AS (
         |  SELECT query_id,
         |    pos * CAST('${(1.0 + 1e-9).toString}' AS DOUBLE)
         |      + CAST(nq AS DOUBLE) * ln(CAST(2000 AS DOUBLE)
         |          / (CAST(mdl AS DOUBLE) + CAST(2000 AS DOUBLE)))
         |        * CAST('${(1.0 - 1e-9).toString}' AS DOUBLE) AS ub
         |  FROM qlagg JOIN qnq USING (query_id)),
         |cscore AS (
         |  SELECT q.query_id, q.doc_id, q.score
         |  FROM qlsc q JOIN cands c USING (query_id, doc_id)),
         |th AS (
         |  SELECT query_id, score AS theta FROM (
         |    SELECT query_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM cscore) x WHERE r = 5)
         |SELECT c.query_id, n_rare_terms, n_hot_terms,
         |  CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
         |  round(ub, 6) AS ub, round(theta, 6) AS theta,
         |  NOT (n_hot_terms > 0 AND (theta IS NULL OR ub >= theta)) AS safe
         |FROM counts c
         |LEFT JOIN ncand USING (query_id)
         |LEFT JOIN ubt USING (query_id)
         |LEFT JOIN th USING (query_id)
         |ORDER BY query_id""".stripMargin

  /** The BM25F WAND decision table from first principles over the
    * FIELDED Zipf fixture, with the CORPUS membership parameterized —
    * shared by q240 (the full corpus) and q247 (the post-delete
    * survivors, whose fielded impact metadata went through
    * compactImpactStatsFieldedDeleted): per-(word, field)
    * (max_tf, min_fl) extremes off the LIVE fielded posting rows, the
    * field-sorted composed pseudo-tf ceiling, idf·t̃f_ub/(k1+t̃f_ub),
    * the ×(1+1e-9) margin (exact toString round-trip), θ from the
    * fielded scores of the rare-term candidates, and the routing
    * predicate verbatim — so a stale or wrongly-merged fielded impact
    * row moves ub/safe even when the top-k survives it.
    */
  private def bm25fWandStatsOracle(corpusWhere: String): String =
    s"""WITH ${bm25fCtes(s"substr($ZipfWandCorpusTextSql, 1, 40)",
           s"substr($ZipfWandCorpusTextSql, 41)",
           corpusWhere, "doc_id % 50 = 0", ZipfWandQueryTextSql)},
       |hotcut AS (
       |  SELECT count(DISTINCT doc_id) // 10 AS cut FROM fcorpus),
       |split AS (
       |  SELECT f.query_id, f.word, d.df, cut
       |  FROM fqt f JOIN fdf d USING (word) CROSS JOIN hotcut),
       |counts AS (
       |  SELECT query_id,
       |    CAST(sum(CASE WHEN df <= cut THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_rare_terms,
       |    CAST(sum(CASE WHEN df > cut THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_hot_terms
       |  FROM split GROUP BY 1),
       |cands AS (
       |  SELECT DISTINCT s.query_id, t.doc_id
       |  FROM split s JOIN fftf t USING (word) WHERE s.df <= s.cut),
       |ncand AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates
       |  FROM cands GROUP BY 1),
       |fimp AS (
       |  SELECT t.word, t.field, max(t.tf) AS max_tf, min(l.fl) AS min_fl
       |  FROM fftf t JOIN flen l
       |    ON l.doc_id = t.doc_id AND l.field = t.field
       |  GROUP BY 1, 2),
       |ftfub AS (
       |  SELECT word,
       |    list_reduce(list_prepend(0.0, list(
       |      (CASE WHEN i.field = 'title' THEN CAST(2.0 AS DOUBLE)
       |            ELSE CAST(1.0 AS DOUBLE) END) * CAST(i.max_tf AS DOUBLE)
       |      / (1.0 - (CASE WHEN i.field = 'title'
       |                THEN CAST(0.5 AS DOUBLE)
       |                ELSE CAST(0.75 AS DOUBLE) END)
       |         + (CASE WHEN i.field = 'title'
       |            THEN CAST(0.5 AS DOUBLE)
       |            ELSE CAST(0.75 AS DOUBLE) END)
       |           * CAST(i.min_fl AS DOUBLE) / a.avgfl)
       |      ORDER BY i.field)), (acc, x) -> acc + x) AS tfub
       |  FROM fimp i JOIN favg a ON a.field = i.field
       |  GROUP BY 1),
       |hotceil AS (
       |  SELECT s.query_id, s.word,
       |    e.idf * u.tfub / (CAST(1.2 AS DOUBLE) + u.tfub) AS hc
       |  FROM split s
       |  JOIN fenr e ON e.query_id = s.query_id AND e.word = s.word
       |  JOIN ftfub u ON u.word = s.word
       |  WHERE s.df > s.cut),
       |ubt AS (
       |  SELECT query_id,
       |    list_reduce(list_prepend(0.0, list(hc ORDER BY word)),
       |      (a, x) -> a + x)
       |      * CAST('${(1.0 + 1e-9).toString}' AS DOUBLE) AS ub
       |  FROM hotceil GROUP BY 1),
       |cscore AS (
       |  SELECT q.query_id, q.doc_id, q.score
       |  FROM fsc q JOIN cands c USING (query_id, doc_id)),
       |th AS (
       |  SELECT query_id, score AS theta FROM (
       |    SELECT query_id, score,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, doc_id) AS r
       |    FROM cscore) x WHERE r = 5)
       |SELECT c.query_id, n_rare_terms, n_hot_terms,
       |  CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
       |  round(ub, 6) AS ub, round(theta, 6) AS theta,
       |  NOT (n_hot_terms > 0 AND (theta IS NULL OR ub >= theta)) AS safe
       |FROM counts c
       |LEFT JOIN ncand USING (query_id)
       |LEFT JOIN ubt USING (query_id)
       |LEFT JOIN th USING (query_id)
       |ORDER BY query_id""".stripMargin

  /** The full BM25F chain in SQL, parameterized over the corpus
    * (title/body expressions + membership) and the query shape —
    * shared by q202 (documents at %97) and q239/q240 (the fielded
    * Zipf fixture): per-field tokenization and lengths, exact-sum
    * per-field avgfl, document-level df/N over any-field matches, the
    * field-ORDER pseudo-tf fold, idf*ptf/(k1+ptf), and the
    * word-sorted score fold. Emits `fdocs..fsc` (plus `fftf`, `flen`,
    * `favg`, `fdf`, `fenr` for the q240 decision-table tail).
    */
  private def bm25fCtes(titleSql: String, bodySql: String,
                        corpusWhere: String, queryWhere: String,
                        queryText: String): String =
    s"""fdocs AS (
       |  SELECT doc_id, 'title' AS field, $titleSql AS ftext
       |  FROM documents WHERE $corpusWhere
       |  UNION ALL
       |  SELECT doc_id, 'body', $bodySql FROM documents
       |  WHERE $corpusWhere),
       |fcorpus AS (
       |  SELECT doc_id, field, list_filter(string_split_regex(
       |      regexp_replace(lower(ftext), '[^a-z0-9$WsClass]', ' ', 'g'),
       |      '[$WsClass]+'), x -> x != '') AS ws
       |  FROM fdocs
       |  WHERE doc_id IS NOT NULL
       |    AND regexp_matches(lower(ftext), '[a-z0-9]')),
       |fftf AS (
       |  SELECT doc_id, field, word, count(*) AS tf
       |  FROM (SELECT doc_id, field, unnest(ws) AS word FROM fcorpus)
       |  GROUP BY 1, 2, 3),
       |flen AS (
       |  SELECT doc_id, field, CAST(len(ws) AS BIGINT) AS fl
       |  FROM fcorpus),
       |favg AS (
       |  SELECT field, CAST(sum(fl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    AS avgfl
       |  FROM flen GROUP BY 1),
       |fn AS (
       |  SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM fcorpus),
       |fdf AS (
       |  SELECT word, count(DISTINCT doc_id) AS df FROM fftf GROUP BY 1),
       |fptf AS (
       |  SELECT f.doc_id, f.word,
       |    list_reduce(list_prepend(0.0, list(
       |      (CASE WHEN f.field = 'title' THEN CAST(2.0 AS DOUBLE)
       |            ELSE CAST(1.0 AS DOUBLE) END) * CAST(f.tf AS DOUBLE)
       |      / (1.0 - (CASE WHEN f.field = 'title'
       |                THEN CAST(0.5 AS DOUBLE)
       |                ELSE CAST(0.75 AS DOUBLE) END)
       |         + (CASE WHEN f.field = 'title'
       |            THEN CAST(0.5 AS DOUBLE)
       |            ELSE CAST(0.75 AS DOUBLE) END)
       |           * CAST(l.fl AS DOUBLE) / a.avgfl)
       |      ORDER BY f.field)), (acc, x) -> acc + x) AS ptf
       |  FROM fftf f
       |  JOIN flen l ON l.doc_id = f.doc_id AND l.field = f.field
       |  JOIN favg a ON a.field = f.field
       |  GROUP BY 1, 2),
       |fqt AS (
       |  SELECT doc_id AS query_id, unnest(list_distinct(list_filter(
       |      string_split_regex(
       |        regexp_replace(lower($queryText),
       |          '[^a-z0-9$WsClass]', ' ', 'g'),
       |        '[$WsClass]+'), x -> x != ''))) AS word
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND $queryWhere
       |    AND regexp_matches(lower($queryText), '[a-z0-9]')),
       |fenr AS (
       |  SELECT query_id, word,
       |    ln(1.0 + (n - CAST(df AS DOUBLE) + 0.5)
       |             / (CAST(df AS DOUBLE) + 0.5)) AS idf
       |  FROM fqt JOIN fdf USING (word) CROSS JOIN fn),
       |fcon AS (
       |  SELECT e.query_id, p.doc_id, p.word,
       |    e.idf * p.ptf / (CAST(1.2 AS DOUBLE) + p.ptf) AS c
       |  FROM fptf p JOIN fenr e ON e.word = p.word),
       |fsc AS (
       |  SELECT query_id, doc_id,
       |    list_reduce(list(c ORDER BY word), (a, x) -> a + x) AS score
       |  FROM fcon GROUP BY 1, 2)""".stripMargin


  /** The full fielded chain over the documents fixture (title/body at
    * char 40, queries at doc_id % 97) — shared by q202 (the fresh
    * build) and q243 (the probe through the compacted fielded stat
    * triple): a stats-merge drift must fail against the rebuild.
    */
  private lazy val Bm25fDocumentsOracle =
    s"""WITH ${bm25fCtes("substr(text, 1, 40)", "substr(text, 41)",
           "TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")}
       |SELECT query_id, doc_id, round(score, 6) AS score,
       |  CAST(rank AS BIGINT) AS rank
       |FROM (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS rank
       |  FROM fsc) z
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** The fresh-build passage-MaxP replay (segmentation window
    * arithmetic included) — shared by q203 (the probe gate) and q235
    * (the lifecycle gate): a compacted layout must be
    * indistinguishable from this rebuild.
    */
  /** The width-32/stride-16 segmentation CTE (window arithmetic
    * included) — ONE definition downstream of [[LiveWordsCte]],
    * shared by [[PassageMaxpOracle]] (q203/q235/q245) and
    * [[PassageWandStatsOracle]] (q246): a window-boundary drift must
    * fail every gate that claims to read "the passage corpus".
    */
  private lazy val PassageCte: String =
    s"""pass AS (
       |  SELECT doc_id,
       |    CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)
       |      AS passage_id,
       |    array_to_string(list_slice(w,
       |      CAST(i * 16 + 1 AS BIGINT),
       |      CAST(i * 16 + 32 AS BIGINT)), ' ') AS text
       |  FROM ws, unnest(generate_series(0,
       |    greatest(CAST(1 AS BIGINT),
       |      CAST(ceil((CAST(len(w) AS DOUBLE) - 32) / 16) AS BIGINT)
       |        + 1) - 1)) AS t(i))""".stripMargin

  private lazy val PassageMaxpOracle =
    s"""WITH $LiveWordsCte,
         |$PassageCte,
         |${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)",
             "text", "pass", "passage_id")},
         |pmap AS (SELECT DISTINCT passage_id, doc_id FROM pass),
         |maxp AS (
         |  SELECT b.query_id, p.doc_id, max(b.score) AS score
         |  FROM bscores b JOIN pmap p ON p.passage_id = b.doc_id
         |  GROUP BY 1, 2)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM maxp) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin

  /** The MaxP WAND decision table from first principles (q246): the
    * passage pseudo-corpus ([[PassageCte]]) scored by [[bm25Cte]], the
    * |passages|/10 hot cut, candidate (query, PASSAGE) pairs from the
    * rare postings, per-word passage-level (max_tf, min_dl) extremes
    * and the impact-tightened word-sorted ceiling fold ×(1+1e-9)
    * (q205's arithmetic over passage rows), θ as the kth
    * DOCUMENT-level max among candidates — the doc-level cutoff
    * [[graft.operators.Passages.maxPassageTopKWand]]'s safety proof
    * routes on — and the routing predicate verbatim.
    */
  private lazy val PassageWandStatsOracle =
    s"""WITH $LiveWordsCte,
       |$PassageCte,
       |${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)",
           "text", "pass", "passage_id")},
       |pmap AS (SELECT DISTINCT passage_id, doc_id FROM pass),
       |hotcut AS (SELECT count(*) // 10 AS cut FROM corpus),
       |split AS (
       |  SELECT query_id, word, df, cut
       |  FROM qterms JOIN dft USING (word) CROSS JOIN hotcut),
       |counts AS (
       |  SELECT query_id,
       |    CAST(sum(CASE WHEN df <= cut THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_rare_terms,
       |    CAST(sum(CASE WHEN df > cut THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_hot_terms
       |  FROM split GROUP BY 1),
       |cands AS (
       |  SELECT DISTINCT s.query_id, t.doc_id
       |  FROM split s JOIN tfv t USING (word) WHERE s.df <= s.cut),
       |ncand AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates
       |  FROM cands GROUP BY 1),
       |imps AS (
       |  SELECT t.word, max(t.tf) AS max_tf, min(l.dl) AS min_dl
       |  FROM tfv t JOIN lens l ON l.doc_id = t.doc_id
       |  GROUP BY 1),
       |ubt AS (
       |  SELECT e.query_id,
       |    list_reduce(list_prepend(0.0, list(
       |      e.idf * (CAST(max_tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
       |        / (CAST(max_tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
       |           (1.0 - CAST(0.75 AS DOUBLE) +
       |            CAST(0.75 AS DOUBLE) * CAST(min_dl AS DOUBLE) / e.avgdl))
       |      ORDER BY e.word)), (a, x) -> a + x) *
       |      CAST('${(1.0 + 1e-9).toString}' AS DOUBLE) AS ub
       |  FROM enriched e JOIN dft d USING (word) JOIN imps USING (word)
       |  CROSS JOIN hotcut
       |  WHERE d.df > cut GROUP BY e.query_id),
       |cscore AS (
       |  SELECT b.query_id, b.doc_id, b.score
       |  FROM bscores b JOIN cands c USING (query_id, doc_id)),
       |cmaxp AS (
       |  SELECT c.query_id, p.doc_id, max(c.score) AS score
       |  FROM cscore c JOIN pmap p ON p.passage_id = c.doc_id
       |  GROUP BY 1, 2),
       |th AS (
       |  SELECT query_id, score AS theta FROM (
       |    SELECT query_id, score,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, doc_id) AS r
       |    FROM cmaxp) x WHERE r = 5)
       |SELECT c.query_id, n_rare_terms, n_hot_terms,
       |  CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
       |  round(ub, 6) AS ub, round(theta, 6) AS theta,
       |  NOT (n_hot_terms > 0 AND (theta IS NULL OR ub >= theta)) AS safe
       |FROM counts c
       |LEFT JOIN ncand USING (query_id)
       |LEFT JOIN ubt USING (query_id)
       |LEFT JOIN th USING (query_id)
       |ORDER BY query_id""".stripMargin

  /** The CORI resource-selection replay (the 4-shard doc_id % 4
    * split): shard-level metadata, the T·I belief with the absent-
    * term prior, and the word-sorted per-shard mean — shared by q215
    * (the selection gate) and q237 (the federated select → probe →
    * merge gate), the one-definition rule for "the CORI ranking".
    * Emits `sdf`, `scw`, `cstats`, `scft`, `sqcf`, `sqnq`, `cells`,
    * `csum`, `scored` (the s-prefixed names keep the shard-metadata
    * CTEs disjoint from QlCtes' cf-side ones, so q242 can use both);
    * expects `tfv`/`lens`/`qterms` from
    * [[bm25Cte]].
    */
  private lazy val CoriCtes =
    s"""sdf AS (
       |  SELECT CAST(doc_id % 4 AS BIGINT) AS shard, word,
       |    CAST(count(*) AS BIGINT) AS df
       |  FROM tfv GROUP BY 1, 2),
       |scw AS (
       |  SELECT CAST(doc_id % 4 AS BIGINT) AS shard,
       |    CAST(sum(dl) AS BIGINT) AS cw
       |  FROM lens GROUP BY 1),
       |cstats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS cc,
       |    CAST(sum(cw) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgcw
       |  FROM scw),
       |scft AS (SELECT word, CAST(count(*) AS BIGINT) AS scf
       |        FROM sdf GROUP BY 1),
       |sqcf AS (SELECT query_id, word, scf
       |        FROM qterms JOIN scft USING (word)),
       |sqnq AS (SELECT query_id, count(*) AS snq FROM sqcf GROUP BY 1),
       |cells AS (
       |  SELECT q.query_id, s.shard, q.word,
       |    CAST(0.4 AS DOUBLE) + CAST(0.6 AS DOUBLE) *
       |      (CAST(coalesce(d.df, 0) AS DOUBLE)
       |        / (CAST(coalesce(d.df, 0) AS DOUBLE)
       |           + CAST(50.0 AS DOUBLE)
       |           + CAST(150.0 AS DOUBLE) * CAST(s.cw AS DOUBLE)
       |             / avgcw)) *
       |      (ln((cc + 0.5) / CAST(q.scf AS DOUBLE)) / ln(cc + 1.0))
       |      AS p
       |  FROM sqcf q CROSS JOIN scw s
       |  LEFT JOIN sdf d ON d.shard = s.shard AND d.word = q.word
       |  CROSS JOIN cstats),
       |csum AS (
       |  SELECT query_id, shard,
       |    list_reduce(list(p ORDER BY word), (a, x) -> a + x) AS ssum
       |  FROM cells GROUP BY 1, 2),
       |scored AS (
       |  SELECT query_id, shard, ssum / CAST(snq AS DOUBLE) AS score
       |  FROM csum JOIN sqnq USING (query_id))""".stripMargin

  /** The federated select → probe → merge replay over the Zipf WAND
    * fixture (q237's chain on q182's corpus/queries) — ONE definition
    * shared by q248 (the forced-WAND exactness gate) and q251 (the
    * routed default, which serves this fixture unpruned): a selection
    * or merge drift must fail BOTH gates, and the two branches'
    * shared answer is pinned to the same string.
    */
  private lazy val FederatedZipfTopKOracle: String =
    s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
           ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
       |$CoriCtes,
       |sel AS (
       |  SELECT query_id, shard FROM (
       |    SELECT query_id, shard,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, shard) AS r
       |    FROM scored) z WHERE r <= 2),
       |probed AS (
       |  SELECT b.query_id, b.doc_id, b.score
       |  FROM bscores b JOIN sel s ON s.query_id = b.query_id
       |    AND s.shard = CAST(b.doc_id % 4 AS BIGINT))
       |SELECT query_id, doc_id, round(score, 6) AS score,
       |  CAST(rank AS BIGINT) AS rank
       |FROM (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS rank
       |  FROM probed) z
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** The query-likelihood Dirichlet chain replayed in SQL, downstream
    * of [[bm25Cte]]'s `tfv`/`lens`/`qterms` (shared by q199/q201):
    * cf = Σ tf per word, |C| = Σ dl, the matching-term sum as a
    * word-sorted fold, and the `|q|·ln(μ/(dl+μ))` normalizer added
    * once after the fold — the operator's exact tree at μ = 2000.
    * Emits `cft`, `ctok`, `qcf`, `qnq`, `qlcon`, `qlsc`.
    */
  private lazy val QlCtes =
    s"""cft AS (SELECT word, sum(tf) AS cf FROM tfv GROUP BY 1),
       |ctok AS (SELECT CAST(sum(dl) AS DOUBLE) AS ctokens FROM lens),
       |qcf AS (SELECT query_id, word, cf FROM qterms JOIN cft USING (word)),
       |qnq AS (SELECT query_id, count(*) AS nq FROM qcf GROUP BY 1),
       |qlcon AS (
       |  SELECT q.query_id, t.doc_id, t.word,
       |    ln(1.0 + CAST(t.tf AS DOUBLE) * ctokens
       |      / (CAST(2000 AS DOUBLE) * CAST(q.cf AS DOUBLE))) AS c,
       |    l.dl
       |  FROM tfv t JOIN qcf q ON q.word = t.word
       |  JOIN lens l ON l.doc_id = t.doc_id
       |  CROSS JOIN ctok),
       |qlsc AS (
       |  SELECT query_id, doc_id,
       |    list_reduce(list(c ORDER BY word), (a, x) -> a + x)
       |      + CAST(nq AS DOUBLE) *
       |        ln(CAST(2000 AS DOUBLE)
       |           / (CAST(dl AS DOUBLE) + CAST(2000 AS DOUBLE)))
       |      AS score
       |  FROM qlcon JOIN qnq USING (query_id)
       |  GROUP BY query_id, doc_id, nq, dl)""".stripMargin

  /** The weighted second-pass scoring chain replayed in SQL,
    * downstream of [[Rm3Ctes]]' `finalw` and [[bm25Cte]]'s
    * `tfv`/`lens`/`stats`/`dft` (shared by q190/q191/q192): expansion
    * weights × the identical BM25 contribution tree
    * (`weight * ((idf * X) / Y)` — the operator's exact association),
    * term-sorted fold. `wenr` carries df for q192's rare/hot readout.
    */
  private lazy val Rm3RescoreCtes =
    s"""wenr AS (
       |  SELECT f.query_id, f.word, f.weight, avgdl, df,
       |    ln(1.0 + (n_docs - CAST(df AS DOUBLE) + 0.5)
       |             / (CAST(df AS DOUBLE) + 0.5)) AS idf
       |  FROM finalw f JOIN dft USING (word) CROSS JOIN stats),
       |wcon AS (
       |  SELECT e.query_id, t.doc_id, t.word,
       |    e.weight * ((e.idf *
       |      (CAST(t.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))) /
       |      (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
       |       (1.0 - CAST(0.75 AS DOUBLE) +
       |        CAST(0.75 AS DOUBLE) * CAST(l.dl AS DOUBLE) / avgdl)))
       |      AS c
       |  FROM tfv t JOIN wenr e ON e.word = t.word
       |  JOIN lens l ON l.doc_id = t.doc_id),
       |wsc AS (
       |  SELECT query_id, doc_id,
       |    list_reduce(list(c ORDER BY word), (a, x) -> a + x) AS score
       |  FROM wcon GROUP BY 1, 2)""".stripMargin

  /** The q168/q169 Viterbi DP replay (cells per position, final cell
    * non-null = segmentable): shared so the budget readout and the
    * segmentation gate cannot drift.
    */
  private lazy val UnigramDpCtes =
    s"""wf AS (
       |  SELECT word, count(*) AS freq
       |  FROM (SELECT unnest(ws) AS word FROM words) GROUP BY word),
       |dp AS (
       |  SELECT word, freq,
       |    list_reduce(
       |      list_prepend(
       |        [{'s': CAST(0.0 AS DOUBLE), 'nnp': 0, 'bl': 0}],
       |        [[{'s': CAST(i AS DOUBLE), 'nnp': 0, 'bl': 0}]
       |         FOR i IN generate_series(1, length(word))]),
       |      (acc, x) -> list_append(acc,
       |        list_max([
       |          {'s': acc[CAST(x[1].s AS INT) - l + 1].s
       |              + ($UnigramLpsSql)[list_position($UnigramPiecesSql,
       |                  substr(word, CAST(x[1].s AS INT) - l + 1, l))],
       |           'nnp': acc[CAST(x[1].s AS INT) - l + 1].nnp - 1,
       |           'bl': l}
       |          FOR l IN generate_series(1,
       |            least($UnigramMaxLen, CAST(x[1].s AS INT)))
       |          IF acc[CAST(x[1].s AS INT) - l + 1] IS NOT NULL
       |            AND list_position($UnigramPiecesSql,
       |              substr(word, CAST(x[1].s AS INT) - l + 1, l)) > 0
       |        ]))) AS cells
       |  FROM wf),
       |fin AS (
       |  SELECT word, freq, cells, cells[length(word) + 1] AS cell
       |  FROM dp WHERE cells[length(word) + 1] IS NOT NULL)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q55_sql_native_simhash" -> SimHashOracle,

    // ---- repetition / chunk-dup / CMS oracles
    // docs shorter than n words have no width-n grams: no agg row for
    // that (doc, n), so the CASE max is NULL — and one-word docs vanish
    // entirely (no grams at any width), both matching the Spark pivot
    "q75_repetition_stats" ->
      s"""WITH $LiveWordsCte,
         |grams AS (
         |  SELECT doc_id, 2 AS n,
         |    unnest(list_transform(range(1, len(w)),
         |      i -> w[i] || ' ' || w[i+1])) AS g
         |  FROM ws
         |  UNION ALL
         |  SELECT doc_id, 3 AS n,
         |    unnest(list_transform(range(1, len(w) - 1),
         |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
         |  FROM ws),
         |cnt AS (SELECT doc_id, n, g, count(*) AS c FROM grams
         |        GROUP BY 1, 2, 3),
         |agg AS (SELECT doc_id, n, max(c) AS maxc, sum(c) AS sumc,
         |          count(*) AS distc
         |        FROM cnt GROUP BY 1, 2)
         |SELECT doc_id,
         |  round(max(CASE WHEN n = 2 THEN maxc::DOUBLE / sumc END), 4)
         |    AS top2gram_frac,
         |  round(max(CASE WHEN n = 2 THEN 1.0 - distc::DOUBLE / sumc END), 4)
         |    AS dup2gram_frac,
         |  round(max(CASE WHEN n = 3 THEN maxc::DOUBLE / sumc END), 4)
         |    AS top3gram_frac,
         |  round(max(CASE WHEN n = 3 THEN 1.0 - distc::DOUBLE / sumc END), 4)
         |    AS dup3gram_frac
         |FROM agg GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q76_chunk_stats" ->
      s"""WITH $LiveWordsCte,
         |chunks AS (
         |  SELECT doc_id, unnest(list_transform(
         |    range(0, CAST(ceil(len(w) / 8.0) AS INT)),
         |    i -> array_to_string(w[i*8+1:i*8+8], ' '))) AS ch
         |  FROM ws WHERE len(w) > 0),
         |gc AS (SELECT ch, count(*) AS n FROM chunks GROUP BY 1)
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS dup_chunks,
         |  round(CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 4) AS dup_chunk_frac
         |FROM chunks JOIN gc USING (ch)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // window frames: both engines default to RANGE ... CURRENT ROW, and
    // ids are unique within a shard, so the prefix sums agree exactly
    "q82_token_packing" ->
      s"""WITH $LiveWordsCte,
         |c AS (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         |    ${h60("'pack:' || doc_id")} % 8 AS shard
         |  FROM ws),
         |a AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
         |      AS BIGINT) AS cum_tokens
         |  FROM c)
         |SELECT doc_id, shard, n_tokens, cum_tokens,
         |  CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE) / 512)
         |    AS BIGINT) AS pack_id
         |FROM a ORDER BY doc_id""".stripMargin,
    "q83_pack_digests" ->
      s"""WITH $LiveWordsCte,
         |c AS (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         |    ${h60("'pack:' || doc_id")} % 8 AS shard
         |  FROM ws),
         |a AS (
         |  SELECT doc_id, shard, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
         |      AS cum
         |  FROM c),
         |p AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 512) AS BIGINT)
         |      AS pack_id
         |  FROM a)
         |SELECT shard, pack_id, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  md5(string_agg(d.text, ' ' ORDER BY doc_id)) AS pack_md5
         |FROM p JOIN documents d USING (doc_id)
         |GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin,

    "q84_blocklist" ->
      s"""WITH $WordsCte
         |SELECT doc_id,
         |  CAST(len(list_filter(ws,
         |    w -> w IN ('slow', 'dup', 'batch'))) AS BIGINT) AS n_blocked,
         |  CAST(len(list_intersect(list_distinct(ws),
         |    ['slow', 'dup', 'batch'])) AS BIGINT) AS n_blocked_distinct,
         |  len(list_filter(ws, w -> w IN ('slow', 'dup', 'batch'))) <= 2
         |    AS keep
         |FROM words WHERE doc_id IS NOT NULL
         |ORDER BY doc_id""".stripMargin,
    // counts via split cardinality: both engines' regex split keeps
    // trailing empty fields, so len(parts) - 1 = number of matches
    "q85_redact" ->
      s"""SELECT event_id, props,
         |  regexp_replace(props, '[0-9]+', '<NUM>', 'g')
         |    AS props_redacted,
         |  CAST(len(string_split_regex(props, '[0-9]+')) - 1 AS BIGINT)
         |    AS n_0
         |FROM events ORDER BY event_id""".stripMargin,
    // cutoffs re-derived from the data with IEEE-exact ops only
    // (sqrt, *, /, floor) in the same order the operator applies them
    "q86_temperature_mix" ->
      s"""WITH c AS (
         |  SELECT source, count(*) AS n FROM documents GROUP BY source),
         |m AS (SELECT max(n) AS max_n FROM c),
         |r AS (
         |  SELECT source,
         |    CAST(floor(LEAST(1.0, 0.5 * sqrt(
         |      CAST(max_n AS DOUBLE) / CAST(n AS DOUBLE))) * 1000000.0)
         |      AS BIGINT) AS cut
         |  FROM c CROSS JOIN m),
         |b AS (
         |  SELECT doc_id, source,
         |    ${h60("'graft:'||doc_id")} % 1000000 AS bkt
         |  FROM documents)
         |SELECT doc_id, source FROM b JOIN r USING (source)
         |WHERE bkt < cut
         |ORDER BY doc_id""".stripMargin,
    // exact interpolated percentile (quantile_cont ≡ Spark `percentile`,
    // the q15 convention); both engines gate on the 6-dp-rounded scalar
    // so a last-ulp interpolation difference cannot flip a boundary row
    "q88_quality_gate" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |    round(CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1), 4) AS alpha_ratio
         |  FROM documents),
         |t AS (
         |  SELECT round(CAST(quantile_cont(alpha_ratio, 0.25) AS DOUBLE), 6)
         |    AS threshold
         |  FROM s)
         |SELECT doc_id, alpha_ratio, threshold
         |FROM s CROSS JOIN t
         |WHERE alpha_ratio >= threshold
         |ORDER BY doc_id""".stripMargin,
    // window starts every 16 tokens; the last window reaches the end, and
    // docs shorter than the width yield their single short window
    "q89_token_chunks" ->
      s"""WITH $LiveWordsCte,
         |c AS (
         |  SELECT doc_id, w,
         |    greatest(1, CAST(ceil((len(w) - 32) / 16.0) AS BIGINT) + 1)
         |      AS nc
         |  FROM ws),
         |ch AS (
         |  SELECT doc_id, i AS chunk_idx,
         |    w[CAST(i*16 + 1 AS BIGINT):CAST(i*16 + 32 AS BIGINT)] AS toks
         |  FROM c, unnest(generate_series(0, nc - 1)) AS u(i))
         |SELECT doc_id, chunk_idx,
         |  CAST(len(toks) AS BIGINT) AS chunk_tokens,
         |  md5(array_to_string(toks, ' ')) AS chunk_md5
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    // unigram LM trained on src0, scored on the rest with add-one
    // smoothing; per-doc sum folds the token-ORDERED lp list (seeding
    // from the first element ≡ a 0.0 seed for IEEE addition), mirroring
    // the Spark side's sort_array fold bit for bit
    "q91_unigram_logprob" ->
      s"""WITH mwords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source = 'src0' AND regexp_matches(lower(text), '[a-z0-9]')),
         |counts AS (
         |  SELECT word, count(*) AS c
         |  FROM (SELECT unnest(ws) AS word FROM mwords) GROUP BY 1),
         |scalars AS (SELECT CAST(sum(c) AS DOUBLE) AS n_occ,
         |              CAST(count(*) AS DOUBLE) AS n_vocab FROM counts),
         |dwords AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source != 'src0' AND doc_id IS NOT NULL
         |    AND regexp_matches(lower(text), '[a-z0-9]')),
         |occ AS (
         |  SELECT doc_id, word, count(*) AS occ
         |  FROM (SELECT doc_id, unnest(ws) AS word FROM dwords)
         |  GROUP BY 1, 2),
         |contrib AS (
         |  SELECT doc_id, word, occ,
         |    CAST(occ AS DOUBLE) * ln((CAST(coalesce(c, 0) AS DOUBLE) + 1.0)
         |      / (n_occ + n_vocab)) AS lp
         |  FROM occ LEFT JOIN counts USING (word) CROSS JOIN scalars),
         |agg AS (
         |  SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_tokens,
         |    list_reduce(list(lp ORDER BY word), (a, b) -> a + b) AS sum_lp
         |  FROM contrib GROUP BY doc_id)
         |SELECT doc_id, n_tokens, round(sum_lp, 6) AS sum_logprob,
         |  round(sum_lp / CAST(n_tokens AS DOUBLE), 6) AS avg_logprob
         |FROM agg ORDER BY doc_id""".stripMargin,
    // range() is exclusive where Spark's sequence() is inclusive (+1);
    // list slices are 1-based inclusive and clamp like Spark's slice
    "q101_winnow" -> WinnowingOracle,
    // the SAME oracle gates the SQL-text path: q123's Spark side is
    // spark.sql(...) through the function registry
    "q123_sql_native_winnow" -> WinnowingOracle,
    // q101's selection chain at k=16/w=8, df-pruned, self-joined
    "q102_winnow_overlap" ->
      s"""WITH $WordsCte,
         |canon AS (
         |  SELECT doc_id, array_to_string(ws, ' ') AS c FROM words
         |  WHERE doc_id IS NOT NULL),
         |grams AS (
         |  SELECT doc_id,
         |    CASE WHEN length(c) >= 16 THEN
         |      list_transform(range(0, length(c) - 16 + 1),
         |        p -> ('0x'||substr(md5(substr(c, p + 1, 16)),1,15))::BIGINT)
         |    ELSE CAST([] AS BIGINT[]) END AS h
         |  FROM canon),
         |fps AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(h) > 0 THEN
         |      list_transform(range(0, greatest(len(h) - 8, 0) + 1),
         |        i -> list_min(h[(i+1):(i+8)]))
         |    ELSE CAST([] AS BIGINT[]) END)) AS fingerprint
         |  FROM grams),
         |dfreq AS (
         |  SELECT fingerprint, count(*) AS d FROM fps GROUP BY 1),
         |pruned AS (
         |  SELECT f.doc_id, f.fingerprint
         |  FROM fps f JOIN dfreq USING (fingerprint) WHERE d <= 5)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  count(*) AS shared_fps
         |FROM pruned a JOIN pruned b USING (fingerprint)
         |WHERE a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY id_a, id_b""".stripMargin,
    // q52's language label + q50's token count, rolled up (the CASE
    // tie-break order matches langPredFromHits exactly)
    "q100_corpus_report" ->
      s"""WITH $WordsCte,
         |perdoc AS (
         |  SELECT source, CAST(len(ws) AS BIGINT) AS n_words,
         |    CAST(len(list_filter(ws, w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS BIGINT) AS hits_en,
         |    CAST(len(list_filter(ws, w -> w IN ('le','la','les','de','et','un','une','est','que','pour'))) AS BIGINT) AS hits_fr,
         |    CAST(len(list_filter(ws, w -> w IN ('el','la','los','de','y','un','una','es','que','para'))) AS BIGINT) AS hits_es,
         |    CAST(len(list_filter(ws, w -> w IN ('der','die','das','und','ein','eine','ist','nicht','mit','von'))) AS BIGINT) AS hits_de
         |  FROM words),
         |lab AS (
         |  SELECT source, n_words,
         |    CASE
         |      WHEN hits_de = greatest(hits_en, hits_fr, hits_es, hits_de)
         |        AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'de'
         |      WHEN hits_en = greatest(hits_en, hits_fr, hits_es, hits_de)
         |        AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'en'
         |      WHEN hits_es = greatest(hits_en, hits_fr, hits_es, hits_de)
         |        AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'es'
         |      WHEN hits_fr = greatest(hits_en, hits_fr, hits_es, hits_de)
         |        AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'fr'
         |      ELSE 'und' END AS lang_pred
         |  FROM perdoc)
         |SELECT source, lang_pred, count(*) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_tokens,
         |  round(avg(n_words), 4) AS avg_tokens
         |FROM lab
         |GROUP BY ROLLUP(source, lang_pred)
         |ORDER BY source NULLS FIRST, lang_pred NULLS FIRST""".stripMargin,
    // the kernel's one pass ≡ NFC → strip non-ws controls → collapse the
    // tokenizer's ws class → trim (space-only trim is exact: after the
    // collapse every whitespace IS a space)
    "q99_clean_text" -> CleanTextOracle,
    "q125_sql_native_clean_text" -> CleanTextOracle,
    // q91's scoring chain + tercile cut points (quantile_cont = Spark's
    // exact interpolated percentile; both sides round the thresholds to
    // 6 dp and compare the RAW ordered-fold scores, so classification
    // is engine-identical)
    "q97_ppl_buckets" ->
      s"""WITH mwords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source = 'src0' AND regexp_matches(lower(text), '[a-z0-9]')),
         |counts AS (
         |  SELECT word, count(*) AS c
         |  FROM (SELECT unnest(ws) AS word FROM mwords) GROUP BY 1),
         |scalars AS (SELECT CAST(sum(c) AS DOUBLE) AS n_occ,
         |              CAST(count(*) AS DOUBLE) AS n_vocab FROM counts),
         |dwords AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source != 'src0' AND doc_id IS NOT NULL
         |    AND regexp_matches(lower(text), '[a-z0-9]')),
         |occ AS (
         |  SELECT doc_id, word, count(*) AS occ
         |  FROM (SELECT doc_id, unnest(ws) AS word FROM dwords)
         |  GROUP BY 1, 2),
         |contrib AS (
         |  SELECT doc_id, word, occ,
         |    CAST(occ AS DOUBLE) * ln((CAST(coalesce(c, 0) AS DOUBLE) + 1.0)
         |      / (n_occ + n_vocab)) AS lp
         |  FROM occ LEFT JOIN counts USING (word) CROSS JOIN scalars),
         |sc AS (
         |  SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_tokens,
         |    list_reduce(list(lp ORDER BY word), (a, b) -> a + b)
         |      / CAST(sum(occ) AS DOUBLE) AS avg_lp
         |  FROM contrib GROUP BY doc_id),
         |thr AS (
         |  SELECT
         |    round(CAST(quantile_cont(avg_lp, 0.3333333333333333) AS DOUBLE),
         |      6) AS t_lo,
         |    round(CAST(quantile_cont(avg_lp, 0.6666666666666666) AS DOUBLE),
         |      6) AS t_hi
         |  FROM sc)
         |SELECT doc_id, n_tokens, round(avg_lp, 6) AS avg_logprob,
         |  CASE WHEN avg_lp >= t_hi THEN 'head'
         |       WHEN avg_lp >= t_lo THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM sc CROSS JOIN thr ORDER BY doc_id""".stripMargin,
    // two add-one-smoothed unigram models (target src0, raw src1); the
    // per-word term is occ * (ln(target) - ln(raw)) in BOTH engines so
    // the token-sorted fold stays bit-identical
    "q98_dsir_weights" ->
      s"""WITH twords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source = 'src0' AND regexp_matches(lower(text), '[a-z0-9]')),
         |tcounts AS (
         |  SELECT word, count(*) AS tc
         |  FROM (SELECT unnest(ws) AS word FROM twords) GROUP BY 1),
         |tscalars AS (SELECT CAST(sum(tc) AS DOUBLE) AS t_occ,
         |               CAST(count(*) AS DOUBLE) AS t_vocab FROM tcounts),
         |rwords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source = 'src1' AND regexp_matches(lower(text), '[a-z0-9]')),
         |rcounts AS (
         |  SELECT word, count(*) AS rc
         |  FROM (SELECT unnest(ws) AS word FROM rwords) GROUP BY 1),
         |rscalars AS (SELECT CAST(sum(rc) AS DOUBLE) AS r_occ,
         |               CAST(count(*) AS DOUBLE) AS r_vocab FROM rcounts),
         |dwords AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source NOT IN ('src0', 'src1') AND doc_id IS NOT NULL
         |    AND regexp_matches(lower(text), '[a-z0-9]')),
         |occ AS (
         |  SELECT doc_id, word, count(*) AS occ
         |  FROM (SELECT doc_id, unnest(ws) AS word FROM dwords)
         |  GROUP BY 1, 2),
         |contrib AS (
         |  SELECT doc_id, word, occ,
         |    CAST(occ AS DOUBLE) *
         |      (ln((CAST(coalesce(tc, 0) AS DOUBLE) + 1.0)
         |         / (t_occ + t_vocab)) -
         |       ln((CAST(coalesce(rc, 0) AS DOUBLE) + 1.0)
         |         / (r_occ + r_vocab))) AS lw
         |  FROM occ LEFT JOIN tcounts USING (word)
         |    LEFT JOIN rcounts USING (word)
         |    CROSS JOIN tscalars CROSS JOIN rscalars),
         |agg AS (
         |  SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_tokens,
         |    list_reduce(list(lw ORDER BY word), (a, b) -> a + b) AS sum_lw
         |  FROM contrib GROUP BY doc_id)
         |SELECT doc_id, n_tokens, round(sum_lw, 6) AS log_weight,
         |  round(sum_lw / CAST(n_tokens AS DOUBLE), 6) AS avg_log_weight
         |FROM agg ORDER BY doc_id""".stripMargin,
    // the two-level Spark ranking must equal this one global row_number
    "q92_vocab" ->
      s"""WITH vwords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents WHERE regexp_matches(lower(text), '[a-z0-9]')),
         |counts AS (
         |  SELECT token, count(*) AS cnt
         |  FROM (SELECT unnest(ws) AS token FROM vwords) GROUP BY 1
         |  HAVING count(*) >= 2)
         |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
         |    AS token_id,
         |  token, cnt
         |FROM counts ORDER BY token_id""".stripMargin,
    // q92's vocabulary (one global row_number here — the Spark side's
    // two-level ranking is pinned equal by q92 itself) joined back over
    // position-indexed tokens; OOV coalesces to 0
    "q93_token_ids" ->
      s"""WITH vwords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents WHERE regexp_matches(lower(text), '[a-z0-9]')),
         |counts AS (
         |  SELECT token, count(*) AS cnt
         |  FROM (SELECT unnest(ws) AS token FROM vwords) GROUP BY 1
         |  HAVING count(*) >= 2),
         |vocab AS (
         |  SELECT token,
         |    CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
         |      AS token_id
         |  FROM counts),
         |dwords AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE doc_id IS NOT NULL
         |    AND regexp_matches(lower(text), '[a-z0-9]')),
         |posts AS (
         |  SELECT doc_id, i AS pos, ws[i] AS token
         |  FROM dwords, unnest(generate_series(1, len(ws))) AS t(i)),
         |ids AS (
         |  SELECT doc_id,
         |    list(coalesce(token_id, 0) ORDER BY pos) AS ids
         |  FROM posts LEFT JOIN vocab USING (token)
         |  GROUP BY doc_id)
         |SELECT doc_id, array_to_string(ids, ',') AS token_ids,
         |  CAST(len(ids) AS BIGINT) AS n_tokens
         |FROM ids ORDER BY doc_id""".stripMargin,

    // ---- text analysis oracles
    "q50_token_counts" ->
      s"""WITH $WordsCte
         |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         |  CAST(coalesce(list_sum(list_transform(ws,
         |    w -> greatest(1, CAST(ceil(length(w)/4.0) AS BIGINT)))), 0)
         |    AS BIGINT) AS n_subwords
         |FROM words ORDER BY doc_id""".stripMargin,
    "q51_quality" ->
      s"""WITH $WordsCte
         |SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(ws) AS BIGINT) AS n_words,
         |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_unique,
         |  round(CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
         |    / greatest(length(text), 1), 4) AS alpha_ratio,
         |  round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |    / greatest(length(text), 1), 4) AS digit_ratio,
         |  round(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9$WsClass]', '', 'g')) AS DOUBLE)
         |    / greatest(length(text), 1), 4) AS punct_ratio,
         |  round(CAST(len(list_filter(ws, w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS DOUBLE)
         |    / greatest(len(ws), 1), 4) AS stopword_ratio,
         |  round(CAST(len(list_distinct(ws)) AS DOUBLE)
         |    / greatest(len(ws), 1), 4) AS unique_ratio
         |FROM words ORDER BY doc_id""".stripMargin,
    "q52_langid" ->
      s"""WITH $WordsCte,
         |hits AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(ws, w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS BIGINT) AS hits_en,
         |    CAST(len(list_filter(ws, w -> w IN ('le','la','les','de','et','un','une','est','que','pour'))) AS BIGINT) AS hits_fr,
         |    CAST(len(list_filter(ws, w -> w IN ('el','la','los','de','y','un','una','es','que','para'))) AS BIGINT) AS hits_es,
         |    CAST(len(list_filter(ws, w -> w IN ('der','die','das','und','ein','eine','ist','nicht','mit','von'))) AS BIGINT) AS hits_de
         |  FROM words)
         |SELECT doc_id, hits_en, hits_fr, hits_es, hits_de,
         |  CASE
         |    WHEN hits_de = greatest(hits_en, hits_fr, hits_es, hits_de)
         |      AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'de'
         |    WHEN hits_en = greatest(hits_en, hits_fr, hits_es, hits_de)
         |      AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'en'
         |    WHEN hits_es = greatest(hits_en, hits_fr, hits_es, hits_de)
         |      AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'es'
         |    WHEN hits_fr = greatest(hits_en, hits_fr, hits_es, hits_de)
         |      AND greatest(hits_en, hits_fr, hits_es, hits_de) > 0 THEN 'fr'
         |    ELSE 'und' END AS lang_pred
         |FROM hits ORDER BY doc_id""".stripMargin,

    "q54_char_shingles" -> CharShinglesOracle,
    "q124_sql_native_char_ngrams" -> CharShinglesOracle,

    // arithmetic mirrors TextAnalysis.termScores op-for-op (same literal
    // structure, e.g. (1.2 + 1) not 2.2, so the IEEE ops line up); avg of
    // BIGINT is exact-sum/count in both engines
    "q58_term_scores" ->
      s"""WITH $WordsCte,
         |live AS (SELECT doc_id, ws FROM words WHERE len(ws) > 0),
         |posts AS (SELECT doc_id, unnest(ws) AS word FROM live),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM posts GROUP BY 1, 2),
         |dft AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
         |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM live),
         |scalars AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |              avg(dl) AS avgdl FROM dl)
         |SELECT tf.doc_id, tf.word, tf.tf,
         |  round(tf * (ln((n_docs + 1) / (df + 1)) + 1), 6) AS tfidf,
         |  round(ln((n_docs - df + 0.5) / (df + 0.5) + 1)
         |    * (tf * (1.2 + 1) / (tf + 1.2 * ((1 - 0.75)
         |        + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 6) AS bm25
         |FROM tf
         |JOIN dft USING (word)
         |JOIN dl ON tf.doc_id = dl.doc_id
         |CROSS JOIN scalars
         |ORDER BY tf.doc_id, word""".stripMargin,
    "q59_keywords" ->
      s"""WITH $WordsCte,
         |live AS (SELECT doc_id, ws FROM words WHERE len(ws) > 0),
         |posts AS (SELECT doc_id, unnest(ws) AS word FROM live),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM posts GROUP BY 1, 2),
         |dft AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
         |scalars AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM live),
         |scored AS (
         |  SELECT tf.doc_id, tf.word,
         |    tf * (ln((n_docs + 1) / (df + 1)) + 1) AS tfidf
         |  FROM tf JOIN dft USING (word) CROSS JOIN scalars),
         |ranked AS (
         |  SELECT doc_id, word, tfidf,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tfidf DESC, word) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT doc_id, word, round(tfidf, 6) AS tfidf, rank
         |FROM ranked WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,

    // word-frequency-weighted adjacent char pairs; within-word
    // multiplicity preserved (one row per position i)
    "q103_bpe_pairs" ->
      s"""WITH $WordsCte,
         |wf AS (
         |  SELECT word, count(*) AS freq
         |  FROM (SELECT unnest(ws) AS word FROM words) GROUP BY word),
         |pr AS (
         |  SELECT substring(word, CAST(i AS INT), 1) AS left_sym,
         |    substring(word, CAST(i AS INT) + 1, 1) AS right_sym, freq
         |  FROM wf, unnest(generate_series(1, len(word) - 1)) AS t(i))
         |SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS pair_count
         |FROM pr GROUP BY left_sym, right_sym
         |ORDER BY pair_count DESC, left_sym, right_sym""".stripMargin,

    // FULL data-derived replay of the BPE training loop (no pinned
    // literals — the oracle holds at ANY scale factor): step k derives
    // merge k as the argmax of pair stats over the vocabulary rewritten
    // by the DERIVED merges 1..k-1, tie order (count DESC, l, r). Each
    // level's rewrite cross-joins the single-row argmax CTE and applies
    // it through the same left-to-right non-overlapping fold as
    // duckBpeFolds, with the pair coming from the data instead of a
    // literal — so every output row of Spark's driver loop is
    // value-checked even though the loop itself isn't SQL-expressible,
    // and a drift in ANY earlier argmax desynchronizes every later
    // rewrite and fails the hash gate.
    "q104_bpe_merges" -> {
      val n = 8
      val steps = (1 to n).map { k =>
        val prev = if (k == 1) "chars" else s"syms${k - 1}"
        val argmax =
          s"""m$k AS (
             |  SELECT $k AS merge_rank, left_sym, right_sym, pair_count FROM (
             |    SELECT p.l AS left_sym, p.r AS right_sym,
             |      CAST(sum(freq) AS BIGINT) AS pair_count
             |    FROM (
             |      SELECT unnest([{'l': syms[j], 'r': syms[j+1]}
             |          FOR j IN generate_series(1, len(syms) - 1)]) AS p, freq
             |      FROM $prev)
             |    GROUP BY 1, 2
             |    ORDER BY pair_count DESC, left_sym, right_sym LIMIT 1))""".stripMargin
        // the last level needs no rewrite — nothing consumes syms(n)
        val rewrite = if (k == n) "" else
          s""",
             |syms$k AS (
             |  SELECT word, freq,
             |    list_reduce(list_transform(syms, s -> [s]),
             |      (acc, x) -> CASE WHEN acc[-1] = m.left_sym
             |          AND x[1] = m.right_sym
             |        THEN list_append(list_slice(acc, 1, len(acc) - 1),
             |          m.left_sym || m.right_sym)
             |        ELSE list_append(acc, x[1]) END) AS syms
             |  FROM $prev CROSS JOIN m$k m)""".stripMargin
        argmax + rewrite
      }
      s"""WITH $WordsCte,
         |wf AS (
         |  SELECT word, count(*) AS freq
         |  FROM (SELECT unnest(ws) AS word FROM words) GROUP BY word),
         |chars AS (
         |  SELECT word, freq,
         |    list(substring(word, CAST(i AS INT), 1) ORDER BY i) AS syms
         |  FROM wf, unnest(generate_series(1, len(word))) AS t(i)
         |  GROUP BY word, freq),
         |${steps.mkString(",\n")}
         |${(1 to n).map(k => s"SELECT * FROM m$k")
            .mkString("\nUNION ALL\n")}
         |ORDER BY merge_rank""".stripMargin
    },

    // the merge folds nest in rank order (innermost = merge 1), each
    // replicating applyMerge's left-to-right non-overlapping rewrite:
    // list_reduce seeds from the first element where Spark folds from
    // an empty accumulator — equivalent, since the empty-acc iteration
    // always lands in the append branch
    "q106_bpe_encode" ->
      s"""WITH $WordsCte,
         |wf AS (
         |  SELECT word, count(*) AS freq
         |  FROM (SELECT unnest(ws) AS word FROM words) GROUP BY word),
         |chars AS (
         |  SELECT word, freq,
         |    list(substring(word, CAST(i AS INT), 1) ORDER BY i) AS syms
         |  FROM wf, unnest(generate_series(1, len(word))) AS t(i)
         |  GROUP BY word, freq),
         |enc AS (SELECT word, freq, ${duckBpeFolds(BpeFixedMerges)} AS pieces
         |        FROM chars)
         |SELECT word, freq, array_to_string(pieces, ' ') AS pieces,
         |  CAST(len(pieces) AS INT) AS n_pieces
         |FROM enc ORDER BY word""".stripMargin,

    // the Viterbi DP replayed cell by cell: positions fold left to
    // right carrying (score, -n_pieces, winning-piece-len) structs —
    // list_max's lexicographic order IS the kernel's tie-break — then
    // the backtrace folds boundary positions (an int-list accumulator;
    // a string-list-in-struct accumulator miscompiles in DuckDB 1.0)
    // and pieces slice out between consecutive bounds
    "q168_unigram_segment" ->
      s"""WITH $WordsCte,
         |$UnigramDpCtes,
         |b AS (
         |  SELECT word, freq, cell, -cell.nnp AS np,
         |    list_reduce(
         |      list_prepend([CAST(length(word) AS INT)],
         |        [[0] FOR i IN generate_series(1, -cell.nnp)]),
         |      (acc, x) -> list_append(acc,
         |        acc[len(acc)] - cells[acc[len(acc)] + 1].bl)) AS bounds
         |  FROM fin)
         |SELECT word, freq,
         |  array_to_string(
         |    [substr(word, bounds[np + 2 - i] + 1,
         |        bounds[np + 1 - i] - bounds[np + 2 - i])
         |     FOR i IN generate_series(1, np)], ' ') AS pieces,
         |  CAST(np AS INT) AS n_pieces,
         |  round(cell.s, 6) AS logprob
         |FROM b ORDER BY word""".stripMargin,

    // per-term overlapping-occurrence counts replayed positionally:
    // a term occurs at p iff substr(text, p, len) equals it — summed
    // and distinct-counted exactly as the automaton reports
    "q170_substring_blocklist" ->
      s"""WITH tl AS (
         |  SELECT doc_id, lower(text) AS t FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |cnt AS (
         |  SELECT doc_id,
         |    [CAST(len(list_filter(
         |        generate_series(1, greatest(0,
         |          length(t) - length(term) + 1)),
         |        p -> substr(t, p, length(term)) = term)) AS BIGINT)
         |     FOR term IN $MultiMatchTermsSql] AS c
         |  FROM tl)
         |SELECT doc_id,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), c),
         |    (a, x) -> a + x) AS BIGINT) AS n_hits,
         |  CAST(len(list_filter(c, x -> x > 0)) AS BIGINT)
         |    AS n_terms_hit,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), c),
         |    (a, x) -> a + x) <= 40 AS keep
         |FROM cnt ORDER BY doc_id""".stripMargin,

    // position p is masked iff some term occurrence covers it: a start
    // st in [p-len+1, p] (clamped to valid starts) whose substring
    // equals the term — the set-union semantics of overlapping matches
    "q171_substring_redact" ->
      s"""WITH tl AS (
         |  SELECT doc_id, lower(text) AS t FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |red AS (
         |  SELECT doc_id,
         |    array_to_string([
         |      CASE WHEN len([term FOR term IN $MultiMatchTermsSql
         |        IF len(list_filter(
         |            generate_series(greatest(1, p - length(term) + 1),
         |              least(p, length(t) - length(term) + 1)),
         |            st -> substr(t, st, length(term)) = term)) > 0]) > 0
         |      THEN '*' ELSE substr(t, p, 1) END
         |      FOR p IN generate_series(1, length(t))], '') AS r
         |  FROM tl)
         |SELECT red.doc_id, md5(r) AS text_md5,
         |  CAST(length(r) AS BIGINT) AS n_chars,
         |  CAST(len([p FOR p IN generate_series(1, length(r))
         |    IF substr(r, p, 1) = '*' AND substr(t, p, 1) != '*'])
         |    AS BIGINT) AS n_masked
         |FROM red JOIN tl ON red.doc_id = tl.doc_id
         |ORDER BY red.doc_id""".stripMargin,

    // the budget readout: the same DP's piece counts joined back to
    // the per-document token stream
    "q169_unigram_token_counts" ->
      s"""WITH $WordsCte,
         |$UnigramDpCtes,
         |enc AS (SELECT word, -cell.nnp AS n_pieces FROM fin),
         |docw AS (
         |  SELECT doc_id, unnest(ws) AS word FROM words
         |  WHERE doc_id IS NOT NULL)
         |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(e.n_pieces) AS BIGINT) AS n_unigram_tokens
         |FROM docw d JOIN enc e USING (word)
         |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // q91's oracle one ngram order up: seen bigrams score the
    // conditional MLE, unseen back off to 0.4x the smoothed unigram;
    // parenthesization mirrors the Spark expression exactly (ratio
    // first, then the backoff scale) for bit parity
    "q107_bigram_logprob" ->
      s"""WITH mwords AS (
         |  SELECT list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source = 'src0' AND regexp_matches(lower(text), '[a-z0-9]')),
         |mbi AS (
         |  SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
         |  FROM mwords, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
         |big AS (SELECT w1, w2, count(*) AS c2 FROM mbi GROUP BY 1, 2),
         |counts AS (
         |  SELECT word, count(*) AS c
         |  FROM (SELECT unnest(ws) AS word FROM mwords) GROUP BY 1),
         |scalars AS (SELECT CAST(sum(c) AS DOUBLE) AS n_occ,
         |              CAST(count(*) AS DOUBLE) AS n_vocab FROM counts),
         |dwords AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(
         |      regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |      '[$WsClass]+'),
         |    x -> x != '') AS ws
         |  FROM documents
         |  WHERE source != 'src0' AND doc_id IS NOT NULL
         |    AND regexp_matches(lower(text), '[a-z0-9]')),
         |dbi AS (
         |  SELECT doc_id, ws[CAST(i AS INT)] AS w1,
         |    ws[CAST(i AS INT) + 1] AS w2
         |  FROM dwords, unnest(generate_series(1, len(ws) - 1)) AS t(i)),
         |occ AS (
         |  SELECT doc_id, w1, w2, count(*) AS oc FROM dbi GROUP BY 1, 2, 3),
         |contrib AS (
         |  SELECT doc_id, occ.w1, occ.w2, oc,
         |    CAST(oc AS DOUBLE) * (CASE WHEN b.c2 IS NOT NULL
         |      THEN ln(CAST(b.c2 AS DOUBLE) / CAST(cp.c AS DOUBLE))
         |      ELSE ln(0.4 * ((CAST(coalesce(cc.c, 0) AS DOUBLE) + 1.0)
         |        / (n_occ + n_vocab))) END) AS lp
         |  FROM occ LEFT JOIN big b ON b.w1 = occ.w1 AND b.w2 = occ.w2
         |  LEFT JOIN counts cp ON cp.word = occ.w1
         |  LEFT JOIN counts cc ON cc.word = occ.w2
         |  CROSS JOIN scalars),
         |agg AS (
         |  SELECT doc_id, CAST(sum(oc) AS BIGINT) AS n_bigrams,
         |    list_reduce(list(lp ORDER BY w1, w2), (a, b) -> a + b) AS sum_lp
         |  FROM contrib GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, round(sum_lp, 6) AS sum_logprob,
         |  round(sum_lp / CAST(n_bigrams AS DOUBLE), 6) AS avg_logprob
         |FROM agg ORDER BY doc_id""".stripMargin,

    // bottom-64 KMV per source over distinct 60-bit token hashes; the
    // pair stage reads sketches only. list_sort(list_distinct(concat))
    // == Spark sort_array(array_union) — both dedupe then sort
    "q108_kmv_overlap" ->
      s"""WITH $WordsCte,
         |toks AS (
         |  SELECT DISTINCT source, ${h60("word")} AS h
         |  FROM (SELECT source, unnest(ws) AS word FROM words)),
         |sk AS (
         |  SELECT source, (list(h ORDER BY h))[1:64] AS sketch
         |  FROM toks GROUP BY source)
         |SELECT a.source AS group_a, b.source AS group_b,
         |  CAST(len(u) AS INT) AS n_union_sample,
         |  CAST(len(list_intersect(list_intersect(u, a.sketch), b.sketch))
         |    AS INT) AS n_shared,
         |  round(CAST(len(list_intersect(list_intersect(u, a.sketch),
         |      b.sketch)) AS DOUBLE) / CAST(len(u) AS DOUBLE), 6)
         |    AS est_jaccard
         |FROM sk a JOIN sk b ON a.source < b.source,
         |  LATERAL (SELECT
         |    (list_sort(list_distinct(list_concat(a.sketch, b.sketch))))[1:64]
         |      AS u) AS lu
         |ORDER BY group_a, group_b""".stripMargin,

    // q106's encoded vocabulary joined back to the corpus occurrence
    // stream, summed per document
    "q109_bpe_token_counts" ->
      s"""WITH $WordsCte,
         |wf AS (
         |  SELECT word, count(*) AS freq
         |  FROM (SELECT unnest(ws) AS word FROM words) GROUP BY word),
         |chars AS (
         |  SELECT word, freq,
         |    list(substring(word, CAST(i AS INT), 1) ORDER BY i) AS syms
         |  FROM wf, unnest(generate_series(1, len(word))) AS t(i)
         |  GROUP BY word, freq),
         |enc AS (SELECT word, ${duckBpeFolds(BpeFixedMerges)} AS pieces
         |        FROM chars),
         |occ AS (
         |  SELECT doc_id, unnest(ws) AS word FROM words
         |  WHERE doc_id IS NOT NULL)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(len(pieces)) AS BIGINT) AS n_bpe_tokens
         |FROM occ JOIN enc USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Gopher rule replica: same metrics, same double divisions, same
    // inclusive thresholds; list_sum of an empty list is NULL in DuckDB
    // (Spark's fold seeds 0) — coalesce restores the match
    "q114_gopher_rules" ->
      s"""WITH d AS (
         |  SELECT doc_id, text,
         |    list_filter(
         |      string_split_regex(
         |        regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'),
         |        '[$WsClass]+'),
         |      x -> x != '') AS ws,
         |    list_filter(
         |      list_transform(string_split_regex(text, '\\n'),
         |        l -> trim(l)),
         |      l -> l != '') AS ls
         |  FROM documents WHERE doc_id IS NOT NULL),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(ws) AS BIGINT) AS nw,
         |    CAST(greatest(len(ws), 1) AS DOUBLE) AS nwd,
         |    CAST(greatest(len(ls), 1) AS DOUBLE) AS nl,
         |    CAST(coalesce(list_sum(list_transform(ws, w -> length(w))),
         |      0) AS DOUBLE) AS sumlen,
         |    CAST(length(text) - length(replace(text, '#', ''))
         |      AS BIGINT) AS hashes,
         |    CAST(length(text) - length(replace(text, '...', ''))
         |      AS BIGINT) AS ell,
         |    CAST(len(list_filter(ls,
         |      l -> substr(l, 1, 1) IN ('•', '-', '*'))) AS DOUBLE)
         |      AS bullets,
         |    CAST(len(list_filter(ls,
         |      l -> ends_with(l, '...') OR ends_with(l, '…'))) AS DOUBLE)
         |      AS ell_lines,
         |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
         |      AS DOUBLE) AS alpha,
         |    ${TextAnalysis.GopherStopwords.map(sw =>
             s"(CASE WHEN list_contains(ws, '$sw') THEN 1 ELSE 0 END)")
             .mkString(" + ")} AS stophits
         |  FROM d),
         |r AS (
         |  SELECT doc_id, nw AS n_words,
         |    nw BETWEEN 50 AND 100000 AS r_word_count,
         |    (sumlen / nwd >= 3.0 AND sumlen / nwd <= 10.0)
         |      AS r_mean_word_len,
         |    (hashes + ell / 3) / nwd <= 0.1 AS r_symbol_ratio,
         |    bullets / nl <= 0.9 AS r_bullet_lines,
         |    ell_lines / nl <= 0.3 AS r_ellipsis_lines,
         |    alpha / nwd >= 0.8 AS r_alpha_words,
         |    stophits >= 2 AS r_stopwords
         |  FROM m)
         |SELECT doc_id, n_words, r_word_count, r_mean_word_len,
         |  r_symbol_ratio, r_bullet_lines, r_ellipsis_lines,
         |  r_alpha_words, r_stopwords,
         |  (r_word_count AND r_mean_word_len AND r_symbol_ratio
         |    AND r_bullet_lines AND r_ellipsis_lines AND r_alpha_words
         |    AND r_stopwords) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,

    // the same page rendering (8-word sentences, one per line), then the
    // C4 rules: keep lines ending in terminal punctuation with >= 5
    // words and no drop token; page verdicts for phrase/brace/sentence
    // minimum. Sentence count = terminal marks in the SURVIVING lines
    "q118_c4_clean" ->
      s"""WITH pages AS (
         |  SELECT doc_id,
         |    regexp_replace(text, '((?:[a-z]+ ){7}[a-z]+)( |$$)',
         |      '\\1.' || chr(10), 'g') AS page
         |  FROM documents),
         |lns AS (
         |  SELECT doc_id, page, string_split(page, chr(10)) AS ls
         |  FROM pages),
         |kept AS (
         |  SELECT doc_id, page, ls,
         |    list_filter(ls, l ->
         |      regexp_matches(rtrim(l), '[.!?"'']$$')
         |      AND len(list_filter(
         |        string_split_regex(trim(l), '[ \t]+'), x -> x != ''))
         |        >= 5
         |      AND NOT contains(lower(l), 'slow')) AS ks
         |  FROM lns),
         |stats AS (
         |  -- array_to_string(empty) is NULL in DuckDB, '' in Spark
         |  SELECT doc_id,
         |    coalesce(array_to_string(ks, chr(10)), '') AS page_clean,
         |    CAST(len(ls) AS BIGINT) AS n_lines,
         |    CAST(len(ks) AS BIGINT) AS n_kept_lines,
         |    contains(lower(page), 'lorem ipsum') AS has_page_phrase,
         |    (contains(page, '{') OR contains(page, '}')) AS has_brace,
         |    CAST(length(regexp_replace(
         |      coalesce(array_to_string(ks, chr(10)), ''),
         |      '[^.!?]', '', 'g')) AS BIGINT) AS n_sentences
         |  FROM kept)
         |SELECT doc_id, page_clean, n_lines, n_kept_lines,
         |  has_page_phrase, has_brace, n_sentences,
         |  (NOT has_page_phrase AND NOT has_brace AND n_sentences >= 3)
         |    AS keep
         |FROM stats ORDER BY doc_id""".stripMargin,

    // the oracle states the SEMANTICS directly — a per-doc window
    // cumsum in greedy (quality DESC, id) order, kept while <= budget;
    // the Spark side's bucketed two-phase form is provably the same set
    "q127_token_budget" ->
      s"""WITH $WordsCte,
         |s AS (
         |  SELECT doc_id,
         |    round(CAST(length(text) - length(regexp_replace(text,
         |      '[a-zA-Z]', '', 'g')) AS DOUBLE)
         |      / greatest(length(text), 1), 4) AS quality,
         |    CAST(len(ws) AS BIGINT) AS n_tokens
         |  FROM words WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |g AS (
         |  SELECT doc_id, quality, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS cum
         |  FROM s)
         |SELECT doc_id, quality, n_tokens FROM g
         |WHERE cum <= 12000 ORDER BY doc_id""".stripMargin,

    // deduped 3-word shingle digest per doc — the q124/q54 gate shape
    // (count + md5 of the sorted shingle list) for the native word-ngram
    // kernel's SQL-text path
    "q129_sql_native_word_ngrams" ->
      s"""WITH $WordsCte,
         |$ShinglesCte
         |SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_ngrams,
         |  md5(array_to_string(list_sort(shingles), '|')) AS ngram_md5
         |FROM sh ORDER BY doc_id""".stripMargin,
    // the q31/q38 signature oracle gates the SQL-text minhash path too
    "q130_sql_native_minhash" -> MinHashSigOracle,

    "q179_bm25_scores" ->
      s"""WITH ${bm25Cte("doc_id < 120", "doc_id < 120 AND doc_id % 50 = 0")}
         |SELECT query_id, doc_id, round(score, 6) AS score
         |FROM bscores ORDER BY query_id, doc_id""".stripMargin,

    // both component rankings replayed in full (the BM25 chain + the
    // pruning-free brute-force Jaccard), then the fusion sum as a
    // src-ordered list_reduce matching rrfFuse's sorted fold
    "q181_rrf_fusion" ->
      s"""WITH ${bm25Cte("doc_id < 120", "doc_id < 120 AND doc_id % 50 = 0")},
         |bmtop AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS rank
         |    FROM bscores) WHERE rank <= 10),
         |$ToksCte,
         |jbase AS (SELECT doc_id, tokens, CAST(len(tokens) AS BIGINT) AS sz
         |          FROM toks WHERE len(tokens) > 0 AND doc_id < 120),
         |jarr AS (SELECT * FROM jbase WHERE doc_id % 50 = 0),
         |jpairs AS (
         |  SELECT a.doc_id AS query_id, b.doc_id AS doc_id,
         |    count(*) AS inter
         |  FROM (SELECT doc_id, unnest(tokens) AS word FROM jarr) a
         |  JOIN (SELECT doc_id, unnest(tokens) AS word FROM jbase) b
         |    ON a.word = b.word
         |  GROUP BY 1, 2),
         |jsim AS (
         |  SELECT p.query_id, p.doc_id,
         |    CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) AS sim
         |  FROM jpairs p
         |  JOIN jarr sa ON p.query_id = sa.doc_id
         |  JOIN jbase sb ON p.doc_id = sb.doc_id
         |  WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter)
         |        >= CAST(0.3 AS DOUBLE)),
         |jtop AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, doc_id) AS rank
         |    FROM jsim) WHERE rank <= 10),
         |fcontrib AS (
         |  SELECT query_id, doc_id, 0 AS src,
         |    1.0 / (60.0 + CAST(rank AS DOUBLE)) AS rrf FROM bmtop
         |  UNION ALL
         |  SELECT query_id, doc_id, 1,
         |    1.0 / (60.0 + CAST(rank AS DOUBLE)) FROM jtop),
         |fused AS (
         |  SELECT query_id, doc_id,
         |    list_reduce(list(rrf ORDER BY src), (a, x) -> a + x)
         |      AS rrf_score
         |  FROM fcontrib GROUP BY 1, 2)
         |SELECT query_id, doc_id, round(rrf_score, 9) AS rrf_score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, rrf_score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf_score DESC, doc_id) AS rank
         |  FROM fused)
         |WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    "q180_bm25_topk" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |ranked AS (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM bscores)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // THE UNPRUNED RANKING over the Zipf corpus — no bound, no
    // candidate restriction, no fallback split anywhere in the oracle:
    // equality with the WAND path is the exactness proof
    "q182_bm25_wand_topk" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |ranked AS (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM bscores)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the retrieval replay (q180's oracle), then every banded window
    // enumerated from first principles: starts = query-term
    // occurrences, nt = count(DISTINCT word) within [s, s+7], argmax
    // per (query, doc) with the leftmost tie-break
    "q198_snippet_windows" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$LiveWordsCte,
         |posts AS (
         |  SELECT doc_id, CAST(j - 1 AS BIGINT) AS pos, w[CAST(j AS INT)] AS word
         |  FROM ws, unnest(generate_series(1, len(w))) AS t(j)),
         |btop AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM bscores) x WHERE r <= 5),
         |qocc AS (
         |  SELECT q.query_id, p.doc_id, p.pos, p.word
         |  FROM qterms q JOIN posts p USING (word)
         |  JOIN btop b ON b.query_id = q.query_id
         |    AND b.doc_id = p.doc_id),
         |wins AS (
         |  SELECT s.query_id, s.doc_id, s.pos AS wstart,
         |    count(DISTINCT t.word) AS nt
         |  FROM qocc s JOIN qocc t ON t.query_id = s.query_id
         |    AND t.doc_id = s.doc_id
         |    AND t.pos >= s.pos AND t.pos <= s.pos + 7
         |  GROUP BY 1, 2, 3)
         |SELECT query_id, doc_id, wstart AS window_start,
         |  CAST(nt AS BIGINT) AS n_matched_terms
         |FROM (
         |  SELECT query_id, doc_id, wstart, nt,
         |    row_number() OVER (PARTITION BY query_id, doc_id
         |      ORDER BY nt DESC, wstart) AS r
         |  FROM wins) z
         |WHERE r = 1
         |ORDER BY query_id, doc_id""".stripMargin,

    // q198's window replay + the slice: DuckDB list_slice is
    // INCLUSIVE-end, so width 8 from wstart+1 reaches wstart+8; a
    // tail window truncates in both engines
    "q230_snippet_texts" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$LiveWordsCte,
         |posts AS (
         |  SELECT doc_id, CAST(j - 1 AS BIGINT) AS pos, w[CAST(j AS INT)] AS word
         |  FROM ws, unnest(generate_series(1, len(w))) AS t(j)),
         |btop AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM bscores) x WHERE r <= 5),
         |qocc AS (
         |  SELECT q.query_id, p.doc_id, p.pos, p.word
         |  FROM qterms q JOIN posts p USING (word)
         |  JOIN btop b ON b.query_id = q.query_id
         |    AND b.doc_id = p.doc_id),
         |wins AS (
         |  SELECT s.query_id, s.doc_id, s.pos AS wstart,
         |    count(DISTINCT t.word) AS nt
         |  FROM qocc s JOIN qocc t ON t.query_id = s.query_id
         |    AND t.doc_id = s.doc_id
         |    AND t.pos >= s.pos AND t.pos <= s.pos + 7
         |  GROUP BY 1, 2, 3),
         |best AS (
         |  SELECT query_id, doc_id, wstart, nt FROM (
         |    SELECT query_id, doc_id, wstart, nt,
         |      row_number() OVER (PARTITION BY query_id, doc_id
         |        ORDER BY nt DESC, wstart) AS r
         |    FROM wins) z
         |  WHERE r = 1)
         |SELECT b.query_id, b.doc_id, b.wstart AS window_start,
         |  CAST(b.nt AS BIGINT) AS n_matched_terms,
         |  array_to_string(list_slice(s.w,
         |    CAST(b.wstart + 1 AS INT), CAST(b.wstart + 8 AS INT)), ' ')
         |    AS snippet
         |FROM best b JOIN ws s ON s.doc_id = b.doc_id
         |ORDER BY b.query_id, b.doc_id""".stripMargin,

    // the Dirichlet decomposition replayed: cf = sum(tf) per word,
    // |C| = sum(dl), the matching-term sum as a word-sorted fold, and
    // the |q|·ln(μ/(dl+μ)) normalizer added once after the fold
    "q199_ql_dirichlet_topk" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$QlCtes
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM qlsc) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the segmentation replayed (greatest(1, ceil((L-32)/16)+1)
    // windows per doc, final window reaching the end, short docs one
    // window), then the SAME scoring chain with the passages CTE as
    // the corpus (passage ids alias to doc_id inside it), then the
    // per-doc max and the rank
    "q203_passage_maxp_topk" -> PassageMaxpOracle,
    // the lifecycle gate replays the FRESH BUILD — append + delete
    // compaction must be indistinguishable from it
    "q235_passage_index_lifecycle" -> PassageMaxpOracle,
    // THE UNPRUNED MAXP REPLAY (q203's oracle verbatim): the pruned
    // passage probe is score-exact, so its oracle IS the fresh-build
    // MaxP replay — the one-definition rule for "the passage ranking"
    "q245_passage_wand_topk" -> PassageMaxpOracle,
    // the MaxP decision table from first principles (doc-level θ)
    "q246_passage_wand_stats" -> PassageWandStatsOracle,


    // the whole fielded chain from first principles: the title/body
    // split, per-field tokenization and lengths, exact-sum per-field
    // avgfl, document-level df/N over any-field matches, the
    // field-ORDER pseudo-tf fold, idf·ptf/(k1+ptf), word-sorted score
    // fold, rank
    "q202_bm25f_topk" -> Bm25fDocumentsOracle,
    // the fielded-stats lifecycle gate replays the FRESH BUILD — the
    // compacted (per-field stats, doc scalar, document-level df)
    // triple must probe indistinguishably from it
    "q243_bm25f_compacted_stats" -> Bm25fDocumentsOracle,

    // the posting INTERSECTION as candidates (count of matched
    // distinct terms per (query, doc) equals the query's FULL distinct
    // term count — absent terms fail the conjunction by construction),
    // then q180's scoring restricted to them
    "q200_bm25_conjunctive_topk" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |qcnt AS (SELECT query_id, count(*) AS nq FROM qterms GROUP BY 1),
         |cand AS (
         |  SELECT q.query_id, t.doc_id
         |  FROM qterms q JOIN tfv t USING (word)
         |  JOIN qcnt c ON c.query_id = q.query_id
         |  GROUP BY q.query_id, t.doc_id, c.nq
         |  HAVING count(DISTINCT t.word) = c.nq),
         |ranked AS (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM bscores JOIN cand USING (query_id, doc_id))
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // both component chains (q180's BM25, q199's QL), each top-10
    // with scores, min-max normalized per query, then the 0.7/0.3
    // weighted sum as a src-ordered fold — rrf's replay shape with
    // scores instead of ranks
    "q201_linear_fusion" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$QlCtes,
         |btop AS (
         |  SELECT query_id, doc_id, score FROM (
         |    SELECT query_id, doc_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM bscores) x WHERE r <= 10),
         |qtop AS (
         |  SELECT query_id, doc_id, score FROM (
         |    SELECT query_id, doc_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM qlsc) y WHERE r <= 10),
         |bmm AS (
         |  SELECT query_id, min(score) AS lo, max(score) AS hi
         |  FROM btop GROUP BY 1),
         |qmm AS (
         |  SELECT query_id, min(score) AS lo, max(score) AS hi
         |  FROM qtop GROUP BY 1),
         |fc AS (
         |  SELECT b.query_id, b.doc_id, 0 AS src,
         |    CAST(0.7 AS DOUBLE) * (CASE WHEN hi > lo
         |      THEN (score - lo) / (hi - lo) ELSE 1.0 END) AS f
         |  FROM btop b JOIN bmm USING (query_id)
         |  UNION ALL
         |  SELECT q.query_id, q.doc_id, 1,
         |    CAST(0.3 AS DOUBLE) * (CASE WHEN hi > lo
         |      THEN (score - lo) / (hi - lo) ELSE 1.0 END)
         |  FROM qtop q JOIN qmm USING (query_id)),
         |fused AS (
         |  SELECT query_id, doc_id,
         |    list_reduce(list(f ORDER BY src), (a, x) -> a + x) AS fs
         |  FROM fc GROUP BY 1, 2)
         |SELECT query_id, doc_id, round(fs, 9) AS fused_score,
         |  CAST(frank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, fs,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY fs DESC, doc_id) AS frank
         |  FROM fused) z
         |WHERE frank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    // both rankings replayed — the exact chain and the pruned chain
    // (enrichment restricted to df <= cut) — then hits = the top-5
    // intersection per query; a recall drift means the prune dropped
    // or admitted the wrong docs
    "q197_bm25_pruned_recall" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |$PrunedScoresCtes,
         |etop AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM bscores) x WHERE r <= 5),
         |ptop AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM psc) y WHERE r <= 5),
         |ecnt AS (
         |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
         |  FROM etop GROUP BY 1),
         |hits AS (
         |  SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM etop e JOIN ptop p USING (query_id, doc_id)
         |  GROUP BY 1)
         |SELECT query_id, n_exact,
         |  CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
         |  round(CAST(coalesce(n_hit, 0) AS DOUBLE)
         |    / CAST(n_exact AS DOUBLE), 6) AS recall
         |FROM ecnt LEFT JOIN hits USING (query_id)
         |ORDER BY query_id""".stripMargin,

    // the decision table replayed from first principles: term split
    // against the df table, candidates = docs sharing a RARE term,
    // theta = 5th full score among candidates, ub = Σ_hot idf times
    // the operator's exact double constant (toString round-trip), and
    // the routing predicate verbatim
    "q187_bm25_wand_stats" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |hotcut AS (SELECT count(*) // 10 AS cut FROM corpus),
         |split AS (
         |  SELECT query_id, word, df, cut
         |  FROM qterms JOIN dft USING (word) CROSS JOIN hotcut),
         |counts AS (
         |  SELECT query_id,
         |    CAST(sum(CASE WHEN df <= cut THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_rare_terms,
         |    CAST(sum(CASE WHEN df > cut THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_hot_terms
         |  FROM split GROUP BY 1),
         |cands AS (
         |  SELECT DISTINCT s.query_id, t.doc_id
         |  FROM split s JOIN tfv t USING (word) WHERE s.df <= s.cut),
         |ncand AS (
         |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates
         |  FROM cands GROUP BY 1),
         |ubt AS (
         |  SELECT e.query_id,
         |    list_reduce(list_prepend(0.0, list(e.idf ORDER BY e.word)),
         |      (a, x) -> a + x) *
         |      CAST('${((1.2 + 1.0) * (1.0 + 1e-9)).toString}' AS DOUBLE)
         |      AS ub
         |  FROM enriched e JOIN dft d USING (word) CROSS JOIN hotcut
         |  WHERE d.df > cut GROUP BY e.query_id),
         |cscore AS (
         |  SELECT b.query_id, b.doc_id, b.score
         |  FROM bscores b JOIN cands c USING (query_id, doc_id)),
         |th AS (
         |  SELECT query_id, score AS theta FROM (
         |    SELECT query_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM cscore) x WHERE r = 5)
         |SELECT c.query_id, n_rare_terms, n_hot_terms,
         |  CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
         |  round(ub, 6) AS ub, round(theta, 6) AS theta,
         |  NOT (n_hot_terms > 0 AND (theta IS NULL OR ub >= theta)) AS safe
         |FROM counts c
         |LEFT JOIN ncand USING (query_id)
         |LEFT JOIN ubt USING (query_id)
         |LEFT JOIN th USING (query_id)
         |ORDER BY query_id""".stripMargin,

    // THE UNPRUNED RANKING again (q182's oracle verbatim): the
    // impact-tightened bound must change nothing about the answer —
    // only the decision table (q205) moves
    "q204_bm25_wand_impact_topk" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |ranked AS (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM bscores)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // q187's replay with the TIGHTENED ub: per-word (max_tf, min_dl)
    // recomputed from first principles off the posting rows, then the
    // hot fold carries idf·f(max_tf, min_dl) — the operator's exact
    // contribution tree evaluated at the extremes — times the exact
    // 1e-9 margin constant (toString round-trip)
    "q205_bm25_wand_impact_stats" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |hotcut AS (SELECT count(*) // 10 AS cut FROM corpus),
         |split AS (
         |  SELECT query_id, word, df, cut
         |  FROM qterms JOIN dft USING (word) CROSS JOIN hotcut),
         |counts AS (
         |  SELECT query_id,
         |    CAST(sum(CASE WHEN df <= cut THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_rare_terms,
         |    CAST(sum(CASE WHEN df > cut THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_hot_terms
         |  FROM split GROUP BY 1),
         |cands AS (
         |  SELECT DISTINCT s.query_id, t.doc_id
         |  FROM split s JOIN tfv t USING (word) WHERE s.df <= s.cut),
         |ncand AS (
         |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates
         |  FROM cands GROUP BY 1),
         |imps AS (
         |  SELECT t.word, max(t.tf) AS max_tf, min(l.dl) AS min_dl
         |  FROM tfv t JOIN lens l ON l.doc_id = t.doc_id
         |  GROUP BY 1),
         |ubt AS (
         |  SELECT e.query_id,
         |    list_reduce(list_prepend(0.0, list(
         |      e.idf * (CAST(max_tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
         |        / (CAST(max_tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |           (1.0 - CAST(0.75 AS DOUBLE) +
         |            CAST(0.75 AS DOUBLE) * CAST(min_dl AS DOUBLE) / e.avgdl))
         |      ORDER BY e.word)), (a, x) -> a + x) *
         |      CAST('${(1.0 + 1e-9).toString}' AS DOUBLE) AS ub
         |  FROM enriched e JOIN dft d USING (word) JOIN imps USING (word)
         |  CROSS JOIN hotcut
         |  WHERE d.df > cut GROUP BY e.query_id),
         |cscore AS (
         |  SELECT b.query_id, b.doc_id, b.score
         |  FROM bscores b JOIN cands c USING (query_id, doc_id)),
         |th AS (
         |  SELECT query_id, score AS theta FROM (
         |    SELECT query_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM cscore) x WHERE r = 5)
         |SELECT c.query_id, n_rare_terms, n_hot_terms,
         |  CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
         |  round(ub, 6) AS ub, round(theta, 6) AS theta,
         |  NOT (n_hot_terms > 0 AND (theta IS NULL OR ub >= theta)) AS safe
         |FROM counts c
         |LEFT JOIN ncand USING (query_id)
         |LEFT JOIN ubt USING (query_id)
         |LEFT JOIN th USING (query_id)
         |ORDER BY query_id""".stripMargin,

    // the pruned run and the graded qrels replayed (q197's chains),
    // then every trec_eval number from first principles — running
    // prec@r, rank-ordered DCG/AP folds, the ideal re-ranking
    "q206_ranking_metrics" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |$RankingMetricsCtes
         |SELECT query_id, n_rel, n_ret_rel,
         |  round(p_at_k, 6) AS p_at_k,
         |  round(recall_at_k, 6) AS recall_at_k,
         |  round(rr, 6) AS rr, round(ap, 6) AS ap,
         |  round(ndcg, 6) AS ndcg
         |FROM met ORDER BY query_id""".stripMargin,

    // the same per-query table macro-averaged (queryId-ordered folds):
    // the trec_eval "all" line — rr averaged is MRR, ap averaged MAP
    "q207_ranking_metrics_mean" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |$RankingMetricsCtes
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |  round(list_reduce(list_prepend(0.0,
         |    list(p_at_k ORDER BY query_id)), (a, x) -> a + x)
         |    / CAST(count(*) AS DOUBLE), 6) AS mean_p_at_k,
         |  round(list_reduce(list_prepend(0.0,
         |    list(recall_at_k ORDER BY query_id)), (a, x) -> a + x)
         |    / CAST(count(*) AS DOUBLE), 6) AS mean_recall_at_k,
         |  round(list_reduce(list_prepend(0.0,
         |    list(rr ORDER BY query_id)), (a, x) -> a + x)
         |    / CAST(count(*) AS DOUBLE), 6) AS mrr,
         |  round(list_reduce(list_prepend(0.0,
         |    list(ap ORDER BY query_id)), (a, x) -> a + x)
         |    / CAST(count(*) AS DOUBLE), 6) AS map,
         |  round(list_reduce(list_prepend(0.0,
         |    list(ndcg ORDER BY query_id)), (a, x) -> a + x)
         |    / CAST(count(*) AS DOUBLE), 6) AS mean_ndcg
         |FROM met""".stripMargin,

    // the INDEPENDENT fuzzy formulation: brute-force query-term ×
    // vocabulary cross join + levenshtein <= 1, ranked dist / df desc
    // / word — the operator's deletion-neighborhood equi-join must
    // reproduce it row for row (completeness AND the verify filter)
    "q208_fuzzy_term_match" ->
      s"""WITH $LiveWordsCte,
         |vocab AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS df
         |  FROM (SELECT DISTINCT doc_id, word
         |        FROM (SELECT doc_id, unnest(w) AS word FROM ws))
         |  GROUP BY 1),
         |qterms AS (
         |  SELECT doc_id AS query_id,
         |    substr(w[3], 1, 1) || substr(w[3], 3) AS word
         |  FROM ws
         |  WHERE doc_id % 103 = 0 AND len(w) >= 3
         |    AND length(w[3]) >= 3),
         |cand AS (
         |  SELECT q.query_id, q.word, v.word AS match, v.df,
         |    CAST(levenshtein(q.word, v.word) AS BIGINT) AS dist
         |  FROM qterms q, vocab v
         |  WHERE levenshtein(q.word, v.word) <= 1),
         |ranked AS (
         |  SELECT query_id, word, match, df, dist,
         |    row_number() OVER (PARTITION BY query_id, word
         |      ORDER BY dist, df DESC, match) AS r
         |  FROM cand)
         |SELECT query_id, word, match, df, dist, CAST(r AS BIGINT) AS rank
         |FROM ranked ORDER BY query_id, word, rank""".stripMargin,

    // typo-tolerant retrieval replayed end to end: the OOV split
    // against the df table, the brute-force best correction (df desc,
    // word ties — every OOV candidate is dist 1 by construction), the
    // collision-deduped union with the verbatim in-vocab terms, then
    // the exact scoring tree over the corrected term table
    "q209_bm25_fuzzy_topk" ->
      s"""WITH $LiveWordsCte,
         |tfv AS (
         |  SELECT doc_id, word, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(w) AS word FROM ws)
         |  GROUP BY 1, 2),
         |lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM ws),
         |stats AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
         |  FROM lens),
         |dft AS (SELECT word, count(*) AS df FROM tfv GROUP BY 1),
         |qraw AS (
         |  SELECT doc_id AS query_id,
         |    substr(w[2], 1, 1) || substr(w[2], 3) AS m2,
         |    w[3] AS m3, w[4] AS m4
         |  FROM ws
         |  WHERE doc_id % 101 = 0 AND len(w) >= 4
         |    AND length(w[2]) >= 3),
         |qterms AS (
         |  SELECT DISTINCT query_id, word FROM (
         |    SELECT query_id, unnest([m2, m3, m4]) AS word FROM qraw)),
         |oov AS (
         |  SELECT query_id, word FROM qterms
         |  WHERE word NOT IN (SELECT word FROM dft)),
         |inv AS (
         |  SELECT query_id, word FROM qterms
         |  WHERE word IN (SELECT word FROM dft)),
         |fcand AS (
         |  SELECT o.query_id, o.word, d.word AS cw, d.df
         |  FROM oov o, dft d
         |  WHERE levenshtein(o.word, d.word) <= 1),
         |fbest AS (
         |  SELECT query_id, cw AS word FROM (
         |    SELECT query_id, word, cw,
         |      row_number() OVER (PARTITION BY query_id, word
         |        ORDER BY df DESC, cw) AS r
         |    FROM fcand) x WHERE r = 1),
         |cq AS (
         |  SELECT DISTINCT query_id, word FROM (
         |    SELECT query_id, word FROM inv
         |    UNION ALL
         |    SELECT query_id, word FROM fbest)),
         |cenr AS (
         |  SELECT query_id, word, avgdl,
         |    ln(1.0 + (n_docs - CAST(df AS DOUBLE) + 0.5)
         |             / (CAST(df AS DOUBLE) + 0.5)) AS idf
         |  FROM cq JOIN dft USING (word) CROSS JOIN stats),
         |ccon AS (
         |  SELECT query_id, t.doc_id, t.word,
         |    idf * (CAST(t.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
         |      / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |         (1.0 - CAST(0.75 AS DOUBLE) +
         |          CAST(0.75 AS DOUBLE) * CAST(l.dl AS DOUBLE) / avgdl))
         |      AS c
         |  FROM tfv t JOIN cenr e ON e.word = t.word
         |  JOIN lens l ON l.doc_id = t.doc_id),
         |csc AS (
         |  SELECT query_id, doc_id,
         |    list_reduce(list(c ORDER BY word), (a, x) -> a + x) AS score
         |  FROM ccon GROUP BY 1, 2)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM csc) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // q208's brute force one level deeper: levenshtein <= 2 over the
    // full query x vocabulary cross product, ranked (dist, df desc,
    // word) — the neighborhood join's completeness claim at d = 2
    "q226_fuzzy_match_ed2" ->
      s"""WITH $LiveWordsCte,
         |vocab AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS df
         |  FROM (SELECT DISTINCT doc_id, word
         |        FROM (SELECT doc_id, unnest(w) AS word FROM ws))
         |  GROUP BY 1),
         |qterms AS (
         |  SELECT doc_id AS query_id,
         |    substr(w[3], 1, 1) || substr(w[3], 3, 1) || substr(w[3], 5)
         |      AS word
         |  FROM ws
         |  WHERE doc_id % 17 = 0 AND len(w) >= 3
         |    AND length(w[3]) >= 5),
         |cand AS (
         |  SELECT q.query_id, q.word, v.word AS match, v.df,
         |    CAST(levenshtein(q.word, v.word) AS BIGINT) AS dist
         |  FROM qterms q, vocab v
         |  WHERE levenshtein(q.word, v.word) <= 2),
         |ranked AS (
         |  SELECT query_id, word, match, df, dist,
         |    row_number() OVER (PARTITION BY query_id, word
         |      ORDER BY dist, df DESC, match) AS r
         |  FROM cand)
         |SELECT query_id, word, match, df, dist, CAST(r AS BIGINT) AS rank
         |FROM ranked ORDER BY query_id, word, rank""".stripMargin,

    // q209's replay at dist <= 2: the best correction now carries a
    // REAL dist key (an ed-1 neighbor beats an ed-2 one before df
    // breaks ties), everything else identical
    "q227_bm25_fuzzy_ed2_topk" ->
      s"""WITH $LiveWordsCte,
         |tfv AS (
         |  SELECT doc_id, word, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(w) AS word FROM ws)
         |  GROUP BY 1, 2),
         |lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM ws),
         |stats AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
         |  FROM lens),
         |dft AS (SELECT word, count(*) AS df FROM tfv GROUP BY 1),
         |qraw AS (
         |  SELECT doc_id AS query_id,
         |    substr(w[2], 1, 1) || substr(w[2], 3, 1) || substr(w[2], 5)
         |      AS m2,
         |    w[3] AS m3, w[4] AS m4
         |  FROM ws
         |  WHERE doc_id % 17 = 0 AND len(w) >= 4
         |    AND length(w[2]) >= 5),
         |qterms AS (
         |  SELECT DISTINCT query_id, word FROM (
         |    SELECT query_id, unnest([m2, m3, m4]) AS word FROM qraw)),
         |oov AS (
         |  SELECT query_id, word FROM qterms
         |  WHERE word NOT IN (SELECT word FROM dft)),
         |inv AS (
         |  SELECT query_id, word FROM qterms
         |  WHERE word IN (SELECT word FROM dft)),
         |fcand AS (
         |  SELECT o.query_id, o.word, d.word AS cw, d.df,
         |    levenshtein(o.word, d.word) AS dist
         |  FROM oov o, dft d
         |  WHERE levenshtein(o.word, d.word) <= 2),
         |fbest AS (
         |  SELECT query_id, cw AS word FROM (
         |    SELECT query_id, word, cw,
         |      row_number() OVER (PARTITION BY query_id, word
         |        ORDER BY dist, df DESC, cw) AS r
         |    FROM fcand) x WHERE r = 1),
         |cq AS (
         |  SELECT DISTINCT query_id, word FROM (
         |    SELECT query_id, word FROM inv
         |    UNION ALL
         |    SELECT query_id, word FROM fbest)),
         |cenr AS (
         |  SELECT query_id, word, avgdl,
         |    ln(1.0 + (n_docs - CAST(df AS DOUBLE) + 0.5)
         |             / (CAST(df AS DOUBLE) + 0.5)) AS idf
         |  FROM cq JOIN dft USING (word) CROSS JOIN stats),
         |ccon AS (
         |  SELECT query_id, t.doc_id, t.word,
         |    idf * (CAST(t.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
         |      / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |         (1.0 - CAST(0.75 AS DOUBLE) +
         |          CAST(0.75 AS DOUBLE) * CAST(l.dl AS DOUBLE) / avgdl))
         |      AS c
         |  FROM tfv t JOIN cenr e ON e.word = t.word
         |  JOIN lens l ON l.doc_id = t.doc_id),
         |csc AS (
         |  SELECT query_id, doc_id,
         |    list_reduce(list(c ORDER BY word), (a, x) -> a + x) AS score
         |  FROM ccon GROUP BY 1, 2)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM csc) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the match set (bscores' rows), the source join, the count per
    // (query, facet), and the count-desc/facet-asc rank — all from
    // first principles
    "q210_facet_counts" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |fm AS (SELECT DISTINCT query_id, doc_id FROM bscores),
         |fc AS (
         |  SELECT f.query_id, d.source AS facet,
         |    CAST(count(*) AS BIGINT) AS n_docs
         |  FROM fm f JOIN documents d ON d.doc_id = f.doc_id
         |  WHERE d.source IS NOT NULL
         |  GROUP BY 1, 2),
         |rk AS (
         |  SELECT query_id, facet, n_docs,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY n_docs DESC, facet) AS r
         |  FROM fc)
         |SELECT query_id, facet, n_docs, CAST(r AS BIGINT) AS rank
         |FROM rk WHERE r <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // the prefix expansion from first principles: one starts_with scan
    // of the Zipf df table per distinct prefix, df-desc/word rank,
    // cap 8, re-attached to query ids
    "q211_prefix_term_match" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |qp AS (
         |  SELECT doc_id AS query_id,
         |    'w' || CAST(doc_id % 9 + 1 AS VARCHAR) AS prefix
         |  FROM documents
         |  WHERE doc_id IS NOT NULL AND doc_id % 50 = 0),
         |exp AS (
         |  SELECT p.prefix, d.word, d.df,
         |    row_number() OVER (PARTITION BY p.prefix
         |      ORDER BY d.df DESC, d.word) AS r
         |  FROM (SELECT DISTINCT prefix FROM qp) p
         |  JOIN dft d ON starts_with(d.word, p.prefix))
         |SELECT q.query_id, q.prefix, e.word, e.df,
         |  CAST(e.r AS BIGINT) AS rank
         |FROM qp q JOIN exp e USING (prefix)
         |WHERE e.r <= 8
         |ORDER BY query_id, prefix, rank""".stripMargin,

    // expansion + dedup + the exact scoring tree over the Zipf corpus
    "q212_bm25_prefix_topk" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |qp AS (
         |  SELECT doc_id AS query_id,
         |    'w' || CAST(doc_id % 9 + 1 AS VARCHAR) AS prefix
         |  FROM documents
         |  WHERE doc_id IS NOT NULL AND doc_id % 50 = 0),
         |exp AS (
         |  SELECT p.prefix, d.word, d.df,
         |    row_number() OVER (PARTITION BY p.prefix
         |      ORDER BY d.df DESC, d.word) AS r
         |  FROM (SELECT DISTINCT prefix FROM qp) p
         |  JOIN dft d ON starts_with(d.word, p.prefix)),
         |cq AS (
         |  SELECT DISTINCT q.query_id, e.word
         |  FROM qp q JOIN exp e USING (prefix) WHERE e.r <= 8),
         |cenr AS (
         |  SELECT query_id, word, avgdl,
         |    ln(1.0 + (n_docs - CAST(df AS DOUBLE) + 0.5)
         |             / (CAST(df AS DOUBLE) + 0.5)) AS idf
         |  FROM cq JOIN dft USING (word) CROSS JOIN stats),
         |ccon AS (
         |  SELECT query_id, t.doc_id, t.word,
         |    idf * (CAST(t.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
         |      / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |         (1.0 - CAST(0.75 AS DOUBLE) +
         |          CAST(0.75 AS DOUBLE) * CAST(l.dl AS DOUBLE) / avgdl))
         |      AS c
         |  FROM tfv t JOIN cenr e ON e.word = t.word
         |  JOIN lens l ON l.doc_id = t.doc_id),
         |csc AS (
         |  SELECT query_id, doc_id,
         |    list_reduce(list(c ORDER BY word), (a, x) -> a + x) AS score
         |  FROM ccon GROUP BY 1, 2)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM csc) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the PMI table from first principles: distinct (doc, word), the
    // df >= 3 support prune (exact — c(a,b) <= min(df)), ordered
    // pairs, counts, and ln(N·c/(df_a·df_b))
    "q213_pmi_collocations" ->
      s"""WITH $LiveWordsCte,
         |dw AS (
         |  SELECT DISTINCT doc_id, word
         |  FROM (SELECT doc_id, unnest(w) AS word FROM ws)),
         |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n
         |       FROM dw),
         |dft AS (SELECT word, CAST(count(*) AS BIGINT) AS df
         |        FROM dw GROUP BY 1),
         |keep AS (SELECT word, df FROM dft WHERE df >= 3),
         |dwk AS (SELECT doc_id, word FROM dw
         |        WHERE word IN (SELECT word FROM keep)),
         |pr AS (
         |  SELECT a.word AS word_a, b.word AS word_b,
         |    CAST(count(*) AS BIGINT) AS n_both
         |  FROM dwk a JOIN dwk b
         |    ON a.doc_id = b.doc_id AND a.word < b.word
         |  GROUP BY 1, 2 HAVING count(*) >= 3)
         |SELECT word_a, word_b, n_both, ka.df AS df_a, kb.df AS df_b,
         |  round(ln(n * CAST(n_both AS DOUBLE)
         |    / (CAST(ka.df AS DOUBLE) * CAST(kb.df AS DOUBLE))), 6)
         |    AS pmi
         |FROM pr
         |JOIN keep ka ON ka.word = pr.word_a
         |JOIN keep kb ON kb.word = pr.word_b
         |CROSS JOIN nd
         |ORDER BY word_a, word_b""".stripMargin,

    // positions, the 1..4 offset band, unordered pairs (same-word
    // pairs included — the GloVe X_aa convention), per-distance
    // counts, and the harmonic fold ordered by distance
    "q214_windowed_cooc" ->
      s"""WITH $LiveWordsCte,
         |posts AS (
         |  SELECT doc_id, CAST(j - 1 AS BIGINT) AS pos,
         |    w[CAST(j AS INT)] AS word
         |  FROM ws, unnest(generate_series(1, len(w))) AS t(j)),
         |band AS (
         |  SELECT doc_id, word AS wa, pos + d AS pos2, d
         |  FROM posts, unnest(generate_series(1, 4)) AS t(d)),
         |ev AS (
         |  SELECT least(b.wa, p2.word) AS word_a,
         |    greatest(b.wa, p2.word) AS word_b, b.d
         |  FROM band b JOIN posts p2 ON p2.doc_id = b.doc_id
         |    AND p2.pos = b.pos2),
         |byd AS (
         |  SELECT word_a, word_b, d, CAST(count(*) AS BIGINT) AS n
         |  FROM ev GROUP BY 1, 2, 3)
         |SELECT word_a, word_b, CAST(sum(n) AS BIGINT) AS n_events,
         |  round(list_reduce(list_prepend(0.0,
         |    list(CAST(n AS DOUBLE) / CAST(d AS DOUBLE) ORDER BY d)),
         |    (a, x) -> a + x), 6) AS cooc
         |FROM byd GROUP BY 1, 2 HAVING sum(n) >= 3
         |ORDER BY word_a, word_b""".stripMargin,

    // the shard metadata (per-shard df off the unique (doc, word)
    // rows, exact token sums), the T·I belief with the df=0 prior,
    // and the word-sorted mean — all from first principles
    "q215_cori_shards" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$CoriCtes
         |SELECT query_id, shard, round(score, 6) AS score,
         |  CAST(r AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, shard, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, shard) AS r
         |  FROM scored) z
         |ORDER BY query_id, rank""".stripMargin,

    // the greedy MMR recursion unrolled: pool, pooled-doc token sets,
    // sizes, pair intersections, the full sim matrix (zero-overlap
    // pairs included), then argmax / max-sim / argmax / max-sim /
    // argmax — each marginal the operator's exact arithmetic
    "q216_mmr_rerank" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |pool AS (
         |  SELECT query_id, doc_id, score FROM (
         |    SELECT query_id, doc_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM bscores) x WHERE r <= 10),
         |pids AS (SELECT DISTINCT doc_id FROM pool),
         |ptf AS (
         |  SELECT doc_id, word FROM tfv
         |  WHERE doc_id IN (SELECT doc_id FROM pids)),
         |psz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
         |        FROM ptf GROUP BY 1),
         |ppair AS (
         |  SELECT p1.query_id, p1.doc_id AS da, p2.doc_id AS db
         |  FROM pool p1 JOIN pool p2 ON p2.query_id = p1.query_id
         |    AND p2.doc_id != p1.doc_id),
         |pint AS (
         |  SELECT pr.query_id, pr.da, pr.db,
         |    CAST(count(*) AS BIGINT) AS iv
         |  FROM ppair pr
         |  JOIN ptf a ON a.doc_id = pr.da
         |  JOIN ptf b2 ON b2.doc_id = pr.db AND b2.word = a.word
         |  GROUP BY 1, 2, 3),
         |psim AS (
         |  SELECT pr.query_id, pr.da, pr.db,
         |    CAST(coalesce(iv, 0) AS DOUBLE)
         |      / CAST(sa.sz + sb.sz - coalesce(iv, 0) AS DOUBLE) AS sim
         |  FROM ppair pr
         |  LEFT JOIN pint ON pint.query_id = pr.query_id
         |    AND pint.da = pr.da AND pint.db = pr.db
         |  JOIN psz sa ON sa.doc_id = pr.da
         |  JOIN psz sb ON sb.doc_id = pr.db),
         |s1 AS (
         |  SELECT query_id, doc_id, mmr FROM (
         |    SELECT query_id, doc_id,
         |      CAST(0.7 AS DOUBLE) * score AS mmr,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY CAST(0.7 AS DOUBLE) * score DESC, doc_id) AS r
         |    FROM pool) x WHERE r = 1),
         |rem1 AS (
         |  SELECT p.query_id, p.doc_id, p.score FROM pool p
         |  WHERE NOT EXISTS (SELECT 1 FROM s1
         |    WHERE s1.query_id = p.query_id AND s1.doc_id = p.doc_id)),
         |m2 AS (
         |  SELECT r.query_id, r.doc_id, r.score, max(ps.sim) AS ms
         |  FROM rem1 r
         |  JOIN s1 ON s1.query_id = r.query_id
         |  JOIN psim ps ON ps.query_id = r.query_id
         |    AND ps.da = r.doc_id AND ps.db = s1.doc_id
         |  GROUP BY 1, 2, 3),
         |s2 AS (
         |  SELECT query_id, doc_id, mmr FROM (
         |    SELECT query_id, doc_id,
         |      CAST(0.7 AS DOUBLE) * score -
         |        CAST('${(1.0 - 0.7).toString}' AS DOUBLE) * ms AS mmr,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY CAST(0.7 AS DOUBLE) * score -
         |          CAST('${(1.0 - 0.7).toString}' AS DOUBLE) * ms DESC,
         |          doc_id) AS r
         |    FROM m2) y WHERE r = 1),
         |rem2 AS (
         |  SELECT r.query_id, r.doc_id, r.score FROM rem1 r
         |  WHERE NOT EXISTS (SELECT 1 FROM s2
         |    WHERE s2.query_id = r.query_id AND s2.doc_id = r.doc_id)),
         |sel2 AS (
         |  SELECT query_id, doc_id FROM s1
         |  UNION ALL SELECT query_id, doc_id FROM s2),
         |m3 AS (
         |  SELECT r.query_id, r.doc_id, r.score, max(ps.sim) AS ms
         |  FROM rem2 r
         |  JOIN sel2 ON sel2.query_id = r.query_id
         |  JOIN psim ps ON ps.query_id = r.query_id
         |    AND ps.da = r.doc_id AND ps.db = sel2.doc_id
         |  GROUP BY 1, 2, 3),
         |s3 AS (
         |  SELECT query_id, doc_id, mmr FROM (
         |    SELECT query_id, doc_id,
         |      CAST(0.7 AS DOUBLE) * score -
         |        CAST('${(1.0 - 0.7).toString}' AS DOUBLE) * ms AS mmr,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY CAST(0.7 AS DOUBLE) * score -
         |          CAST('${(1.0 - 0.7).toString}' AS DOUBLE) * ms DESC,
         |          doc_id) AS r
         |    FROM m3) z WHERE r = 1)
         |SELECT query_id, doc_id, round(mmr, 6) AS mmr_score,
         |  CAST(rk AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, mmr, 1 AS rk FROM s1
         |  UNION ALL SELECT query_id, doc_id, mmr, 2 FROM s2
         |  UNION ALL SELECT query_id, doc_id, mmr, 3 FROM s3) u
         |ORDER BY query_id, rank""".stripMargin,

    // the positive scoring chain restricted by queries that HAVE a
    // 5th token, the negative posting pull, and the anti-join — all
    // from first principles
    "q217_bm25_not_topk" ->
      s"""WITH ${bm25Cte("TRUE",
             s"doc_id % 97 = 0 AND len(list_filter(string_split_regex(" +
               s"regexp_replace(lower(text), '[^a-z0-9$WsClass]', ' ', 'g'), " +
               s"'[$WsClass]+'), x -> x != '')) >= 5",
             "substr(text, 1, 40)")},
         |$LiveWordsCte,
         |negterm AS (
         |  SELECT doc_id AS query_id, w[5] AS word
         |  FROM ws WHERE doc_id % 97 = 0 AND len(w) >= 5),
         |excl AS (
         |  SELECT DISTINCT n.query_id, t.doc_id
         |  FROM negterm n JOIN tfv t USING (word)),
         |kept AS (
         |  SELECT b.query_id, b.doc_id, b.score FROM bscores b
         |  WHERE NOT EXISTS (SELECT 1 FROM excl e
         |    WHERE e.query_id = b.query_id AND e.doc_id = b.doc_id))
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM kept) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // both metric chains (the pruned run's via the shared fragment,
    // the exact run's mirrored), paired differences on the common
    // queries, and the two-pass mean/variance folds with the
    // t = m/√(s²/n) readout (NULL at zero variance)
    "q218_paired_metrics_ttest" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |$RankingMetricsCtes,
         |brun AS (
         |  SELECT query_id, doc_id, CAST(r AS BIGINT) AS rank FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM bscores) yy WHERE r <= 5),
         |hcb AS (
         |  SELECT query_id, rank, grade,
         |    sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY query_id ORDER BY rank) AS nrelr
         |  FROM (
         |    SELECT r.query_id, r.rank, coalesce(q.grade, 0.0) AS grade
         |    FROM brun r LEFT JOIN qrels q USING (query_id, doc_id))),
         |perqb AS (
         |  SELECT query_id,
         |    CAST(sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_ret_rel,
         |    list_reduce(list_prepend(0.0, list(
         |      CASE WHEN grade > 0
         |        THEN CAST(nrelr AS DOUBLE) / CAST(rank AS DOUBLE)
         |        ELSE 0.0 END ORDER BY rank)), (a, x) -> a + x) AS psum,
         |    list_reduce(list_prepend(0.0, list(
         |      (power(2.0, grade) - 1.0)
         |        / (ln(CAST(rank + 1 AS DOUBLE)) / ln(2.0))
         |      ORDER BY rank)), (a, x) -> a + x) AS dcgs,
         |    min(CASE WHEN grade > 0 THEN rank END) AS frr
         |  FROM hcb GROUP BY 1),
         |metb AS (
         |  SELECT n.query_id,
         |    CAST(coalesce(n_ret_rel, 0) AS DOUBLE) / 5.0 AS p_at_k,
         |    CAST(coalesce(n_ret_rel, 0) AS DOUBLE) / CAST(n_rel AS DOUBLE)
         |      AS recall_at_k,
         |    CASE WHEN frr IS NULL THEN 0.0
         |         ELSE 1.0 / CAST(frr AS DOUBLE) END AS rr,
         |    coalesce(psum, 0.0) / CAST(n_rel AS DOUBLE) AS ap,
         |    coalesce(dcgs, 0.0) / idcg AS ndcg
         |  FROM nrel n
         |  LEFT JOIN perqb USING (query_id)
         |  LEFT JOIN idcgt USING (query_id)),
         |diffs AS (
         |  SELECT a.query_id,
         |    a.p_at_k - b.p_at_k AS d_p_at_k,
         |    a.recall_at_k - b.recall_at_k AS d_recall_at_k,
         |    a.rr - b.rr AS d_rr,
         |    a.ap - b.ap AS d_ap,
         |    a.ndcg - b.ndcg AS d_ndcg
         |  FROM met a JOIN metb b USING (query_id)),
         |mns AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    list_reduce(list_prepend(0.0,
         |      list(d_p_at_k ORDER BY query_id)), (a, x) -> a + x)
         |      / CAST(count(*) AS DOUBLE) AS m_p_at_k,
         |    list_reduce(list_prepend(0.0,
         |      list(d_recall_at_k ORDER BY query_id)), (a, x) -> a + x)
         |      / CAST(count(*) AS DOUBLE) AS m_recall_at_k,
         |    list_reduce(list_prepend(0.0,
         |      list(d_rr ORDER BY query_id)), (a, x) -> a + x)
         |      / CAST(count(*) AS DOUBLE) AS m_rr,
         |    list_reduce(list_prepend(0.0,
         |      list(d_ap ORDER BY query_id)), (a, x) -> a + x)
         |      / CAST(count(*) AS DOUBLE) AS m_ap,
         |    list_reduce(list_prepend(0.0,
         |      list(d_ndcg ORDER BY query_id)), (a, x) -> a + x)
         |      / CAST(count(*) AS DOUBLE) AS m_ndcg
         |  FROM diffs),
         |vr AS (
         |  SELECT any_value(n) AS n,
         |    any_value(m_p_at_k) AS m_p_at_k,
         |    any_value(m_recall_at_k) AS m_recall_at_k,
         |    any_value(m_rr) AS m_rr,
         |    any_value(m_ap) AS m_ap,
         |    any_value(m_ndcg) AS m_ndcg,
         |    list_reduce(list_prepend(0.0, list(
         |      (d_p_at_k - m_p_at_k) * (d_p_at_k - m_p_at_k)
         |      ORDER BY query_id)), (a, x) -> a + x) AS s_p_at_k,
         |    list_reduce(list_prepend(0.0, list(
         |      (d_recall_at_k - m_recall_at_k)
         |        * (d_recall_at_k - m_recall_at_k)
         |      ORDER BY query_id)), (a, x) -> a + x) AS s_recall_at_k,
         |    list_reduce(list_prepend(0.0, list(
         |      (d_rr - m_rr) * (d_rr - m_rr)
         |      ORDER BY query_id)), (a, x) -> a + x) AS s_rr,
         |    list_reduce(list_prepend(0.0, list(
         |      (d_ap - m_ap) * (d_ap - m_ap)
         |      ORDER BY query_id)), (a, x) -> a + x) AS s_ap,
         |    list_reduce(list_prepend(0.0, list(
         |      (d_ndcg - m_ndcg) * (d_ndcg - m_ndcg)
         |      ORDER BY query_id)), (a, x) -> a + x) AS s_ndcg
         |  FROM diffs CROSS JOIN mns)
         |SELECT n AS n_queries,
         |  round(m_p_at_k, 6) AS d_p_at_k,
         |  round(CASE WHEN n > 1 AND s_p_at_k > 0
         |    THEN m_p_at_k / sqrt(s_p_at_k
         |      / (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)) END, 6)
         |    AS t_p_at_k,
         |  round(m_recall_at_k, 6) AS d_recall_at_k,
         |  round(CASE WHEN n > 1 AND s_recall_at_k > 0
         |    THEN m_recall_at_k / sqrt(s_recall_at_k
         |      / (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)) END, 6)
         |    AS t_recall_at_k,
         |  round(m_rr, 6) AS d_rr,
         |  round(CASE WHEN n > 1 AND s_rr > 0
         |    THEN m_rr / sqrt(s_rr
         |      / (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)) END, 6)
         |    AS t_rr,
         |  round(m_ap, 6) AS d_ap,
         |  round(CASE WHEN n > 1 AND s_ap > 0
         |    THEN m_ap / sqrt(s_ap
         |      / (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)) END, 6)
         |    AS t_ap,
         |  round(m_ndcg, 6) AS d_ndcg,
         |  round(CASE WHEN n > 1 AND s_ndcg > 0
         |    THEN m_ndcg / sqrt(s_ndcg
         |      / (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)) END, 6)
         |    AS t_ndcg
         |FROM vr""".stripMargin,

    // the two scoring chains REUSED VERBATIM (bscores + qlsc — the
    // bitwise-consistency proof), the matched-pair stats, and the
    // coverage arithmetic
    "q219_ltr_features" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$QlCtes,
         |mstat AS (
         |  SELECT query_id, t.doc_id, CAST(count(*) AS BIGINT) AS n_matched,
         |    list_reduce(list_prepend(0.0, list(e.idf ORDER BY e.word)),
         |      (a, x) -> a + x) AS sum_idf
         |  FROM tfv t JOIN enriched e ON e.word = t.word
         |  GROUP BY 1, 2),
         |qful AS (SELECT query_id, count(*) AS nq FROM qterms GROUP BY 1)
         |SELECT b.query_id, b.doc_id,
         |  round(b.score, 6) AS bm25, round(q.score, 6) AS ql,
         |  m.n_matched,
         |  round(CAST(m.n_matched AS DOUBLE) / CAST(f.nq AS DOUBLE), 6)
         |    AS coverage,
         |  l.dl, round(m.sum_idf, 6) AS sum_idf
         |FROM bscores b
         |JOIN qlsc q ON q.query_id = b.query_id AND q.doc_id = b.doc_id
         |JOIN mstat m ON m.query_id = b.query_id AND m.doc_id = b.doc_id
         |JOIN qful f ON f.query_id = b.query_id
         |JOIN lens l ON l.doc_id = b.doc_id
         |ORDER BY b.query_id, b.doc_id""".stripMargin,

    // q219's feature CTEs UNROUNDED, then the pinned projection with
    // the operator's exact left association
    // (((((bias + w1·bm25) + w2·ql) + w3·n) + w4·cov) + w5·dl) + w6·idf
    // and the rank — a weight, order, or association drift fails here
    "q228_ltr_rerank" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$QlCtes,
         |mstat AS (
         |  SELECT query_id, t.doc_id, CAST(count(*) AS BIGINT) AS n_matched,
         |    list_reduce(list_prepend(0.0, list(e.idf ORDER BY e.word)),
         |      (a, x) -> a + x) AS sum_idf
         |  FROM tfv t JOIN enriched e ON e.word = t.word
         |  GROUP BY 1, 2),
         |qful AS (SELECT query_id, count(*) AS nq FROM qterms GROUP BY 1),
         |ltr AS (
         |  SELECT b.query_id, b.doc_id,
         |    CAST(0.1 AS DOUBLE)
         |      + CAST(0.6 AS DOUBLE) * b.score
         |      + CAST(0.05 AS DOUBLE) * q.score
         |      + CAST(0.3 AS DOUBLE) * CAST(m.n_matched AS DOUBLE)
         |      + CAST(1.5 AS DOUBLE) *
         |        (CAST(m.n_matched AS DOUBLE) / CAST(f.nq AS DOUBLE))
         |      + CAST(-0.01 AS DOUBLE) * CAST(l.dl AS DOUBLE)
         |      + CAST(0.2 AS DOUBLE) * m.sum_idf AS score
         |  FROM bscores b
         |  JOIN qlsc q ON q.query_id = b.query_id AND q.doc_id = b.doc_id
         |  JOIN mstat m ON m.query_id = b.query_id AND m.doc_id = b.doc_id
         |  JOIN qful f ON f.query_id = b.query_id
         |  JOIN lens l ON l.doc_id = b.doc_id)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM ltr) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // q228's replay restricted to the top-20 candidate set (rank over
    // bscores, exact — so the oracle's candidates ARE the operator's)
    // — a pair-fetch drift that loses or invents a candidate's
    // feature row breaks the re-ranked rows
    "q232_cascade_rerank" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$QlCtes,
         |btop AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM bscores) x WHERE r <= 20),
         |mstat AS (
         |  SELECT query_id, t.doc_id, CAST(count(*) AS BIGINT) AS n_matched,
         |    list_reduce(list_prepend(0.0, list(e.idf ORDER BY e.word)),
         |      (a, x) -> a + x) AS sum_idf
         |  FROM tfv t JOIN enriched e ON e.word = t.word
         |  GROUP BY 1, 2),
         |qful AS (SELECT query_id, count(*) AS nq FROM qterms GROUP BY 1),
         |ltr AS (
         |  SELECT b.query_id, b.doc_id,
         |    CAST(0.1 AS DOUBLE)
         |      + CAST(0.6 AS DOUBLE) * b.score
         |      + CAST(0.05 AS DOUBLE) * q.score
         |      + CAST(0.3 AS DOUBLE) * CAST(m.n_matched AS DOUBLE)
         |      + CAST(1.5 AS DOUBLE) *
         |        (CAST(m.n_matched AS DOUBLE) / CAST(f.nq AS DOUBLE))
         |      + CAST(-0.01 AS DOUBLE) * CAST(l.dl AS DOUBLE)
         |      + CAST(0.2 AS DOUBLE) * m.sum_idf AS score
         |  FROM bscores b
         |  JOIN btop c ON c.query_id = b.query_id AND c.doc_id = b.doc_id
         |  JOIN qlsc q ON q.query_id = b.query_id AND q.doc_id = b.doc_id
         |  JOIN mstat m ON m.query_id = b.query_id AND m.doc_id = b.doc_id
         |  JOIN qful f ON f.query_id = b.query_id
         |  JOIN lens l ON l.doc_id = b.doc_id)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM ltr) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // positions from first principles (q188's posts CTE over the live
    // docs), matched occurrences via the qterms join, the lag window
    // per (query, doc) in position order, different-term transitions
    // only, then min/avg/count — LEFT-joined so no-signal pairs
    // surface as NULLs, never dropped rows
    "q229_ltr_features_prox" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$LiveWordsCte,
         |posts AS (
         |  SELECT doc_id, CAST(j - 1 AS BIGINT) AS pos,
         |    w[CAST(j AS INT)] AS word
         |  FROM ws, unnest(generate_series(1, len(w))) AS t(j)),
         |pocc AS (
         |  SELECT q.query_id, p.doc_id, p.pos, p.word
         |  FROM posts p JOIN qterms q USING (word)),
         |gaps AS (
         |  SELECT query_id, doc_id, pos - ppos AS g FROM (
         |    SELECT query_id, doc_id, pos, word,
         |      lag(word) OVER (PARTITION BY query_id, doc_id
         |        ORDER BY pos) AS pword,
         |      lag(pos) OVER (PARTITION BY query_id, doc_id
         |        ORDER BY pos) AS ppos
         |    FROM pocc) x
         |  WHERE pword IS NOT NULL AND pword <> word),
         |prox AS (
         |  SELECT query_id, doc_id, min(g) AS min_dist,
         |    CAST(sum(g) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |      AS avg_dist,
         |    CAST(count(*) AS BIGINT) AS n_gaps
         |  FROM gaps GROUP BY 1, 2)
         |SELECT b.query_id, b.doc_id, round(b.score, 6) AS bm25,
         |  p.min_dist, round(p.avg_dist, 6) AS avg_dist, p.n_gaps
         |FROM bscores b
         |LEFT JOIN prox p ON p.query_id = b.query_id
         |  AND p.doc_id = b.doc_id
         |ORDER BY b.query_id, b.doc_id""".stripMargin,

    // both top-10 chains, the common-doc join, the ordered pair
    // enumeration, and the τ arithmetic from first principles — the
    // hot-only queries appear with n_common = 0 and null τ
    "q220_kendall_tau" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |$PrunedScoresCtes,
         |arun AS (
         |  SELECT query_id, doc_id, CAST(r AS BIGINT) AS ra FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM psc) x WHERE r <= 10),
         |brun AS (
         |  SELECT query_id, doc_id, CAST(r AS BIGINT) AS rb FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM bscores) y WHERE r <= 10),
         |qids AS (
         |  SELECT DISTINCT query_id FROM (
         |    SELECT query_id FROM arun
         |    UNION ALL SELECT query_id FROM brun)),
         |cmn AS (
         |  SELECT a.query_id, a.doc_id, a.ra, b.rb
         |  FROM arun a JOIN brun b USING (query_id, doc_id)),
         |prs AS (
         |  SELECT c1.query_id,
         |    CASE WHEN (c1.ra < c2.ra) = (c1.rb < c2.rb)
         |      THEN 1 ELSE 0 END AS conc
         |  FROM cmn c1 JOIN cmn c2 ON c2.query_id = c1.query_id
         |    AND c1.doc_id < c2.doc_id),
         |agg AS (
         |  SELECT query_id, CAST(sum(conc) AS BIGINT) AS c,
         |    CAST(sum(1 - conc) AS BIGINT) AS d
         |  FROM prs GROUP BY 1),
         |nc AS (
         |  SELECT q.query_id, CAST(coalesce(k.n, 0) AS BIGINT) AS n_common
         |  FROM qids q LEFT JOIN (
         |    SELECT query_id, count(*) AS n FROM cmn GROUP BY 1) k
         |  USING (query_id))
         |SELECT n.query_id, n_common,
         |  coalesce(c, 0) AS n_concordant,
         |  coalesce(d, 0) AS n_discordant,
         |  round(CASE WHEN n_common >= 2
         |    THEN CAST(coalesce(c, 0) - coalesce(d, 0) AS DOUBLE)
         |      / CAST(n_common * (n_common - 1) // 2 AS DOUBLE) END, 6)
         |    AS tau
         |FROM nc n LEFT JOIN agg USING (query_id)
         |ORDER BY query_id""".stripMargin,

    // the per-term champion ranking (tf desc, dl asc, docId), the
    // m = 20 cut, and the scoring chain over the KEPT rows with the
    // full-corpus df/stats — from first principles
    "q221_champion_topk" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |${championCte(20)},
         |ccon AS (
         |  SELECT query_id, ch.doc_id, ch.word,
         |    idf * (CAST(ch.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
         |      / (CAST(ch.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |         (1.0 - CAST(0.75 AS DOUBLE) +
         |          CAST(0.75 AS DOUBLE) * CAST(l.dl AS DOUBLE) / avgdl))
         |      AS cc
         |  FROM champ ch JOIN enriched e ON e.word = ch.word
         |  JOIN lens l ON l.doc_id = ch.doc_id),
         |csc AS (
         |  SELECT query_id, doc_id,
         |    list_reduce(list(cc ORDER BY word), (a, x) -> a + x) AS score
         |  FROM ccon GROUP BY 1, 2)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM csc) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the champion chain (q221's), the fill count, and both routed
    // branches from first principles — tier 1 rows must be exactly
    // the champion probe's, tier 2 exactly the full probe's
    "q222_bm25_tiered_topk" ->
      s"""WITH ${bm25Cte("TRUE",
             s"doc_id % 97 = 0 AND length($TieredQueryTextSql) > 0",
             TieredQueryTextSql)},
         |${championCte(3)},
         |ccon AS (
         |  SELECT query_id, ch.doc_id, ch.word,
         |    idf * (CAST(ch.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
         |      / (CAST(ch.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |         (1.0 - CAST(0.75 AS DOUBLE) +
         |          CAST(0.75 AS DOUBLE) * CAST(l.dl AS DOUBLE) / avgdl))
         |      AS cc
         |  FROM champ ch JOIN enriched e ON e.word = ch.word
         |  JOIN lens l ON l.doc_id = ch.doc_id),
         |csc AS (
         |  SELECT query_id, doc_id,
         |    list_reduce(list(cc ORDER BY word), (a, x) -> a + x) AS score
         |  FROM ccon GROUP BY 1, 2),
         |t1 AS (
         |  SELECT query_id, doc_id, score, r FROM (
         |    SELECT query_id, doc_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM csc) z WHERE r <= 5),
         |filled AS (
         |  SELECT query_id FROM t1 GROUP BY 1 HAVING count(*) = 5),
         |t2 AS (
         |  SELECT query_id, doc_id, score, r FROM (
         |    SELECT query_id, doc_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM bscores
         |    WHERE query_id NOT IN (SELECT query_id FROM filled)) y
         |  WHERE r <= 5)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(r AS BIGINT) AS rank, CAST(tier AS BIGINT) AS tier
         |FROM (
         |  SELECT t1.query_id, t1.doc_id, t1.score, t1.r, 1 AS tier
         |  FROM t1 WHERE t1.query_id IN (SELECT query_id FROM filled)
         |  UNION ALL
         |  SELECT query_id, doc_id, score, r, 2 FROM t2) u
         |ORDER BY query_id, rank""".stripMargin,

    // the QL RM3 chain from first principles: qlsc's top-10, the
    // stable softmax (exp(s − max)/Σ, docId-sorted folds), the
    // Rm3Ctes-shaped tail (mass truncation, renormalization, λ=0.5
    // mix, empty-feedback fallback), then the weighted QL tree with
    // the word-sorted weight-mass normalizer. q234 maps to the SAME
    // replay: its weighted QL WAND second pass is score-exact, so
    // the unpruned oracle IS its contract
    "q233_ql_rm3_rescore" -> QlRm3RescoreOracle,
    "q234_ql_rm3_wand_rescore" -> QlRm3RescoreOracle,
    "q241_ql_rm3_wand_zipf" -> QlRm3RescoreZipfOracle,
        // q222's replay with the QL chains: the champion tier scored by
    // the QL tree (full-corpus cf/|C|/nq, champion tf rows, lens dl),
    // the fill-count routing, and the exact tier from qlsc — the
    // WAND tier-2 is score-exact, so the oracle never models it
    "q231_ql_tiered_topk" ->
      s"""WITH ${bm25Cte("TRUE",
             s"doc_id % 97 = 0 AND length($TieredQueryTextSql) > 0",
             TieredQueryTextSql)},
         |$QlCtes,
         |${championCte(3)},
         |cqcon AS (
         |  SELECT q.query_id, ch.doc_id, ch.word,
         |    ln(1.0 + CAST(ch.tf AS DOUBLE) * ctokens
         |      / (CAST(2000 AS DOUBLE) * CAST(q.cf AS DOUBLE))) AS c,
         |    l.dl
         |  FROM champ ch JOIN qcf q ON q.word = ch.word
         |  JOIN lens l ON l.doc_id = ch.doc_id
         |  CROSS JOIN ctok),
         |cqsc AS (
         |  SELECT query_id, doc_id,
         |    list_reduce(list(c ORDER BY word), (a, x) -> a + x)
         |      + CAST(nq AS DOUBLE) *
         |        ln(CAST(2000 AS DOUBLE)
         |           / (CAST(dl AS DOUBLE) + CAST(2000 AS DOUBLE)))
         |      AS score
         |  FROM cqcon JOIN qnq USING (query_id)
         |  GROUP BY query_id, doc_id, nq, dl),
         |t1 AS (
         |  SELECT query_id, doc_id, score, r FROM (
         |    SELECT query_id, doc_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM cqsc) z WHERE r <= 5),
         |filled AS (
         |  SELECT query_id FROM t1 GROUP BY 1 HAVING count(*) = 5),
         |t2 AS (
         |  SELECT query_id, doc_id, score, r FROM (
         |    SELECT query_id, doc_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM qlsc
         |    WHERE query_id NOT IN (SELECT query_id FROM filled)) y
         |  WHERE r <= 5)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(r AS BIGINT) AS rank, CAST(tier AS BIGINT) AS tier
         |FROM (
         |  SELECT t1.query_id, t1.doc_id, t1.score, t1.r, 1 AS tier
         |  FROM t1 WHERE t1.query_id IN (SELECT query_id FROM filled)
         |  UNION ALL
         |  SELECT query_id, doc_id, score, r, 2 FROM t2) u
         |ORDER BY query_id, rank""".stripMargin,

    // the UNPRUNED QL chain over the Zipf WAND fixture (q199's CTEs):
    // the pruned operator must be row- and bit-identical to it
    "q223_ql_wand_topk" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |$QlCtes
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM qlsc) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the QL decision table from first principles: per-word
    // (max_tf, min_dl) off the posting rows, the per-term ceiling
    // ln(1 + max_tf·|C|/(μ·cf)) word-sorted-folded ×(1+1e-9), the
    // dl-floor normalizer nq·ln(μ/(min min_dl + μ)) ×(1−1e-9) —
    // both margin constants exact toString round-trips — θ from the
    // QL scores of the rare-term candidate pairs, and the routing
    // predicate verbatim
    "q224_ql_wand_stats" -> qlWandStatsOracle("TRUE"),
    // the SAME decision-table replay over the SURVIVING corpus — the
    // deleted-compaction impact table must read indistinguishably
    // from metadata rebuilt on the survivors
    "q238_ql_wand_stats_deleted" -> qlWandStatsOracle("doc_id % 9 <> 3"),

    // q219's feature assembly UNROUNDED + the top-3 qrel labeling +
    // the winner-minus-loser preference self-join — RankNet's
    // training view from first principles
    "q236_ltr_pref_pairs" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$QlCtes,
         |mstat AS (
         |  SELECT query_id, t.doc_id, CAST(count(*) AS BIGINT) AS n_matched,
         |    list_reduce(list_prepend(0.0, list(e.idf ORDER BY e.word)),
         |      (a, x) -> a + x) AS sum_idf
         |  FROM tfv t JOIN enriched e ON e.word = t.word
         |  GROUP BY 1, 2),
         |qful AS (SELECT query_id, count(*) AS nq FROM qterms GROUP BY 1),
         |feats AS (
         |  SELECT b.query_id, b.doc_id, b.score AS bm25, q.score AS ql,
         |    m.n_matched,
         |    CAST(m.n_matched AS DOUBLE) / CAST(f.nq AS DOUBLE)
         |      AS coverage,
         |    l.dl, m.sum_idf
         |  FROM bscores b
         |  JOIN qlsc q ON q.query_id = b.query_id AND q.doc_id = b.doc_id
         |  JOIN mstat m ON m.query_id = b.query_id AND m.doc_id = b.doc_id
         |  JOIN qful f ON f.query_id = b.query_id
         |  JOIN lens l ON l.doc_id = b.doc_id),
         |qrel AS (
         |  SELECT query_id, doc_id FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM bscores) x WHERE r <= 3),
         |lab AS (
         |  SELECT f.*, CASE WHEN r.doc_id IS NOT NULL
         |    THEN 1.0 ELSE 0.0 END AS label
         |  FROM feats f LEFT JOIN qrel r
         |    ON r.query_id = f.query_id AND r.doc_id = f.doc_id)
         |SELECT i.query_id AS query_id,
         |  CAST(i.doc_id AS VARCHAR) || '#' || CAST(j.doc_id AS VARCHAR)
         |    AS pair_id,
         |  round(i.bm25 - j.bm25, 6) AS bm25,
         |  round(i.ql - j.ql, 6) AS ql,
         |  i.n_matched - j.n_matched AS n_matched,
         |  round(i.coverage - j.coverage, 6) AS coverage,
         |  i.dl - j.dl AS dl,
         |  round(i.sum_idf - j.sum_idf, 6) AS sum_idf
         |FROM lab i JOIN lab j
         |  ON i.query_id = j.query_id AND i.label > j.label
         |ORDER BY query_id, pair_id""".stripMargin,

    // the feature assembly over the doc_id<500 Zipf fixture UNROUNDED
    // (q228's CTE shape over the zipf corpus), then the PINNED
    // pairwise-trained weights (ltrTrainPairwise at iters=10 lr=0.5 on
    // the bm25-top-3-labeled preference pairs — regenerate with
    // `runMain graft.Scratch ltr_pin`; exact toString round-trips) in
    // the model's left association with bias 0 (it cancels in the
    // pairwise margin) — dl trains to EXACTLY 0.0 here (every zipf doc
    // is 30 tokens, so all pairwise dl-diffs are zero → zero-RMS drop),
    // and that zero is pinned too
    "q244_ltr_pairwise_rerank" ->
      s"""WITH ${bm25Cte("doc_id < 500",
             "doc_id % 50 = 0 AND doc_id < 500",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |$QlCtes,
         |mstat AS (
         |  SELECT query_id, t.doc_id, CAST(count(*) AS BIGINT) AS n_matched,
         |    list_reduce(list_prepend(0.0, list(e.idf ORDER BY e.word)),
         |      (a, x) -> a + x) AS sum_idf
         |  FROM tfv t JOIN enriched e ON e.word = t.word
         |  GROUP BY 1, 2),
         |qful AS (SELECT query_id, count(*) AS nq FROM qterms GROUP BY 1),
         |ltr AS (
         |  SELECT b.query_id, b.doc_id,
         |    CAST(0.0 AS DOUBLE)
         |      + CAST('0.15344099956976578' AS DOUBLE) * b.score
         |      + CAST('0.8563598576624881' AS DOUBLE) * q.score
         |      + CAST('0.4826985611668672' AS DOUBLE)
         |        * CAST(m.n_matched AS DOUBLE)
         |      + CAST('2.3097072823377016' AS DOUBLE) *
         |        (CAST(m.n_matched AS DOUBLE) / CAST(f.nq AS DOUBLE))
         |      + CAST(0.0 AS DOUBLE) * CAST(l.dl AS DOUBLE)
         |      + CAST('0.1548132073266439' AS DOUBLE) * m.sum_idf AS score
         |  FROM bscores b
         |  JOIN qlsc q ON q.query_id = b.query_id AND q.doc_id = b.doc_id
         |  JOIN mstat m ON m.query_id = b.query_id AND m.doc_id = b.doc_id
         |  JOIN qful f ON f.query_id = b.query_id
         |  JOIN lens l ON l.doc_id = b.doc_id)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM ltr) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the CORI selection (q215's CTEs), the top-2 probe set, the
    // GLOBAL-statistics scores restricted to probed (query, shard)
    // pairs, and the merged rank — federated select → probe → merge
    // from first principles
    "q237_federated_topk" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$CoriCtes,
         |sel AS (
         |  SELECT query_id, shard FROM (
         |    SELECT query_id, shard,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, shard) AS r
         |    FROM scored) z WHERE r <= 2),
         |probed AS (
         |  SELECT b.query_id, b.doc_id, b.score
         |  FROM bscores b JOIN sel s ON s.query_id = b.query_id
         |    AND s.shard = CAST(b.doc_id % 4 AS BIGINT))
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM probed) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the CORI selection (q215's CTEs), the top-2 probe set, the
    // GLOBAL-cf QL scores restricted to probed pairs, the merged rank
    "q242_federated_ql_topk" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$QlCtes,
         |$CoriCtes,
         |sel AS (
         |  SELECT query_id, shard FROM (
         |    SELECT query_id, shard,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, shard) AS r
         |    FROM scored) z WHERE r <= 2),
         |probed AS (
         |  SELECT b.query_id, b.doc_id, b.score
         |  FROM qlsc b JOIN sel s ON s.query_id = b.query_id
         |    AND s.shard = CAST(b.doc_id % 4 AS BIGINT))
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM probed) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the UNPRUNED federated replay over the Zipf fixture (q237's
    // select → probe → merge chain on q182's corpus/queries): the
    // gate's WAND-pruned probes must merge BITWISE into it — the
    // score-exactness claim IS the oracle
    "q248_federated_wand_topk" -> FederatedZipfTopKOracle,
    // THE SAME REPLAY (one shared string — the one-definition rule
    // for "the federated Zipf ranking"): the routed default serves
    // this fixture through the unpruned branch (500 docs <
    // minWandDocs) and must answer identically — routing is pure
    // economics, q248 already pins the other branch bitwise
    "q251_federated_topk_routed" -> FederatedZipfTopKOracle,

    // the federated decision table from first principles: q205's
    // impact-tightened replay (GLOBAL (max_tf, min_dl) ceilings —
    // selection never weakens the bound) with the candidate set
    // RESTRICTED to the CORI-selected (query, shard) pairs, θ from
    // the probed candidates' exact global-statistics scores — a
    // selection or shard-restriction drift moves n_candidates/theta
    // even when q248's top-k survives it
    "q249_federated_wand_stats" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |$CoriCtes,
         |sel AS (
         |  SELECT query_id, shard FROM (
         |    SELECT query_id, shard,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, shard) AS r
         |    FROM scored) z WHERE r <= 2),
         |hotcut AS (SELECT count(*) // 10 AS cut FROM corpus),
         |split AS (
         |  SELECT query_id, word, df, cut
         |  FROM qterms JOIN dft USING (word) CROSS JOIN hotcut),
         |counts AS (
         |  SELECT query_id,
         |    CAST(sum(CASE WHEN df <= cut THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_rare_terms,
         |    CAST(sum(CASE WHEN df > cut THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_hot_terms
         |  FROM split GROUP BY 1),
         |cands AS (
         |  SELECT DISTINCT s.query_id, t.doc_id
         |  FROM split s JOIN tfv t USING (word)
         |  JOIN sel ON sel.query_id = s.query_id
         |    AND sel.shard = CAST(t.doc_id % 4 AS BIGINT)
         |  WHERE s.df <= s.cut),
         |ncand AS (
         |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates
         |  FROM cands GROUP BY 1),
         |imps AS (
         |  SELECT t.word, max(t.tf) AS max_tf, min(l.dl) AS min_dl
         |  FROM tfv t JOIN lens l ON l.doc_id = t.doc_id
         |  GROUP BY 1),
         |ubt AS (
         |  SELECT e.query_id,
         |    list_reduce(list_prepend(0.0, list(
         |      e.idf * (CAST(max_tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
         |        / (CAST(max_tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |           (1.0 - CAST(0.75 AS DOUBLE) +
         |            CAST(0.75 AS DOUBLE) * CAST(min_dl AS DOUBLE) / e.avgdl))
         |      ORDER BY e.word)), (a, x) -> a + x) *
         |      CAST('${(1.0 + 1e-9).toString}' AS DOUBLE) AS ub
         |  FROM enriched e JOIN dft d USING (word) JOIN imps USING (word)
         |  CROSS JOIN hotcut
         |  WHERE d.df > cut GROUP BY e.query_id),
         |cscore AS (
         |  SELECT b.query_id, b.doc_id, b.score
         |  FROM bscores b JOIN cands c USING (query_id, doc_id)),
         |th AS (
         |  SELECT query_id, score AS theta FROM (
         |    SELECT query_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM cscore) x WHERE r = 5)
         |SELECT c.query_id, n_rare_terms, n_hot_terms,
         |  CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
         |  round(ub, 6) AS ub, round(theta, 6) AS theta,
         |  NOT (n_hot_terms > 0 AND (theta IS NULL OR ub >= theta)) AS safe
         |FROM counts c
         |LEFT JOIN ncand USING (query_id)
         |LEFT JOIN ubt USING (query_id)
         |LEFT JOIN th USING (query_id)
         |ORDER BY query_id""".stripMargin,

    // q237's replay over the SURVIVING corpus only (doc_id % 9 <> 3):
    // every shard statistic, global df, and corpus stat recomputed
    // from survivors — the compacted shard metadata must select and
    // score indistinguishably from a federation rebuilt post-delete
    "q250_federated_topk_deleted" ->
      s"""WITH ${bm25Cte("doc_id % 9 <> 3", "doc_id % 97 = 0",
             "substr(text, 1, 40)")},
         |$CoriCtes,
         |sel AS (
         |  SELECT query_id, shard FROM (
         |    SELECT query_id, shard,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, shard) AS r
         |    FROM scored) z WHERE r <= 2),
         |probed AS (
         |  SELECT b.query_id, b.doc_id, b.score
         |  FROM bscores b JOIN sel s ON s.query_id = b.query_id
         |    AND s.shard = CAST(b.doc_id % 4 AS BIGINT))
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM probed) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the UNPRUNED fielded replay over the Zipf fielded corpus — the
    // q202 chain with the fixture swapped, so the gate is the BM25F
    // WAND score-exactness claim itself
    "q239_bm25f_wand_topk" ->
      s"""WITH ${bm25fCtes(s"substr($ZipfWandCorpusTextSql, 1, 40)",
             s"substr($ZipfWandCorpusTextSql, 41)",
             "TRUE", "doc_id % 50 = 0", ZipfWandQueryTextSql)}
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM fsc) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the fielded decision table from first principles (shared
    // replay, corpus = the full fixture) — see bm25fWandStatsOracle
    "q240_bm25f_wand_stats" -> bm25fWandStatsOracle("TRUE"),
    // the SAME decision-table replay over the SURVIVING fielded
    // corpus — the deleted-compaction fielded impact table must read
    // indistinguishably from metadata rebuilt on the survivors
    "q247_bm25f_wand_stats_deleted" ->
      bm25fWandStatsOracle("doc_id % 9 <> 3"),

    // THE FULL-CORPUS REBUILD (q180's oracle verbatim): the compacted
    // (tf, df, stats) triple must probe indistinguishably from an index
    // built over the whole corpus at once
    "q183_bm25_compact_index" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |ranked AS (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM bscores)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // positions + aligned starts from first principles: posting rows
    // (doc, j−1, w[j]), phrase offsets (i, w[i+2]) for i in 0..2, a
    // start s hosts the phrase iff count(DISTINCT matched i) at
    // (query, doc, s) equals the phrase length
    "q188_phrase_matches" -> phraseProbeOracle("TRUE"),

    // THE FULL-CORPUS REPLAY (q188's oracle verbatim): the compacted
    // positional table must probe indistinguishably from an index
    // built over the whole corpus at once
    "q193_pos_compact_index" -> phraseProbeOracle("TRUE"),

    // THE SURVIVOR REPLAY: the posts CTE simply excludes src0 docs —
    // no subtraction anywhere in the oracle — while phrase queries
    // still come from the full doc set
    "q194_pos_compact_deleted" -> phraseProbeOracle(
      "doc_id IN (SELECT doc_id FROM documents WHERE source <> 'src0')"),

    // both halves in one oracle: the scoring chain over the SLICED
    // query text (the phrase words re-joined) and the positional
    // containment replay; the ranking is the scored rows semi-joined
    // on matched (query, doc) pairs
    "q195_bm25_phrase_topk" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 101 = 0", PhraseQueryTextSql)},
         |$LiveWordsCte,
         |${phraseCandCtes("TRUE")},
         |matched AS (
         |  SELECT query_id, doc_id
         |  FROM occ JOIN qn USING (query_id)
         |  WHERE m = n GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM bscores JOIN matched USING (query_id, doc_id))
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // ordered tuples enumerated outright: positions a < b < c carrying
    // the phrase's offset-0/1/2 words with c - a <= 4 (window 5 = 3 +
    // slop 2; the inner band b - a <= 3 is implied and bounds the
    // join), min window per (query, doc) — no chain, no greedy, no
    // anchor anywhere in the oracle
    "q196_proximity_matches" ->
      s"""WITH $LiveWordsCte,
         |posts AS (
         |  SELECT doc_id, CAST(j - 1 AS BIGINT) AS pos, w[CAST(j AS INT)] AS word
         |  FROM ws, unnest(generate_series(1, len(w))) AS t(j)),
         |ph AS (
         |  SELECT doc_id AS query_id, CAST(i AS BIGINT) AS i,
         |    w[CAST(i + 2 AS INT)] AS word
         |  FROM ws, unnest(generate_series(0, 2)) AS t(i)
         |  WHERE doc_id % 101 = 0 AND len(w) >= 4),
         |tup AS (
         |  SELECT p0.query_id, a.doc_id, c.pos - a.pos + 1 AS win
         |  FROM (SELECT query_id, word FROM ph WHERE i = 0) p0
         |  JOIN posts a ON a.word = p0.word
         |  JOIN (SELECT query_id, word FROM ph WHERE i = 1) p1
         |    ON p1.query_id = p0.query_id
         |  JOIN posts b ON b.word = p1.word AND b.doc_id = a.doc_id
         |    AND b.pos > a.pos AND b.pos - a.pos <= 3
         |  JOIN (SELECT query_id, word FROM ph WHERE i = 2) p2
         |    ON p2.query_id = p0.query_id
         |  JOIN posts c ON c.word = p2.word AND c.doc_id = a.doc_id
         |    AND c.pos > b.pos AND c.pos - a.pos <= 4)
         |SELECT query_id, doc_id, CAST(min(win) AS BIGINT) AS min_window
         |FROM tup
         |GROUP BY query_id, doc_id
         |ORDER BY query_id, doc_id""".stripMargin,

    "q189_rm3_expansion" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$Rm3Ctes
         |SELECT query_id, word, round(weight, 6) AS weight
         |FROM finalw ORDER BY query_id, word""".stripMargin,

    // the weighted second pass: expansion weights × the identical BM25
    // contribution tree (weight * ((idf * X) / Y) — the operator's
    // exact association), term-sorted fold, rank
    "q190_rm3_rescore" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 97 = 0", "substr(text, 1, 40)")},
         |$Rm3Ctes,
         |$Rm3RescoreCtes
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM wsc) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the full RM3 composition THROUGH the weighted WAND plan, over
    // the Zipf fixture (first pass score-exact wand-routed, second
    // pass weighted-wand-routed) — while the ORACLE IS THE UNPRUNED
    // COMPOSITION: no bound, no candidate restriction, no fallback
    // split anywhere. Equality proves the weighted bound
    // Σ_hot weight·idf·(k1+1) and the rare-candidate restriction lose
    // no true top-k row at either pass
    "q191_rm3_wand_rescore" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |$Rm3Ctes,
         |$Rm3RescoreCtes
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM wsc) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // ...and the WEIGHTED decision table replayed from first
    // principles (the q187 convention on the weighted operator): term
    // split from the expanded weight table, candidates = docs sharing
    // a RARE expanded term, theta = 5th weighted score among
    // candidates, ub = Σ_hot weight·idf times the operator's exact
    // double constant, routing predicate verbatim
    "q192_rm3_wand_stats" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id % 50 = 0",
             ZipfWandQueryTextSql, ZipfWandCorpusTextSql)},
         |$Rm3Ctes,
         |$Rm3RescoreCtes,
         |hotcut AS (SELECT count(*) // 10 AS cut FROM corpus),
         |counts AS (
         |  SELECT query_id,
         |    CAST(sum(CASE WHEN df <= cut THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_rare_terms,
         |    CAST(sum(CASE WHEN df > cut THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_hot_terms
         |  FROM wenr CROSS JOIN hotcut GROUP BY 1),
         |cands AS (
         |  SELECT DISTINCT w.query_id, t.doc_id
         |  FROM wenr w JOIN tfv t USING (word) CROSS JOIN hotcut
         |  WHERE w.df <= cut),
         |ncand AS (
         |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_candidates
         |  FROM cands GROUP BY 1),
         |ubt AS (
         |  SELECT query_id,
         |    list_reduce(list_prepend(0.0,
         |      list(weight * idf ORDER BY word)), (a, x) -> a + x) *
         |      CAST('${((1.2 + 1.0) * (1.0 + 1e-9)).toString}' AS DOUBLE)
         |      AS ub
         |  FROM wenr CROSS JOIN hotcut WHERE df > cut GROUP BY query_id),
         |cscore AS (
         |  SELECT b.query_id, b.doc_id, b.score
         |  FROM wsc b JOIN cands c USING (query_id, doc_id)),
         |th AS (
         |  SELECT query_id, score AS theta FROM (
         |    SELECT query_id, score,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS r
         |    FROM cscore) x WHERE r = 5)
         |SELECT c.query_id, n_rare_terms, n_hot_terms,
         |  CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
         |  round(ub, 6) AS ub, round(theta, 6) AS theta,
         |  NOT (n_hot_terms > 0 AND (theta IS NULL OR ub >= theta)) AS safe
         |FROM counts c
         |LEFT JOIN ncand USING (query_id)
         |LEFT JOIN ubt USING (query_id)
         |LEFT JOIN th USING (query_id)
         |ORDER BY query_id""".stripMargin,

    // THE SURVIVOR REBUILD: the corpus CTE simply excludes src0 — no
    // subtraction anywhere in the oracle, which is exactly the claim
    "q186_bm25_compact_deleted" ->
      s"""WITH ${bm25Cte("source <> 'src0'", "doc_id % 97 = 0",
             "substr(text, 1, 40)")},
         |ranked AS (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM bscores)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // THE SURVIVOR REBUILD for the champion tier: the corpus CTE
    // simply excludes the deleted ids — no merge, no affected-term
    // recompute anywhere in the oracle — then q222's champion CTE at
    // m = 3 and the probe; the twice-compacted layout must be
    // indistinguishable from it
    "q225_champion_compact" ->
      s"""WITH ${bm25Cte("doc_id % 11 <> 0", "doc_id % 97 = 0",
             "substr(text, 1, 40)")},
         |${championCte(3)},
         |ccon AS (
         |  SELECT query_id, ch.doc_id, ch.word,
         |    idf * (CAST(ch.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
         |      / (CAST(ch.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |         (1.0 - CAST(0.75 AS DOUBLE) +
         |          CAST(0.75 AS DOUBLE) * CAST(l.dl AS DOUBLE) / avgdl))
         |      AS cc
         |  FROM champ ch JOIN enriched e ON e.word = ch.word
         |  JOIN lens l ON l.doc_id = ch.doc_id),
         |csc AS (
         |  SELECT query_id, doc_id,
         |    list_reduce(list(cc ORDER BY word), (a, x) -> a + x) AS score
         |  FROM ccon GROUP BY 1, 2)
         |SELECT query_id, doc_id, round(score, 6) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rank
         |  FROM csc) z
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // both component rankings replayed in full — the BM25 chain and the
    // residual-IVFADC chain (the q119 CTEs, k=10) — then the fusion sum
    // as a src-ordered list_reduce matching rrfFuse's sorted fold
    "q185_hybrid_dense_sparse" ->
      s"""WITH ${bm25Cte("TRUE", "doc_id < 20", "substr(text, 1, 40)")},
         |bmtop AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, doc_id) AS rank
         |    FROM bscores) WHERE rank <= 10),
         |$IvfAdcCtes,
         |anntop AS (
         |  SELECT query_id, neighbor_id AS doc_id, rank
         |  FROM ranked WHERE rank <= 10),
         |fcontrib AS (
         |  SELECT query_id, doc_id, 0 AS src,
         |    1.0 / (60.0 + CAST(rank AS DOUBLE)) AS rrf FROM bmtop
         |  UNION ALL
         |  SELECT query_id, doc_id, 1,
         |    1.0 / (60.0 + CAST(rank AS DOUBLE)) FROM anntop),
         |fused AS (
         |  SELECT query_id, doc_id,
         |    list_reduce(list(rrf ORDER BY src), (a, x) -> a + x)
         |      AS rrf_score
         |  FROM fcontrib GROUP BY 1, 2)
         |SELECT query_id, doc_id, round(rrf_score, 9) AS rrf_score,
         |  CAST(frank AS BIGINT) AS rank
         |FROM (
         |  SELECT query_id, doc_id, rrf_score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf_score DESC, doc_id) AS frank
         |  FROM fused)
         |WHERE frank <= 10
         |ORDER BY query_id, rank""".stripMargin,
  )
}
