package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

import graft.functions.{GraftFunctions, HashFunctions, TextAnalysis, TextFunctions}
import graft.operators.{Bpe, CountMin, Decontaminate, Dedup, Jaccard, Kmv, Knn, Pca, Pq, QualityLr, Scrub, TemporalJoins}
import graft.QShared._

/** Deduplication: exact, minhash/lsh (incl. the banding sweep and streaming/batch ingest gates), simhash/cosine near-dup, connected components, span/chunk/line dedup, semantic dedup, sketches (hll/kmv/cms/bloom), and decontamination — one registry slice of [[SparkEntry]]
  * (queries and their DuckDB oracles; see SparkEntry for the
  * hash-parity conventions every entry follows).
  */
private[graft] object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- deduplication suite (training-data pipeline)
    "q30_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("text_hash")
    }),
    // MinHash sketches 3-word shingle sets, not unigram sets: the fixture
    // corpus has a ~31-word vocabulary, so unigram sets are near-identical
    // across docs and LSH banding would degenerate to an all-pairs join.
    "q31_minhash_sig" -> ((s, dir) => {
      Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id", "text",
        k = 8, tokenize = Dedup.shingleTokenizer(3))
        .select(col("doc_id"), col("perm").cast("long").as("perm"),
          col("min_hash"))
        .orderBy("doc_id", "perm")
    }),
    "q32_lsh_candidates" -> ((s, dir) => {
      val sigs = Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id",
        "text", k = 8, tokenize = Dedup.shingleTokenizer(3))
      Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
        .orderBy("id_a", "id_b")
    }),
    // MinHash-estimated Jaccard on the LSH candidate pairs: fraction of
    // the k=8 permutations on which the two signatures agree — the cheap
    // verify step between banding and an exact n-gram check
    "q48_minhash_estimate" -> ((s, dir) => {
      val sigs = Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id",
        "text", k = 8, tokenize = Dedup.shingleTokenizer(3))
      val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
        .select("id_a", "id_b")
      Dedup.minHashEstimate(cands, sigs, "doc_id", k = 8)
        .orderBy("id_a", "id_b")
    }),
    "q33_simhash" -> ((s, dir) => {
      Dedup.simHashes(docsSorted(s, dir), "doc_id", "text", bits = 32)
    }),
    // exact all-pairs verifier, candidate-/block-scoped by contract:
    // maxBlockSize enforces "blocks don't grow with the corpus" in-plan
    // (raise_error before the quadratic join); the scale path is q65
    "q34_simhash_neardups" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sims = Dedup.simHashes(docs, "doc_id", "text", bits = 32)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      Dedup.simHashNearDups(sims, "doc_id", col("source"), maxHamming = 8,
        maxBlockSize = 10000L)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    }),
    // the SAME near-dup pairs as q34, produced by the scale-safe path:
    // pigeonhole banding over the 32-bit simhash (9 bands for
    // maxHamming=8) — candidates from an equi-join on (source, band#,
    // band bits), Hamming verified on candidates only. Gated by q34's
    // oracle verbatim, proving the banded path emits exactly the
    // all-pairs verifier's result with no block-wide self-join
    "q65_simhash_neardups_banded" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sims = Dedup.simHashes(docs, "doc_id", "text", bits = 32)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      Dedup.simHashNearDupsBanded(sims, "doc_id", col("source"),
        maxHamming = 8, bits = 32)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    }),
    "q35_ngram_neardups" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, blockCol = col("source"), minJaccard = 0.2)
        .select(col("id_a"), col("id_b"),
          col("inter").cast("long").as("inter"),
          col("size_a").cast("long").as("size_a"),
          col("size_b").cast("long").as("size_b"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),
    "q37_hll_registers" -> ((s, dir) => {
      // portable HLL sketch of distinct-token counts per source: the
      // registers are deterministic integers, so they gate exactly.
      // rlike pre-filter + outer explode: equivalent to inner explode
      // (empty-token docs emit nothing either way) without the inferred
      // size()>0 filter that re-runs the tokenizer in the scan filter
      val posts = t(s, dir, "documents")
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(col("source"), TextFunctions.normalizeTokens(col("text")).as("__toks"))
        .select(col("source"), explode_outer(col("__toks")).as("tok"))
      graft.operators.Hll.registers(posts, Seq("source"), "tok", m = 64)
        .orderBy("source", "bucket")
    }),
    // same signature values as q31, computed from EXPLODED (id, token)
    // postings via the typed MinHashAggregator UDAF — gated by the SAME
    // oracle SQL as q31, proving the two formulations equivalent
    "q38_minhash_postings" -> ((s, dir) => {
      GraftFunctions.register(s)
      val posts = t(s, dir, "documents")
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(col("doc_id"),
          Dedup.shingleTokenizer(3)(col("text")).as("__sh"))
        .select(col("doc_id"), explode_outer(col("__sh")).as("word"))
      Dedup.minHashSignaturesFromPostings(posts, "doc_id", "word", k = 8)
        .select(col("doc_id"), col("perm").cast("long").as("perm"),
          col("min_hash"))
        .orderBy("doc_id", "perm")
    }),
    // the double-math estimate on top of the q37 registers, rounded to
    // 6 dp (the registers are exact-gated; the estimate's arithmetic is
    // reproduced op-for-op in the oracle so it gates too)
    "q39_hll_estimate" -> ((s, dir) => {
      val posts = t(s, dir, "documents")
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(col("source"), TextFunctions.normalizeTokens(col("text")).as("__toks"))
        .select(col("source"), explode_outer(col("__toks")).as("tok"))
      val regs = graft.operators.Hll.registers(posts, Seq("source"), "tok",
        m = 64)
      graft.operators.Hll.estimate(regs, Seq("source"), m = 64)
        .select(col("source"), round(col("estimate"), 6).as("estimate"))
        .orderBy("source")
    }),
    // exact all-pairs verifier, block-scoped by contract: maxBlockSize
    // enforces the bound in-plan (see q34); the scale path is q66
    "q36_cosine_neardups" -> ((s, dir) => {
      Dedup.cosineNearDups(t(s, dir, "embeddings"), "vec_id", "embedding",
        blockCol = col("label"), minCosine = 0.3, maxBlockSize = 10000L)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // cosine near-dups behind LSH candidate generation — the scale path
    // cosineNearDups' scaladoc defers to, now gated end to end: SRP
    // buckets → shared-bucket candidate pairs → exact cosine ≥ τ on
    // candidates only (no block-wide self-join anywhere in the plan)
    "q66_cosine_neardups_lsh" -> ((s, dir) => {
      Dedup.cosineNearDupsLsh(t(s, dir, "embeddings"), "vec_id",
        "embedding", tables = 2, planes = 4, minCosine = 0.3, dim = 64)
        .select(col("id_a"), col("id_b"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // near-dup CLUSTER resolution: connected components over the LSH
    // candidate graph (transitive-closure dedup policy)
    "q45_neardup_components" -> ((s, dir) => {
      val sigs = Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id",
        "text", k = 8, tokenize = Dedup.shingleTokenizer(3))
      val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
      Dedup.connectedComponents(cands, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    }),
    // the SAME labeling via large-star/small-star contraction — the
    // O(log)-round extreme-scale path (diameter-independent), gated by
    // q45's oracle verbatim to prove the two formulations agree
    "q69_neardup_components_star" -> ((s, dir) => {
      val sigs = Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id",
        "text", k = 8, tokenize = Dedup.shingleTokenizer(3))
      val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
      Dedup.connectedComponentsStar(cands, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    }),
    // benchmark decontamination: training docs (source != src0) whose
    // 3-gram coverage of any held-out src0 doc crosses the threshold
    // leakage-safe train/val/test assignment: the split hashes the
    // near-dup CLUSTER id (q69's component labeling), so no cluster
    // straddles a split boundary; singletons fall back to their own id
    "q175_cluster_safe_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", k = 8,
        tokenize = Dedup.shingleTokenizer(3))
      val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
      val comps = Dedup.connectedComponentsStar(cands, "id_a", "id_b")
      graft.operators.Sampling.clusterSafeSplit(
        docs.select(col("doc_id")), "doc_id", comps,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id")
    }),
    "q46_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Decontaminate.ngramOverlap(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 3, minCoverage = 0.2)
        .select(col("doc_id"), col("bench_id"),
          col("shared").cast("long").as("shared"), col("bench_sz"),
          round(col("coverage"), 4).as("coverage"))
        .orderBy("doc_id", "bench_id")
    }),
    "q53_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprints(docsSorted(s, dir), "doc_id", "text")
    }),

    // duplicated-span removal (RefinedWeb "remove duplicated spans" at
    // chunk granularity — the operation q76 only measures): cut every
    // 8-token window shared by more than 2 docs, reassemble the rest
    "q96_drop_dup_chunks" -> ((s, dir) => {
      graft.operators.Chunking.dropDuplicatedChunks(
        t(s, dir, "documents"), "doc_id", "text", width = 8, maxDf = 2L)
        .orderBy("doc_id")
    }),
    // count-min sketch cells over the token OCCURRENCE stream (multiset —
    // contrast q37's HLL, which sketches the distinct set). Deterministic
    // integers, so the registers gate exactly, like q37
    "q77_cms_registers" -> ((s, dir) => {
      val posts = t(s, dir, "documents")
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(TextFunctions.normalizedWords(col("text")).as("__ws"))
        .select(explode_outer(col("__ws")).as("tok"))
      CountMin.registers(posts, "tok", depth = 4, width = 64)
        .orderBy("row", "bucket")
    }),
    // CMS point estimates for the exact top-10 tokens, next to their true
    // counts — the heavy-hitter readout (est ≥ exact; both engines
    // compute the same deterministic cells, so any collision inflates
    // both sides identically)
    "q78_cms_heavy_hitters" -> ((s, dir) => {
      val posts = t(s, dir, "documents")
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(TextFunctions.normalizedWords(col("text")).as("__ws"))
        .select(explode_outer(col("__ws")).as("tok"))
      val top = posts.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("tok")).limit(10)
      val regs = CountMin.registers(posts, "tok", depth = 4, width = 64)
      CountMin.estimate(regs, top.select("tok"), "tok", depth = 4, width = 64)
        .join(top, "tok")
        .select(col("tok"), col("exact"), col("est"))
        .orderBy("tok")
    }),
    // the corpus AFTER exact dedup (keeper = min doc_id per content
    // hash) — the materialization q30's group table feeds
    "q79_dedup_keep_first" -> ((s, dir) => {
      Dedup.exactDeduped(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),
    // Bloom filter of the benchmark corpus's 3-shingle set — the
    // broadcastable membership sketch (deterministic bit rows, exact gate
    // like q37's HLL registers and q77's CMS cells)
    "q80_bloom_bits" -> ((s, dir) => {
      GraftFunctions.register(s)
      val bench = t(s, dir, "documents")
        .filter(col("source") === "src0" &&
          lower(col("text")).rlike("[a-z0-9]"))
        .select(TextFunctions.normalizedWords(col("text")).as("__ws"))
        .select(explode_outer(array_distinct(
          GraftFunctions.wordNGrams(col("__ws"), 3))).as("shingle"))
      graft.operators.Bloom.bits(bench, "shingle", m = 65536, k = 3)
        .orderBy("bit")
    }),
    // q46's decontamination overlap answered from the q80 sketch instead
    // of the cross-corpus posting join: the training side never shuffles
    // by content — k broadcast joins + one per-doc aggregation. n_maybe
    // counts shingles the filter flags (includes its deterministic false
    // positives; both engines reproduce them bit-identically)
    "q81_bloom_decontaminate" -> ((s, dir) => {
      GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      def shingles(df: DataFrame): DataFrame = df
        .filter(lower(col("text")).rlike("[a-z0-9]"))
        .select(col("doc_id"),
          TextFunctions.normalizedWords(col("text")).as("__ws"))
        .select(col("doc_id"), explode_outer(array_distinct(
          GraftFunctions.wordNGrams(col("__ws"), 3))).as("shingle"))
      val benchBits = graft.operators.Bloom.bits(
        shingles(docs.filter(col("source") === "src0")).select("shingle"),
        "shingle", m = 65536, k = 3)
      graft.operators.Bloom.probeStats(benchBits,
        shingles(docs.filter(col("source") =!= "src0")),
        "doc_id", "shingle", m = 65536, k = 3)
        .orderBy("doc_id")
    }),
    // the near-dup dedup pipeline end to end: shingles → minhash → LSH
    // candidates → connected components → keeper corpus (q45's labeling
    // turned into the deduplicated corpus a trainer actually reads)
    "q87_neardup_keepers" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", k = 8,
        tokenize = Dedup.shingleTokenizer(3))
      val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
      Dedup.nearDupKeepers(docs, "doc_id",
        Dedup.connectedComponents(cands, "id_a", "id_b"))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // SemDeDup-style semantic dedup: Lloyd-REFINED IVF cells (seed +
    // one ivfRefine round, the q67 pattern) → within-cell cosine pairs
    // → components → keeper corpus. Blocking key is the quantizer cell —
    // sized by the centroid count, a knob scaled with the corpus, unlike
    // q36's fixed label blocks; refinement is the shape a real SemDeDup
    // deployment runs (balanced cells, not arbitrary seed vectors)
    "q90_semantic_keepers" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val seeds = Knn.ivfSeedCentroids(embs, "vec_id", "embedding",
        kCells = 16)
      val cents = Knn.ivfRefine(embs, "vec_id", "embedding", seeds,
        iters = 1)
      Dedup.semanticKeepers(embs.select(col("vec_id"), col("label")),
        embs, "vec_id", "embedding", cents, minCosine = 0.3)
        .orderBy("vec_id")
    }),
    // incremental ingest dedup: the src0 batch probed against the
    // already-indexed rest of the corpus via MinHash band join — never
    // batch×batch, never index×index (q32's parameters, split sides)
    "q105_incremental_lsh" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.incrementalLshMatches(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"),
        "doc_id", "text", k = 8, bands = 4,
        tokenize = Dedup.shingleTokenizer(3))
        .orderBy("batch_id", "index_id")
    }),

    // WITHIN-document repeated-span removal: any 2-token run already
    // seen earlier in the same document is cut (first occurrence
    // survives) — the removal form of the dup2gram_frac metric Gopher
    // gates on; perfectly row-local, zero shuffles
    "q126_drop_repeated_spans" -> ((s, dir) => {
      graft.operators.Chunking.dropRepeatedSpans(
        t(s, dir, "documents"), "doc_id", "text", width = 2)
        .orderBy("doc_id")
    }),

    // ExactSubstr-grade span removal (Lee et al. 2022): stride-1
    // 8-token shingles at arbitrary boundaries, df > 2 spans removed as
    // merged maximal runs — catches the boundary-straddling duplicates
    // q96's fixed windows miss
    "q120_drop_dup_spans" -> ((s, dir) => {
      graft.operators.Chunking.dropDuplicatedSpans(
        t(s, dir, "documents"), "doc_id", "text", width = 8, maxDf = 2L)
        .orderBy("doc_id")
    }),

    // quality-aware keeper corpus (FineWeb-style): q87's clusters, but
    // each cluster contributes its BEST exemplar, not its lowest id.
    // The quality expr deliberately produces NULLs (n_chars % 97 == 0)
    // so the oracle gates the nulls-sort-last argmax ordering too.
    "q121_best_keepers" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sigs = Dedup.minHashSignatures(docs, "doc_id", "text", k = 8,
        tokenize = Dedup.shingleTokenizer(3))
      val cands = Dedup.lshCandidates(sigs, "doc_id", k = 8, bands = 4)
      Dedup.bestKeepers(docs, "doc_id",
        Dedup.connectedComponents(cands, "id_a", "id_b"),
        expr("nullif(n_chars % 97, 0)"))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // cross-document LINE dedup (CCNet paragraph-hash dedup — the unit
    // web boilerplate repeats at): each doc is wrapped in a four-line
    // shell — corpus-wide header, its own text, a footer shared by its
    // doc_id % 7 group, a unique signature — and every line seen in
    // more than 4 distinct docs vanishes from ALL of them (first copy
    // included), so only the doc's own text and signature survive
    "q149_drop_dup_lines" -> ((s, dir) => {
      val wrapped = t(s, dir, "documents").where(col("doc_id").isNotNull)
        .select(col("doc_id"), concat_ws("\n",
          lit("site navigation home about contact"),
          col("text"),
          concat(lit("footer group "),
            (col("doc_id") % 7).cast("string")),
          concat(lit("doc signature "),
            col("doc_id").cast("string"))).as("text"))
      graft.operators.Chunking.dropDuplicatedLines(
        wrapped, "doc_id", "text", maxDf = 4L)
        .orderBy("doc_id")
    }),

    // ingest-time LSH gate, run in batch: src0 arrivals vs the banded
    // index of the landed corpus — the q105 collision rule's COMPLEMENT
    // (a doc survives iff it shares no band with any indexed doc), so
    // the oracle is the anti-join of q105's hit set. Broadcast-probe
    // shape (streamingLshGate): one distinct index build, reused across
    // the per-band hash probes
    "q162_streaming_lsh_gate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = Dedup.indexBandKeys(docs.filter(col("source") =!= "src0"),
        "doc_id", "text", k = 8, bands = 4,
        tokenize = Dedup.shingleTokenizer(3))
      Dedup.streamingLshGate(docs.filter(col("source") === "src0"),
        "text", idx, k = 8, bands = 4,
        tokenize = Dedup.shingleTokenizer(3))
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // the SAME gate in the corpus-scale shuffle shape (lshGate): band
    // keys explode into (band, band_key) rows, ONE semi-join probes the
    // index, colliding ids anti-join out — no broadcast anywhere, so it
    // holds when the index outgrows the q162 broadcast path. Same
    // oracle complement
    "q163_lsh_gate_batch" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idx = Dedup.indexBandKeys(docs.filter(col("source") =!= "src0"),
        "doc_id", "text", k = 8, bands = 4,
        tokenize = Dedup.shingleTokenizer(3))
      Dedup.lshGate(docs.filter(col("source") === "src0"),
        "doc_id", "text", idx, k = 8, bands = 4,
        tokenize = Dedup.shingleTokenizer(3))
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // multi-width LSH banding tuning curve from ONE signature pass and
    // ONE band join (the q135 once-then-subset pattern for the dedup
    // family): per band count, candidate volume and recall of the
    // est-Jaccard ≥ 0.5 pairs — truth enumerated within the WIDEST
    // (most permissive) level, the same widest-probe convention as
    // q135's ground truth. N band settings never cost N shuffles
    "q143_lsh_band_sweep" -> ((s, dir) => {
      val sigs = Dedup.minHashSignatures(t(s, dir, "documents"), "doc_id",
        "text", k = 8, tokenize = Dedup.shingleTokenizer(3))
      val sweep = Dedup.lshCandidatesSweep(sigs, "doc_id", k = 8,
        bandCounts = Seq(1, 2, 4, 8))
      val widest = sweep.filter(col("bands") === 8).select("id_a", "id_b")
      val truth = Dedup.minHashEstimate(widest, sigs, "doc_id", k = 8)
        .filter(col("est_jaccard") >= 0.5).select("id_a", "id_b")
      val totals = broadcast(truth.agg(count(lit(1)).as("n_true")))
      // anchor on the level list (the q135 left-join convention): a
      // level with zero candidates keeps its row
      import s.implicits._
      Seq(1, 2, 4, 8).toDF("bands")
        .join(sweep.groupBy("bands").agg(count(lit(1)).as("n_candidates")),
          Seq("bands"), "left")
        .join(sweep.join(truth, Seq("id_a", "id_b"), "left_semi")
          .groupBy("bands").agg(count(lit(1)).as("n_true_found")),
          Seq("bands"), "left")
        .crossJoin(totals)
        .select(col("bands").cast("long").as("bands"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          coalesce(col("n_true_found"), lit(0L)).as("n_true_found"),
          col("n_true"),
          round(coalesce(col("n_true_found"), lit(0L)).cast("double")
            / col("n_true"), 6).as("recall"))
        .orderBy("bands")
    }),
  )

  val oracles: Map[String, String] = Map(
    // ---- dedup suite oracles
    "q30_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id,
        |  count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY text_hash""".stripMargin,
    "q31_minhash_sig" -> MinHashSigOracle,
    "q38_minhash_postings" -> MinHashSigOracle,
    "q32_lsh_candidates" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |$SigCte,
         |banded AS (
         |  SELECT doc_id, CAST(perm // 2 AS INT) AS band,
         |    list(min_hash ORDER BY perm) AS band_key
         |  FROM sig GROUP BY doc_id, band)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  count(*) AS n_shared_bands
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.band_key = b.band_key
         |  AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |ORDER BY id_a, id_b""".stripMargin,
    // candidates = the q32 banding CTE; estimate = fraction of the k=8
    // perms agreeing (n/8 is a dyadic rational — exact in double)
    "q48_minhash_estimate" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |$SigCte,
         |banded AS (
         |  SELECT doc_id, CAST(perm // 2 AS INT) AS band,
         |    list(min_hash ORDER BY perm) AS band_key
         |  FROM sig GROUP BY doc_id, band),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id)
         |SELECT c.id_a, c.id_b,
         |  CAST(sum(CASE WHEN sa.min_hash = sb.min_hash
         |    THEN 1 ELSE 0 END) AS DOUBLE) / 8 AS est_jaccard
         |FROM cand c
         |JOIN sig sa ON sa.doc_id = c.id_a
         |JOIN sig sb ON sb.doc_id = c.id_b AND sb.perm = sa.perm
         |GROUP BY c.id_a, c.id_b
         |ORDER BY id_a, id_b""".stripMargin,
    // the sweep's semantics stated directly: finest (bands=8,
    // one-perm) matches; a level-B band is matched iff its aligned
    // group of 8/B finest bands fully matched; truth = est ≥ 0.5
    // within the widest level's candidates
    "q143_lsh_band_sweep" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |$SigCte,
         |fb AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.perm AS band
         |  FROM sig a JOIN sig b
         |    ON a.perm = b.perm AND a.min_hash = b.min_hash
         |    AND a.doc_id < b.doc_id),
         |lvls AS (SELECT unnest([1, 2, 4, 8]) AS bands),
         |grp AS (
         |  SELECT l.bands, fb.id_a, fb.id_b,
         |    fb.band // (8 // l.bands) AS g, count(*) AS nb
         |  FROM fb CROSS JOIN lvls l
         |  GROUP BY l.bands, fb.id_a, fb.id_b, g),
         |cand AS (
         |  SELECT bands, id_a, id_b, count(*) AS n_shared_bands
         |  FROM grp WHERE nb = 8 // bands
         |  GROUP BY bands, id_a, id_b),
         |widest AS (SELECT id_a, id_b FROM cand WHERE bands = 8),
         |est AS (
         |  SELECT c.id_a, c.id_b,
         |    CAST(sum(CASE WHEN sa.min_hash = sb.min_hash
         |      THEN 1 ELSE 0 END) AS DOUBLE) / 8 AS ej
         |  FROM widest c
         |  JOIN sig sa ON sa.doc_id = c.id_a
         |  JOIN sig sb ON sb.doc_id = c.id_b AND sb.perm = sa.perm
         |  GROUP BY c.id_a, c.id_b),
         |truth AS (SELECT id_a, id_b FROM est WHERE ej >= 0.5),
         |tt AS (SELECT count(*) AS n_true FROM truth),
         |counts AS (
         |  SELECT bands, count(*) AS n_candidates FROM cand GROUP BY bands),
         |found AS (
         |  SELECT bands, count(*) AS n_true_found
         |  FROM cand JOIN truth USING (id_a, id_b) GROUP BY bands)
         |SELECT CAST(l.bands AS BIGINT) AS bands,
         |  coalesce(c.n_candidates, 0) AS n_candidates,
         |  coalesce(f.n_true_found, 0) AS n_true_found,
         |  tt.n_true,
         |  round(CAST(coalesce(f.n_true_found, 0) AS DOUBLE)
         |    / tt.n_true, 6) AS recall
         |FROM lvls l
         |LEFT JOIN counts c ON l.bands = c.bands
         |LEFT JOIN found f ON l.bands = f.bands
         |CROSS JOIN tt
         |ORDER BY bands""".stripMargin,

    "q33_simhash" -> SimHashOracle,
    "q34_simhash_neardups" -> SimHashNearDupOracle,
    "q65_simhash_neardups_banded" -> SimHashNearDupOracle,
    "q35_ngram_neardups" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    len(list_intersect(a.shingles, b.shingles)) AS inter,
         |    len(a.shingles) AS size_a, len(b.shingles) AS size_b
         |  FROM sh a JOIN sh b
         |    ON a.source = b.source AND a.doc_id < b.doc_id),
         |scored AS (
         |  SELECT id_a, id_b, inter, size_a, size_b,
         |    CASE WHEN size_a + size_b - inter > 0
         |      THEN CAST(inter AS DOUBLE) / (size_a + size_b - inter)
         |      ELSE 0.0 END AS jaccard
         |  FROM pairs)
         |SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
         |  CAST(size_a AS BIGINT) AS size_a, CAST(size_b AS BIGINT) AS size_b,
         |  round(jaccard, 4) AS jaccard
         |FROM scored WHERE jaccard >= 0.2
         |ORDER BY id_a, id_b""".stripMargin,
    "q37_hll_registers" ->
      s"""WITH $ToksCte,
         |posts AS (SELECT source, unnest(t.tokens) AS tok
         |          FROM toks t JOIN documents d ON t.doc_id = d.doc_id
         |          WHERE len(t.tokens) > 0),
         |hashed AS (SELECT source, ${h60("tok")} AS h FROM posts),
         |ranked AS (
         |  SELECT source, CAST(h % 64 AS BIGINT) AS bucket,
         |    CASE WHEN h // 64 = 0 THEN 55
         |      ELSE CAST(log2((h // 64) & (-(h // 64))) AS BIGINT) + 1
         |    END AS rho
         |  FROM hashed)
         |SELECT source, bucket, max(rho) AS rho
         |FROM ranked GROUP BY source, bucket
         |ORDER BY source, bucket""".stripMargin,
    // estimate arithmetic mirrors Hll.estimate op-for-op: same alpha
    // expression, same 2^-rho sum, same linear-counting branch (natural
    // log), so the doubles agree and round(6) gates bit-exactly
    "q39_hll_estimate" ->
      s"""WITH $ToksCte,
         |posts AS (SELECT source, unnest(t.tokens) AS tok
         |          FROM toks t JOIN documents d ON t.doc_id = d.doc_id
         |          WHERE len(t.tokens) > 0),
         |hashed AS (SELECT source, ${h60("tok")} AS h FROM posts),
         |ranked AS (
         |  SELECT source, CAST(h % 64 AS BIGINT) AS bucket,
         |    CASE WHEN h // 64 = 0 THEN 55
         |      ELSE CAST(log2((h // 64) & (-(h // 64))) AS BIGINT) + 1
         |    END AS rho
         |  FROM hashed),
         |regs AS (SELECT source, bucket, max(rho) AS rho
         |         FROM ranked GROUP BY source, bucket),
         |agg AS (SELECT source, sum(power(2.0, -rho)) AS s,
         |          count(*) AS nonzero
         |        FROM regs GROUP BY source),
         |est AS (SELECT source, 64.0 - nonzero AS zeros,
         |          (0.7213 / (1.0 + 1.079 / 64) * 64 * 64)
         |            / (s + (64.0 - nonzero)) AS raw
         |        FROM agg)
         |SELECT source,
         |  round(CASE WHEN raw <= 2.5 * 64 AND zeros > 0
         |    THEN 64.0 * ln(64.0 / zeros) ELSE raw END, 6) AS estimate
         |FROM est ORDER BY source""".stripMargin,
    "q36_cosine_neardups" ->
      s"""WITH pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${duckCos("a.embedding", "b.embedding")} AS cosine
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, round(cosine, 6) AS cosine
         |FROM pairs WHERE cosine >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,
    // the q41/q42 bucket CTE in pair form: shared-bucket candidates, then
    // the exact cosine threshold on candidates only (same duckCos fold as
    // the Spark-side native kernel — bit-identical doubles)
    "q66_cosine_neardups_lsh" ->
      s"""WITH bkt AS (
         |  SELECT vec_id, 0 AS htable, ${duckBucket(0, 4, "embedding")} AS bucket
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id, 1 AS htable, ${duckBucket(1, 4, "embedding")} AS bucket
         |  FROM embeddings),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bkt a JOIN bkt b
         |    ON a.htable = b.htable AND a.bucket = b.bucket
         |    AND a.vec_id < b.vec_id),
         |scored AS (
         |  SELECT id_a, id_b,
         |    ${duckCos("ea.embedding", "eb.embedding")} AS cosine
         |  FROM cand
         |  JOIN embeddings ea ON cand.id_a = ea.vec_id
         |  JOIN embeddings eb ON cand.id_b = eb.vec_id)
         |SELECT id_a, id_b, round(cosine, 6) AS cosine
         |FROM scored WHERE cosine >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    // component = min reachable id: the recursive closure over the
    // symmetric q32 candidate edges, grouped to the per-node minimum.
    // Shared by q45 (hash-min propagation) and q69 (large-star/small-star
    // contraction): both formulations must produce the identical labeling
    "q45_neardup_components" -> NearDupComponentsOracle,
    "q69_neardup_components_star" -> NearDupComponentsOracle,
    // the q69 component labeling + the q56 bucket CASE, hashed on
    // coalesce(component, doc_id)
    "q175_cluster_safe_split" ->
      s"""WITH RECURSIVE $ComponentsCtes,
         |comp AS (SELECT id AS doc_id, min(comp) AS component
         |         FROM reach GROUP BY id),
         |keyed AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS split_key
         |  FROM documents d LEFT JOIN comp c USING (doc_id)),
         |b AS (
         |  SELECT doc_id, split_key,
         |    ${h60("'graft:'||split_key")} % 1000000 AS bkt
         |  FROM keyed)
         |SELECT doc_id, split_key,
         |  CASE WHEN bkt < 800000 THEN 'train'
         |       WHEN bkt < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    // coverage = shared / len(benchmark shingle set); shingles are
    // distinct per doc so the postings count IS the intersection size
    "q46_decontaminate" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |corp AS (
         |  SELECT doc_id, unnest(shingles) AS shingle
         |  FROM sh WHERE source != 'src0'),
         |ben AS (SELECT doc_id, shingles FROM sh WHERE source = 'src0'),
         |bp AS (
         |  SELECT doc_id AS bench_id, unnest(shingles) AS shingle FROM ben),
         |bs AS (SELECT doc_id AS bench_id, len(shingles) AS bench_sz
         |       FROM ben),
         |ov AS (
         |  SELECT corp.doc_id, bp.bench_id, count(*) AS shared
         |  FROM corp JOIN bp USING (shingle)
         |  GROUP BY corp.doc_id, bp.bench_id),
         |scored AS (
         |  SELECT doc_id, bench_id, shared, bench_sz,
         |    CAST(shared AS DOUBLE) / bench_sz AS coverage
         |  FROM ov JOIN bs USING (bench_id))
         |SELECT doc_id, bench_id, CAST(shared AS BIGINT) AS shared,
         |  CAST(bench_sz AS BIGINT) AS bench_sz,
         |  round(coverage, 4) AS coverage
         |FROM scored WHERE coverage >= 0.2
         |ORDER BY doc_id, bench_id""".stripMargin,
    "q77_cms_registers" ->
      s"""WITH $TokStreamCte,
         |cells AS (
         |  SELECT CAST(r AS BIGINT) AS "row",
         |    ${h60("r || ':' || tok")} % 64 AS bucket
         |  FROM tokstream
         |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) rs)
         |SELECT "row", bucket, count(*) AS cnt FROM cells
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q78_cms_heavy_hitters" ->
      s"""WITH $TokStreamCte,
         |exactc AS (SELECT tok, count(*) AS exact FROM tokstream
         |           GROUP BY 1),
         |top AS (SELECT tok, exact FROM exactc
         |        ORDER BY exact DESC, tok LIMIT 10),
         |cells AS (
         |  SELECT r, ${h60("r || ':' || tok")} % 64 AS bucket
         |  FROM tokstream
         |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) rs),
         |regs AS (SELECT r, bucket, count(*) AS cnt FROM cells
         |         GROUP BY 1, 2),
         |est AS (
         |  SELECT t.tok, min(coalesce(g.cnt, 0)) AS est
         |  FROM top t
         |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) rs
         |  LEFT JOIN regs g ON g.r = rs.r
         |    AND g.bucket = ${h60("rs.r || ':' || t.tok")} % 64
         |  GROUP BY 1)
         |SELECT t.tok, t.exact, CAST(e.est AS BIGINT) AS est
         |FROM top t JOIN est e USING (tok) ORDER BY tok""".stripMargin,
    "q79_dedup_keep_first" ->
      s"""SELECT d.doc_id, d.source, d.n_chars
         |FROM documents d
         |JOIN (SELECT min(doc_id) AS doc_id FROM documents
         |      GROUP BY md5(text)) k USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q80_bloom_bits" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |bsh AS (SELECT unnest(shingles) AS shingle FROM sh
         |        WHERE source = 'src0')
         |SELECT DISTINCT ${h60("j || ':' || shingle")} % 65536 AS bit
         |FROM bsh CROSS JOIN
         |  (SELECT unnest(generate_series(0, 2)) AS j) js
         |ORDER BY bit""".stripMargin,
    "q81_bloom_decontaminate" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |bits AS (
         |  SELECT DISTINCT ${h60("j || ':' || shingle")} % 65536 AS bit
         |  FROM (SELECT unnest(shingles) AS shingle FROM sh
         |        WHERE source = 'src0') bsh
         |  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) js),
         |probes AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh
         |           WHERE source != 'src0'),
         |flags AS (
         |  SELECT doc_id,
         |    (${h60("'0:' || shingle")} % 65536 IN (SELECT bit FROM bits))
         |    AND (${h60("'1:' || shingle")} % 65536 IN (SELECT bit FROM bits))
         |    AND (${h60("'2:' || shingle")} % 65536 IN (SELECT bit FROM bits))
         |      AS maybe
         |  FROM probes)
         |SELECT doc_id, count(*) AS n_probes,
         |  CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_maybe
         |FROM flags GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q45's component labeling folded into the corpus: keep every doc
    // outside any cluster plus each cluster's min-id representative
    "q87_neardup_keepers" ->
      s"""WITH RECURSIVE $ComponentsCtes,
         |comp AS (
         |  SELECT id, min(comp) AS component FROM reach GROUP BY id)
         |SELECT d.doc_id, d.source, d.n_chars
         |FROM documents d LEFT JOIN comp ON d.doc_id = comp.id
         |WHERE comp.id IS NULL OR comp.component = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // q43's assignment feeding within-cell cosine edges, then the q45
    // recursive closure; keeper = unlabeled or the component minimum
    "q90_semantic_keepers" ->
      s"""WITH RECURSIVE cents AS (SELECT vec_id AS cid, embedding AS cvec
         |               FROM embeddings WHERE vec_id < 16),
         |ascored AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckCos("e.embedding", "c.cvec")} AS cos
         |  FROM embeddings e CROSS JOIN cents c),
         |sassigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, cid) AS rn
         |    FROM ascored) x WHERE rn = 1),
         |comp AS (
         |  SELECT a.cid, ii AS pos, e.vec_id,
         |    CAST(e.embedding[ii] AS DOUBLE) AS x
         |  FROM sassigned a JOIN embeddings e USING (vec_id)
         |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS ii) idx),
         |means AS (
         |  SELECT cid, pos,
         |    CAST(list_reduce(list(x ORDER BY vec_id), (a, b) -> a + b)
         |      / count(*) AS FLOAT) AS m
         |  FROM comp GROUP BY cid, pos),
         |rcents AS (
         |  SELECT c.cid, coalesce(mv.cvec, c.cvec) AS cvec
         |  FROM cents c LEFT JOIN (
         |    SELECT cid, list(m ORDER BY pos) AS cvec
         |    FROM means GROUP BY cid) mv USING (cid)),
         |rascored AS (
         |  SELECT e.vec_id, c.cid,
         |    ${duckCos("e.embedding", "c.cvec")} AS cos
         |  FROM embeddings e CROSS JOIN rcents c),
         |assigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, cid) AS rn
         |    FROM rascored) x WHERE rn = 1),
         |cand AS (
         |  SELECT a.vec_id AS s, b.vec_id AS t
         |  FROM assigned a JOIN assigned b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE ${duckCos("ea.embedding", "eb.embedding")} >= 0.3),
         |edges2 AS (SELECT s, t FROM cand UNION ALL SELECT t, s FROM cand),
         |reach AS (
         |  SELECT s AS id, s AS comp FROM edges2
         |  UNION
         |  SELECT e.t AS id, r.comp FROM reach r JOIN edges2 e ON e.s = r.id),
         |labels AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
         |SELECT emb.vec_id, emb.label
         |FROM embeddings emb LEFT JOIN labels l ON emb.vec_id = l.id
         |WHERE l.component IS NULL OR l.component = emb.vec_id
         |ORDER BY emb.vec_id""".stripMargin,
    "q53_fingerprint" ->
      s"""WITH $WordsCte,
         |canon AS (
         |  SELECT doc_id, array_to_string(ws, ' ') AS c FROM words)
         |SELECT doc_id, md5(c) AS canon_md5,
         |  CAST(CASE WHEN length(c) = 0 THEN 0
         |    ELSE list_reduce(
         |      list_transform(string_split(c, ''), ch -> CAST(ascii(ch) AS BIGINT)),
         |      (acc, x) -> (acc * 257 + x) % 2147483647)
         |    END AS BIGINT) AS rolling_fp
         |FROM canon ORDER BY doc_id""".stripMargin,
    // 8-token non-overlapping windows, df over DISTINCT docs, windows
    // with df > 2 cut, survivors rejoined in chunk order
    "q96_drop_dup_chunks" ->
      s"""WITH $LiveWordsCte,
         |c AS (
         |  SELECT doc_id, w,
         |    greatest(1, CAST(ceil((len(w) - 8) / 8.0) AS BIGINT) + 1) AS nc
         |  FROM ws),
         |ch AS (
         |  SELECT doc_id, i AS idx,
         |    w[CAST(i*8 + 1 AS BIGINT):CAST(i*8 + 8 AS BIGINT)] AS toks,
         |    md5(array_to_string(
         |      w[CAST(i*8 + 1 AS BIGINT):CAST(i*8 + 8 AS BIGINT)], ' ')) AS h
         |  FROM c, unnest(generate_series(0, nc - 1)) AS u(i)),
         |hot AS (
         |  SELECT h FROM (
         |    SELECT h, count(DISTINCT doc_id) AS df FROM ch GROUP BY h)
         |  WHERE df > 2)
         |SELECT doc_id,
         |  coalesce(array_to_string(flatten(
         |    list(toks ORDER BY idx) FILTER (h NOT IN (SELECT h FROM hot))),
         |    ' '), '') AS clean_text,
         |  CAST(count(*) FILTER (h NOT IN (SELECT h FROM hot)) AS BIGINT)
         |    AS n_kept_chunks,
         |  CAST(count(*) FILTER (h IN (SELECT h FROM hot)) AS BIGINT)
         |    AS n_dropped_chunks
         |FROM ch GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q32's signature/banding CTEs, sides split by source: batch bands
    // (src0) join index bands (everything else)
    "q105_incremental_lsh" ->
      s"""WITH $WordsCte,
         |$ShinglesCte,
         |$SigCte,
         |banded AS (
         |  SELECT doc_id, CAST(perm // 2 AS INT) AS band,
         |    list(min_hash ORDER BY perm) AS band_key
         |  FROM sig GROUP BY doc_id, band),
         |src AS (SELECT doc_id, source FROM documents)
         |SELECT a.doc_id AS batch_id, b.doc_id AS index_id,
         |  count(*) AS n_shared_bands
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.band_key = b.band_key
         |JOIN src sa ON sa.doc_id = a.doc_id
         |JOIN src sb ON sb.doc_id = b.doc_id
         |WHERE sa.source = 'src0' AND sb.source <> 'src0'
         |GROUP BY a.doc_id, b.doc_id
         |ORDER BY batch_id, index_id""".stripMargin,

    // the identical four-line wrapper; hot = lines in > 4 distinct
    // docs; all occurrences of hot lines drop, survivors rejoin in
    // line order (the Spark side keys on md5(line), the oracle on the
    // line itself — equivalent up to md5 collisions)
    "q149_drop_dup_lines" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    'site navigation home about contact' || chr(10) || text ||
        |    chr(10) || 'footer group ' || CAST(doc_id % 7 AS VARCHAR) ||
        |    chr(10) || 'doc signature ' || CAST(doc_id AS VARCHAR) AS t
        |  FROM documents WHERE doc_id IS NOT NULL),
        |l AS (
        |  SELECT doc_id, i - 1 AS idx, ls[i] AS line
        |  FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM w),
        |    unnest(generate_series(1, len(ls))) AS u(i)),
        |hot AS (
        |  SELECT line FROM (
        |    SELECT line, count(DISTINCT doc_id) AS df FROM l GROUP BY line)
        |  WHERE df > 4)
        |SELECT doc_id,
        |  coalesce(array_to_string(
        |    list(line ORDER BY idx)
        |      FILTER (line NOT IN (SELECT line FROM hot)),
        |    chr(10)), '') AS clean_text,
        |  CAST(count(*) FILTER (line NOT IN (SELECT line FROM hot))
        |    AS BIGINT) AS n_kept_lines,
        |  CAST(count(*) FILTER (line IN (SELECT line FROM hot))
        |    AS BIGINT) AS n_dropped_lines
        |FROM l GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the q105 collision rule's complement: src0 docs sharing NO band
    // with any non-src0 doc. Both gate shapes (q162 broadcast probes,
    // q163 explode+semi+anti) must reproduce it exactly
    "q162_streaming_lsh_gate" -> LshGateOracle,
    "q163_lsh_gate_batch" -> LshGateOracle,

    // per-doc first-seen mask: position p (0-based) repeats iff its
    // 2-gram appears among positions < p (list_position returns 0, not
    // NULL, on a miss — hence `> 0`); the token mask is q120's with the
    // repeat-start list in place of the hot-position list
    "q126_drop_repeated_spans" ->
      s"""WITH $LiveWordsCte,
         |hs AS (
         |  SELECT doc_id, w,
         |    CASE WHEN len(w) >= 2 THEN
         |      [md5(array_to_string(
         |        w[CAST(p + 1 AS BIGINT):CAST(p + 2 AS BIGINT)], ' '))
         |        FOR p IN generate_series(0, len(w) - 2)]
         |    ELSE CAST([] AS VARCHAR[]) END AS h
         |  FROM ws),
         |rp AS (
         |  SELECT doc_id, w,
         |    [CAST(p - 1 AS INT) FOR p IN generate_series(1, len(h))
         |      IF list_position(h[1:CAST(p - 1 AS BIGINT)], h[p]) > 0] AS ps
         |  FROM hs),
         |masked AS (
         |  SELECT doc_id,
         |    [w[i] FOR i IN generate_series(1, len(w))
         |      IF len(list_filter(ps, p -> p < i AND i <= p + 2)) = 0]
         |      AS kept,
         |    len(w) AS n, len(ps) AS nrp
         |  FROM rp)
         |SELECT doc_id,
         |  coalesce(array_to_string(kept, ' '), '') AS clean_text,
         |  CAST(coalesce(len(kept), 0) AS BIGINT) AS n_kept_tokens,
         |  CAST(n - coalesce(len(kept), 0) AS BIGINT) AS n_dropped_tokens,
         |  CAST(nrp AS BIGINT) AS n_repeat_starts
         |FROM masked ORDER BY doc_id""".stripMargin,

    // stride-1 shingle hashes → df>2 hot set → per-doc hot start
    // positions → index-mask reassembly. DuckDB's 1-based i maps to
    // Spark's 0-based token index i-1: dropped iff p < i AND i <= p+8
    "q120_drop_dup_spans" ->
      s"""WITH $LiveWordsCte,
         |sh AS (
         |  SELECT doc_id, CAST(p AS INT) AS p,
         |    md5(array_to_string(
         |      w[CAST(p + 1 AS BIGINT):CAST(p + 8 AS BIGINT)], ' ')) AS h
         |  FROM ws, unnest(generate_series(0, len(w) - 8)) AS t(p)
         |  WHERE len(w) >= 8),
         |hot AS (
         |  SELECT h FROM (
         |    SELECT h, count(DISTINCT doc_id) AS df FROM sh GROUP BY h)
         |  WHERE df > 2),
         |hp AS (
         |  SELECT doc_id, list(p ORDER BY p) AS ps
         |  FROM sh JOIN hot USING (h) GROUP BY doc_id),
         |masked AS (
         |  SELECT ws.doc_id,
         |    [w[i] FOR i IN generate_series(1, len(w))
         |      IF len(list_filter(coalesce(ps, []),
         |        p -> p < i AND i <= p + 8)) = 0] AS kept,
         |    len(w) AS n
         |  FROM ws LEFT JOIN hp ON ws.doc_id = hp.doc_id)
         |SELECT doc_id,
         |  coalesce(array_to_string(kept, ' '), '') AS clean_text,
         |  CAST(coalesce(len(kept), 0) AS BIGINT) AS n_kept_tokens,
         |  CAST(n - coalesce(len(kept), 0) AS BIGINT) AS n_dropped_tokens
         |FROM masked ORDER BY doc_id""".stripMargin,

    // q87's clusters with a quality argmax keeper: rank within each
    // component with nulls sorted LAST ((q IS NULL) leads the ORDER BY,
    // matching the Spark side's min(struct(isNull, -q, id)))
    "q121_best_keepers" ->
      s"""WITH RECURSIVE $ComponentsCtes,
         |comp AS (
         |  SELECT id, min(comp) AS component FROM reach GROUP BY id),
         |qd AS (
         |  SELECT d.doc_id, d.source, d.n_chars, comp.component,
         |    nullif(d.n_chars % 97, 0) AS q
         |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.id),
         |win AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (PARTITION BY component
         |      ORDER BY (q IS NULL), q DESC, doc_id) AS rn
         |    FROM qd WHERE component IS NOT NULL) z
         |  WHERE rn = 1)
         |SELECT doc_id, source, n_chars FROM qd
         |WHERE component IS NULL OR doc_id IN (SELECT doc_id FROM win)
         |ORDER BY doc_id""".stripMargin,
  )
}
