package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated code: whole-stage
  * codegen emits a single call into these instead of an interpreted
  * higher-order-function tree (lambda-variable rows + boxing per element).
  */
object SketchKernels {
  private val Space = UTF8String.fromString(" ")

  /** RFC 9309 §2.2.3 rule match — see [[graft.operators.Robots.matches]]
    * for semantics. Iterative two-pointer glob with backtracking over
    * the last `*` (O(|path|·|pattern|) worst case, linear on real
    * rules) — no regex compilation per (URL, rule) pair.
    */
  def robotsMatchStr(path: String, pattern: String): Boolean = {
    if (path == null || pattern == null) return false
    val anchored = pattern.nonEmpty &&
      pattern.charAt(pattern.length - 1) == '$'
    // prefix semantics = full-glob semantics against pattern + '*'
    val pat =
      if (anchored) pattern.substring(0, pattern.length - 1)
      else pattern + "*"
    var si = 0
    var pi = 0
    var star = -1
    var mark = 0
    while (si < path.length) {
      if (pi < pat.length && pat.charAt(pi) == '*') {
        star = pi; mark = si; pi += 1
      } else if (pi < pat.length && pat.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (star >= 0) {
        pi = star + 1; mark += 1; si = mark
      } else return false
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  def robotsMatch(path: UTF8String, pattern: UTF8String): Boolean =
    robotsMatchStr(path.toString, pattern.toString)

  /** Word n-gram windows: max(1, len-n+1) windows for non-empty input
    * (the last possibly shorter than n when len < n), empty for empty
    * input; null elements are skipped inside a window — exactly
    * concat_ws(" ", ...) over zip_with-chained offset slices
    * (`TextFunctions.windowed`).
    */
  def wordNGrams(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val m = math.max(1, len - n + 1)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val hi = math.min(i + n, len)
      var cnt = 0
      var j = i
      while (j < hi) { if (!arr.isNullAt(j)) cnt += 1; j += 1 }
      val items = new Array[UTF8String](cnt)
      var k = 0
      j = i
      while (j < hi) {
        if (!arr.isNullAt(j)) { items(k) = arr.getUTF8String(j); k += 1 }
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, items: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `bits`-wide SimHash over 60-bit token hashes in ONE pass (vote per
    * bit, set if positive) — bit-identical to the 32-fold
    * `HashFunctions.simHash` composition. Returns null on a null element
    * or empty input (callers filter empty docs).
    */
  def simHash(arr: ArrayData, bits: Int): Any = {
    val len = arr.numElements()
    if (len == 0) return null
    val votes = new Array[Long](bits)
    var i = 0
    while (i < len) {
      if (arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      var b = 0
      while (b < bits) {
        votes(b) += ((h >> b) & 1L) * 2L - 1L
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Character n-gram windows over a string, first-seen deduped: exactly
    * `array_distinct` over `max(1, len-n+1)` sliding windows (the last
    * possibly shorter when len < n), empty array for empty input —
    * bit-identical to the zip_with-chain + `array_distinct` composition
    * (`TextFunctions.charShinglesComposed`), in ONE pass instead of n
    * chained interpreted higher-order functions over the char array.
    */
  def charNGrams(str: UTF8String, n: Int): ArrayData = {
    val len = str.numChars()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val m = math.max(1, len - n + 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < m) {
      seen.add(str.substring(i, math.min(i + n, len)))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  /** Unigram-LM Viterbi segmentation (Kudo 2018, SentencePiece's
    * unigram model): the best-scoring split of `word` into vocabulary
    * pieces by summed log-probability. DP cell order is the struct max
    * `(score, −n_pieces, piece_len)` — ties prefer FEWER pieces, then
    * a LONGER piece ending at the cell — exactly the `list_max` the
    * SQL oracle replays, so segmentations are bit-reproducible across
    * engines. Returns null when no full segmentation exists (some
    * span matches no piece). Char-indexed (the ASCII/BMP contract of
    * the normalized-word tokenizer).
    */
  def unigramSegment(word: UTF8String,
                     vocab: java.util.HashMap[String, java.lang.Double],
                     maxLen: Int): ArrayData = {
    val w = word.toString
    val n = w.length
    if (n == 0) return null
    val score = new Array[Double](n + 1)
    val np = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    val NEG = Double.NegativeInfinity
    var i = 1
    while (i <= n) { score(i) = NEG; np(i) = Int.MaxValue; i += 1 }
    i = 1
    while (i <= n) {
      var l = 1
      val lmax = math.min(maxLen, i)
      while (l <= lmax) {
        if (score(i - l) != NEG) {
          val lp = vocab.get(w.substring(i - l, i))
          if (lp != null) {
            val s = score(i - l) + lp.doubleValue()
            val k = np(i - l) + 1
            if (s > score(i) || (s == score(i) &&
                (k < np(i) || (k == np(i) && l > back(i))))) {
              score(i) = s; np(i) = k; back(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    if (score(n) == NEG) return null
    val parts = new Array[AnyRef](np(n))
    var p = n
    var j = np(n) - 1
    while (p > 0) {
      val l = back(p)
      parts(j) = UTF8String.fromString(w.substring(p - l, p))
      j -= 1
      p -= l
    }
    new GenericArrayData(parts)
  }

  /** One automaton walk over the text: per-pattern counts as a long
    * array aligned with the pattern literal.
    */
  def multiMatch(text: UTF8String, ac: AhoCorasick): ArrayData =
    new GenericArrayData(
      ac.counts(text.toString).map(java.lang.Long.valueOf(_): AnyRef))

  /** One automaton walk, masking every character covered by ANY
    * pattern occurrence with `mask` — overlapping and nested matches
    * merge naturally (a char is masked iff some match covers it).
    */
  def multiRedact(text: UTF8String, ac: AhoCorasick,
                  mask: Char): UTF8String =
    UTF8String.fromString(ac.redact(text.toString, mask))

  /** Canonical text cleanup in one pass: Unicode NFC composition,
    * non-whitespace control characters stripped (C0 + DEL), whitespace
    * runs (space, `\t\n\x0b\f\r` — the tokenizer's class) collapsed to
    * single spaces, and both ends trimmed. Equivalent to
    * `trim(regexp_replace(regexp_replace(nfc(s), ctrl, ''), ws+, ' '))`
    * but one scan instead of three regex passes — this is the first
    * stage a web-scale curation cascade runs on every byte of input, so
    * it stays inside whole-stage codegen with no regex engine in the
    * loop. `Normalizer.isNormalized` short-circuits the (overwhelmingly
    * common) already-NFC ASCII case without allocating.
    */
  def cleanText(s: UTF8String): UTF8String = {
    val raw = s.toString
    val str =
      if (java.text.Normalizer.isNormalized(raw,
        java.text.Normalizer.Form.NFC)) raw
      else java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000b' ||
        c == '\f' || c == '\r'
      if (isWs) {
        if (sb.length > 0) pendingSpace = true // leading ws drops
      } else if (c < ' ' || c == '\u007f') {
        () // bare control char: strip, no word boundary introduced
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Winnowing fingerprint selection in one pass (Schleimer et al.
    * 2003): 60-bit md5 prefix of every char k-gram, minimum of each
    * w-window of consecutive hashes, first-seen-deduped. Bit-identical
    * to the composed HOF formulation (`transform(sequence...)` +
    * md5/conv + `array_min(slice(...))` + `array_distinct`) and to the
    * DuckDB oracle — the 60-bit value equals
    * `('0x'||substr(md5(gram),1,15))::BIGINT`, i.e. the big-endian
    * first-8-bytes value shifted right 4. One reused MessageDigest and
    * a tight min loop replace ~len(doc) interpreted md5→hex→conv
    * round-trips and window slice allocations per row. Empty result for
    * inputs shorter than k; inputs with fewer than w windows emit the
    * minimum of what they have.
    */
  def winnow(str: UTF8String, k: Int, w: Int): ArrayData = {
    val s = str.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val hs = new Array[Long](m)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < m) {
      md.reset()
      val d = md.digest(s.substring(i, i + k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      hs(i) = v >>> 4 // first 15 hex digits = 60-bit prefix
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val nw = math.max(m - w, 0) + 1
    var j = 0
    while (j < nw) {
      var mn = Long.MaxValue
      val hi = math.min(j + w, m)
      var t = j
      while (t < hi) { if (hs(t) < mn) mn = hs(t); t += 1 }
      seen.add(mn)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Sign-random-projection bucket over one hash table's hyperplanes: bit
    * `p` of the result is set iff `Σ_i (double)vec[i] * planes[p][i] > 0`
    * (left-to-right float64 summation — bit-identical to the
    * `aggregate(zip_with(...))` fold, and to the DuckDB oracle's
    * `list_reduce`). A dimension mismatch or a null element returns NULL:
    * an undefined bucket must be VISIBLE (and null join keys drop out of
    * the candidate equi-join), where a silent default bucket would
    * collapse every mismatched vector into one O(n²) candidate clique.
    */
  def srpBucket(vec: ArrayData, planes: Array[Array[Double]]): Any = {
    val n = vec.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      if (w.length != n) return null
      var sum = 0.0
      var i = 0
      while (i < n) {
        if (vec.isNullAt(i)) return null
        sum += vec.getFloat(i).toDouble * w(i)
        i += 1
      }
      if (sum > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  /** 64-bit per-word hash: FNV-1a over the UTF-8 bytes, murmur-finalized
    * for avalanche (FNV alone keeps low-bit structure on short ASCII).
    */
  def wordHash64(u: UTF8String): Long = {
    val bytes = u.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    fmix64(h)
  }

  /** Base multiplier and null sentinel for the rolling span hash —
    * shared with the value-pinning spec's direct reimplementation.
    */
  val SpanHashBase = 0x5851f42d4c957f2dL
  val SpanHashNullWord = 0x9e3779b97f4a7c15L

  /** Per-position `width`-word span hashes in ONE pass (rolling
    * polynomial): H(p) = Σ_j wh[p+j]·B^(width-1-j) mod 2^64, updated in
    * O(1) per position — O(n) total, vs the O(n·width) md5-per-window
    * HOF composition it replaces in the span-removal family. Window
    * equality is WORD-WISE (the hash covers the word SEQUENCE, not a
    * joined string, so token-boundary ambiguities can't collide
    * structurally). A single 64-bit stream collides PER PAIR with
    * ~2⁻⁶⁴ probability — fine for the per-document spans of
    * `dropRepeatedSpans`, but a CORPUS-WIDE distinct-shingle space of
    * 10¹²⁺ makes birthday collisions certain; cross-document
    * aggregations must key on the (stream-1, stream-2) PAIR — see
    * [[spanHashes2]]. These hashes are internal span-equality carriers,
    * never exposed in operator output. Empty result for inputs shorter
    * than `width`; null elements take a fixed sentinel (the tokenizer
    * never emits null words).
    */
  def spanHashes(arr: ArrayData, width: Int): ArrayData =
    rollingSpanHashes(arr, width, SpanHashBase, mix2 = false)

  /** Alternate-constant base for the second rolling stream. */
  val SpanHashBase2 = 0xd6e8feb86659fd93L

  /** Word-seed for the second stream's per-word remix. */
  val SpanHashWordSeed2 = 0x94d049bb133111ebL

  /** Second-stream per-word hash: the stream-1 word hash remixed
    * through an independent fmix — word-level collisions are vocabulary
    * -scale (negligible at 64 bits); what the second stream de-risks is
    * SPAN-level collisions of the rolling polynomial, and those are
    * (heuristically) independent across the two bases.
    */
  def wordHash64b(h1: Long): Long = fmix64(h1 ^ SpanHashWordSeed2)

  /** The INDEPENDENT second rolling stream (remixed word hashes,
    * different base): cross-document span-removal keys on the pair
    * (spanHashes, spanHashes2) — an effective 128-bit key, so corpus-
    * wide birthday collisions (certain at 64 bits for 10¹²⁺ distinct
    * shingles) cannot merge distinct spans' doc-frequencies and delete
    * legitimate text.
    */
  def spanHashes2(arr: ArrayData, width: Int): ArrayData =
    rollingSpanHashes(arr, width, SpanHashBase2, mix2 = true)

  private def rollingSpanHashes(arr: ArrayData, width: Int, base: Long,
                                mix2: Boolean): ArrayData = {
    val n = arr.numElements()
    if (n < width) return new GenericArrayData(Array.empty[Long])
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h1 =
        if (arr.isNullAt(i)) SpanHashNullWord
        else wordHash64(arr.getUTF8String(i))
      wh(i) = if (mix2) wordHash64b(h1) else h1
      i += 1
    }
    val B = base
    var bw = 1L // B^(width-1) mod 2^64
    i = 1
    while (i < width) { bw *= B; i += 1 }
    val m = n - width + 1
    val out = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < width) { h = h * B + wh(i); i += 1 }
    out(0) = h
    var p = 1
    while (p < m) {
      h = (h - wh(p - 1) * bw) * B + wh(p + width - 1)
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  /** k-permutation MinHash minima over pre-reduced token hashes — one
    * pass, tight integer loop; bit-identical to
    * `minHashSignatureFromHashes` (k × array_min(transform(...))).
    * Null elements poison the whole result (transform maps null → null,
    * and array_min over any-null... the fold semantics here require
    * non-null hashes; `tokenHashes` never yields nulls) — returns null on
    * a null element to stay defensive.
    */
  def minHashSig(arr: ArrayData, k: Int): ArrayData = {
    val len = arr.numElements()
    val P = HashFunctions.MinHashPrime
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < len) {
      if (arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (HashFunctions.minHashA(j) * h + HashFunctions.minHashB(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    if (len == 0) null else new GenericArrayData(mins)
  }
}

/** Shared check: the second argument must be a non-null positive int
  * literal (these are SQL-callable once registered, so a null or
  * non-positive literal must fail analysis, not crash execution).
  */
private[functions] object PositiveIntArg {
  def check(prettyName: String, elemOk: DataType => Boolean,
            expects: String, left: Expression,
            right: Expression): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (dt, IntegerType) if elemOk(dt) && right.foldable =>
        right.eval(InternalRow.empty) match {
          case i: java.lang.Integer if i > 0 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName's second argument must be a positive int literal")
        }
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects $expects")
    }
}

/** `graft_word_ngrams(words, n)` — native n-gram windowing. */
case class WordNGramsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PositiveIntArg.check(prettyName,
      { case ArrayType(StringType, _) => true; case _ => false },
      "(array<string>, positive int literal)", left, right)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"
  private lazy val n: Int = right.eval(InternalRow.empty) match {
    case i: Int => i
  }
  override def nullSafeEval(arr: Any, nn: Any): Any =
    SketchKernels.wordNGrams(arr.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.SketchKernels.wordNGrams($a, $n);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNGramsExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_simhash(hashes, bits)` — native one-pass SimHash. */
case class SimHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PositiveIntArg.check(prettyName,
      { case ArrayType(LongType, _) => true; case _ => false },
      "(array<long>, positive int literal)", left, right)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"
  private lazy val bits: Int = right.eval(InternalRow.empty) match {
    case i: Int => i
  }
  override def nullSafeEval(arr: Any, bb: Any): Any =
    SketchKernels.simHash(arr.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val res = ctx.freshName("simRes")
      s"""
         |Object $res = graft.functions.SketchKernels.simHash($a, $bits);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $res).longValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_char_ngrams(str, n)` — native char n-gram windowing. */
case class CharNGramsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PositiveIntArg.check(prettyName,
      { case StringType => true; case _ => false },
      "(string, positive int literal)", left, right)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"
  private lazy val n: Int = right.eval(InternalRow.empty) match {
    case i: Int => i
  }
  override def nullSafeEval(str: Any, nn: Any): Any =
    SketchKernels.charNGrams(str.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.SketchKernels.charNGrams($a, $n);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharNGramsExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_winnow(str, k, w)` — native one-pass winnowing fingerprint
  * selection (60-bit md5 k-gram hashes → w-window minima → first-seen
  * dedup).
  */
case class WinnowExpr(first: Expression, second: Expression,
                      third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        (second.eval(InternalRow.empty), third.eval(InternalRow.empty)) match {
          case (k: java.lang.Integer, w: java.lang.Integer)
              if k > 0 && w > 0 => TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName's k and w must be positive int literals")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, positive int literal, positive int literal)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"
  private lazy val k: Int = second.eval(InternalRow.empty) match {
    case i: Int => i
  }
  private lazy val w: Int = third.eval(InternalRow.empty) match {
    case i: Int => i
  }
  override def nullSafeEval(s: Any, kk: Any, ww: Any): Any =
    SketchKernels.winnow(s.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) =>
      s"${ev.value} = graft.functions.SketchKernels.winnow($a, $k, $w);")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): WinnowExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_unigram_segment(word, pieces, logprobs)` — native unigram-LM
  * Viterbi segmentation under a LITERAL piece table (model-sized; the
  * SrpBucketExpr reference-object pattern keeps the per-row work one
  * hash-probing DP, no per-row vocabulary materialization).
  */
case class UnigramSegExpr(first: Expression, second: Expression,
                          third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(DoubleType, _))
          if second.foldable && third.foldable =>
        (second.eval(InternalRow.empty), third.eval(InternalRow.empty)) match {
          case (ps: ArrayData, ls: ArrayData)
              if ps.numElements() > 0 &&
                ps.numElements() == ls.numElements() =>
            val nullFree = (0 until ps.numElements()).forall(p =>
              !ps.isNullAt(p) && !ls.isNullAt(p) &&
                ps.getUTF8String(p).numChars() > 0)
            if (nullFree) TypeCheckResult.TypeCheckSuccess
            else TypeCheckResult.TypeCheckFailure(
              s"$prettyName's pieces/logprobs must be non-null and non-empty")
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName's pieces and logprobs must be non-empty " +
              "literals of equal length")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, foldable array<string>, " +
          "foldable array<double>)")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_unigram_segment"
  private lazy val vocab: java.util.HashMap[String, java.lang.Double] = {
    val ps = second.eval(InternalRow.empty).asInstanceOf[ArrayData]
    val ls = third.eval(InternalRow.empty).asInstanceOf[ArrayData]
    val m = new java.util.HashMap[String, java.lang.Double]()
    (0 until ps.numElements()).foreach(p =>
      m.put(ps.getUTF8String(p).toString, ls.getDouble(p)))
    m
  }
  private lazy val maxLen: Int = {
    val it = vocab.keySet().iterator()
    var m = 1
    while (it.hasNext) m = math.max(m, it.next().length)
    m
  }
  override def nullSafeEval(w: Any, pp: Any, ll: Any): Any =
    SketchKernels.unigramSegment(w.asInstanceOf[UTF8String], vocab, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val res = ctx.freshName("usegRes")
      s"""
         |Object $res = graft.functions.SketchKernels.unigramSegment(
         |  $a, $ref, $maxLen);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $res; }
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): UnigramSegExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_multi_match(text, patterns)` — native Aho–Corasick
  * multi-pattern counting under a LITERAL pattern list: K patterns in
  * ONE text scan (per-row cost O(|text| + matches)) instead of K
  * regex/contains passes — the screening-at-scale kernel. Returns
  * per-pattern occurrence counts (overlaps included) aligned with the
  * pattern literal; null text → null.
  */
case class MultiMatchExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        right.eval(InternalRow.empty) match {
          case ad: ArrayData if ad.numElements() > 0 =>
            val ok = (0 until ad.numElements()).forall(p =>
              !ad.isNullAt(p) && ad.getUTF8String(p).numChars() > 0)
            if (ok) TypeCheckResult.TypeCheckSuccess
            else TypeCheckResult.TypeCheckFailure(
              s"$prettyName's patterns must be non-null and non-empty")
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName's patterns must be a non-empty literal list")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, foldable array<string>)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_multi_match"
  private lazy val automaton: AhoCorasick = {
    val ad = right.eval(InternalRow.empty).asInstanceOf[ArrayData]
    new AhoCorasick(
      Array.tabulate(ad.numElements())(ad.getUTF8String(_).toString))
  }
  override def nullSafeEval(t: Any, pp: Any): Any =
    SketchKernels.multiMatch(t.asInstanceOf[UTF8String], automaton)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      "graft.functions.AhoCorasick")
    defineCodeGen(ctx, ev, (a, _) =>
      s"graft.functions.SketchKernels.multiMatch($a, $ref)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiMatchExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_multi_redact(text, patterns, mask)` — Aho–Corasick span
  * redaction under a LITERAL pattern list: every character covered by
  * any (overlapping, nested) pattern occurrence becomes the mask
  * character, in one automaton walk per row — the PII/blocklist
  * REWRITE stage the counting kernel ([[MultiMatchExpr]]) gates.
  */
case class MultiRedactExpr(first: Expression, second: Expression,
                           third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), StringType)
          if second.foldable && third.foldable =>
        (second.eval(InternalRow.empty), third.eval(InternalRow.empty)) match {
          case (ad: ArrayData, m: UTF8String)
              if ad.numElements() > 0 && m.numChars() == 1 =>
            val ok = (0 until ad.numElements()).forall(p =>
              !ad.isNullAt(p) && ad.getUTF8String(p).numChars() > 0)
            if (ok) TypeCheckResult.TypeCheckSuccess
            else TypeCheckResult.TypeCheckFailure(
              s"$prettyName's patterns must be non-null and non-empty")
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName needs a non-empty pattern literal and a " +
              "single-character mask literal")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, foldable array<string>, " +
          "foldable string)")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_multi_redact"
  private lazy val automaton: AhoCorasick = {
    val ad = second.eval(InternalRow.empty).asInstanceOf[ArrayData]
    new AhoCorasick(
      Array.tabulate(ad.numElements())(ad.getUTF8String(_).toString))
  }
  private lazy val mask: Char =
    third.eval(InternalRow.empty).asInstanceOf[UTF8String].toString.charAt(0)
  override def nullSafeEval(t: Any, pp: Any, mm: Any): Any =
    SketchKernels.multiRedact(t.asInstanceOf[UTF8String], automaton, mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton,
      "graft.functions.AhoCorasick")
    defineCodeGen(ctx, ev, (a, _, _) =>
      s"graft.functions.SketchKernels.multiRedact($a, $ref, (char) ${mask.toInt})")
  }
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): MultiRedactExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_robots_match(path, pattern)` — RFC 9309 §2.2.3 rule match:
  * `*` any sequence, trailing `$` end-anchor, otherwise prefix.
  */
case class RobotsMatchExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType | org.apache.spark.sql.types.NullType,
            StringType | org.apache.spark.sql.types.NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string)")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_robots_match"
  override def nullSafeEval(path: Any, pat: Any): Any =
    SketchKernels.robotsMatch(path.asInstanceOf[UTF8String],
      pat.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, q) =>
      s"graft.functions.SketchKernels.robotsMatch($p, $q)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsMatchExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_clean_text(str)` — native one-pass text canonicalization
  * (NFC + control strip + whitespace collapse + trim).
  */
case class CleanTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // NullType admitted so a SQL-side untyped NULL resolves (evaluates
    // to null through the null-safe contract, like built-in functions)
    case StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string)")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_clean_text"
  override def nullSafeEval(s: Any): Any =
    SketchKernels.cleanText(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchKernels.cleanText($c)")
  override protected def withNewChildInternal(
      newChild: Expression): CleanTextExpr = copy(child = newChild)
}

/** `graft_srp_bucket(vec, planes)` — native sign-random-projection LSH
  * bucket. `planes` must be a foldable `array<array<double>>` literal (one
  * inner array per hyperplane, at most 64 of them — one bucket bit each):
  * the hyperplanes are driver-computed constants, and embedding them as a
  * reference object keeps the per-row work a single tight fused loop
  * instead of `planes` interpreted higher-order folds.
  */
case class SrpBucketExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _))
          if right.foldable =>
        right.eval(InternalRow.empty) match {
          case ad: ArrayData if ad.numElements() > 0 && ad.numElements() <= 64 =>
            // null planes / plane elements must fail ANALYSIS, not NPE at
            // first execution inside the lazy planes materialization
            val nullFree = (0 until ad.numElements()).forall { p =>
              !ad.isNullAt(p) && {
                val inner = ad.getArray(p)
                (0 until inner.numElements()).forall(!inner.isNullAt(_))
              }
            }
            if (nullFree) TypeCheckResult.TypeCheckSuccess
            else TypeCheckResult.TypeCheckFailure(
              s"$prettyName's hyperplanes must not contain nulls")
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName's second argument must be a non-null literal of " +
              "1..64 hyperplanes")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, foldable array<array<double>>)")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_srp_bucket"
  private lazy val planes: Array[Array[Double]] = {
    val ad = right.eval(InternalRow.empty).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(p => ad.getArray(p).toDoubleArray())
  }
  override def nullSafeEval(vec: Any, pp: Any): Any =
    SketchKernels.srpBucket(vec.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val res = ctx.freshName("srpRes")
      s"""
         |Object $res = graft.functions.SketchKernels.srpBucket($a, $ref);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $res).longValue(); }
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SrpBucketExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_span_hashes(words, width)` — native one-pass rolling span
  * hashes (the q120/q126 shingling kernel).
  */
case class SpanHashesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PositiveIntArg.check(prettyName,
      { case ArrayType(StringType, _) => true; case _ => false },
      "(array<string>, positive int literal)", left, right)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_span_hashes"
  private lazy val width: Int = right.eval(InternalRow.empty) match {
    case i: Int => i
  }
  override def nullSafeEval(arr: Any, ww: Any): Any =
    SketchKernels.spanHashes(arr.asInstanceOf[ArrayData], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.SketchKernels.spanHashes($a, $width);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanHashesExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_span_hashes2(words, width)` — the independent second rolling
  * stream ([[SketchKernels.spanHashes2]]); cross-document span keys are
  * the (stream-1, stream-2) pair.
  */
case class SpanHashes2Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PositiveIntArg.check(prettyName,
      { case ArrayType(StringType, _) => true; case _ => false },
      "(array<string>, positive int literal)", left, right)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_span_hashes2"
  private lazy val width: Int = right.eval(InternalRow.empty) match {
    case i: Int => i
  }
  override def nullSafeEval(arr: Any, ww: Any): Any =
    SketchKernels.spanHashes2(arr.asInstanceOf[ArrayData], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.SketchKernels.spanHashes2($a, $width);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanHashes2Expr =
    copy(left = newLeft, right = newRight)
}

/** `graft_minhash_sig(hashes, k)` — native k-permutation MinHash. */
case class MinHashSigExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    PositiveIntArg.check(prettyName,
      { case ArrayType(LongType, _) => true; case _ => false },
      "(array<long>, positive int literal)", left, right)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"
  private lazy val k: Int = right.eval(InternalRow.empty) match {
    case i: Int => i
  }
  override def nullSafeEval(arr: Any, kk: Any): Any =
    SketchKernels.minHashSig(arr.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => s"""
       |${ev.value} = graft.functions.SketchKernels.minHashSig($a, $k);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSigExpr =
    copy(left = newLeft, right = newRight)
}

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975):
  * goto/fail links over the pattern trie with per-node MERGED output
  * lists (every pattern index ending at the node, directly or via a
  * suffix link), so matching is one pass over the text with O(1)
  * amortized work per character plus one increment per match —
  * including overlapping matches ("aaa" contains "aa" twice).
  * Char-indexed (the BMP/ASCII contract of the tokenizer family).
  * Top-level class so generated code can name it directly.
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "AhoCorasick: patterns must be non-empty strings")
  val nPatterns: Int = patterns.length
  // goto/fail/output built in one constructor-local scope: only the
  // matching-time structures survive as fields (the automaton is a
  // long-lived serialized codegen reference object — construction
  // scaffolding must not ride along), and outputs merge via index
  // buffers, not List concatenation (quadratic on deep fail chains)
  private val (next, fail, out) = {
    val nextB = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outB = scala.collection.mutable.ArrayBuffer(
      new scala.collection.mutable.ArrayBuffer[Int](0))
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = Character.valueOf(p.charAt(i))
        var t = nextB(s).get(c)
        if (t == null) {
          nextB += new java.util.HashMap[Character, Integer]()
          outB += new scala.collection.mutable.ArrayBuffer[Int](0)
          t = nextB.size - 1
          nextB(s).put(c, t)
        }
        s = t
        i += 1
      }
      outB(s) += pi
    }
    val failA = new Array[Int](nextB.size)
    val queue = new java.util.ArrayDeque[Integer]()
    val it0 = nextB(0).entrySet().iterator()
    while (it0.hasNext) queue.add(it0.next().getValue)
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      val it = nextB(s).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getKey
        val t = e.getValue.intValue()
        var f = failA(s)
        while (f != 0 && nextB(f).get(c) == null) f = failA(f)
        val fn = nextB(f).get(c)
        failA(t) = if (fn != null && fn.intValue() != t) fn.intValue() else 0
        outB(t) ++= outB(failA(t)) // BFS order: fail target already merged
        queue.add(Integer.valueOf(t))
      }
    }
    (nextB.toArray, failA, outB.map(_.toArray).toArray)
  }

  private val patLens: Array[Int] = patterns.map(_.length)

  /** Redaction: every character covered by ANY pattern occurrence is
    * replaced with `mask` — one automaton walk marks coverage (nested
    * and overlapping matches merge), one pass rebuilds the string.
    */
  def redact(text: String, mask: Char): String = {
    val n = text.length
    if (n == 0) return text
    val covered = new Array[Boolean](n)
    var s = 0
    var i = 0
    while (i < n) {
      val c = Character.valueOf(text.charAt(i))
      var t = next(s).get(c)
      while (t == null && s != 0) { s = fail(s); t = next(s).get(c) }
      s = if (t == null) 0 else t.intValue()
      val o = out(s)
      var j = 0
      while (j < o.length) {
        var p = i - patLens(o(j)) + 1
        while (p <= i) { covered(p) = true; p += 1 }
        j += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      sb.append(if (covered(i)) mask else text.charAt(i))
      i += 1
    }
    sb.toString
  }

  /** Per-pattern occurrence counts over `text` (one automaton walk). */
  def counts(text: String): Array[Long] = {
    val acc = new Array[Long](nPatterns)
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = Character.valueOf(text.charAt(i))
      var t = next(s).get(c)
      while (t == null && s != 0) { s = fail(s); t = next(s).get(c) }
      s = if (t == null) 0 else t.intValue()
      val o = out(s)
      var j = 0
      while (j < o.length) { acc(o(j)) += 1L; j += 1 }
      i += 1
    }
    acc
  }
}
