package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

/** Regenerate the reference corpus datasets without the reference
  * checkout (`/root/reference/datagen.py:11-51`): 50/100/150 docs of
  * 200/400/800 tokens over 500/1500/3000-word vocabularies, 8 topics,
  * 70% topical tokens + 30% global noise, shuffled per doc, one shared
  * deterministic RNG across all three files. Byte parity with the
  * committed `datasets/{small,medium,large}.txt` is the oracle
  * (DatagenSpec).
  *
  * The RNG is a clean-room MT19937 (Matsumoto & Nishimura 1998 — the
  * published public-domain algorithm) with CPython's documented
  * int-seeding (`init_by_array` over the seed's 32-bit words) and
  * `getrandbits`-rejection `_randbelow`, because the reference seeds
  * `random.Random(6190)` and byte parity requires the identical
  * stream. `choice`/`shuffle` follow CPython's definitions
  * (`seq[_randbelow(len)]`; reverse-order Fisher–Yates with
  * `_randbelow(i+1)`).
  */
object Datagen {

  /** MT19937 with CPython's seeding and integer-draw semantics. */
  private final class PyRandom(seed: Int) {
    private val N = 624
    private val mt = new Array[Int](N)
    private var mti = N + 1

    private def initGenrand(s: Int): Unit = {
      mt(0) = s
      var i = 1
      while (i < N) {
        // mt[i] = 1812433253 * (mt[i-1] ^ (mt[i-1] >> 30)) + i
        mt(i) = 1812433253 * (mt(i - 1) ^ (mt(i - 1) >>> 30)) + i
        i += 1
      }
      mti = N
    }

    private def initByArray(key: Array[Int]): Unit = {
      initGenrand(19650218)
      var i = 1; var j = 0
      var k = math.max(N, key.length)
      while (k > 0) {
        mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1664525)) +
          key(j) + j
        i += 1; j += 1
        if (i >= N) { mt(0) = mt(N - 1); i = 1 }
        if (j >= key.length) j = 0
        k -= 1
      }
      k = N - 1
      while (k > 0) {
        mt(i) = (mt(i) ^ ((mt(i - 1) ^ (mt(i - 1) >>> 30)) * 1566083941)) - i
        i += 1
        if (i >= N) { mt(0) = mt(N - 1); i = 1 }
        k -= 1
      }
      mt(0) = 0x80000000 // MSB set: non-zero initial array guaranteed
    }

    // CPython random_seed(int n): key = abs(n) as little-endian 32-bit
    // words; our seeds fit one word
    initByArray(Array(math.abs(seed)))

    private def genrandUint32(): Int = {
      val UPPER = 0x80000000
      val LOWER = 0x7fffffff
      if (mti >= N) {
        var kk = 0
        while (kk < N - 397) {
          val y = (mt(kk) & UPPER) | (mt(kk + 1) & LOWER)
          mt(kk) = mt(kk + 397) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
          kk += 1
        }
        while (kk < N - 1) {
          val y = (mt(kk) & UPPER) | (mt(kk + 1) & LOWER)
          mt(kk) = mt(kk + (397 - N)) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
          kk += 1
        }
        val y = (mt(N - 1) & UPPER) | (mt(0) & LOWER)
        mt(N - 1) = mt(396) ^ (y >>> 1) ^ (if ((y & 1) != 0) 0x9908b0df else 0)
        mti = 0
      }
      var y = mt(mti); mti += 1
      y ^= (y >>> 11)
      y ^= (y << 7) & 0x9d2c5680
      y ^= (y << 15) & 0xefc60000
      y ^ (y >>> 18)
    }

    /** getrandbits(k), k in [1, 32] — the top k bits of one draw. */
    private def getrandbits(k: Int): Long =
      (genrandUint32() & 0xffffffffL) >>> (32 - k)

    /** CPython _randbelow_with_getrandbits: rejection on bit_length. */
    def randbelow(n: Int): Int = {
      require(n > 0)
      val k = 32 - Integer.numberOfLeadingZeros(n) // n.bit_length()
      var r = getrandbits(k)
      while (r >= n) r = getrandbits(k)
      r.toInt
    }

    def choice[A](seq: IndexedSeq[A]): A = seq(randbelow(seq.length))

    /** CPython shuffle: reverse Fisher–Yates, j = _randbelow(i + 1). */
    def shuffle[A](xs: ArrayBuffer[A]): Unit = {
      var i = xs.length - 1
      while (i >= 1) {
        val j = randbelow(i + 1)
        val t = xs(i); xs(i) = xs(j); xs(j) = t
        i -= 1
      }
    }
  }

  private def makeVocab(n: Int): IndexedSeq[String] = {
    val width = n.toString.length
    (1 to n).map(i => "w" + ("%0" + width + "d").format(i))
  }

  private def splitTopics(vocab: IndexedSeq[String], k: Int = 8)
      : IndexedSeq[IndexedSeq[String]] = {
    val chunk = math.ceil(vocab.length.toDouble / k).toInt
    (0 until k).map(i =>
      vocab.slice(i * chunk, math.min((i + 1) * chunk, vocab.length)))
  }

  private def genDoc(rng: PyRandom, tokensPerDoc: Int,
                     topics: IndexedSeq[IndexedSeq[String]],
                     topicShare: Double = 0.7): Seq[String] = {
    val topicVocab = topics(rng.randbelow(topics.length))
    val globalVocab = topics.flatten
    val nTopic = (tokensPerDoc * topicShare).toInt // int(): truncation
    val nNoise = tokensPerDoc - nTopic
    val toks = ArrayBuffer.empty[String]
    for (_ <- 0 until nTopic) toks += rng.choice(topicVocab)
    for (_ <- 0 until nNoise) toks += rng.choice(globalVocab)
    rng.shuffle(toks)
    toks.toSeq
  }

  private[graft] def dataset(rng: PyRandom, numDocs: Int,
                             tokensPerDoc: Int, vocabSize: Int): String = {
    val topics = splitTopics(makeVocab(vocabSize))
    val sb = new StringBuilder
    for (i <- 1 to numDocs)
      sb.append(s"Document$i ")
        .append(genDoc(rng, tokensPerDoc, topics).mkString(" "))
        .append('\n')
    sb.toString
  }

  /** All three files from ONE seeded stream, in the reference's order —
    * generating a later file alone would desynchronize the RNG.
    */
  def generateAll(): Map[String, String] = {
    val rng = new PyRandom(6190)
    // (docs, tokens/doc, vocab) — datagen.py main()
    val specs = Seq(
      "small" -> ((50, 200, 500)),
      "medium" -> ((100, 400, 1500)),
      "large" -> ((150, 800, 3000)))
    specs.map { case (name, (d, t, v)) =>
      name -> dataset(rng, d, t, v)
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("datasets")
    Files.createDirectories(Paths.get(outDir))
    val all = generateAll()
    for (name <- Seq("small", "medium", "large")) {
      val p = Paths.get(outDir, s"$name.txt")
      Files.write(p, all(name).getBytes(StandardCharsets.UTF_8))
      println(s"[datagen] wrote $p (${all(name).length} bytes)")
    }
  }
}
