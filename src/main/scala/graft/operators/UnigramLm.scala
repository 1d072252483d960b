package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenizer trainer — the
  * second of the two standard subword algorithms, alongside the BPE
  * trainer in [[TextOps.learnBpeMerges]]. Where BPE grows a vocabulary
  * bottom-up by merging frequent pairs, the unigram LM starts from an
  * over-complete substring seed vocabulary and fits piece
  * probabilities by EM over the best segmentations (Kudo 2018), then
  * keeps the most useful pieces.
  *
  * Deliberate simplifications, stated plainly: this is HARD EM
  * (Viterbi counts, not forward-backward expected counts) with a FIXED
  * iteration count and a final one-shot top-V prune — not Kudo's
  * loss-ranked iterative shrink. Every step is deterministic (total
  * orders on all ties), which is what makes the golden-VALUES oracle
  * and the hand-fixture spec possible; the segmentation-EM mechanism
  * and the scale shape are the real thing.
  *
  * Scale shape (same contract as the BPE trainer): the corpus-sized
  * work is ONE distributed word-count aggregate; the EM loop runs on
  * the driver over the bounded top-`maxVocab` DISTINCT-word dictionary
  * (a TakeOrdered — one bounded result regardless of corpus size), and
  * tokenization under the learned vocabulary runs once per DISTINCT
  * word with the vocabulary broadcast, weighted back by frequency.
  * Nothing touches the raw token stream twice.
  */
object UnigramLm {

  /** Viterbi-best segmentation of `word` under piece log-probs:
    * maximize the sum of piece log-probabilities; ties prefer FEWER
    * pieces, then the lexicographically smallest final piece at each
    * DP boundary (a total order — enough for determinism).
    * Single characters absent from `logp` fall back to `floorLogp`
    * (open vocabulary — any word segments). Exposed for specs. */
  def viterbi(word: String, logp: Map[String, Double],
      maxPieceLen: Int, floorLogp: Double): Array[String] = {
    val n = word.length
    // dp(i) = (score, pieces) of the best segmentation of word[0, i)
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val nPieces = Array.fill(n + 1)(Int.MaxValue)
    val backPos = Array.fill(n + 1)(-1)
    val backPiece = Array.fill[String](n + 1)(null)
    score(0) = 0.0
    nPieces(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (score(j) != Double.NegativeInfinity) {
          val piece = word.substring(j, i)
          val lp =
            if (logp.contains(piece)) Some(logp(piece))
            else if (i - j == 1) Some(floorLogp)
            else None
          lp.foreach { v =>
            val s = score(j) + v
            val np = nPieces(j) + 1
            // total order: score desc, piece count asc, then smallest
            // piece string at this boundary (stable, deterministic)
            val better = s > score(i) ||
              (s == score(i) && (np < nPieces(i) ||
                (np == nPieces(i) && backPiece(i) != null &&
                  piece < backPiece(i))))
            if (better) {
              score(i) = s; nPieces(i) = np
              backPos(i) = j; backPiece(i) = piece
            }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += backPiece(p); p = backPos(p) }
    out.reverseIterator.toArray
  }

  /** The bounded distinct-word dictionary: one distributed word-count
    * aggregate, truncated by the (freq desc, word asc) total order. */
  private def dictionary(spark: SparkSession, dir: String,
      minFreq: Long, maxVocab: Int): Array[(String, Long)] =
    TextOps.words(spark, dir).groupBy("word")
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

  /** Train the unigram-LM vocabulary. Returns the driver-side final
    * vocabulary as (piece -> weighted use count) plus the total, via
    * the DataFrame of [[learnVocab]]; see the object scaladoc for the
    * honesty notes. */
  private[operators] def train(dict: Array[(String, Long)], vocabSize: Int,
      maxPieceLen: Int, iters: Int): Seq[(String, Long)] = {
    require(vocabSize > 0 && maxPieceLen >= 1 && iters >= 1,
      "vocabSize/maxPieceLen/iters must be positive")
    // single characters are the coverage floor: never pruned, so every
    // word always segments
    val chars: Set[String] =
      dict.iterator.flatMap(_._1.split("")).filter(_.nonEmpty).toSet
    // seed: every substring up to maxPieceLen, weighted by word freq ×
    // occurrences, truncated to an over-complete 2×vocabSize pool
    val seedCounts = scala.collection.mutable.Map.empty[String, Long]
    dict.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var len = 1
        while (len <= maxPieceLen && i + len <= w.length) {
          val sub = w.substring(i, i + len)
          seedCounts.update(sub, seedCounts.getOrElse(sub, 0L) + f)
          len += 1
        }
        i += 1
      }
    }
    var vocab: Map[String, Long] = {
      val pool = seedCounts.toSeq
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(2 * vocabSize, chars.size))
      (pool ++ chars.map(c => c -> seedCounts.getOrElse(c, 1L))).toMap
    }
    var it = 0
    while (it < iters) {
      val total = vocab.values.sum.toDouble
      val logp = vocab.map { case (p, c) => p -> math.log(c / total) }
      val floor = math.log(0.5 / total) // unseen single chars
      val counts = scala.collection.mutable.Map.empty[String, Long]
      dict.foreach { case (w, f) =>
        viterbi(w, logp, maxPieceLen, floor).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + f)
        }
      }
      // M-step + prune: top vocabSize by (use count desc, piece asc),
      // single chars always retained (coverage floor)
      val kept = counts.toSeq
        .filter { case (p, _) => !chars.contains(p) }
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(vocabSize - chars.size, 0))
      vocab = (kept ++ chars.map(c => c -> counts.getOrElse(c, 1L))).toMap
      it += 1
    }
    vocab.toSeq.sortBy { case (p, c) => (-c, p) }
  }

  /** Learned vocabulary as a DataFrame: (piece, n_uses) — final-EM
    * Viterbi use counts weighted by word frequency, ordered by the
    * (n_uses desc, piece asc) total order, truncated to `topK` for the
    * golden entry. */
  def learnVocab(spark: SparkSession, dir: String, vocabSize: Int = 40,
      maxPieceLen: Int = 4, iters: Int = 3, minFreq: Long = 2L,
      maxVocab: Int = 1000000, topK: Int = 20): DataFrame = {
    import spark.implicits._
    val dict = dictionary(spark, dir, minFreq, maxVocab)
    train(dict, vocabSize, maxPieceLen, iters).take(topK)
      .toDF("piece", "n_uses")
  }

  /** Corpus piece-frequency table under the LEARNED vocabulary — the
    * apply half: segment each DISTINCT word once with the broadcast
    * vocabulary, weight by word frequency, and count. */
  def tokenize(spark: SparkSession, dir: String, vocabSize: Int = 40,
      maxPieceLen: Int = 4, iters: Int = 3, minFreq: Long = 2L,
      maxVocab: Int = 1000000, topK: Int = 20): DataFrame = {
    import spark.implicits._
    val dict = dictionary(spark, dir, minFreq, maxVocab)
    val vocab = train(dict, vocabSize, maxPieceLen, iters)
    val total = vocab.map(_._2).sum.toDouble
    val logp = vocab.map { case (p, c) => p -> math.log(c / total) }.toMap
    val floor = math.log(0.5 / total)
    val bc = spark.sparkContext.broadcast((logp, maxPieceLen, floor))
    val seg = udf((w: String) => {
      val (lp, mpl, fl) = bc.value
      viterbi(w, lp, mpl, fl)
    })
    // segmentation touches the DICTIONARY (distinct words), never the
    // token stream; counts ride back weighted by word frequency
    TextOps.words(spark, dir).groupBy("word")
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .select(explode(seg(col("word"))).as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("n"))
      .orderBy(col("n").desc, col("piece").asc)
      .limit(topK)
  }
}
