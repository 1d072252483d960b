package graft.operators

import graft.SparkSpec

/** Unigram-LM trainer: Viterbi semantics on hand fixtures (best score,
  * fewer-pieces tie-break, open-vocabulary floor), EM behaviour on a
  * planted dictionary (the frequent substring becomes a piece),
  * reconstruction (pieces concatenate to the word), and determinism. */
class UnigramLmSpec extends SparkSpec {

  test("viterbi picks the best-scoring segmentation") {
    val logp = Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0, "c" -> -3.0)
    assert(UnigramLm.viterbi("abc", logp, 4, -10.0).toSeq ===
      Seq("ab", "c"))
    // the two-piece split (-1 + -3) beats three singles (-7)
    assert(UnigramLm.viterbi("ab", logp, 4, -10.0).toSeq === Seq("ab"))
  }

  test("viterbi tie-break prefers fewer pieces") {
    val logp = Map("ab" -> -2.0, "a" -> -1.0, "b" -> -1.0, "c" -> -1.0)
    // ab|c = -3 equals a|b|c = -3; fewer pieces wins
    assert(UnigramLm.viterbi("abc", logp, 4, -10.0).toSeq ===
      Seq("ab", "c"))
  }

  test("viterbi open vocabulary: unseen chars segment via the floor") {
    val logp = Map("a" -> -1.0)
    val got = UnigramLm.viterbi("axa", logp, 4, -5.0)
    assert(got.toSeq === Seq("a", "x", "a"))
  }

  test("viterbi reconstruction: pieces concatenate to the word") {
    val logp = Map("sp" -> -1.5, "ar" -> -1.5, "k" -> -2.0, "spark" -> -4.5)
    Seq("spark", "sparkspark", "ksp").foreach { w =>
      val pieces = UnigramLm.viterbi(w, logp, 5, -8.0)
      assert(pieces.mkString === w, w)
    }
  }

  test("EM on a planted dictionary learns the frequent substring") {
    val dict = Array(("abab", 100L), ("abc", 80L), ("xy", 5L))
    val vocab = UnigramLm.train(dict, vocabSize = 12,
      maxPieceLen = 3, iters = 3).toMap
    // 'abc' is itself a seed piece and one factor always beats two, so
    // it stays whole; 'abab' (len 4 > maxPieceLen) must split as ab|ab
    // - 'ab' survives with exactly the 2x100 weighted uses
    assert(vocab.contains("ab"))
    assert(vocab("ab") === 200L)
    assert(vocab.contains("abc"))
    assert(vocab("abc") === 80L)
    // single chars always retained (coverage floor)
    Seq("a", "b", "c", "x", "y").foreach(c => assert(vocab.contains(c), c))
  }

  test("train is deterministic") {
    val dict = Array(("merge", 50L), ("merger", 30L), ("order", 20L),
      ("er", 10L))
    val a = UnigramLm.train(dict, 20, 4, 3)
    val b = UnigramLm.train(dict, 20, 4, 3)
    assert(a === b)
  }

  test("learnVocab and tokenize run on the fixture corpus") {
    val v = UnigramLm.learnVocab(spark, sfDir, topK = 10).collect()
    assert(v.length === 10)
    assert(v.map(_.getLong(1)).toSeq === v.map(_.getLong(1)).sorted.reverse)
    val t = UnigramLm.tokenize(spark, sfDir, topK = 10).collect()
    assert(t.length === 10)
    // every emitted piece is non-empty and within the piece-length cap
    (v.map(_.getString(0)) ++ t.map(_.getString(0))).foreach { p =>
      assert(p.nonEmpty && p.length <= 4, p)
    }
  }
}
