package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[CharBagExpression]] / [[CharBagL1Expression]] — the packed
  * edit-distance bag bound: codegen ≡ Scala reference, and the bound
  * itself (L1/2 <= levenshtein) holds on random word-salad pairs so
  * the prune in `Dedup.editDistancePairs` can never drop a true pair. */
class CharBagExpressionSpec extends SparkSpec {

  private def refCounts(s: String): Array[Int] = {
    val c = new Array[Int](27)
    s.foreach {
      case ch if ch >= 'a' && ch <= 'z' => c(ch - 'a') += 1
      case ' ' => c(26) += 1
      case _ => ()
    }
    c
  }

  test("packed bag through the Spark pipeline equals the reference " +
      "counts; null text is the zero bag; L1 is exact") {
    import spark.implicits._
    val texts = Seq("the quick brown fox", "", "zzz aaa zzz",
      "punctuation! & Ünïcode stay uncounted 123", null)
    val df = texts.toDF("t")
      .select(col("t"), CharBagExpression.bagCol(col("t")).as("bag"))
    val rows = df.collect()
    rows.zip(texts).foreach { case (r, t) =>
      val bag = r.getAs[Array[Byte]]("bag")
      assert(bag.length === CharBagExpression.Lanes * 2)
      val expected = refCounts(if (t == null) "" else t)
      val got = (0 until 27).map(i =>
        ((bag(i * 2) & 0xff) << 8) | (bag(i * 2 + 1) & 0xff))
      assert(got === expected.toSeq, s"text=$t")
      // bigram section: total count equals the number of in-alphabet
      // adjacent pairs (hashing redistributes, never loses)
      val s = if (t == null) "" else t
      val inAlpha = (c: Char) => (c >= 'a' && c <= 'z') || c == ' '
      val wantBigrams = s.zip(s.drop(1)).count {
        case (x, y) => inAlpha(x) && inAlpha(y) }
      val gotBigrams = (27 until CharBagExpression.Lanes).map(i =>
        ((bag(i * 2) & 0xff) << 8) | (bag(i * 2 + 1) & 0xff)).sum
      assert(gotBigrams === wantBigrams, s"bigram total, text=$t")
    }
    // pairwise L1 via the native expression == reference L1
    val pairs = for (a <- texts; b <- texts) yield (a, b)
    val l1df = pairs.toDF("a", "b").select(
      col("a"), col("b"),
      CharBagExpression.l1Col(
        CharBagExpression.bagCol(col("a")),
        CharBagExpression.bagCol(col("b"))).as("l1"))
    l1df.collect().foreach { r =>
      val a = refCounts(Option(r.getString(0)).getOrElse(""))
      val b = refCounts(Option(r.getString(1)).getOrElse(""))
      val want = a.zip(b).map { case (x, y) => math.abs(x - y).toLong }.sum
      assert(r.getLong(2) === want)
    }
  }

  test("bound property on random salads: L1 <= 2 * levenshtein, so the " +
      "prune `L1 > 2k` is exact (never drops a true pair)") {
    import spark.implicits._
    val vocab = Vector("spark", "merge", "row", "the", "data", "a", "key")
    val rnd = new scala.util.Random(13)
    def salad() = Seq.fill(3 + rnd.nextInt(12))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def mutate(s: String) = {
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.take(i) + "x" + s.drop(i + 1) // substitute
        case 1 => s.take(i) + "q" + s.drop(i)     // insert
        case _ => s.take(i) + s.drop(i + 1)       // delete
      }
    }
    val pairs = (1 to 200).map { _ =>
      val a = salad()
      val b = if (rnd.nextBoolean()) Iterator.iterate(a)(mutate)
        .drop(1 + rnd.nextInt(6)).next() else salad()
      (a, b)
    }
    val checked = pairs.toDF("a", "b").select(
      col("a"), col("b"),
      CharBagExpression.l1Col(
        CharBagExpression.bagCol(col("a")),
        CharBagExpression.bagCol(col("b"))).as("l1"),
      levenshtein(col("a"), col("b")).cast("long").as("lev"))
    val bad = checked.filter(col("l1") > col("lev") * 2).count()
    assert(bad === 0L, "letter L1 exceeded 2*levenshtein - bound broken")
    // bigram bound + withinBound coherence, checked on the driver via
    // the same static entry points codegen calls
    checked.collect().foreach { r =>
      val ba = CharBagExpression.bag(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
      val bb = CharBagExpression.bag(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)))
      val lev = r.getLong(3)
      assert(CharBagExpression.bigramL1(ba, bb) <= 4 * lev,
        s"bigram L1 broke 4*lev for (${r.getString(0)} | ${r.getString(1)})")
      if (lev <= 16)
        assert(CharBagExpression.withinBound(ba, bb, 16),
          "withinBound pruned a true pair")
    }
  }
}
