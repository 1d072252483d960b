package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Randomized (seeded, deterministic) invariant tests for the pure cores
  * of the dedup/fingerprint operators — the algebraic laws the
  * distributed pipelines rely on, checked over many generated inputs
  * rather than single fixtures. */
class InvariantSpec extends SparkSpec {

  private def randWords(rnd: Random, n: Int): Seq[String] =
    Seq.fill(n)(s"w${rnd.nextInt(50)}")

  test("minhash merge law: sig(A ∪ B) = elementwise min(sig A, sig B)") {
    val rnd = new Random(42)
    (1 to 50).foreach { _ =>
      val a = randWords(rnd, 5 + rnd.nextInt(60)).mkString(" ")
      val b = randWords(rnd, 5 + rnd.nextInt(60)).mkString(" ")
      val sa = Dedup.minHashSignature(Dedup.shingles(a), 32)
      val sb = Dedup.minHashSignature(Dedup.shingles(b), 32)
      val su = Dedup.minHashSignature(
        Dedup.shingles(a) ++ Dedup.shingles(b), 32)
      assert(su.toSeq === sa.zip(sb).map(p => math.min(p._1, p._2)).toSeq)
    }
  }

  test("minhash estimator is exact for identical and disjoint sets") {
    val rnd = new Random(7)
    (1 to 20).foreach { _ =>
      val words = (0 until 30).map(i => s"uniq${rnd.nextInt(1000)}x$i")
      val sa = Dedup.minHashSignature(Dedup.shingles(words.mkString(" ")), 64)
      assert(sa.toSeq === Dedup.minHashSignature(
        Dedup.shingles(words.mkString(" ")), 64).toSeq)
    }
  }

  test("simhash is invariant under word permutation") {
    val rnd = new Random(11)
    (1 to 50).foreach { _ =>
      val words = randWords(rnd, 3 + rnd.nextInt(40))
      val h1 = Dedup.simHash64(words.mkString(" "))
      val h2 = Dedup.simHash64(rnd.shuffle(words).mkString(" "))
      assert(h1 === h2)
    }
  }

  test("winnowing guarantee: shared substring ≥ k+w−1 ⇒ shared fingerprint") {
    // Schleimer et al. theorem: any match of length ≥ window + k − 1
    // (= 11 for k=8, w=4) is caught by at least one shared fingerprint
    val rnd = new Random(23)
    (1 to 50).foreach { _ =>
      val base = Seq.fill(40 + rnd.nextInt(100))(
        ('a' + rnd.nextInt(26)).toChar).mkString
      val start = rnd.nextInt(base.length - 11)
      val len = 11 + rnd.nextInt(base.length - start - 11 + 1)
      val sub = base.substring(start, start + len)
      val shared = TextOps.fingerprintSet(base).toSet
        .intersect(TextOps.fingerprintSet(sub).toSet)
      assert(shared.nonEmpty,
        s"match of length $len must share a fingerprint")
    }
  }

  test("jaccard: symmetry, bounds, identity") {
    val rnd = new Random(31)
    (1 to 50).foreach { _ =>
      val a = Dedup.shingles(randWords(rnd, 4 + rnd.nextInt(30)).mkString(" "))
      val b = Dedup.shingles(randWords(rnd, 4 + rnd.nextInt(30)).mkString(" "))
      val j = Dedup.jaccard(a, b)
      assert(j === Dedup.jaccard(b, a))
      assert(j >= 0.0 && j <= 1.0)
      assert(Dedup.jaccard(a, a) === 1.0)
    }
  }

  test("connectedComponents equals a union-find reference on random graphs") {
    import spark.implicits._
    val rnd = new Random(57)
    (1 to 5).foreach { _ =>
      val nVerts = 20 + rnd.nextInt(30)
      val edges = Seq.fill(10 + rnd.nextInt(40))(
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
        .filter(e => e._1 != e._2)
      // reference: plain driver-side union-find with path compression
      val parent = Array.tabulate(nVerts)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical label = min vertex of the component
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct.map { v =>
        val members = (0 until nVerts)
          .filter(u => find(u) == find(v.toInt)).map(_.toLong)
        // min over members that appear in the edge list (graph vertices)
        val graphVerts = edges.flatMap(e => Seq(e._1, e._2)).toSet
        v -> members.filter(graphVerts.contains).min
      }.toMap
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected)
    }
  }

  test("triangles equal a brute-force O(n³) reference on random graphs") {
    import spark.implicits._
    val rnd = new Random(91)
    (1 to 5).foreach { _ =>
      val nVerts = 10 + rnd.nextInt(20)
      val edges = Seq.fill(15 + rnd.nextInt(40))(
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct
      val adj = edges.toSet
      def connected(a: Long, b: Long) =
        adj.contains((math.min(a, b), math.max(a, b)))
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // reference: all vertex triples, count closed ones per corner
      val expected = verts.map { v =>
        v -> (for {
          a <- verts; b <- verts
          if a < b && a != v && b != v
          if connected(v, a) && connected(v, b) && connected(a, b)
        } yield 1).size.toLong
      }.toMap
      val degExpected = verts.map(v =>
        v -> edges.count(e => e._1 == v || e._2 == v).toLong).toMap
      val got = GraphOps.triangles(edges.toDF("src", "dst")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got.keySet === expected.keySet)
      got.foreach { case (v, (deg, tri)) =>
        assert(deg === degExpected(v), s"deg of $v")
        assert(tri === expected(v), s"triangles of $v")
      }
    }
  }

  test("pageRank matches a plain-Scala power method on random graphs") {
    import spark.implicits._
    val rnd = new Random(17)
    (1 to 3).foreach { _ =>
      val nVerts = 8 + rnd.nextInt(12)
      val edges = Seq.fill(12 + rnd.nextInt(25))(
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val nbrs = verts.map(v => v -> edges.collect {
        case (a, b) if a == v => b
        case (a, b) if b == v => a
      }).toMap
      val n = verts.size
      var pr = verts.map(_ -> 1.0 / n).toMap
      (1 to 10).foreach { _ =>
        pr = verts.map { v =>
          val mass = nbrs(v).map(u => pr(u) / nbrs(u).size).sum
          v -> (0.15 / n + 0.85 * mass)
        }.toMap
      }
      val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 10,
          roundTo = 9)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(got.keySet === pr.keySet)
      got.foreach { case (v, p) =>
        assert(math.abs(p - pr(v)) < 1e-5, s"pr($v): $p vs ${pr(v)}")
      }
    }
  }

  test("char entropy matches a plain-Scala Shannon computation") {
    import spark.implicits._
    val rnd = new Random(23)
    val alphabet = "abcdefgh XYZ.,"
    val docs = (0L until 40L).map { i =>
      val len = rnd.nextInt(120) // includes 0 → the empty-text guard path
      (i, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val tmp = java.nio.file.Files.createTempDirectory("entinv").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextOps.charEntropy(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    docs.foreach { case (id, text) =>
      val expected = if (text.isEmpty) 0.0 else {
        val n = text.length.toDouble
        // same summation order as the operator: sorted distinct chars
        val s = text.distinct.sorted.map { c =>
          val p = text.count(_ == c) / n
          p * (math.log(p) / math.log(2.0))
        }.sum
        math.rint((0.0 - s) * 1e4) / 1e4
      }
      assert(math.abs(got(id) - expected) < 1e-9, s"doc $id")
    }
  }

  test("bm25 matches a plain-Scala Okapi computation on random corpora") {
    import spark.implicits._
    val rnd = new Random(31)
    val vocab = Vector("join", "scan", "filter", "agg", "sort", "x", "y", "z")
    (1 to 5).foreach { round =>
      val docs = (0L until 25L).map { i =>
        (i, Seq.fill(3 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length)))
          .mkString(" "), "en")
      }
      val tmp = java.nio.file.Files.createTempDirectory(s"bm25inv$round")
        .toString
      docs.toDF("doc_id", "text", "lang")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val terms = Seq("join", "scan", "filter")
      val got = TextOps.bm25(spark, tmp, terms).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // reference: direct Okapi BM25 over the tokenized corpus
      val toks = docs.map { case (id, t, _) => id -> t.split("\\s+").toSeq }
      val nDocs = toks.size.toDouble
      val avgdl = toks.map(_._2.size).sum.toDouble / nDocs
      val df = terms.map(t =>
        t -> toks.count(_._2.contains(t)).toDouble).toMap
      val (k1, b) = (1.2, 0.75)
      toks.foreach { case (id, words) =>
        val score = terms.map { t =>
          val tf = words.count(_ == t).toDouble
          if (tf == 0.0) 0.0
          else math.log((nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0) *
            tf * (k1 + 1.0) /
            (tf + k1 * (1.0 - b + b * words.size.toDouble / avgdl))
        }.sum
        if (terms.exists(words.contains))
          assert(math.abs(got(id) - score) < 1e-3, s"doc $id round $round")
        else assert(!got.contains(id), s"doc $id should be absent")
      }
    }
  }
  test("kAnonymize equals a plain-Scala generalization ladder on random events") {
    import spark.implicits._
    val utc = java.time.ZoneOffset.UTC
    val fmtDay = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd").withZone(utc)
    val fmtHour = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:00").withZone(utc)
    val rnd = new Random(91)
    (1 to 5).foreach { round =>
      val k = 2 + rnd.nextInt(4)
      val l = 2 + rnd.nextInt(2)
      val n = 80 + rnd.nextInt(120)
      val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
      val rows = (1 to n).map { i =>
        val ts = new java.sql.Timestamp(
          base + rnd.nextInt(3 * 24 * 3600).toLong * 1000L)
        (i.toLong, ts, rnd.nextInt(8).toLong, s"t${rnd.nextInt(3)}",
          rnd.nextInt(300).toDouble)
      }
      val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      // driver-side reference: the same ladder over plain collections
      final case class R(t: String, day: String, hour: String,
          u: Long, s: Long)
      val rs = rows.map { case (_, ts, u, t, v) =>
        val inst = java.time.Instant.ofEpochMilli(ts.getTime)
        R(t, fmtDay.format(inst), fmtHour.format(inst), u,
          math.floor(v / 50.0).toLong)
      }
      def cell(xs: Seq[R]): (Long, Long, Boolean) =
        (xs.size.toLong, xs.map(_.u).distinct.size.toLong,
          xs.map(_.s).distinct.size >= l)
      val byHour = rs.groupBy(r => (r.t, r.day, r.hour))
      val (relH, failH) = byHour.partition {
        case (_, xs) => xs.map(_.u).distinct.size >= k }
      val residual = failH.values.flatten.toSeq
      val byDay = residual.groupBy(r => (r.t, r.day))
      val (relD, failD) = byDay.partition {
        case (_, xs) => xs.map(_.u).distinct.size >= k }
      val supp = failD.values.flatten.toSeq.groupBy(_.t)
      val expected: Set[(String, String, String, Long, Long, Boolean)] =
        (relH.map { case ((t, _, h), xs) =>
          val (nr, nu, lo) = cell(xs.toSeq); (t, "hour", h, nr, nu, lo) } ++
        relD.map { case ((t, d), xs) =>
          val (nr, nu, lo) = cell(xs.toSeq); (t, "day", d, nr, nu, lo) } ++
        supp.map { case (t, xs) =>
          val (nr, nu, lo) = cell(xs.toSeq)
          (t, "suppressed", null: String, nr, nu, lo) }).toSet
      val got = Privacy.kAnonymize(df, k, l).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
      assert(got === expected, s"round $round k=$k l=$l")
    }
  }
}
