package graft

/** Randomized property check for the Kneser-Ney LM family
  * ([[graft.ext.TextOps.knLmTrainOf]] / `knScoreOf`) against a plain Scala
  * reference that implements the definition directly: interpolated KN with
  * D = 3/4 over the `lang='en'` subcorpus, the three-branch scoring ladder
  * with the add-one continuation floor, and the 2^20 fixed-point
  * integerization. Distributed rollups + joins must equal the sequential
  * in-memory computation EXACTLY (integer arithmetic end-to-end, one IEEE
  * division at the boundary), on corpora with empty docs, one-token docs,
  * OOV-heavy non-en docs, and contexts absent from training.
  */
class KnPropertySpec extends SparkSpec {

  private val Q = 1048576L

  private def toksOf(t: String): Seq[String] =
    t.toLowerCase.split(' ').filter(_.nonEmpty).toSeq

  /** Sequential reference: doc_id -> (n_bigrams, n_backoff, mean_p). */
  private def refScores(docs: Seq[(Long, String, String)]): Map[Long, (Long, Long, Double)] = {
    val trainBg = docs.filter(_._3 == "en")
      .flatMap { case (_, t, _) => val w = toksOf(t); w.zip(w.drop(1)) }
    val cxy = trainBg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cx = cxy.groupBy(_._1._1).map { case (x, m) => x -> ((m.values.sum, m.size.toLong)) }
    val cy = cxy.groupBy(_._1._2).map { case (y, m) => y -> m.size.toLong }
    val nbb = cxy.size.toLong
    docs.flatMap { case (id, t, _) =>
      val w = toksOf(t); val bg = w.zip(w.drop(1))
      if (bg.isEmpty) None
      else {
        var qsum = 0L; var back = 0L
        bg.foreach { case (x, y) =>
          val ny = math.max(cy.getOrElse(y, 0L), 1L)
          val q = cxy.get((x, y)) match {
            case Some(c) =>
              val (cX, n1x) = cx(x)
              ((4 * c - 3) * nbb + 3 * n1x * ny) * Q / (4 * cX * nbb)
            case None =>
              back += 1
              cx.get(x) match {
                case Some((cX, n1x)) => (3 * n1x * ny) * Q / (4 * cX * nbb)
                case None => ny * Q / nbb
              }
          }
          qsum += q
        }
        Some(id -> ((bg.size.toLong, back, qsum.toDouble / 1048576.0 / bg.size.toDouble)))
      }
    }.toMap
  }

  /** Sequential reference for the trained table: (x, y) -> (num, den). */
  private def refTrain(docs: Seq[(Long, String, String)]): Map[(String, String), (Long, Long)] = {
    val trainBg = docs.filter(_._3 == "en")
      .flatMap { case (_, t, _) => val w = toksOf(t); w.zip(w.drop(1)) }
    val cxy = trainBg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cx = cxy.groupBy(_._1._1).map { case (x, m) => x -> ((m.values.sum, m.size.toLong)) }
    val cy = cxy.groupBy(_._1._2).map { case (y, m) => y -> m.size.toLong }
    val nbb = cxy.size.toLong
    cxy.map { case ((x, y), c) =>
      val (cX, n1x) = cx(x)
      (x, y) -> (((4 * c - 3) * nbb + 3 * n1x * cy(y), 4 * cX * nbb))
    }
  }

  test("kn lm: distributed train + score == sequential reference on random corpora (r9.4)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val langs = Vector("en", "de", "fr")
    def randDoc(maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val corpora: Seq[Seq[(Long, String, String)]] =
      // edge corpora: minimal training pair; all-en; en + empty/one-token docs
      Seq(
        Seq((1L, "a b", "en"), (2L, "b a c", "de"), (3L, "", "fr"), (4L, "f", "en")),
        (1 to 8).map(i => (i.toLong, randDoc(6), "en")),
      ) ++
        // random corpora, always with a seeded en doc so training is non-empty
        (1 to 6).map { c =>
          (1L, "a b c a", "en") +: (2 to 14).map(i =>
            (i.toLong, randDoc(8), langs(rnd.nextInt(langs.size))))
        }
    corpora.zipWithIndex.foreach { case (docsSeq, ci) =>
      val docs = docsSeq.toDF("doc_id", "text", "lang")
      val gotTrain = ext.TextOps.knLmTrainOf(docs).collect()
        .map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(r.fieldIndex("p_num")), r.getLong(r.fieldIndex("p_den"))))).toMap
      assert(gotTrain == refTrain(docsSeq), s"corpus $ci: trained table diverges")
      val gotScores = ext.TextOps.knScoreOf(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val want = refScores(docsSeq)
      assert(gotScores.keySet == want.keySet,
        s"corpus $ci: scored doc set ${gotScores.keySet} != ${want.keySet}")
      gotScores.foreach { case (id, got) =>
        assert(got == want(id), s"corpus $ci doc $id: $got != ${want(id)}")
      }
    }
  }

  /** Sequential trigram reference: the interpolated-KN recursion with all
    * lower-order stats derived from the trigram counts, the same nested
    * floor-div fixed-point ladder the engine uses. */
  private def ref3Scores(docs: Seq[(Long, String, String)]): Map[Long, (Long, Long, Double)] = {
    val trainTg = docs.filter(_._3 == "en").flatMap { case (_, t, _) =>
      val w = toksOf(t); w.lazyZip(w.drop(1)).lazyZip(w.drop(2)).toSeq
    }
    val cxyz = trainTg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cxy = cxyz.groupBy(k => (k._1._1, k._1._2))
      .map { case (k, m) => k -> ((m.values.sum, m.size.toLong)) } // c_xy, n1p_xy
    val byz = cxyz.keySet.groupBy(k => (k._2, k._3)).map { case (k, s) => k -> s.size.toLong }
    val ny = byz.groupBy(_._1._1)
      .map { case (y, m) => y -> ((m.values.sum, m.size.toLong)) } // n1p_dyd, n1p_yd
    val nz = byz.groupBy(_._1._2).map { case (z, m) => z -> m.size.toLong } // n1p_dz
    val nbb = byz.size.toLong
    def q1(z: String): Long = math.max(nz.getOrElse(z, 0L), 1L) * Q / nbb
    def q2b(y: String, z: String): Long = byz.get((y, z)) match {
      case Some(dyz) =>
        val (dyd, yd) = ny(y)
        ((4 * dyz - 3) * Q) / (4 * dyd) + (3 * yd * (nz(z) * Q / nbb)) / (4 * dyd)
      case None => ny.get(y) match {
        case Some((dyd, yd)) => (3 * yd * q1(z)) / (4 * dyd)
        case None => q1(z)
      }
    }
    docs.flatMap { case (id, t, _) =>
      val w = toksOf(t)
      val tg = w.lazyZip(w.drop(1)).lazyZip(w.drop(2)).toSeq
      if (tg.isEmpty) None
      else {
        var qsum = 0L; var back = 0L
        tg.foreach { case (x, y, z) =>
          val q = cxyz.get((x, y, z)) match {
            case Some(c) =>
              val (cXY, n1xy) = cxy((x, y))
              ((4 * c - 3) * Q) / (4 * cXY) + (3 * n1xy * q2b(y, z)) / (4 * cXY)
            case None =>
              back += 1
              cxy.get((x, y)) match {
                case Some((cXY, n1xy)) => (3 * n1xy * q2b(y, z)) / (4 * cXY)
                case None => q2b(y, z)
              }
          }
          qsum += q
        }
        Some(id -> ((tg.size.toLong, back, qsum.toDouble / 1048576.0 / tg.size.toDouble)))
      }
    }.toMap
  }

  /** Sequential ORDER-N reference — the generalized recursion the engine's
    * [[graft.ext.TextOps.knNScoreOfGrams]] ladder must reproduce exactly:
    * adjusted counts a_k = types of a_{k+1}, context stats (den, fan) per
    * order, guarded continuation ratio at order 1, nested floor-div
    * fixed-point composition above. */
  private def refNScores(
      docs: Seq[(Long, String, String)], n: Int): Map[Long, (Long, Long, Double)] = {
    def grams(t: String): Seq[Vector[String]] =
      toksOf(t).sliding(n).filter(_.size == n).map(_.toVector).toSeq
    val an = scala.collection.mutable.Map.empty[Vector[String], Long]
    docs.filter(_._3 == "en").foreach(d =>
      grams(d._2).foreach(g => an(g) = an.getOrElse(g, 0L) + 1L))
    // a(k) keyed on the last-k suffix; a(k) = type counts of a(k+1)
    val a = new Array[Map[Vector[String], Long]](n + 1)
    a(n) = an.toMap
    for (k <- n - 1 to 1 by -1)
      a(k) = a(k + 1).keySet.groupBy(_.takeRight(k)).map { case (s, g) => s -> g.size.toLong }
    val d = new Array[Map[Vector[String], (Long, Long)]](n + 1)
    for (k <- 2 to n)
      d(k) = a(k).groupBy(_._1.dropRight(1))
        .map { case (c, m) => c -> ((m.values.sum, m.size.toLong)) }
    val den1 = a(1).values.sum
    def q(k: Int, sub: Vector[String]): Long =
      if (k == 1) math.max(a(1).getOrElse(sub, 0L), 1L) * Q / den1
      else a(k).get(sub) match {
        case Some(c) =>
          val (den, fan) = d(k)(sub.dropRight(1))
          ((4 * c - 3) * Q) / (4 * den) + (3 * fan * q(k - 1, sub.tail)) / (4 * den)
        case None => d(k).get(sub.dropRight(1)) match {
          case Some((den, fan)) => (3 * fan * q(k - 1, sub.tail)) / (4 * den)
          case None => q(k - 1, sub.tail)
        }
      }
    docs.flatMap { case (id, t, _) =>
      val gs = grams(t)
      if (gs.isEmpty) None
      else {
        val qs = gs.map(g => q(n, g))
        val back = gs.count(g => !a(n).contains(g)).toLong
        Some(id -> ((gs.size.toLong, back,
          qs.sum.toDouble / 1048576.0 / gs.size.toDouble)))
      }
    }.toMap
  }

  test("order-n kn ladder: engine == sequential reference at n=3,4,5; n=3 == hand-rolled kn3 (r11)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = Vector("a", "b", "c", "d", "e")
    val langs = Vector("en", "de", "fr")
    def randDoc(maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val corpora: Seq[Seq[(Long, String, String)]] =
      Seq(
        // minimal 5-gram training; docs below every order's gram floor
        Seq((1L, "a b c d e", "en"), (2L, "a b c d", "en"), (3L, "e d c b a e", "de"),
          (4L, "", "fr"), (5L, "c", "en")),
        (1 to 8).map(i => (i.toLong, randDoc(9), "en")),
      ) ++
        (1 to 4).map { c =>
          (1L, "a b c d e a b c", "en") +: (2 to 12).map(i =>
            (i.toLong, randDoc(11), langs(rnd.nextInt(langs.size))))
        }
    corpora.zipWithIndex.foreach { case (docsSeq, ci) =>
      val docs = docsSeq.toDF("doc_id", "text", "lang")
      for (n <- 3 to 5) {
        val got = ext.TextOps.knNScoreOf(docs, n).collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
        val want = refNScores(docsSeq, n)
        assert(got.keySet == want.keySet,
          s"corpus $ci n=$n: scored doc set ${got.keySet} != ${want.keySet}")
        got.foreach { case (id, g) =>
          assert(g == want(id), s"corpus $ci n=$n doc $id: $g != ${want(id)}")
        }
      }
      // the generalization is pinned against the hand-rolled trigram family:
      // same fixed-point, same backoff, bit-for-bit
      val gen3 = ext.TextOps.knNScoreOf(docs, 3).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val hand3 = ext.TextOps.kn3ScoreOf(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(gen3 == hand3, s"corpus $ci: order-n ladder at n=3 diverges from kn3")
    }
  }

  test("kn3 lm: distributed trigram score == sequential reference on random corpora (r10)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e")
    val langs = Vector("en", "de", "fr")
    def randDoc(maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val corpora: Seq[Seq[(Long, String, String)]] =
      // edges: minimal trigram training; two-token docs (no trigrams);
      // unseen-context and unseen-z ladders via non-en-only symbols
      Seq(
        Seq((1L, "a b c", "en"), (2L, "a b", "en"), (3L, "d e d e", "de"), (4L, "", "fr")),
        (1 to 8).map(i => (i.toLong, randDoc(7), "en")),
      ) ++
        (1 to 6).map { c =>
          (1L, "a b c a b", "en") +: (2 to 14).map(i =>
            (i.toLong, randDoc(9), langs(rnd.nextInt(langs.size))))
        }
    corpora.zipWithIndex.foreach { case (docsSeq, ci) =>
      val docs = docsSeq.toDF("doc_id", "text", "lang")
      val got = ext.TextOps.kn3ScoreOf(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val want = ref3Scores(docsSeq)
      assert(got.keySet == want.keySet,
        s"corpus $ci: scored doc set ${got.keySet} != ${want.keySet}")
      got.foreach { case (id, g) =>
        assert(g == want(id), s"corpus $ci doc $id: $g != ${want(id)}")
      }
    }
  }
}
