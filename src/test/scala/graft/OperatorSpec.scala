package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Cumulate, Dedup}

/** Property/behavior tests for the custom operators (SURVEY.md §5: the
  * pieces Spark doesn't give us are the pieces that need real tests).
  */
class OperatorSpec extends AnyFunSuite {

  /** Deterministic hand-rolled property loop (scalatestplus bridge is not
    * in the offline dep cache; plain ScalaCheck Gen is).
    */
  private def forAllSeeded[A](gen: Gen[A], n: Int)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }
  lazy val spark = TestSpark.spark

  // ---- Winnowing kernel: Schleimer guarantee + density (property) ----
  test("winnowing kernel: any shared substring of length >= w+k-1 yields a shared fingerprint") {
    import org.apache.spark.unsafe.types.UTF8String
    val k = 8
    val w = 4
    def fps(s: String): Set[Long] = {
      val arr = graft.functions.WinnowKernel.fingerprints(UTF8String.fromString(s), k, w)
      (0 until arr.numElements()).map(arr.getLong).toSet
    }
    val genCase = for {
      common <- Gen.listOfN(k + w - 1 + 10, Gen.alphaLowerChar).map(_.mkString)
      pre1 <- Gen.listOfN(20, Gen.alphaNumChar).map(_.mkString)
      pre2 <- Gen.listOfN(35, Gen.numChar).map(_.mkString)
      suf1 <- Gen.listOfN(15, Gen.alphaUpperChar).map(_.mkString)
    } yield (s"$pre1$common$suf1", s"$pre2$common")
    forAllSeeded(genCase, 50) { case (doc1, doc2) =>
      val shared = fps(doc1) & fps(doc2)
      assert(shared.nonEmpty, s"guarantee violated for <$doc1> vs <$doc2>")
    }
    // density + boundary behavior on a single doc
    forAllSeeded(Gen.listOfN(60, Gen.alphaLowerChar).map(_.mkString), 30) { s =>
      val f = fps(s)
      assert(f.nonEmpty && f.size <= s.length - k + 1)
      assert(fps(s) == fps(s), "deterministic")
    }
    assert(fps("short").isEmpty, "text shorter than k has no fingerprints")
  }

  // ---- Shingle kernel vs plain-Scala sliding-window oracle ----------
  test("shingle kernel equals tokens.sliding(n) with and without dedup (property)") {
    import org.apache.spark.unsafe.types.UTF8String
    def kernel(s: String, n: Int, distinct: Boolean): Seq[String] = {
      val arr = graft.functions.ShingleKernel.shingles(UTF8String.fromString(s), n, distinct)
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    }
    val genText = for {
      words <- Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e"))
      seps <- Gen.listOfN(words.length + 1, Gen.oneOf(" ", "  ", "\t", " \n "))
    } yield seps.zipAll(words, "", "").map { case (sep, w) => sep + w }.mkString
    forAllSeeded(Gen.zip(genText, Gen.choose(1, 4)), 60) { case (text, n) =>
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val expectRaw =
        if (toks.length < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
      assert(kernel(text, n, distinct = false) == expectRaw, s"raw <$text> n=$n")
      assert(kernel(text, n, distinct = true) == expectRaw.distinct, s"distinct <$text> n=$n")
    }
  }

  // ---- TopKIndices kernel vs sort oracle ----------------------------
  test("topk-indices kernel equals the sort-based oracle, ties to the lower index (property)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def kernel(xs: Seq[Double], k: Int): Seq[Int] = {
      val arr = graft.functions.TopKIndicesKernel.topk(new GenericArrayData(xs.toArray), k)
      (0 until arr.numElements()).map(arr.getInt)
    }
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(-5.0, 5.0).map(v => math.rint(v * 2) / 2)) // coarse → ties
      k <- Gen.choose(1, 6)
    } yield (xs, k)
    forAllSeeded(gen, 60) { case (xs, k) =>
      val expect = xs.zipWithIndex.sortBy { case (v, i) => (-v, i) }
        .take(math.min(k, xs.length)).map(_._2)
      assert(kernel(xs, k) == expect, s"xs=$xs k=$k")
    }
  }

  // ---- AsOfJoin vs naive per-row scan -------------------------------
  test("as-of join matches naive last-at-or-before scan (property)") {
    import spark.implicits._
    val genRows = for {
      n <- Gen.choose(0, 40)
      ks <- Gen.listOfN(n, Gen.choose(0, 4))
      ts <- Gen.listOfN(n, Gen.choose(0L, 50L))
    } yield ks.zip(ts)
    forAllSeeded(Gen.zip(genRows, genRows), 20) { case (lRows, rRows) =>
      // dedup right per (k,t): AsOfJoin contract (keep max rv, mirrored in naive)
      val left = lRows.zipWithIndex.map { case ((k, t), i) => AsOfL(k, t, i) }
      val right = rRows.zipWithIndex.map { case ((k, t), i) => AsOfR(k, t, i) }
        .groupBy(r => (r.k, r.t)).values.map(_.maxBy(_.rv)).toSeq
      val got = AsOfJoin.backward(
        left.toDF(), right.toDF(), Seq("k"), "t", "t", Seq("rv"))
        .collect()
        .map(r => (r.getAs[Int]("k"), r.getAs[Long]("t"), r.getAs[Int]("lv"),
          Option(r.getAs[Any]("rv")).map(_.asInstanceOf[Int])))
        .toSet
      val want = left.map { l =>
        val m = right.filter(r => r.k == l.k && r.t <= l.t)
          .sortBy(r => (r.t, r.rv)).lastOption.map(_.rv)
        (l.k, l.t, l.lv, m)
      }.toSet
      assert(got == want)
    }
  }

  test("forward as-of + tolerance match naive scans (property)") {
    import spark.implicits._
    val genRows = for {
      n <- Gen.choose(0, 30)
      ks <- Gen.listOfN(n, Gen.choose(0, 3))
      ts <- Gen.listOfN(n, Gen.choose(0L, 40L))
    } yield ks.zip(ts)
    forAllSeeded(Gen.zip(genRows, genRows), 15) { case (lRows, rRows) =>
      val left = lRows.zipWithIndex.map { case ((k, t), i) => AsOfL(k, t, i) }
      val right = rRows.zipWithIndex.map { case ((k, t), i) => AsOfR(k, t, i) }
        .groupBy(r => (r.k, r.t)).values.map(_.maxBy(_.rv)).toSeq
      def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Int]("k"), r.getAs[Long]("t"), r.getAs[Int]("lv"),
          Option(r.getAs[Any]("rv")).map(_.asInstanceOf[Int]))).toSet
      // forward: earliest right at-or-after
      val gotF = collect(AsOfJoin.forward(left.toDF(), right.toDF(), Seq("k"), "t", "t", Seq("rv")))
      val wantF = left.map { l =>
        val m = right.filter(r => r.k == l.k && r.t >= l.t).sortBy(_.t).headOption.map(_.rv)
        (l.k, l.t, l.lv, m)
      }.toSet
      assert(gotF == wantF)
      // backward with tolerance 5 (native units)
      val gotT = collect(AsOfJoin.backward(left.toDF(), right.toDF(), Seq("k"), "t", "t",
        Seq("rv"), toleranceMs = 5))
      val wantT = left.map { l =>
        val m = right.filter(r => r.k == l.k && r.t <= l.t && l.t - r.t <= 5)
          .sortBy(_.t).lastOption.map(_.rv)
        (l.k, l.t, l.lv, m)
      }.toSet
      assert(gotT == wantT)
    }
  }

  // ---- Cumulate ------------------------------------------------------
  test("cumulate assigns each row to exactly the step-windows covering it") {
    import spark.implicits._
    val maxMs = 600000L
    val stepMs = 120000L
    val ts = Seq(0L, 1L, 119999L, 120000L, 300000L, 599999L, 600000L, 1234567L)
    val df = ts.map(t => Tuple1(new java.sql.Timestamp(t))).toDF("ts")
    val out = Cumulate.assign(df, "ts", maxMs, stepMs)
      .select(unix_millis(col("ts")).as("em"), unix_millis(col("w_start")).as("ws"),
        unix_millis(col("w_end")).as("we"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ts.foreach { t =>
      val rows = out.filter(_._1 == t)
      val base = (t / maxMs) * maxMs
      val expected = ((t - base) / stepMs + 1 to maxMs / stepMs)
        .map(k => (base, base + k * stepMs)).toSet
      assert(rows.map(r => (r._2, r._3)).toSet == expected, s"ts=$t")
      // every covering window contains the row; none starts after it
      rows.foreach { case (em, ws, we) => assert(ws <= em && em < we) }
    }
  }

  test("cumulate floor-divides pre-epoch rowtimes (div truncation misassigned them)") {
    import spark.implicits._
    val maxMs = 60000L
    val stepMs = 10000L
    // 1969-12-31 23:59:35 → em = -25000; its span is [-60000, 0)
    val df = Seq(Tuple1(new java.sql.Timestamp(-25000L))).toDF("ts")
    val out = Cumulate.assign(df, "ts", maxMs, stepMs)
      .select(unix_millis(col("w_start")).as("ws"), unix_millis(col("w_end")).as("we"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // covering step windows: ends at -20000, -10000, 0 — all containing -25000
    assert(out == Set((-60000L, -20000L), (-60000L, -10000L), (-60000L, 0L)), out.toString)
    out.foreach { case (ws, we) => assert(ws <= -25000L && -25000L < we) }
  }

  // ---- Dedup ---------------------------------------------------------
  test("exact dedup keeps min id and is idempotent") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "b"), (6L, "c"))
      .toDF("id", "txt")
    val out = Dedup.exact(df, Seq("txt"), "id")
      .collect().map(r => (r.getAs[String]("txt"), r.getAs[Long]("keep_id"), r.getAs[Long]("n_dups")))
      .toSet
    assert(out == Set(("a", 1L, 2L), ("b", 3L, 3L), ("c", 6L, 1L)))
    val again = Dedup.exact(
      df.join(Dedup.exact(df, Seq("txt"), "id").select(col("keep_id").as("id")), "id"),
      Seq("txt"), "id")
    assert(again.filter(col("n_dups") > 1).count() == 0)
  }

  test("exact-substring dedup: planted duplicated substrings recalled as exact maximal spans") {
    import spark.implicits._
    // a 12-token sentence planted across documents; every context token
    // is unique so no accidental 4-shingle collides
    val s12 = (1 to 12).map(i => s"dup$i").mkString(" ")
    def u(p: String, k: Int) = (1 to k).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      // doc 1 carries the FIRST occurrence (kept — min (doc_id, pos))
      (1L, u("ua", 5) + " " + s12 + " " + u("ub", 4)),
      // doc 2 repeats it mid-document → one maximal 12-token span
      (2L, u("va", 7) + " " + s12 + " " + u("vb", 6)),
      // doc 3 is clean
      (3L, u("wa", 20)),
      // doc 4 repeats it TWICE with a unique gap → two maximal spans
      (4L, s12 + " " + u("xa", 3) + " " + s12),
      // docs 5 and 6 share a LONGER 15-token run (s12 + 3 extension
      // tokens); doc 5 introduces the extension, doc 6 duplicates all 15
      (5L, u("ya", 2) + " " + s12 + " extra1 extra2 extra3"),
      (6L, u("za", 3) + " " + s12 + " extra1 extra2 extra3 " + u("zb", 2)))
      .toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toList).toMap
    // doc 1: first occurrence everywhere EXCEPT the s12+extra tail it
    // shares with no one — doc 1 introduces s12, so it reports nothing
    assert(!spans.contains(1L), s"doc 1 is the kept first occurrence: $spans")
    // doc 2: exactly the planted 12 tokens at offset 7
    assert(spans(2L) == List((7L, 18L)), s"doc 2 spans: $spans")
    assert(!spans.contains(3L), s"doc 3 is clean: $spans")
    // doc 4: two maximal spans — offsets 0..11 and 15..26
    assert(spans(4L) == List((0L, 11L), (15L, 26L)), s"doc 4 spans: $spans")
    // doc 5 introduces 's12 extra1 extra2 extra3' (first occurrence of
    // the extension shingles) but its s12 core duplicates doc 1 → the
    // span covers s12 only, at offset 2
    assert(spans(5L) == List((2L, 13L)), s"doc 5 spans: $spans")
    // doc 6 duplicates doc 5's full 15-token run → one UNBROKEN maximal
    // span (the suffix-array property: the union of rolling shingles
    // merges into the longest duplicated region), offset 3..17
    assert(spans(6L) == List((3L, 17L)), s"doc 6 spans: $spans")
    // the stats view agrees with the span list and covers clean docs
    val stats = Dedup.exactSubstringStats(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(stats(3L) == ((20L, 0L, 0L, 20L)), s"clean doc stats: $stats")
    assert(stats(4L) == ((27L, 2L, 24L, 3L)), s"doc 4 stats: $stats")
    assert(stats(6L) == ((20L, 1L, 15L, 5L)), s"doc 6 stats: $stats")
    // recall certificate: every planted duplicated token is covered
    assert(stats(2L)._3 == 12L && stats(5L)._3 == 12L,
      s"planted duplicate coverage: $stats")
    // the cutting half: surviving text is exactly the uncovered tokens,
    // and its token count agrees with the stats view for every doc
    val cut = Dedup.cutSubstringSpans(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    assert(cut(4L)._1 == "xa1 xa2 xa3", s"doc 4 cut: ${cut(4L)}")
    assert(cut(2L)._1 == u("va", 7) + " " + u("vb", 6), s"doc 2 cut: ${cut(2L)}")
    assert(cut(1L)._1 == u("ua", 5) + " " + s12 + " " + u("ub", 4),
      s"kept first occurrence must survive intact: ${cut(1L)}")
    assert(cut(3L)._1 == u("wa", 20), s"clean doc must be untouched: ${cut(3L)}")
    stats.foreach { case (id, (_, _, _, kept)) =>
      assert(cut(id)._2 == kept, s"doc $id cut count ${cut(id)._2} != stats $kept")
    }
  }

  test("minhash signatures: identical docs identical, length = numHashes") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "an entirely different set of words with no overlap at all here"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(df, "doc_id", "text", numHashes = 32)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[Long]]("signature").toSeq).toMap
    assert(sigs(1L).length == 32)
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("minhash LSH candidates find exact duplicates, not disjoint docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five six seven eight nine ten eleven"))
      .toDF("doc_id", "text")
    val cands = Dedup.minHashCandidates(df, "doc_id", "text", numHashes = 32, bands = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 3L)) && !cands.contains((2L, 3L)))
  }

  test("simhash: identical docs equal, near-dup closer than disjoint (hamming)") {
    import spark.implicits._
    val base = "spark flink query engine window aggregate join shuffle partition state"
    val df = Seq(
      (1L, base), (2L, base),
      (3L, base.replace("state", "checkpoint")), // 1-token change
      (4L, "totally unrelated corpus about cooking pasta sauce tomatoes basil olive"))
      .toDF("doc_id", "text")
    val hs = Dedup.simHash(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hs(1L) == hs(2L))
    assert(ham(hs(1L), hs(3L)) < ham(hs(1L), hs(4L)))
  }

  // ---- Multiset Aggregator laws -------------------------------------
  test("multiset aggregator equals groupBy-count (merge associativity via partitions)") {
    import spark.implicits._
    val data = (1 to 500).map(i => (i % 7, s"v${i % 5}"))
    val df = data.toDF("g", "v").repartition(8) // force multi-partition merge
    val got = df.groupBy(col("g"))
      .agg(graft.functions.MultisetAgg.column(col("v")).as("ms"))
      .collect().map(r => r.getAs[Int]("g") -> r.getAs[Map[String, Long]]("ms")).toMap
    val want = data.groupBy(_._1).map { case (g, xs) =>
      g -> xs.groupBy(_._2).map { case (v, vs) => v -> vs.size.toLong }
    }
    assert(got == want)
  }
}
