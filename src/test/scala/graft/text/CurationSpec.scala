package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .getOrCreate()

  test("repetition metrics flag degenerate text and pass varied text") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spam spam spam spam spam spam"),       // one bigram repeated 5x
      (1L, "all five bigrams here are unique ok"), // no repeats
      (2L, "one"),                                 // < 2 tokens: no grams
      (3L, "go go stop go go stop go go")          // mixed repeats
    ).toDF("doc_id", "text")
    val m = CurationOps.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(0L).getAs[Double]("top_gram_frac") == 1.0)
    assert(m(0L).getAs[Double]("dup_gram_frac") == 1.0)
    assert(!m(0L).getAs[Boolean]("pass_repetition"))
    assert(m(1L).getAs[Double]("dup_gram_frac") == 0.0)
    assert(m(1L).getAs[Boolean]("pass_repetition"))
    assert(m(2L).getAs[Long]("n_grams") == 0L)
    assert(m(2L).getAs[Boolean]("pass_repetition"))
    // "go go stop go go stop go go": 7 bigrams, "go go" 3x, "go stop" 2x,
    // "stop go" 2x -> top 3/7, dup 7/7
    assert(m(3L).getAs[Long]("n_grams") == 7L)
    assert(m(3L).getAs[Double]("top_gram_frac") == math.rint(3.0 / 7 * 1e4) / 1e4)
    assert(m(3L).getAs[Double]("dup_gram_frac") == 1.0)
  }

  test("contamination finds planted benchmark overlap and nothing else") {
    import spark.implicits._
    val bench = Seq(
      (100L, "the capital of france is paris and the seine flows through")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "trivia dump the capital of france is paris obviously"), // 5-token overlap run
      (1L, "entirely unrelated text about catalyst shuffle planning"),
      (2L, "the capital of france is paris and the seine flows through") // verbatim copy
    ).toDF("doc_id", "text")
    val c = CurationOps.contamination(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(c(2L).getAs[Double]("contamination") == 1.0)
    assert(c(2L).getAs[Boolean]("contaminated"))
    assert(c(1L).getAs[Long]("n_hits") == 0L)
    assert(!c(1L).getAs[Boolean]("contaminated"))
    // doc 0's overlap run "the capital of france is paris" yields 4
    // shared trigrams (the capital of / capital of france / of france
    // is / france is paris)
    assert(c(0L).getAs[Long]("n_hits") == 4L)
  }

  test("bloom-prefiltered contamination equals the exact path's hit rows") {
    import spark.implicits._
    val bench = Seq(
      (100L, "the capital of france is paris and the seine flows through")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "trivia dump the capital of france is paris obviously"),
      (1L, "entirely unrelated text about catalyst shuffle planning"),
      (2L, "the capital of france is paris and the seine flows through")
    ).toDF("doc_id", "text")
    val exact = CurationOps.contamination(corpus, bench, "doc_id", "text", n = 3)
      .filter(col("n_hits") > 0)
    val bloom = CurationOps.contaminationBloom(corpus, bench, "doc_id", "text",
      n = 3, expectedGrams = 64)
    // No false negatives: every exact hit row appears, bit-identical.
    assert(bloom.exceptAll(exact).count() == 0 &&
      exact.exceptAll(bloom).count() == 0)
    assert(bloom.count() == 2)
  }

  test("dupSpans finds planted shared runs, merges islands, skips short docs") {
    import spark.implicits._
    // Docs 0 and 1 share an 8-token run -> 4 consecutive dup 5-gram
    // positions each; doc 2 is unrelated; doc 3 is under 5 tokens.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, s"unique0 prefix0 $shared suffix0"),
      (1L, s"other1 lead1 mid1 $shared"),
      (2L, "nothing here matches anything else at all today"),
      (3L, "too short")
    ).toDF("doc_id", "text")
    val m = CurationOps.dupSpans(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 0: 11 tokens -> 7 positions; dup = positions 2..5 (4-run).
    assert(m(0L).getAs[Long]("n_grams") == 7L)
    assert(m(0L).getAs[Long]("n_dup") == 4L)
    assert(m(0L).getAs[Long]("max_run") == 4L)
    assert(m(0L).getAs[Double]("dup_frac") == math.rint(4.0 / 7 * 1e4) / 1e4)
    // doc 1: 11 tokens -> 7 positions; dup = last 4 positions.
    assert(m(1L).getAs[Long]("n_dup") == 4L)
    assert(m(1L).getAs[Long]("max_run") == 4L)
    assert(m(2L).getAs[Long]("n_dup") == 0L)
    assert(m(2L).getAs[Double]("dup_frac") == 0.0)
    assert(m(3L).getAs[Long]("n_grams") == 0L)
    assert(m(3L).getAs[Double]("dup_frac") == 0.0)
  }

  test("dupSpans merges OVERLAPPING runs shared with different docs") {
    import spark.implicits._
    // Doc 0 (12 tokens, 8 gram positions): positions 0..3 duplicate
    // against doc 1 (= tokens 0..7) and positions 4..7 against doc 2
    // (= tokens 4..11). The two runs touch at the position boundary —
    // the pos − row_number island arithmetic must merge them into ONE
    // 8-long island even though no single partner doc shares it all.
    val w = (0 until 12).map(i => s"w$i")
    val docs = Seq(
      (0L, w.mkString(" ")),
      (1L, w.take(8).mkString(" ")),
      (2L, w.drop(4).mkString(" "))
    ).toDF("doc_id", "text")
    val m = CurationOps.dupSpans(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(0L).getAs[Long]("n_grams") == 8L)
    assert(m(0L).getAs[Long]("n_dup") == 8L)
    assert(m(0L).getAs[Long]("max_run") == 8L)
    assert(m(0L).getAs[Double]("dup_frac") == 1.0)
    assert(m(1L).getAs[Long]("n_dup") == 4L &&
      m(1L).getAs[Long]("max_run") == 4L)
    assert(m(2L).getAs[Long]("n_dup") == 4L &&
      m(2L).getAs[Long]("max_run") == 4L)
  }

  test("dupSpans keeps SEPARATED equal-length islands distinct (max_run tie)") {
    import spark.implicits._
    // Doc 0: 8 shared tokens + 5 unique gap tokens + 8 shared tokens
    // (21 tokens, 17 positions). Grams straddling the gap contain a
    // doc-unique token, so the islands are 0..3 and 13..16 — two
    // separated 4-runs. max_run must stay 4 (a merge bug would report
    // 8), n_dup must be exactly 8.
    val a = (0 until 8).map(i => s"a$i")
    val b = (0 until 8).map(i => s"b$i")
    val gap = (0 until 5).map(i => s"gap0u$i")
    val docs = Seq(
      (0L, (a ++ gap ++ b).mkString(" ")),
      (1L, a.mkString(" ")),
      (2L, b.mkString(" "))
    ).toDF("doc_id", "text")
    val m = CurationOps.dupSpans(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(0L).getAs[Long]("n_grams") == 17L)
    assert(m(0L).getAs[Long]("n_dup") == 8L)
    assert(m(0L).getAs[Long]("max_run") == 4L)
  }

  test("source-mix entropy: ln(2) for a 50/50 source, 0 for single-lang") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x", "en", "a"), (1L, "x", "de", "a"),
      (2L, "x", "en", "b"), (3L, "x", "en", "b")
    ).toDF("doc_id", "text", "lang", "source")
    val m = CurationOps.sourceMix(docs, "source", "lang")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_langs"),
          r.getAs[Double]("entropy"))).toMap
    assert(m("a") == ((2L, 2L, math.rint(math.log(2) * 1e6) / 1e6)))
    assert(m("b") == ((2L, 1L, 0.0)))
  }

  test("mix apply bounds copies by floor/ceil of each stratum's rate") {
    import spark.implicits._
    val docs = ((0L to 15L).map(i => (i, s"doc $i", "big")) :+
      ((16L, "rare doc", "small"))).toDF("doc_id", "text", "source")
    val rates = CurationOps.temperatureMix(docs, "source")
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("sampling_rate")).toMap
    // alpha=0.5 upsamples the rare stratum, downsamples the big one.
    assert(rates("small") > 1.0 && rates("big") < 1.0)
    val m = CurationOps.mixApply(docs, "source", "doc_id").collect()
    m.foreach { r =>
      val rate = rates(r.getAs[String]("source"))
      val c = r.getAs[Long]("n_copies")
      assert(c == math.floor(rate).toLong || c == math.ceil(rate).toLong,
        s"copies $c outside [floor, ceil] of rate $rate")
    }
    assert(m.length == 17)
  }

  test("scrub counts and redacts emails and digit runs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "contact alice.smith+dev@example.co.uk or bob@test.org now"),
      (1L, "order 12345 shipped 2024 items 7"),
      (2L, "no sensitive content here")
    ).toDF("doc_id", "text")
    val m = CurationOps.scrub(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(0L).getAs[Long]("n_emails") == 2L)
    assert(m(1L).getAs[Long]("n_numbers") == 3L)
    assert(m(2L).getAs[Long]("n_emails") == 0L &&
      m(2L).getAs[Long]("n_numbers") == 0L)
    // redacted fingerprints: doc 1 must hash the <NUM>-substituted text,
    // doc 2 the original
    val expected1 = java.security.MessageDigest.getInstance("MD5")
      .digest("order <NUM> shipped <NUM> items <NUM>".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(m(1L).getAs[String]("redacted_fp") == expected1)
  }

  test("packing and splits conserve docs and tokens per stratum (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      val lang = Seq("en", "de", "zh")(rnd.nextInt(3))
      val n = 1 + rnd.nextInt(900) // docs bigger than the budget included
      (i.toLong, lang, Seq.fill(n)("tok").mkString(" "))
    }
    val docs = rows.toDF("doc_id", "lang", "text")
    val expDocs = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expToks = rows.groupBy(_._2).view
      .mapValues(_.map(_._3.split(" ").length.toLong).sum).toMap

    val packed = CurationOps
      .packSequences(docs, "doc_id", "lang", "text", budget = 512).collect()
    assert(packed.forall(_.getAs[Long]("bin") >= 0L))
    val packDocs = packed.groupBy(_.getAs[String]("lang")).view
      .mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val packToks = packed.groupBy(_.getAs[String]("lang")).view
      .mapValues(_.map(_.getAs[Long]("tokens")).sum).toMap
    assert(packDocs == expDocs, s"docs not conserved: $packDocs vs $expDocs")
    assert(packToks == expToks, s"tokens not conserved: $packToks vs $expToks")

    val split = CurationOps.splitAssign(docs, "doc_id", "lang").collect()
    assert(split.map(_.getAs[Long]("n_docs")).sum == 400L)
    assert(split.forall(r =>
      Set("train", "val", "test")(r.getAs[String]("split"))))
  }

  test("repetition metrics equal a local reference on random texts") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vocab = Seq("a", "b", "c", "dd", "ee")
    val rows = (0 until 120).map { i =>
      (i.toLong,
        Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val out = CurationOps
      .repetitionMetrics(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    rows.foreach { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val grams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
      val n = grams.size.toLong
      val top = if (n == 0) 0.0 else counts.values.max.toDouble / n
      val dup = if (n == 0) 0.0
        else counts.values.filter(_ > 1).sum.toDouble / n
      assert(out(id).getAs[Long]("n_grams") == n, s"doc $id n_grams")
      assert(out(id).getAs[Double]("top_gram_frac") ==
        math.rint(top * 1e4) / 1e4, s"doc $id top")
      assert(out(id).getAs[Double]("dup_gram_frac") ==
        math.rint(dup * 1e4) / 1e4, s"doc $id dup")
    }
  }

  test("contamination equals brute-force set overlap on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vocab = Seq("w1", "w2", "w3", "w4", "w5", "w6")
    def txt() = Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")
    val bench = (100 until 110).map(i => (i.toLong, txt()))
    val corpus = (0 until 80).map(i => (i.toLong, txt()))
    def grams(s: String): Set[String] = {
      val t = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (t.length < 3) Set(t.mkString(" "))
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val benchSet = bench.flatMap(b => grams(b._2)).toSet
    val out = CurationOps.contamination(corpus.toDF("doc_id", "text"),
        bench.toDF("doc_id", "text"), "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    corpus.foreach { case (id, text) =>
      val g = grams(text)
      assert(out(id).getAs[Long]("n_grams") == g.size.toLong, s"doc $id n")
      assert(out(id).getAs[Long]("n_hits") ==
        g.count(benchSet.contains).toLong, s"doc $id hits")
    }
  }

  test("scrub counts match Java regex and redaction is idempotent (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha", "beta", "x9y", "12", "a@b.co", "n0pe",
      "user.name@mail-host.org", "7seas", "plain")
    val rows = (0 until 60).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size)))
        .mkString(" "))
    }
    val docs = rows.toDF("doc_id", "text")
    val out = CurationOps.scrub(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val email = java.util.regex.Pattern.compile(CurationOps.emailPattern)
    val num = java.util.regex.Pattern.compile(CurationOps.numberPattern)
    def countOf(p: java.util.regex.Pattern, s: String): Long = {
      val m = p.matcher(s); var c = 0L; while (m.find()) c += 1; c
    }
    val redactedRows = rows.map { case (id, text) =>
      assert(out(id).getAs[Long]("n_emails") == countOf(email, text))
      assert(out(id).getAs[Long]("n_numbers") == countOf(num, text))
      (id, num.matcher(email.matcher(text).replaceAll("<EMAIL>"))
        .replaceAll("<NUM>"))
    }
    // scrubbing already-redacted text is a no-op: zero matches, stable fp
    val again = CurationOps.scrub(redactedRows.toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    redactedRows.foreach { case (id, red) =>
      assert(again(id).getAs[Long]("n_emails") == 0L)
      assert(again(id).getAs[Long]("n_numbers") == 0L)
      assert(again(id).getAs[String]("redacted_fp") ==
        out(id).getAs[String]("redacted_fp"))
    }
  }

  test("temperature mix flattens toward the tail and conserves mass") {
    import spark.implicits._
    val docs = (0 until 90).map(i => (i.toLong, "x", "big")) ++
      (0 until 10).map(i => (100L + i, "x", "small"))
    val df = docs.toDF("doc_id", "text", "source")
    val m = CurationOps.temperatureMix(df, "source", alpha = 0.5)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // sqrt(90)/(sqrt(90)+sqrt(10)) = 0.75, sqrt(10)/... = 0.25
    assert(m("big").getAs[Double]("weight") == 0.75)
    assert(m("small").getAs[Double]("weight") == 0.25)
    // tail stratum up-weighted above its natural share, head below
    assert(m("small").getAs[Double]("sampling_rate") > 1.0)
    assert(m("big").getAs[Double]("sampling_rate") < 1.0)
    // weights sum to 1
    val wSum = m.values.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-9)
  }

  test("sourceDrift computes the exact two-sample KS statistic") {
    import spark.implicits._
    def toks(n: Int) = Seq.fill(n)("w").mkString(" ")
    // A: four 5-token docs; B: four 10-token docs; C: one of each.
    // KS(A vs rest): gap at v=5 is |1 − 1/6| = 5/6; KS(B vs rest)
    // symmetric; C matches its rest exactly (0.5/0.5 at v=5).
    val docs = (
      (0 until 4).map(i => (i.toLong, "A", toks(5))) ++
      (4 until 8).map(i => (i.toLong, "B", toks(10))) ++
      Seq((8L, "C", toks(5)), (9L, "C", toks(10)))
    ).toDF("doc_id", "source", "text")
    val m = CurationOps.sourceDrift(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("ks_stat")))).toMap
    assert(m("A") == ((4L, math.rint(5.0 / 6 * 1e6) / 1e6)))
    assert(m("B") == ((4L, math.rint(5.0 / 6 * 1e6) / 1e6)))
    assert(m("C") == ((2L, 0.0)))
  }

  test("null-text docs are excluded from drift and budget fill") {
    import spark.implicits._
    def toks(n: Int) = Seq.fill(n)("w").mkString(" ")
    val base = Seq((0L, "A", toks(5)), (1L, "A", toks(5)),
      (2L, "B", toks(10)), (3L, "B", toks(10)))
    val withNulls = base ++ Seq((4L, "A", null.asInstanceOf[String]),
      (5L, "B", null.asInstanceOf[String]))
    // drift: identical KS with and without the null rows
    def drift(rows: Seq[(Long, String, String)]) =
      CurationOps.sourceDrift(rows.toDF("doc_id", "source", "text"),
          "source", "text")
        .collect().map(r => (r.getString(0), r.getAs[Long]("n_docs"),
          r.getAs[Double]("ks_stat"))).toSet
    assert(drift(withNulls) == drift(base))
    // budget fill: identical keeps with and without the null rows
    def fill(rows: Seq[(Long, String, String)]) =
      CurationOps.budgetFill(rows.toDF("doc_id", "lang", "text"),
          "doc_id", "lang", "text", budget = 7L)
        .collect().map(r => (r.getString(0), r.getAs[Long]("n_kept"),
          r.getAs[Long]("tokens_kept"))).toSet
    assert(fill(withNulls) == fill(base))
  }

  test("budgetFill takes quality-desc then id order until the token budget") {
    import spark.implicits._
    val good1 = "the quick brown fox jumps over the lazy dog again and again today"
    val good2 = "a similar clean sentence with the usual stopwords and plain words here"
    val good3 = "the steady morning light falls over the quiet valley and the " +
      "distant hills stay calm for another while now"
    val docs = Seq(
      (0L, "a", good1), (1L, "a", good2), (2L, "a", "z!"),
      (10L, "b", "y!"), (11L, "b", good1 + " extra"), (12L, "b", good3)
    ).toDF("doc_id", "lang", "text")
    // Self-validating fixture: derive each doc's (quality, tokens) from
    // the same kernel the operator uses, simulate the greedy fill
    // locally, and compare the distributed result against it.
    val comps = docs.select(col("doc_id"), col("lang"),
        TextFunctions.qualityComponents(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getStruct(2).getAs[Long]("n_tokens"),
        r.getStruct(2).getAs[Double]("quality_score")))
    // the fixture must exercise a real quality split in stratum b
    assert(comps.filter(_._2 == "b").map(_._4).distinct.size > 1)
    val budget = 25L
    val expected = comps.groupBy(_._2).map { case (lang, rows) =>
      val ordered = rows.sortBy(r => (-r._4, r._1))
      val pres = ordered.scanLeft(0L)(_ + _._3)
      val kept = ordered.zip(pres).filter(_._2 < budget).map(_._1)
      lang -> ((kept.size.toLong, kept.map(_._3).sum, kept.map(_._4).min))
    }
    // something must actually be excluded for the test to mean anything
    assert(expected.values.map(_._1).sum < comps.length)
    val out = CurationOps.budgetFill(docs, "doc_id", "lang", "text", budget)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_kept"), r.getAs[Long]("tokens_kept"),
          r.getAs[Double]("cutoff_quality")))).toMap
    assert(out == expected, s"got $out expected $expected")
    // low-quality doc 10 must lose to higher-quality, larger-id 11/12
    assert(out("b")._3 > 0.0)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dupSpansChars finds planted shared char runs at window granularity") {
    import spark.implicits._
    // Docs 0 and 1 share a 40-char run; with k=30 the duplicated window
    // starts are exactly those fully inside the run: 11 per doc.
    val shared = "0123456789abcdefghijklmnopqrstuvwxyzABCD" // 40 chars
    val docs = Seq(
      (0L, "X" * 10 + shared + "Y" * 10), // run at [10,50), len 60
      (1L, "P" * 7 + shared + "Q" * 13),  // run at [7,47), len 60
      (2L, "k" * 29)                      // under k chars: no windows
    ).toDF("doc_id", "text")
    val m = CurationOps.dupSpansChars(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(0L).getAs[Long]("n_grams") == 31L)
    assert(m(0L).getAs[Long]("n_dup") == 11L)
    assert(m(0L).getAs[Long]("max_run") == 11L)
    assert(m(1L).getAs[Long]("n_dup") == 11L)
    assert(m(1L).getAs[Long]("max_run") == 11L)
    assert(m(2L).getAs[Long]("n_grams") == 0L)
    assert(m(2L).getAs[Double]("dup_frac") == 0.0)
  }

  test("spanCut unions covered chars, splits far islands, merges touching ones") {
    import spark.implicits._
    val runA = "0123456789abcdefghijklmnopqrstuvwxyzABCD"     // 40 chars
    val runB = "ZYXWVUTSRQPONMLKJIHGFEDCBA9876543210zyxw"     // 40 chars
    // G has 30 distinct chars, so its rotations inside G+G are unique
    // and only the full G window duplicates (starts 0 and 30 — exactly
    // k apart: contiguous coverage, ONE island spanning the whole doc).
    val g = "abcdefghijklmnopqrstuvwxyz!@#$"                  // 30 chars
    // Gap fillers carry an embedded counter so no 30-char window inside
    // them repeats (a single-char run of length ≥ k would self-
    // duplicate its interior windows and bridge the islands).
    val fill2 = (0 until 17).map(i => f"b$i%02d").mkString    // 51 chars
    val fill3 = (0 until 16).map(i => f"e$i%02d").mkString    // 48 chars
    val docs = Seq(
      (0L, "X" * 10 + runA + "Y" * 10),                  // covered [10,50)
      (1L, "P" * 7 + runA + "Q" * 13),                   // covered [7,47)
      (2L, "A" * 5 + runA + fill2 + runB + "C" * 5),     // two far islands
      (3L, "D" * 8 + runA + fill3 + runB + "F" * 5),     // two far islands
      (4L, g + g),                                       // touching: merge
      (5L, "m" * 29)                                     // no windows
    ).toDF("doc_id", "text")
    val m = CurationOps.spanCut(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(0L).getAs[Long]("n_chars") == 60L)
    assert(m(0L).getAs[Long]("covered_chars") == 40L)
    assert(m(0L).getAs[Long]("n_islands") == 1L)
    assert(m(0L).getAs[Double]("cut_frac") == math.rint(40.0 / 60 * 1e4) / 1e4)
    assert(m(1L).getAs[Long]("covered_chars") == 40L)
    // doc 2: runA dup starts 5..15, runB dup starts 96..106 (gap 81 > k)
    assert(m(2L).getAs[Long]("covered_chars") == 80L)
    assert(m(2L).getAs[Long]("n_islands") == 2L)
    assert(m(3L).getAs[Long]("covered_chars") == 80L)
    assert(m(3L).getAs[Long]("n_islands") == 2L)
    // doc 4: G occurs at starts 0 and 30 — exactly k apart, one island
    // covering all 60 chars
    assert(m(4L).getAs[Long]("covered_chars") == 60L)
    assert(m(4L).getAs[Long]("n_islands") == 1L)
    assert(m(4L).getAs[Double]("cut_frac") == 1.0)
    assert(m(5L).getAs[Long]("covered_chars") == 0L)
    assert(m(5L).getAs[Long]("n_islands") == 0L)
  }

  test("materialize = false span paths equal the materialized results") {
    import spark.implicits._
    // The 100 TB storage story for the span kernels is the recompute
    // path (materialize = false: no localCheckpoint of the positional
    // frame, the gram-generation subtree runs once per join side). It
    // must be output-IDENTICAL to the default — in particular the
    // re-executed generate subtree must survive optimizer rewrites
    // (InferFiltersFromGenerate re-inlining is the known hazard class)
    // on both copies. Fixtures reuse the richest planted shapes above.
    val a = (0 until 8).map(i => s"a$i")
    val b = (0 until 8).map(i => s"b$i")
    val gap = (0 until 5).map(i => s"gap0u$i")
    val wordDocs = Seq(
      (0L, (a ++ gap ++ b).mkString(" ")),
      (1L, a.mkString(" ")),
      (2L, b.mkString(" ")),
      (3L, "too short")
    ).toDF("doc_id", "text")
    val runA = "0123456789abcdefghijklmnopqrstuvwxyzABCD"
    val runB = "ZYXWVUTSRQPONMLKJIHGFEDCBA9876543210zyxw"
    val g = "abcdefghijklmnopqrstuvwxyz!@#$"
    val fill2 = (0 until 17).map(i => f"b$i%02d").mkString
    val charDocs = Seq(
      (0L, "X" * 10 + runA + "Y" * 10),
      (1L, "P" * 7 + runA + "Q" * 13),
      (2L, "A" * 5 + runA + fill2 + runB + "C" * 5),
      (3L, g + g),
      (4L, "m" * 29)
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(rows(CurationOps.dupSpans(wordDocs, "doc_id", "text",
        materialize = false)).sameElements(
      rows(CurationOps.dupSpans(wordDocs, "doc_id", "text"))))
    assert(rows(CurationOps.dupSpansChars(charDocs, "doc_id", "text",
        materialize = false)).sameElements(
      rows(CurationOps.dupSpansChars(charDocs, "doc_id", "text"))))
    assert(rows(CurationOps.spanCut(charDocs, "doc_id", "text",
        materialize = false)).sameElements(
      rows(CurationOps.spanCut(charDocs, "doc_id", "text"))))
  }

  test("null-id docs keep their repetition and span metrics (no fail-open)") {
    import spark.implicits._
    // Before round 9 the spine join was a plain equi-join on the id,
    // so a null-id doc's metrics aggregated under the null key but
    // never joined back — zero-filled metrics, quality gate passed
    // regardless of content. The null-safe join closes the fail-open.
    val docs = Seq(
      (Option.empty[Long], "x y x y x y"),
      (Some(1L), "a b c d e f")).toDF("doc_id", "text")
    val rep = CurationOps.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r =>
        Option(r.get(0)) -> r.getAs[Boolean]("pass_repetition")).toMap
    assert(!rep(None), "boilerplate null-id doc must FAIL the gate")
    assert(rep(Some(1L)))
    val spans = CurationOps.dupSpans(docs, "doc_id", "text", n = 2,
        materialize = false)
      .collect().map(r => Option(r.get(0)) -> r.getAs[Long]("n_dup")).toMap
    assert(spans(None) > 0L, "null-id doc's duplicated grams must report")
  }

  test("scrub counts only digit runs the redaction actually replaces") {
    import spark.implicits._
    val docs = Seq((1L, "reach bob42@mail.com or 7 cats"))
      .toDF("doc_id", "text")
    val r = CurationOps.scrub(docs, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_emails") == 1L)
    // the 42 vanishes WITH the email; only the standalone 7 is a <NUM>
    assert(r.getAs[Long]("n_numbers") == 1L)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("reach <EMAIL> or <NUM> cats".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getAs[String]("redacted_fp") == expected)
  }

  test("a null-id doc cannot jump the quality-descending budget fill") {
    import spark.implicits._
    // Worst-quality null-id filler vs a clean doc: with the pre-r9
    // NULL bucket (sorted before every quality level) the filler
    // consumed the whole budget first. It must now fill within its
    // own (worst) level, i.e. after the good doc.
    val good = (1 to 40).map(i => "meaningful sentence number " + i)
      .mkString(". ")
    val junk = Seq.fill(60)("zzz !!!! ???? @@@@").mkString(" ")
    val docs = Seq((Some(5L), "en", good), (Option.empty[Long], "en", junk))
      .toDF("doc_id", "lang", "text")
    val out = CurationOps.budgetFill(docs, "doc_id", "lang", "text",
        budget = 150L)
      .collect().head
    // Only the good doc starts inside the 150-token budget; if the
    // null-id junk had jumped the order, the kept set would be the
    // junk doc and cutoff_quality would sit in the junk band.
    assert(out.getAs[Long]("n_kept") == 1L)
    val goodQuality = CurationOps.budgetFill(
        docs.filter(col("doc_id").isNotNull), "doc_id", "lang", "text",
        budget = 150L)
      .collect().head.getAs[Double]("cutoff_quality")
    assert(out.getAs[Double]("cutoff_quality") == goodQuality,
      "the kept doc must be the good one, not the null-id junk")
  }

  test("numeric null id takes slot 0, not the max-id bin") {
    import spark.implicits._
    // least() SKIPS nulls, so without an explicit isNull branch a null
    // id propagated to least(null, 255) = 255 → bin 256, sharing the
    // max-id bucket and sorting LAST — the inverse of the documented
    // nulls-first slot 0 (matching the ranking window's tie-break).
    val docs = Seq(Option.empty[Long], Some(0L), Some(50L), Some(100L))
      .toDF("doc_id")
    val bkt = CurationOps.idRangeBucket(docs, "doc_id", numericId = true)
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        r.getAs[Int]("__bkt")).toMap
    assert(bkt(None) == 0, "null id must take the dedicated slot 0")
    assert(bkt(Some(0L)) == 1, "min id maps to the first range bin")
    assert(bkt(Some(100L)) == 256, "max id maps to the last range bin")
    assert(bkt(Some(50L)) > 1 && bkt(Some(50L)) < 256)
    // All-null frame: every row degrades to slot 0 via the same branch
    // (min/max are null but the arithmetic is never reached).
    val allNull = Seq(Option.empty[Long], Option.empty[Long]).toDF("doc_id")
    val nb = CurationOps.idRangeBucket(allNull, "doc_id", numericId = true)
      .select("__bkt").collect().map(_.getInt(0)).toSeq
    assert(nb == Seq(0, 0))
    // With a leading level the null slot stays FIRST within its level:
    // level*257 + 0 < level*257 + anyBin.
    val lv = CurationOps.idRangeBucket(docs.withColumn("lvl", lit(2)),
        "doc_id", numericId = true, level = Some(col("lvl")))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        r.getAs[Int]("__bkt")).toMap
    assert(lv(None) == 2 * 257)
    assert(lv(Some(0L)) == 2 * 257 + 1 && lv(Some(100L)) == 2 * 257 + 256)
  }

  test("span kernels are ANSI-safe (Spark 4 default mode)") {
    import spark.implicits._
    // The harness sessions run permissive mode for DuckDB parity, but
    // Spark 4 defaults ANSI on — the substring/sequence arithmetic in
    // the gram generators must not rely on permissive semantics. The
    // short-doc guards (sequence bound < 1, null text) are the risk
    // spots.
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val docs = Seq(
        (0L, "the quick brown fox jumps over the lazy dog the quick brown"),
        (1L, "tiny"), (2L, ""), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text")
      val spans = CurationOps.dupSpans(docs, "doc_id", "text",
          materialize = false).collect()
      assert(spans.length == 4)
      val chars = CurationOps.dupSpansChars(docs, "doc_id", "text", k = 10,
          materialize = false).collect()
      assert(chars.length == 4)
      val cut = CurationOps.spanCut(docs, "doc_id", "text", k = 10,
          materialize = false).collect()
      assert(cut.length == 4)
    } finally spark.conf.set("spark.sql.ansi.enabled", "false")
  }

  test("paragraphDedup keeps the global first occurrence and reassembles in order") {
    import spark.implicits._
    val docs = Seq(
      (0L, "common intro\nunique zero\nshared tail"),
      (1L, "common intro\nunique one\nshared tail"),
      (2L, "common intro\nshared tail"),      // nothing survives
      (3L, "dup para\ndup para\ndup para"),   // in-doc dups: keep pos 0
      (4L, "z last\ncommon intro\na first")   // survivors keep doc order
    ).toDF("doc_id", "text")
    val m = CurationOps.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(0L).getAs[Long]("n_paras") == 3L)
    assert(m(0L).getAs[Long]("n_kept") == 3L)
    assert(m(0L).getAs[String]("kept_fp") ==
      md5Hex("common intro\nunique zero\nshared tail"))
    assert(m(1L).getAs[Long]("n_kept") == 1L)
    assert(m(1L).getAs[String]("kept_fp") == md5Hex("unique one"))
    assert(m(2L).getAs[Long]("n_kept") == 0L)
    assert(m(2L).getAs[String]("kept_fp") == md5Hex(""))
    assert(m(3L).getAs[Long]("n_paras") == 3L)
    assert(m(3L).getAs[Long]("n_kept") == 1L)
    assert(m(3L).getAs[String]("kept_fp") == md5Hex("dup para"))
    assert(m(4L).getAs[Long]("n_kept") == 2L)
    assert(m(4L).getAs[String]("kept_fp") == md5Hex("z last\na first"))
  }
}
