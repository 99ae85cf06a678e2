package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class CorpusSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 120 docs over 3 strata with deterministic token counts 1..40. */
  private def corpus: DataFrame = {
    val s = spark
    import s.implicits._
    (0L until 120L).toSeq.map { i =>
      val lang = Seq("en", "de", "zh")((i % 3).toInt)
      (i, lang, (i % 40 + 1).toInt)
    }.toDF("doc_id", "lang", "nt")
  }

  // ---- sampleStratified ----

  test("stratified sample: exactly k per stratum, ranks dense from 1") {
    val out = Corpus.sampleStratified(corpus, "lang", "doc_id", 7)
    val perStratum = out.groupBy("lang").agg(
      count(lit(1)).as("n"), min("sample_rank").as("lo"), max("sample_rank").as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(perStratum.length == 3)
    perStratum.foreach { case (_, n, lo, hi) => assert(n == 7 && lo == 1L && hi == 7L) }
  }

  test("stratified sample: k beyond stratum size returns the whole stratum") {
    val out = Corpus.sampleStratified(corpus.filter(col("doc_id") < 5), "lang", "doc_id", 100)
    assert(out.count() == 5)
  }

  test("stratified sample is partition-independent") {
    val base = Corpus.sampleStratified(corpus, "lang", "doc_id", 7)
      .select("doc_id", "lang", "sample_rank").collect().map(_.toSeq).toSet
    val shuffled = Corpus.sampleStratified(corpus.repartition(13), "lang", "doc_id", 7)
      .select("doc_id", "lang", "sample_rank").collect().map(_.toSeq).toSet
    val single = Corpus.sampleStratified(corpus.coalesce(1), "lang", "doc_id", 7)
      .select("doc_id", "lang", "sample_rank").collect().map(_.toSeq).toSet
    assert(base == shuffled && base == single)
  }

  test("stratified sample plan keeps a partial top-k below the stratum exchange") {
    // the rank<=k filter must compile to WindowGroupLimit so a mega-stratum
    // never materializes more than k rows per mapper (same shape the
    // politeness top-k is pinned to)
    val plan = Corpus.sampleStratified(corpus, "lang", "doc_id", 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  // ---- packShards ----

  /** Sequential reference: exclusive prefix sum over doc_id order. */
  private def packSeq(rows: Seq[(Long, Int)], budget: Long): Map[Long, (Long, Long)] = {
    var run = 0L
    rows.sortBy(_._1).map { case (id, t) =>
      val shard = run / budget
      run += t
      id -> ((t.toLong, shard))
    }.toMap
  }

  test("packShards matches the sequential prefix-sum packing") {
    val expected = packSeq((0L until 120L).map(i => (i, (i % 40 + 1).toInt)), 100L)
    val got = Corpus.packShards(corpus, "doc_id", "nt", 100L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("packShards is partition-independent") {
    val base = Corpus.packShards(corpus, "doc_id", "nt", 100L)
      .collect().map(_.toSeq).toSet
    val shuffled = Corpus.packShards(corpus.repartition(17), "doc_id", "nt", 100L)
      .collect().map(_.toSeq).toSet
    assert(base == shuffled)
  }

  test("packShards: every shard total is within one doc of the budget") {
    val budget = 100L
    val totals = Corpus.packShards(corpus, "doc_id", "nt", budget)
      .groupBy("shard").agg(sum("n_tokens").as("total"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxShard = totals.keys.max
    // shards are contiguous 0..max; all but the last hold >= budget - maxDoc
    assert(totals.keySet == (0L to maxShard).toSet)
    val maxDoc = 40L
    totals.foreach { case (s, tot) =>
      assert(tot < budget + maxDoc, s"shard $s overfull: $tot")
      if (s < maxShard) assert(tot > budget - maxDoc, s"shard $s underfull: $tot")
    }
  }

  test("packShards treats null token counts as zero") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, Some(5)), (1L, None), (2L, Some(7))).toDF("doc_id", "nt")
    val got = Corpus.packShards(df, "doc_id", "nt", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 5L, 0L), (1L, 0L, 0L), (2L, 7L, 0L)))
  }

  // ---- packSequences ----

  /** Docs with deterministic token content; includes empty, whitespace-only
   *  and a multi-sequence-spanning doc. */
  private def seqCorpus: Seq[(Long, String)] =
    (0L until 40L).map { id =>
      val n =
        if (id == 7) 0 // empty doc: emits nothing
        else if (id == 13) -1 // whitespace-only marker
        else if (id == 20) 57 // spans several 16-token sequences
        else ((id * 7) % 11 + 1).toInt
      val text =
        if (n == -1) "   \t  "
        else (0 until n).map(k => s"t${id}x$k").mkString(" ")
      (id, text)
    }

  /** Sequential concat-and-chunk reference. */
  private def packSequencesRef(docs: Seq[(Long, String)], L: Int): Set[(Long, Long, Long, String)] = {
    var run = 0L
    val out = Set.newBuilder[(Long, Long, Long, String)]
    docs.sortBy(_._1).foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val n = toks.length.toLong
      if (n > 0) {
        (run / L to (run + n - 1) / L).foreach { sq =>
          val from = math.max(0L, sq * L - run)
          val until = math.min(n, (sq + 1) * L - run)
          out += ((sq, id, until - from,
            md5hex(toks.slice(from.toInt, until.toInt).mkString(" "))))
        }
        run += n
      } else run += 0L
    }
    out.result()
  }

  test("packSequences matches the sequential concat-and-chunk reference") {
    val s = spark
    import s.implicits._
    val df = seqCorpus.toDF("doc_id", "text")
    val got = Corpus.packSequences(df, "text", "doc_id", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == packSequencesRef(seqCorpus, 16))
  }

  test("packSequences is partition-independent") {
    val s = spark
    import s.implicits._
    val df = seqCorpus.toDF("doc_id", "text")
    val base = Corpus.packSequences(df, "text", "doc_id", 16)
      .collect().map(_.toSeq).toSet
    val shuffled = Corpus.packSequences(df.repartition(17), "text", "doc_id", 16)
      .collect().map(_.toSeq).toSet
    assert(base == shuffled)
  }

  test("packSequences: every sequence holds exactly L tokens except the last") {
    val s = spark
    import s.implicits._
    val df = seqCorpus.toDF("doc_id", "text")
    val totals = Corpus.packSequences(df, "text", "doc_id", 16)
      .groupBy("seq_id").agg(sum("n_frag_tokens").as("total"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxSeq = totals.keys.max
    assert(totals.keySet == (0L to maxSeq).toSet, "sequence ids must be dense")
    totals.foreach { case (sq, tot) =>
      if (sq < maxSeq) assert(tot == 16L, s"sequence $sq holds $tot tokens")
      else assert(tot >= 1L && tot <= 16L, s"tail sequence holds $tot tokens")
    }
  }

  test("packSequences: a doc spanning several sequences splits at exact boundaries") {
    val s = spark
    import s.implicits._
    val df = seqCorpus.toDF("doc_id", "text")
    val frags = Corpus.packSequences(df, "text", "doc_id", 16)
      .filter(col("doc_id") === 20L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .sortBy(_._1)
    assert(frags.length >= 4, s"57-token doc must span >= 4 sequences of 16: $frags")
    assert(frags.map(_._2).sum == 57L, "fragments must cover the whole doc")
    // middle fragments fill whole sequences
    frags.drop(1).dropRight(1).foreach { case (_, nf) => assert(nf == 16L) }
    // consecutive sequence ids
    assert(frags.map(_._1).toSeq == (frags.head._1 to frags.last._1).toSeq)
  }

  // ---- scoreBuckets ----

  /** 3 sources with uneven sizes and planted score ties. */
  private def bucketCorpus: Seq[(Long, String, Long)] =
    (0L until 151L).map { i =>
      val src = Seq("web", "books", "code")((i % 3).toInt)
      val score = (i * 37 % 23) * 100L // ties on purpose
      (i, src, score)
    } :+ ((151L, "web", 1100L))

  private def bucketsRef(rows: Seq[(Long, String, Long)], k: Int): Map[Long, Long] =
    rows.groupBy(_._2).flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._1))
      val n = sorted.length.toLong
      sorted.zipWithIndex.map { case (r, i) => r._1 -> i.toLong * k / n }
    }

  test("scoreBuckets matches the sequential per-source tercile reference (ties included)") {
    val s = spark
    import s.implicits._
    val df = bucketCorpus.toDF("doc_id", "source", "score")
    val got = Corpus.scoreBuckets(df, "source", "doc_id", "score", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == bucketsRef(bucketCorpus, 3))
  }

  test("scoreBuckets is partition-independent") {
    val s = spark
    import s.implicits._
    val df = bucketCorpus.toDF("doc_id", "source", "score")
    val base = Corpus.scoreBuckets(df, "source", "doc_id", "score", 3)
      .collect().map(_.toSeq).toSet
    val shuffled = Corpus.scoreBuckets(df.repartition(17), "source", "doc_id", "score", 3)
      .collect().map(_.toSeq).toSet
    assert(base == shuffled)
  }

  test("scoreBuckets: per-source bucket sizes are balanced within one doc") {
    val s = spark
    import s.implicits._
    val df = bucketCorpus.toDF("doc_id", "source", "score")
    val sizes = Corpus.scoreBuckets(df, "source", "doc_id", "score", 3)
      .groupBy("source", "bucket").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    sizes.keys.map(_._1).toSet.foreach { (src: String) =>
      val per = (0L to 2L).map(b => sizes.getOrElse((src, b), 0L))
      assert(per.max - per.min <= 1L, s"$src buckets unbalanced: $per")
    }
    // nBuckets = 1 degenerates to a single bucket
    val one = Corpus.scoreBuckets(df, "source", "doc_id", "score", 1)
      .select("bucket").distinct().collect().map(_.getLong(0)).toSeq
    assert(one == Seq(0L))
  }

  // ---- decontaminate ----

  /** 5 docs: 0 is the eval source, 1 repeats 0's opening, 2 shares only a
   *  2-word phrase (below the 3-gram window), 3 is unrelated, 4 is too
   *  short to form a 3-gram. Bench = first 4 words of doc 0. */
  private def contamFixture: (DataFrame, DataFrame) = {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "prefix words alpha beta gamma delta and more"),
      (2L, "gamma delta unrelated tail words here"),
      (3L, "completely different text with no overlap at all"),
      (4L, "alpha beta")).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma delta").toDF("text")
    (docs, bench)
  }

  // ---- mixSources ----

  /** 150 docs, 3 sources with different budgets; tokens 1..30. */
  private def mixCorpus: DataFrame = {
    val s = spark
    import s.implicits._
    (0L until 150L).toSeq.map { i =>
      (i, Seq("web", "books", "code")((i % 3).toInt), (i % 30 + 1).toInt)
    }.toDF("doc_id", "source", "nt")
  }
  private def mixBudget = when(col("source") === "web", 120L)
    .when(col("source") === "books", 60L).otherwise(25L)

  test("mixSources matches the sequential per-source prefix fill") {
    val got = Corpus.mixSources(mixCorpus, "source", "doc_id", "nt", mixBudget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // independent reference: per source, sort by (md5(id:source), id),
    // keep while exclusive prefix < budget
    val rows = mixCorpus.withColumn("__h",
        md5(concat(col("doc_id").cast("string"), lit(":"), col("source"))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong, r.getString(3)))
    val budgets = Map("web" -> 120L, "books" -> 60L, "code" -> 25L)
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (src, docs) =>
      var run = 0L
      docs.sortBy(d => (d._4, d._1)).toSeq.flatMap { d =>
        val keep = run < budgets(src)
        run += d._3
        if (keep) Some((d._1, src, d._3)) else None
      }
    }.toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < 150, "budgets must actually bind")
  }

  test("mixSources is partition-independent") {
    val base = Corpus.mixSources(mixCorpus, "source", "doc_id", "nt", mixBudget)
      .collect().map(_.toSeq).toSet
    for (parts <- Seq(1, 7, 32)) {
      val got = Corpus.mixSources(mixCorpus.repartition(parts), "source", "doc_id", "nt", mixBudget)
        .collect().map(_.toSeq).toSet
      assert(got == base, s"parts=$parts diverged")
    }
  }

  test("mixSources: each source lands within one kept doc of its budget (prefix maximality)") {
    val out = Corpus.mixSources(mixCorpus, "source", "doc_id", "nt", mixBudget)
    val totals = out.groupBy("source").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = Map("web" -> 120L, "books" -> 60L, "code" -> 25L)
    budgets.foreach { case (src, b) =>
      val t = totals(src)
      // ≥ budget (the rule admits the doc that CROSSES the budget) and
      // the overshoot is bounded by that single doc (< budget + max nt)
      assert(t >= b && t < b + 30, s"$src total $t vs budget $b")
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunkDocs: window starts, overlap, runt tail, empty doc emits nothing") {
    val s2 = spark
    import s2.implicits._
    // 7 tokens, size 4, stride 3 → starts 0, 3, 6: full window, full
    // window, 1-token runt. 3 tokens → one truncated window. blank → none.
    val df = Seq(
      (1L, "a b c d e f g"), (2L, " x  y z "), (3L, "   "))
      .toDF("doc_id", "text")
    val out = Corpus.chunkDocs(df, "text", "doc_id", chunkSize = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3)))).toMap
    assert(out == Map(
      (1L, 0) -> ((4, md5Hex("a b c d"))),
      (1L, 1) -> ((4, md5Hex("d e f g"))),
      (1L, 2) -> ((1, md5Hex("g"))),
      (2L, 0) -> ((3, md5Hex("x y z")))))
  }

  test("chunkDocs: stride == size gives disjoint exact cover") {
    val s2 = spark
    import s2.implicits._
    val df = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = Corpus.chunkDocs(df, "text", "doc_id", chunkSize = 5, stride = 5)
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(out == Map(0 -> 5, 1 -> 5))
  }

  test("chunkDocs is shuffle-free (scan → project → generate, no Exchange)") {
    // a file scan (not a local relation, which constant-folds the
    // tokenize away) so the below-Generate projection is visible
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Corpus.chunkDocs(df, "text", "doc_id", chunkSize = 8, stride = 6)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    // tokens split once per doc, below the Generate — not once per chunk:
    // everything above the Generate works on the carried __t array
    assert(plan.contains("Generate") &&
      plan.indexOf("split(") > plan.indexOf("Generate"),
      s"tokenize must be projected below the explode:\n$plan")
  }

  test("contaminationHits flags exactly the docs sharing an n-gram, counting positions") {
    val (docs, bench) = contamFixture
    // bench 3-grams: {alpha beta gamma, beta gamma delta}
    // doc 0 matches both (2 positions), doc 1 matches both, docs 2/3/4 none
    val got = Corpus.contaminationHits(docs, bench, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 2L))
  }

  test("decontaminate ships the corpus minus contaminated docs") {
    val (docs, bench) = contamFixture
    val kept = Corpus.decontaminate(docs, bench, "text", "doc_id", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  test("contamination handles whitespace runs, blanks, and sub-n docs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "  alpha   beta\tgamma  delta  "), // irregular whitespace still matches
      (1L, ""), (2L, "   "), (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma").toDF("text")
    val got = Corpus.contaminationHits(docs, bench, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L))
  }

  test("contaminationHits equals a brute-force reference on a seeded random corpus") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42) // fixed seed: deterministic corpus
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    def doc(): String = Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docsSeq = (0L until 200L).map(i => (i, doc()))
    val benchSeq = Seq.fill(5)(doc())
    val n = 4
    def grams(t: String): Seq[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
    val bset = benchSeq.flatMap(grams).toSet
    val expected = docsSeq
      .map { case (id, t) => id -> grams(t).count(bset) }
      .filter(_._2 > 0).toMap
    val got = Corpus.contaminationHits(
        docsSeq.toDF("doc_id", "text"), benchSeq.toDF("text"), "text", "doc_id", n)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == expected)
    assert(expected.nonEmpty, "fixture degenerate: no contamination planted")
  }

  test("decontaminate shipping anti-join: AQE broadcasts the small flagged set with no hint") {
    // the contaminated-id side carries no broadcast hint (not bounded by
    // construction); pin that AQE still makes the anti-join a broadcast
    // at runtime when the flagged set is actually small
    val bench = { val s = spark; import s.implicits._
      Seq("alpha beta gamma").toDF("text") }
    val docs = spark.range(0, 2000).selectExpr("id AS doc_id",
      "concat('filler text number ', id, CASE WHEN id % 100 = 0 THEN ' alpha beta gamma' ELSE '' END) AS text")
    val out = Corpus.decontaminate(docs, bench, "text", "doc_id", n = 3)
    assert(out.count() == 1980)
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected runtime broadcast anti-join in:\n$plan")
  }

  test("contamination plan: corpus side reaches the semi-join without an Exchange") {
    val (_, bench) = contamFixture
    val docs = spark.range(0, 1000).selectExpr("id AS doc_id",
      "concat('filler text number ', id, ' alpha beta gamma delta') AS text")
    val plan = Corpus.contaminationHits(docs, bench, "text", "doc_id", n = 3)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi join in:\n$plan")
    // the only Exchanges allowed: the bench-side broadcast(s) and the final
    // per-doc count's shuffle over matched rows — never a corpus sort/shuffle
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 2, s"corpus side must not reshuffle; got $shuffles hash exchanges:\n$plan")
  }

  // ---- invertedIndex ----

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("invertedIndex: exact df, sorted postings digest, within-doc repeats count once") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (10L, "alpha beta alpha"),       // alpha repeats within the doc
      (2L, "beta gamma"),
      (7L, "alpha"),
      (3L, ""), (4L, "   "), (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Corpus.invertedIndex(docs, "text", "doc_id", maxDf = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.keySet == Set("alpha", "beta", "gamma"))
    assert(out("alpha") == ((2L, md5hex("7,10"))))   // numeric id order, not "10" < "7"
    assert(out("beta") == ((2L, md5hex("2,10"))))
    assert(out("gamma") == ((1L, md5hex("2"))))
  }

  test("invertedIndex: hot tokens keep exact df but report the '' sentinel") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "the cat"), (2L, "the dog"), (3L, "the fox"))
      .toDF("doc_id", "text")
    val out = Corpus.invertedIndex(docs, "text", "doc_id", maxDf = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out("the") == ((3L, "")))                 // df > maxDf: no list
    assert(out("cat") == ((1L, md5hex("1"))))
  }

  test("invertedIndex ≡ brute force on an LCG corpus (incl. cap boundary)") {
    var x = 99L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x }
    val vocab = (0 until 12).map(i => s"w$i")
    val docsSeq = (0L until 80L).map { id =>
      val n = (math.floorMod(next(), 6L) + 1).toInt
      (id, (0 until n).map(_ => vocab(math.floorMod(next(), 12L).toInt)).mkString(" "))
    }
    val maxDf = 20
    val expected = docsSeq
      .flatMap { case (id, t) => t.split("\\s+").filter(_.nonEmpty).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (tok, g) =>
        val ids = g.map(_._2).sorted
        tok -> ((ids.size.toLong,
          if (ids.size <= maxDf) md5hex(ids.mkString(",")) else ""))
      }
    val s = spark
    import s.implicits._
    val got = Corpus.invertedIndex(docsSeq.toDF("doc_id", "text"), "text", "doc_id", maxDf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got == expected)
  }

  // ---- sourceProfile ----

  private def profileDocs: DataFrame = {
    val s = spark
    import s.implicits._
    // srcA: 2 en + 1 fr (top en); srcB: 1 en + 1 fr → tie, lex min 'en';
    // srcC: null lang → 'und'. Only the long doc passes qualityKeep.
    Seq(
      ("srcA", "en", "the quick brown fox jumps over the lazy dog again and again for the win"),
      ("srcA", "en", "short one"),
      ("srcA", "fr", "le chat"),
      ("srcB", "en", "alpha beta"),
      ("srcB", "fr", "gamma delta"),
      ("srcC", null, "solo text here")
    ).toDF("source", "lang", "text")
  }

  test("sourceProfile: hand-computed counts, keep gate, tie-break, null lang → und") {
    val got = Corpus.sourceProfile(profileDocs, "source", "text", "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5), r.getLong(6)))).toMap
    // token counts: 15 + 2 + 2 = 19 (srcA), 2 + 2 = 4 (srcB), 3 (srcC)
    assert(got("srcA") == ((3L, 19L, 1L, 2L, "en", 6L)))
    assert(got("srcB") == ((2L, 4L, 0L, 2L, "en", 2L)))
    assert(got("srcC") == ((1L, 3L, 0L, 1L, "und", 3L)))
  }

  test("lmScore: hand-computed — frequency surprisal, OOV ceiling, empty doc scores 0") {
    val s = spark
    import s.implicits._
    // model corpus: "a a a b" → cnt(a)=3, cnt(b)=1, N=4, m=4000
    val model = Corpus.unigramModel(Seq((1L, "a a a b")).toDF("doc_id", "text"), "text")
    val docs = Seq(
      (10L, "a b"),      // surp(a)=4000 div 3=1333, surp(b)=4000 → mean 2666
      (11L, "a zzz"),    // zzz is OOV → 1000000 ceiling; mean 500666
      (12L, ""),         // empty → 0 tokens, score 0, kept
      (13L, "a a a")     // all common → 1333, kept at threshold 2000
    ).toDF("doc_id", "text")
    val got = Corpus.lmScore(docs, model, "text", "doc_id", threshold = 2000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(10L) == ((2L, 2666L, false)))
    assert(got(11L) == ((2L, 500666L, false)))
    assert(got(12L) == ((0L, 0L, true)))
    assert(got(13L) == ((3L, 1333L, true)))
  }

  test("lmScoreLogprob: a KenLM-shaped (token, logprob_milli) table slots in — config, not code") {
    val s = spark
    import s.implicits._
    // a loaded fixture model the way an ARPA unigram dump ships:
    // integer-quantized log10 probabilities, milli units, ≤ 0
    val kenlm = Seq(
      ("the", -1204L),  // p ≈ 10^-1.204
      ("cat", -2817L),
      ("sat", -3102L))
      .toDF("token", "logprob_milli")
    val docs = Seq(
      (1L, "the cat sat"),   // mean(1204, 2817, 3102) = 7123 div 3 = 2374
      (2L, "the zzz"),       // OOV pays the 7000 cap → (1204+7000) div 2 = 4102
      (3L, "")               // empty → 0, kept
    ).toDF("doc_id", "text")
    val got = Corpus.lmScoreLogprob(docs, kenlm, "text", "doc_id", threshold = 3000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((3L, 2374L, true)))
    assert(got(2L) == ((2L, 4102L, false)))
    assert(got(3L) == ((0L, 0L, true)))
    // the swap is config: the SAME call shape scores under a different
    // model table and the schema/keep-gate contract is unchanged
    val other = Seq(("the", -100L)).toDF("token", "logprob_milli")
    val re = Corpus.lmScoreLogprob(docs, other, "text", "doc_id", threshold = 3000L)
    assert(re.columns.toSeq == Seq("doc_id", "n_tokens", "surprisal_milli", "keep"))
    val reGot = re.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(reGot(1L) == (100L + 7000L + 7000L) / 3) // cat/sat now OOV
  }

  test("lmScore is partition-independent") {
    val s = spark
    import s.implicits._
    val docs = (0L until 60L).map(i =>
      (i, (0 to (i % 7).toInt).map(j => s"w${(i + j) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val model = Corpus.unigramModel(docs.filter(col("doc_id") % 2 === 0), "text")
    def run(p: Int) = Corpus.lmScore(docs.repartition(p), model, "text", "doc_id")
      .collect().map(_.toSeq).toSet
    assert(run(1) == run(6))
  }

  test("sourceProfile is partition-independent") {
    def run(p: Int) = Corpus.sourceProfile(profileDocs.repartition(p),
      "source", "text", "lang").collect().map(_.toSeq).toSet
    assert(run(1) == run(5))
  }

  // ---- linearScore (fasttext-shaped quality seam) ----

  test("linearScore: hand weights, OOV = 0, mean-pooled, bias, threshold") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "good good bad"),    // (400+400-600) div 3 = 66
      (2L, "bad bad"),          // -600
      (3L, "good novel"),       // novel is OOV: (400+0) div 2 = 200
      (4L, "   "),              // token-free -> exactly bias
      (5L, "bad")).toDF("doc_id", "text")
    val model = Seq(("good", 400L), ("bad", -600L)).toDF("token", "weight_milli")
    val out = Corpus.linearScore(docs, model, "text", "doc_id",
      biasMilli = 10L, thresholdMilli = 0L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) === ((3L, 76L, true)))
    assert(out(2L) === ((2L, -590L, false)))
    assert(out(3L) === ((2L, 210L, true)))
    assert(out(4L) === ((0L, 10L, true)))
    // -600 div 1 + 10: truncation toward zero matches DuckDB //
    assert(out(5L) === ((1L, -590L, false)))
  }

  test("linearScore: a swapped model redecides (the seam is config, not code)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val m1 = Seq(("alpha", 1000L), ("beta", 1000L)).toDF("token", "weight_milli")
    val m2 = Seq(("alpha", -1000L), ("beta", -1000L)).toDF("token", "weight_milli")
    def keep(m: DataFrame): Boolean =
      Corpus.linearScore(docs, m, "text", "doc_id").collect().head.getBoolean(3)
    assert(keep(m1) && !keep(m2))
  }
}
