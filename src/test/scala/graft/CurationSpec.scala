package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val en = Seq("the", "a", "of", "and", "is")

  test("curate filters by language and quality, then dedups on text") {
    val docs = Seq(
      (0L, "the quick fox is a friend of the lazy dog and more", 50),
      (1L, "the quick fox is a friend of the lazy dog and more", 50), // dup of 0
      (2L, "el perro de la casa es de los vecinos", 37),              // es
      (3L, "zz yy xx ww vv", 14),                                     // und
      (4L, "the and of is a the and of is a the and of is a", 47),
    ).toDF("doc_id", "text", "n_chars")
    val out = Curation.curate(docs, "doc_id", "text", "n_chars",
        stopwords = en, langs = Seq("en"), minQuality = 0.1)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 4L)) // dup 1 dropped, es/und filtered
    assert(out.forall(_.getString(1) == "en"))
    assert(out.forall(_.getDouble(2) >= 0.1))
  }

  test("blocklistFilter drops exact sources, pattern hits, and null provenance") {
    val docs = Seq(
      (0L, Some("goodsite")), (1L, Some("badsite")),
      (2L, Some("spam01")), (3L, Some("spam99")),
      (4L, None), (5L, Some("spamless")), // "spamless" must NOT match ^spam[0-9]+$
    ).toDF("doc_id", "source")
    val kept = Curation.blocklistFilter(docs, "source",
        blockedExact = Seq("badsite"), blockedPatterns = Seq("^spam[0-9]+$"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 5L))
    // exact-only form keeps pattern-shaped sources
    val exactOnly = Curation.blocklistFilter(docs, "source", Seq("badsite"))
      .select("doc_id").as[Long].collect().toSet
    assert(exactOnly == Set(0L, 2L, 3L, 5L))
  }

  test("curate with a blocklist gates documents before scoring") {
    val docs = Seq(
      (0L, "the quick fox is a friend of the lazy dog and more", 50, "ok"),
      (1L, "the quick fox is a friend of the lazy dog and more", 50, "blocked"),
      (2L, "the slow fox is a friend of the lazy dog and more", 49, "ok"),
    ).toDF("doc_id", "text", "n_chars", "source")
    val out = Curation.curate(docs, "doc_id", "text", "n_chars",
        stopwords = en, langs = Seq("en"), minQuality = 0.1,
        blockedSources = Seq("blocked"))
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(0L, 2L)) // doc 1 gated by source, not by dedup
  }

  test("containsExcerptFlags counts verbatim excerpt hits per document") {
    val docs = Seq(
      (0L, "nothing to see here at all"),
      (1L, "the SECRET PASSAGE hides in plain sight"),
      (2L, "both the SECRET PASSAGE and the HIDDEN DOOR appear"),
      (3L, "secret passage in lowercase must not match"),
    ).toDF("doc_id", "text")
    val excerpts = Seq("SECRET PASSAGE", "HIDDEN DOOR").toDF("excerpt")
    val out = Curation.containsExcerptFlags(docs, "doc_id", col("text"), excerpts, "excerpt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L))
    // anchor path (forced via cutover 0): identical n_hits map, pinning
    // the scale path q99/q163 take once the excerpt list outgrows the
    // broadcast-NLJ cutover against the NLJ semantics above
    val anchor = Curation.containsExcerptFlags(docs, "doc_id", col("text"),
        excerpts, "excerpt", anchorCutover = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(anchor == out)
  }

  test("excerpt hits are occurrence- and duplicate-row-invariant on both paths") {
    // one doc contains the SAME excerpt twice: n_hits counts distinct
    // excerpts (1), not occurrences — while excerptSpans reports
    // n_occ = 2; and a DUPLICATED excerpt row must not double-count on
    // the NLJ path (excerptSpans dedups the excerpt frame at entry)
    val docs = Seq(
      (0L, "the SECRET PASSAGE leads to the SECRET PASSAGE again"),
      (1L, "no excerpts here at all"),
    ).toDF("doc_id", "text")
    val dupExcerpts = Seq("SECRET PASSAGE", "SECRET PASSAGE").toDF("excerpt")
    for (cutover <- Seq(512, 0)) { // broadcast-NLJ path, then anchor path
      val flags = Curation.containsExcerptFlags(docs, "doc_id", col("text"),
          dupExcerpts, "excerpt", anchorCutover = cutover)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(flags == Map(0L -> 1L), s"cutover=$cutover: $flags")
      val spans = Curation.excerptSpans(docs, "doc_id", col("text"),
          dupExcerpts, "excerpt", anchorCutover = cutover)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      assert(spans.toSeq == Seq((0L, "SECRET PASSAGE", 5L, 2L)),
        s"cutover=$cutover: ${spans.toSeq}")
    }
  }

  test("curate quality threshold drops low-quality docs") {
    val docs = Seq(
      (0L, "the of a", 8),                       // 3 tokens, tiny -> low quality
      (1L, ("the fox " * 60).trim, 480),         // long, stopword-rich -> high
    ).toDF("doc_id", "text", "n_chars")
    val out = Curation.curate(docs, "doc_id", "text", "n_chars",
        stopwords = en, langs = Seq("en"), minQuality = 0.5)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("curate repetition gates drop gram-repetitive and symbol-heavy docs") {
    val docs = Seq(
      (0L, "the fox is a friend of the dog and the cat is a friend of the bird", 66),
      (1L, "the the the the the the the the the the the the", 47),      // top-2-gram ~1
      (2L, "the fox #### is $$$ a %%% dog !!!! and ** a @@ cat ^^", 53), // symbol-heavy
    ).toDF("doc_id", "text", "n_chars")
    val out = Curation.curate(docs, "doc_id", "text", "n_chars",
        stopwords = en, langs = Seq("en"), minQuality = 0.0,
        maxTop2GramFrac = 0.5, maxSymbolWordRatio = 0.5)
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(0L))
    // defaults disable the gates: all three English docs survive
    val ungated = Curation.curate(docs, "doc_id", "text", "n_chars",
      stopwords = en, langs = Seq("en"), minQuality = 0.0)
    assert(ungated.count() == 3)
  }

  test("tfidfTopTerms ranks rare-but-frequent terms above corpus-universal ones") {
    val docs = Seq(
      (0L, "spark spark spark common"),
      (1L, "duck duck common extra"),
      (2L, "common words only here"),
    ).toDF("doc_id", "text")
    val top = Curation.tfidfTopTerms(docs, "doc_id", col("text"), k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    // 'common' appears in all 3 docs -> idf = ln(4/4) = 0 -> never ranks first
    assert(top.contains((0L, 1, "spark", 3L, 1L)))
    assert(top.contains((1L, 1, "duck", 2L, 1L)))
    // doc 0 rank 2: 'common' is its only other term (score 0)
    assert(top.contains((0L, 2, "common", 1L, 3L)))
    // ties on (tf, df) break by term ascending — deterministic
    val doc2 = top.filter(_._1 == 2L).toSeq.sortBy(_._2).map(_._3)
    assert(doc2 == Seq("here", "only"))
  }

  private val benchSnippet =
    "the seventeen golden axolotls balanced quietly upon the ancient granite obelisk at dawn"

  test("contaminationFlags catches embedded benchmark excerpts, spares clean docs") {
    val benchmark = Seq((100L, benchSnippet)).toDF("bid", "btext")
    val corpus = Seq(
      (0L, s"some unrelated preamble text and then $benchSnippet followed by more filler words"),
      (1L, "a perfectly ordinary document about spark shuffles and catalyst optimizer rules"),
      (2L, benchSnippet), // verbatim leak
    ).toDF("doc_id", "text")
    val flagged = Curation.contaminationFlags(
        corpus, "doc_id", col("text"), benchmark, col("btext"),
        k = 12, w = 4, minShared = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(0L, 2L)) // embedded + verbatim flagged, clean doc spared
    val clean = Curation.decontaminate(
        corpus, "doc_id", col("text"), benchmark, col("btext"),
        k = 12, w = 4, minShared = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(1L))
  }

  test("decontaminate is a no-op when the benchmark shares nothing") {
    val benchmark = Seq((1L, "completamente distinto contenido referencial")).toDF("bid", "btext")
    val corpus = Seq(
      (0L, "spark dataframe operations compose into a single catalyst plan tree"),
      (1L, "tungsten code generation collapses operators into tight jvm loops"),
    ).toDF("doc_id", "text")
    val clean = Curation.decontaminate(
      corpus, "doc_id", col("text"), benchmark, col("btext"), k = 12, w = 4)
    assert(clean.count() == 2)
  }

  test("tokenDfStats computes occurrence-weighted DF stats and hapax share") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a a d")).toDF("doc_id", "text")
    val out = Curation.tokenDfStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // df: a->3, b/c/d->1; d3's repeated "a" counts per OCCURRENCE
    assert(out.toSeq == Seq(
      (1L, 2L, 2.0, 0.5),
      (2L, 2L, 2.0, 0.5),
      (3L, 3L, 7.0 / 3, 1.0 / 3)))
  }

  test("bigramCounts: zero-shuffle bigram generation, add-k smoothed probabilities") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"), (4L, ""))
      .toDF("doc_id", "text")
    val out = Curation.bigramCounts(docs, "text")
      .orderBy("bigram").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // bigrams: d1 -> "a b","b a","a b"; d2 -> "a b"; single/empty-token
    // docs contribute nothing. N=4, V=2 -> prob = (c+1)/(4+2)
    assert(out.toSeq == Seq(
      ("a b", 3L, 4.0 / 6), ("b a", 1L, 2.0 / 6)))
  }

  test("lmScore: mean smoothed bigram probability via the shared-denominator rational form") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = Curation.lmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // corpus bigrams: "a b"x3, "b a"x1 -> N=4, V=2, denom N+V=6
    // doc1: bigrams [a b, b a, a b], hits = (3+1)+(1+1)+(3+1)=10, k=3 -> 10/18
    // doc2: [a b], hits = 4, k=1 -> 4/6; doc3: no bigrams -> absent
    assert(out.toSeq == Seq((1L, 10.0 / 18), (2L, 4.0 / 6)))
  }

  test("distinctiveTokens ranks over-represented tokens per group; shared tokens excluded") {
    // 'common' is uniform across groups (obs == expected -> excluded);
    // each group over-represents its own marker token
    val docs = Seq(
      ("s1", "common alpha alpha alpha"), ("s1", "common alpha beta"),
      ("s2", "common gamma gamma"), ("s2", "common gamma beta beta")).toDF("source", "text")
    val out = Curation.distinctiveTokens(docs, "source", "text", k = 2)
      .orderBy("source", "token").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("s1", "alpha", 4L), ("s2", "beta", 2L), ("s2", "gamma", 3L)))
    // s1's beta (1 obs vs expected 7*3/14 = 1.5) is under-represented
    // and excluded, so s1 keeps only alpha and k=2 caps nothing
  }

  test("boilerplateStrip removes lines shared by >= minDocs docs of a source, keeps the rest") {
    val docs = Seq(
      (0L, "s1", "BANNER\nalpha\nfooter"),
      (1L, "s1", "BANNER\nbeta\nfooter"),
      (2L, "s1", "BANNER\nfooter"),            // reduced to zero lines -> drops out
      (3L, "s2", "BANNER\ngamma"),             // s2's BANNER is below threshold -> kept
    ).toDF("doc_id", "source", "text")
    val out = Curation.boilerplateStrip(docs.repartition(3), "doc_id", "source", "text",
        minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq(
      (0L, "alpha", 1), (1L, "beta", 1), (3L, "BANNER\ngamma", 2)))
  }

  test("boilerplateStrip counts DISTINCT docs (in-doc repeats don't fake boilerplate) and spares blanks") {
    val docs = Seq(
      (0L, "s1", "echo\necho\necho\n\nkeep me"),  // echo repeats in ONE doc only
      (1L, "s1", "\n\nother"),                    // blank lines shared but never stripped
    ).toDF("doc_id", "source", "text")
    val out = Curation.boilerplateStrip(docs, "doc_id", "source", "text", minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(
      (0L, "echo\necho\necho\n\nkeep me"), (1L, "\n\nother")))
  }

  test("sourceOverlap counts distinct shared lines per unordered source pair") {
    val docs = Seq(
      ("s1", "x\ny\nz"), ("s1", "x\nw"),      // s1's lines: {x,y,z,w} (x deduped)
      ("s2", "x\ny"), ("s3", "y\n \n"),       // blanks excluded
    ).toDF("source", "text")
    val out = Curation.sourceOverlap(docs.repartition(2), "source", "text")
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("s1", "s2", 2L), ("s1", "s3", 1L), ("s2", "s3", 1L)))
  }

  test("mixtureWeights: T=2 tempering upweights the tail; weights sum to ~1") {
    // 9:16 docs -> shares .36/.64, sqrt .6/.8 -> weights 3/7 and 4/7:
    // the small source rises from 36% to ~42.9%
    val docs = (Seq.fill(9)("small") ++ Seq.fill(16)("big")).toDF("source")
    val out = Curation.mixtureWeights(docs.repartition(3), "source")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("big", 16L, 0.64), ("small", 9L, 0.36)))
    assert(math.abs(out(0)._4 - 4.0 / 7.0) < 1e-15)
    assert(math.abs(out(1)._4 - 3.0 / 7.0) < 1e-15)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-12)
  }

  test("sourceQualityReport: exact percentiles per source (interpolated median)") {
    val perDoc = Seq(
      ("s1", 10, 0.2), ("s1", 20, 0.4), ("s1", 30, 0.9),
      ("s2", 5, 0.5), ("s2", 7, 0.7),
    ).toDF("source", "n_toks", "q")
    val out = Curation.sourceQualityReport(perDoc.repartition(3), "source", "n_toks", "q")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getFloat(5))) // quality quantiles are FLOAT (ulp-absorb image)
    // s1: median tokens 20, p50 quality 0.4; s2: interpolated 6.0 / ~0.6
    assert(out.map(t => (t._1, t._2, t._3, t._4)).toSeq == Seq(
      ("s1", 3L, 60L, 20.0), ("s2", 2L, 12L, 6.0)))
    assert(out(0)._5 == 0.4f)
    assert(math.abs(out(1)._5 - 0.6f) < 1e-7)
  }

  test("tokenFrequencySpectrum: frequency-of-frequencies with blank drop") {
    val docs = Seq(
      ("a b  a"), ("b c a"), ("d"),
    ).toDF("text")
    // freqs: a=3, b=2, c=1, d=1 -> spectrum: (1,2), (2,1), (3,1)
    val out = Curation.tokenFrequencySpectrum(docs.repartition(2), "text")
      .orderBy("freq").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("piiDensity: independent per-class counts on raw text; exact density") {
    val docs = Seq(
      ("s1", "mail a@b.co and c@d.io from 10.0.0.1"),      // 2 emails 1 ip, 6 tokens
      ("s1", "clean text here"),                            // 3 tokens
      ("s2", "call (555) 867-5309 now"),                    // 1 phone, 4 tokens
    ).toDF("source", "text")
    val out = Curation.piiDensity(docs.repartition(2), "source", "text")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(out.toSeq == Seq(
      ("s1", 2L, 9L, 2L, 1L, 0L, 3.0 * 1000.0 / 9.0),
      ("s2", 1L, 4L, 0L, 0L, 1L, 1.0 * 1000.0 / 4.0)))
  }

  test("vocabGrowth: first-appearance buckets by id range; cumulative vocabulary") {
    // ids 0..9, 2 buckets of 5; 'a' first at 0, 'b' at 1, 'c' at 5, 'd' at 9
    val docs = Seq(
      (0L, "a"), (1L, "b a"), (2L, "a b"), (3L, "b"), (4L, "a"),
      (5L, "c a"), (6L, "c"), (7L, "b"), (8L, "c"), (9L, "d  c"),
    ).toDF("doc_id", "text")
    val out = Curation.vocabGrowth(docs.repartition(3), "doc_id", "text", nBuckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0, 2L, 2L), (1, 2L, 4L)))
  }

  test("tokenBudget: token-share tempering, floor allocation, epoch flag") {
    // tokens: s1 = 4, s2 = 16 -> shares .2/.8, sqrt ~ .447/.894,
    // weights 1/3 and 2/3 exactly? sqrt(.2)/(sqrt(.2)+sqrt(.8)) = 1/3
    // since sqrt(.8) = 2*sqrt(.2)
    val docs = Seq(
      ("s1", "t t t t"),
      ("s2", ("t " * 16).trim),
    ).toDF("source", "text")
    val out = Curation.tokenBudget(docs.repartition(2), "source", "text",
      targetTokens = 900L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(4),
        r.getLong(5), r.getDouble(6)))
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("s1", 1L, 4L), ("s2", 1L, 16L)))
    assert(math.abs(out(0)._4 - 1.0 / 3.0) < 1e-12)
    assert(math.abs(out(1)._4 - 2.0 / 3.0) < 1e-12)
    // floor(900·w): 299 or 300 and 599 or 600 depending on the ulp —
    // pin the exact values the fixed sequence produces
    assert(out(0)._5 + out(1)._5 <= 900L)
    assert(out(0)._5 == math.floor(900.0 * out(0)._4).toLong)
    assert(math.abs(out(0)._6 - out(0)._5 / 4.0) < 1e-12)
  }

  test("pmiCollocations: hand-checked PMI, minCount floors rare pairs") {
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val out = Curation.pmiCollocations(docs.repartition(2), "text", minCount = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getFloat(3))))
      .toMap
    // unigrams: a=3 b=2 c=1, N=6; (a,b)=2 kept, (a,c)=1 floored out
    assert(out.keySet == Set(("a", "b")))
    val (n, pmi) = out(("a", "b"))
    assert(n == 2L)
    assert(math.abs(pmi - math.log(2.0 * 6.0 / (3.0 * 2.0))) < 1e-6)
    val ex = intercept[IllegalArgumentException] {
      Curation.pmiCollocations(docs, "text", minCount = 0)
    }
    assert(ex.getMessage.contains("minCount"))
  }

  test("sourceEntropy: hand-checked nats; a collapsed source scores below a uniform one") {
    val docs = Seq(
      ("skewed", "a a a a a a a b"),     // p = 7/8, 1/8
      ("uniform", "x y"),                // p = 1/2, 1/2 -> ln 2
    ).toDF("source", "text")
    val out = Curation.sourceEntropy(docs.repartition(2), "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out("uniform")._1 == 2L && out("uniform")._2 == 2L)
    assert(math.abs(out("uniform")._3 - math.log(2.0)) < 1e-6)
    val hSkew = -(7.0 / 8 * math.log(7.0 / 8) + 1.0 / 8 * math.log(1.0 / 8))
    assert(out("skewed")._1 == 8L && out("skewed")._2 == 2L)
    assert(math.abs(out("skewed")._3 - hSkew) < 1e-6)
    assert(out("skewed")._3 < out("uniform")._3)
  }

  test("tokenBurstiness: hand-checked VMR over containing docs; minDf floors the tail") {
    val docs = Seq(
      (1L, "a a a a"),                   // a: 4 here
      (2L, "a b"),                       // a: 1 here; b df=1 floored
    ).toDF("doc_id", "text")
    val out = Curation.tokenBurstiness(docs.repartition(2), "doc_id", "text", minDf = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == Set("a"))
    // counts {4,1}: mean 2.5, pop var (2*17-25)/4 = 2.25, VMR = 0.9
    val (df, total, vmr) = out("a")
    assert(df == 2L && total == 5L)
    assert(math.abs(vmr - 0.9) < 1e-12)
    val ex = intercept[IllegalArgumentException] {
      Curation.tokenBurstiness(docs, "doc_id", "text", minDf = 1)
    }
    assert(ex.getMessage.contains("minDf"))
  }

  test("jsDivergence: a lone source matches the corpus exactly (JSD 0); divergent sources are positive and ln2-bounded") {
    val lone = Seq((1L, "one", "a b c"), (2L, "one", "a a b")).toDF("doc_id", "source", "text")
    val zero = Curation.jsDivergence(lone, "source", "text").collect()
    assert(zero.length == 1)
    // p == q token-for-token: every ln term is ln(1) = 0 exactly and
    // coverage is exactly 1, so JSD is exactly 0.0
    assert(zero.head.getAs[Double]("jsd_nats") == 0.0)
    assert(zero.head.getAs[Double]("coverage") == 1.0)

    val two = Seq(
      (1L, "x", "a a a a"), (2L, "y", "b b b b"), // disjoint vocabularies
    ).toDF("doc_id", "source", "text")
    val out = Curation.jsDivergence(two, "source", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("jsd_nats")).toMap
    // each source holds half the corpus mass: p = 1 on its token,
    // q = 1/2, JSD = 0.5*(ln(4/3) + 0.5*ln(4/3)*... ) — just bound it
    assert(out.values.forall(v => v > 0.0 && v <= math.log(2.0) + 1e-9))
    // symmetric corpus: both sources diverge equally
    assert(math.abs(out("x") - out("y")) < 1e-12)
  }

  test("zipfSlope: exact two-point power law recovers its exponent") {
    // count(rank 1) = 8, count(rank 2) = 1: slope = -ln8/ln2 = -3
    val docs = Seq((1L, Seq.fill(8)("aa").mkString(" ") + " bb"))
      .toDF("doc_id", "text")
    val row = Curation.zipfSlope(docs, "text", k = 2).collect().head
    assert(row.getAs[Long]("n") == 2L)
    assert(math.abs(row.getAs[Double]("slope") - (-3.0)) < 1e-5)
    assert(math.abs(row.getAs[Double]("intercept") - math.log(8.0)) < 1e-5)
    val ex = intercept[IllegalArgumentException] {
      Curation.zipfSlope(docs, "text", k = 1)
    }
    assert(ex.getMessage.contains("k >= 2"))
  }

  test("templatePhrases surfaces cross-doc repeated shingles and drops unique ones") {
    val docs = Seq(
      (1L, "accept all cookies to continue reading"),
      (2L, "accept all cookies to continue browsing"),
      (3L, "accept all cookies to continue here"),
      (4L, "completely unrelated text about something else"),
    ).toDF("doc_id", "text")
    val out = Curation.templatePhrases(docs, "doc_id", "text", k = 3, minFrac = 0.5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("accept all cookies") == ((3L, 0.75)))
    assert(out("all cookies to") == ((3L, 0.75)))
    assert(out("cookies to continue") == ((3L, 0.75)))
    // the varying tails and the unrelated doc never reach 50% df
    assert(!out.contains("to continue reading"))
    assert(!out.contains("completely unrelated text"))
  }

  test("excerptSpans: first position and non-overlapping occurrence count, no regex misfires") {
    val corpus = Seq(
      (1L, "abcNEEDLE(x)zzNEEDLE(x)"), // metachars in the excerpt
      (2L, "clean text without the excerpt"),
    ).toDF("doc_id", "text")
    val ex = Seq(Tuple1("NEEDLE(x)")).toDF("excerpt")
    val out = Curation.excerptSpans(corpus, "doc_id", col("text"), ex, "excerpt")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
    assert(out.toSeq == Seq(1L -> ((4L, 2L))))
  }

  test("excerptSpans anchor path == NLJ path on generated corpora") {
    // excerpts long enough for the anchor gram (>= 4 chars); includes a
    // doc matching two excerpts, an excerpt matching several docs,
    // repeated (templated) occurrences, anchor-prefix decoys (shared
    // 24-char prefix, diverging tail — anchor matches, instr must
    // reject), and metacharacters
    val pad = "x" * 30
    val e1 = s"SHARED-PREFIX-$pad-TAIL-ONE"
    val decoy = s"SHARED-PREFIX-$pad-TAIL-TWO"
    val corpus = Seq(
      (1L, s"start $e1 middle $e1 end"),
      (2L, s"only the decoy prefix: SHARED-PREFIX-$pad-TAIL-XX here"),
      (3L, s"has NEEDLE(x) and also $e1"),
      (4L, "nothing relevant at all"),
      (5L, "short"),
      (6L, "short-gram bait: abc abc"),
    ).toDF("doc_id", "text")
    val ex = Seq(e1, decoy, "NEEDLE(x)").toSeq.map(Tuple1(_)).toDF("excerpt")
    val nlj = Curation.excerptSpans(corpus, "doc_id", col("text"), ex, "excerpt")
      .orderBy("doc_id", "excerpt").collect().toSeq
    val anchor = Curation.excerptSpans(corpus, "doc_id", col("text"), ex, "excerpt",
        anchorCutover = 0)
      .orderBy("doc_id", "excerpt").collect().toSeq
    assert(anchor == nlj, s"anchor path diverged:\n$anchor\nvs\n$nlj")
    assert(nlj.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, e1), (3L, e1), (3L, "NEEDLE(x)")))
    assert(nlj.find(r => r.getLong(0) == 1L).get.getLong(3) == 2L) // templated twice
    // short excerpts (< 4 chars) keep the NLJ path even when forced:
    // the forced-cutover call must produce the same correct rows as the
    // default path — doc 6 contains "abc" twice, nothing else matches
    val shortEx = Seq(Tuple1("abc")).toDF("excerpt")
    val s2 = Curation.excerptSpans(corpus, "doc_id", col("text"), shortEx, "excerpt",
        anchorCutover = 0)
      .orderBy("doc_id").collect().toSeq
    val s2Default = Curation.excerptSpans(corpus, "doc_id", col("text"), shortEx, "excerpt")
      .orderBy("doc_id").collect().toSeq
    assert(s2 == s2Default)
    assert(s2.map(r => (r.getLong(0), r.getString(1), r.getLong(3))) ==
      Seq((6L, "abc", 2L)))
    // an all-NULL excerpt frame must not NPE the anchor-path probe
    // (min(length) is null there) — the NLJ fallback yields no rows
    val nullEx = Seq(Tuple1(null: String)).toDF("excerpt")
    val s3 = Curation.excerptSpans(corpus, "doc_id", col("text"), nullEx, "excerpt",
      anchorCutover = 0).collect()
    assert(s3.isEmpty)
  }

  test("naiveBayesSource attributes clearly separable sources correctly") {
    val docs = Seq(
      (1L, "A", "x x x"), (2L, "A", "x y x"),
      (3L, "B", "z z w"), (4L, "B", "z w z"),
    ).toDF("doc_id", "source", "text")
    val out = Curation.naiveBayesSource(docs, "doc_id", "source", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getBoolean(3))))
      .toMap
    assert(out.size == 4)
    assert(out.values.forall(_._3), s"misattributed: $out")
    assert(out(1L)._2 == "A" && out(3L)._2 == "B")
  }

  test("naiveBayesSource dense-grid and sparse scoring paths agree; the cell gate routes") {
    // the dense path precomputes coalesce(seen, miss) into a broadcast
    // (class, token) grid; the sparse path left-joins seenTerms over
    // the class-crossed frame. Same decimal terms, same sums — the
    // outputs must be IDENTICAL, and graft.nb.gridCells=0 must force
    // the sparse plan (no broadcast hint on a __gcell-bearing frame)
    val docs = Seq(
      (1L, "A", "x x y"), (2L, "A", "x y"),
      (3L, "B", "z w"), (4L, "B", "z z y w"),
      (5L, "C", "y w x"),
    ).toDF("doc_id", "source", "text")
    def run() = Curation.naiveBayesSource(docs, "doc_id", "source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3))).toSet
    def gridHinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
          if h.child.output.exists(_.name == "__gcell") => h
      }.nonEmpty
    try {
      val dense = run()
      assert(gridHinted(dense), "tiny corpus should take the broadcast-grid path")
      val denseRows = rows(dense)
      spark.conf.set("graft.nb.gridCells", "0")
      val sparse = run()
      assert(!gridHinted(sparse), "gridCells=0 must force the sparse path")
      assert(rows(sparse) == denseRows)
      assert(denseRows.size == 5)
    } finally {
      spark.conf.unset("graft.nb.gridCells")
      spark.catalog.clearCache()
    }
  }

  test("bm25TopK ranks term-dense short docs first and skips docs without the query terms") {
    val docs = Seq(
      (1L, "a a b"),        // no 'c': never scored
      (2L, "a c"),          // one 'c'
      (3L, "c c c"),        // dense in 'c'
    ).toDF("doc_id", "text")
    // top-1 corpus token is 'c' (4 occurrences vs 3 for 'a')
    val out = Curation.bm25TopK(docs, "doc_id", "text", nTerms = 1, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(out.map(_._1).toSet == Set(2L, 3L))
    assert(out.find(_._1 == 3L).get._2 == 1) // densest doc ranks first
  }

  test("vocabCoverage: concentrated sources need few tokens for 90% mass") {
    val docs = Seq(
      (1L, "spam", "x x x x x x x x x y"),   // x alone covers 90%
      (2L, "flat", "a b c d e f g h i j"),   // needs 9 of 10
    ).toDF("doc_id", "source", "text")
    val out = Curation.vocabCoverage(docs, "source", "text", pct = 90)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out("spam") == ((2L, 1)))
    assert(out("flat") == ((10L, 9)))
  }

  test("goodTuring: hand-checked spectrum, smoothed counts, and unseen mass") {
    // token counts: a:2, b:1, c:1 -> spectrum N1=2, N2=1; N=4
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val out = Curation.goodTuring(docs, split(col("text"), " "), maxR = 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L))
    val (n1, r1star, unseen) = out(1L)
    // r*=1: (1+1)*N2/N1 = 2*1/2 = 1.0
    assert(n1 == 2L && r1star.contains(1.0) && unseen == 0.5)
    // r=2 has no N3: estimator undefined -> NULL
    assert(out(2L)._1 == 1L && out(2L)._2.isEmpty)
  }
}
