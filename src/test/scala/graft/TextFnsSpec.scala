package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): Seq[String] =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getSeq[String](0).toSeq

  test("tokenCount counts whitespace tokens") {
    assert(one[Int](TextFns.tokenCount(col("t")), "a b c") == 3)
    assert(one[Int](TextFns.tokenCount(col("t")), "solo") == 1)
  }

  test("bpeTokenCount splits contractions, digits, and punctuation runs") {
    // "don" + "'t" + " stop" -> 3; the whitespace rides on the next token
    assert(one[Int](TextFns.bpeTokenCount(col("t")), "don't stop") == 3)
    // "abc" + "123" + "!!" -> letter run, digit run, punct run
    assert(one[Int](TextFns.bpeTokenCount(col("t")), "abc123!!") == 3)
    // plain words: one token per word (space-prefixed runs)
    assert(one[Int](TextFns.bpeTokenCount(col("t")), "key agg row") == 3)
  }

  test("wordShingles emits distinct k-grams; short docs collapse to whole text") {
    val sh = oneSeq(TextFns.wordShingles(TextFns.tokens(col("t")), 2), "a b c a b")
    assert(sh.toSet == Set("a b", "b c", "c a"))
    val short = oneSeq(TextFns.wordShingles(TextFns.tokens(col("t")), 3), "x y")
    assert(short == Seq("x y"))
  }

  test("charGrams covers the string") {
    val g = oneSeq(TextFns.charGrams(col("t"), 3), "abcd")
    assert(g == Seq("abc", "bcd"))
  }

  test("jaccard is |intersect|/|union|") {
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y").select(TextFns.jaccard(col("x"), col("y")).as("j"))
      .collect().head.getDouble(0)
    assert(j == 0.5)
  }

  test("wordShingles codegen == declarative, including separator edge cases") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b",                 // fewer tokens than k -> whole text
      "",                    // empty -> one empty shingle
      "x",                   // single token
      "a  b c",              // double space -> empty token in the middle
      " leading trailing ",  // boundary separators
      "dup dup dup dup",     // repeated shingles collapse via distinct
      "héllo wörld ünïcode tokens here", // multi-byte code points
    ).toDF("t")
    val rows = texts.select(
      TextFns.wordShingles(spark, col("t"), 3).as("fast"),
      TextFns.wordShingles(TextFns.tokens(col("t")), 3).as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"fast=${r.getSeq[String](0)} ref=${r.getSeq[String](1)}")
    }
  }

  test("charGramJaccard codegen == declarative gram-array jaccard") {
    val pairs = Seq(
      ("abcdef", "bcdefg"),   // overlapping grams
      ("abcdef", "abcdef"),   // identical -> 1.0
      ("ab", "abc"),          // left shorter than k -> whole-text gram
      ("", "abc"),            // empty text -> single "" gram, disjoint
      ("", ""),               // both empty -> {""} == {""} -> 1.0
      ("aaaa", "aa"),         // repeated chars collapse via distinct
      ("héllo wörld", "héllo würld"), // multi-byte code points
    ).toDF("a", "b")
    val out = pairs.select(
      TextFns.charGramJaccard(spark, col("a"), col("b"), 3).as("fast"),
      TextFns.jaccard(TextFns.charGrams(col("a"), 3), TextFns.charGrams(col("b"), 3)).as("ref"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"fast=${r.getDouble(0)} ref=${r.getDouble(1)}"))
    // null text -> null, matching the declarative form
    val n = Seq((Option.empty[String], Some("abc"))).toDF("a", "b")
      .select(TextFns.charGramJaccard(spark, col("a"), col("b"), 3)).collect()
    assert(n.head.isNullAt(0))
  }

  test("langId picks the dominant stopword family") {
    assert(one[String](TextFns.langId(TextFns.tokens(col("t"))), "the cat is here") == "en")
    assert(one[String](TextFns.langId(TextFns.tokens(col("t"))), "el perro de la casa") == "es")
    assert(one[String](TextFns.langId(TextFns.tokens(col("t"))), "um gato não") == "pt")
    assert(one[String](TextFns.langId(TextFns.tokens(col("t"))), "qwerty zzz") == "und")
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fp1 = one[String](TextFns.fingerprint(col("t")), "  Hello   World ")
    val fp2 = one[String](TextFns.fingerprint(col("t")), "hello world")
    assert(fp1 == fp2)
  }

  test("normalizeText lowercases, collapses all whitespace kinds, trims") {
    assert(one[String](TextFns.normalizeText(col("t")),
      "  Hello\t\tWorld\n\nAgain \r ") == "hello world again")
    assert(one[String](TextFns.normalizeText(col("t")), "plain") == "plain")
    assert(one[String](TextFns.normalizeText(col("t")), " \t\n ") == "")
  }

  test("qualityScore stays in [0,1] and saturates") {
    val q = Seq((200, 0, 1000)).toDF("nt", "ns", "nc")
      .select(TextFns.qualityScore(col("nt"), col("ns"), col("nc")).as("q"))
      .collect().head.getDouble(0)
    assert(q == 0.7) // 0.5*1 + 0.3*0 + 0.2*1
  }

  test("duplicateLineFraction counts repeated lines; single-line text scores 0") {
    assert(one[Double](TextFns.duplicateLineFraction(col("t")),
      "aa\nbb\naa\naa") == 0.5) // 4 lines, 2 distinct -> (4-2)/4
    assert(one[Double](TextFns.duplicateLineFraction(col("t")), "just one line") == 0.0)
    assert(one[Double](TextFns.duplicateLineFraction(col("t")), "") == 0.0)
  }

  test("topNGramFraction: sorted-run fold equals the most frequent n-gram share") {
    val f = TextFns.topNGramFraction(TextFns.tokens(col("t")), 2)
    // grams: "a b","b a","a b","b a","a b" -> top "a b" 3 of 5
    assert(one[Double](f, "a b a b a b") == 3.0 / 5.0)
    // all grams distinct -> 1/n
    assert(one[Double](f, "q w e r") == 1.0 / 3.0)
    // degenerate repetition -> 1.0
    assert(one[Double](f, "x x x x x") == 1.0)
    // shorter than n tokens -> 0.0
    assert(one[Double](f, "solo") == 0.0)
  }

  test("redactPii scrubs emails, IPs, and phone shapes; clean text unchanged") {
    val r = TextFns.redactPii(col("t"))
    assert(one[String](r, "mail alice.b+x@sub.example.org now") == "mail <PII> now")
    assert(one[String](r, "host 192.168.0.1 responded") == "host <PII> responded")
    assert(one[String](r, "call (555) 867-5309 or 555-867-5309") == "call <PII> or <PII>")
    assert(one[String](r, "version 1.2 of chapter 3.4.5 unchanged") ==
      "version 1.2 of chapter 3.4.5 unchanged")
    // shape-based, not range-validated: out-of-range octets still redact
    // (over-redaction is the safe direction for PII)
    assert(one[String](r, "a@b@c is not an email at 999.999.999.999.999") ==
      "a@b@c is not an email at <PII>.999")
  }

  test("c4KeptLines keeps terminated prose, drops boilerplate and fragments") {
    val text = Seq(
      "this line ends with a period.",
      "no terminal punctuation here",
      "enable JavaScript to view",
      "lorem ipsum dolor sit amet.",
      "function() { return 1; }",
      "tiny.",
      "is this a kept question?").mkString("\n")
    val kept = oneSeq(TextFns.c4KeptLines(col("t")), text)
    assert(kept == Seq("this line ends with a period.", "is this a kept question?"))
  }

  test("dedupLinesInDoc drops repeated lines, keeps first-occurrence order") {
    assert(one[String](TextFns.dedupLinesInDoc(col("t")),
      "b\na\nb\nc\na") == "b\na\nc")
    // no repeats -> identity; empty doc -> empty
    assert(one[String](TextFns.dedupLinesInDoc(col("t")), "x\ny") == "x\ny")
    assert(one[String](TextFns.dedupLinesInDoc(col("t")), "") == "")
  }

  test("jaroWinkler matches the classic reference values") {
    def jw(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(TextFns.jaroWinkler(spark, col("a"), col("b")))
        .as[Double].head()
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("same", "same") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("", "a") == 0.0)
    assert(jw("ab", "ba") == 0.0)      // below the match window: no matches
    // symmetric
    assert(jw("DWAYNE", "DUANE") == jw("DUANE", "DWAYNE"))
    // code-point semantics: 'é' is ONE char (DuckDB scores its two
    // UTF-8 bytes separately — documented divergence on non-ASCII)
    assert(jw("café", "cafe") == 0.8833333333333334)
  }

  test("symbolToWordRatio and meanWordLength") {
    assert(one[Double](TextFns.symbolToWordRatio(col("t")), "a b### c!") == 4.0 / 3.0)
    assert(one[Double](TextFns.symbolToWordRatio(col("t")), "clean words here") == 0.0)
    assert(one[Double](TextFns.meanWordLength(TextFns.tokens(col("t"))), "ab cdef") == 3.0)
    assert(one[Double](TextFns.meanWordLength(TextFns.tokens(col("t"))), "") == 0.0)
  }

  test("fleschReadability: exact counts, fragment floors to one sentence") {
    // 5 words, 2 sentence runs, 5 vowel groups
    val t = "The cat sat. It ran!"
    assert(one[Int](TextFns.sentenceCount(col("t")), t) == 2)
    assert(one[Int](TextFns.syllableEstimate(col("t")), t) == 5)
    assert(one[Double](TextFns.fleschReadability(col("t")), t)
      == 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0))
    // no terminal punctuation: one sentence, division still total
    assert(one[Int](TextFns.sentenceCount(col("t")), "no punctuation") == 1)
  }

  test("stripAccents folds decomposable accents, keeps distinct letters, ASCII is a no-op") {
    // the pt-BR motivating case (dag.py:47): não/nao must collide
    assert(one[String](TextFns.stripAccents(col("t")), "não é açúcar") == "nao e acucar")
    // Latin Extended-A: ogonek, caron, double acute, ring, dot-above İ
    assert(one[String](TextFns.stripAccents(col("t")), "ąŠőůİža") == "aSouIza")
    // NON-decomposable letters are not accents — they must pass through
    assert(one[String](TextFns.stripAccents(col("t")), "Øresund ßtraße Łódź") ==
      "Øresund ßtraße Łodz")
    val ascii = "plain ASCII text 123!"
    assert(one[String](TextFns.stripAccents(col("t")), ascii) == ascii)
  }

  test("canonicalizeUrl: case, default ports, tracking params, fragments, slashes") {
    def canon(u: String) = one[String](TextFns.canonicalizeUrl(col("t")), u)
    // the full mess at once: mixed case, default port, unsorted params
    // with consecutive tracking keys, fragment, trailing slash
    assert(canon("HTTP://WWW.Site.COM:80/A/b/?z=9&utm_source=x&utm_medium=y&a=1#frag") ==
      "http://www.site.com/A/b?a=1&z=9")
    // https strips :443 but keeps a NON-default port
    assert(canon("HTTPS://X.org:443/p") == "https://x.org/p")
    assert(canon("https://x.org:8443/p") == "https://x.org:8443/p")
    // http does NOT strip :443
    assert(canon("http://x.org:443/p") == "http://x.org:443/p")
    // all params tracking -> no '?' at all; fbclid covered
    assert(canon("http://a.com/p?utm_a=1&fbclid=xyz") == "http://a.com/p")
    // bare host with root slash canonicalizes to no path
    assert(canon("http://a.com/") == "http://a.com")
    // path case is significant and preserved
    assert(canon("http://a.com/CaseSensitive") == "http://a.com/CaseSensitive")
  }

  test("normalizeText with foldAccents canonicalizes accent variants to one key") {
    val a = one[String](TextFns.normalizeText(col("t"), foldAccents = true), "  NÃO   aqui ")
    val b = one[String](TextFns.normalizeText(col("t"), foldAccents = true), "nao aqui")
    assert(a == "nao aqui" && a == b)
    // default path unchanged: accents survive without the flag
    assert(one[String](TextFns.normalizeText(col("t")), "NÃO aqui") == "não aqui")
  }
}
