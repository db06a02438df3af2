package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text feature columns (SURVEY §2.2): all built from codegen'd native
 * string/array functions — no UDFs — so they run inside whole-stage
 * codegen over 100 TB of documents.
 */
object TextFns {

  /** Whitespace tokenization (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * BPE-ish pre-tokenizer pattern (GPT-2 shape): contraction suffixes,
   * space-prefixed letter runs, digit runs, punctuation runs, whitespace
   * runs. Restricted to constructs with identical semantics in Java
   * regex and RE2 (no lookahead; explicit `[ \t\n\f\r]` whitespace class
   * because Java `\s` includes U+000B and RE2's does not) so DuckDB
   * oracle counts match.
   */
  val bpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\f\\r]+"

  /** Subword-aware token count: matches of [[bpeTokenPattern]]. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** Count of tokens found in a stopword list (language-ID signal). */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))

  /**
   * Distinct word k-shingles; documents shorter than k tokens collapse to
   * a single whole-text shingle (so every doc has a non-empty set).
   */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + lit(1), lit(k)), " "))))
      .otherwise(array(array_join(toks, " ")))

  /**
   * Distinct word k-shingles straight from the raw text via the one-pass
   * codegen [[graft.plans.WordShingles]] expression — value-identical to
   * `wordShingles(tokens(text), k)` (joining k consecutive tokens with
   * the single-space separator reproduces the original byte range), but
   * one byte walk per text instead of a token array plus per-shingle
   * slice/join allocations. The hot path for shingling a corpus.
   */
  def wordShingles(spark: org.apache.spark.sql.SparkSession,
      text: Column, k: Int): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function(graft.plans.GraftFunctions.wordShinglesName, text, lit(k))
  }

  /** Distinct character k-grams of the raw text. */
  def charGrams(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => text.substr(i, lit(k))))

  /**
   * Exact Jaccard of two texts' char-k-gram sets via the one-pass codegen
   * [[graft.plans.CharGramJaccard]] expression — value-identical to
   * `jaccard(charGrams(a, k), charGrams(b, k))` without materializing
   * either gram array. The hot path for pairwise n-gram similarity.
   */
  def charGramJaccard(spark: org.apache.spark.sql.SparkSession,
      a: Column, b: Column, k: Int): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function(graft.plans.GraftFunctions.charGramJaccardName, a, b, lit(k))
  }

  /**
   * Containment of `a`'s char-k-gram set in `b`'s — |∩| / |grams(a)| —
   * via the codegen [[graft.plans.CharGramContainment]] expression.
   * The ASYMMETRIC near-dup score: a short excerpt copied into a long
   * document scores ~1 while its Jaccard vanishes (union dominated by
   * the long side) — the sub-document duplication metric.
   */
  def charGramContainment(spark: org.apache.spark.sql.SparkSession,
      a: Column, b: Column, k: Int): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function(graft.plans.GraftFunctions.charGramContainmentName, a, b, lit(k))
  }

  /**
   * Jaro-Winkler similarity in [0,1] via the codegen
   * [[graft.plans.JaroWinkler]] expression — the record-linkage scorer
   * for short human-keyed strings (names, brands): prefix-weighted,
   * transposition-tolerant, where Levenshtein counts raw edits.
   */
  def jaroWinkler(spark: org.apache.spark.sql.SparkSession,
      a: Column, b: Column): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function(graft.plans.GraftFunctions.jaroWinklerName, a, b)
  }

  /** Jaccard similarity of two pre-distinct sets: |∩| / |∪| (exact ints → exact double). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /**
   * Heuristic quality score in [0,1]: length saturation + stopword density
   * + char-length saturation, mirroring the usual pretraining-corpus
   * quality gates. Fixed evaluation order keeps doubles bit-stable across
   * engines.
   */
  def qualityScore(nTokens: Column, nStop: Column, nChars: Column): Column =
    lit(0.5) * least(nTokens.cast("double") / 100.0, lit(1.0)) +
      lit(0.3) * (nStop.cast("double") / greatest(nTokens, lit(1))) +
      lit(0.2) * least(nChars.cast("double") / 500.0, lit(1.0))

  /** n-gram-heuristic language ID over stopword families. */
  def langId(toks: Column): Column = {
    val en = stopwordHits(toks, Seq("the", "a", "of", "and", "is"))
    val es = stopwordHits(toks, Seq("el", "la", "de", "los", "es"))
    val pt = stopwordHits(toks, Seq("o", "os", "um", "uma", "não"))
    when(en >= es && en >= pt && en > 0, "en")
      .when(es >= pt && es > 0, "es")
      .when(pt > 0, "pt")
      .otherwise("und")
  }

  /**
   * Document fingerprint: md5 of whitespace-normalized lowercased text.
   * md5 (not xxhash) so fingerprints are engine-portable.
   */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), " +", " "))

  /**
   * Canonical text normalization before hashing/dedup: lowercase,
   * collapse every whitespace run to one space, trim. The whitespace
   * class is spelled `[ \t\n\f\r]` (not `\s`) so the regex means the
   * same thing in Java and RE2-family engines — the portability rule
   * every oracle-shared pattern in this codebase follows.
   */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[ \t\n\f\r]+", " "))

  /**
   * [[normalizeText]] with optional accent folding BEFORE lowercasing —
   * the dedup-canonicalization a latin-script corpus needs (the
   * reference corpus is latin1 pt-BR, dag.py:47, where `não`/`nao`
   * variants are the first dedup false-negative).
   */
  def normalizeText(text: Column, foldAccents: Boolean): Column =
    normalizeText(if (foldAccents) stripAccents(text) else text)

  // the NFD-decomposable Latin-1 Supplement + Latin Extended-A
  // characters and their mark-stripped bases, as parallel code-point
  // strings for `translate`
  private val accentedChars =
    "ÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ" +
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ" +
    "ĀāĂăĄąĆćĈĉĊċČčĎďĒēĔĕĖėĘęĚěĜĝĞğĠġĢģĤĥĨĩĪīĬĭĮįİ" +
    "ĴĵĶķĹĺĻļĽľŃńŅņŇňŌōŎŏŐőŔŕŖŗŘřŚśŜŝŞşŠšŢţŤť" +
    "ŨũŪūŬŭŮůŰűŲųŴŵŶŷŸŹźŻżŽž"
  private val unaccentedChars =
    "AAAAAACEEEEIIIINOOOOOUUUUY" +
    "aaaaaaceeeeiiiinooooouuuuyy" +
    "AaAaAaCcCcCcCcDdEeEeEeEeEeGgGgGgGgHhIiIiIiIiI" +
    "JjKkLlLlLlNnNnNnOoOoOoRrRrRrSsSsSsSsTtTt" +
    "UuUuUuUuUuUuWwYyYZzZzZz"

  /**
   * Accent/diacritic folding — DuckDB `strip_accents` semantics
   * (NFD-decompose, drop combining marks): every Latin-1 Supplement and
   * Latin Extended-A character WITH a canonical decomposition maps to
   * its base letter via one codegen `translate` (both engines translate
   * per code point). Characters with NO decomposition — Đđ ıŁł Øø Ææ ß
   * Þþ Ðð — intentionally pass through unchanged, exactly as
   * `strip_accents` leaves them (they are distinct letters, not
   * accented variants). Pure per-row projection, zero shuffle,
   * oracle-verified byte-identical to DuckDB (q128).
   */
  def stripAccents(text: Column): Column =
    translate(text, accentedChars, unaccentedChars)

  // ----------------------- Gopher/C4-style repetition quality signals
  // (Rae et al. 2021 §A1.1; Raffel et al. 2020 §2.2) — all native
  // expressions, integer counts divided last so doubles are bit-stable
  // across engines.

  /** Fraction of lines that repeat an earlier line: (total - distinct) /
   *  total. `split` of an empty text yields one empty line, so the
   *  denominator is never zero. */
  def duplicateLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    (size(lines) - size(array_distinct(lines))).cast("double") / size(lines)
  }

  /**
   * Intra-document repeated-line REMOVAL (the transform behind the
   * [[duplicateLineFraction]] signal): every line keeps its first
   * occurrence, later repeats are dropped, first-occurrence order is
   * preserved. `array_distinct` is specified to keep first occurrences
   * in encounter order, so the whole transform is one per-row codegen
   * projection — ZERO shuffle, unlike corpus-global line dedup
   * ([[graft.operators.Dedup.globalLineDedup]]) which must hash-shuffle
   * line content.
   */
  def dedupLinesInDoc(text: Column): Column =
    array_join(array_distinct(split(text, "\n")), "\n")

  /**
   * Fraction of all word n-grams taken by the single most frequent one —
   * the Gopher repetition gate. Computed per row with NO shuffle and NO
   * nested higher-order re-evaluation: the gram array is built once,
   * sorted, and a single `aggregate` fold counts the longest equal run
   * (sorted order makes run length == gram frequency). Documents
   * shorter than n tokens score 0.0.
   */
  def topNGramFraction(toks: Column, n: Int): Column = {
    val grams = array_sort(transform(sequence(lit(0), size(toks) - n),
      i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
    val zero = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("mx"))
    val maxRun = aggregate(grams, zero,
      (acc, g) => {
        val run = when(g === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("mx"), run).as("mx"))
      },
      acc => acc.getField("mx"))
    when(size(toks) >= n, maxRun.cast("double") / (size(toks) - (n - 1)))
      .otherwise(lit(0.0))
  }

  /**
   * [[topNGramFraction]] straight from the raw text via the one-pass
   * codegen [[graft.plans.TopGramShare]] expression — value-identical on
   * non-null input (exact substring counts over the same byte-range
   * grams), one byte walk + hash-map count instead of an interpreted
   * sort-and-fold. The hot path for gating a corpus.
   */
  def topNGramFraction(spark: org.apache.spark.sql.SparkSession,
      text: Column, n: Int): Column = {
    graft.plans.GraftFunctions.register(spark)
    call_function(graft.plans.GraftFunctions.topGramShareName, text, lit(n))
  }

  /** Symbol-to-word ratio: non-letter/digit/space characters per token. */
  /** Sentence count: runs of terminal punctuation, floored at 1 so the
   *  readability division is total (fragment = one sentence). */
  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))

  /** Approximate syllable count: vowel-group runs (the standard cheap
   *  estimator; exact syllabification needs a dictionary). */
  def syllableEstimate(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))

  /**
   * Flesch reading-ease estimate: 206.835 − 1.015·(words/sentences) −
   * 84.6·(syllables/words) — the readability band filter corpus
   * pipelines use (too-low = legalese/OCR garble, too-high = listicle
   * fragments). All three counts are exact ints from RE2-portable
   * regexes; the score is a fixed IEEE sequence, engine-identical.
   * `tokenCount ≥ 1` by split semantics, `sentenceCount ≥ 1` by its
   * floor — both divisions total.
   */
  def fleschReadability(text: Column): Column = {
    val w = tokenCount(text).cast("double")
    val s = sentenceCount(text).cast("double")
    val sy = syllableEstimate(text).cast("double")
    lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (sy / w)
  }

  def symbolToWordRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^\\p{L}\\p{N} ]"), lit(0))).cast("double") /
      greatest(size(split(text, " ")), lit(1))

  /** Mean word length in characters (short-word soup and long-token
   *  garbage both sit far from natural prose's 3-10 band). */
  def meanWordLength(toks: Column): Column =
    aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") /
      greatest(size(toks), lit(1))

  // ------------------------------------------------- PII redaction (q68)
  // ASCII-only patterns restricted to constructs with identical semantics
  // in Java regex and RE2, so the DuckDB oracle redacts byte-identically.

  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern: String = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val phonePattern: String = "\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"

  /**
   * PII redaction: emails, IPv4 addresses, and phone-shaped digit runs
   * replaced by `token` — standard pretraining hygiene (models memorize
   * verbatim contact strings). Three codegen'd `regexp_replace` passes;
   * email runs first so its digit/dot tail can't half-match as an IP.
   */
  def redactPii(text: Column, token: String = "<PII>"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, token),
        ipv4Pattern, token),
      phonePattern, token)

  /**
   * URL canonicalization — the dedup key normalizer for web-crawled
   * corpora, where the same page arrives as `HTTP://Site.COM:80/a/?utm_
   * source=x#top` and `http://site.com/a`. Rules (each a standard crawl
   * canonicalization): lowercase scheme+host only (paths are
   * case-significant), strip the scheme's default port (:80 http, :443
   * https), drop the fragment, strip trailing path slashes, drop
   * tracking parameters (utm_*, fbclid), and sort the surviving query
   * parameters. The parameter pass is split → filter → array_sort →
   * array_join (ONE lambda HOF; sort/join evaluate their input once) —
   * a single-pass regexp_replace can't delete consecutive tracking
   * params. `concat_ws` + `nullif` re-attach the '?' only when
   * parameters survive. Pure per-row column ops, zero shuffle.
   */
  def canonicalizeUrl(url: Column): Column = {
    val schemeHost = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val canonHost = regexp_replace(
      regexp_replace(lower(schemeHost), "^(http://[^:]*):80$", "$1"),
      "^(https://[^:]*):443$", "$1")
    val rest = url.substr(length(schemeHost) + 1, length(url))
    val noFrag = regexp_replace(rest, "#.*", "")
    val path = regexp_replace(regexp_replace(noFrag, "\\?.*", ""), "/+$", "")
    val params = filter(split(regexp_extract(noFrag, "\\?(.*)", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_") && !p.startsWith("fbclid="))
    concat_ws("?", concat(canonHost, path),
      nullif(array_join(array_sort(params), "&"), lit("")))
  }

  // ------------------------------------- C4-style line filtering (q69)

  /**
   * C4's line-level cleanup (Raffel et al. 2020 §2.2): keep only lines
   * that end in terminal punctuation, have at least `minWords` words,
   * and contain no boilerplate marker (javascript notices, lorem ipsum,
   * code braces). Returns the surviving lines as an array; callers
   * re-join with "\n" or gate on the kept count. One `filter` pass over
   * the split — per-row, no shuffle.
   */
  def c4KeptLines(
      text: Column,
      boilerplate: Seq[String] = Seq("javascript", "lorem ipsum", "{"),
      minWords: Int = 3): Column =
    filter(split(text, "\n"), l =>
      boilerplate.map(b => !lower(l).contains(b))
        .foldLeft(l.rlike("[.!?\"]$") && size(split(l, " ")) >= minWords)(_ && _))
}
