package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/**
 * Composed corpus-curation pipeline (SURVEY §2.2 capstone): the standard
 * pre-training recipe — language filter → quality filter → exact dedup —
 * as ONE declarative plan. Each stage is a library operator; composing
 * them keeps everything in a single Catalyst plan, so the scan is read
 * once, the scoring projections fuse into one codegen stage, and the
 * only shuffle is the dedup window's hash partition by text.
 */
object Curation {

  /**
   * Score, filter, and dedup a document corpus:
   *  1. language-ID over stopword families, keep `langs`;
   *  2. quality score (token count, stopword ratio, length), keep
   *     >= `minQuality`;
   *  3. exact dedup on the text, electing the lowest `id` per group.
   * Returns (id, lang, quality) for the surviving documents.
   */
  def curate(
      df: DataFrame, id: String, textCol: String, nCharsCol: String,
      stopwords: Seq[String], langs: Seq[String],
      minQuality: Double): DataFrame = {
    val text = col(textCol)
    val toks = TextFns.tokens(text)
    val scored = df.select(
        col(id), text,
        TextFns.langId(toks).as("lang"),
        TextFns.qualityScore(
          TextFns.tokenCount(text),
          TextFns.stopwordHits(toks, stopwords),
          col(nCharsCol)).as("quality"))
      .filter(col("lang").isin(langs.map(x => x: Any): _*) &&
        col("quality") >= minQuality)
    Relational.keepFirst(scored, keys = Seq(text), order = Seq(col(id)))
      .select(col(id), col("lang"), col("quality"))
  }
}
