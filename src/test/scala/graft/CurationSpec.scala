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
}
