package graft

import java.nio.charset.Charset
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.{Sources, Tables}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv reader honors the reference dialect: ';' separator + latin1") {
    val dir = Files.createTempDirectory("graft_csv")
    val f = dir.resolve("d.csv")
    // latin1 bytes, ';'-separated — the reference's datatran dialect
    Files.write(f, "id;municipio\n1;São Paulo\n2;Brasília\n"
      .getBytes(Charset.forName("ISO-8859-1")))
    val df = Sources.csv(spark, f.toString, sep = ";", encoding = "ISO-8859-1")
    assert(df.columns.toSeq == Seq("id", "municipio"))
    assert(df.orderBy("id").select("municipio").as[String].collect().toSeq
      == Seq("São Paulo", "Brasília"))
  }

  test("table catalog reads every sf table; events ts is a usable timestamp") {
    val t = Tables(spark, sf0001)
    val all = Seq(t.region, t.nation, t.customer, t.supplier, t.part,
      t.orders, t.lineitem, t.events, t.documents, t.embeddings)
    all.foreach(df => assert(df.columns.nonEmpty))
    val hours = t.events.select(hour(col("ts"))).distinct().count()
    assert(hours > 1) // nanos were converted, not left as raw longs
  }

  test("jdbc writer builds a batched append configuration without a live DB") {
    val w = Sources.jdbcWriter(Seq((1, "a")).toDF("id", "v"),
      "jdbc:postgresql://example/db", "t", "u", "p")
    assert(w != null) // construction is the contract; .save() needs a DB
  }

  test("multimodal decode keeps ids, is deterministic, and sizes match payloads") {
    val docs = Tables(spark, sf0001).documents.limit(50)
    val payloads = Multimodal.attachPayload(docs, "text", "doc_id")
    assert(payloads.schema("media_meta").dataType.typeName == "struct")
    val feats = Multimodal.decodeFeatures(spark, payloads, "payload", "doc_id")
    val joined = feats.toDF().join(docs, "doc_id")
      .filter(col("bytes") =!= octet_length(col("text")).cast("long"))
    assert(joined.count() == 0)
    val twice = Multimodal.decodeFeatures(spark, payloads, "payload", "doc_id")
    assert(feats.collect().toSet == twice.collect().toSet)
  }
}
