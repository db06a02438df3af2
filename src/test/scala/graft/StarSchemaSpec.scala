package graft

import org.apache.spark.sql.functions._

import graft.operators.StarSchema

class StarSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val src = Seq(
    ("sp", "urban", 10.0), ("sp", "rural", 20.0), ("rj", "urban", 30.0),
  ).toDF("uf", "zone", "m")

  test("dimWithHashKey: one row per natural key, stable key") {
    val dim = StarSchema.dimWithHashKey(src, Seq("uf", "zone"), "id")
    assert(dim.count() == 3)
    val again = StarSchema.dimWithHashKey(src, Seq("uf", "zone"), "id")
    assert(dim.collect().map(_.getAs[String]("id")).sorted
      sameElements again.collect().map(_.getAs[String]("id")).sorted)
  }

  test("dimWithHashKey: null components never collide with empty or absent ones") {
    val d = Seq(
      (Some("a"), Some("")), (Some("a"), None), (Some("a"), Some("b")),
    ).toDF("uf", "zone")
    val dim = StarSchema.dimWithHashKey(d, Seq("uf", "zone"), "id").collect()
    assert(dim.length == 3)
    // any-null tuple -> null surrogate (DuckDB `a || chr(1) || b` semantics)
    val (nullId, nonNullId) = dim.partition(r => r.isNullAt(r.fieldIndex("id")))
    assert(nullId.map(r => Option(r.getAs[String]("zone"))).toSeq == Seq(None))
    // the two non-null keys stay distinct
    assert(nonNullId.map(_.getAs[String]("id")).distinct.length == 2)
  }

  test("dimWithDenseKey: dense 1..n keys in natural-key order") {
    val dim = StarSchema.dimWithDenseKey(src, Seq("uf"), "id")
      .orderBy("id").collect()
    assert(dim.map(_.getAs[Int]("id")).toSeq == Seq(1, 2))
    assert(dim.map(_.getAs[String]("uf")).toSeq == Seq("rj", "sp")) // ordered
  }

  test("buildFact attaches every FK and keeps measures") {
    val dimUf = StarSchema.dimWithHashKey(src, Seq("uf"), "id_uf")
    val dimZone = StarSchema.dimWithHashKey(src, Seq("zone"), "id_zone")
    val fact = StarSchema.buildFact(src,
      Seq((dimUf, Seq("uf"), "id_uf"), (dimZone, Seq("zone"), "id_zone")),
      measures = Seq("m"))
    assert(fact.columns.toSeq == Seq("id_uf", "id_zone", "m"))
    assert(fact.count() == 3)
    assert(fact.filter(col("id_uf").isNull || col("id_zone").isNull).count() == 0)
  }
}
