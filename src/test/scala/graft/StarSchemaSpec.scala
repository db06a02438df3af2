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

  test("dimWithHashKey: null components neither collide nor null the surrogate") {
    val d = Seq(
      (Some("a"), Some("")), (Some("a"), None), (Some("a"), Some("b")),
      (Some("b"), None),
    ).toDF("uf", "zone")
    val dim = StarSchema.dimWithHashKey(d, Seq("uf", "zone"), "id").collect()
    assert(dim.length == 4)
    // every surrogate is non-null (null keys would be unjoinable) and the
    // four natural keys -- including two distinct null-containing tuples
    // and a null-vs-empty pair -- get four distinct surrogates
    assert(dim.forall(r => !r.isNullAt(r.fieldIndex("id"))))
    assert(dim.map(_.getAs[String]("id")).distinct.length == 4)
  }

  test("dimWithDenseKey: dense 1..n keys in natural-key order") {
    val dim = StarSchema.dimWithDenseKey(src, Seq("uf"), "id")
      .orderBy("id").collect()
    assert(dim.map(_.getAs[Int]("id")).toSeq == Seq(1, 2))
    assert(dim.map(_.getAs[String]("uf")).toSeq == Seq("rj", "sp")) // ordered
  }

  test("dimWithDenseKeyScalable matches the single-window form exactly") {
    val li = sources.Tables(spark, sf0001).lineitem
    val keys = Seq("l_orderkey", "l_linenumber")
    val scalable = StarSchema.dimWithDenseKeyScalable(li, keys, "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val ref = StarSchema.dimWithDenseKey(li, keys, "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2).toLong))
    assert(scalable.length == ref.length)
    assert(scalable.toSeq == ref.toSeq) // dense 1..n in natural-key order
  }

  test("scd2Merge versions changed keys, inserts new ones, keeps history") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2020-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2021-01-01 00:00:00")
    val existing = Seq(
      // k=1: history row (already closed) + current row
      (1L, "old", t0, Some(t1), false), (1L, "v1", t1, None, true),
      (2L, "v1", t0, None, true), // will change
      (3L, "v1", t0, None, true), // re-arrives unchanged
      (4L, "v1", t0, None, true), // absent from incoming
    ).map { case (k, a, f, to, c) => (k, a, f, to.orNull, c) }
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val eff = Timestamp.valueOf("2022-01-01 00:00:00")
    val incoming = Seq((1L, "v1"), (2L, "v2"), (3L, "v1"), (9L, "new"))
      .toDF("k", "attr")
    val rows = StarSchema.scd2Merge(existing, incoming, Seq("k"), Seq("attr"),
        lit(eff.toString).cast("timestamp"))
      .collect()
    assert(rows.length == 7) // Set compare below would hide duplicates
    val out = rows
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, "old", t0, Some(t1), false),  // history untouched
      (1L, "v1", t1, None, true),        // unchanged current survives
      (2L, "v1", t0, Some(eff), false),  // changed key: closed at eff
      (2L, "v2", eff, None, true),       //   ... and re-versioned
      (3L, "v1", t0, None, true),        // re-arrived identical: untouched
      (4L, "v1", t0, None, true),        // absent from incoming: untouched
      (9L, "new", eff, None, true),      // brand-new key inserted current
    ))
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

  test("cdcApply: last writer wins, deletes drop keys, untouched rows survive") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a1", "U", 1), (1L, "a2", "U", 2),  // two updates: ts 2 wins
      (2L, "xx", "U", 1), (2L, "xx", "D", 2),  // update then delete: gone
      (4L, "d", "U", 1),                       // insert of a new key
      (5L, "e", "U", 1), (5L, "ee", "D", 0),   // delete superseded by update
    ).toDF("k", "v", "op", "ts")
    val out = StarSchema.cdcApply(base, changes, Seq("k"),
        orderBy = Seq(col("ts")), opCol = "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a2"), (3L, "c"), (4L, "d"), (5L, "e")))
  }

  test("snapshotDiff emits exactly the I/U/D rows; unchanged keys are silent") {
    val oldS = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val newS = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val out = StarSchema.snapshotDiff(oldS, newS, Seq("k"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((2L, "B", "U"), (3L, "c", "D"), (4L, "d", "I")))
  }

  test("snapshotDiff inverts through cdcApply: applying the diff rebuilds the new snapshot") {
    val oldS = Seq((1L, "a"), (2L, "b"), (3L, "c"), (7L, "x")).toDF("k", "v")
    val newS = Seq((1L, "a"), (2L, "B2"), (5L, "new")).toDF("k", "v")
    val diff = StarSchema.snapshotDiff(oldS, newS, Seq("k"), Seq("v"))
    val rebuilt = StarSchema.cdcApply(oldS, diff, Seq("k"),
      orderBy = Seq(lit(1)), opCol = "op")
    assert(rebuilt.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      newS.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("cdcApply is idempotent: re-applying the same changelog is a no-op") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((1L, "a1", "U", 1), (2L, "zz", "D", 1)).toDF("k", "v", "op", "ts")
    val once = StarSchema.cdcApply(base, changes, Seq("k"), Seq(col("ts")), "op")
    val twice = StarSchema.cdcApply(once, changes, Seq("k"), Seq(col("ts")), "op")
    assert(once.collect().toSet == twice.collect().toSet)
  }
}
