package graft

import org.apache.spark.sql.functions._

import graft.operators.Features

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val qps = Seq(0.0 -> "p0", 0.1 -> "p10", 0.25 -> "p25",
    0.5 -> "p50", 0.9 -> "p90", 1.0 -> "p100")

  /** Bitwise row compare of groupQuantiles vs the percentile aggregate. */
  private def assertQuantileParity(
      df: org.apache.spark.sql.DataFrame, keys: Seq[String]): Unit = {
    val got = Features.groupQuantiles(df, keys, "v", qps, countAs = Some("n"))
    val aggs = count(col("v")).as("n") +:
      qps.map { case (p, nm) => percentile(col("v"), lit(p)).as(nm) }
    val want =
      if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val key = (r: org.apache.spark.sql.Row) =>
      keys.map(k => String.valueOf(r.getAs[Any](k))).mkString("")
    val bits = (r: org.apache.spark.sql.Row) => (qps.map(_._2)).map { c =>
      if (r.isNullAt(r.fieldIndex(c))) "null"
      else java.lang.Double.doubleToLongBits(r.getAs[Double](c)).toString
    } :+ r.getAs[Long]("n").toString
    val g = got.collect().map(r => key(r) -> bits(r)).toMap
    val w = want.collect().map(r => key(r) -> bits(r)).toMap
    assert(g.keySet == w.keySet, s"group sets differ: ${g.keySet} vs ${w.keySet}")
    for ((k, wb) <- w) assert(g(k) == wb, s"group '$k': got ${g(k)} want $wb")
  }

  test("groupQuantiles: bitwise parity with percentile across ties/nulls/null keys/singletons") {
    val rows: Seq[(String, Option[Double])] = Seq(
      "a" -> Some(1.0), "a" -> Some(2.5), "a" -> Some(2.5), "a" -> Some(-3.25),
      "a" -> None,
      "b" -> Some(0.1), "b" -> Some(0.2), "b" -> Some(0.3), "b" -> Some(0.4),
      "b" -> Some(0.7),
      "c" -> Some(42.0),
      (null: String) -> Some(5.0), (null: String) -> Some(7.0),
      "d" -> None, "d" -> None)
    assertQuantileParity(rows.toDF("k", "v").repartition(5), Seq("k"))
  }

  test("groupQuantiles: bitwise parity on a dense pseudo-random frame, keyed and keyless") {
    // deterministic high-cardinality doubles incl. duplicates runs
    val df = spark.range(2000).select(
      (col("id") % 7).cast("string").as("k"),
      when(col("id") % 97 === 0, lit(null).cast("double"))
        .when(col("id") % 13 === 0, lit(2.5))
        .otherwise(sin(col("id").cast("double")) * 1e3).as("v"))
      .repartition(11)
    assertQuantileParity(df, Seq("k"))
    assertQuantileParity(df, Nil)
  }

  test("groupQuantiles: keyless empty and all-null inputs emit one null row like the aggregate") {
    val empty = Seq.empty[Double].toDF("v")
    val got = Features.groupQuantiles(empty, Nil, "v", Seq(0.5 -> "p50"),
      countAs = Some("n")).collect()
    assert(got.length == 1 && got.head.getLong(0) == 0L && got.head.isNullAt(1))
    val allNull = Seq[Option[Double]](None, None).toDF("v")
    val got2 = Features.groupQuantiles(allNull, Nil, "v", Seq(0.5 -> "p50")).collect()
    assert(got2.length == 1 && got2.head.isNullAt(0))
  }

  test("zscore standardizes per group; zero-variance groups map to 0") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 5.0),
    ).toDF("k", "v")
    val out = Features.zscore(df, "v", Seq("k"))
      .groupBy("k").agg(
        min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("v")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    // group a: mean 2, stddev_pop sqrt(2/3); z in {-1,0,1} * sqrt(3/2)
    val sd = math.sqrt(2.0 / 3.0)
    assert(math.abs(out("a")._1 - (-1.0 / sd)) < 1e-12)
    assert(math.abs(out("a")._2 - (1.0 / sd)) < 1e-12)
    assert(math.abs(out("a")._3) < 1e-12)
    assert(out("b") == ((0.0, 0.0, 0.0)))
  }

  test("zscore zero-variance guard holds when the moments cancel only approximately") {
    // n identical 0.1s: n*sxx - sx*sx lands a few ulps NEGATIVE after the
    // decimal->double casts; without the clamp sigma would be NaN, not 0
    val df = Seq.fill(7)(0.1).toDF("v").withColumn("k", lit("g"))
    val out = Features.zscore(df, "v", Seq("k"))
      .select("v").as[Double].collect().toSeq
    assert(out == Seq.fill(7)(0.0), s"expected all-zero z, got $out")
  }

  test("zscore with no keys standardizes globally") {
    val out = Features.zscore((1 to 9).map(_.toDouble).toDF("v"), "v", Nil)
      .agg(sum(col("v")), max(col("v"))).collect().head
    assert(math.abs(out.getDouble(0)) < 1e-12)
    // mean 5, sigma_pop sqrt(60/9); max z = 4/sigma
    assert(math.abs(out.getDouble(1) - 4.0 / math.sqrt(60.0 / 9.0)) < 1e-12)
  }

  test("minmaxScale maps to [0,1] per group; degenerate groups to 0") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 7.0)).toDF("k", "v")
    val out = Features.minmaxScale(df, "v", Seq("k"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out == Set(("a", 0.0), ("a", 0.5), ("a", 1.0), ("b", 0.0)))
  }

  test("weightThresholdHex is monotone and clamps at the ends") {
    assert(Features.weightThresholdHex(-0.5) == "00000000")
    assert(Features.weightThresholdHex(0.0) == "00000000")
    assert(Features.weightThresholdHex(1.0) == "g")
    assert(Features.weightThresholdHex(1.5) == "g")
    assert(Features.weightThresholdHex(0.5) == "80000000")
    val hs = Seq(0.1, 0.25, 0.5, 0.75, 0.9).map(Features.weightThresholdHex)
    assert(hs == hs.sorted && hs.distinct == hs)
  }

  test("mixtureSample: weight 1 keeps all, 0 drops all, 0.5 is ~half and deterministic") {
    val df = (0 until 2000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    assert(Features.mixtureSample(df, "src", "id", Map("a" -> 1.0), 0.0).count() == 1000)
    assert(Features.mixtureSample(df, "src", "id", Map("a" -> 0.0), 1.0).count() == 1000)
    val half = Features.mixtureSample(df, "src", "id", Map("a" -> 0.5, "b" -> 0.5))
    val n = half.count()
    assert(n > 850 && n < 1150, s"expected ~1000 of 2000 at w=0.5, got $n")
    val again = Features.mixtureSample(df, "src", "id", Map("a" -> 0.5, "b" -> 0.5))
    assert(half.select("id").except(again.select("id")).count() == 0)
    assert(again.count() == n)
  }

  test("mixtureSample is stable under corpus growth (old decisions unchanged)") {
    val small = (0 until 500).map(i => (i.toLong, "a")).toDF("id", "src")
    val big = (0 until 1000).map(i => (i.toLong, "a")).toDF("id", "src")
    val w = Map("a" -> 0.3)
    val kept = Features.mixtureSample(small, "src", "id", w).select("id").as[Long].collect().toSet
    val keptBig = Features.mixtureSample(big, "src", "id", w)
      .filter(col("id") < 500).select("id").as[Long].collect().toSet
    assert(kept == keptBig)
  }

  test("sampleKPerGroup caps each group at k, identically on any layout") {
    val df = (1L to 200L).map(i => (s"s${i % 5}", i)).toDF("src", "id")
    val a = Features.sampleKPerGroup(df, Seq("src"), "id", 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a.groupBy(_._1).values.forall(_.size == 7))
    val b = Features.sampleKPerGroup(df.repartition(13), Seq("src"), "id", 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
    // a group smaller than k survives whole
    val tiny = Features.sampleKPerGroup(
      Seq(("only", 1L), ("only", 2L)).toDF("src", "id"), Seq("src"), "id", 7)
    assert(tiny.count() == 2)
  }

  test("hashSplit: fractions near targets, labels stable under corpus growth") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Features.hashSplit((1L to 2000L).toDF("id"), "id", splits)
    val frac = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(frac("train") / 2000.0 - 0.8) < 0.05, frac.toString)
    assert(math.abs(frac("val") / 2000.0 - 0.1) < 0.03, frac.toString)
    assert(math.abs(frac("test") / 2000.0 - 0.1) < 0.03, frac.toString)
    // growth stability: rows 1-1000 keep their labels when 1000 more arrive
    val small = Features.hashSplit((1L to 1000L).toDF("id"), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small.forall { case (k, v) => big(k) == v })
  }

  test("chunkDocuments: coverage, overlap, tail clamp, empty docs dropped") {
    val docs = Seq(
      (0L, "abcdefghijklmnop"),   // 16 chars
      (1L, "xy"),                 // shorter than one chunk
      (2L, ""),                   // no chunks
      (3L, "uvwxyz"),             // 6 chars: start 4 would be a contained tail
    ).toDF("doc_id", "text")
    val out = Features.chunkDocuments(docs, "doc_id", "text", chunkChars = 6, overlapChars = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // starts advance by step = 4; every chunk is 6 chars except the tail
    assert(byDoc(0L) == Seq((0L, 0L, "abcdef"), (0L, 4L, "efghij"),
      (0L, 8L, "ijklmn"), (0L, 12L, "mnop")))
    // consecutive chunks share exactly overlap chars
    byDoc(0L).sliding(2).foreach { case Seq((_, _, a), (_, s1, b)) =>
      assert(a.drop(4) == b.take(a.length - 4))
    case _ => }
    assert(byDoc(1L) == Seq((1L, 0L, "xy")))
    assert(!byDoc.contains(2L))
    // the whole doc fits in chunk 0: no redundant tail chunk at start 4
    assert(byDoc(3L) == Seq((3L, 0L, "uvwxyz")))
    // dropping each chunk's leading overlap (after the first) rebuilds the doc
    val rebuilt = byDoc(0L).zipWithIndex.map { case ((_, _, c), i) =>
      if (i == 0) c else c.drop(2) }.mkString
    assert(rebuilt == "abcdefghijklmnop")
  }

  test("packSequences covers every document exactly, in order, within budget") {
    val docs = Seq((1L, 3L), (2L, 10L), (3L, 4L), (4L, 7L), (5L, 1L), (6L, 0L))
      .toDF("doc_id", "tok")
    val budget = 8L
    val out = Features.packSequences(docs, "doc_id", col("tok"), budget)
      .orderBy("doc_id", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // total stream = 3+10+4+7+1 = 25 tokens -> seqs 0..3
    // doc1 [0,3) seq0; doc2 [3,13) seq0+seq1; doc3 [13,17) seq1+seq2;
    // doc4 [17,24) seq2+seq3(24? no: [17,24) spans seq2 [16,24) only);
    // doc5 [24,25) seq3; doc6 empty dropped
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L, 3L),
      (2L, 0L, 0L, 3L, 5L), (2L, 1L, 5L, 0L, 5L),
      (3L, 1L, 0L, 5L, 3L), (3L, 2L, 3L, 0L, 1L),
      (4L, 2L, 0L, 1L, 7L),
      (5L, 3L, 0L, 0L, 1L)))
    // invariants: per-doc spans concatenate to the doc; per-seq fill <= budget
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    assert(perDoc == Map(1L -> 3L, 2L -> 10L, 3L -> 4L, 4L -> 7L, 5L -> 1L))
    val perSeq = out.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    assert(perSeq.values.forall(_ <= budget))
    assert(perSeq == Map(0L -> 8L, 1L -> 8L, 2L -> 8L, 3L -> 1L))
  }

  test("packSequences matches a serial reference packing on random sizes") {
    val sizes = new scala.util.Random(7).shuffle((1 to 300).toList)
      .map(i => (i.toLong, (i % 13).toLong))
    val budget = 32L
    val expected = {
      var cum = 0L
      sizes.sortBy(_._1).filter(_._2 > 0).flatMap { case (id, tok) =>
        val start = cum; cum += tok
        (start / budget) to ((cum - 1) / budget) map { seq =>
          val lo = math.max(start, seq * budget)
          val hi = math.min(cum, (seq + 1) * budget)
          (id, seq, lo - start, lo - seq * budget, hi - lo)
        }
      }
    }
    val out = Features.packSequences(
        sizes.toDF("doc_id", "tok").repartition(5), "doc_id", col("tok"), budget)
      .orderBy("doc_id", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == expected)
  }

  test("lagFeatures never leaks the current row into its own features") {
    val d = (1 to 10).map(i => (1, i, i.toDouble)).toDF("k", "t", "v")
    val out = Features.lagFeatures(d, Seq("k"), Seq(col("t")), "v",
        lags = Seq(1, 2), meanWindows = Seq(3))
      .orderBy("t").collect()
    val r4 = out(3)
    assert(r4.getAs[Double]("lag_1") == 3.0 && r4.getAs[Double]("lag_2") == 2.0)
    assert(r4.getAs[Double]("mean_3") == 2.0) // (1+2+3)/3 — v=4 excluded
    assert(out.head.isNullAt(out.head.fieldIndex("mean_3"))) // no history
  }

  test("targetEncodeLOO excludes each row's own target; singletons are NULL") {
    val d = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 9.0)).toDF("c", "y")
    val out = Features.targetEncodeLOO(d, "c", "y")
      .orderBy("c", "y").collect()
      .map(r => Option(r.get(r.fieldIndex("target_enc"))).map(_.asInstanceOf[Double]))
    assert(out.toSeq == Seq(Some(2.5), Some(2.0), Some(1.5), None))
  }

  test("rfmScores quintiles each dimension per segment with entity tie-breaks") {
    // 5 customers in one segment: metrics strictly increase with id, so
    // with 5 rows and 5 buckets every score equals the customer's rank
    val tx = (1 to 5).flatMap { c =>
      (1 to c).map(i => ("SEG", c.toLong, java.sql.Date.valueOf(f"2024-01-$c%02d"), c * 100.0))
    }.toDF("seg", "cust", "d", "amt")
    val out = Features.rfmScores(tx, "cust", Seq("seg"), "d", "amt")
      .orderBy("cust").collect()
      .map(r => (r.getAs[Long]("cust"), r.getAs[Int]("r_score"),
        r.getAs[Int]("f_score"), r.getAs[Int]("m_score"), r.getAs[String]("rfm_cell")))
    assert(out.toSeq == (1 to 5).map(c => (c.toLong, c, c, c, s"$c$c$c")))
  }

  test("robustScale centers on the median and scales by IQR; zero-IQR groups scale to 0") {
    val d = (1 to 5).map(v => ("a", v.toDouble)) ++ Seq(("b", 7.0), ("b", 7.0))
    val out = Features.robustScale(d.toDF("k", "v"), "v", Seq("k"))
      .orderBy("k", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    // a: med 3, q1 2, q3 4 -> (v-3)/2
    assert(out.toSeq == Seq(
      ("a", -1.0), ("a", -0.5), ("a", 0.0), ("a", 0.5), ("a", 1.0),
      ("b", 0.0), ("b", 0.0)))
  }

  test("percentRankScale maps values to CDF positions; ties share ranks, layout independent") {
    val d = Seq(("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 40.0), ("a", 50.0),
      ("b", 7.0)).toDF("k", "v")
    val out = Features.percentRankScale(d.repartition(4), "v", Seq("k"))
      .orderBy("k", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("a", 10.0, 0.0), ("a", 20.0, 0.25), ("a", 20.0, 0.25),
      ("a", 40.0, 0.75), ("a", 50.0, 1.0),
      ("b", 7.0, 0.0))) // singleton group -> 0.0
    val ex = intercept[IllegalArgumentException] {
      Features.percentRankScale(d, "v", Nil)
    }
    assert(ex.getMessage.contains("single-partition"))
  }

  test("ntileBuckets splits groups into near-equal buckets; guards demand a total order") {
    val d = (1 to 10).map(i => ("a", i, i.toDouble)) :+ (("b", 1, 5.0))
    val out = Features.ntileBuckets(d.toDF("k", "id", "v").repartition(3),
        "v", Seq("k"), n = 4, tieBreak = Seq("id"))
      .orderBy("k", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(3)))
    // 10 rows into 4 buckets: sizes 3,3,2,2
    assert(out.toSeq == Seq(
      ("a", 1, 1), ("a", 2, 1), ("a", 3, 1), ("a", 4, 2), ("a", 5, 2),
      ("a", 6, 2), ("a", 7, 3), ("a", 8, 3), ("a", 9, 4), ("a", 10, 4),
      ("b", 1, 1)))
    val noTie = intercept[IllegalArgumentException] {
      Features.ntileBuckets(d.toDF("k", "id", "v"), "v", Seq("k"), 4, Nil)
    }
    assert(noTie.getMessage.contains("tie-break"))
    val noKeys = intercept[IllegalArgumentException] {
      Features.ntileBuckets(d.toDF("k", "id", "v"), "v", Nil, 4, Seq("id"))
    }
    assert(noKeys.getMessage.contains("single-partition"))
  }

  test("decileLift: positives concentrated up top give lift > 1 there, exact counts") {
    // 10 rows, scores 10..1; positives are the top 2 scores
    val d = (1 to 10).map(i => (i.toLong, (11 - i).toDouble, i <= 2)).toDF("id", "score", "pos")
    val out = Features.decileLift(d.repartition(3), "score", col("pos"), Nil,
        n = 5, tieBreak = Seq("id"))
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    // bucket 1 holds the 2 best scores -> both positives; overall rate 0.2
    assert(out(0) == ((1, 2L, 2L, 1.0, 5.0)))
    assert(out.drop(1).forall(b => b._3 == 0L && b._5 == 0.0))
  }

  test("hashingTrick: buckets match the md5 formula, counts exact, layout-independent") {
    def bucket(tok: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (BigInt(d.substring(0, 8), 16) % 64).toInt
    }
    val docs = Seq((1L, "a b a  c"), (2L, "a")).toDF("doc_id", "text")
    val out = Features.hashingTrick(docs.repartition(3), "doc_id", "text", nBuckets = 64)
    val rows = out.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expected = Seq( // empty token from the double space is dropped
      (1L, bucket("a"), 2L), (1L, bucket("b"), 1L), (1L, bucket("c"), 1L),
      (2L, bucket("a"), 1L))
    assert(rows.toSet == expected.toSet)
    assert(Features.hashingTrick(docs, "doc_id", "text", 64).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet == rows.toSet)
  }

  test("cohensKappa: hand-checked 2x2 matrix; degenerate pe=1 yields NULL") {
    val conf = Seq(("A", "A", 20L), ("A", "B", 5L), ("B", "A", 10L), ("B", "B", 15L))
      .toDF("t", "p", "n")
    val r = Features.cohensKappa(conf.repartition(2), "t", "p", "n").collect()(0)
    assert(r.getLong(0) == 50L && r.getDouble(1) == 0.7 && r.getDouble(2) == 0.5)
    assert(math.abs(r.getDouble(3) - 0.4) < 1e-15)
    val degen = Seq(("A", "A", 5L)).toDF("t", "p", "n")
    val d = Features.cohensKappa(degen, "t", "p", "n").collect()(0)
    assert(d.getDouble(1) == 1.0 && d.getDouble(2) == 1.0 && d.isNullAt(3))
  }

  test("aucExact: hand-checked separable, tied, and degenerate frames") {
    // perfectly separable: all positives above all negatives -> 1.0
    val sep = Seq((3.0, true), (4.0, true), (1.0, false), (2.0, false))
      .toDF("s", "pos")
    val r1 = Features.aucExact(sep.repartition(3), "s", col("pos")).collect()(0)
    assert(r1.getLong(0) == 2 && r1.getLong(1) == 2 && r1.getDouble(2) == 1.0)
    // all tied at one value -> 0.5 exactly (every pair counts half)
    val tied = Seq((1.0, true), (1.0, false), (1.0, true)).toDF("s", "pos")
    assert(Features.aucExact(tied, "s", col("pos")).collect()(0).getDouble(2) == 0.5)
    // mixed with ties: pos {1,2,2}, neg {2,3}; wins: (1:0)+(2:0.5+0.5)*2...
    // pairs: p1-n2 win? 1<2 loss(0), 1<3 0; 2 vs 2 tie .5 x2, 2 vs 3 0 x2
    // U = 0+0 + .5+0 + .5+0 = 1; AUC = 1/6
    val mixed = Seq((1.0, true), (2.0, true), (2.0, true), (2.0, false), (3.0, false))
      .toDF("s", "pos")
    val r3 = Features.aucExact(mixed.repartition(2), "s", col("pos")).collect()(0)
    assert(r3.getDouble(2) == 1.0 / 6.0)
    // degenerate: no negatives -> NULL
    val deg = Seq((1.0, true)).toDF("s", "pos")
    assert(Features.aucExact(deg, "s", col("pos")).collect()(0).isNullAt(2))
    // null scores are excluded entirely
    val withNull = Seq((Some(3.0), true), (None, true), (Some(1.0), false))
      .toDF("s", "pos")
    val r4 = Features.aucExact(withNull, "s", col("pos")).collect()(0)
    assert(r4.getLong(0) == 1 && r4.getLong(1) == 1 && r4.getDouble(2) == 1.0)
  }

  test("spearmanRho: perfect monotone = 1, reversed = -1, ties averaged, constant = NULL") {
    // |rho| lands within an ulp of 1, not exactly: the fixed closed-form
    // sequence ends in num/(sqrt(d1)*sqrt(d2)) — deterministic, not 1.0
    val up = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 25.0)).toDF("x", "y")
    val r1 = Features.spearmanRho(up.repartition(2), "x", "y").collect()(0).getDouble(1)
    assert(math.abs(r1 - 1.0) < 1e-12, s"rho=$r1")
    val down = Seq((1.0, 9.0), (2.0, 5.0), (3.0, 1.0)).toDF("x", "y")
    val r2 = Features.spearmanRho(down, "x", "y").collect()(0).getDouble(1)
    assert(math.abs(r2 + 1.0) < 1e-12, s"rho=$r2")
    // ties: x=(1,2,2,3) avg ranks (1,2.5,2.5,4), doubled (2,5,5,8);
    // y=(1,2,3,4) doubled (2,4,6,8). num = 4*118-400 = 72 = d1, d2 = 80
    // -> rho = 72/(sqrt(72)*sqrt(80)) = sqrt(0.9)
    val tied = Seq((1.0, 1.0), (2.0, 2.0), (2.0, 3.0), (3.0, 4.0)).toDF("x", "y")
    val rho = Features.spearmanRho(tied.repartition(3), "x", "y").collect()(0).getDouble(1)
    assert(math.abs(rho - math.sqrt(0.9)) < 1e-15, s"rho=$rho")
    // constant column -> NULL (zero rank variance)
    val const = Seq((1.0, 1.0), (1.0, 2.0)).toDF("x", "y")
    assert(Features.spearmanRho(const, "x", "y").collect()(0).isNullAt(1))
  }

  test("ksStatistic: disjoint samples = 1, identical = 0, hand-checked mix") {
    val disjoint = Seq((1.0, true), (2.0, true), (10.0, false), (11.0, false))
      .toDF("s", "a")
    val r = Features.ksStatistic(disjoint.repartition(3), "s", col("a")).collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 2 && r.getDouble(2) == 1.0)
    val same = Seq((1.0, true), (1.0, false), (2.0, true), (2.0, false)).toDF("s", "a")
    assert(Features.ksStatistic(same, "s", col("a")).collect()(0).getDouble(2) == 0.0)
    // A={1,2}, B={2,3}: at v=1 |1*2-0*2|=2; v=2 |2*2-1*2|=2; v=3 |2*2-2*2|=0
    // D = 2/4 = 0.5
    val mix = Seq((1.0, true), (2.0, true), (2.0, false), (3.0, false)).toDF("s", "a")
    assert(Features.ksStatistic(mix, "s", col("a")).collect()(0).getDouble(2) == 0.5)
  }

  test("calibrationBins: fixed-width binning, edge clamping, null drop, exact rates") {
    val df = Seq(
      (0.5, true), (0.9, true), (0.1, false),   // bin 0 of [0,1) w=0.2 -> no:
      (-1.0, true),                              // below lo -> clamps to 0
      (2.5, false),                              // above hi -> clamps to 4
    ).toDF("s", "pos")
      .union(Seq((Option.empty[Double], true)).toDF("s", "pos"))
    val out = Features.calibrationBins(df.repartition(3), "s", col("pos"),
      nBins = 5, lo = 0.0, hi = 1.0)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // w=0.2: 0.5->bin2, 0.9->bin4, 0.1->bin0, -1->bin0, 2.5->bin4; null dropped
    assert(out.toSeq == Seq(
      (0, 0.0, 2L, 1L, 0.5),
      (2, 0.4, 1L, 1L, 1.0),
      (4, 0.8, 2L, 1L, 0.5)))
  }

  test("percentileNormalize: exact within-group cume_dist; ties share a value; guard") {
    val d = Seq(
      ("s1", 10.0), ("s1", 20.0), ("s1", 20.0), ("s1", 30.0),
      ("s2", 1.0),
    ).toDF("src", "q")
    val out = Features.percentileNormalize(d.repartition(3), Seq("src"), "q")
      .orderBy("src", "q").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("s1", 10.0, 0.25), ("s1", 20.0, 0.75), ("s1", 20.0, 0.75),
      ("s1", 30.0, 1.0), ("s2", 1.0, 1.0)))
    val ex = intercept[IllegalArgumentException] {
      Features.percentileNormalize(d, Nil, "q")
    }
    assert(ex.getMessage.contains("single-partition"))
  }

  test("splitLeakage counts distinct fingerprints straddling split pairs") {
    val d = Seq(
      (1L, "train", "dup"), (2L, "train", "dup"),    // in-split dup: no leak
      (3L, "test", "dup"),                            // train-test leak via 'dup'
      (4L, "val", "other"), (5L, "test", "other"),    // val-test leak
      (6L, "train", "clean"),
    ).toDF("id", "split", "text")
    val out = Features.splitLeakage(d.repartition(3), "split", "text")
      .orderBy("split_a", "split_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("test", "train", 1L), ("test", "val", 1L)))
  }

  test("welchT: hand-checked statistic; degenerate cohorts NULL; nulls join no cohort") {
    // A = {1,2,3} (mean 2, var 1), B = {4,6} (mean 5, var 2)
    // se = sqrt(1/3 + 2/2) = sqrt(4/3); t = -3/sqrt(4/3)
    val d = Seq(
      ("k", Some(0L), 1.0), ("k", Some(2L), 2.0), ("k", Some(4L), 3.0),
      ("k", Some(1L), 4.0), ("k", Some(3L), 6.0),
      ("k", None, 999.0),               // null user -> neither cohort
      ("solo", Some(0L), 1.0), ("solo", Some(1L), 2.0), // n_a = n_b = 1
    ).toDF("key", "user", "v")
    val out = Features.welchT(d.repartition(3), Seq("key"), "v",
      inA = col("user") % 2 === 0)
      .orderBy("key").collect()
    val k = out(0)
    assert(k.getString(0) == "k" && k.getLong(1) == 3L && k.getLong(2) == 2L)
    assert(math.abs(k.getDouble(3) - (-3.0 / math.sqrt(4.0 / 3.0))) < 1e-12)
    assert(out(1).getString(0) == "solo" && out(1).isNullAt(3))
  }

  test("lagFeatures and rfmScores refuse empty keys (single-partition funnel guard)") {
    val d = Seq((1, 1, 1.0)).toDF("k", "t", "v")
    val exLag = intercept[IllegalArgumentException] {
      Features.lagFeatures(d, Nil, Seq(col("t")), "v", Seq(1), Seq(2))
    }
    assert(exLag.getMessage.contains("single-partition"))
    val tx = Seq(("s", 1L, java.sql.Date.valueOf("2024-01-01"), 1.0))
      .toDF("seg", "cust", "d", "amt")
    val exRfm = intercept[IllegalArgumentException] {
      Features.rfmScores(tx, "cust", Nil, "d", "amt")
    }
    assert(exRfm.getMessage.contains("one partition"))
  }

  test("psi: hand-checked terms, empty bins surface, null scores drop") {
    // A = {1,2,6}, B = {1,7,8}; 2 bins of width 5 over [0,10)
    // bin0: nA=2 nB=1 -> pA=.6 pB=.4; bin1: nA=1 nB=2 -> pA=.4 pB=.6
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(6.0)),
      ("b", Some(1.0)), ("b", Some(7.0)), ("b", Some(8.0)),
      ("a", None),                        // null score drops
    ).toDF("cohort", "v")
    val out = Features.psi(df.repartition(3), "v", col("cohort") === "a",
      nBins = 2, lo = 0.0, hi = 10.0)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getFloat(4)))
    assert(out.map(t => (t._1, t._2, t._3, t._4)).toSeq ==
      Seq((0, 0.0, 2L, 1L), (1, 5.0, 1L, 2L)))
    assert(math.abs(out(0)._5 - 0.2 * math.log(1.5)) < 1e-6)
    assert(math.abs(out(1)._5 - (-0.2) * math.log(2.0 / 3.0)) < 1e-6)
  }

  test("psi: a bin with no data in either cohort still appears, with a finite smoothed term") {
    val df = Seq(("a", 1.0), ("b", 14.0)).toDF("cohort", "v")
    val out = Features.psi(df, "v", col("cohort") === "a",
      nBins = 3, lo = 0.0, hi = 15.0)
      .orderBy("bin").collect()
    assert(out.length == 3)
    val mid = out(1)
    assert(mid.getLong(2) == 0L && mid.getLong(3) == 0L)
    // both proportions smooth to 1/(1+3): term is exactly 0
    assert(mid.getFloat(4) == 0.0f)
  }

  test("weightedSample: deterministic, k-capped per stratum, heavy rows win in aggregate") {
    val rows = (1L to 200L).map(i => ("s" + (i % 2), i, if (i <= 100) 1000L else 1L))
    val df = rows.toDF("src", "id", "w")
    val a = Features.weightedSample(df.repartition(4), Seq("src"), "id", "w", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Features.weightedSample(df.repartition(7), Seq("src"), "id", "w", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b && a.size == 20)                     // replayable; 10 per stratum
    assert(a.groupBy(_._1).forall(_._2.size == 10))
    // 1000x weight: the heavy half should dominate the draw
    assert(a.count(_._2 <= 100) >= 16)
    // zero/null weights never draw
    val z = Features.weightedSample(
      Seq(("s", 1L, 0L), ("s", 2L, 5L)).toDF("src", "id", "w"),
      Seq("src"), "id", "w", k = 5).collect()
    assert(z.map(_.getLong(1)).toSeq == Seq(2L))
    val ex = intercept[IllegalArgumentException] {
      Features.weightedSample(df, Nil, "id", "w", 5)
    }
    assert(ex.getMessage.contains("single-partition"))
  }

  test("stratifiedSplit holds exact per-class proportions, including tiny classes") {
    val df = ((1 to 10).map(i => ("big", i.toLong)) ++
      (11 to 15).map(i => ("tiny", i.toLong))).toDF("cls", "id")
    val out = Features.stratifiedSplit(df.repartition(3), "cls", "id", 0.8, 0.1)
      .collect().map(r => (r.getString(0), r.getString(2)))
    val counts = out.groupBy(identity).view.mapValues(_.size).toMap
    // big: floor(8.0)=8 train, floor(10*0.9000...)=9 -> 1 val, 1 test
    assert(counts(("big", "train")) == 8)
    assert(counts(("big", "val")) == 1)
    assert(counts(("big", "test")) == 1)
    // tiny (n=5): floor(4.0)=4 train, floor(4.5)=4 -> 0 val, 1 test
    assert(counts(("tiny", "train")) == 4)
    assert(!counts.contains(("tiny", "val")))
    assert(counts(("tiny", "test")) == 1)
  }

  test("logisticGd learns a separating direction; eval reports perfect accuracy on separable data") {
    val df = Seq((-2.0, 0), (-1.0, 0), (1.0, 1), (2.0, 1))
      .toDF("x", "y")
    val feats = Seq("x" -> col("x"))
    val w = Features.logisticGd(df, feats, col("y") === 1, lr = 1.0, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w.keySet == Set("bias", "x"))
    assert(w("x") > 0.0) // positive direction separates
    // symmetric data: the bias stays near zero
    assert(math.abs(w("bias")) < 0.1)
    val e = Features.logisticEval(df, feats, col("y") === 1, lr = 1.0, iters = 5)
      .collect().head
    assert(e.getLong(0) == 4L)
    assert(e.getDouble(1) == 1.0)                       // separable
    assert(e.getDouble(2) > 0.0 && e.getDouble(2) < 1.0) // finite logloss
    // the shared-stage overload over precomputed weights must be
    // bit-identical to the composed form (exact doubles, no tolerance)
    val wdf = Features.logisticWeights(df, feats, col("y") === 1, lr = 1.0, iters = 5)
      .persist()
    try {
      val e2 = Features.logisticEval(df, feats, col("y") === 1, wdf).collect().head
      assert((e2.getLong(0), e2.getDouble(1), e2.getDouble(2)) ==
        ((e.getLong(0), e.getDouble(1), e.getDouble(2))))
    } finally wdf.unpersist()
  }

  test("groupKFold: identical groups always share a fold; folds stay in range") {
    val df = Seq((1L, "ga"), (2L, "ga"), (3L, "gb"), (4L, "gc"), (5L, "gb"))
      .toDF("id", "grp")
    val out = Features.groupKFold(df, "grp", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byGroup = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    assert(byGroup.values.forall(_.size == 1)) // one fold per group
    assert(out.forall(r => r._3 >= 0 && r._3 < 3))
    val ex = intercept[IllegalArgumentException] {
      Features.groupKFold(df, "grp", k = 1)
    }
    assert(ex.getMessage.contains("k >= 2"))
  }

  test("balancedSample: every class downsamples to the min class count, deterministically") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L),
      ("b", 6L), ("b", 7L),
    ).toDF("cls", "id")
    val once = Features.balancedSample(df.repartition(3), "cls", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val counts = once.groupBy(_._1).view.mapValues(_.size).toMap
    assert(counts == Map("a" -> 2, "b" -> 2))
    // both b rows survive (quota == class size)
    assert(once.filter(_._1 == "b").map(_._2) == Set(6L, 7L))
    val again = Features.balancedSample(df, "cls", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(once == again)
  }
}
