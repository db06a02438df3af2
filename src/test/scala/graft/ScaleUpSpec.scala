package graft

import org.apache.spark.sql.functions._

/**
 * Pins the replication invariants the sf1 scale-step evidence
 * (bench/BENCH_SCALE_sf1.json) rests on: a ScaleUp output must scale
 * row volume WITHOUT scaling join fan-out, near-dup bucket depth, or
 * embedding neighborhoods — otherwise a "superlinear" bench ratio could
 * be the generator's fault instead of the operator's.
 */
class ScaleUpSpec extends SparkSpec {

  private val factor = 3
  private lazy val outDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("scaleup_spec").toString
    ScaleUp.run(spark, sf0001, dir, factor)
    dir
  }
  private def src(t: String) = spark.read.parquet(s"$sf0001/$t.parquet")
  private def out(t: String) = spark.read.parquet(s"$outDir/$t.parquet")

  test("row volume: replicated tables scale by factor, tiny dims stay fixed") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"))
      assert(out(t).count() == factor * src(t).count(), s"table $t")
    for (t <- Seq("region", "nation"))
      assert(out(t).count() == src(t).count(), s"fixed dim $t")
  }

  test("replica 0 is the identity: every source row appears verbatim") {
    for (t <- Seq("orders", "documents", "embeddings"))
      assert(src(t).exceptAll(out(t)).isEmpty, s"table $t")
  }

  test("join fan-out is preserved: per-key order counts replicate, never multiply") {
    // the scale trap ScaleUp exists to avoid: naive duplication would
    // square per-key join cardinality instead of replicating it
    val srcCounts = src("orders").groupBy("o_custkey").count()
      .groupBy("count").agg(count(lit(1)).as("n_keys"))
    val outCounts = out("orders").groupBy("o_custkey").count()
      .groupBy("count").agg(count(lit(1)).as("n_keys"))
    val joined = srcCounts.as("s").join(outCounts.as("o"), "count")
      .select(col("count"), col("s.n_keys").as("sn"), col("o.n_keys").as("on"))
      .collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getAs[Long]("on") == factor * r.getAs[Long]("sn")),
      "every per-key order-count bucket must hold exactly factor-times the keys")
    // and no orphaned FKs: every replicated order still finds its customer
    val orphans = out("orders").join(out("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(orphans == 0)
  }

  test("text decorrelation: per-doc length/whitespace stats survive, shingles go disjoint") {
    val stats = (df: org.apache.spark.sql.DataFrame) => df.select(
      length(col("text")).as("len"),
      size(split(col("text"), " ", -1)).as("words"))
    // replica 0 = source, so the source's stat multiset must appear
    // factor times in the output's
    val s = stats(src("documents")).groupBy("len", "words").count()
    val o = stats(out("documents")).groupBy("len", "words").count()
    val mismatched = s.as("s").join(o.as("o"), Seq("len", "words"))
      .filter(col("o.count") =!= col("s.count") * factor).count()
    assert(mismatched == 0, "every (length, words) stat bucket scales by factor")
    // cross-replica shingle disjointness: a letter-bearing trigram from
    // replica 0 must not reappear in replica 1+ (Caesar shift)
    val docK = src("documents").agg(max(col("doc_id"))).head.getLong(0) + 1L
    val grams = out("documents")
      .select(col("doc_id"), explode(sliding3(col("text"))).as("g"))
      .filter(col("g").rlike("[a-z]"))
    val r0 = grams.filter(col("doc_id") < docK).select("g").distinct()
    val rN = grams.filter(col("doc_id") >= docK).select("g").distinct()
    assert(r0.join(rN, "g").isEmpty, "letter trigrams must be replica-disjoint")
  }

  private def sliding3(text: org.apache.spark.sql.Column) = {
    val words = filter(split(lower(text), "[ \t\n\f\r]+", -1), w => length(w) > 0)
    transform(sequence(lit(1), greatest(size(words) - 2, lit(0))),
      i => concat_ws(" ", element_at(words, i), element_at(words, i + 1),
        element_at(words, i + 2)))
  }

  test("embedding decorrelation: within-replica dot products are EXACTLY preserved") {
    // x·y == (s∘x)·(s∘y) requires the float product x_i*y_i to be
    // bit-identical under sign flips — IEEE guarantees it; the spec
    // pins the end-to-end claim on real vectors
    val vecK = src("embeddings").agg(max(col("vec_id"))).head.getLong(0) + 1L
    def dots(df: org.apache.spark.sql.DataFrame, shift: Long) = df.as("a")
      .join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(col("a.vec_id") % 17 === 0) // bounded pair sample, deterministic
      .select((col("a.vec_id") - shift).as("ia"), (col("b.vec_id") - shift).as("ib"),
        aggregate(zip_with(col("a.embedding"), col("b.embedding"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("dot"))
    val e = out("embeddings")
    val r0 = dots(e.filter(col("vec_id") < vecK), 0L)
    val r1 = dots(e.filter(col("vec_id") >= vecK && col("vec_id") < 2 * vecK), vecK)
    val diff = r0.as("x").join(r1.as("y"), Seq("ia", "ib"))
      .filter(col("x.dot") =!= col("y.dot")).count()
    assert(r0.count() > 0 && diff == 0,
      "sign-masked replicas must preserve every pairwise dot bit-for-bit")
  }

  test("entity decorrelation: linkage block depth stays source-shaped, never deepens") {
    // verbatim p_name replication would multiply every (p_name, p_brand)
    // block by the factor (pair volume by factor²); substitution keeps
    // per-block depth constant and multiplies the NUMBER of blocks
    assert(out("part").select("p_name").distinct().count() ==
      factor * src("part").select("p_name").distinct().count())
    val depth = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("p_name", "p_brand").count()
        .groupBy("count").agg(count(lit(1)).as("n_blocks"))
    val joined = depth(src("part")).as("s")
      .join(depth(out("part")).as("o"), "count")
      .select(col("count"), col("s.n_blocks").as("sn"), col("o.n_blocks").as("on"))
      .collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getAs[Long]("on") == factor * r.getAs[Long]("sn")),
      "every block-depth bucket must hold factor-times the blocks, same depths")
  }

  test("affine substitution: 312 distinct bijections, Caesar-compatible below 26") {
    val maps = (0 until ScaleUp.maxFactor).map(ScaleUp.affineAlphabet)
    // every map is a bijection on a-z
    assert(maps.forall(_.sorted == "abcdefghijklmnopqrstuvwxyz"))
    // all 312 are pairwise distinct — the old pure-Caesar scheme repeated
    // at i == 26 (identical text across replicas 0 and 26, fabricating
    // near-dup clusters at factor > 26)
    assert(maps.distinct.size == ScaleUp.maxFactor)
    assert(ScaleUp.affineAlphabet(26) != ScaleUp.affineAlphabet(0))
    // replicas 0-25 keep the historical Caesar shifts, so committed sf1
    // artifacts (factor 10) stay byte-reproducible
    for (i <- 0 until 26)
      assert(maps(i) == "abcdefghijklmnopqrstuvwxyz".substring(i) +
        "abcdefghijklmnopqrstuvwxyz".substring(0, i), s"shift $i")
    // distinct affine maps agree on at most 2 letters: a 3+-letter
    // shingle collides across replicas only if every letter sits in the
    // agreeing pair — statistical disjointness survives at any factor
    for (i <- Seq(0, 1, 26, 37, 311); j <- Seq(0, 1, 26, 37, 311) if i < j) {
      val agree = (0 until 26).count(x => maps(i)(x) == maps(j)(x))
      assert(agree <= 2, s"maps $i,$j agree on $agree letters")
    }
  }

  test("signMask is deterministic, replica 0 is all +1, later replicas mix signs") {
    assert(ScaleUp.signMask(0, 64).forall(_ == 1f))
    val m1 = ScaleUp.signMask(1, 64)
    assert(m1.sameElements(ScaleUp.signMask(1, 64)))
    assert(m1.exists(_ == -1f) && m1.exists(_ == 1f))
    assert(!m1.sameElements(ScaleUp.signMask(2, 64)))
  }
}
