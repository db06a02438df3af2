package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus replicator for scale-step benchmarking: writes a
 * `factor`-times-larger copy of an sf directory whose *statistical shape*
 * matches the source, so per-query bench times can be compared across
 * scale factors without replication artifacts.
 *
 * Naive row duplication would be wrong three ways at once: duplicated
 * join keys multiply join fan-out (a 10x copy would make every
 * orderkey join produce 100x pairs), duplicated text makes every
 * near-dup bucket 10x deeper (pair joins go 100x — superlinearity that
 * is the *generator's* fault, not the operator's), and duplicated
 * embeddings do the same to cosine/LSH buckets. TPC-H scale factors add
 * *new* entities, not copies. This replicator does the analog:
 *
 *  - **Key shifting**: every key/FK column is shifted by
 *    `replica * stride` where `stride = max(source key) + 1` (one bounded
 *    agg-to-literal collect per key domain, per the repo convention).
 *    Replica 0 is the identity, so the source is a subset of the output.
 *    FK columns use the stride of the table they reference, so join
 *    fan-out per key is *identical* to the source at every factor.
 *  - **Tiny dims stay fixed** (region, nation) exactly as TPC-H holds
 *    nations constant across SF; nationkey FKs are left unshifted.
 *  - **Text decorrelation**: replica i's document text goes through a
 *    per-replica affine substitution cipher x -> a·x + b (mod 26) over
 *    a-z (via `translate`), with (a, b) enumerated so replicas 0-25 are
 *    the pure Caesar shifts and the 12 multipliers coprime to 26 extend
 *    the space to 312 distinct bijections. A bijection on letters
 *    preserves every shingle / length / punctuation statistic within a
 *    replica bit-for-bit; two DISTINCT affine maps agree on at most 2
 *    letters, so cross-replica shingle sets are disjoint (a shingle
 *    would need every letter drawn from the agreeing pair) and near-dup
 *    clusters stay source-sized instead of growing with the factor.
 *    `factor` is capped at 312 — beyond that the substitution space is
 *    exhausted and replicas would repeat text verbatim (the old pure
 *    Caesar scheme hit the same wall at 26).
 *  - **Embedding decorrelation**: replica i's vectors are multiplied by
 *    a deterministic per-replica ±1 sign mask. Within a replica every
 *    pairwise dot product (hence every cosine, every neighborhood) is
 *    *exactly* preserved (x·y == (s∘x)·(s∘y) since s_j^2 = 1); across
 *    replicas dot products are sign-scrambled toward zero, so
 *    similarity joins scale linearly in the factor like a real corpus.
 *  - **Timestamps are kept** (events/orders/lineitem): `factor`x rows in
 *    the same time range models higher traffic, which is what windowed
 *    aggregations meet at scale; per-user sequences stay source-shaped
 *    because user_id shifts.
 *
 * No RNG anywhere — byte-identical output on every run, any cluster.
 *
 * Always replicate from the BASE corpus, never chain on a replica:
 * composed substitutions collide (base shifts i+j == j+i land replica
 * pairs on identical text) and composed sign masks are symmetric
 * (mask(i)∘mask(j) == mask(j)∘mask(i)), so a replica-of-a-replica holds
 * cross-replica exact duplicates the invariants above forbid. One run
 * at the target factor from the source has neither problem.
 *
 * Usage: `runMain graft.ScaleUp <srcDir> <outDir> [factor]`
 */
object ScaleUp {

  /** max(key)+1 — the shift stride that keeps replica key ranges disjoint. */
  private def stride(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head.getLong(0) + 1L

  /** Deterministic ±1 mask for replica `i` over `dims` coordinates.
   *  Replica 0 is all +1 (identity). Bits come from a Stafford mix of the
   *  (replica, lane) pair so masks differ across replicas and coordinates. */
  private[graft] def signMask(i: Int, dims: Int): Array[Float] =
    Array.tabulate(dims) { j =>
      if (i == 0) 1f
      else {
        var z = i.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        if (((z ^ (z >>> 31)) & 1L) == 1L) -1f else 1f
      }
    }

  private val alphabet = "abcdefghijklmnopqrstuvwxyz"

  /** The multipliers coprime to 26 — each (a, b) pair below is a distinct
   *  bijection on a-z. a = 1 first so replicas 0-25 stay the historical
   *  pure Caesar shifts (sf1 artifacts remain reproducible). */
  private val coprimes = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  /** Max factor before substitution maps would repeat. */
  private[graft] val maxFactor: Int = 26 * coprimes.length

  /** The image alphabet of replica i's affine map x -> a·x + b (mod 26),
   *  with a = coprimes(i / 26) and b = i % 26. Distinct for
   *  0 <= i < 312; i == 0 is the identity. */
  private[graft] def affineAlphabet(i: Int): String = {
    val a = coprimes(i / 26)
    val b = i % 26
    String.valueOf(Array.tabulate(26)(x => alphabet((a * x + b) % 26)))
  }

  /** Substitute a-z through replica i's affine map (identity at i == 0).
   *  Length, case classes, whitespace, digits and punctuation are
   *  untouched, so every length/ratio statistic survives while shingles
   *  across replicas become disjoint. */
  private def substitute(c: org.apache.spark.sql.Column, i: Int) =
    if (i == 0) c else translate(c, alphabet, affineAlphabet(i))

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, out, factor)
    spark.stop()
  }

  /** Replicate every table of `src` into `out` at `factor`x (see the
   *  class doc for the invariants). Session-agnostic so the spec can
   *  exercise the real pipeline on its own session. */
  def run(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    require(factor >= 1 && factor <= maxFactor,
      s"factor $factor outside [1, $maxFactor]: beyond $maxFactor the affine " +
        "substitution space is exhausted and replicas would repeat text verbatim")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String)(df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    /** Union of `factor` shifted replicas of `df`. `shift` maps each
     *  (column -> stride) pair; other columns pass through unchanged. */
    def replicate(df: DataFrame, shift: Map[String, Long],
                  extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map { i =>
        val shifted = shift.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i.toLong * s))
        }
        extra(shifted, i)
      }.reduce(_ unionAll _)

    // tiny fixed dims: copied verbatim (TPC-H holds these constant)
    write("region")(read("region"))
    write("nation")(read("nation"))

    val custK = stride(read("customer"), "c_custkey")
    val suppK = stride(read("supplier"), "s_suppkey")
    val partK = stride(read("part"), "p_partkey")
    val ordK = stride(read("orders"), "o_orderkey")

    write("customer")(replicate(read("customer"), Map("c_custkey" -> custK)))
    write("supplier")(replicate(read("supplier"), Map("s_suppkey" -> suppK)))
    // p_name is a tiny-vocabulary entity phrase (64 distinct over 20k
    // parts at sf0.1): verbatim replication would deepen every
    // (p_name, p_brand) linkage block by the factor, and blocked
    // record-linkage pair volume by factor² — measured as q98/q192
    // execution-memory aborts at sf10. Real corpus growth adds NEW
    // entity names (TPC-H name space is combinatorial), so replica i's
    // names go through the same affine substitution as document text;
    // true categoricals (p_brand / p_type / p_container / flags) stay
    // fixed exactly like region/nation.
    write("part")(replicate(read("part"), Map("p_partkey" -> partK),
      (d, i) => d.withColumn("p_name", substitute(col("p_name"), i))))
    write("orders")(replicate(read("orders"),
      Map("o_orderkey" -> ordK, "o_custkey" -> custK)))
    write("lineitem")(replicate(read("lineitem"),
      Map("l_orderkey" -> ordK, "l_partkey" -> partK, "l_suppkey" -> suppK)))

    val ev = read("events")
    val evK = stride(ev, "event_id")
    val usrK = stride(ev, "user_id")
    write("events")(replicate(ev, Map("event_id" -> evK, "user_id" -> usrK)))

    val docs = read("documents")
    val docK = stride(docs, "doc_id")
    write("documents")(replicate(docs, Map("doc_id" -> docK),
      (d, i) => d.withColumn("text", substitute(col("text"), i))))

    val emb = read("embeddings")
    val vecK = stride(emb, "vec_id")
    val dims = emb.select(size(col("embedding"))).head.getInt(0)
    write("embeddings")(replicate(emb, Map("vec_id" -> vecK), (d, i) => {
      val mask = array(signMask(i, dims).map(lit): _*)
      d.withColumn("embedding",
        zip_with(col("embedding"), mask, (x, m) => x * m))
    }))
  }
}
