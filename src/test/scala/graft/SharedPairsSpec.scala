package graft

/** Pins the shared-stage contract of [[SparkEntry.sharedPairs]]: each
  * pair's two frames (trained once via the weights/assignments/loadings
  * overloads) are ROW-IDENTICAL to the two solo `queries` entries that
  * train independently — the bench's `shared` column measures the same
  * answers, cheaper, never different answers.
  */
class SharedPairsSpec extends SparkSpec {

  private val soloOf = Map(
    "q224+q226" -> Seq("q224_pca_power", "q226_pca_project"),
    "q228+q229" -> Seq("q228_kmeans_lloyd", "q229_kmeans_quality"),
    "q237+q238" -> Seq("q237_logistic_gd", "q238_logistic_eval"),
    // the SSJoin family: one pair pass + one cluster resolution feed
    // six readouts; q187's solo pass runs at 7/10 but its sweep
    // thresholds all sit above the shared 1/2 cutoff, so the sweep
    // rows coincide (the filter inside thresholdSweep re-applies them)
    "q135+q140+q146+q151+q187+q188" -> Seq(
      "q135_ssjoin_prefix", "q140_ssjoin_clusters", "q146_degree_stats",
      "q151_triangles", "q187_threshold_sweep", "q188_cluster_sizes"),
  )

  test("every shared pair has a solo mapping and vice versa") {
    assert(SparkEntry.sharedPairs.keySet === soloOf.keySet)
    soloOf.values.flatten.foreach(n =>
      assert(SparkEntry.queries.contains(n), s"missing solo query $n"))
  }

  for ((pair, solos) <- soloOf.toSeq.sortBy(_._1)) {
    test(s"$pair shared frames match ${solos.mkString(" + ")} row-for-row") {
      try {
        val sharedFrames = SparkEntry.sharedPairs(pair)(spark, sf0001)
        assert(sharedFrames.size === solos.size)
        sharedFrames.zip(solos).foreach { case (sh, solo) =>
          val sl = SparkEntry.queries(solo)(spark, sf0001)
          assert(sh.columns.toSeq === sl.columns.toSeq,
            s"$solo column mismatch")
          val cols = sh.columns.map(org.apache.spark.sql.functions.col)
          val a = sh.orderBy(cols: _*).collect()
          val b = sl.orderBy(cols: _*).collect()
          assert(a.length === b.length, s"$solo row-count mismatch")
          a.zip(b).foreach { case (x, y) => assert(x === y, s"$solo row mismatch") }
        }
      } finally Caches.releaseAll(spark)
    }
  }
}
