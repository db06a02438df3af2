package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Star-schema construction: the Spark-first re-expression of the
 * reference's `criar_dimensões` stage (reference dag.py:216-287), which
 * builds 5 dimensions via `drop_duplicates` + positional surrogate keys
 * and a fact table via 5 pandas merges.
 */
object StarSchema {

  /**
   * Dimension via distinct natural-key tuples + a *hash* surrogate key
   * (md5 of the natural key). This is the 100 TB path: fully distributed,
   * no global sort, no driver state, and the key is stable across reruns
   * and incremental loads (the reference's positional `index + 1` key is
   * neither stable nor computable without a single-node sort).
   */
  def dimWithHashKey(df: DataFrame, naturalKey: Seq[String], idCol: String): DataFrame = {
    // Each component is prefix-coded with a null-flag byte plus the
    // null-coalesced value, so ("a", null), ("a", "") and ("b", null) all
    // hash distinctly AND the surrogate is never null -- a null surrogate
    // (what plain `concat` / DuckDB `||` would produce) makes every
    // null-containing tuple indistinguishable and unjoinable. DuckDB
    // equivalent: md5((CASE WHEN a IS NULL THEN chr(2) ELSE chr(3) END ||
    // coalesce(a, '')) || chr(1) || ...).
    val parts = naturalKey.map { c =>
      val s = col(c).cast("string")
      concat(when(s.isNull, lit("\u0002")).otherwise(lit("\u0003")), coalesce(s, lit("")))
    }
    val raw = concat(parts.flatMap(c => Seq(c, lit("\u0001"))).dropRight(1): _*)
    df.select(naturalKey.map(col): _*).distinct()
      .withColumn(idCol, md5(raw))
  }

  /**
   * Dimension with a dense sequential surrogate key ordered by the natural
   * key — byte-compatible with the reference's `index + 1` keys once order
   * is pinned. Uses an un-partitioned window, which Spark executes on a
   * single partition: correct and acceptable for genuinely small
   * dimensions (the reference's dims are ≤ thousands of rows); use
   * [[dimWithHashKey]] for high-cardinality dims.
   */
  def dimWithDenseKey(df: DataFrame, naturalKey: Seq[String], idCol: String): DataFrame =
    df.select(naturalKey.map(col): _*).distinct()
      .withColumn(idCol, row_number().over(Window.orderBy(naturalKey.map(col): _*)))

  /**
   * Dense sequential surrogate key WITHOUT a single-partition window —
   * the 100 TB twin of [[dimWithDenseKey]], byte-equal output. Ranges
   * partition the distinct keys (partition i's keys all sort before
   * partition i+1's), each partition ranks locally, and the global id is
   * local rank + the sum of earlier partitions' sizes. The only
   * unpartitioned window runs over the per-partition size frame — at
   * most `spark.sql.shuffle.partitions` rows. Range boundaries come
   * from sampling and may vary between runs; the output does not,
   * because global rank is invariant to where the ranges fall.
   */
  def dimWithDenseKeyScalable(df: DataFrame, naturalKey: Seq[String], idCol: String): DataFrame = {
    val keys = naturalKey.map(col)
    val ranged = df.select(keys: _*).distinct()
      .repartitionByRange(keys: _*)
      .withColumn("__gpid", spark_partition_id())
    val withRn = ranged.withColumn("__grn",
      row_number().over(Window.partitionBy("__gpid").orderBy(keys: _*)))
    // per-partition sizes -> exclusive running sum = id offset per pid;
    // both branches share the ranged exchange via ReuseExchange
    val offsets = withRn.groupBy("__gpid").agg(count(lit(1)).as("__gsz"))
      .withColumn("__goff", coalesce(
        sum("__gsz").over(Window.orderBy("__gpid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__gpid", "__goff")
    withRn.join(broadcast(offsets), "__gpid")
      .withColumn(idCol, (col("__goff") + col("__grn")).cast("long"))
      .select((naturalKey :+ idCol).map(col): _*)
  }

  /**
   * Slowly-changing-dimension type 2 merge: version rows instead of
   * overwriting them. `existing` carries the dimension history
   * (naturalKey, attrs, validFrom, validTo, isCurrent); `incoming`
   * carries the new snapshot (naturalKey, attrs). Keys whose attributes
   * changed (null-safe compare) close their current row at `effTs` and
   * append a new current version; unchanged keys pass through; keys new
   * to the dimension insert as current. History rows are untouched.
   *
   * Scale shape: one equi-join of current-vs-incoming on the natural key
   * decides changed/new/unchanged, and one left join of the current slice
   * against the changed keys closes-or-passes-through in a single pass —
   * the dimension shuffles by key, never row-by-row. No MERGE statement,
   * no driver loops — pure unions of joins, runnable on any store that
   * can append (the reference's load is append-only too, dag.py:290-445).
   *
   * Preconditions: at most one `isCurrent` row per natural key in
   * `existing`, and unique natural keys in `incoming` — duplicates would
   * version the same key multiple times. A NULL `isCurrent` is treated
   * as not-current (the row passes through with the history).
   */
  def scd2Merge(
      existing: DataFrame, incoming: DataFrame,
      naturalKey: Seq[String], attrs: Seq[String], effTs: Column,
      validFrom: String = "valid_from", validTo: String = "valid_to",
      isCurrent: String = "is_current"): DataFrame = {
    require(attrs.nonEmpty, "scd2Merge needs at least one tracked attribute")
    val outCols = (naturalKey ++ attrs :+ validFrom :+ validTo :+ isCurrent).map(col)
    // eff ts in the dimension's own temporal dtype, so unionByName can't
    // silently coerce a TIMESTAMP_NTZ dimension to TIMESTAMP
    val effFrom = effTs.cast(existing.schema(validFrom).dataType)
    val effTo = effTs.cast(existing.schema(validTo).dataType)
    val history = existing.filter(!coalesce(col(isCurrent), lit(false)))
    val current = existing.filter(coalesce(col(isCurrent), lit(false)))
    val inc = incoming.select((naturalKey ++ attrs).map(col): _*)
    // decorate incoming with the matching current attrs (if any)
    val cur = current.select(
      naturalKey.map(col) ++
        attrs.map(a => col(a).as(s"__gcur_$a")) :+ lit(true).as("__ghit"): _*)
    val joined = inc.join(cur, naturalKey, "left")
    val differs = attrs.map(a => !(col(a) <=> col(s"__gcur_$a"))).reduce(_ || _)
    val isNew = col("__ghit").isNull
    // new current versions: brand-new keys + changed keys
    val newVersions = joined.filter(isNew || differs)
      .select(naturalKey.map(col) ++ attrs.map(col) :+
        effFrom.as(validFrom) :+ lit(null).cast(existing.schema(validTo).dataType).as(validTo) :+
        lit(true).as(isCurrent): _*)
    // one pass over the current slice: changed keys close at effTs,
    // everything else passes through untouched
    val changedKeys = joined.filter(!isNew && differs)
      .select(naturalKey.map(col): _*)
      .withColumn("__gchanged", lit(true))
    val mergedCurrent = current.join(changedKeys, naturalKey, "left")
      .withColumn(validTo, when(col("__gchanged"), effTo).otherwise(col(validTo)))
      .withColumn(isCurrent, col("__gchanged").isNull)
      .select(outCols: _*)
    history.select(outCols: _*)
      .unionByName(mergedCurrent)
      .unionByName(newVersions)
  }

  /**
   * Fact construction: left-join each dimension back on its natural key to
   * attach surrogate FKs, then project measures + FKs (reference
   * dag.py:241-261). Dimensions are broadcast — the fact side of a star
   * join must never shuffle.
   */
  def buildFact(
      source: DataFrame,
      dims: Seq[(DataFrame, Seq[String], String)], // (dim, naturalKey, idCol)
      measures: Seq[String]): DataFrame = {
    val withKeys = dims.foldLeft(source) { case (acc, (dim, nk, idCol)) =>
      acc.join(broadcast(dim.select((nk :+ idCol).map(col): _*)), nk, "left")
    }
    withKeys.select((dims.map(_._3) ++ measures).map(col): _*)
  }

  /**
   * CDC changelog apply: fold a stream of keyed change rows (upserts and
   * deletes) into a base snapshot — last writer wins per key, decided by
   * `orderBy` (which must be total per key or the winner is
   * partition-order dependent). `changes` carries the full target row
   * plus `opCol`; rows whose latest op equals `deleteOp` drop the key,
   * anything else replaces it (insert and update collapse to upsert —
   * the set-based twin of a row-by-row MERGE).
   *
   * Scale shape: one window shuffle ranks the changelog by key (the
   * changelog, not the snapshot, is usually the small side), then one
   * anti-join removes superseded/deleted base rows and a union appends
   * the surviving upserts. The snapshot is never windowed — it shuffles
   * once, for the anti-join.
   */
  /**
   * Snapshot diff: compare two keyed snapshots and emit the changelog
   * that turns `old` into `new` — inserts ('I', key only in new),
   * deletes ('D', key only in old), updates ('U', any compared column
   * null-safely different). Unchanged keys emit nothing. The inverse of
   * [[cdcApply]]: `cdcApply(old, snapshotDiff(old, new), …)` rebuilds
   * `new`. One full-outer equi-join on the key — both snapshots shuffle
   * once; change detection is per-row.
   *
   * Output: keys + `compareCols` (the NEW values; old values for
   * deletes, so the row is still keyed and typed) + `op`.
   */
  def snapshotDiff(
      oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      compareCols: Seq[String], opCol: String = "op"): DataFrame = {
    // presence markers, not key-null tests: a genuine NULL key value
    // must not read as "absent from this side"
    val o = oldSnap.select((keys ++ compareCols).map(col) :+ lit(true).as("__go"): _*).as("o")
    val n = newSnap.select((keys ++ compareCols).map(col) :+ lit(true).as("__gn"): _*).as("n")
    val joinCond = keys.map(kc => col(s"o.$kc") <=> col(s"n.$kc")).reduce(_ && _)
    val changed = compareCols.map(cc => !(col(s"o.$cc") <=> col(s"n.$cc"))).reduce(_ || _)
    o.join(n, joinCond, "full_outer")
      .withColumn(opCol,
        when(col("o.__go").isNull, "I")
          .when(col("n.__gn").isNull, "D")
          .when(changed, "U"))
      .filter(col(opCol).isNotNull)
      .select(
        keys.map(kc => coalesce(col(s"n.$kc"), col(s"o.$kc")).as(kc)) ++
          compareCols.map(cc =>
            when(col(opCol) === "D", col(s"o.$cc")).otherwise(col(s"n.$cc")).as(cc)) :+
          col(opCol): _*)
  }

  def cdcApply(
      base: DataFrame, changes: DataFrame, keys: Seq[String],
      orderBy: Seq[Column], opCol: String, deleteOp: String = "D"): DataFrame = {
    val latest = changes
      .withColumn("__grn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(_.desc): _*)))
      .filter(col("__grn") === 1)
    base.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(
        latest.filter(col(opCol) =!= deleteOp)
          .select(base.columns.map(col).toIndexedSeq: _*))
  }
}
