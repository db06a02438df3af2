package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Column-derivation operators: the Spark-first re-expression of the
 * reference's `transformar_dados` stage (reference dag.py:132-202).
 *
 * The reference derives columns with pandas `.apply(..., axis=1)` lambdas
 * and an `iterrows` loop over the whole frame (dag.py:170-178) — O(rows)
 * Python-interpreter work on one core. Every derivation below is a
 * Catalyst `Column` expression: codegen'd, vectorizable, and valid on a
 * 1000-executor cluster without change.
 */
object Transforms {

  /** Month-number → localized month name (reference dag.py:140-157 dict map). */
  def monthName(month: Column): Column = {
    val names = Seq("Janeiro", "Fevereiro", "Março", "Abril", "Maio", "Junho",
      "Julho", "Agosto", "Setembro", "Outubro", "Novembro", "Dezembro")
    names.zipWithIndex.foldLeft(lit(null: String)) { case (acc, (name, i)) =>
      when(month === (i + 1), lit(name)).otherwise(acc)
    }
  }

  /**
   * Derive the reference's time-dimension columns from a timestamp
   * (reference dag.py:156-162: dia, mes, ano, hora, trimestre, dia_util).
   */
  def dateParts(df: DataFrame, ts: String): DataFrame =
    df.withColumn("dia", dayofmonth(col(ts)))
      .withColumn("mes", monthName(month(col(ts))))
      .withColumn("ano", year(col(ts)))
      .withColumn("hora", hour(col(ts)))
      .withColumn("trimestre", quarter(col(ts)))
      // dayofweek: 1=Sunday..7=Saturday; the reference flags sáb/dom as non-working.
      .withColumn("dia_util", !dayofweek(col(ts)).isin(1, 7))

  /**
   * Hour-of-day → phase-of-day buckets (reference dag.py:106-113:
   * Amanhecer/Dia/Tarde/Noite/Madrugada via a per-row Python lambda).
   */
  def phaseOfDay(hora: Column): Column =
    when(hora >= 5 && hora < 7, "Amanhecer")
      .when(hora >= 7 && hora < 12, "Dia")
      .when(hora >= 12 && hora < 18, "Tarde")
      .when(hora >= 18 && hora < 24, "Noite")
      .otherwise("Madrugada")

  /**
   * Calendar-lookup flag (reference dag.py:161: `data in holidays.Brazil()`
   * — a per-row Python library call). Spark-first: the calendar is a tiny
   * dimension table, broadcast and hash-joined; the 100 TB fact side never
   * shuffles.
   */
  def flagFromCalendar(df: DataFrame, dateCol: String, calendar: DataFrame,
                       calendarDateCol: String, flagName: String): DataFrame = {
    val cal = calendar.select(col(calendarDateCol).as("__graft_cal_date")).distinct()
      .withColumn("__graft_hit", lit(true))
    df.join(broadcast(cal), to_date(col(dateCol)) === col("__graft_cal_date"), "left")
      .withColumn(flagName, coalesce(col("__graft_hit"), lit(false)))
      .drop("__graft_cal_date", "__graft_hit")
  }

  /**
   * Gregorian Easter Sunday via the Anonymous Gregorian (Gauss/Meeus)
   * computus — the rule-based engine behind the reference's
   * `holidays.Brazil()` movable feasts (dag.py:161).
   */
  def easterSunday(year: Int): java.time.LocalDate = {
    val a = year % 19
    val b = year / 100; val c = year % 100
    val d = b / 4; val e = b % 4
    val f = (b + 8) / 25; val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4; val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = (h + l - 7 * m + 114) % 31 + 1
    java.time.LocalDate.of(year, month, day)
  }

  /**
   * Brazilian national holidays, generated rule-based like the
   * reference's `holidays.Brazil()` (dag.py:161): the eight fixed dates
   * plus the computus-derived movable feasts (Carnival Monday/Tuesday,
   * Good Friday, Easter, Corpus Christi). Bounded by the year range —
   * a driver-side literal dim, broadcast by [[flagFromCalendar]].
   */
  def brazilHolidays(fromYear: Int, toYear: Int): Seq[java.time.LocalDate] =
    (fromYear to toYear).flatMap { y =>
      val easter = easterSunday(y)
      val fixed = Seq((1, 1), (4, 21), (5, 1), (9, 7), (10, 12), (11, 2), (11, 15), (12, 25))
        .map { case (m, d) => java.time.LocalDate.of(y, m, d) }
      val movable = Seq(-48L, -47L, -2L, 0L, 60L).map(easter.plusDays)
      fixed ++ movable
    }.distinct.sorted // a movable feast can land on a fixed date (e.g. Easter 2019-04-21 = Tiradentes)

  /** [[brazilHolidays]] as a one-column date dimension frame. */
  def brazilHolidayDim(spark: org.apache.spark.sql.SparkSession,
      fromYear: Int, toYear: Int): DataFrame = {
    import spark.implicits._
    brazilHolidays(fromYear, toYear).map(_.toString).toDF("d")
      .select(to_date(col("d")).as("d"))
  }

  /** Literal dictionary remap (reference dag.py:165: uso_solo Não/Sim → Rural/Urbano). */
  def valueMap(column: Column, mapping: Map[String, String], default: Option[Column] = None): Column =
    mapping.foldLeft(default.getOrElse(column)) { case (acc, (from, to)) =>
      when(column === from, lit(to)).otherwise(acc)
    }

  /**
   * Multi-valued delimited string → N boolean flag columns (reference
   * dag.py:167-181 builds 12 road-layout flags with a driver-side
   * `iterrows` loop). Spark-first: one `contains` predicate per flag —
   * zero shuffles, zero explodes, stays in whole-stage codegen.
   */
  def multiFlagSplit(df: DataFrame, column: String, flags: Seq[String]): DataFrame =
    flags.foldLeft(df)((d, f) => d.withColumn(f, col(column).contains(f)))

  /**
   * String recombination ops mirroring reference dag.py:184-191
   * (lat/long concat; marca → brand + model split).
   */
  def concatColumns(sep: String, cols: Column*): Column = concat_ws(sep, cols: _*)

  /**
   * Locale decimal normalization (dag.py:184: `latitude.str.replace(',',
   * '.')` before the lat/long concat): pt-BR decimal-comma strings →
   * DOUBLE. `translate` (single-char map, codegen'd) rather than a regex
   * engine per row; unparseable values null out, feeding
   * [[graft.operators.Cleaning.fillSentinel]].
   */
  def normalizeDecimalComma(c: Column): Column =
    // try_cast: ANSI mode (Spark 4 default) makes a plain cast throw on
    // the first malformed value instead of nulling it
    translate(c, ",", ".").try_cast("double")

  /** Regex group extraction (codegen'd; empty match → null after cast). */
  def regexExtract(column: Column, pattern: String, group: Int): Column =
    regexp_extract(column, pattern, group)

  /** First `/`-style segment (reference's `marca.str.split('/').str[0]`). */
  def splitHead(column: Column, sep: String): Column = substring_index(column, sep, 1)

  /** Remainder after the first occurrence of `sep` (empty when absent). */
  def afterFirst(column: Column, sep: String): Column =
    when(instr(column, sep) > 0,
      column.substr(instr(column, sep) + lit(sep.length), length(column)))
      .otherwise(lit(""))

  /**
   * The reference's brand/model derivation with its `I/`-prefix special
   * case (reference dag.py:187-196), reproduced exactly — including its
   * deliberate asymmetry: `modelo` re-derives only when the first
   * segment EQUALS 'I', while `marca` re-derives whenever the first
   * segment merely STARTS WITH 'I' (so 'IVECO/…' keeps its full second
   * segment as modelo but takes that segment's first word as marca).
   *
   * Semantics per column (`seg0`/`seg1` = first/second '/'-segment):
   *  - modelo = seg1; if seg0 == 'I', the second segment minus its first
   *    space-token (pandas `' '.join(split(' ')[1:])`, '' when seg1 has
   *    one token). Null when there is no second segment.
   *  - marca = seg0; if seg0 starts with 'I', the first space-token of
   *    seg1 (null when there is no second segment).
   *  - Nulls in either backfill to `fillValue` (dag.py:194-196).
   *
   * Pure per-row codegen expressions — no UDF, no shuffle.
   */
  def brandModelSplit(df: DataFrame, marcaCol: String,
      brandOut: String, modelOut: String,
      fillValue: String = "não informado"): DataFrame = {
    val m = col(marcaCol)
    val seg0 = substring_index(m, "/", 1)
    val seg1 = when(size(split(m, "/")) >= 2, split(m, "/").getItem(1))
    // drop-first-token == everything after the first space ('' when the
    // segment is a single token) — string-identical to pandas
    // `' '.join(split(' ')[1:])`, even for consecutive spaces
    val modelTail = when(seg1.isNotNull, afterFirst(seg1, " "))
    val modelo = when(seg0 === "I", modelTail).otherwise(seg1)
    val nova = when(substring(seg0, 1, 1) === "I", substring_index(seg1, " ", 1))
      .otherwise(seg0)
    df.withColumn(modelOut, coalesce(modelo, lit(fillValue)))
      .withColumn(brandOut, coalesce(nova, lit(fillValue)))
  }
}
