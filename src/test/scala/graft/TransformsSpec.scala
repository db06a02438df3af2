package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Transforms

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("computus: Easter and the derived Brazilian movable feasts") {
    import java.time.LocalDate
    // documented Easter Sundays across century boundaries
    assert(Transforms.easterSunday(1995) == LocalDate.of(1995, 4, 16))
    assert(Transforms.easterSunday(1997) == LocalDate.of(1997, 3, 30))
    assert(Transforms.easterSunday(2000) == LocalDate.of(2000, 4, 23))
    assert(Transforms.easterSunday(2024) == LocalDate.of(2024, 3, 31))
    val h97 = Transforms.brazilHolidays(1997, 1997).toSet
    assert(h97.contains(LocalDate.of(1997, 2, 11))) // Carnival Tuesday
    assert(h97.contains(LocalDate.of(1997, 3, 28))) // Good Friday
    assert(h97.contains(LocalDate.of(1997, 5, 29))) // Corpus Christi
    assert(h97.contains(LocalDate.of(1997, 9, 7)))  // fixed: Independência
    assert(h97.size == 13) // 8 fixed + 5 movable, no collisions in 1997
    // Easter 2019 falls ON Tiradentes (Apr 21): the date appears once
    val h19 = Transforms.brazilHolidays(2019, 2019)
    assert(Transforms.easterSunday(2019) == LocalDate.of(2019, 4, 21))
    assert(h19.count(_ == LocalDate.of(2019, 4, 21)) == 1)
    assert(h19.size == 12)
  }

  test("dateParts derives the reference's time-dimension columns") {
    val d = Seq(Timestamp.valueOf("2020-08-15 13:45:00")).toDF("ts") // a Saturday
    val row = Transforms.dateParts(d, "ts").collect().head
    assert(row.getAs[Int]("dia") == 15)
    assert(row.getAs[String]("mes") == "Agosto")
    assert(row.getAs[Int]("ano") == 2020)
    assert(row.getAs[Int]("hora") == 13)
    assert(row.getAs[Int]("trimestre") == 3)
    assert(!row.getAs[Boolean]("dia_util"))
  }

  test("phaseOfDay buckets every hour") {
    val out = (0 to 23).toDF("h")
      .select(col("h"), Transforms.phaseOfDay(col("h")).as("p"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(5) == "Amanhecer" && out(6) == "Amanhecer")
    assert(out(7) == "Dia" && out(11) == "Dia")
    assert(out(12) == "Tarde" && out(17) == "Tarde")
    assert(out(18) == "Noite" && out(23) == "Noite")
    assert(out(0) == "Madrugada" && out(4) == "Madrugada")
  }

  test("flagFromCalendar marks exactly the calendar dates") {
    val df = Seq(Timestamp.valueOf("2020-01-01 08:00:00"),
      Timestamp.valueOf("2020-01-02 08:00:00")).toDF("ts")
    val cal = Seq("2020-01-01").toDF("d").select(to_date(col("d")).as("d"))
    val out = Transforms.flagFromCalendar(df, "ts", cal, "d", "holiday")
      .orderBy("ts").select("holiday").as[Boolean].collect().toSeq
    assert(out == Seq(true, false))
  }

  test("valueMap remaps listed values and defaults the rest") {
    val out = Seq("Sim", "Não", "??").toDF("c")
      .select(Transforms.valueMap(col("c"), Map("Sim" -> "Urbano", "Não" -> "Rural"),
        Some(lit("desconhecido"))).as("m"))
      .as[String].collect().toSeq
    assert(out == Seq("Urbano", "Rural", "desconhecido"))
  }

  test("multiFlagSplit sets one boolean per flag without exploding") {
    val row = Transforms.multiFlagSplit(Seq("Curva;Reta").toDF("c"), "c", Seq("Curva", "Reta", "Ponte"))
      .collect().head
    assert(row.getAs[Boolean]("Curva") && row.getAs[Boolean]("Reta") && !row.getAs[Boolean]("Ponte"))
  }

  test("string ops: splitHead / afterFirst / concatColumns") {
    val d = Seq(("I/FORD KA", "-12.5", "-41.2")).toDF("marca", "lat", "lon")
    val row = d.select(
      Transforms.splitHead(col("marca"), "/").as("brand"),
      Transforms.afterFirst(col("marca"), "/").as("model"),
      Transforms.concatColumns(",", col("lat"), col("lon")).as("lat_log"),
      Transforms.afterFirst(col("lat"), "/").as("empty")).collect().head
    assert(row.getString(0) == "I")
    assert(row.getString(1) == "FORD KA")
    assert(row.getString(2) == "-12.5,-41.2")
    assert(row.getString(3) == "")
  }

  test("brandModelSplit reproduces the reference's I/-prefix special case (dag.py:187-196)") {
    val d = Seq(
      "I/FORD FIESTA 1.6",  // seg0 == 'I': brand=first word of seg1, model=rest
      "IVECO/DAILY 35S14",  // starts with 'I' but != 'I': brand=first word, model=FULL seg1
      "VW/GOL",             // plain split
      "HONDA",              // no '/': model backfills
      "I/X",                // single-token seg1: model is '' (not backfilled)
      "ITAPEMIRIM",         // no '/', starts with 'I': brand backfills too
    ).toDF("marca")
    val out = Transforms.brandModelSplit(d, "marca", "brand", "model")
      .select("marca", "brand", "model").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out("I/FORD FIESTA 1.6") == ("FORD", "FIESTA 1.6"))
    assert(out("IVECO/DAILY 35S14") == ("DAILY", "DAILY 35S14"))
    assert(out("VW/GOL") == ("VW", "GOL"))
    assert(out("HONDA") == ("HONDA", "não informado"))
    assert(out("I/X") == ("X", ""))
    assert(out("ITAPEMIRIM") == ("não informado", "não informado"))
  }

  test("monthName covers all 12 months") {
    val out = (1 to 12).toDF("m").select(Transforms.monthName(col("m")).as("n"))
      .as[String].collect().toSeq
    assert(out == Seq("Janeiro", "Fevereiro", "Março", "Abril", "Maio", "Junho",
      "Julho", "Agosto", "Setembro", "Outubro", "Novembro", "Dezembro"))
  }

  test("normalizeDecimalComma parses pt-BR decimals; garbage nulls out (dag.py:184)") {
    val out = Seq("-23,55052", "100", "abc", "1,5,2").toDF("s")
      .select(Transforms.normalizeDecimalComma(col("s")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(-23.55052), Some(100.0), None, None))
  }
}
