package graft.data

import java.sql.Timestamp
import java.text.SimpleDateFormat
import java.util.{Locale, TimeZone}

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.util.Str

/** Quoted-CSV scan for labeled regression data (SURVEY.md §2 A2) — the
  * reference's WL-data format (`misc/RegressionTestImportWLData.java:28-30`,
  * parse at `:99-123`):
  * `"orderNo","province","city","district","detailText","MM/dd/yyyy HH:mm:ss","gridId"`
  * The import text is the concatenation province+city+district+detail and
  * orderNo/gridId ride along as prop1/prop2 (`:105-126`).
  */
object WlCsv {
  final case class WlRow(orderNo: String, text: String, ts: Timestamp, gridId: String)

  /** Parse one quoted line; null for malformed rows (reference skips them). */
  def parse(line: String): WlRow = {
    if (line == null || line.trim.isEmpty) return null
    val trimmed = line.trim
    if (trimmed.length < 2 || trimmed.charAt(0) != '"' ||
        trimmed.charAt(trimmed.length - 1) != '"') return null
    // Reference splits on the `","` boundary after stripping outer quotes.
    val inner = Str.substring(trimmed, 1, trimmed.length - 2)
    val f = inner.split("\",\"", -1)
    if (f.length != 7) return null
    val ts =
      try {
        val fmt = new SimpleDateFormat("MM/dd/yyyy HH:mm:ss", Locale.US)
        fmt.setTimeZone(TimeZone.getTimeZone("UTC"))
        new Timestamp(fmt.parse(f(5)).getTime)
      } catch { case _: Exception => null }
    WlRow(f(0), f(1) + f(2) + f(3) + f(4), ts, f(6))
  }

  def read(spark: SparkSession, lines: Dataset[String]): Dataset[WlRow] = {
    import spark.implicits._
    lines.flatMap(l => Option(parse(l)))
  }
}
