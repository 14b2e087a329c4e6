package graft

import org.apache.spark.sql.{Row, SparkSession}
import scala.io.Source

/** Runner for the reference's QueryTest golden-file format
  * (testdata/workloads/functional-query/queries/QueryTest, SURVEY.md
  * section 5): blocks separated by `====` with sections
  * `---- QUERY`, `---- RESULTS`, optional `---- TYPES` and
  * `---- OPTIONS` (order_sensitive). Strings are single-quoted, NULL is
  * the null literal, doubles use Scala toString formatting.
  */
object GoldenRunner {

  final case class GoldenCase(
      name: String,
      query: String,
      expected: Seq[String],
      types: Option[Seq[String]],
      orderSensitive: Boolean)

  def parse(path: String): Seq[GoldenCase] = {
    val src = Source.fromFile(path)
    val text = try src.mkString finally src.close()
    text.split("====").map(_.trim).filter(_.nonEmpty).zipWithIndex.map {
      case (block, i) =>
        val sections = block.split("---- ").map(_.trim).filter(_.nonEmpty)
        var query = ""
        var results = Seq.empty[String]
        var types: Option[Seq[String]] = None
        var ordered = false
        sections.foreach { s =>
          val lines = s.linesIterator.toSeq
          lines.head.trim match {
            case "QUERY" => query = lines.tail.mkString("\n").trim
            case "RESULTS" => results = lines.tail.map(_.trim).filter(_.nonEmpty)
            case "TYPES" =>
              types = Some(lines.tail.mkString(",").split(",").map(_.trim)
                .filter(_.nonEmpty).toSeq)
            case "OPTIONS" => ordered = lines.tail.exists(_.contains("order_sensitive"))
            case _ => ()
          }
        }
        GoldenCase(s"${new java.io.File(path).getName}#${i + 1}", query,
          results, types, ordered)
    }.toSeq
  }

  /** Render a row the way the golden files encode it. */
  def render(row: Row): String =
    row.toSeq.map {
      case null => "NULL"
      case s: String => "'" + s + "'"
      case t: java.time.LocalDateTime => "'" + t.toString.replace('T', ' ') + "'"
      case t: java.sql.Timestamp => "'" + t.toString + "'"
      case v => v.toString
    }.mkString(",")

  def run(spark: SparkSession, sfDir: String, c: GoldenCase): Option[String] = {
    val df = Engine.sql(spark, sfDir, c.query)
    c.types.foreach { want =>
      val got = df.schema.fields.map(_.dataType.sql).toSeq
      if (got.map(_.toUpperCase) != want.map(_.toUpperCase))
        return Some(s"types: got=${got.mkString(",")} want=${want.mkString(",")}")
    }
    val got = df.collect().map(render).toSeq
    val (g, w) =
      if (c.orderSensitive) (got, c.expected)
      else (got.sorted, c.expected.sorted)
    if (g != w) {
      val diff = g.zipAll(w, "<missing>", "<missing>")
        .filter { case (a, b) => a != b }.take(3)
      Some(s"rows: ${diff.map { case (a, b) => s"got=$a want=$b" }.mkString("; ")}" +
        s" (${g.size} vs ${w.size} rows)")
    } else None
  }
}
