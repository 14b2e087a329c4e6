package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The reference's interactive-introspection surface: DESCRIBE (plain and
  * nested-type paths) and SHOW TABLES/DATABASES patterns, with Impala's
  * output shapes (`QueryTest/describe.test`, `show.test`;
  * `fe/src/main/java/org/apache/impala/service/DescribeResultFactory.java`,
  * `MetadataOp.java`).
  *
  * Routing lives here rather than in Catalyst because these are
  * metadata-result statements, not plans: the result is a small local
  * DataFrame built from the session catalog. Spark's own DESCRIBE output
  * (col_name/data_type/comment + section headers) differs from the
  * dialect's three-string-column shape, and Spark has no DESCRIBE of a
  * nested type path at all.
  */
object Introspect {

  /** Impala's type pretty-printer (`fe/.../catalog/StructType.java`
    * `prettyPrint`): structs expand one field per line with two-space
    * nesting indents; arrays and maps stay inline around them.
    */
  def impalaType(dt: DataType, indent: Int = 0): String = dt match {
    case s: StructType =>
      val pad = " " * (indent + 2)
      val fields = s.fields.map(f =>
        s"$pad${f.name}:${impalaType(f.dataType, indent + 2)}")
      s"struct<\n${fields.mkString(",\n")}\n${" " * indent}>"
    case a: ArrayType => s"array<${impalaType(a.elementType, indent)}>"
    case m: MapType =>
      s"map<${impalaType(m.keyType, indent)},${impalaType(m.valueType, indent)}>"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case TimestampType | TimestampNTZType => "timestamp"
    case other => other.catalogString
  }

  private val describeRe =
    "(?is)^describe\\s+(?!formatted\\b|extended\\b|history\\b|detail\\b|database\\b|function\\b|query\\b)([A-Za-z_][\\w.]*)\\s*;?\\s*$".r
  private val showTablesRe =
    "(?is)^show\\s+tables(?:\\s+in\\s+([\\w.]+))?(?:\\s+(?:like\\s+)?(?:'([^']*)'|\"([^\"]*)\"))?\\s*;?\\s*$".r
  private val showDbsRe =
    "(?is)^show\\s+(?:databases|schemas)(?:\\s+(?:like\\s+)?(?:'([^']*)'|\"([^\"]*)\"))?\\s*;?\\s*$".r
  private val useRe = "(?is)^use\\s+([\\w]+)\\s*;?\\s*$".r

  /** Dialect route. Returns None when the statement is not ours (plain
    * Spark SQL, including DESCRIBE FORMATTED/EXTENDED which Spark's own
    * Hive-style output serves).
    */
  def route(spark: SparkSession, q: String): Option[DataFrame] = q match {
    case describeRe(path) => Some(describe(spark, path))
    case showTablesRe(db, p1, p2) =>
      Some(showNames(spark, tableNames(spark, Option(db)),
        Option(p1).orElse(Option(p2))))
    case showDbsRe(p1, p2) =>
      Some(showNames(spark, spark.catalog.listDatabases().collect()
        .map(_.name).toSeq, Option(p1).orElse(Option(p2))))
    case useRe(db) =>
      // the dialect's USE switches the default database; fixture corpora
      // run in a single temp-view namespace, so an unknown database is a
      // successful no-op for table resolution, but the function catalog
      // tracks it for unqualified CREATE/SHOW FUNCTIONS
      if (spark.catalog.databaseExists(db)) spark.sql(s"use $db")
      graft.functions.FunctionDdl.setCurrentDb(spark, db)
      Some(spark.emptyDataFrame)
    case _ => None
  }

  /** Impala's SHOW pattern: '*' is a wildcard, '|' separates
    * alternatives, everything else is literal (regex metacharacters
    * match themselves), case-insensitive (`MetadataOp.java` pattern
    * conversion). An empty pattern matches nothing.
    */
  def patternMatches(pattern: String, name: String): Boolean =
    pattern.split("\\|").exists { alt =>
      val rx = alt.trim.toLowerCase.flatMap {
        case '*' => ".*"
        case c if "\\.[]{}()+-^$?".contains(c) => "\\" + c
        case c => c.toString
      }
      name.toLowerCase.matches(rx)
    }

  private def tableNames(spark: SparkSession, db: Option[String]): Seq[String] = {
    val dbName = db.map(_.split("\\.").last)
      .filter(spark.catalog.databaseExists)
    val listed = dbName match {
      case Some(d) => spark.catalog.listTables(d)
      case None => spark.catalog.listTables()
    }
    listed.collect().map(_.name.toLowerCase).toSeq.distinct.sorted
  }

  private def showNames(spark: SparkSession, names: Seq[String],
      pattern: Option[String]): DataFrame = {
    val kept = pattern match {
      case Some(p) => names.filter(patternMatches(p, _))
      case None => names
    }
    val schema = StructType(Seq(StructField("name", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(kept.map(Row(_)): _*), schema)
  }

  /** DESCRIBE <table>[.<col or field path>...]: the three-string-column
    * result. A path into a collection type describes the collection's
    * item/pos (arrays), key/value (maps) or fields (structs) exactly as
    * the reference's DescribeResultFactory renders them.
    */
  def describe(spark: SparkSession, path: String): DataFrame = {
    val parts = path.split("\\.").toSeq
    // longest prefix of parts that resolves as a table/view name; the
    // dialect's db prefixes were dropped at corpus-port time, so try the
    // first segment, then first two (db.table)
    val (schema0, rest) =
      try (spark.table(parts.head).schema, parts.tail)
      catch {
        case _: Exception if parts.length >= 2 =>
          (spark.table(parts.take(2).mkString(".")).schema, parts.drop(2))
      }
    var fields: Seq[(String, DataType, String)] = schema0.fields.toSeq.map(
      f => (f.name, f.dataType,
        f.getComment().getOrElse("")))
    var cursor: Option[DataType] = None
    rest.foreach { seg =>
      val dt = cursor match {
        case None =>
          fields.find(_._1.equalsIgnoreCase(seg)).map(_._2).getOrElse(
            throw new IllegalArgumentException(
              s"Could not resolve path: '$path'"))
        case Some(st: StructType) =>
          st.fields.find(_.name.equalsIgnoreCase(seg)).map(_.dataType)
            .getOrElse(throw new IllegalArgumentException(
              s"Could not resolve path: '$path'"))
        case Some(a: ArrayType) if seg.equalsIgnoreCase("item") =>
          a.elementType
        case Some(m: MapType) if seg.equalsIgnoreCase("key") => m.keyType
        case Some(m: MapType) if seg.equalsIgnoreCase("value") => m.valueType
        case _ => throw new IllegalArgumentException(
          s"Could not resolve path: '$path'")
      }
      cursor = Some(dt)
    }
    cursor.foreach { dt =>
      fields = dt match {
        case st: StructType =>
          st.fields.toSeq.map(f => (f.name, f.dataType, ""))
        case a: ArrayType => a.elementType match {
          // an array of structs describes as the struct's fields + pos
          case st: StructType =>
            st.fields.toSeq.map(f => (f.name, f.dataType, "")) :+
              (("pos", LongType: DataType, ""))
          case elem => Seq(("item", elem, ""), ("pos", LongType, ""))
        }
        case m: MapType =>
          Seq(("key", m.keyType, ""), ("value", m.valueType, ""))
        case prim => Seq((parts.last, prim, ""))
      }
    }
    val out = StructType(Seq(
      StructField("name", StringType), StructField("type", StringType),
      StructField("comment", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(fields.map { case (n, t, c) =>
        Row(n, impalaType(t), c)
      }: _*), out)
  }
}
