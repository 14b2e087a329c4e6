package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** The reference's external-data-source DDL
  * (`CreateDataSrcStmt.java`/`DropDataSrcStmt.java`,
  * `testdata/bin/create-data-source-table.sql`): `CREATE DATA SOURCE
  * name LOCATION 'jar' CLASS 'cls' API_VERSION 'V1'` registers a named
  * source; `CREATE TABLE t (...) PRODUCED BY DATA SOURCE name("init")`
  * binds a table to it. Spark's twin of the binding is `CREATE TABLE t
  * USING <provider class>`, so the PRODUCED BY form rewrites to that
  * (the source supplies its own schema, exactly like the reference's
  * ExternalDataSource prepare/getNext contract); SHOW DATA SOURCES
  * lists builtins plus everything created here.
  */
object DataSourceDdl {

  // session catalog: name -> (location, class, api_version)
  private val created =
    graft.PerSession.map[TrieMap[String, (String, String, String)]]()

  private def cat(spark: SparkSession) =
    created.computeIfAbsent(spark, _ => TrieMap.empty)

  def listCreated(spark: SparkSession): Seq[(String, String, String, String)] =
    cat(spark).toSeq.sortBy(_._1)
      .map { case (n, (loc, cls, api)) => (n, loc, cls, api) }

  private val createRe =
    ("(?is)^create\\s+data\\s+source\\s+(if\\s+not\\s+exists\\s+)?([\\w]+)\\s+" +
      "location\\s+'([^']+)'\\s+class\\s+'([^']+)'\\s+" +
      "api_version\\s+'([^']+)'\\s*;?\\s*$").r
  private val dropRe =
    "(?is)^drop\\s+data\\s+source\\s+(if\\s+exists\\s+)?([\\w]+)\\s*;?\\s*$".r
  private val producedByRe =
    ("(?is)^\\s*(create\\s+table\\s+(?:if\\s+not\\s+exists\\s+)?[\\w.]+)\\s*" +
      "(?:\\([^)]*\\))?\\s*produced\\s+by\\s+data\\s+source\\s+([\\w]+)" +
      "\\s*(?:\\([^)]*\\))?\\s*;?\\s*$").r

  def route(spark: SparkSession, q: String): Option[DataFrame] = q match {
    case createRe(ine, name, loc, cls, api) =>
      val key = name.toLowerCase
      if (cat(spark).contains(key)) {
        if (ine == null) throw new IllegalArgumentException(
          s"Data source already exists: $key")
      } else cat(spark).put(key, (loc, cls, api.toUpperCase))
      Some(spark.emptyDataFrame)
    case dropRe(ife, name) =>
      val key = name.toLowerCase
      if (cat(spark).remove(key).isEmpty && ife == null)
        throw new IllegalArgumentException(s"Data source does not exist: $key")
      Some(spark.emptyDataFrame)
    case _ => None
  }

  /** Rewrite `CREATE TABLE t [(cols)] PRODUCED BY DATA SOURCE name("i")`
    * to `CREATE TABLE t USING <class>` — the registered class must be a
    * Spark TableProvider (the engine's DSv2 analog of the reference's
    * ExternalDataSource). Column lists drop: the source supplies the
    * schema (the reference validates the declared columns against it).
    */
  def rewriteProducedBy(spark: SparkSession, q: String): String = q match {
    case producedByRe(head, name) =>
      cat(spark).get(name.toLowerCase) match {
        case Some((_, cls, _)) => s"$head using $cls"
        case None =>
          // the engine's builtin DSv2 registry (SHOW DATA SOURCES)
          val builtin = Map(
            "alltypes" -> "graft.sources.AllTypesSource",
            "alltypesdatasource" -> "graft.sources.AllTypesSource",
            "kv_range" -> "graft.sources.KvRangeSource",
            "kv_store" -> "graft.sources.KvStoreSink")
          builtin.get(name.toLowerCase) match {
            case Some(cls) => s"$head using $cls"
            case None => throw new IllegalArgumentException(
              s"Data source does not exist: ${name.toLowerCase}")
          }
      }
    case _ => q
  }
}
