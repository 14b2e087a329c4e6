package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.concurrent.TrieMap

/** The dialect's function-DDL front door (`QueryTest/functions-ddl.test`;
  * `fe/src/main/java/org/apache/impala/analysis/CreateUdfStmt.java`,
  * `CreateUdaStmt.java`, `DropFunctionStmt.java`,
  * `ShowFunctionsStmt.java`): CREATE [AGGREGATE] FUNCTION /
  * DROP FUNCTION / SHOW [AGGREGATE|ANALYTIC] FUNCTIONS /
  * SHOW CREATE [AGGREGATE] FUNCTION.
  *
  * The reference resolves SYMBOL against a native library at LOCATION;
  * here SYMBOL resolves against the session's function registry (the
  * UdfCorpus sample library plus every dialect builtin), so a created
  * function is genuinely callable when its symbol names a known
  * implementation — the Spark twin of binding `Fn` out of
  * `libTestUdfs.so`. Signatures (overloads, variadic markers, return
  * types) are tracked per (db, name, argtypes) exactly as the
  * reference's catalog does, which is what SHOW FUNCTIONS and
  * DROP FUNCTION(argtypes) operate on.
  */
object FunctionDdl {

  final case class FnEntry(
      db: String, name: String, args: Seq[String], varArg: Boolean,
      ret: String, agg: Boolean, location: String, symbol: String) {
    def signature: String = {
      val argStr = args.map(_.toUpperCase).mkString(", ") +
        (if (varArg) "..." else "")
      s"$name($argStr)"
    }
    def binaryType: String =
      if (location.endsWith(".jar")) "JAVA"
      else if (location.endsWith(".ll") || location.endsWith(".bc")) "IR"
      else "NATIVE"
  }

  // session catalog of created functions; key = (db, name, argkey).
  // Weak session keys: catalogs die with their session (ADVICE r6).
  private val catalogs =
    graft.PerSession.map[TrieMap[(String, String, String), FnEntry]]()
  // current database for unqualified names (the dialect's USE)
  private val currentDb = graft.PerSession.map[String]()

  def setCurrentDb(spark: SparkSession, db: String): Unit =
    currentDb.put(spark, db.toLowerCase)

  private def cat(spark: SparkSession) =
    catalogs.computeIfAbsent(spark, _ => TrieMap.empty)

  private def db0(spark: SparkSession) =
    Option(currentDb.get(spark)).getOrElse("default")

  private val createRe =
    ("(?is)^create\\s+(aggregate\\s+)?function\\s+(if\\s+not\\s+exists\\s+)?" +
      "([\\w.]+)\\s*\\(([^)]*)\\)\\s+returns\\s+([\\w(),*]+)" +
      "(?:\\s+intermediate\\s+[\\w(),*]+)?" +
      "\\s+location\\s+'([^']*)'" +
      "([\\s\\S]*?)\\s*;?\\s*$").r
  private val dropRe =
    ("(?is)^drop\\s+(?:aggregate\\s+)?function\\s+(if\\s+exists\\s+)?" +
      "([\\w.]+)\\s*(?:\\(([^)]*)\\))?\\s*;?\\s*$").r
  private val showRe =
    ("(?is)^show\\s+(aggregate\\s+|analytic\\s+)?functions" +
      "(?:\\s+in\\s+([\\w]+))?(?:\\s+(?:like\\s+)?(?:'([^']*)'|\"([^\"]*)\"))?" +
      "\\s*;?\\s*$").r
  private val showCreateRe =
    ("(?is)^show\\s+create\\s+(aggregate\\s+)?function\\s+([\\w.]+)" +
      "\\s*(?:\\(([^)]*)\\))?\\s*;?\\s*$").r
  private val symbolRe = "(?is)(?:symbol|update_fn)\\s*=\\s*'([^']*)'".r
  private val dropDbRe =
    "(?is)^drop\\s+(?:database|schema)\\s+(?:if\\s+exists\\s+)?([\\w]+)\\s*(cascade|restrict)?\\s*;?\\s*$".r

  private def splitName(spark: SparkSession, raw: String): (String, String) =
    raw.split("\\.").toSeq match {
      case Seq(n) => (db0(spark), n.toLowerCase)
      case parts => (parts.init.mkString(".").toLowerCase,
        parts.last.toLowerCase)
    }

  private def parseArgs(raw: String): (Seq[String], Boolean) = {
    val trimmed = raw.trim
    if (trimmed.isEmpty) return (Nil, false)
    val varArg = trimmed.endsWith("...")
    val body = if (varArg) trimmed.dropRight(3) else trimmed
    (body.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq, varArg)
  }

  private def argKey(args: Seq[String], varArg: Boolean): String =
    args.mkString(",") + (if (varArg) "..." else "")

  def route(spark: SparkSession, q: String): Option[DataFrame] = q match {
    case createRe(agg, ine, rawName, rawArgs, ret, loc, tail) =>
      val (db, name) = splitName(spark, rawName)
      val (args, varArg) = parseArgs(rawArgs)
      val key = (db, name, argKey(args, varArg))
      if (cat(spark).contains(key)) {
        if (ine == null) throw new IllegalArgumentException(
          s"Function already exists: $name(${args.mkString(", ").toUpperCase})")
      } else {
        val symbol = symbolRe.findFirstMatchIn(tail).map(_.group(1))
          .getOrElse(name)
        // Java-UDF locations load for real (the class must be on the
        // classpath, the reference's executor-side contract); a symbol
        // that cannot load is the reference's lazy binary-load error
        // (udf-errors.test). Native .so locations resolve symbolically
        // against the session registry instead (see bind).
        if (loc.endsWith(".jar")) bindJavaClass(spark, name, loc, symbol)
        cat(spark).put(key, FnEntry(db, name, args, varArg,
          ret.toUpperCase, agg != null, loc, symbol))
        bind(spark, name, symbol)
      }
      Some(spark.emptyDataFrame)
    case dropDbRe(db, mode) =>
      // dropping a database that still holds functions is the
      // reference's catalog-consistency error (udf-errors.test) —
      // unless CASCADE, which drops the functions with the database
      val dbl = db.toLowerCase
      val held = cat(spark).keys.filter(_._1 == dbl).toSeq
      if (held.nonEmpty) {
        if (mode == null || !mode.equalsIgnoreCase("cascade"))
          throw new IllegalArgumentException(
            s"Cannot drop non-empty database: $dbl")
        held.foreach(cat(spark).remove)
      }
      None // database itself is Spark's to drop
    case dropRe(ife, rawName, rawArgs) =>
      val (db, name) = splitName(spark, rawName)
      Option(rawArgs) match {
        case Some(ra) =>
          val (args, varArg) = parseArgs(ra)
          val key = (db, name, argKey(args, varArg))
          if (!cat(spark).contains(key)) {
            if (ife == null) throw new IllegalArgumentException(
              s"Function does not exist: " +
                s"$name(${args.mkString(", ").toUpperCase})")
          } else cat(spark).remove(key)
          Some(spark.emptyDataFrame)
        case None =>
          // no parenthesized signature: the reference's Java-UDF drop
          // removes EVERY overload of (db, name); names not in this
          // catalog fall through to Spark's own DROP FUNCTION
          val keys = cat(spark).keys
            .filter(k => k._1 == db && k._2 == name).toSeq
          if (keys.nonEmpty) {
            keys.foreach(cat(spark).remove)
            Some(spark.emptyDataFrame)
          } else None
      }
    case showRe(kind, db, p1, p2) =>
      val wantAgg = kind != null && kind.trim.equalsIgnoreCase("aggregate")
      val analytic = kind != null && kind.trim.equalsIgnoreCase("analytic")
      val dbName = Option(db).map(_.toLowerCase).getOrElse(db0(spark))
      val pattern = Option(p1).orElse(Option(p2))
      val rows =
        if (analytic) Nil // created UDFs/UDAs are never analytic fns
        else cat(spark).values.toSeq
          .filter(e => e.db == dbName && e.agg == wantAgg)
          .filter(e => pattern.forall(p =>
            graft.plans.Introspect.patternMatches(p, e.name)))
          .sortBy(e => (e.name, e.args.size, e.signature))
          .map(e => Row(e.ret, e.signature, e.binaryType, "true"))
      val schema = StructType(Seq(
        StructField("return type", StringType),
        StructField("signature", StringType),
        StructField("binary type", StringType),
        StructField("is persistent", StringType)))
      Some(spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema))
    case showCreateRe(agg, rawName, rawArgs) =>
      val (db, name) = splitName(spark, rawName)
      val wantAgg = agg != null
      val entries = cat(spark).values.toSeq
        .filter(e => e.db == db && e.name == name && e.agg == wantAgg)
        .sortBy(_.signature)
      if (entries.isEmpty) throw new IllegalArgumentException(
        s"Function does not exist: $db.$name")
      val text = entries.map { e =>
        val kw = if (e.agg) "CREATE AGGREGATE FUNCTION" else "CREATE FUNCTION"
        val fnKw = if (e.agg) "UPDATE_FN" else "SYMBOL"
        s"""$kw ${e.db}.${e.signature}
           | RETURNS ${e.ret}
           | LOCATION '${e.location}'
           | $fnKw='${e.symbol}'
           |""".stripMargin
      }.mkString
      val schema = StructType(Seq(StructField("result", StringType)))
      Some(spark.createDataFrame(
        java.util.Arrays.asList(Row(text)), schema))
    case _ => None
  }

  /** Java-UDF binding (`CREATE FUNCTION ... LOCATION 'x.jar'
    * SYMBOL='com.example.Udf'`): the class must load and be a Hive
    * UDF/GenericUDF — then it registers through the HiveUdx bridge,
    * genuinely callable. When LOCATION names a real jar file it is
    * added to the session (Spark's ADD JAR — driver and executor
    * classloaders), so classes shipped only in the jar load exactly as
    * the reference loads them out of the library at LOCATION
    * (`load-java-udfs.test` / `java-udf.test` with
    * impala-hive-udfs.jar). A class that cannot load is the reference's
    * binary-load failure (`udf-errors.test`).
    */
  private def bindJavaClass(spark: SparkSession, name: String,
      loc: String, symbol: String): Unit = {
    if (new java.io.File(loc).isFile)
      try spark.sql(s"ADD JAR '$loc'")
      catch { case _: Exception => () } // fall through to the load check
    val cls =
      try Class.forName(symbol, false,
        Option(Thread.currentThread().getContextClassLoader)
          .getOrElse(getClass.getClassLoader))
      catch {
        case _: Throwable =>
          try Class.forName(symbol, false, getClass.getClassLoader)
          catch {
            case _: Throwable => throw new IllegalArgumentException(
              s"Could not load binary: $loc")
          }
      }
    if (classOf[org.apache.hadoop.hive.ql.exec.UDF].isAssignableFrom(cls))
      HiveUdx.registerHiveSimpleUdf(spark, name, symbol)
    else if (classOf[org.apache.hadoop.hive.ql.udf.generic.GenericUDF]
        .isAssignableFrom(cls))
      HiveUdx.registerHiveGenericUdf(spark, name, symbol)
    else throw new IllegalArgumentException(
      s"Could not load binary: $loc")
  }

  /** SYMBOL resolution: when the symbol names a function the session
    * registry already implements (sample library, dialect builtin), the
    * created name becomes an alias for it — the Spark analog of loading
    * the implementation out of the library at LOCATION. Unknown symbols
    * stay catalog-only (DDL, SHOW and DROP still work; calling the
    * function reports an unresolved function, matching the reference's
    * lazy symbol-load error path).
    */
  private def bind(spark: SparkSession, name: String, symbol: String): Unit = {
    val registry = spark.sessionState.functionRegistry
    val symId = org.apache.spark.sql.catalyst.FunctionIdentifier(
      symbol.toLowerCase)
    if (name != symbol.toLowerCase && registry.functionExists(symId)) {
      registry.lookupFunctionBuilder(symId).foreach { builder =>
        registry.createOrReplaceTempFunction(name, builder, "scala_udf")
      }
    }
  }
}
