package graft

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}

/** One-call entry point for running Flink SQL text — single statements
  * or whole `;`-separated scripts — on ANY Spark session, extensions or
  * not ([U] flink-table-api TableEnvironment.executeSql; SURVEY.md §3.1).
  *
  * {{{
  * graft.FlinkSql.run(spark, """
  *   CREATE TABLE orders (...) WITH ('connector'='filesystem', ...);
  *   CREATE TABLE sink (...) WITH ('connector'='blackhole');
  *   INSERT INTO sink SELECT ... FROM orders;
  *   SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE), count(*)
  *   FROM orders GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)
  * """)
  * }}}
  *
  * Registers the Flink-named functions, then routes every statement
  * through the full dialect chain ([[graft.plans.GraftSqlParser]]:
  * connector DDL, INSERT INTO sinks, window TVFs, UNNEST joins, legacy
  * group windows, MATCH_RECOGNIZE, FOR SYSTEM_TIME AS OF) and executes
  * the parsed plan directly, so nothing requires the session to have
  * been built with `spark.sql.extensions`. Returns the LAST statement's
  * DataFrame (DDL/INSERT statements yield Flink-style `OK` result rows).
  *
  * SQL-client script statements are honored too: `SET 'key' = 'value'`
  * maps the keys with a Spark analog onto session confs
  * (parallelism.default → spark.sql.shuffle.partitions,
  * table.local-time-zone → spark.sql.session.timeZone, spark.* verbatim)
  * and accepts-and-ignores the rest, `RESET 'key'` unsets, bare `SET;`
  * lists the session's set keys and bare `RESET;` reverts them all, and
  * `EXECUTE STATEMENT SET BEGIN <INSERT...;> ... END` (or the legacy
  * `BEGIN STATEMENT SET;` form) runs every INSERT of the multi-sink
  * deployment shape in order, and `EXPLAIN [PLAN FOR] <stmt>` (incl.
  * the 1.19 ExplainDetails `ESTIMATED_COST` / `CHANGELOG_MODE` /
  * `PLAN_ADVICE` / `JSON_EXECUTION_PLAN`) plans the statement through
  * the dialect chain without executing it. `CREATE FUNCTION name AS
  * 'impl'` aliases a resolvable session function (a Flink UDF class
  * cannot load here — the error says how to port); `DROP FUNCTION`
  * unregisters. The
  * catalog statements answer from the session's DDL registry with
  * Flink's column names: `SHOW TABLES`, `SHOW CREATE TABLE t` (the
  * re-rendered DDL round-trips through the parser), `DESCRIBE t`
  * (registered tables get Flink-style rows incl. the watermark;
  * other names fall through to Spark), `SHOW FUNCTIONS`,
  * `SHOW COLUMNS FROM t [[NOT] LIKE 'p']`, `SHOW VIEWS`,
  * `SHOW CATALOGS` / `SHOW DATABASES` / `SHOW CURRENT CATALOG|DATABASE`
  * / `USE [CATALOG] ...` (namespace bookkeeping over the one physical
  * catalog — see FlinkDdl.resolveNames for three-part references).
  * `SHOW JARS` answers from Spark's jar registry (ADD JAR passes
  * through; REMOVE JAR drops from the session listing — classes stay
  * loaded, documented delta). `LOAD/UNLOAD MODULE`, `USE MODULES`,
  * `SHOW [FULL] MODULES` keep Flink's module bookkeeping (validation
  * included; no function-resolution effect — documented at the state
  * holder). Job management (FLIP-291): `SHOW JOBS` lists active
  * Structured Streaming queries, `DESCRIBE JOB 'id'` shows one,
  * `STOP JOB 'id'` (id or query name;
  * WITH SAVEPOINT/DRAIN accepted) stops one gracefully. `ANALYZE
  * TABLE ... COMPUTE STATISTICS` scans and reports the row count;
  * `TRUNCATE TABLE` empties filesystem connector tables; row-level
  * `DELETE FROM` / `UPDATE ... SET` (FLIP-282) rewrite filesystem
  * connector tables via stage-and-swap; `CREATE/DROP
  * CATALOG|DATABASE` maintain the declared namespaces that qualified
  * `cat.db.tbl` references resolve through.
  *
  * Statement splitting ignores `;` inside single-quoted literals and
  * inside `--` / `/* ... */` comments (an apostrophe in a comment does
  * not open a literal); quoted literals cannot span statements.
  */
object FlinkSql {

  private val callRe = raw"(?is)^\s*CALL\b".r
  private val setRe = raw"(?is)^\s*SET\s+'([^']+)'\s*=\s*'([^']*)'\s*$$".r
  private val resetRe = raw"(?is)^\s*RESET\s+'([^']+)'\s*$$".r
  private val bareSetRe = raw"(?is)^\s*SET\s*$$".r
  private val bareResetRe = raw"(?is)^\s*RESET\s*$$".r
  // keys SET through the dialect this session (Flink's SQL client lists
  // them on a bare `SET;` and reverts them on a bare `RESET;`)
  private val setKeysBySession =
    new java.util.WeakHashMap[SparkSession, java.util.LinkedHashMap[String, String]]()
  // module bookkeeping ([U] flink-table-api ModuleManager): name → used,
  // insertion-ordered, 'core' loaded+used by default. Modules carry no
  // function-resolution effect here (one built-in function space, and the
  // loadable upstream modules — hive — cannot exist in this build), so
  // the statements are session bookkeeping with Flink's validation rules:
  // migrating scripts keep working and SHOW MODULES answers truthfully.
  private val modulesBySession =
    new java.util.WeakHashMap[SparkSession, java.util.LinkedHashMap[String, Boolean]]()
  private def modules(spark: SparkSession) = modulesBySession.synchronized {
    modulesBySession.computeIfAbsent(spark, _ => {
      val m = new java.util.LinkedHashMap[String, Boolean]()
      m.put("core", true)
      m
    })
  }
  private def setKeys(spark: SparkSession) = setKeysBySession.synchronized {
    setKeysBySession.computeIfAbsent(spark,
      _ => new java.util.LinkedHashMap[String, String]())
  }
  // REMOVE JAR bookkeeping: a JVM cannot unload loaded classes, so the
  // removal is the same session-listing semantics Flink's client gives
  // (the jar leaves SHOW JARS; already-loaded classes stay resolvable —
  // documented delta in MIGRATION.md)
  private val removedJarsBySession =
    new java.util.WeakHashMap[SparkSession, java.util.HashSet[String]]()
  private def removedJars(spark: SparkSession) = removedJarsBySession.synchronized {
    removedJarsBySession.computeIfAbsent(spark, _ => new java.util.HashSet[String]())
  }
  // names CREATE FUNCTION aliased this session: DROP/ALTER FUNCTION only
  // operate on these — the session functionRegistry also holds every
  // BUILTIN, and a registry-level drop would silently destroy one
  private val funcAliasesBySession =
    new java.util.WeakHashMap[SparkSession, java.util.HashSet[String]]()
  private def funcAliases(spark: SparkSession) = funcAliasesBySession.synchronized {
    funcAliasesBySession.computeIfAbsent(spark, _ => new java.util.HashSet[String]())
  }
  private val stmtSetRe =
    raw"(?is)^\s*(?:EXECUTE\s+STATEMENT\s+SET\s+BEGIN|BEGIN\s+STATEMENT\s+SET)\s*;?\s*(.*?)\s*;?\s*END\s*$$".r
  private val compilePlanRe =
    raw"(?is)^\s*COMPILE\s+(AND\s+EXECUTE\s+)?PLAN\s+'([^']+)'\s+FOR\s+(.+)$$".r
  private val executePlanRe = raw"(?is)^\s*EXECUTE\s+PLAN\s+'([^']+)'\s*$$".r
  private val explainRe = raw"(?is)^\s*EXPLAIN\s+PLAN\s+FOR\s+(.*)$$".r
  // Flink's ExplainDetails + bare `EXPLAIN <stmt>` — Spark's own explain
  // modes (EXTENDED/CODEGEN/COST/FORMATTED/ANALYZE) fall through to Spark
  private val explainDetailRe =
    raw"(?is)^\s*EXPLAIN\s+((?:ESTIMATED_COST|CHANGELOG_MODE|PLAN_ADVICE|JSON_EXECUTION_PLAN)(?:\s*,\s*(?:ESTIMATED_COST|CHANGELOG_MODE|PLAN_ADVICE|JSON_EXECUTION_PLAN))*)\s+(.*)$$".r
  private val explainBareRe =
    raw"(?is)^\s*EXPLAIN\s+(?!(?:EXTENDED|CODEGEN|COST|FORMATTED|ANALYZE)\b)((?:SELECT|INSERT|WITH|VALUES|TABLE|CREATE|EXECUTE)\b.*)$$".r
  private val showJobsRe = raw"(?is)^\s*SHOW\s+JOBS\s*$$".r
  private val showJarsRe = raw"(?is)^\s*SHOW\s+JARS\s*$$".r
  private val addJarRe = raw"(?is)^\s*ADD\s+JAR\s+'([^']+)'\s*$$".r
  private val removeJarRe = raw"(?is)^\s*REMOVE\s+JAR\s+'([^']+)'\s*$$".r
  private val describeJobRe = raw"(?is)^\s*DESC(?:RIBE)?\s+JOB\s+'([^']+)'\s*$$".r
  private val analyzeRe =
    raw"(?is)^\s*ANALYZE\s+TABLE\s+`?([A-Za-z_]\w*)`?\s+COMPUTE\s+STATISTICS(?:\s+FOR\s+(?:ALL\s+COLUMNS|COLUMNS\s+[\w`,\s]+))?\s*$$".r
  private val truncateRe = raw"(?is)^\s*TRUNCATE\s+TABLE\s+`?([A-Za-z_]\w*)`?\s*$$".r
  private val createCatalogRe =
    raw"(?is)^\s*CREATE\s+CATALOG\s+(?:IF\s+NOT\s+EXISTS\s+)?`?([A-Za-z_]\w*)`?\s*(?:WITH\s*\(.*\))?\s*$$".r
  private val dropCatalogRe =
    raw"(?is)^\s*DROP\s+CATALOG\s+(IF\s+EXISTS\s+)?`?([A-Za-z_]\w*)`?\s*$$".r
  private val createDbRe =
    raw"(?is)^\s*CREATE\s+DATABASE\s+(IF\s+NOT\s+EXISTS\s+)?(?:`?([A-Za-z_]\w*)`?\s*\.\s*)?`?([A-Za-z_]\w*)`?\s*(?:COMMENT\s+'[^']*')?\s*(?:WITH\s*\(.*\))?\s*$$".r
  private val dropDbRe =
    raw"(?is)^\s*DROP\s+DATABASE\s+(IF\s+EXISTS\s+)?(?:`?([A-Za-z_]\w*)`?\s*\.\s*)?`?([A-Za-z_]\w*)`?\s*(RESTRICT|CASCADE)?\s*$$".r
  private val useCatalogRe =
    raw"(?is)^\s*USE\s+CATALOG\s+`?([A-Za-z_]\w*)`?\s*$$".r
  private val useDbRe =
    raw"(?is)^\s*USE\s+(?:`?([A-Za-z_]\w*)`?\s*\.\s*)?`?([A-Za-z_]\w*)`?\s*$$".r
  private val showCurrentRe =
    raw"(?is)^\s*SHOW\s+CURRENT\s+(CATALOG|DATABASE)\s*$$".r
  private val stopJobRe =
    raw"(?is)^\s*STOP\s+JOB\s+'([^']+)'\s*(?:WITH\s+SAVEPOINT\s*)?(?:WITH\s+DRAIN\s*)?$$".r
  private val alterDbRe =
    raw"(?is)^\s*ALTER\s+DATABASE\s+(?:`?([A-Za-z_]\w*)`?\s*\.\s*)?`?([A-Za-z_]\w*)`?\s+SET\s*\(.*\)\s*$$".r
  private val alterFunctionRe =
    raw"(?is)^\s*ALTER\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+(IF\s+EXISTS\s+)?`?([A-Za-z_]\w*)`?\s+AS\s+'([^']+)'\s*(?:LANGUAGE\s+(\w+))?\s*$$".r
  private val createFunctionRe =
    raw"(?is)^\s*CREATE\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+(IF\s+NOT\s+EXISTS\s+)?`?([A-Za-z_]\w*)`?\s+AS\s+'([^']+)'\s*(?:LANGUAGE\s+(\w+))?\s*$$".r
  private val dropFunctionRe =
    raw"(?is)^\s*DROP\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+(IF\s+EXISTS\s+)?`?([A-Za-z_]\w*)`?\s*$$".r
  // FLIP-311 procedures: CALL / SHOW PROCEDURES are Flink statements;
  // CREATE/DROP PROCEDURE are the documented graft extension standing in
  // for catalog provisioning (Flink procedures come from catalogs)
  private val createProcedureRe =
    raw"(?is)^\s*CREATE\s+(?:TEMPORARY\s+)?PROCEDURE\s+(IF\s+NOT\s+EXISTS\s+)?`?([A-Za-z_]\w*)`?\s+AS\s+'([^']+)'\s*$$".r
  private val dropProcedureRe =
    raw"(?is)^\s*DROP\s+(?:TEMPORARY\s+)?PROCEDURE\s+(IF\s+EXISTS\s+)?`?([A-Za-z_]\w*)`?\s*$$".r
  private val showProceduresRe =
    raw"(?is)^\s*SHOW\s+PROCEDURES\s*(?:(?:FROM|IN)\s+[\w.`]+\s*)?(?:(?:I?LIKE)\s+'([^']*)')?\s*$$".r
  private val callStmtRe =
    raw"(?is)^\s*CALL\s+`?([A-Za-z_][\w.]*?)`?\s*\((.*)\)\s*;?\s*$$".r
  private val showTablesRe =
    raw"(?is)^\s*SHOW\s+TABLES\s*(?:(?:FROM|IN)\s+(?:`?([A-Za-z_]\w*)`?\s*\.\s*)?`?([A-Za-z_]\w*)`?\s*)?(?:(NOT\s+)?LIKE\s+'([^']*)')?\s*$$".r
  private val showCreateRe = raw"(?is)^\s*SHOW\s+CREATE\s+TABLE\s+([A-Za-z_]\w*)\s*$$".r
  private val showCreateViewRe =
    raw"(?is)^\s*SHOW\s+CREATE\s+VIEW\s+`?([A-Za-z_]\w*)`?\s*$$".r
  private val showFunctionsRe = raw"(?is)^\s*SHOW\s+(?:USER\s+)?FUNCTIONS\s*$$".r
  private val showCatalogsRe = raw"(?is)^\s*SHOW\s+CATALOGS\s*$$".r
  private val showColumnsRe =
    raw"(?is)^\s*SHOW\s+COLUMNS\s+(?:FROM|IN)\s+`?([A-Za-z_]\w*)`?\s*(?:(NOT\s+)?LIKE\s+'([^']*)')?\s*$$".r
  private val showViewsRe = raw"(?is)^\s*SHOW\s+VIEWS\s*$$".r
  private val dropViewRe =
    raw"(?is)^\s*DROP\s+(?:TEMPORARY\s+)?VIEW\s+(IF\s+EXISTS\s+)?`?([A-Za-z_]\w*)`?\s*$$".r
  private val showDatabasesRe = raw"(?is)^\s*SHOW\s+(?:DATABASES|SCHEMAS)\s*$$".r
  private val loadModuleRe =
    raw"(?is)^\s*LOAD\s+MODULE\s+`?([A-Za-z_]\w*)`?\s*(?:WITH\s*\(.*\))?\s*$$".r
  private val unloadModuleRe = raw"(?is)^\s*UNLOAD\s+MODULE\s+`?([A-Za-z_]\w*)`?\s*$$".r
  private val useModulesRe = raw"(?is)^\s*USE\s+MODULES\s+(.+?)\s*$$".r
  private val useModulesBareRe = raw"(?is)^\s*USE\s+MODULES\s*$$".r
  private val showModulesRe = raw"(?is)^\s*SHOW\s+(FULL\s+)?MODULES\s*$$".r
  private val showPartitionsRe =
    raw"(?is)^\s*SHOW\s+PARTITIONS\s+`?([A-Za-z_]\w*)`?\s*$$".r
  private val createViewRe =
    raw"(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?VIEW\s+(IF\s+NOT\s+EXISTS\s+)?`?([A-Za-z_]\w*)`?\s*".r
  private val alterViewRenameRe =
    raw"(?is)^\s*ALTER\s+(?:TEMPORARY\s+)?VIEW\s+`?([A-Za-z_]\w*)`?\s+RENAME\s+TO\s+`?([A-Za-z_]\w*)`?\s*$$".r
  private val alterViewAsRe =
    raw"(?is)^\s*ALTER\s+(?:TEMPORARY\s+)?VIEW\s+`?([A-Za-z_]\w*)`?\s+AS\s+(.+)$$".r
  private val describeRe = raw"(?is)^\s*DESC(?:RIBE)?\s+([A-Za-z_]\w*)\s*$$".r
  private val createTableHeadRe =
    raw"(?is)^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?:`?([A-Za-z_]\w*)`?\s*\.\s*)?(?:`?([A-Za-z_]\w*)`?\s*\.\s*)?`?[A-Za-z_]\w*`?".r

  /** Flink config keys with a direct Spark analog; everything else is
    * accepted and ignored (a migrating script must not die on its SET
    * preamble — runtime-tuning keys have no meaning here). `spark.*`
    * keys pass through verbatim.
    */
  private val confMap = Map(
    "parallelism.default" -> "spark.sql.shuffle.partitions",
    "table.local-time-zone" -> "spark.sql.session.timeZone")

  def sql(spark: SparkSession, statement0: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // three-part name resolution (FlinkDdl.resolveNames): qualified
    // `cat.db.tbl` / `db.tbl` references over declared namespaces strip
    // to the flat physical one. Catalog-management statements keep their
    // raw text (their dotted operands are namespace names, not tables).
    val statement =
      if (raw"(?is)^\s*(USE|SHOW|CREATE\s+(?:CATALOG|DATABASE)|DROP\s+(?:CATALOG|DATABASE)|ALTER\s+DATABASE)\b".r
          .findFirstIn(statement0).isDefined) statement0
      else graft.plans.FlinkDdl.resolveNames(spark, statement0)
    // a head-qualified CREATE TABLE names the table's home database —
    // note it for the registry bookkeeping before the stripped text runs
    createTableHeadRe.findFirstMatchIn(statement0) match {
      case Some(h) =>
        // (g1, g2): (null, null) bare — (db, null) two-part — (cat, db) three-part
        val (cat, db) =
          if (h.group(2) != null) (Option(h.group(1)), Option(h.group(2)))
          else (None, Option(h.group(1)))
        graft.plans.FlinkDdl.notePendingCreateNs(spark, cat, db)
      case None => graft.plans.FlinkDdl.clearPendingNs(spark)
    }
    statement match {
      // script-level statements (Flink SQL-client surface), routed
      // before the plan parser: SET / RESET map onto session confs,
      // statement sets run every INSERT in order
      case setRe(k, v) =>
        confMap.get(k).orElse(Some(k).filter(_.startsWith("spark.")))
          .foreach(spark.conf.set(_, v))
        setKeys(spark).put(k, v)
        okRow(spark, "key", k)
      case resetRe(k) =>
        confMap.get(k).orElse(Some(k).filter(_.startsWith("spark.")))
          .foreach(spark.conf.unset)
        setKeys(spark).remove(k)
        okRow(spark, "key", k)
      case bareSetRe() =>
        // Flink SQL client's bare `SET;`: list every key set this session
        // (including accepted-and-ignored ones, which Flink also lists)
        import spark.implicits._
        import scala.jdk.CollectionConverters._
        setKeys(spark).asScala.toSeq.toDF("key", "value")
      case bareResetRe() =>
        // bare `RESET;`: every session-set key reverts
        import scala.jdk.CollectionConverters._
        setKeys(spark).asScala.keys.toSeq.foreach { k =>
          confMap.get(k).orElse(Some(k).filter(_.startsWith("spark.")))
            .foreach(spark.conf.unset)
        }
        setKeys(spark).clear()
        okRow(spark, "key", "*")
      case stmtSetRe(body) =>
        val inserts = statements(body)
        require(inserts.nonEmpty, "empty STATEMENT SET")
        inserts.map(sql(spark, _)).reduce(_ unionByName _)
      case compilePlanRe(andExec, path, body0) =>
        // FLIP-190 plan persistence (Flink 1.19 `COMPILE PLAN 'f' FOR
        // <insert>` / `COMPILE AND EXECUTE PLAN`): the compiled artifact
        // is the name-resolved statement plus the DDL closure it needs
        // (referenced connector tables + dialect views, transitively),
        // so EXECUTE PLAN restores the whole pipeline in a session that
        // never saw the original script. Flink refuses to overwrite an
        // existing plan file unless table.plan.force-recompile is set —
        // except COMPILE AND EXECUTE PLAN, which treats an existing file
        // as already-compiled and executes IT (the script-restart path;
        // [U] CompileAndExecutePlanOperation passes ifNotExists=true).
        // normalize `a/sub/../p.json` shapes so the parent mkdirs below
        // creates the REAL directory, not a path with a dot-dot segment
        val f = new java.io.File(path).toPath.normalize().toFile
        if (f.isDirectory)
          throw new IllegalArgumentException(
            s"COMPILE PLAN: '$path' is a directory, not a plan file")
        val force = Option(setKeys(spark).get("table.plan.force-recompile"))
          .exists(_.equalsIgnoreCase("true"))
        if (f.exists() && !force) {
          if (andExec != null) return sql(spark, s"EXECUTE PLAN '$path'")
          throw new IllegalArgumentException(
            s"COMPILE PLAN: '$path' already exists — " +
              "SET 'table.plan.force-recompile' = 'true' to overwrite")
        }
        val body = body0.trim
        // a statement set compiles as its executable form
        val stmt =
          if (raw"(?is)^\s*STATEMENT\s+SET\s+BEGIN\b".r.findFirstIn(body).isDefined)
            "EXECUTE " + body
          else body
        val inners = stmtSetRe.findFirstMatchIn(stmt) match {
          case Some(m) => statements(m.group(1))
          case None => Seq(stmt)
        }
        require(inners.nonEmpty, "COMPILE PLAN: empty statement set")
        // the compile-time shape check mirrors the runtime INSERT matcher
        // exactly (FlinkDdl.insertRe: bare identifier, no TABLE keyword)
        // — a plan that compiles must also execute
        val insHeadRe =
          raw"(?is)^\s*INSERT\s+(?:INTO|OVERWRITE)\s+([A-Za-z_]\w*)\b".r
        inners.foreach { ins =>
          val m = insHeadRe.findFirstMatchIn(ins).getOrElse(
            throw new IllegalArgumentException(
              "COMPILE PLAN supports INSERT statements and statement sets " +
                s"of INSERTs (INSERT INTO <sink> ...), got: ${ins.trim.take(60)}"))
          // self-containment: a sink outside the DDL registry cannot be
          // replayed into a fresh session, so reject it at compile time
          // (Flink's compiled ExecNode graph embeds the sink spec too)
          if (graft.plans.FlinkDdl.registered(spark, m.group(1)).isEmpty)
            throw new IllegalArgumentException(
              s"COMPILE PLAN: sink '${m.group(1)}' is not a DDL-registered " +
                "table — a compiled plan must be self-contained")
        }
        val ddls = planDdls(spark, stmt)
        val ddlJson = ddls.map { case (kind, name, sqlText, vbody) =>
          s"""{"kind": ${jsonStr(kind)}, "name": ${jsonStr(name)}, """ +
            s""""sql": ${jsonStr(sqlText)}, "body": ${jsonStr(vbody)}}"""
        }.mkString("[\n  ", ",\n  ", "\n]")
        val json = s"""{
          |"graftPlanVersion": 1,
          |"dialect": "flink-1.19",
          |"statement": ${jsonStr(stmt)},
          |"ddls": $ddlJson
          |}""".stripMargin
        Option(f.getParentFile).foreach(_.mkdirs())
        try java.nio.file.Files.writeString(f.toPath, json)
        catch { case e: java.io.IOException =>
          throw new IllegalArgumentException(
            s"COMPILE PLAN: cannot write '$path': ${e.getMessage}")
        }
        if (andExec != null) sql(spark, stmt) else okRow(spark, "plan", path)
      case executePlanRe(path) =>
        // same normalization as COMPILE PLAN's write — a dot-dot path
        // that compiled must also execute
        val f = new java.io.File(path).toPath.normalize().toFile
        if (!f.isFile)
          throw new IllegalArgumentException(s"EXECUTE PLAN: no plan file at '$path'")
        val txt = java.nio.file.Files.readString(f.toPath)
        // any malformation — non-JSON, right names with wrong types, a
        // truncated edit — surfaces as ONE typed error, never a
        // ClassCastException from deep inside row access
        val (stmt, ddls) = try {
          import spark.implicits._
          val parsed = spark.read.json(Seq(txt).toDS())
          val row = parsed.select("statement", "ddls").head()
          (row.getString(0), row.getSeq[org.apache.spark.sql.Row](1).map { d =>
            (d.getAs[String]("kind"), d.getAs[String]("name"),
              d.getAs[String]("sql"), d.getAs[String]("body"))
          })
        } catch {
          case scala.util.control.NonFatal(_) =>
            throw new IllegalArgumentException(
              s"EXECUTE PLAN: '$path' is not a graft-compiled plan")
        }
        require(stmt != null && ddls.forall(d => d._1 != null && d._2 != null && d._3 != null),
          s"EXECUTE PLAN: '$path' is not a graft-compiled plan")
        // replay the DDL closure into THIS session — tables first, views
        // in their recorded dependency order; already-registered names
        // are kept (re-running a plan in the compiling session is a
        // no-op on the catalog, like Flink's restore)
        ddls.foreach { case (kind, name, ddl, vbody) =>
          if (kind == "view") {
            if (!spark.catalog.tableExists(name)) {
              graft.plans.FlinkDdl.runDialectSql(spark, ddl)
              graft.plans.FlinkDdl.registerView(spark, name, ddl, vbody)
            }
          } else if (graft.plans.FlinkDdl.registered(spark, name).isEmpty)
            sql(spark, ddl)
        }
        sql(spark, stmt)
      case explainRe(body) =>
        okRow(spark, "plan", explainText(spark, body, Nil))
      case explainDetailRe(details, body) =>
        // Flink 1.19 ExplainDetails (comma list): ESTIMATED_COST /
        // CHANGELOG_MODE / PLAN_ADVICE / JSON_EXECUTION_PLAN
        okRow(spark, "plan", explainText(spark, body,
          details.toUpperCase.split(',').map(_.trim).toSeq))
      case explainBareRe(body) =>
        // Flink's bare `EXPLAIN <stmt>` (plan, never execute); Spark's
        // own EXPLAIN modes are excluded above and fall through
        okRow(spark, "plan", explainText(spark, body, Nil))
      case showJarsRe() =>
        // Flink's SHOW JARS over Spark's own jar registry (ADD JAR
        // passes through to Spark after clearing any earlier REMOVE of
        // the same jar), minus the session's REMOVE JAR set
        import spark.implicits._
        spark.sql("LIST JARS").collect().map(_.getString(0)).toSeq
          .filterNot(removedJars(spark).contains)
          .sorted.toDF("jars")
      case addJarRe(path) =>
        // re-adding a previously REMOVEd jar must list again — Spark's
        // registry keeps one entry per file name, so clear the matching
        // removal before the pass-through
        val base = path.substring(path.lastIndexOf('/') + 1)
        removedJars(spark).removeIf(j => j.substring(j.lastIndexOf('/') + 1) == base)
        spark.sql(statement)
      case removeJarRe(path) =>
        // Flink SQL client's REMOVE JAR: the jar leaves the session's
        // listing. The JVM cannot unload its classes (documented delta);
        // a path never added errors like Flink's client.
        // Spark's registry lists added jars under a spark:// serving URL
        // keyed by file name (two adds with one basename share the
        // entry), so resolution is exact-path first, then by name
        val base = path.substring(path.lastIndexOf('/') + 1)
        val listed = spark.sql("LIST JARS").collect().map(_.getString(0))
          .filterNot(removedJars(spark).contains)
        val hit = listed.find(_ == path).orElse(listed.find(j =>
            j.substring(j.lastIndexOf('/') + 1) == base))
          .getOrElse(throw new IllegalArgumentException(
            s"REMOVE JAR: '$path' was not added in this session"))
        removedJars(spark).add(hit)
        okRow(spark, "jar", path)
      case showJobsRe() =>
        // FLIP-291 job management: active Structured Streaming queries
        // ARE this engine's jobs (Flink columns: job id/name/status/
        // start time)
        import spark.implicits._
        spark.streams.active.toSeq.map { q =>
          (q.id.toString, Option(q.name).getOrElse(""),
            if (q.isActive) "RUNNING" else "FINISHED",
            q.recentProgress.headOption.map(_.timestamp).getOrElse(""))
        }.toDF("job id", "job name", "status", "start time")
      case describeJobRe(id) =>
        // FLIP-291 DESCRIBE JOB 'id': one job's SHOW JOBS row, resolved
        // by query id or name like STOP JOB
        import spark.implicits._
        val q = spark.streams.active.find(q =>
          q.id.toString == id || id.equals(q.name)).getOrElse(
          throw new IllegalArgumentException(s"DESCRIBE JOB '$id': no active job"))
        Seq((q.id.toString, Option(q.name).getOrElse(""),
          if (q.isActive) "RUNNING" else "FINISHED",
          q.recentProgress.headOption.map(_.timestamp).getOrElse("")))
          .toDF("job id", "job name", "status", "start time")
      case analyzeRe(name) =>
        // Flink 1.18+ ANALYZE TABLE: here the useful side is the scan
        // itself (AQE owns runtime stats); returns the computed row
        // count so scripts can assert on it
        import spark.implicits._
        val cnt = spark.table(name).count()
        Seq((name, cnt)).toDF("table", "row count")
      case truncateRe(name) =>
        // Flink 1.18 TRUNCATE TABLE: real semantics for filesystem-
        // backed connector tables (their data directory is emptied and
        // the registered view re-reads as 0 rows); other connectors and
        // plain views reject like Flink's non-supporting connectors do
        val reg = graft.plans.FlinkDdl.registered(spark, name).getOrElse(
          throw new IllegalArgumentException(
            s"TRUNCATE TABLE $name: not a connector-DDL table"))
        require(reg._1 == "filesystem",
          s"TRUNCATE TABLE $name: connector '${reg._1}' does not support truncation")
        val dir = new java.io.File(reg._2)
        if (dir.exists()) {
          def wipe(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(wipe)
            f.delete()
          }
          dir.listFiles().foreach(wipe)
        }
        spark.catalog.refreshTable(name)
        okRow(spark, "table", name)
      // catalog/database management: namespace bookkeeping over the ONE
      // physical catalog (FlinkDdl's ns registry) — CREATE declares the
      // names three-part references may use, USE switches the default
      // prefix. Catalog WITH options (type, endpoints) are ignored: the
      // only backing catalog is the in-memory session one.
      case createCatalogRe(c) =>
        graft.plans.FlinkDdl.createCatalog(spark, c)
        okRow(spark, "catalog", c)
      case dropCatalogRe(ifEx, c) =>
        graft.plans.FlinkDdl.dropCatalog(spark, c, ifEx != null)
        okRow(spark, "catalog", c)
      case createDbRe(ifNot, cat, d) =>
        graft.plans.FlinkDdl.createDatabase(spark, Option(cat), d, ifNot != null)
        okRow(spark, "database", d)
      case dropDbRe(ifEx, cat, d, mode) =>
        graft.plans.FlinkDdl.dropDatabase(spark, Option(cat), d, ifEx != null,
          mode != null && mode.equalsIgnoreCase("CASCADE"))
        okRow(spark, "database", d)
      case stopJobRe(id) =>
        // WITH SAVEPOINT / WITH DRAIN accepted: Spark's graceful stop()
        // commits the checkpoint (the savepoint analog) before returning
        val q = spark.streams.active.find(q =>
          q.id.toString == id || Option(q.name).contains(id)).getOrElse(
          throw new IllegalArgumentException(s"STOP JOB '$id': no active job"))
        q.stop()
        okRow(spark, "job id", id)
      case alterDbRe(cat, d) =>
        // Flink's ALTER DATABASE SET: the declared namespace must exist;
        // properties carry no meaning over the one physical catalog, so
        // they are accepted (the SET-of-unknown-keys tolerance)
        val (curCat, _) = graft.plans.FlinkDdl.currentNamespace(spark)
        val c = Option(cat).map(_.toLowerCase).getOrElse(curCat)
        if (!graft.plans.FlinkDdl.listCatalogs(spark).contains(c) ||
            !graft.plans.FlinkDdl.listDatabasesOf(spark, c).contains(d.toLowerCase))
          throw new IllegalArgumentException(
            s"ALTER DATABASE: database `$c.${d.toLowerCase}` does not exist")
        okRow(spark, "database", d)
      case alterFunctionRe(ifExists, name, impl, language) =>
        // Flink's ALTER FUNCTION: re-point an existing session alias at
        // a new implementation (same resolution rules as CREATE FUNCTION)
        require(language == null || language.equalsIgnoreCase("JAVA") ||
          language.equalsIgnoreCase("SCALA"),
          s"ALTER FUNCTION LANGUAGE $language is not supported — " +
            "only JVM functions exist in this engine")
        // existence first (an absent name + IF EXISTS is a full no-op,
        // like Flink — nothing later may throw); only names this
        // session's CREATE FUNCTION aliased are alterable — a builtin
        // lives in the same registry but must not be hijacked
        if (!funcAliases(spark).contains(name.toLowerCase)) {
          if (ifExists != null) okRow(spark, "function", name)
          else throw new IllegalArgumentException(
            s"ALTER FUNCTION $name: no such temporary function " +
              "(CREATE FUNCTION first; builtins cannot be altered)")
        } else {
          val simple = impl.substring(impl.lastIndexOf('.') + 1)
          if (impl.equalsIgnoreCase(name) || simple.equalsIgnoreCase(name))
            throw new IllegalArgumentException(
              s"ALTER FUNCTION $name AS '$impl': the implementation " +
                "references the alias being replaced")
          // the new implementation must resolve BEFORE the old alias is
          // dropped, so a failing ALTER leaves the function intact;
          // functionExists THROWS on a dotted Java-class name — a
          // non-resolving implementation must answer false, not explode
          def resolvable(n: String) = try spark.catalog.functionExists(n)
            catch { case scala.util.control.NonFatal(_) => false }
          // a loadable eval-bridge class also resolves (same rules as
          // CREATE FUNCTION: table shape first, then scalar); probed
          // before anything is dropped. The probe registers under an
          // internal name — an eval-shaped but unsupported class (e.g.
          // overloaded eval) throws from the bridge with that internal
          // name and CREATE wording, so rewrap to the user's statement
          // before surfacing
          def bridgeable = try
            graft.functions.ReflectiveTable.register(spark, s"__graft_probe_$name", impl) ||
              graft.functions.ReflectiveScalar.register(spark, s"__graft_probe_$name", impl) ||
              graft.functions.ReflectiveTableAggregate.register(spark, s"__graft_probe_$name", impl) ||
              graft.functions.ReflectiveAggregate.register(spark, s"__graft_probe_$name", impl)
          catch {
            case e: IllegalArgumentException => throw new IllegalArgumentException(
              e.getMessage.replace(
                s"CREATE FUNCTION __graft_probe_$name", s"ALTER FUNCTION $name"))
          } finally {
            GraftColumnBridge.dropTempFunction(spark, s"__graft_probe_$name")
            graft.functions.ReflectiveTable.unregister(spark, s"__graft_probe_$name")
          }
          if (resolvable(impl) || resolvable(simple)) {
            GraftColumnBridge.dropTempFunction(spark, name)
            graft.functions.ReflectiveTable.unregister(spark, name)
            val resolved = GraftColumnBridge.aliasFunction(spark, name, impl) ||
              GraftColumnBridge.aliasFunction(spark, name, simple)
            require(resolved, s"ALTER FUNCTION $name: re-alias failed unexpectedly")
          } else if (bridgeable) {
            GraftColumnBridge.dropTempFunction(spark, name)
            graft.functions.ReflectiveTable.unregister(spark, name)
            require(graft.functions.ReflectiveTable.register(spark, name, impl) ||
              graft.functions.ReflectiveScalar.register(spark, name, impl) ||
              graft.functions.ReflectiveTableAggregate.register(spark, name, impl) ||
              graft.functions.ReflectiveAggregate.register(spark, name, impl),
              s"ALTER FUNCTION $name: eval-bridge registration failed unexpectedly")
          } else
            throw new IllegalArgumentException(
              s"ALTER FUNCTION $name AS '$impl': '$impl' does not resolve to a " +
                "known function or a loadable class with a public eval method — " +
                "register the logic first (as CREATE FUNCTION) or ADD JAR the class")
          okRow(spark, "function", name)
        }
      case createFunctionRe(ifNotExists, name, impl, language) =>
        require(language == null || language.equalsIgnoreCase("JAVA") ||
          language.equalsIgnoreCase("SCALA"),
          s"CREATE FUNCTION LANGUAGE $language is not supported — " +
            "only JVM functions exist in this engine")
        // the migration-practical mapping: the implementation name (or
        // its simple class name) must resolve to a session function —
        // builtin, graft-registered, or temp. A Flink UDF CLASS cannot
        // load here (no flink-table on the classpath): port it to a
        // Spark UDF / native expression and register, then alias it.
        val exists = spark.catalog.functionExists(name)
        if (exists && ifNotExists != null) okRow(spark, "function", name)
        else {
          val simple = impl.substring(impl.lastIndexOf('.') + 1)
          val resolved = GraftColumnBridge.aliasFunction(spark, name, impl) ||
            GraftColumnBridge.aliasFunction(spark, name, simple) ||
            // a classpath-resolvable CLASS (ADD JAR) registers through a
            // reflective eval bridge — the TABLE shape (void eval +
            // collector field, or Iterable/array return) first, then the
            // scalar shape; each returns false for the other's domain
            graft.functions.ReflectiveTable.register(spark, name, impl) ||
            graft.functions.ReflectiveScalar.register(spark, name, impl) ||
            // emitValue(acc, Consumer) — the TableAggregateFunction kind —
            // is probed before getValue's AggregateFunction shape
            graft.functions.ReflectiveTableAggregate.register(spark, name, impl) ||
            graft.functions.ReflectiveAggregate.register(spark, name, impl)
          if (!resolved)
            throw new IllegalArgumentException(
              s"CREATE FUNCTION $name AS '$impl': '$impl' does not resolve to a " +
                "known function or a loadable class with a public eval method. " +
                "Either ADD JAR the class (ScalarFunction-style: no-arg " +
                "constructor + one public eval) so the reflective bridge can " +
                "register it, or register the logic as a Spark function " +
                "(spark.udf.register or a graft native expression) and point " +
                "AS at its registered name.")
          funcAliases(spark).add(name.toLowerCase)
          okRow(spark, "function", name)
        }
      case dropFunctionRe(ifExists, name) =>
        // only this session's CREATE FUNCTION aliases drop — a builtin
        // shares the registry but DROP must not destroy it
        val isAlias = funcAliases(spark).contains(name.toLowerCase)
        if (isAlias) {
          GraftColumnBridge.dropTempFunction(spark, name)
          funcAliases(spark).remove(name.toLowerCase)
          graft.functions.ReflectiveTable.unregister(spark, name)
          graft.functions.FunctionParams.remove(spark, name)
        } else if (ifExists == null)
          throw new IllegalArgumentException(
            s"DROP FUNCTION $name: no such temporary function")
        okRow(spark, "function", name)
      // SQL-client catalog statements (Flink column names kept verbatim)
      case showTablesRe(cat, db, not, pat) =>
        // Flink's SHOW TABLES [(FROM | IN) [cat.]db] [[NOT] LIKE 'p'] —
        // the FROM/IN form answers from the namespace bookkeeping (which
        // database each DDL table was created under); the bare form
        // keeps the whole flat listing (temp views included)
        import spark.implicits._
        val base: Seq[String] =
          if (db != null) graft.plans.FlinkDdl.tablesIn(spark, Option(cat), db)
          else {
            val ddl = graft.plans.FlinkDdl.registeredTables(spark).keys
            val views = spark.catalog.listTables().collect()
              .filter(_.isTemporary).map(_.name.toLowerCase)
            (ddl ++ views).toSeq
          }
        val filtered = Option(pat) match {
          case None => base
          case Some(p) =>
            val re = ("(?i)^" + java.util.regex.Pattern.quote(p)
              .replace("%", "\\E.*\\Q").replace("_", "\\E.\\Q") + "$").r
            base.filter(t => (not == null) == re.findFirstIn(t).isDefined)
        }
        filtered.distinct.sorted.toDF("table name")
      case showCreateRe(name) =>
        import spark.implicits._
        Seq(renderCreateTable(spark, name)).toDF("create table")
      case showCreateViewRe(name) =>
        // Flink's SHOW CREATE VIEW: re-render from the recorded createSql
        // (not the bare body) so an optional `(a, b)` alias list survives
        import spark.implicits._
        val createSql = graft.plans.FlinkDdl.viewDefs(spark)
          .find(_._1 == name.toLowerCase).map(_._2)
          .getOrElse(throw new IllegalArgumentException(
            s"SHOW CREATE VIEW: '$name' is not a dialect-registered view"))
        val rest = raw"(?is)^\s*CREATE\s+OR\s+REPLACE\s+TEMPORARY\s+VIEW\s+\S+\s*".r
          .replaceFirstIn(createSql, "")
        Seq(s"CREATE VIEW $name $rest").toDF("create view")
      case showFunctionsRe() =>
        import spark.implicits._
        graft.functions.GraftFunctions.builders.map(_._1).sorted
          .toDF("function name")
      case showCatalogsRe() =>
        import spark.implicits._
        graft.plans.FlinkDdl.listCatalogs(spark).toDF("catalog name")
      case showColumnsRe(name, not, pat) =>
        // Flink's SHOW COLUMNS FROM t [NOT] LIKE 'p' — DESCRIBE's shape
        // filtered on the column name by SQL LIKE pattern
        val desc = sql(spark, s"DESCRIBE $name")
        val first = desc.columns.head
        Option(pat) match {
          case None => desc
          case Some(p) =>
            val m = org.apache.spark.sql.functions.col(s"`$first`").like(p)
            desc.filter(if (not == null) m else !m)
        }
      case showViewsRe() =>
        // views land in the temp-view registry; DDL-registered connector
        // tables are temp views too, so subtract them
        import spark.implicits._
        val ddl = graft.plans.FlinkDdl.registeredTables(spark).keySet
        spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && !ddl.contains(t.name.toLowerCase))
          .map(_.name.toLowerCase).toSeq.distinct.sorted.toDF("view name")
      case showDatabasesRe() =>
        import spark.implicits._
        graft.plans.FlinkDdl.listDatabases(spark).toDF("database name")
      case showPartitionsRe(name) =>
        // Flink's SHOW PARTITIONS over a PARTITIONED BY filesystem table:
        // one `k1=v1[/k2=v2]` row per partition directory
        import spark.implicits._
        val parts = graft.plans.FlinkDdl.partitionsOf(spark, name)
        if (parts.isEmpty)
          throw new IllegalArgumentException(
            s"SHOW PARTITIONS $name: not a partitioned DDL-registered table")
        val (_, path, _, _) = graft.plans.FlinkDdl.registered(spark, name).get
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        def walk(p: org.apache.hadoop.fs.Path, depth: Int): Seq[String] =
          if (depth == parts.length) Seq("")
          else if (!fs.exists(p)) Seq.empty
          else fs.listStatus(p).toSeq
            .filter(s => s.isDirectory && s.getPath.getName.contains("="))
            .flatMap { s =>
              walk(s.getPath, depth + 1).map { rest =>
                if (rest.isEmpty) s.getPath.getName else s.getPath.getName + "/" + rest
              }
            }
        walk(new org.apache.hadoop.fs.Path(path), 0)
          .sorted.toDF("partition name")
      case loadModuleRe(name) =>
        val m = modules(spark)
        if (m.containsKey(name))
          throw new IllegalArgumentException(
            s"LOAD MODULE: module '$name' is already loaded")
        m.put(name, true) // Flink appends a newly loaded module to the used list
        okRow(spark, "module", name)
      case unloadModuleRe(name) =>
        val m = modules(spark)
        if (!m.containsKey(name))
          throw new IllegalArgumentException(
            s"UNLOAD MODULE: module '$name' is not loaded")
        m.remove(name)
        okRow(spark, "module", name)
      case useModulesBareRe() =>
        // must not fall through to USE <db> (a database literally named
        // MODULES); Flink rejects the empty list at parse time
        throw new IllegalArgumentException("USE MODULES: empty module list")
      case useModulesRe(list) =>
        val names = list.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq
        if (names.isEmpty)
          throw new IllegalArgumentException("USE MODULES: empty module list")
        if (names.distinct.size != names.size)
          throw new IllegalArgumentException("USE MODULES: duplicate module name")
        val m = modules(spark)
        names.find(n => !m.containsKey(n)).foreach(n =>
          throw new IllegalArgumentException(s"USE MODULES: module '$n' is not loaded"))
        // used modules take the declared order; loaded-but-unused follow
        import scala.jdk.CollectionConverters._
        val loaded = m.keySet().asScala.toSeq
        m.clear()
        names.foreach(n => m.put(n, true))
        loaded.filterNot(names.contains).foreach(n => m.put(n, false))
        okRow(spark, "modules", names.mkString(", "))
      case showModulesRe(full) =>
        import spark.implicits._
        import scala.jdk.CollectionConverters._
        val entries = modules(spark).entrySet().asScala.toSeq
          .map(e => (e.getKey, e.getValue.booleanValue))
        if (full != null) entries.toDF("module name", "used")
        else entries.filter(_._2).map(_._1).toDF("module name")
      case useCatalogRe(c) =>
        graft.plans.FlinkDdl.useCatalog(spark, c)
        okRow(spark, "catalog", c)
      case useDbRe(cat, d) =>
        graft.plans.FlinkDdl.useDatabase(spark, Option(cat), d)
        okRow(spark, "database", d)
      case showCurrentRe(which) =>
        import spark.implicits._
        val (c, d) = graft.plans.FlinkDdl.currentNamespace(spark)
        if (which.equalsIgnoreCase("CATALOG")) Seq(c).toDF("current catalog name")
        else Seq(d).toDF("current database name")
      case describeRe(name)
          if graft.plans.FlinkDdl.registered(spark, name).isDefined =>
        import spark.implicits._
        // Flink's DESCRIBE shape, all six columns verbatim:
        // name | type | null | key | extras | watermark
        val (_, _, _, schema) = graft.plans.FlinkDdl.registered(spark, name).get
        val wm = graft.plans.FlinkDdl.watermarkOf(spark, name)
        val pk = graft.plans.FlinkDdl.primaryKeyOf(spark, name)
        val computed = graft.plans.FlinkDdl.computedColumnsOf(spark, name)
        val keyTag = if (pk.isEmpty) null else pk.mkString("PRI(", ", ", ")")
        val viewSchema = spark.table(name).schema
        val physRows = schema.fields.toSeq.map { f =>
          (f.name, flinkTypeName(f.dataType), f.nullable,
            if (pk.contains(f.name)) keyTag else null,
            null: String,
            wm.filter(_._1 == f.name)
              .map { case (c, delay) => s"`$c` - INTERVAL ${intervalSql(delay)}" }
              .orNull)
        }
        // metadata then computed columns render after the physical ones,
        // extras = `METADATA FROM '<key>' [VIRTUAL]` / `AS <expr>` (the
        // Flink DESCRIBE shapes for both)
        val metaRows = graft.plans.FlinkDdl.metadataColumnsOf(spark, name).map { m =>
          (m.name, flinkTypeName(
            org.apache.spark.sql.types.DataType.fromDDL(m.typeDdl)), !m.notNull,
            null: String,
            s"METADATA FROM '${m.key}'" + (if (m.virtual) " VIRTUAL" else ""),
            null: String)
        }
        val compRows = computed.map { case (n, e) =>
          val dt = viewSchema.find(_.name.equalsIgnoreCase(n))
          (n, dt.map(f => flinkTypeName(f.dataType)).getOrElse("STRING"),
            dt.forall(_.nullable), null: String, s"AS $e", null: String)
        }
        (physRows ++ metaRows ++ compRows)
          .toDF("name", "type", "null", "key", "extras", "watermark")
      case _ if graft.plans.FlinkDdl.isAlter(spark, statement) =>
        okRow(spark, "table",
          graft.plans.FlinkDdl.executeAlter(spark, statement))
      // Flink `CREATE [OR REPLACE] VIEW [IF NOT EXISTS] v AS SELECT ...`
      // lands in the in-memory catalog; the Spark analog of that catalog
      // is the session temp-view registry — and a PERMANENT Spark view
      // cannot reference the temp views our connector DDL registers, so
      // the dialect maps Flink views onto temp views wholesale
      // Flink's ALTER VIEW ([U] flink-sql-parser SqlAlterViewRename /
      // SqlAlterViewAs): these must not reach Spark — its ALTER VIEW
      // cannot touch temp views, and the dialect registry would go stale
      case alterViewRenameRe(from, to) =>
        val d = graft.plans.FlinkDdl.viewDefs(spark)
          .find(_._1.equalsIgnoreCase(from)).getOrElse(
            throw new IllegalArgumentException(
              s"ALTER VIEW $from: view does not exist"))
        if (spark.catalog.tableExists(to))
          throw new IllegalArgumentException(
            s"ALTER VIEW $from RENAME TO $to: '$to' already exists")
        // swap only the name in the RECORDED definition, so a column
        // alias list `(a, b)` survives the rename
        val createSql = raw"(?is)^\s*CREATE\s+OR\s+REPLACE\s+TEMPORARY\s+VIEW\s+`?[A-Za-z_]\w*`?"
          .r.replaceFirstIn(d._2, s"CREATE OR REPLACE TEMPORARY VIEW $to")
        graft.plans.FlinkDdl.runDialectSql(spark, createSql)
        graft.plans.FlinkDdl.registerView(spark, to, createSql, d._3)
        graft.plans.FlinkDdl.unregisterView(spark, from)
        spark.catalog.dropTempView(from)
        okRow(spark, "view", to)
      case alterViewAsRe(name, body) =>
        if (!graft.plans.FlinkDdl.viewDefs(spark).exists(_._1.equalsIgnoreCase(name)))
          throw new IllegalArgumentException(
            s"ALTER VIEW $name: view does not exist")
        val createSql = s"CREATE OR REPLACE TEMPORARY VIEW $name AS $body"
        // the new body must analyze BEFORE the registry commits — a bad
        // ALTER leaves the old definition fully intact
        graft.plans.FlinkDdl.runDialectSql(spark, createSql)
        graft.plans.FlinkDdl.replaceViewBody(spark, name, createSql, body.trim)
        okRow(spark, "view", name)
      case _ if createViewRe.findFirstIn(statement).isDefined =>
        val m = createViewRe.findFirstMatchIn(statement).get
        val name = m.group(2)
        if (m.group(1) != null && spark.catalog.tableExists(name))
          okRow(spark, "view", name) // IF NOT EXISTS: silently keep
        else {
          val createSql = createViewRe.replaceFirstIn(statement,
            s"CREATE OR REPLACE TEMPORARY VIEW $name ")
          // through the DIALECT parser, so view bodies may use the Flink
          // SQL surface (bracket constructors, window TVFs, UNNEST, ...)
          graft.plans.FlinkDdl.runDialectSql(spark, createSql)
          // record the definition so streaming INSERTs can re-bind the
          // view chain onto streaming sources (FlinkDdl.viewDefs)
          // skip an optional `(col [COMMENT ...], ...)` alias list before
          // the AS so the recorded body is the bare SELECT (Flink allows
          // `CREATE VIEW v (a, b) AS SELECT ...`)
          val body = raw"(?is)^\s*(?:\([^)]*\)\s*)?AS\s+(.*)$$".r
            .findFirstMatchIn(statement.substring(m.end)).map(_.group(1))
            .getOrElse(statement.substring(m.end))
          graft.plans.FlinkDdl.registerView(spark, name, createSql, body)
          okRow(spark, "view", name)
        }
      case _ if dropViewRe.findFirstIn(statement).isDefined =>
        val m = dropViewRe.findFirstMatchIn(statement).get
        val ifExists = m.group(1) != null
        graft.plans.FlinkDdl.unregisterView(spark, m.group(2))
        // rewrite: Spark's grammar has no TEMPORARY in DROP VIEW, so
        // Flink's natural CREATE/DROP TEMPORARY VIEW pair must not be
        // forwarded verbatim; IF EXISTS carries over
        spark.sql(s"DROP VIEW ${if (ifExists) "IF EXISTS " else ""}`${m.group(2)}`")
        okRow(spark, "view", m.group(2))
      case createProcedureRe(ifNotExists, name, impl) =>
        // FLIP-311 procedures come from CATALOGS in Flink — this DDL is
        // the graft porting seam (documented extension): point AS at a
        // class with a public `call(ctx, args...)` method
        if (graft.functions.ReflectiveProcedure.isRegistered(spark, name) &&
            ifNotExists != null) okRow(spark, "procedure", name)
        else if (graft.functions.ReflectiveProcedure.isRegistered(spark, name))
          // Flink-style DDL errors on an existing name rather than
          // silently replacing the registration
          throw new IllegalArgumentException(
            s"CREATE PROCEDURE $name: a procedure with this name is already " +
              "registered — use CREATE PROCEDURE IF NOT EXISTS to keep it, " +
              "or DROP PROCEDURE first to replace it")
        else {
          if (!graft.functions.ReflectiveProcedure.register(spark, name, impl))
            throw new IllegalArgumentException(
              s"CREATE PROCEDURE $name AS '$impl': '$impl' does not load or has " +
                "no public call method with a leading context parameter " +
                "(the FLIP-311 Procedure shape: `T[] call(ProcedureContext, args...)`) " +
                "— ADD JAR the class first")
          okRow(spark, "procedure", name)
        }
      case dropProcedureRe(ifExists, name) =>
        if (!graft.functions.ReflectiveProcedure.isRegistered(spark, name) &&
            ifExists == null)
          throw new IllegalArgumentException(
            s"DROP PROCEDURE $name: no such procedure")
        graft.functions.ReflectiveProcedure.unregister(spark, name)
        okRow(spark, "procedure", name)
      case showProceduresRe(pat) =>
        import spark.implicits._
        val names = graft.functions.ReflectiveProcedure.registered(spark)
        val filtered = Option(pat) match {
          case Some(p) =>
            val rx = ("(?i)^" + java.util.regex.Pattern.quote(p)
              .replace("%", "\\E.*\\Q").replace("_", "\\E.\\Q") + "$").r
            names.filter(n => rx.findFirstIn(n).isDefined)
          case None => names
        }
        filtered.toDF("procedure name")
      case callStmtRe(fqName, argsSql) =>
        // Flink's CALL statement ([U] FLIP-311). Catalog/db qualifiers
        // strip — registration is session-scoped here.
        val name = fqName.split('.').last
        if (!graft.functions.ReflectiveProcedure.isRegistered(spark, name))
          throw new IllegalArgumentException(
            s"CALL $name: no such procedure. Flink stored procedures " +
              "(FLIP-311) are catalog-provided code; no catalog here ships " +
              "procedures, so register the implementation first — " +
              s"CREATE PROCEDURE $name AS 'your.impl.Class' (a class with a " +
              "public call(ctx, args...) method) — or port the body to a " +
              "graft operator and invoke it directly.")
        graft.functions.ReflectiveProcedure.call(spark, name, argsSql)
      case _ if callRe.findFirstIn(statement).isDefined =>
        throw new IllegalArgumentException(
          "CALL syntax: CALL [catalog.][db.]procedure_name(arg, ...) — " +
            s"could not parse: ${statement.trim.take(80)}")
      case _ =>
        val parser = new graft.plans.GraftSqlParser(spark, spark.sessionState.sqlParser)
        GraftColumnBridge.ofRows(spark, parser.parsePlan(statement))
    }
  }

  /** Plan `body` through the dialect chain WITHOUT executing it
    * (commands stay unrun — they print as the deferred command node) and
    * render per Flink's ExplainDetails: ESTIMATED_COST → the
    * stats-annotated plan, JSON_EXECUTION_PLAN → the optimized plan as
    * JSON, CHANGELOG_MODE / PLAN_ADVICE → the plan plus the documented
    * semantic delta (Spark plans carry no changelog coloring — row_kind
    * columns do — and runtime re-planning is AQE's job).
    */
  private def explainText(spark: SparkSession, body: String,
      details: Seq[String]): String = {
    val parser = new graft.plans.GraftSqlParser(spark, spark.sessionState.sqlParser)
    parser.parsePlan(body) match {
      case c: org.apache.spark.sql.execution.command.LeafRunnableCommand => c.toString
      case p =>
        val qe = GraftColumnBridge.ofRows(spark, p).queryExecution
        val base =
          if (details.contains("ESTIMATED_COST")) qe.stringWithStats
          else if (details.contains("JSON_EXECUTION_PLAN")) qe.optimizedPlan.toJSON
          else qe.toString
        val notes = details.collect {
          case "CHANGELOG_MODE" =>
            "-- CHANGELOG_MODE: plans are insert-only here; retract/upsert " +
              "changelogs travel as explicit row_kind columns (MIGRATION.md)"
          case "PLAN_ADVICE" =>
            "-- PLAN_ADVICE: no static advice; adaptive query execution " +
              "re-plans joins/skew at runtime"
        }
        (base +: notes).mkString("\n")
    }
  }

  /** Spark type → Flink DDL type name (the reverse of the connector-DDL
    * schema parse; TIMESTAMP renders at the rowtime-conventional
    * precision 3).
    */
  private[graft] def flinkTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "BIGINT"
      case IntegerType => "INT"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case StringType => "STRING"
      case BooleanType => "BOOLEAN"
      case BinaryType => "BYTES"
      case DateType => "DATE"
      case TimestampType | TimestampNTZType => "TIMESTAMP(3)"
      case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
      case ArrayType(e, _) => s"ARRAY<${flinkTypeName(e)}>"
      case MapType(k, v, _) => s"MAP<${flinkTypeName(k)}, ${flinkTypeName(v)}>"
      case s: StructType =>
        s"ROW<${s.fields.map(f => s"`${f.name}` ${flinkTypeName(f.dataType)}").mkString(", ")}>"
      case other => other.sql
    }
  }

  /** "5 seconds" (registry form) → "'5' SECOND" (DDL form). */
  private def intervalSql(delay: String): String = {
    val Array(n, unit) = delay.split("\\s+", 2)
    s"'$n' ${unit.stripSuffix("s").toUpperCase}"
  }

  /** Re-render a registered connector table as its CREATE TABLE DDL. */
  private def renderCreateTable(spark: SparkSession, name: String): String = {
    val (connector, path, fmt, schema) = graft.plans.FlinkDdl
      .registered(spark, name)
      .getOrElse(throw new IllegalArgumentException(
        s"SHOW CREATE TABLE: '$name' is not a DDL-registered table"))
    val wm = graft.plans.FlinkDdl.watermarkOf(spark, name)
    val parts = graft.plans.FlinkDdl.partitionsOf(spark, name)
    val cols = schema.fields.map(f => s"  `${f.name}` ${flinkTypeName(f.dataType)}" +
      (if (!f.nullable) " NOT NULL" else ""))
    val metaLines = graft.plans.FlinkDdl.metadataColumnsOf(spark, name).map(m =>
      s"  `${m.name}` ${flinkTypeName(
        org.apache.spark.sql.types.DataType.fromDDL(m.typeDdl))}" +
        (if (m.notNull) " NOT NULL" else "") + s" METADATA FROM " +
        s"'${m.key}'" + (if (m.virtual) " VIRTUAL" else ""))
    val compLines = graft.plans.FlinkDdl.computedColumnsOf(spark, name)
      .map { case (n, e) => s"  `$n` AS $e" }
    val pkLine = Some(graft.plans.FlinkDdl.primaryKeyOf(spark, name))
      .filter(_.nonEmpty)
      .map(_.mkString("  PRIMARY KEY (`", "`, `", "`) NOT ENFORCED"))
    val wmLine = wm.map { case (c, delay) =>
      s"  WATERMARK FOR `$c` AS `$c` - INTERVAL ${intervalSql(delay)}" }
    val partLine =
      if (parts.isEmpty) "" else parts.mkString(" PARTITIONED BY (`", "`, `", "`)")
    // the FULL recorded WITH map (csv delimiters, kafka topics, ...);
    // the canonical triple leads, the rest render sorted for stability
    val triple = Seq(Some("connector" -> connector),
      Option(path).filter(_.nonEmpty).map("path" -> _),
      Option(fmt).filter(_.nonEmpty).map("format" -> _)).flatten
    val extraOpts = (graft.plans.FlinkDdl.optionsOf(spark, name) --
      triple.map(_._1)).toSeq.sortBy(_._1)
    val opts = (triple ++ extraOpts).map { case (k, v) => s"  '$k' = '$v'" }
    s"CREATE TABLE `$name` (\n${(cols ++ metaLines ++ compLines ++ pkLine ++ wmLine).mkString(",\n")}\n)$partLine\nWITH (\n${opts.mkString(",\n")}\n)"
  }

  /** COMPILE PLAN's dependency closure: every DDL-registered table and
    * dialect view the statement references — transitively through view
    * createSql + bodies — as replayable `(kind, name, ddl, viewBody)`
    * rows. Tables lead (views read them); views keep registration order
    * (later views may reference earlier ones).
    */
  private def planDdls(spark: SparkSession,
      text: String): Seq[(String, String, String, String)] = {
    val tables = graft.plans.FlinkDdl.registeredTables(spark).keySet
    val views = graft.plans.FlinkDdl.viewDefs(spark)
    val viewMap = views.map(v => v._1 -> v).toMap
    def namesIn(s: String): Set[String] =
      raw"[A-Za-z_]\w*".r.findAllIn(s).map(_.toLowerCase).toSet
    var need = Set.empty[String]
    var frontier = namesIn(text)
    while (frontier.nonEmpty) {
      val hits = frontier.filter(n =>
        (tables.contains(n) || viewMap.contains(n)) && !need.contains(n))
      need ++= hits
      frontier = hits.flatMap(n => viewMap.get(n)
        .map(v => namesIn(v._2 + " " + v._3)).getOrElse(Set.empty[String])) -- need
    }
    val t = tables.intersect(need).toSeq.sorted
      .map(n => ("table", n, renderCreateTable(spark, n), ""))
    val v = views.filter(x => need.contains(x._1))
      .map(x => ("view", x._1, x._2, x._3))
    t ++ v
  }

  // JSON string escape (same contract as Verify's oracle dump: quote,
  // backslash, all control chars — plan files must survive json.load)
  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def okRow(spark: SparkSession, col: String, v: String): DataFrame = {
    import spark.implicits._
    Seq(("OK", v)).toDF("result", col)
  }

  def run(spark: SparkSession, script: String): DataFrame = {
    val stmts = statements(script)
    require(stmts.nonEmpty, "empty script")
    stmts.map(sql(spark, _)).last
  }

  /** The streaming deployment shape: every statement up to the last
    * runs as in [[run]] (typically connector DDL), and the final
    * statement — which must be `INSERT INTO <ddl sink> SELECT ...` —
    * starts as a Structured Streaming job ([[graft.plans.FlinkDdl
    * .executeInsertStream]]: DDL filesystem sources become watermarked
    * readStreams, the sink a writeStream). Returns the running
    * StreamingQuery; `AvailableNow` by default (process everything
    * present, then stop — await termination for the bounded analog of
    * a Flink batch-mode INSERT).
    */
  def runStream(spark: SparkSession, script: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val stmts = statements(script)
    require(stmts.nonEmpty, "empty script")
    stmts.init.foreach(sql(spark, _))
    require(graft.plans.FlinkDdl.isInsert(spark, stmts.last),
      "the last statement of a streaming script must be INSERT INTO a DDL-registered sink")
    graft.plans.FlinkDdl.executeInsertStream(spark,
      graft.plans.FlinkDdl.resolveNames(spark, stmts.last), trigger)
  }

  /** Streaming multi-sink deployment — Flink's `EXECUTE STATEMENT SET`
    * as ONE submission: the script's final statement must be a
    * statement set, and every INSERT inside it starts as its own
    * Structured Streaming query (Spark's unit of execution is the
    * query; Flink's one-job fan-out is N queries over the same
    * sources). Returns the running queries in statement order.
    */
  def runStreamSet(spark: SparkSession, script: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : Seq[org.apache.spark.sql.streaming.StreamingQuery] = {
    val stmts = statements(script)
    require(stmts.nonEmpty, "empty script")
    stmts.init.foreach(sql(spark, _))
    val body = stmtSetRe.findFirstMatchIn(stmts.last).map(_.group(1)).getOrElse(
      throw new IllegalArgumentException(
        "the last statement must be EXECUTE STATEMENT SET BEGIN ...; ...; END"))
    statements(body).map { ins =>
      require(graft.plans.FlinkDdl.isInsert(spark, ins),
        s"statement set members must be INSERT INTO a DDL sink, got: ${ins.take(60)}")
      graft.plans.FlinkDdl.executeInsertStream(spark,
        graft.plans.FlinkDdl.resolveNames(spark, ins), trigger)
    }
  }

  /** Split a script on top-level `;` (quote- and comment-aware: a `;`
    * or `'` inside a `--` line comment or a `/* */` block comment is
    * plain text — comments are copied through for the SQL parser to
    * strip, but never open literals or split statements).
    */
  private[graft] def statements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    def startsWith(s: String): Boolean = script.startsWith(s, i)
    while (i < script.length) {
      val c = script.charAt(i)
      if (!inQuote && startsWith("--")) {
        // line comment: copy to end of line verbatim
        while (i < script.length && script.charAt(i) != '\n') { cur += script.charAt(i); i += 1 }
      } else if (!inQuote && startsWith("/*")) {
        // block comment: copy to the closing */ (or end of script)
        cur ++= "/*"; i += 2
        while (i < script.length && !startsWith("*/")) { cur += script.charAt(i); i += 1 }
        if (i < script.length) { cur ++= "*/"; i += 2 }
      } else {
        c match {
          case '\'' =>
            // '' inside a quoted literal is an escaped quote, not a close
            if (inQuote && i + 1 < script.length && script.charAt(i + 1) == '\'') {
              cur += c; cur += c; i += 1
            } else { inQuote = !inQuote; cur += c }
          case ';' if !inQuote => out += cur.result(); cur.clear()
          case _ => cur += c
        }
        i += 1
      }
    }
    out += cur.result()
    regroupStatementSets(
      out.result().map(s => stripLeadingComments(s).trim).filter(_.nonEmpty))
  }

  /** Drop comments BEFORE a statement's first token (they'd defeat the
    * dialect routers' anchored regexes); inner comments stay for the
    * SQL parser to handle.
    */
  private def stripLeadingComments(s: String): String = {
    var t = s
    var changed = true
    while (changed) {
      val trimmed = t.dropWhile(_.isWhitespace)
      val next =
        if (trimmed.startsWith("--"))
          trimmed.dropWhile(_ != '\n')
        else if (trimmed.startsWith("/*")) {
          val close = trimmed.indexOf("*/", 2)
          if (close < 0) "" else trimmed.substring(close + 2)
        } else trimmed
      changed = next != trimmed
      t = next
    }
    t
  }

  private val setOpenRe =
    raw"(?is)^\s*(?:COMPILE\s+(?:AND\s+EXECUTE\s+)?PLAN\s+'[^']*'\s+FOR\s+)?(EXECUTE\s+STATEMENT\s+SET\s+BEGIN|BEGIN\s+STATEMENT\s+SET|STATEMENT\s+SET\s+BEGIN)\b".r

  /** `EXECUTE STATEMENT SET BEGIN ...; ...; END` spans `;` boundaries —
    * re-join the split pieces (with `;`) until the closing END so the
    * whole set reaches [[sql]] as one statement.
    */
  private def regroupStatementSets(stmts: Seq[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    var open: Option[StringBuilder] = None
    stmts.foreach { s =>
      open match {
        case Some(buf) =>
          buf ++= ";"; buf ++= s
          if (s.trim.equalsIgnoreCase("END")) { out += buf.result(); open = None }
        case None =>
          if (setOpenRe.findFirstIn(s).isDefined &&
              !raw"(?is)\bEND\s*$$".r.findFirstIn(s).isDefined)
            open = Some(new StringBuilder(s))
          else out += s
      }
    }
    open.foreach(buf => out += buf.result()) // unterminated: surface as-is
    out.result()
  }
}
