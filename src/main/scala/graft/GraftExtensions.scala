package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library integration point: `spark.sql.extensions=graft.GraftExtensions`
  * (or `builder.withExtensions(new GraftExtensions)`) injects every graft
  * kernel into the session's FunctionRegistry at build time — the
  * standard way a Spark library ships SQL functions, matching the
  * reference's module-loaded function catalog
  * ([U] flink-table-planner FlinkSqlOperatorTable.java via module loading).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // the Flink SQL dialect (graft.plans.GraftSqlParser): connector DDL +
    // INSERT INTO sinks, window TVFs, legacy group windows,
    // MATCH_RECOGNIZE subset, FOR SYSTEM_TIME AS OF — a strict superset;
    // plain statements delegate untouched.
    ext.injectParser((session, parser) =>
      new graft.plans.GraftSqlParser(session, parser))
  }
}
