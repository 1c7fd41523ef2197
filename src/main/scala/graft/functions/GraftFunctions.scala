package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}

/** SQL registration for graft's native expressions — the analog of the
  * reference's `CREATE TEMPORARY FUNCTION` / built-in operator table
  * ([U] flink-table-planner FlinkSqlOperatorTable.java): after
  * `GraftFunctions.register(spark)`, `graft_dot(a, b)` is callable from
  * `spark.sql` text alongside the built-ins.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    GraftColumnBridge.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)))
  }
}
