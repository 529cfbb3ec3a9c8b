package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions.
  * Spark 4's Column wraps a ColumnNode (Connect-compatible API) and the
  * converters live behind `private[sql]`; this shim is the supported-pattern
  * escape hatch for libraries that ship custom Catalyst expressions.
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `SparkSession.cloneSession()` is `private[sql]`: a full session-state
    * copy (runtime conf, temp views, registered functions) sharing the
    * context and catalog — unlike the public `newSession()`, which resets
    * runtime-set confs to the context defaults. The bucketed-layout
    * operators plan on a clone carrying the caller's own planning confs
    * plus the layout contract entries (graft.BucketedPlan). */
  def cloneSession(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}
