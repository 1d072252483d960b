package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` bridge the library needs: turn a custom
  * [[LogicalPlan]] into a [[org.apache.spark.sql.DataFrame]]. Spark's
  * own extension surface hands out plan-level hooks
  * (`injectPlannerStrategy`, `injectOptimizerRule`) but no public
  * plan→DataFrame constructor, so every library that ships a custom
  * logical operator (the documented `LogicalPlan` + `Strategy` +
  * `SparkPlan` extension tier) hosts this same two-line shim in an
  * `org.apache.spark.sql` subpackage. Nothing else in the codebase may
  * import from here except `graft.plans` factories.
  */
object GraftSqlShim {

  /** `Dataset.ofRows` for classic (JVM-local) sessions; Connect
    * sessions have no local plan representation, so refuse loudly. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame = spark match {
    case c: classic.SparkSession => classic.Dataset.ofRows(c, plan)
    case other => throw new IllegalStateException(
      "GraftSqlShim.ofRows requires a classic SparkSession (got " +
        s"${other.getClass.getName}); Spark Connect sessions cannot host " +
        "library-local logical plans")
  }
}
