package graft.operators

import org.apache.spark.sql.DataFrame

/** Semantic cache key for a DataFrame's analyzed plan — the shared
  * memo key of the pre-flight probes (range-join fan-out guard, as-of
  * route probe): one string that is equal iff the frames compute the
  * same thing over the same inputs.
  *
  * The canonical plan string alone is NOT sound: `LocalRelation` prints
  * no rows, and a file relation's string may omit its path — so the key
  * appends a leaf fingerprint (parquet root paths; inline-data
  * hashCode, which LocalRelation derives from its rows). A fingerprint
  * mismatch can only cause a cache MISS (re-pricing — correct, just
  * slower); the unsound direction (two different inputs colliding) is
  * closed by including both the canonical structure and the leaves. */
private[operators] object PlanKey {

  def of(df: DataFrame): String = {
    val analyzed = df.queryExecution.analyzed
    val leafFp = analyzed.collectLeaves().map {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation =>
            fs.location.rootPaths.mkString(",")
          case other => s"${other.getClass.getName}:${other.hashCode}"
        }
      case leaf => s"${leaf.getClass.getName}:${leaf.hashCode}"
    }.mkString("|")
    analyzed.canonicalized.toString + "#" + leafFp
  }
}
