package graft.operators

import org.apache.spark.sql.DataFrame

/** Semantic cache key for a DataFrame's analyzed plan — the shared
  * memo key of the pre-flight probes (range-join fan-out guard, as-of
  * route probe): one string that is equal iff the frames compute the
  * same thing over the same input SNAPSHOT.
  *
  * Two soundness requirements (both directions verified by spec):
  *
  *  1. Plan fidelity. The default `toString` rendering truncates node
  *     fields at `spark.sql.debug.maxToStringFields` (25), so two
  *     wide-but-different plans could print identically. The key
  *     renders the canonicalized tree with `maxFields = Int.MaxValue`
  *     so no field is elided.
  *  2. Input snapshot. A canonical plan names file inputs by path, but
  *     a path's CONTENTS can change between calls (append/overwrite).
  *     For file leaves the key therefore folds in a file-snapshot
  *     fingerprint — file count, total bytes, max modification time —
  *     taken from the SAME FileIndex the query itself would scan, so
  *     cached probe statistics expire exactly when the data the query
  *     reads changes. Non-file leaves (LocalRelation) fingerprint via
  *     their hashCode, which derives from the inline rows.
  *
  * A fingerprint mismatch can only cause a cache MISS (re-pricing —
  * correct, just slower); the unsound direction (two different inputs
  * colliding) is closed by including the full-fidelity canonical
  * structure, the leaf identity and the leaf snapshot. */
private[operators] object PlanKey {

  def of(df: DataFrame): String = {
    val analyzed = df.queryExecution.analyzed
    val leafFp = analyzed.collectLeaves().map {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation =>
            fs.location.rootPaths.mkString(",") + "@" + snapshot(fs.location)
          case other => s"${other.getClass.getName}:${other.hashCode}"
        }
      case leaf => s"${leaf.getClass.getName}:${leaf.hashCode}"
    }.mkString("|")
    treeStringFull(analyzed.canonicalized) + "#" + leafFp
  }

  /** count:bytes:maxModTime over the leaf's own (cached) file listing —
    * the advisory fingerprint that invalidates memoized probe stats
    * when a path's contents change. Fails open to a time-bucketed token
    * (fresh key ≈ re-price) rather than closed (stale reuse). */
  private def snapshot(
      location: org.apache.spark.sql.execution.datasources.FileIndex)
      : String =
    try {
      val files = location.listFiles(Nil, Nil).iterator.flatMap(_.files)
      var n = 0L; var bytes = 0L; var maxMod = 0L
      files.foreach { f =>
        n += 1L
        bytes += f.getLen
        if (f.getModificationTime > maxMod) maxMod = f.getModificationTime
      }
      s"$n:$bytes:$maxMod"
    } catch {
      case scala.util.control.NonFatal(_) =>
        s"unlisted:${System.nanoTime()}"
    }

  /** Canonicalized tree rendered with no field truncation. */
  private def treeStringFull(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : String =
    plan.treeString(verbose = true, addSuffix = false,
      maxFields = Int.MaxValue, printOperatorId = false)
}
