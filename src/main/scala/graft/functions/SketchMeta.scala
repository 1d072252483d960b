package graft.functions

import org.apache.spark.sql.SparkSession

/** Version stamp for PERSISTED sketch-state tables.
  *
  * The sketch hash function is part of the persisted state FORMAT: the
  * round-11 fmix64 avalanche fix (see [[KmvSketch.fmix64]]) changed
  * every hash the KMV, quantile-bottom-k and bloom states store, so a
  * state table written by a pre-fix build merges/probes against new
  * states or readers WITHOUT ERROR but yields wrong estimates and
  * missed bloom hits — and long-lived stored sketch tables are exactly
  * the framework's documented workflow. This object makes the version
  * explicit: every writer of a sketch table stamps a
  * `_graft_sketch_meta` file (underscore-prefixed, so Spark's parquet
  * reader ignores it) carrying [[SketchMeta.HashVersion]], and every
  * reader checks it — a version MISMATCH fails loudly with the rebuild
  * instruction; an ABSENT stamp (a table predating this scheme, or an
  * external one) logs a WARN naming the risk instead of guessing.
  *
  * Version history:
  *  - 1 (implicit, pre-round-11): raw FNV-1a — biased order statistics
  *    on short sequential keys (measured −24 %…+85 % KMV error).
  *  - 2: FNV-1a + murmur fmix64 finalizer, shared by every estimator
  *    that divides by a hash fraction. Pre-v2 states must be REBUILT
  *    from the raw data; there is no in-place migration (the original
  *    hashes are not recoverable from a truncated k-minimum state).
  */
object SketchMeta {

  /** Current persisted-state hash version (2 = FNV-1a + fmix64). */
  val HashVersion = 2

  /** Session conf key for strict reads: when `true`, an ABSENT version
    * stamp fails closed instead of WARNing. The default stays WARN for
    * backward compatibility (pre-scheme tables keep reading), but a
    * production deployment whose sketch tables are all stamped should
    * set this — a silently-merged pre-fmix64 state is the one remaining
    * way the v1→v2 migration can produce wrong estimates without error,
    * and at 100 TB nobody eyeballs the WARN in an executor log. */
  val StrictConfKey = "spark.graft.sketchMeta.strict"

  private val MetaFile = "_graft_sketch_meta"

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Stamp `dir` with the current hash version (idempotent overwrite).
    * Call after writing any parquet table that stores sketch states. */
  def write(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, MetaFile)
    val out = fs(spark, dir).create(p, true)
    try out.write(s"hashVersion=$HashVersion\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** Read the stamped version of `dir`, if any. */
  def read(spark: SparkSession, dir: String): Option[Int] = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir, MetaFile)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val body = try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](256)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toString("UTF-8")
      } finally in.close()
      body.linesIterator.collectFirst {
        case l if l.startsWith("hashVersion=") =>
          l.stripPrefix("hashVersion=").trim.toInt
      }
    }
  }

  /** Gate a read of a stored sketch table: throw on a version mismatch
    * (wrong estimates would otherwise flow silently); an ABSENT stamp
    * WARNs by default, or throws when [[StrictConfKey]] is `true` in
    * the session conf (fail-closed mode for production reads of
    * long-lived stored tables). */
  def check(spark: SparkSession, dir: String): Unit = read(spark, dir) match {
    case Some(v) if v != HashVersion => throw new IllegalStateException(
      s"sketch table at $dir was written with hash version $v but this " +
        s"build reads version $HashVersion - estimates would be silently " +
        "wrong. Rebuild the table from its raw data with this build " +
        "(states are not migratable in place).")
    case Some(_) => ()
    case None =>
      val msg =
        s"sketch table at $dir carries no _graft_sketch_meta stamp - if " +
          s"it was written before hash version $HashVersion (fmix64), its " +
          "states must be rebuilt; merging them with current states " +
          "yields wrong estimates without error."
      if (spark.conf.get(StrictConfKey, "false").toBoolean)
        throw new IllegalStateException(
          msg + s" ($StrictConfKey=true: unstamped reads fail closed; " +
            "stamp the table with SketchMeta.write after verifying or " +
            "rebuilding it.)")
      else log.warn(msg)
  }
}
