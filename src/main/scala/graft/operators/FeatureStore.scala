package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extract-once feature materialization for the media modalities.
  *
  * Codec decode is the dominant cost of every multimodal query (the
  * steady-state top-4 cluster: video fingerprints, scene cuts, image
  * rasters), and a production pipeline never decodes a payload once per
  * QUERY — it runs one extraction stage and points every consumer at
  * the resulting feature table. This object is that stage's contract:
  * `tableFor(key)(build)` materializes `build`'s output to parquet ONCE
  * per process and returns a reader over it, so N queries over the same
  * (family, stride) pay one decode pass plus N columnar scans.
  *
  * Scope is deliberately PER-PROCESS (keyed under the JVM pid, removed
  * by a shutdown hook): a cross-run store would be a correctness cache
  * — a stale feature table silently masking a codec regression from the
  * oracle gate. Within a run the reuse is exactly the production
  * "extract once" economics; across runs extraction re-executes and the
  * gates re-verify the codec path end to end.
  *
  * At 100 TB the same shape holds with a durable table and an explicit
  * pipeline stage boundary: payload bytes stay in the extraction job's
  * narrow map passes (never in an exchange), and downstream dedup/
  * similarity/segmentation read only the small feature columns.
  */
object FeatureStore {

  private val built = new ConcurrentHashMap[String, String]()

  private lazy val root: Path = {
    val base =
      try {
        val p = Paths.get("target", "graft-feature-store",
                          s"pid-${ProcessHandle.current().pid()}")
        Files.createDirectories(p)
        p
      } catch {
        case _: Throwable =>
          Files.createTempDirectory("graft-feature-store")
      }
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(base)))
    base
  }

  private def deleteRec(p: Path): Unit = {
    try {
      if (Files.isDirectory(p))
        Files.list(p).forEach(deleteRec(_))
      Files.deleteIfExists(p)
    } catch { case _: Throwable => () }
  }

  /** Materialize `build` once per process under `key` and return a
    * parquet-backed reader. The key names the feature family and its
    * parameters INCLUDING the input's identity (e.g.
    * "video-dup-s4-/root/testdata/sf0.1") — it is sanitized to a safe
    * directory name here, so callers can embed raw paths. A digest of
    * the RAW key rides along in the directory name: sanitization alone
    * would let two distinct keys that differ only in non-safe
    * characters ("a/b" vs "a_b") share one feature table — exactly the
    * correctness cache collision this store exists to rule out.
    */
  def tableFor(spark: SparkSession, key: String)
              (build: => DataFrame): DataFrame = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val safe = key.replaceAll("[^A-Za-z0-9._-]", "_") + "-" + digest
    val path = built.computeIfAbsent(safe, _ => {
      val p = root.resolve(safe).toString
      build.write.mode("overwrite").parquet(p)
      p
    })
    spark.read.parquet(path)
  }
}
