package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Engine-owned ingest state living beside a persistent index under
  * `<dir>/_ingest` — today the streaming lateness gate's persisted
  * watermark ([[graft.streaming.IngestWatermark]]).
  *
  * The lifecycle contract is engine-wide: `build` (fresh corpus) CLEARS
  * it — a rebuilt index must not inherit the previous corpus's
  * event-time high-water mark, which would classify the entire next
  * ingest as late; `append`/`vacuum`/`rebalance` (same corpus) keep it.
  * All four index families call this from build, whether or not they
  * have a streaming ingest path today — the contract should not depend
  * on which operator happens to write under the directory first.
  */
object IngestState {

  val SubDir = "_ingest"

  /** Pre-versioned-store watermark location; cleared alongside `_ingest`
    * so the legacy-migration fallback in
    * [[graft.streaming.IngestWatermark.read]] cannot resurrect the dead
    * pre-rebuild watermark after a build wiped the JSON versions.
    */
  val LegacyWatermarkDir = "ingest_watermark"

  def clear(spark: SparkSession, indexDir: String): Unit = {
    val fs = new Path(indexDir, SubDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq(SubDir, LegacyWatermarkDir).foreach { sub =>
      val p = new Path(indexDir, sub)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }
}
