package graft.streaming

import java.nio.file.{Files, Paths}

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.sources.readstat.SchemaMerge

/** Widen-restart supervision for a 24/7 readstat intake stream (r11
  * close-out candidate (c)).
  *
  * Spark fixes a streaming query's output schema at start, so the
  * admission gate must REFUSE an arrival that needs a wider or taller
  * schema even under `mergeSchema=true` — it quarantines the file with a
  * restart-to-re-merge hint and the stream keeps flowing. That leaves the
  * widen loop manual: some operator has to notice the hint, stop the
  * query, and start it again so batch-side inference re-merges over
  * everything on disk. This supervisor closes that loop.
  *
  * Detection is by RE-PROBE, not by error-message matching: a quarantine
  * record (stage "plan") names a refused file; the file is a re-merge
  * candidate iff its schema STILL probes cleanly and merges with the
  * running query's schema along the closed widening lattice. A corrupt
  * upload fails the probe and never triggers a restart; a genuinely
  * non-widenable drift (e.g. double → string) fails the merge and never
  * triggers a restart — both stay ordinary quarantines.
  *
  * The restart hand-off: consumed quarantine records are deleted BEFORE
  * the rebuild, so a record can trigger at most one restart; the rebuilt
  * query (the `build` factory re-infers from disk — e.g. a fresh
  * `readStream…load(dir)` with `mergeSchema`) admits the file because the
  * batch-side merge now sees it. Offsets live in the checkpoint, and the
  * source HOLDS its offset just before a widenable refusal (it never
  * passes through a committed batch — see ReadstatMicroBatchStream
  * .widenHold), so the restart resumes exactly after the last committed
  * batch and the refused file replays into the first new batch no matter
  * when the poll lands relative to the stream's own trigger cadence.
  *
  * Scale note: the poll reads a handful of TINY quarantine records and
  * probes only the files they name — independent of corpus size; healthy
  * intakes poll an empty directory.
  */
object IntakeSupervisor {

  /** Quarantined files (from `badDir`'s records, stage "plan") that a
    * restart would admit: still present, schema probes cleanly, and the
    * probed schema merges with `declared` along the widening lattice.
    */
  def reMergeable(spark: SparkSession, declared: StructType,
      badDir: String): Seq[String] = {
    val dir = new java.io.File(badDir)
    val records = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("bad-") && f.getName.endsWith("-plan.json"))
    records.toSeq.flatMap { f =>
      jsonField(new String(Files.readAllBytes(f.toPath), "UTF-8"), "path")
    }.distinct.filter { p =>
      Files.exists(Paths.get(stripScheme(p))) && Try {
        val probed = spark.read.format("readstat").load(p).schema
        SchemaMerge.merge(Seq(("declared", declared), (p, probed)))
      }.isSuccess
    }
  }

  /** Run `build` under supervision until `stop` returns true. The builder
    * starts the query from the CURRENT on-disk inference (a fresh
    * `readStream…load(dir)`) and returns it together with the schema it
    * started under — the supervisor needs that schema to judge whether a
    * refused file would be admitted by a re-merge. Every `pollMs`,
    * quarantine records are checked; when at least `threshold` distinct
    * refused files are re-mergeable, the query stops, the consumed
    * records are cleared, and `build` runs again. Returns the number of
    * restarts performed.
    */
  def supervise(spark: SparkSession, badDir: String,
      build: () => (StreamingQuery, StructType), stop: () => Boolean,
      threshold: Int = 1, pollMs: Long = 200,
      maxRestarts: Int = 10): Int = {
    require(threshold >= 1 && maxRestarts >= 0)
    var restarts = 0
    var (q, declared) = build()
    try {
      while (!stop()) {
        Thread.sleep(pollMs)
        if (restarts < maxRestarts &&
            reMergeable(spark, declared, badDir).size >= threshold) {
          q.stop()
          clearRecords(badDir)
          val built = build()
          q = built._1
          declared = built._2
          restarts += 1
        }
      }
      restarts
    } finally q.stop()
  }

  private def clearRecords(badDir: String): Unit = {
    Option(new java.io.File(badDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("bad-") && f.getName.endsWith(".json"))
      .foreach(_.delete())
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) p.substring("file:".length) else p

  /** Minimal extraction of a string field from the quarantine record's
    * one-line JSON (written by Quarantine.report with known escaping).
    */
  private[streaming] def jsonField(json: String, name: String): Option[String] = {
    val key = "\"" + name + "\": \""
    val i = json.indexOf(key)
    if (i < 0) return None
    val sb = new StringBuilder
    var j = i + key.length
    var done = false
    while (!done && j < json.length) {
      json.charAt(j) match {
        case '\\' if j + 1 < json.length =>
          json.charAt(j + 1) match {
            case '"' => sb.append('"'); j += 2
            case '\\' => sb.append('\\'); j += 2
            case 'n' => sb.append('\n'); j += 2
            case 'r' => sb.append('\r'); j += 2
            case 't' => sb.append('\t'); j += 2
            case 'u' =>
              sb.append(Integer.parseInt(json.substring(j + 2, j + 6), 16).toChar)
              j += 6
            case c => sb.append(c); j += 2
          }
        case '"' => done = true
        case c => sb.append(c); j += 1
      }
    }
    if (done) Some(sb.toString) else None
  }
}
