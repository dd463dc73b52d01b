package graft.sources.readstat

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Small-files compaction for streaming-sink directories (r11 close-out
  * candidate #2): a month-long intake run writes one `part-e<epoch>-<pid>`
  * container per partition per epoch — thousands of small files whose
  * per-file metadata parses eventually dominate a batch load. `compact`
  * folds the old epochs into a handful of consolidated containers.
  *
  * The swap is ATOMIC for readers without a manifest, via a marker file:
  * compacted containers are named `compact-e<lo>-e<hi>-<n>.<ext>` and are
  * IGNORED by the multi-file load until the single marker
  * `compact-e<lo>-e<hi>.done` exists; once it does, the epoch parts inside
  * `[lo, hi]` are ignored instead (and can be deleted at leisure — a crash
  * mid-delete leaves a directory that still reads exactly once). One
  * `fs.create` of an empty marker is the entire commit, the same
  * single-atomic-operation discipline as the sink's deterministic epoch
  * names. Re-compaction folds previous compact sets too: a marker whose
  * range is contained in a wider marker's range is INACTIVE (the wider set
  * already carries its rows), so the new marker's creation atomically
  * retires the old sets; their files and markers are garbage, collected by
  * the next run's sweep.
  *
  * RANGE-VERSIONED markers (r11f — the "compact-set splitting" gap):
  * subsumption alone can only ever WIDEN a range, so one oversized
  * compact set could never be re-sharded to a new byte target. Markers
  * and containers now carry an optional `.v<k>` (legacy unversioned names
  * read as v1, and v1 writes keep the legacy names, so existing
  * directories are untouched): for EQUAL ranges the highest marker
  * version wins, and re-running `compact` with a target that changes the
  * shard count rewrites the same range at version+1 — the commit is
  * still one marker create (readers flip from v<k> to v<k+1> atomically;
  * staged higher-version containers are invisible until their marker
  * lands, retired lower versions are garbage for the sweep).
  *
  * Contracts:
  *  - The newest `keep` epochs are never touched (default 1): an ACTIVE
  *    stream's current epoch may be partially committed, and folding it
  *    would orphan the replay's remaining task files.
  *  - A directory being TAILED by the readstat streaming source must only
  *    be compacted up to epochs every tailing reader has already admitted
  *    (the source skips `compact-*` rewrites entirely — they are old rows —
  *    so compacting a not-yet-discovered epoch would lose it for the tail).
  *    Batch readers need no coordination at all.
  */
object Compaction {

  private val DoneName = """compact-e(\d+)-e(\d+)(?:\.v(\d+))?\.done""".r
  private val CompactName = """compact-e(\d+)-e(\d+)(?:\.v(\d+))?-\d+\.[A-Za-z0-9]+""".r
  private val EpochName = """part-e(\d+)-.+""".r

  /** Legacy unversioned names read as version 1. */
  private def ver(v: String): Long = if (v == null) 1L else v.toLong

  /** True for the compaction machinery's own files (compacted containers
    * and markers) — the streaming SOURCE must never admit these: they are
    * rewrites of epochs it already emitted.
    */
  def isCompactionFile(name: String): Boolean = name match {
    case CompactName(_, _, _) | DoneName(_, _, _) => true
    case _ => false
  }

  /** Marker ranges present, reduced to the ACTIVE set (range → winning
    * version): for equal ranges the highest version wins (a re-shard in
    * place); a range strictly contained in a different (wider) surviving
    * range has been re-compacted away. Either way the losers' files are
    * garbage awaiting the sweep.
    */
  private def activeSets(names: Seq[String]): Map[(Long, Long), Long] = {
    val byRange = names
      .collect { case DoneName(lo, hi, v) => (lo.toLong, hi.toLong) -> ver(v) }
      .groupBy(_._1).map { case (r, xs) => r -> xs.map(_._2).max }
    byRange.filter { case (r, _) =>
      !byRange.keys.exists(o => o != r && o._1 <= r._1 && r._2 <= o._2)
    }
  }

  /** Compaction-aware listing filter (applied by the batch load's directory
    * expansion): keep a compacted container only when its (range, version)
    * marker is the active one; drop epoch parts covered by an active
    * marker; markers themselves are never data. Names not from the
    * compaction/sink vocabulary pass through untouched.
    */
  def filterNames(names: Seq[String]): Set[String] = {
    val active = activeSets(names)
    names.filter {
      case DoneName(_, _, _) => false
      case CompactName(lo, hi, v) =>
        active.get((lo.toLong, hi.toLong)).contains(ver(v))
      case EpochName(e) =>
        !active.keys.exists(r => e.toLong >= r._1 && e.toLong <= r._2)
      case _ => true
    }.toSet
  }

  final case class Result(
      foldedEpochs: Int,
      foldedSets: Int,
      inputFiles: Int,
      outputFiles: Int,
      rows: Long)

  /** Fold everything below the newest `keep` epochs — old epoch parts AND
    * previously compacted sets — into one consolidated compact set sized
    * at `targetBytes` per container. No-op (None) when there is nothing to
    * fold or folding would not reduce the file count. Always sweeps
    * leftovers from interrupted runs first (uncommitted compact files;
    * retired sets; epoch parts already covered by an active marker).
    */
  def compact(spark: SparkSession, dir: String, keep: Int = 1,
      targetBytes: Long = 128L << 20): Option[Result] = {
    require(keep >= 1, "compaction must keep at least the newest epoch " +
      "(an active stream's current epoch may be partially committed)")
    val hp = new HPath(dir)
    val fs = hp.getFileSystem(ReadstatIO.sessionConf)
    require(fs.exists(hp) && fs.getFileStatus(hp).isDirectory,
      s"compaction target must be a sink directory: $dir")

    sweep(fs, hp)

    val listing = fs.listStatus(hp).toSeq.filter(_.isFile)
    val names = listing.map(_.getPath.getName)
    val active = activeSets(names)

    val epochParts: Map[Long, Seq[org.apache.hadoop.fs.FileStatus]] = listing
      .flatMap(st => st.getPath.getName match {
        case EpochName(e) => Some(e.toLong -> st)
        case _ => None
      }).groupBy(_._1).map { case (e, xs) => e -> xs.map(_._2) }
    val compactParts: Map[(Long, Long), Seq[org.apache.hadoop.fs.FileStatus]] = listing
      .flatMap(st => st.getPath.getName match {
        case CompactName(lo, hi, v)
            if active.get((lo.toLong, hi.toLong)).contains(ver(v)) =>
          Some((lo.toLong, hi.toLong) -> st)
        case _ => None
      }).groupBy(_._1).map { case (r, xs) => r -> xs.map(_._2) }

    val epochs = epochParts.keys.toSeq.sorted
    val targets = epochs.dropRight(keep)
    // nothing at all to work on
    if (targets.isEmpty && compactParts.isEmpty) return None

    val inputs = targets.flatMap(epochParts) ++ compactParts.values.flatten.toSeq
    if (inputs.isEmpty) return None
    // with no new epochs and a single active set, the only useful work is
    // a RE-SHARD of that set to the byte target — a no-op unless the
    // target actually changes the file count (checked below, after nOut)
    val resharding = targets.isEmpty && compactParts.size == 1
    if (!resharding && inputs.size <= 1) return None
    val exts = inputs.map(st => ext(st.getPath.getName)).distinct
    require(exts.size == 1,
      s"compaction needs one container format per directory, found: ${exts.mkString(",")}")
    val format = exts.head match {
      case ".dta" => "dta"
      case ".sav" => "sav"
      case ".zsav" => "zsav"
      case ".sas7bdat" => "sas7bdat"
    }

    val lo = (targets ++ compactParts.keys.map(_._1)).min
    val hi = (targets ++ compactParts.keys.map(_._2)).max

    // the consolidated write: the existing multi-file load over exactly the
    // folded files, repartitioned to the byte target, through the existing
    // directory-of-containers sink into a staging dir
    val totalBytes = inputs.map(_.getLen).sum
    // a re-shard is not bounded by the current file count (splitting ONE
    // oversized set into several is the point); consolidation is
    val nOutRaw = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
    val nOut = (if (resharding) nOutRaw
                else math.min(inputs.size.toLong, nOutRaw)).toInt
    if (resharding && nOut == inputs.size) return None // same sharding: no-op
    // same-range rewrite commits at version+1 (above anything ever seen
    // for the range, markers or stranded container files); a new range
    // starts at the legacy-named v1
    val newVer = {
      val seen = names.collect {
        case DoneName(l, h, v) if l.toLong == lo && h.toLong == hi => ver(v)
        case CompactName(l, h, v) if l.toLong == lo && h.toLong == hi => ver(v)
      }
      if (seen.isEmpty) 1L else seen.max + 1L
    }
    val vtag = if (newVer == 1L) "" else s".v$newVer"
    val tmp = new HPath(dir, ".compact-tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val df = spark.read.format("readstat")
      .load(inputs.map(_.getPath.toString): _*)
      .repartition(nOut)
    df.write.format("readstat").option("format", format)
      .mode("overwrite").save(tmp.toString)

    // stage into place under pre-commit names: invisible to readers until
    // the marker lands
    val staged = fs.listStatus(tmp).filter(_.isFile)
      .map(_.getPath).sortBy(_.getName)
    val finals = staged.zipWithIndex.map { case (p, i) =>
      new HPath(dir, f"compact-e$lo%06d-e$hi%06d$vtag-$i%05d${exts.head}")
    }
    staged.zip(finals).foreach { case (s, d) =>
      if (fs.exists(d)) fs.delete(d, false)
      require(fs.rename(s, d), s"compaction: cannot stage $s -> $d")
    }
    fs.delete(tmp, true)

    // THE COMMIT: one atomic create flips readers from the old files to the
    // compact set (retiring narrower ranges by subsumption and any
    // lower-version set of the SAME range by version precedence)
    fs.create(new HPath(dir, f"compact-e$lo%06d-e$hi%06d$vtag.done"), true).close()

    // now garbage: old epoch parts in range, retired sets + their markers
    sweep(fs, hp)

    val rows = spark.read.format("readstat")
      .load(finals.map(_.toString): _*).count()
    Some(Result(targets.size, compactParts.size, inputs.size, finals.length, rows))
  }

  /** Crash-recovery sweep, safe to run any time: deletes (a) compacted
    * containers with no active marker — either an interrupted run's
    * uncommitted staging or a set retired by a wider marker, (b) epoch
    * parts covered by an active marker — an interrupted post-commit delete,
    * (c) markers subsumed by a wider marker, AFTER their files are gone,
    * (d) any leftover staging dir. Readers are correct at every
    * intermediate point — the sweep only removes files `filterNames`
    * already ignores.
    */
  private def sweep(fs: FileSystem, dir: HPath): Unit = {
    val listing = fs.listStatus(dir).toSeq
    val names = listing.filter(_.isFile).map(_.getPath.getName)
    val active = activeSets(names)
    listing.filter(_.isFile).foreach { st =>
      val keep = st.getPath.getName match {
        case CompactName(lo, hi, v) =>
          active.get((lo.toLong, hi.toLong)).contains(ver(v))
        case EpochName(e) =>
          !active.keys.exists(r => e.toLong >= r._1 && e.toLong <= r._2)
        case DoneName(lo, hi, v) =>
          active.get((lo.toLong, hi.toLong)).contains(ver(v))
        case _ => true
      }
      if (!keep) fs.delete(st.getPath, false)
    }
    val tmp = new HPath(dir, ".compact-tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  private def ext(name: String): String = {
    val i = name.lastIndexOf('.')
    require(i >= 0, s"compaction: container without extension: $name")
    name.substring(i).toLowerCase
  }
}
