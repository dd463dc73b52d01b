package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Multimodal (binary) column plumbing for a training-data pipeline:
  * image/audio/video payloads ride as opaque BINARY columns with a typed
  * metadata struct; decode / feature-extract / frame-sample run as
  * per-partition batch operations over `Dataset[MediaRow]`.
  *
  * Container-HEADER decode is REAL for the public formats whose layouts
  * are specification text (r9 verdict #5):
  *   - PNG (ISO/IEC 15948): 8-byte signature, then the IHDR chunk whose
  *     width/height are big-endian u32 at byte offsets 16/20.
  *   - JPEG (ITU-T T.81 §B): marker-segment walk to the first SOFn frame
  *     header (0xC0–0xCF minus C4/C8/CC), which carries height then width
  *     as big-endian u16 at segment offsets 5/7.
  *   - WAV (RIFF): "RIFF…WAVE" container, chunk walk to `fmt ` (channels
  *     u16 LE, sample rate u32 LE) and `data` (PCM frame count =
  *     chunk size / block align). Mapped into the struct as
  *     width = sample rate, height = channels, n_frames = PCM frames.
  *
  * FULL-PAYLOAD decode is REAL for PNG, WAV, and baseline JPEG as of r11
  * ([[MediaCodecs]]: chunk walk + CRC + Inflater + unfilter → pixels;
  * RIFF walk → PCM16 samples; [[JpegCodec]]: Huffman + dequant + IDCT +
  * upsample + YCbCr→RGB). The lossless pair is exercised end-to-end by
  * q98/q99, whose synthesized-per-doc REAL container bytes round the
  * encode→decode trip with integer feature sums a DuckDB oracle pins
  * without ever seeing a PNG; JPEG (lossy — no formula oracle can exist)
  * is spec-pinned against the JDK's independent libjpeg-derived decoder
  * within T.81's IDCT conformance envelope, bit-exactly on DC-only
  * content. No payload stub remains; unknown magics and graft's
  * synthetic 12-byte "GRFT" header (u16 width, u16 height, u32 n_frames)
  * still parse through the same typed quarantine path.
  */
object MultimodalOps {

  final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)
  final case class MediaMeta(doc_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, n_bytes: Int)
  final case class ImageFeat(doc_id: Long, width: Long, height: Long,
      channels: Long, n_pixels: Long, sum_luma: Long)
  final case class MediaFeatures(doc_id: Long, kind: String, media_type: String,
      width: Long, height: Long, channels: Long, n_samples: Long, sum_value: Long)
  final case class AudioFeat(doc_id: Long, sample_rate: Long, channels: Long,
      n_frames: Long, sum_abs: Long, peak: Long)
  final case class ImageHash(doc_id: Long, dhash: Long)

  /** One decoded media asset for the q125 waterfall: decode success flag,
    * exact-byte digest of the CONTAINER, perceptual hash of the decoded
    * CONTENT (dHash / energy contour).
    */
  final case class MediaAsset(doc_id: Long, ok: Boolean, digest: String, phash: Long)

  /** The document id scan fanned out to core count BEFORE the CPU-bound
    * synthesize+decode maps (q98/q99/q105/q106/q125): these stages cost
    * per-ROW cpu (PNG inflate, WAV decode, dHash), not per-byte, and
    * Spark's byte-based input-split sizing packs a slim id column into
    * ONE task — measured at sf0.1: the whole 5,000-doc q105 decode pass
    * ran on one core (1.7 s) while 31 idled, and it sat on the query's
    * critical path. The repartition shuffles only 8-byte ids; the same
    * rule holds on a cluster (decode parallelism must track cores, not
    * input bytes — a real blob store hits this whenever payloads are
    * fetched by key rather than co-resident in the scanned file).
    */
  private def docIds(s: SparkSession, d: String): Dataset[Long] = {
    import s.implicits._
    documents(s, d).select("doc_id").as[Long]
      .repartition(s.sparkContext.defaultParallelism)
  }

  /** Synthesize a binary "media" payload per document (deterministic from
    * text) — stands in for reading real blobs at 100 TB.
    */
  def syntheticMedia(s: SparkSession, d: String): DataFrame = {
    documents(s, d).select(
      col("doc_id"),
      // GRFT header + payload: width/height/frames derived from n_chars
      expr("""concat(
        encode('GRFT', 'UTF-8'),
        substring(encode(text, 'UTF-8'), 1, 8),
        encode(text, 'UTF-8'))""").as("media"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"))
  }

  /** Single-blob header parse — the per-row body of [[decodeHeader]],
    * exposed so specs can drive REAL format bytes through the exact
    * deployed code path. Unrecognized magics yield (-1, -1, -1): a
    * quarantine row, never a throw (one corrupt blob must not fail a
    * 100 TB decode stage).
    */
  private[operators] def parseHeader(docId: Long, kind: String,
      b: Array[Byte]): MediaMeta = {
    def u16be(i: Int) = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32be(i: Int) = ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    def u16le(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32le(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    def ascii(i: Int, s: String) =
      b.length >= i + s.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (b.length >= 24 && b.take(8).sameElements(pngSig) && ascii(12, "IHDR"))
      // ISO/IEC 15948 §5.2 signature + §11.2.2 IHDR: width/height u32 BE
      MediaMeta(docId, kind, u32be(16), u32be(20), 1, b.length)
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // ITU-T T.81 §B.1.1.4: walk marker segments to the first SOFn
      var i = 2
      var out: MediaMeta = null
      while (out == null && i + 1 < b.length && (b(i) & 0xff) == 0xff) {
        // T.81 §B.1.1.2: any number of 0xFF fill bytes may precede a
        // marker — the marker code is the first non-FF byte after them
        while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
        // fill bytes ran to EOF: no marker code left to read → quarantine
        val m = if (i + 1 < b.length) b(i + 1) & 0xff else { i = b.length; 0 }
        if (i >= b.length) {
          // fall through to the while condition and exit with out == null
        } else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOF segment: [len u16][precision u8][height u16][width u16]
          if (i + 8 < b.length)
            out = MediaMeta(docId, kind, u16be(i + 7), u16be(i + 5), 1, b.length)
          else i = b.length // truncated SOF → quarantine
        } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i += 2 // standalone marker, no length field
        } else if (i + 3 < b.length) {
          i += 2 + u16be(i + 2) // skip segment: length includes itself
        } else i = b.length
      }
      if (out != null) out else MediaMeta(docId, kind, -1, -1, -1, b.length)
    } else if (b.length >= 36 && ascii(0, "RIFF") && ascii(8, "WAVE")) {
      // RIFF chunk walk: fmt (channels u16 LE, rate u32 LE, block align
      // u16 LE), data (frames = size / block align)
      var i = 12
      var rate = -1; var channels = -1; var blockAlign = 0; var frames = -1
      var ok = true
      while (ok && i + 8 <= b.length) {
        // chunk size is UNSIGNED u32: read into a Long, or a hostile size
        // ≥ 2^31 turns negative as an Int and the walk either spins in
        // place (advance of 0) or indexes b(negative) — one corrupt blob
        // must quarantine, not hang an executor or throw
        val size = u32le(i + 4).toLong & 0xffffffffL
        if (ascii(i, "fmt ") && size >= 16 && i + 8 + 16 <= b.length) {
          channels = u16le(i + 10); rate = u32le(i + 12); blockAlign = u16le(i + 20)
        } else if (ascii(i, "data") && blockAlign > 0) {
          frames = math.min(size / blockAlign, Int.MaxValue.toLong).toInt
        }
        val next = i.toLong + 8 + size + (size & 1) // chunks are word-aligned
        if (next > b.length) ok = false else i = next.toInt
      }
      if (rate < 0) MediaMeta(docId, kind, -1, -1, -1, b.length)
      else MediaMeta(docId, kind, rate, channels, frames, b.length)
    } else if (b.length >= 12 && ascii(0, "GRFT")) {
      // graft's synthetic container — the stand-in for formats whose
      // codecs are out of container
      MediaMeta(docId, kind, u16be(4), u16be(6), u16be(8), b.length)
    } else MediaMeta(docId, kind, -1, -1, -1, b.length)
  }

  /** Header decode per partition: REAL for PNG/JPEG/WAV (public layouts),
    * synthetic GRFT plus quarantine rows for the rest — see the object
    * doc. Real pipelines extend the same map with full codec calls; the
    * batching, schema and distribution stay identical.
    */
  def decodeHeader(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => parseHeader(r.doc_id, r.kind, r.media)))
  }

  /** r9 name for [[decodeHeader]] — kept so round-over-round citations
    * resolve; the decode is no longer a stub for PNG/JPEG/WAV headers.
    */
  def decodeHeaderStub(media: Dataset[MediaRow]): Dataset[MediaMeta] =
    decodeHeader(media)

  /** q98's operator body: per document, synthesize a REAL gray-8 PNG from
    * a deterministic pixel formula, run it through the full
    * [[MediaCodecs.decodePng]] chain (signature → CRC-verified chunk walk
    * → Inflater → unfilter), and report integer features of the DECODED
    * pixels. The oracle recomputes the same sums from the formula alone —
    * any bug anywhere in the container encode, the inflate, or the
    * unfilter shifts `sum_luma` and fails the hash. A decode failure
    * surfaces as a (-1,…) quarantine row, which the oracle would also
    * catch. Scale shape: row-local mapPartitions, zero shuffle; payload
    * bytes never leave the task.
    */
  def imageDecodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docIds(s, d).mapPartitions { it =>
      it.map { id =>
        val w = (1 + id % 16).toInt
        val h = (1 + id % 12).toInt
        val pix = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            pix(y * w + x) = (((id * 31 + x * 7 + y * 13) % 256) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        val png = MediaCodecs.encodePng(MediaCodecs.Image(w, h, 1, pix))
        MediaCodecs.decodePng(png) match {
          case Some(img) =>
            var sum = 0L
            img.pixels.foreach(p => sum += (p & 0xff))
            ImageFeat(id, img.width, img.height, img.channels,
              img.width.toLong * img.height, sum)
          case None => ImageFeat(id, -1, -1, -1, -1, -1)
        }
      }
    }.toDF()
  }

  /** q99's operator body: the WAV twin of [[imageDecodeFeatures]] —
    * deterministic PCM16 samples, REAL RIFF container bytes round the
    * encode→decode trip, integer |sample| sums pin the oracle.
    */
  def audioDecodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docIds(s, d).mapPartitions { it =>
      it.map { id =>
        val rate = (8000 + (id % 8) * 1000).toInt
        val n = (64 + id % 64).toInt
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = (((id * 7 + i * 11) % 4096) - 2048).toShort
          i += 1
        }
        val wav = MediaCodecs.encodeWavPcm16(MediaCodecs.Audio(rate, 1, samples))
        MediaCodecs.decodeWavPcm16(wav) match {
          case Some(a) =>
            var sumAbs = 0L; var peak = 0L
            a.samples.foreach { sVal =>
              val v = math.abs(sVal.toLong)
              sumAbs += v; if (v > peak) peak = v
            }
            AudioFeat(id, a.sampleRate, a.channels, a.samples.length, sumAbs, peak)
          case None => AudioFeat(id, -1, -1, -1, -1, -1)
        }
      }
    }.toDF()
  }

  /** q105 synthesis formula, shared verbatim with the DuckDB oracle:
    * 9×7 grayscale, pixel = first md5 byte of "g:x:y" (group-determined
    * pseudo-random content, so distinct groups' perceptual hashes are
    * uniformly far apart), with the single SPOT pixel at
    * (xs, ys) = (1 + g%7, g%7) boosted by (doc_id % 3)·96 — same-group
    * variants differ ONLY there, flipping at most the two dHash bits that
    * compare against the spot.
    */
  private[operators] def q105Pixel(g: Long, id: Long, x: Int, y: Int): Int = {
    // first md5 BYTE == the oracle's CAST('0x' || substr(md5(k),1,2) …)
    val base = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$g:$x:$y".getBytes("UTF-8"))(0) & 0xff
    val xs = 1 + (g % 7).toInt
    val ys = (g % 7).toInt
    val boost = if (x == xs && y == ys) ((id % 3) * 96).toInt else 0
    (base + boost) % 256
  }

  /** q105's hash stage — the REAL dHash pipeline: per document,
    * synthesize a 36×28 image (each 9×7 formula cell block-replicated
    * 4×4, so the area average reproduces the formula value EXACTLY and
    * the no-container oracle stays closed-form), encode a REAL PNG,
    * decode it back through [[MediaCodecs]], box-downscale to the 9×7
    * hash grid ([[MediaCodecs.boxDownscale]] — actual dHash downsamples
    * arbitrary-size inputs exactly like this), and compute the 56-bit
    * difference hash: bit (y·8+x) set iff px(x+1,y) > px(x,y).
    * Row-local; one narrow map over the corpus.
    */
  /** q105's synthesized container: the REAL PNG bytes for a doc_id (each
    * 9×7 formula cell block-replicated 4×4 into a 36×28 grayscale image).
    * A pure function of (doc_id % 100, doc_id % 3) — q125's exact-dedup
    * oracle groups by doc_id % 300 on exactly this identity.
    */
  private def q105Png(id: Long): Array[Byte] = {
    val g = id % 100
    val w = 36; val h = 28
    val pix = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        pix(y * w + x) = q105Pixel(g, id, x / 4, y / 4).toByte
        x += 1
      }
      y += 1
    }
    MediaCodecs.encodePng(MediaCodecs.Image(w, h, 1, pix))
  }

  /** 56-bit dHash of a decoded image, after the 9×7 box downscale. */
  private def dhashOf(img0: MediaCodecs.Image): Long = {
    val img = MediaCodecs.boxDownscale(img0, 9, 7)
    var dh = 0L
    var yy = 0
    while (yy < 7) {
      var xx = 0
      while (xx < 8) {
        val a = img.pixels(yy * 9 + xx) & 0xff
        val b = img.pixels(yy * 9 + xx + 1) & 0xff
        if (b > a) dh |= 1L << (yy * 8 + xx)
        xx += 1
      }
      yy += 1
    }
    dh
  }

  def imageDHashes(s: SparkSession, d: String): Dataset[ImageHash] = {
    import s.implicits._
    docIds(s, d).mapPartitions { it =>
      it.map { id =>
        MediaCodecs.decodePng(q105Png(id)) match {
          case Some(img) => ImageHash(id, dhashOf(img))
          case None => ImageHash(id, -1L)
        }
      }
    }
  }

  /** q105: perceptual image near-dup — dHash + banded Hamming search,
    * the multimodal twin of q36's SimHash chain (q87 catches only
    * byte-exact copies; re-encoded or slightly-retouched images need a
    * perceptual key). Scale shape: the 56-bit hash splits into 4×14-bit
    * bands (pigeonhole: any pair at Hamming ≤ 3 shares ≥ 1 intact band,
    * so banding has GUARANTEED recall at the ≤3 verify bar); candidates
    * bucket-join per band value — the bounded-bucket discipline, never
    * corpus-all-pairs — then exact `bit_count(xor)` verifies. The DuckDB
    * oracle recomputes hashes from the generating formula (the q98
    * no-container discipline) and brute-forces ALL pairs, so it
    * independently checks the banding's recall, not just its precision.
    */
  def imageNearDup(s: SparkSession, d: String): DataFrame =
    hammingNearDup(imageDHashes(s, d).toDF())

  /** q106 synthesis formula, shared verbatim with the DuckDB oracle:
    * 456 PCM16 samples (57 windows × 8), sample = signed 12-bit value
    * from the first two md5 bytes of "g:i" (group-determined
    * pseudo-random audio), with the single window (g % 57) amplitude-
    * boosted ×(1 + doc_id % 3) — same-group variants differ only in that
    * window's energy, flipping at most the two contour bits that compare
    * against it.
    */
  private[operators] def q106Sample(md: java.security.MessageDigest,
      g: Long, id: Long, i: Int): Int = {
    val d = md.digest(s"$g:$i".getBytes("UTF-8"))
    val h16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    val base = (h16 % 4096) - 2048
    val factor = if (i / 8 == (g % 57).toInt) (1 + id % 3).toInt else 1
    base * factor
  }

  /** q106's hash stage: synthesize the clip, encode a REAL WAV, decode it
    * back through [[MediaCodecs]], and compute the 56-bit energy-contour
    * fingerprint — bit w set iff window w+1's summed |sample| energy
    * exceeds window w's (the energy-difference-sign device acoustic
    * fingerprints like Chromaprint build on). Row-local.
    */
  /** q106's synthesized container: the REAL WAV bytes for a doc_id —
    * like [[q105Png]], a pure function of (doc_id % 100, doc_id % 3).
    */
  private def q106Wav(md: java.security.MessageDigest, id: Long): Array[Byte] = {
    val g = id % 100
    val samples = new Array[Short](456)
    var i = 0
    while (i < 456) {
      samples(i) = q106Sample(md, g, id, i).toShort
      i += 1
    }
    MediaCodecs.encodeWavPcm16(MediaCodecs.Audio(8000, 1, samples))
  }

  /** 56-bit energy-contour fingerprint of decoded PCM16 audio. */
  private def contourOf(a: MediaCodecs.Audio): Long = {
    val e = new Array[Long](57)
    var j = 0
    while (j < 456) {
      e(j / 8) += math.abs(a.samples(j).toLong)
      j += 1
    }
    var fp = 0L
    var w = 0
    while (w < 56) {
      if (e(w + 1) > e(w)) fp |= 1L << w
      w += 1
    }
    fp
  }

  def audioFingerprints(s: SparkSession, d: String): Dataset[ImageHash] = {
    import s.implicits._
    docIds(s, d).mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        MediaCodecs.decodeWavPcm16(q106Wav(md, id)) match {
          case Some(a) => ImageHash(id, contourOf(a))
          case None => ImageHash(id, -1L)
        }
      }
    }
  }

  /** q106: perceptual AUDIO near-dup — the WAV twin of [[imageNearDup]],
    * completing dedup across all three modalities (text chains, q105
    * images, q106 audio). Identical scale shape: 4×14-bit bands with
    * pigeonhole-guaranteed recall at Hamming ≤ 3, bucket join, exact
    * `bit_count(xor)` verify; the oracle recomputes fingerprints from the
    * generating formula and brute-forces all pairs (ground truth for
    * recall AND precision).
    */
  def audioNearDup(s: SparkSession, d: String): DataFrame =
    hammingNearDup(audioFingerprints(s, d).toDF())

  /** q125 asset stage, image side: ONE row-local pass per document —
    * synthesize the real PNG, digest its exact bytes (q87's identity,
    * computed in-JVM), decode it back, dHash the pixels. Emits a narrow
    * (doc_id, ok, digest, phash) row; the payload never leaves the task.
    */
  def imageAssets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    docIds(s, d).mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val png = q105Png(id)
        val digest = md.digest(png).map("%02x".format(_)).mkString
        MediaCodecs.decodePng(png) match {
          case Some(img) => MediaAsset(id, ok = true, digest, dhashOf(img))
          case None => MediaAsset(id, ok = false, digest, -1L)
        }
      }
    }
  }

  /** q125 asset stage, audio side — the WAV twin of [[imageAssets]]. */
  def audioAssets(s: SparkSession, d: String): Dataset[MediaAsset] = {
    import s.implicits._
    docIds(s, d).mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val wav = q106Wav(md, id)
        val digest = md.digest(wav).map("%02x".format(_)).mkString
        MediaCodecs.decodeWavPcm16(wav) match {
          case Some(a) => MediaAsset(id, ok = true, digest, contourOf(a))
          case None => MediaAsset(id, ok = false, digest, -1L)
        }
      }
    }
  }

  /** One modality's curation waterfall over a (doc_id, ok, digest, phash)
    * asset frame — the q125 stage logic, seam-exposed so specs can plant
    * corrupt payloads and byte-identical copies the sf fixture lacks.
    *
    * Stage ladder (each stage sees only the previous stage's survivors,
    * the q113 sequential-waterfall semantic applied to media):
    *   1. decode   — the container must decode (ok = false falls here);
    *   2. exact_dup — q87's digest keeper election (min doc_id per
    *      identical container byte string);
    *   3. near_dup — perceptual keeper election among EXACT keepers:
    *      the guarded [[hammingNearDup]] pair stage (Hamming ≤ 3 on the
    *      56-bit hash) feeds [[GraphOps.connectedComponents]], and the
    *      component's least doc_id is the kept representative (the q45
    *      min-id labeling IS the election);
    *   4. kept.
    * `kept_id` is the ULTIMATE keeper: an exact dup defers to its digest
    * keeper's perceptual representative (where its bytes actually went);
    * decode failures have no keeper (null).
    *
    * Scale shape: the asset pass is row-local; exact election is one
    * linear digest shuffle; the pair stage runs only over exact KEEPERS
    * (already deduplicated — the waterfall's delta discipline) through
    * the hot-bucket-guarded band join; CC is the large/small-star
    * O(log² n) path; final assembly is two keyed joins against the tiny
    * keeper/rep tables. Holds at 100 TB.
    */
  /** The LAZY half of [[kindWaterfall]]: the disposition frame plus the
    * persisted upstream handles (`a`, the CC labels) the caller must
    * release after materializing. mediaWaterfall composes TWO of these
    * under one union and pays ONE finish — the r12 shape materialized and
    * cached each kind's result separately, which at the sf0.1 scale was
    * ~4 extra job barriers of pure scheduling on cached sub-second data.
    */
  private def kindWaterfallLazy(assets: DataFrame): (DataFrame, Seq[DataFrame]) = {
    val a = assets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // NO eager fill (r17 adjudication): a count() here + on survivors
    // serialized the decode behind job barriers and measured ×1.06 on
    // q125 — the racing recomputes overlap on idle cores at sf0.1. The
    // r16 cache-ownership fix in hammingNearDup (kept) already stops the
    // cross-call unpersist that was the real q125 leak.
    val ok = a.filter(col("ok"))
    val ek = ok.groupBy("digest").agg(min("doc_id").as("exact_keeper"))
    val withK = ok.join(ek, "digest")
      .select(col("doc_id"), col("exact_keeper"), col("phash"))
    // keeper-sized; persisted because the pair stage and the label/rep
    // joins each reference it and every reference would otherwise re-run
    // the digest-election groupBy+join chain above it. hammingNearDup
    // sees the cache and leaves ownership HERE (r16 ADVICE medium): it
    // used to unpersist survivors after the pair materialize, so the
    // rep/assembly joins below recomputed the election chain.
    val survivors = withK.filter(col("doc_id") === col("exact_keeper"))
      .select(col("doc_id"), col("phash").as("dhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // hammingNearDup returns a PERSISTED pair frame (r16) — it joins the
    // release list below; CC consumes it exactly once
    val pairs = hammingNearDup(survivors)
    val comp = GraphOps.connectedComponents(
      pairs.select(col("ia").as("u"), col("ib").as("v")))
    val rep = survivors.select("doc_id")
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id").as("exact_keeper"),
        coalesce(col("cluster_id"), col("doc_id")).as("keeper_rep"))
    val res = a.select("doc_id", "ok")
      .join(withK.select("doc_id", "exact_keeper"), Seq("doc_id"), "left")
      .join(rep, Seq("exact_keeper"), "left")
      .select(col("doc_id"),
        when(!col("ok"), "decode")
          .when(col("doc_id") =!= col("exact_keeper"), "exact_dup")
          .when(col("doc_id") =!= col("keeper_rep"), "near_dup")
          .otherwise("kept").as("stage"),
        col("keeper_rep").as("kept_id"))
    // comp is the persisted frame connectedComponents hands its caller —
    // it goes on the release list too (r12 ADVICE: it leaked one
    // keeper-sized label table per invocation for the life of the session)
    (res, Seq(a, comp, survivors, pairs))
  }

  private[operators] def kindWaterfall(assets: DataFrame): DataFrame = {
    val (res, release) = kindWaterfallLazy(assets)
    DedupOps.finishAndRelease(res, release: _*)
  }

  /** q125: the MULTIMODAL curation waterfall — q113's composed-pipeline
    * discipline applied to the binary modalities: decode (q98/q99's real
    * codecs) → exact asset dedup (q87) → perceptual near-dup keeper
    * election (q105/q106's banded Hamming search + q45's CC labeling) →
    * q73-shape disposition, one row per (kind, doc). The DuckDB oracle is
    * fully formula-based (the q105 no-container discipline): exact-dup
    * groups are doc_id % 300 classes (both synthesized containers are
    * pure functions of doc_id % 100 and doc_id % 3), perceptual hashes
    * recompute from the generating formulas, and the perceptual closure
    * is the q45 recursive-CTE transitive closure — so the oracle
    * independently checks keeper election end to end without parsing a
    * single container byte.
    */
  /** q128: the FULL multimodal curation verdict — one row per corpus
    * document combining q113's text waterfall stage with q125's per-kind
    * media dispositions into the decision a training-data pipeline
    * actually acts on:
    *
    *   - `drop_text`  — the text failed its waterfall (gates/dedup/
    *     decontam/quality); the document contributes nothing, whatever
    *     its assets look like;
    *   - `text_only`  — text kept, but an asset failed DECODE (no
    *     perceptual identity, nothing to train multimodally on); exact/
    *     near-dup assets do NOT demote — they resolve to their keeper's
    *     representative via kept_id, which is the point of dedup;
    *   - `full`       — text kept and both assets resolve.
    *
    * This is deliberate COMPOSITION, not new machinery: both halves are
    * independently oracle-verified operators, and the verdict is three
    * CASE lines over their outputs — so the oracle nests the two proven
    * SQL texts as CTEs and adds the same three lines. Scale shape: the
    * two waterfalls (each scale-argued on its own) plus one doc-keyed
    * aggregation and one doc-keyed join.
    */
  def multimodalVerdict(s: SparkSession, d: String): DataFrame = {
    val text = TextOps.pipelineWaterfall(documents(s, d))
    val media = mediaWaterfall(s, d)
    val res = verdictAssembly(text.select(col("doc_id"), col("stage")), media)
    // text and media are the persisted caller-owned outputs of the two
    // waterfalls — release them after materializing the verdict
    DedupOps.finishAndRelease(res, text, media)
  }

  /** q128's verdict assembly over EXPLICIT (doc_id, stage) text rows and
    * q125-shaped media rows — ONE definition (r15) shared by the
    * recompute path above and the materialized-store serve path
    * ([[graft.streaming.CurationStore.multimodalVerdictServed]]), so the
    * three CASE lines can never drift between them.
    */
  private[graft] def verdictAssembly(text: DataFrame, media: DataFrame): DataFrame = {
    val byDoc = media.groupBy("doc_id").agg(
      max(when(col("kind") === "image", col("stage"))).as("image_stage"),
      max(when(col("kind") === "audio", col("stage"))).as("audio_stage"))
    text.select(col("doc_id"), col("stage").as("text_stage"))
      .join(byDoc, "doc_id")
      .select(col("doc_id"), col("text_stage"), col("image_stage"), col("audio_stage"),
        when(col("text_stage") =!= "kept", "drop_text")
          .when(col("image_stage") === "decode" || col("audio_stage") === "decode",
            "text_only")
          .otherwise("full").as("final_disposition"))
  }

  /** q134: CROSS-MODAL KEEPER CONSISTENCY — q113 elects text keepers and
    * q125 elects per-kind asset keepers, and nothing checked they agree: a
    * document whose text resolves to keeper A while its image resolves to
    * B's representative is a SPLIT IDENTITY — two operators assigned the
    * same training document to different canonical owners, the exact case
    * a curation pipeline must surface before dedup decisions (keep A's
    * text with B's image?) silently disagree. One row per (kind,
    * text_stage): how many docs carry both identities, how many agree
    * (text keeper == media keeper's representative), how many split.
    *
    * Composition, not new machinery (the q128 discipline): text stages
    * and keeper map are q113's own election ([[TextOps.textKeeperMap]],
    * one shared definition), media keepers are q125's `kept_id`; the
    * check is one doc-keyed join and a grouped count. Docs with either
    * identity missing (gate-failers have no text identity, decode
    * failures no media identity) carry nothing to compare and are
    * excluded — their absence is already q113/q125's report.
    *
    * Scale shape: the two proven waterfalls plus one doc-keyed join and a
    * ≤(2 kinds × 5 stages)-row aggregate.
    */
  def keeperConsistency(s: SparkSession, d: String): DataFrame =
    keeperConsistencyFrom(documents(s, d), mediaWaterfall(s, d))

  /** [[keeperConsistency]] over explicit documents + media-disposition
    * frames — the seam the spec plants a split-identity pair through.
    * `media` must carry q125's (kind, doc_id, stage, kept_id) shape; it is
    * released after the materialize (it is mediaWaterfall's persisted
    * output on the operator path).
    */
  private[operators] def keeperConsistencyFrom(docs: DataFrame,
      media: DataFrame): DataFrame = {
    val text = TextOps.pipelineWaterfall(docs)
    val tk = TextOps.textKeeperMap(docs)
    val res = consistencyAssembly(
      text.select(col("doc_id"), col("stage")), tk, media)
    // text, media AND the keeper map are persisted upstream outputs —
    // all released after the one materialization
    DedupOps.finishAndRelease(res, text, media, tk)
  }

  /** q134's consistency assembly over EXPLICIT (doc_id, stage) text rows,
    * a (doc_id, keep_id) text-keeper map, and q125-shaped media rows —
    * ONE definition (r15) shared by the recompute path above and the
    * materialized-store serve path
    * ([[graft.streaming.CurationStore.keeperConsistencyServed]]).
    */
  private[graft] def consistencyAssembly(text: DataFrame, tk: DataFrame,
      media: DataFrame): DataFrame =
    text.select(col("doc_id"), col("stage").as("text_stage"))
      .join(tk, "doc_id")
      .join(media.filter(col("kept_id").isNotNull), "doc_id")
      .groupBy("kind", "text_stage")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("keep_id") === col("kept_id")).cast("long")).as("n_agree"),
        sum((col("keep_id") =!= col("kept_id")).cast("long")).as("n_split"))
      .orderBy("kind", "text_stage")

  def mediaWaterfall(s: SparkSession, d: String): DataFrame = {
    // ONE finish for both kinds: the returned UNION is the persisted frame
    // (so the caller's unpersist() hits the actual cached plan — r12
    // ADVICE; CacheReleaseSpec pins it) and every per-kind upstream cache
    // is released after the single materialization. No final orderBy: the
    // driver's comparator is row-sorted and a global sort would cost a
    // range-sampling pass — the r12 verdict already marked it the first
    // thing to drop at scale.
    val (img, relImg) = kindWaterfallLazy(imageAssets(s, d).toDF())
    val (aud, relAud) = kindWaterfallLazy(audioAssets(s, d).toDF())
    val res = img.withColumn("kind", lit("image"))
      .unionByName(aud.withColumn("kind", lit("audio")))
      .select("kind", "doc_id", "stage", "kept_id")
    DedupOps.finishAndRelease(res, relImg ++ relAud: _*)
  }

  /** Shared band-bucket Hamming search over a (doc_id, dhash) frame —
    * q105/q106's pair stage.
    *
    * Scale shape (r12/r13): the (band, v) bucket self-join goes through
    * [[PairBuckets.candidatePairs]] — the size-adaptive 1-Bucket-Theta
    * split shared with q44/q62's RP-LSH candidates. A perceptual-hash
    * corpus degenerates exactly the way a sign-hash one does: solid-color
    * or template thumbnails all dHash to ONE value, silence-padded audio
    * to ONE contour — then all 4 bands collide and one bucket holds n
    * docs → n(n−1)/2 pairs that, in a plain equi-join, are ONE task
    * however many partitions exist. Buckets past the hot bar pay the
    * block split (B(B+1)/2 quadratically smaller chunks, AQE-exempt
    * explicit repartition); everything else takes the plain equi-join
    * with no replication tax. The candidate set is bit-identical to the
    * plain join's (PairPlanSpec pins equality on a mixed corpus AND the
    * 10k one-hash degenerate corpus).
    */
  /** THE 4×14-bit banding of the 56-bit perceptual hash: band b's value
    * is `shiftright(dhash, b*14) & 16383`. ONE formula feeds the batch
    * pair stage's (band, v) join keys AND the streaming gate's string
    * band keys (the minhashBandArrayExpr discipline): the gate's
    * "dropped ⟺ batch candidate vs history" contract is only sound while
    * both sides band identically, so there is exactly one definition.
    */
  private[graft] def hammingBandStructsExpr(dhashCol: String): String =
    s"""transform(sequence(0, 3),
          b -> struct(b AS band, shiftright($dhashCol, b * 14) & 16383 AS v))"""

  /** The same bands rendered as STRING keys "band:value" with the band
    * index folded in — the probe/build rendering for the streaming
    * perceptual gate's Bloom filter (string keys, the winnowFpValues
    * type lesson: a filter built over a bigint column hashes via putLong
    * and NEVER matches a UTF-8 probe).
    */
  private[graft] def hammingBandArrayExpr(dhashCol: String): String =
    s"""transform(${hammingBandStructsExpr(dhashCol)},
          s -> concat(cast(s.band AS STRING), ':', cast(s.v AS STRING)))"""

  /** (doc_id, band) — each asset's four perceptual band keys, the build
    * side of the streaming perceptual gate's historical filter: construct
    * with `hammingBandValues(corpus).stat.bloomFilter("band", n, fpp)`.
    * Decode failures (dhash = −1) contribute nothing — a failed decode
    * carries no perceptual information and must not make every OTHER
    * failed decode a "near-dup".
    */
  def hammingBandValues(hashes: DataFrame): DataFrame =
    hashes.filter(col("dhash") =!= -1L)
      .select(col("doc_id"), explode(expr(hammingBandArrayExpr("dhash"))).as("band"))

  private[graft] def hammingNearDup(hashes: DataFrame): DataFrame = {
    // the 8-byte dhash rides THROUGH the pair stage (PairBuckets carry):
    // the exact Hamming verify is then row-local — no ia/ib join-backs.
    // The hash frame is persisted + eagerly materialized (r16): the plan
    // references it on BOTH sides of the bucket self-join, and under AQE
    // the static ReuseExchange rule does not fire (measured: q105's
    // executed plan carried the full per-row codec-decode lineage TWICE —
    // two ~15-20 s-summed stages for one ~3 s decode's worth of work;
    // with AQE off the same plan shows ReusedExchange). The cache is
    // corpus-linear (doc_id + 64-bit hash) and released after the pair
    // frame materializes — UNLESS the caller already persisted it
    // (kindWaterfallLazy's survivors, PairProbe): persist on an
    // already-cached plan is a no-op, but the release here would drop the
    // CALLER's cache out from under its later joins (r16 ADVICE medium —
    // q125's rep/assembly joins recomputed the digest-election chain).
    // Cache ownership is taken only when the input arrives uncached.
    val preCached =
      hashes.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val h =
      if (preCached) hashes
      else {
        val p = hashes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
      }
    val sigs = h.select(col("doc_id"), col("dhash"),
        explode(expr(hammingBandStructsExpr("dhash"))).as("s"))
      .select(col("doc_id"), col("dhash"), col("s.band").as("band"), col("s.v").as("v"))
    val res = PairBuckets.candidatePairs(sigs, Seq("band", "v"), "doc_id", carry = Seq("dhash"))
      .withColumn("hamming", expr("cast(bit_count(dhash_a ^ dhash_b) as bigint)"))
      .filter(col("hamming") <= 3)
      .select("ia", "ib", "hamming")
    if (preCached) DedupOps.finishAndRelease(res)
    else DedupOps.finishAndRelease(res, h)
  }

  /** q107: uniform frame sampling over the video assets — the
    * frame-sample stage of a multimodal pipeline (training on video means
    * training on k representative frames, not every frame). The pipeline
    * is real end to end: synthesize the container, parse its header
    * through the SAME typed dispatch real PNG/JPEG/WAV take
    * ([[decodeHeader]]), then emit k uniformly spaced frame indices
    * ⌊j·n_frames/k⌋ per video (the per-frame pixel decode would slot into
    * the same row-local map — video codecs are out of container, which is
    * exactly what the GRFT stand-in documents). Row-local, output k rows
    * per video, zero shuffle.
    */
  def frameSample(s: SparkSession, d: String, k: Int = 4): DataFrame = {
    import s.implicits._
    val media = syntheticMedia(s, d).as[MediaRow]
    decodeHeader(media).toDF()
      .filter(col("kind") === "video" && col("n_frames") >= 1)
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"))
      .select(col("doc_id"), col("n_frames"), explode(expr(
        s"""transform(sequence(0, ${k - 1}),
              j -> struct(CAST(j AS BIGINT) AS sample_no,
                          CAST(j * n_frames div $k AS BIGINT) AS frame_idx))"""))
        .as("f"))
      .select(col("doc_id"), col("f.sample_no").as("sample_no"),
        col("f.frame_idx").as("frame_idx"), col("n_frames"))
  }

  /** The deployment-facing decode stage: magic-sniff every payload and run
    * the REAL codec — PNG/JPEG through [[MediaCodecs.decodeImage]], WAV
    * through [[MediaCodecs.decodeWavPcm16]] — emitting one typed feature
    * row per document. `media_type` records what the bytes actually were
    * (vs the claimed `kind`); unknown magics and corrupt payloads become
    * `quarantine` rows with -1 features, never a throw. For images
    * n_samples = pixels and sum_value = channel-summed intensity; for
    * audio n_samples = PCM samples and sum_value = Σ|sample|. Row-local
    * mapPartitions, zero shuffle, payload bytes never leave the task.
    */
  def mediaFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val b = r.media
      val isPng = b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte
      val isJpeg = b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8
      val isWav = b.length >= 12 && b(0) == 'R'.toByte && b(1) == 'I'.toByte &&
        b(8) == 'W'.toByte && b(9) == 'A'.toByte
      if (isPng || isJpeg) {
        MediaCodecs.decodeImage(b) match {
          case Some(img) =>
            var sum = 0L
            img.pixels.foreach(p => sum += (p & 0xff))
            MediaFeatures(r.doc_id, r.kind, if (isPng) "png" else "jpeg",
              img.width, img.height, img.channels,
              img.width.toLong * img.height, sum)
          case None =>
            MediaFeatures(r.doc_id, r.kind, "quarantine", -1, -1, -1, -1, -1)
        }
      } else if (isWav) {
        MediaCodecs.decodeWavPcm16(b) match {
          case Some(a) =>
            var sum = 0L
            a.samples.foreach(s => sum += math.abs(s.toLong))
            MediaFeatures(r.doc_id, r.kind, "wav",
              a.sampleRate, a.channels, a.channels, a.samples.length, sum)
          case None =>
            MediaFeatures(r.doc_id, r.kind, "quarantine", -1, -1, -1, -1, -1)
        }
      } else MediaFeatures(r.doc_id, r.kind, "quarantine", -1, -1, -1, -1, -1)
    })
  }

  /** Frame sampling: slice the payload into `n` evenly spaced binary chunks
    * (pure column expressions — substr on BINARY is codegen'd).
    */
  def sampleFrames(df: DataFrame, n: Int, frameBytes: Int = 64): DataFrame = {
    val frames = (0 until n).map { i =>
      expr(s"substring(media, 13 + int((octet_length(media) - 12) * $i / $n), $frameBytes)")
        .as(s"frame_$i")
    }
    df.select(col("doc_id") +: frames: _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary plumbing end-to-end: synthesize payload → header-decode
    // (the same dispatch that parses real PNG/JPEG/WAV headers —
    // MultimodalOpsSpec drives those; the fixture payloads route through
    // the GRFT branch) → aggregate by kind. Oracle checks byte-lengths
    // against the raw text.
    "q42_multimodal_stub" -> ((s, d) => {
      import s.implicits._
      val media = syntheticMedia(s, d).as[MediaRow]
      val meta = decodeHeader(media)
      meta.groupBy("kind")
        .agg(
          count(lit(1)).as("n"),
          sum(col("n_bytes").cast("long")).as("total_bytes"),
          min(col("n_bytes").cast("long")).as("min_bytes"))
        .orderBy("kind")
    }),

    // Exact asset dedup over the BINARY payload — the md5-digest dedup
    // every multimodal corpus runs first (LAION-style URL/content dedup):
    // digest the raw bytes, group, keep the lowest doc_id. The digest is
    // md5 over the payload's hex rendering so the oracle can reproduce it
    // byte-exactly without BLOB md5 support (hex(a||b) = hex(a)||hex(b),
    // so the oracle concatenates hex pieces instead of slicing blobs).
    // Scale shape: one row-local digest projection + one combiner-friendly
    // groupBy on the digest — linear shuffle of (digest, id, bytes)
    // triples, never payload bytes (the digest column is 32 chars however
    // big the asset is; the binary column itself stays in the scan stage).
    // Output is one row per distinct payload with its duplicate count,
    // keeper, and byte size; `is_dup` marks groups a cleanup pass would
    // collapse (the sf0.01 fixture has no exact-duplicate texts, so the
    // oracle pins the all-singleton pass; duplicate payloads appear at
    // sf0.1 and in MultimodalOpsSpec's planted-duplicate corpus).
    "q87_asset_dedup" -> ((s, d) => assetDedup(syntheticMedia(s, d))),

    // REAL image payload decode (r11): synthesized-per-doc PNG bytes →
    // full CRC+inflate+unfilter decode → integer pixel-sum features. The
    // oracle derives the sums from the pixel formula alone — it never
    // parses a PNG, so agreement proves the whole container round trip.
    "q98_image_decode" -> ((s, d) => imageDecodeFeatures(s, d)),

    // REAL audio payload decode (r11): the PCM16 WAV twin.
    "q99_audio_decode" -> ((s, d) => audioDecodeFeatures(s, d)),

    // Perceptual image near-dup (see [[imageNearDup]]): dHash over real
    // PNG decode, 4-band Hamming search, exact bit_count verify.
    "q105_image_neardup" -> ((s, d) => imageNearDup(s, d)),

    // Perceptual audio near-dup (see [[audioNearDup]]): energy-contour
    // fingerprint over real WAV decode, same banded search.
    "q106_audio_neardup" -> ((s, d) => audioNearDup(s, d)),

    // Uniform frame sampling (see [[frameSample]]): k=4 indices per
    // video through the real header-dispatch path; the oracle recomputes
    // n_frames from the GRFT header's source bytes (text chars 5-6,
    // big-endian u16) without parsing a container.
    "q107_frame_sample" -> ((s, d) => frameSample(s, d)),

    // The multimodal curation waterfall (see [[mediaWaterfall]]): decode
    // → exact asset dedup → perceptual keeper election → disposition,
    // per kind, end to end over the real codecs.
    "q125_media_waterfall" -> ((s, d) => mediaWaterfall(s, d)),

    // The FULL multimodal curation verdict, SERVED from the materialized
    // curation store (r15, the r14 verdict's #3): the waterfalls run once
    // per (JVM, corpus) into the store ([[ensureCurationStore]], the
    // q122/q126 fixture amortization); the verdict reads the saved stage
    // tables through [[graft.streaming.CurationStore
    // .multimodalVerdictServed]] — the SAME [[verdictAssembly]] the
    // recompute path ([[multimodalVerdict]], the from-scratch builder)
    // calls, under the UNCHANGED oracle text, so served rows are pinned
    // byte-identical to recomputed ones by the hash gate itself.
    "q128_multimodal_verdict" -> ((s, d) =>
      graft.streaming.CurationStore.multimodalVerdictServed(
        s, ensureCurationStore(s, d))),

    // Cross-modal keeper consistency, served from the same store — see
    // [[keeperConsistency]] (the recompute builder) and
    // [[graft.streaming.CurationStore.keeperConsistencyServed]].
    "q134_keeper_consistency" -> ((s, d) =>
      graft.streaming.CurationStore.keeperConsistencyServed(
        s, ensureCurationStore(s, d)))
  )

  /** q128/q134's fixture store: materialized ONCE per (JVM, corpus
    * content) from the batch waterfalls — the build-once amortization the
    * q122/q126 index fixtures use, keyed on the corpus content token (the
    * q143 memo discipline), removed by a shutdown hook.
    */
  private val curationDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ensureCurationStore(s: SparkSession, d: String): String =
    curationDirs.computeIfAbsent(s"$d@${DedupOps.corpusToken(s, d)}", _ => {
      val p = java.nio.file.Files.createTempDirectory("graft_curation")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        try Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
        catch { case _: Exception => () }
      }))
      graft.streaming.CurationStore.materialize(s, d, p.toString)
      p.toString
    })

  /** q87's operator body, reusable over any (doc_id, media BINARY) frame —
    * see the q87 entry comment for the digest construction and scale
    * shape. MultimodalOpsSpec drives planted duplicate payloads through
    * this body (the sf fixtures are duplicate-free at the oracle's scale).
    */
  def assetDedup(media: DataFrame): DataFrame =
    media
      .select(
        col("doc_id"),
        md5(hex(col("media"))).as("digest"),
        expr("octet_length(media)").cast("long").as("n_bytes"))
      .groupBy("digest")
      .agg(
        count(lit(1)).as("n_copies"),
        min("doc_id").as("keep_id"),
        min("n_bytes").as("n_bytes"))
      .withColumn("is_dup", (col("n_copies") > 1).cast("long"))

  val oracle: Map[String, String] = Map(
    "q42_multimodal_stub" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
           count(*) AS n,
           CAST(sum(least(octet_length(encode(text)), 8) + octet_length(encode(text)) + 4) AS BIGINT) AS total_bytes,
           CAST(min(least(octet_length(encode(text)), 8) + octet_length(encode(text)) + 4) AS BIGINT) AS min_bytes
         FROM documents GROUP BY kind ORDER BY kind""",

    "q87_asset_dedup" ->
      """WITH payload AS (
           SELECT doc_id,
             md5('47524654' || substr(hex(encode(text)), 1, 16)
                 || hex(encode(text))) AS digest,
             CAST(4 + least(octet_length(encode(text)), 8)
                  + octet_length(encode(text)) AS BIGINT) AS n_bytes
           FROM documents)
         SELECT digest, count(*) AS n_copies, min(doc_id) AS keep_id,
                min(n_bytes) AS n_bytes,
                CASE WHEN count(*) > 1 THEN 1 ELSE 0 END :: BIGINT AS is_dup
         FROM payload GROUP BY digest""",

    "q98_image_decode" ->
      """WITH dims AS (
           SELECT doc_id, 1 + doc_id % 16 AS w, 1 + doc_id % 12 AS h
           FROM documents),
         px AS (
           SELECT d.doc_id, d.w, d.h,
                  ((d.doc_id * 31 + x.i * 7 + y.j * 13) % 256) AS v
           FROM dims d, generate_series(0, 15) AS x(i), generate_series(0, 11) AS y(j)
           WHERE x.i < d.w AND y.j < d.h)
         SELECT doc_id,
                CAST(max(w) AS BIGINT) AS width,
                CAST(max(h) AS BIGINT) AS height,
                CAST(1 AS BIGINT) AS channels,
                CAST(max(w) * max(h) AS BIGINT) AS n_pixels,
                CAST(sum(v) AS BIGINT) AS sum_luma
         FROM px GROUP BY doc_id""",

    "q99_audio_decode" ->
      """WITH dims AS (
           SELECT doc_id, 8000 + (doc_id % 8) * 1000 AS rate,
                  64 + doc_id % 64 AS n
           FROM documents),
         sm AS (
           SELECT d.doc_id, d.rate, d.n,
                  abs(((d.doc_id * 7 + s.i * 11) % 4096) - 2048) AS a
           FROM dims d, generate_series(0, 127) AS s(i)
           WHERE s.i < d.n)
         SELECT doc_id,
                CAST(max(rate) AS BIGINT) AS sample_rate,
                CAST(1 AS BIGINT) AS channels,
                CAST(max(n) AS BIGINT) AS n_frames,
                CAST(sum(a) AS BIGINT) AS sum_abs,
                CAST(max(a) AS BIGINT) AS peak
         FROM sm GROUP BY doc_id""",

    // dHash recomputed from the q105 generating formula (no container —
    // the q98 discipline), then BRUTE-FORCE all pairs: the oracle is
    // ground truth for recall as well as precision, so a banding bug
    // that silently dropped a true near-dup pair hash-mismatches
    "q105_image_neardup" ->
      s"""WITH gx AS (
            SELECT y, unnest(generate_series(0, 7)) AS x
            FROM (SELECT unnest(generate_series(0, 6)) AS y)),
          bits AS (
            SELECT d.doc_id, g.y, g.x,
              CASE WHEN ${q105PxSql("g.x + 1")} > ${q105PxSql("g.x")}
                   THEN (1::BIGINT << (g.y * 8 + g.x)) ELSE 0::BIGINT END AS bit
            FROM documents d CROSS JOIN gx g),
          h AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS dhash
                FROM bits GROUP BY doc_id)
          SELECT a.doc_id AS ia, b.doc_id AS ib,
                 CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
          FROM h a JOIN h b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""",

    // the WAV twin: energy-contour fingerprint recomputed from the q106
    // formula (samples → per-window |sample| sums → difference signs),
    // then brute-force all pairs — same ground-truth-for-recall posture
    "q106_audio_neardup" ->
      """WITH idx AS (SELECT unnest(generate_series(0, 455)) AS i),
          sm AS (
            SELECT d.doc_id, t.i,
              (CASE WHEN t.i // 8 = (d.doc_id % 100) % 57
                    THEN (1 + d.doc_id % 3) ELSE 1 END)
              * ((CAST('0x' || substr(md5((d.doc_id % 100) || ':' || t.i), 1, 4)
                    AS INT) % 4096) - 2048) AS s
            FROM documents d CROSS JOIN idx t),
          en AS (SELECT doc_id, i // 8 AS w, CAST(sum(abs(s)) AS BIGINT) AS e
                 FROM sm GROUP BY doc_id, i // 8),
          bits AS (SELECT a.doc_id,
                    CASE WHEN b.e > a.e
                         THEN (1::BIGINT << CAST(a.w AS INT))
                         ELSE 0::BIGINT END AS bit
                   FROM en a JOIN en b
                     ON a.doc_id = b.doc_id AND b.w = a.w + 1
                   WHERE a.w < 56),
          h AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS fp
                FROM bits GROUP BY doc_id)
          SELECT a.doc_id AS ia, b.doc_id AS ib,
                 CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
          FROM h a JOIN h b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.fp, b.fp)) <= 3""",

    // n_frames is the GRFT header's big-endian u16 at payload bytes 8-9,
    // which syntheticMedia fills from text bytes 5-6 (ASCII corpus:
    // bytes == chars)
    "q107_frame_sample" ->
      """WITH v AS (
            SELECT doc_id,
                   CAST(ord(substr(text, 5, 1)) * 256
                        + ord(substr(text, 6, 1)) AS BIGINT) AS n_frames
            FROM documents WHERE doc_id % 3 = 2),
          js AS (SELECT unnest(generate_series(0, 3)) AS j)
          SELECT doc_id, CAST(j AS BIGINT) AS sample_no,
                 CAST((j * n_frames) // 4 AS BIGINT) AS frame_idx, n_frames
          FROM v CROSS JOIN js
          WHERE n_frames >= 1""",

    // q125: fully formula-based (no container bytes): both synthesized
    // payloads are pure functions of (doc_id % 100, doc_id % 3), so
    // exact-dup groups are doc_id % 300 classes; perceptual hashes
    // recompute from the q105/q106 formulas; the keeper election is the
    // q45 recursive-CTE transitive closure over Hamming<=3 pairs among
    // exact keepers, least member kept. Every container decodes (q98/q99
    // pin that), so the decode stage drops nothing here — specs plant
    // corrupt payloads through the kindWaterfall seam.
    "q125_media_waterfall" -> q125Sql,

    // q128: the FULL multimodal curation verdict — q113's text waterfall
    // and q125's media waterfall composed into one per-document decision.
    // Both sub-oracles nest verbatim as CTEs (each is self-contained,
    // q125 carrying its own WITH RECURSIVE closure); the verdict logic on
    // top is three CASE lines. Rows cover q113's corpus (doc_id >= 10 —
    // the eval probes are not training documents).
    "q128_multimodal_verdict" ->
      s"""WITH tw AS (${graft.operators.TextOps.oracle("q113_pipeline_waterfall")}),
          mw AS ($q125Sql)
          SELECT t.doc_id, t.stage AS text_stage,
            max(CASE WHEN m.kind = 'image' THEN m.stage END) AS image_stage,
            max(CASE WHEN m.kind = 'audio' THEN m.stage END) AS audio_stage,
            CASE WHEN t.stage <> 'kept' THEN 'drop_text'
                 WHEN max(CASE WHEN m.kind = 'image' THEN m.stage END) = 'decode'
                   OR max(CASE WHEN m.kind = 'audio' THEN m.stage END) = 'decode'
                 THEN 'text_only'
                 ELSE 'full' END AS final_disposition
          FROM tw t JOIN mw m USING (doc_id)
          GROUP BY t.doc_id, t.stage""",

    // q134: both keeper maps nest verbatim — q113's full oracle for the
    // text stages, the factored keeper-map SQL (the same gate/fingerprint
    // fragments q113's text builds from), and q125's formula-based media
    // oracle — so the consistency counts are independently derived end to
    // end from the two proven elections.
    "q134_keeper_consistency" ->
      s"""WITH tw AS (${graft.operators.TextOps.oracle("q113_pipeline_waterfall")}),
          km AS (${graft.operators.TextOps.textKeeperMapSql}),
          mw AS ($q125Sql)
          SELECT m.kind, t.stage AS text_stage,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(CASE WHEN k.keep_id = m.kept_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_agree,
            CAST(sum(CASE WHEN k.keep_id <> m.kept_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_split
          FROM tw t JOIN km k USING (doc_id) JOIN mw m USING (doc_id)
          WHERE m.kept_id IS NOT NULL
          GROUP BY m.kind, t.stage
          ORDER BY m.kind, t.stage"""
  )

  /** q125's full oracle text, factored so q128 can nest it as a CTE. */
  private def q125Sql: String =
      s"""WITH RECURSIVE
          gx AS (
            SELECT y, unnest(generate_series(0, 7)) AS x
            FROM (SELECT unnest(generate_series(0, 6)) AS y)),
          ibits AS (
            SELECT d.doc_id, g.y, g.x,
              CASE WHEN ${q105PxSql("g.x + 1")} > ${q105PxSql("g.x")}
                   THEN (1::BIGINT << (g.y * 8 + g.x)) ELSE 0::BIGINT END AS bit
            FROM documents d CROSS JOIN gx g),
          ih AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS ph
                 FROM ibits GROUP BY doc_id),
          idx AS (SELECT unnest(generate_series(0, 455)) AS i),
          sm AS (
            SELECT d.doc_id, t.i,
              (CASE WHEN t.i // 8 = (d.doc_id % 100) % 57
                    THEN (1 + d.doc_id % 3) ELSE 1 END)
              * ((CAST('0x' || substr(md5((d.doc_id % 100) || ':' || t.i), 1, 4)
                    AS INT) % 4096) - 2048) AS s
            FROM documents d CROSS JOIN idx t),
          en AS (SELECT doc_id, i // 8 AS w, CAST(sum(abs(s)) AS BIGINT) AS e
                 FROM sm GROUP BY doc_id, i // 8),
          abits AS (SELECT a.doc_id,
                     CASE WHEN b.e > a.e
                          THEN (1::BIGINT << CAST(a.w AS INT))
                          ELSE 0::BIGINT END AS bit
                    FROM en a JOIN en b
                      ON a.doc_id = b.doc_id AND b.w = a.w + 1
                    WHERE a.w < 56),
          ah AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS ph
                 FROM abits GROUP BY doc_id),
          grp AS (SELECT doc_id, doc_id % 300 AS res FROM documents),
          ek AS (SELECT res, min(doc_id) AS k FROM grp GROUP BY res),
          isurv AS (SELECT e.k AS doc_id, h.ph FROM ek e JOIN ih h ON h.doc_id = e.k),
          icand AS (SELECT a.doc_id AS ia, b.doc_id AS ib
                    FROM isurv a JOIN isurv b ON a.doc_id < b.doc_id
                    WHERE bit_count(xor(a.ph, b.ph)) <= 3),
          iedges AS (SELECT ia AS a, ib AS b FROM icand
                     UNION SELECT ib, ia FROM icand),
          ireach(a, b) AS (
            SELECT a, b FROM iedges
            UNION
            SELECT r.a, e.b FROM ireach r JOIN iedges e ON r.b = e.a),
          icomp AS (SELECT a, least(a, min(b)) AS cid FROM ireach GROUP BY a),
          irep AS (SELECT s.doc_id, coalesce(c.cid, s.doc_id) AS rep
                   FROM isurv s LEFT JOIN icomp c ON c.a = s.doc_id),
          asurv AS (SELECT e.k AS doc_id, h.ph FROM ek e JOIN ah h ON h.doc_id = e.k),
          acand AS (SELECT a.doc_id AS ia, b.doc_id AS ib
                    FROM asurv a JOIN asurv b ON a.doc_id < b.doc_id
                    WHERE bit_count(xor(a.ph, b.ph)) <= 3),
          aedges AS (SELECT ia AS a, ib AS b FROM acand
                     UNION SELECT ib, ia FROM acand),
          areach(a, b) AS (
            SELECT a, b FROM aedges
            UNION
            SELECT r.a, e.b FROM areach r JOIN aedges e ON r.b = e.a),
          acomp AS (SELECT a, least(a, min(b)) AS cid FROM areach GROUP BY a),
          arep AS (SELECT s.doc_id, coalesce(c.cid, s.doc_id) AS rep
                   FROM asurv s LEFT JOIN acomp c ON c.a = s.doc_id)
          SELECT * FROM (
            SELECT 'image' AS kind, g.doc_id,
              CASE WHEN g.doc_id != e.k THEN 'exact_dup'
                   WHEN g.doc_id != r.rep THEN 'near_dup'
                   ELSE 'kept' END AS stage,
              CAST(r.rep AS BIGINT) AS kept_id
            FROM grp g JOIN ek e USING (res) JOIN irep r ON r.doc_id = e.k
            UNION ALL
            SELECT 'audio' AS kind, g.doc_id,
              CASE WHEN g.doc_id != e.k THEN 'exact_dup'
                   WHEN g.doc_id != r.rep THEN 'near_dup'
                   ELSE 'kept' END AS stage,
              CAST(r.rep AS BIGINT) AS kept_id
            FROM grp g JOIN ek e USING (res) JOIN arep r ON r.doc_id = e.k)
          ORDER BY kind, doc_id"""

  /** The q105 pixel formula as a DuckDB fragment over (d.doc_id, g.y) and
    * the given x expression — the SQL rendering of [[q105Pixel]].
    */
  private def q105PxSql(xExpr: String): String =
    s"""((CAST('0x' || substr(md5((d.doc_id % 100) || ':' || ($xExpr) || ':'
           || g.y), 1, 2) AS INT)
         + CASE WHEN ($xExpr) = 1 + ((d.doc_id % 100) % 7)
                 AND g.y = ((d.doc_id % 100) % 7)
                THEN CAST((d.doc_id % 3) * 96 AS INT) ELSE 0 END) % 256)"""
}
