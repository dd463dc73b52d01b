package graft.operators

import graft.SparkSpec

/** Real container-header bytes through the deployed decode path: PNG /
  * JPEG / WAV headers are hand-assembled from their public layouts (ISO/
  * IEC 15948, ITU-T T.81, RIFF) — no image libraries involved, which is
  * the point: the header fields ARE spec-defined byte offsets.
  */
class MultimodalOpsSpec extends SparkSpec {

  import MultimodalOps._

  private def png(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(37) // sig + IHDR chunk + CRC
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h)
    bb.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.putInt(0) // CRC (unchecked by the header parse)
    bb.array()
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + 18 + 19 + 2)
    bb.put(Array(0xff, 0xd8).map(_.toByte)) // SOI
    // APP0/JFIF segment (the SOF walk must skip it by its length field)
    bb.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16.toShort)
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .put(Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0))
    // SOF0: len 17, precision 8, height, width, 3 components
    bb.put(Array(0xff, 0xc0).map(_.toByte)).putShort(17.toShort).put(8.toByte)
      .putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      .put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    bb.put(Array(0xff, 0xd9).map(_.toByte)) // EOI
    bb.array()
  }

  private def wav(rate: Int, channels: Int, dataBytes: Int,
      blockAlign: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(16.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    bb.array()
  }

  test("PNG IHDR: width/height from the spec'd big-endian offsets") {
    val m = MultimodalOps.parseHeader(1L, "image", png(640, 480))
    assert((m.width, m.height, m.n_frames) === ((640, 480, 1)))
    assert(m.n_bytes === png(640, 480).length)
    // 1×1 edge and a large dimension exercise full u32 decoding
    val tiny = MultimodalOps.parseHeader(2L, "image", png(1, 1))
    assert((tiny.width, tiny.height) === ((1, 1)))
    val wide = MultimodalOps.parseHeader(3L, "image", png(70000, 2))
    assert((wide.width, wide.height) === ((70000, 2)))
  }

  test("JPEG: marker walk skips APP segments and reads SOF0 height-then-width") {
    val m = MultimodalOps.parseHeader(1L, "image", jpeg(1920, 1080))
    assert((m.width, m.height, m.n_frames) === ((1920, 1080, 1)))
    // a JPEG with no SOF (SOI + APP0 + EOI) quarantines instead of throwing
    val noSof = jpeg(8, 8).take(20) ++ Array(0xff, 0xd9).map(_.toByte)
    val q = MultimodalOps.parseHeader(2L, "image", noSof)
    assert((q.width, q.height, q.n_frames) === ((-1, -1, -1)))
  }

  test("WAV: fmt chunk fields and PCM frame count from the data chunk") {
    val m = MultimodalOps.parseHeader(1L, "audio", wav(44100, 2, 400, 4))
    assert(m.width === 44100, "sample rate")
    assert(m.height === 2, "channels")
    assert(m.n_frames === 100, "PCM frames = data size / block align")
  }

  test("JPEG: 0xFF fill bytes before a marker are spec-legal and skipped") {
    // T.81 §B.1.1.2: any number of FF fill bytes may precede a marker.
    // Plant two fills before SOF0 — the walk must still find it, not
    // misread the marker byte as a length and quarantine a valid image.
    val base = jpeg(1920, 1080)
    val sofAt = base.indexOfSlice(Array(0xff, 0xc0).map(_.toByte))
    val filled = base.take(sofAt) ++ Array(0xff, 0xff).map(_.toByte) ++ base.drop(sofAt)
    val m = MultimodalOps.parseHeader(1L, "image", filled)
    assert((m.width, m.height) === ((1920, 1080)))
    // all-FF tail (fill bytes to EOF) terminates and quarantines
    val fftail = Array(0xff, 0xd8).map(_.toByte) ++ Array.fill(64)(0xff.toByte)
    val q = MultimodalOps.parseHeader(2L, "image", fftail)
    assert((q.width, q.height, q.n_frames) === ((-1, -1, -1)))
  }

  test("WAV: hostile unsigned chunk sizes terminate and quarantine, never hang") {
    // size 0xFFFFFFF8 is -8 as a signed Int: the unfixed walk advanced by
    // 0 forever (one corrupt blob = one hung executor task)
    def hostile(size: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(16)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("junk".getBytes("US-ASCII")).putInt(size)
      bb.put(Array[Byte](0, 0, 0, 0))
      bb.array()
    }
    for (size <- Seq(0xfffffff8, 0x80000010, 0x7fffffff)) {
      val m = MultimodalOps.parseHeader(7L, "audio", hostile(size))
      assert((m.width, m.height, m.n_frames) === ((-1, -1, -1)),
        f"size 0x$size%08x must quarantine")
    }
    // a hostile chunk BEFORE a valid fmt must not mask later throws either:
    // the walk simply stops at the unwalkable chunk and quarantines
    val m = MultimodalOps.parseHeader(8L, "audio", hostile(0xfffffff8))
    assert(m.n_bytes === 24)
  }

  test("unknown magics and truncated blobs quarantine as (-1,-1,-1), never throw") {
    for (b <- Seq(Array[Byte](), Array[Byte](1, 2, 3),
        "RIFFxxxxJUNK".getBytes("US-ASCII"),
        Array(0xff, 0xd8).map(_.toByte), // bare SOI
        png(4, 4).take(20))) { // PNG signature but truncated IHDR
      val m = MultimodalOps.parseHeader(9L, "x", b)
      assert((m.width, m.height, m.n_frames) === ((-1, -1, -1)), b.mkString(","))
      assert(m.n_bytes === b.length)
    }
  }

  test("decodeHeader routes real and synthetic containers through one Dataset pass") {
    val sp = spark
    import sp.implicits._
    val grft = ("GRFT".getBytes("US-ASCII") :+ 0.toByte :+ 12.toByte :+
      0.toByte :+ 8.toByte :+ 0.toByte :+ 3.toByte) ++ Array[Byte](0, 0, 0, 0)
    val rows = Seq(
      MediaRow(1L, png(320, 240), "image"),
      MediaRow(2L, jpeg(64, 32), "image"),
      MediaRow(3L, wav(16000, 1, 64, 2), "audio"),
      MediaRow(4L, grft, "video"),
      MediaRow(5L, Array[Byte](1, 2), "junk"))
    val out = MultimodalOps.decodeHeader(rows.toDS())
      .collect().map(m => m.doc_id -> ((m.width, m.height, m.n_frames))).toMap
    assert(out(1L) === ((320, 240, 1)))
    assert(out(2L) === ((64, 32, 1)))
    assert(out(3L) === ((16000, 1, 32)))
    assert(out(4L) === ((12, 8, 3)))
    assert(out(5L) === ((-1, -1, -1)))
  }

  test("mediaFeatures dispatches the real codecs and quarantines the rest") {
    val sp = spark
    import sp.implicits._
    import graft.operators.MediaCodecs
    val pngPix = Array.tabulate(6 * 4)(i => (i * 11 % 256).toByte)
    val png = MediaCodecs.encodePng(MediaCodecs.Image(6, 4, 1, pngPix))
    val jpeg = {
      val bi = new java.awt.image.BufferedImage(
        16, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "jpg", bos)
      bos.toByteArray
    }
    val wavSamples = Array[Short](100, -200, 300)
    val wav = MediaCodecs.encodeWavPcm16(MediaCodecs.Audio(8000, 1, wavSamples))
    val rows = Seq(
      MultimodalOps.MediaRow(1L, png, "image"),
      MultimodalOps.MediaRow(2L, jpeg, "image"),
      MultimodalOps.MediaRow(3L, wav, "audio"),
      MultimodalOps.MediaRow(4L, Array[Byte](9, 9, 9, 9), "junk"))
    val out = MultimodalOps.mediaFeatures(rows.toDS()).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).media_type === "png")
    assert((out(1L).width, out(1L).height, out(1L).n_samples) === ((6L, 4L, 24L)))
    assert(out(1L).sum_value === pngPix.map(p => (p & 0xff).toLong).sum)
    assert(out(2L).media_type === "jpeg")
    assert((out(2L).width, out(2L).height) === ((16L, 8L)))
    assert(out(3L).media_type === "wav")
    assert((out(3L).width, out(3L).n_samples, out(3L).sum_value) === ((8000L, 3L, 600L)))
    assert(out(4L).media_type === "quarantine" && out(4L).width === -1L)
  }

  test("q105 dHash: the PNG round-trip hash equals a direct formula recompute") {
    // the operator's hash comes out of a REAL encode→decode container
    // trip; a lossless codec bug anywhere in that path shifts a pixel and
    // flips a comparison bit
    def directHash(id: Long): Long = {
      val g = id % 100
      var dh = 0L
      for (y <- 0 until 7; x <- 0 until 8) {
        if (MultimodalOps.q105Pixel(g, id, x + 1, y) >
            MultimodalOps.q105Pixel(g, id, x, y)) dh |= 1L << (y * 8 + x)
      }
      dh
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_q105")
    val sp = spark
    import sp.implicits._
    (0L until 300L).map(i => (i, s"t$i", "en", "s0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp.resolve("documents.parquet").toString)
    val hashes = MultimodalOps.imageDHashes(sp, tmp.toString)
      .collect().map(h => h.doc_id -> h.dhash).toMap
    assert(hashes.size === 300)
    assert(hashes.forall { case (id, dh) => dh == directHash(id) })
  }

  test("q105 banding recall: operator pairs equal brute-force Hamming<=3 pairs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q105b")
    val sp = spark
    import sp.implicits._
    (0L until 300L).map(i => (i, s"t$i", "en", "s0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp.resolve("documents.parquet").toString)
    val hashes = MultimodalOps.imageDHashes(sp, tmp.toString)
      .collect().map(h => h.doc_id -> h.dhash)
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    val got = MultimodalOps.imageNearDup(sp, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    // the planted structure: every same-group variant pair, nothing else
    assert(brute.forall { case (ia, ib, _) => ia % 100 == ib % 100 })
    assert(brute.size === 100 * 3) // 100 groups x C(3,2) variant pairs
  }

  test("q106 fingerprint: the WAV round-trip hash equals a formula recompute; pairs equal brute force") {
    def directFp(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val g = id % 100
      val e = new Array[Long](57)
      for (i <- 0 until 456)
        e(i / 8) += math.abs(MultimodalOps.q106Sample(md, g, id, i).toLong)
      (0 until 56).foldLeft(0L)((v, w) => if (e(w + 1) > e(w)) v | (1L << w) else v)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_q106")
    val sp = spark
    import sp.implicits._
    (0L until 300L).map(i => (i, s"t$i", "en", "s0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp.resolve("documents.parquet").toString)
    val hashes = MultimodalOps.audioFingerprints(sp, tmp.toString)
      .collect().map(h => h.doc_id -> h.dhash)
    assert(hashes.length === 300)
    assert(hashes.forall { case (id, fp) => fp == directFp(id) },
      "WAV container round trip must reproduce the formula fingerprint")
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    val got = MultimodalOps.audioNearDup(sp, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    assert(brute.forall { case (ia, ib, _) => ia % 100 == ib % 100 })
  }

  test("q107 frame sampling: k indices per video, in range, monotone") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q107")
    val sp = spark
    import sp.implicits._
    // texts long enough to fill the 8 header bytes; ASCII so byte==char
    (0L until 30L).map(i => (i, s"abcd${('A' + (i % 20)).toChar}Zframe text $i",
        "en", "s0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp.resolve("documents.parquet").toString)
    val rows = MultimodalOps.frameSample(sp, tmp.toString, k = 4).collect()
    val videos = (0L until 30L).filter(_ % 3 == 2)
    assert(rows.length === videos.size * 4)
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet === videos.toSet)
    for ((id, rs) <- byDoc) {
      val sorted = rs.sortBy(_.getLong(1))
      val n = sorted.head.getLong(3)
      // n_frames from the header equals the text-byte formula
      val text = s"abcd${('A' + (id % 20)).toChar}Zframe text $id"
      assert(n === text.charAt(4).toLong * 256 + text.charAt(5).toLong)
      val idx = sorted.map(_.getLong(2))
      assert(sorted.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L, 3L))
      assert(idx.forall(i => i >= 0 && i < n), s"$id: $idx vs n=$n")
      assert(idx.toSeq === idx.sorted.toSeq, "uniform indices are monotone")
      assert(idx.head === 0L)
    }
  }

  test("q125 kindWaterfall seam: decode gate, exact election, CC chain, ultimate keeper") {
    // the sf fixture's containers all decode and its exact groups are
    // formula-driven, so the SEAM test plants what the fixture lacks: a
    // decode failure, byte-identical copies, a near-dup whose OWN exact
    // dup must chain to the ultimate keeper, and a transitive
    // A~B~C (A!~C) perceptual chain that only CC labeling merges.
    val sp = spark
    import sp.implicits._
    val p1 = 1L << 40
    val p2 = p1 | (7L << 20) // Hamming(p1,p2)=3
    val p3 = p2 | (7L << 10) // Hamming(p2,p3)=3, Hamming(p1,p3)=6
    val assets = Seq(
      (1L, true, "A", 0x0FL),    // kept: digest keeper, no smaller neighbor
      (2L, true, "A", 0x0FL),    // exact_dup of 1
      (3L, true, "B", 0x0EL),    // near_dup: Hamming(0x0F,0x0E)=1 vs keeper 1
      (6L, true, "B", 0x0EL),    // exact_dup of 3 → ULTIMATE keeper is 1
      (4L, true, "C", 0xF0F0L),  // kept: far from everything
      (5L, false, "D", -1L),     // decode failure
      (7L, true, "E", p1),       // chain head: kept
      (8L, true, "F", p2),       // near_dup via direct pair with 7
      (9L, true, "G", p3)        // near_dup ONLY via transitive closure
    ).toDF("doc_id", "ok", "digest", "phash")
    val out = MultimodalOps.kindWaterfall(assets).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(1L) === ("kept", 1L))
    assert(out(2L) === ("exact_dup", 1L))
    assert(out(3L) === ("near_dup", 1L))
    assert(out(6L) === ("exact_dup", 1L), "exact dup must chain to the ULTIMATE keeper")
    assert(out(4L) === ("kept", 4L))
    assert(out(5L) === ("decode", -1L), "decode failure has no keeper (null)")
    assert(out(7L) === ("kept", 7L))
    assert(out(8L) === ("near_dup", 7L))
    assert(out(9L) === ("near_dup", 7L), "A~B~C must merge via CC, not pairwise only")
    sp.catalog.clearCache()
  }

  test("q125 per-stage drop counts and keeper closure on the sf fixture") {
    val sp = spark
    val out = MultimodalOps.mediaWaterfall(sp, "/root/testdata/sf0.01")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = out.collect()
    val nDocs = 500L
    assert(rows.length === 2 * nDocs, "one disposition row per (kind, doc)")
    // both payloads are pure functions of doc_id % 300, so ids 300..499
    // are byte-identical to ids 0..199 → exactly 200 exact_dups per kind,
    // and every container decodes (q98/q99 pin the codecs)
    val byKindStage = rows.groupBy(r => (r.getString(0), r.getString(2)))
      .view.mapValues(_.length.toLong).toMap
    for (kind <- Seq("image", "audio")) {
      assert(byKindStage.getOrElse((kind, "decode"), 0L) === 0L)
      assert(byKindStage.getOrElse((kind, "exact_dup"), 0L) === 200L)
      assert(byKindStage.getOrElse((kind, "near_dup"), 0L)
        + byKindStage.getOrElse((kind, "kept"), 0L) === 300L)
      // the perceptual stage has real work: same-group variants
      // (g, g+100, g+200 survive exact dedup, differing only in the
      // boost cell / boosted window) must merge for at least some groups
      assert(byKindStage.getOrElse((kind, "near_dup"), 0L) > 0L,
        s"$kind: no perceptual near-dups found on the fixture")
    }
    // keeper CLOSURE: every kept_id must itself be a kept doc of the same
    // kind — the waterfall never defers to a document that was dropped
    val kept = rows.filter(_.getString(2) == "kept")
      .map(r => (r.getString(0), r.getLong(1))).toSet
    for (r <- rows if r.getString(2) != "decode") {
      assert(!r.isNullAt(3))
      val k = (r.getString(0), r.getLong(3))
      assert(kept.contains(k), s"row $r defers to non-kept $k")
      assert(r.getLong(3) <= r.getLong(1), "elections are min-id: keeper <= doc")
    }
    out.unpersist(blocking = true)
    sp.catalog.clearCache()
  }

  test("q128 multimodal verdict: reconciles with q113 and q125 outputs; verdict cases") {
    // COMPOSITION contract: every q128 row must restate its document's
    // q113 text stage and q125 per-kind media stages exactly, and the
    // final disposition must be the documented three-case function. The
    // sf fixture has no decode failures, so text_only is structurally
    // absent — covered by planting a decode failure through the seam in
    // the kindWaterfall test above; here the fixture pins drop_text/full.
    val sp = spark
    val d = "/root/testdata/sf0.01"
    val text = graft.operators.TextOps.pipelineWaterfall(
      sp.read.parquet(s"$d/documents.parquet"))
    val textStages = text.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    text.unpersist(blocking = true)
    val media = MultimodalOps.mediaWaterfall(sp, d)
    val mediaStages = media.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    media.unpersist(blocking = true)
    val out = graft.SparkEntry.queries("q128_multimodal_verdict")(sp, d)
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSet === textStages.keySet,
      "one verdict row per q113 corpus document")
    for (r <- rows) {
      val id = r.getLong(0)
      assert(r.getString(1) === textStages(id))
      assert(r.getString(2) === mediaStages(("image", id)))
      assert(r.getString(3) === mediaStages(("audio", id)))
      val expect =
        if (r.getString(1) != "kept") "drop_text"
        else if (r.getString(2) == "decode" || r.getString(3) == "decode") "text_only"
        else "full"
      assert(r.getString(4) === expect, s"doc $id: $r")
    }
    assert(rows.exists(_.getString(4) == "drop_text"))
    assert(rows.exists(_.getString(4) == "full"))
    out.unpersist(blocking = true)
    sp.catalog.clearCache()
  }
}
