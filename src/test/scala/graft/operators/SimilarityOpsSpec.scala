package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** ANN quality beyond the hash oracle. The sf embeddings are only WEAKLY
  * label-clustered (measured quantizer purity 0.41 vs 0.10 for random
  * assignment over 10 labels), so these specs pin "substantially better
  * than chance" floors rather than near-perfect recall — the honest
  * property of IVF with 2-of-10 probes on diffuse data, and exactly the
  * probe-count trade the q43 scaladoc documents. Everything here is
  * deterministic (fixed data, rounded dots, tiebroken ranks), so the
  * floors sit just under the measured values, not far under.
  */
class SimilarityOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) => qid -> rows.map(_.getLong(1)).toSet }

  private def meanRecall(brute: Map[Long, Set[Long]],
      ivf: Map[Long, Set[Long]]): Double = {
    assert(brute.keySet === ivf.keySet)
    val recalls = brute.map { case (qid, bf) =>
      ivf(qid).intersect(bf).size.toDouble / bf.size
    }
    recalls.sum / recalls.size
  }

  test("q43 IVF top-5 recall beats random 2-of-10 list probing") {
    val brute = topSets(SimilarityOps.queries("q37_sim_topk")(spark, d))
    val ivf = topSets(SimilarityOps.queries("q43_ivf_search")(spark, d))
    val mean = meanRecall(brute, ivf)
    // random 2-of-10 probing expects ~0.20; measured 0.27 on this data —
    // modest by design (weak clusters, 2 probes), but must stay above chance
    assert(mean >= 0.25, f"mean IVF recall@5 = $mean%.2f")
    // and every IVF hit must be a REAL neighbor score: cosines of shared
    // (qid, cid) pairs agree with brute force exactly (same rounding)
    val bfCos = SimilarityOps.queries("q37_sim_topk")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    SimilarityOps.queries("q43_ivf_search")(spark, d).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bfCos.get(key).foreach(c => assert(c === r.getDouble(2), s"cos mismatch at $key"))
    }
  }

  test("recall-vs-probes curve: more probes never lose recall, full probing is exact") {
    val brute = topSets(SimilarityOps.queries("q37_sim_topk")(spark, d))
    val r2 = meanRecall(brute, topSets(SimilarityOps.ivfSearch(spark, d, nProbes = 2)))
    val r4 = meanRecall(brute, topSets(SimilarityOps.ivfSearch(spark, d, nProbes = 4)))
    assert(r2 >= 0.25, f"recall@5 with 2 probes = $r2%.2f")
    assert(r4 >= r2, f"recall must not drop with more probes: p=4 $r4%.2f < p=2 $r2%.2f")
    // probing ALL 10 label-centroids scores every inverted list — the
    // candidate set is the whole corpus, so IVF must recover brute force
    // exactly (degenerate end of the curve, pins the knob's semantics)
    val rAll = meanRecall(brute, topSets(SimilarityOps.ivfSearch(spark, d, nProbes = 10)))
    assert(rAll === 1.0, f"full probing should be exact, recall = $rAll%.2f")
  }

  test("q61 PQ codes: 8 codes per vector, argmin beats the own-label baseline") {
    val rows = SimilarityOps.queries("q61_pq_codes")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val n = spark.read.parquet(s"$d/embeddings.parquet").count()
    assert(rows.length === 8 * n, "exactly one code per (vector, subspace)")
    assert(rows.forall(r => r._2 >= 0 && r._2 < 8), "subspace out of range")
    assert(rows.forall(r => r._3 >= 0 && r._3 <= 9), "code out of range")
    assert(rows.forall(_._4 >= 0.0), "squared distance negative")
    // codewords are label means, so subvectors must quantize to their own
    // label's codeword more often than the 1-in-10 chance rate — measured
    // 0.17 on this weakly-clustered data (an 8-dim subspace carries much
    // less label signal than the full vector: q41's full-dim purity is
    // 0.41), floor just under measured per the suite's convention
    val labels = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val ownRate = rows.count(r => r._3 == labels(r._1)).toDouble / rows.length
    assert(ownRate > 0.13, f"own-label quantization rate $ownRate%.2f at chance level")
    // and the assignment is a true argmin: total distortion of the chosen
    // codes is <= the distortion of the fixed own-label assignment, which
    // an independent join recomputes from raw data
    val chosen = rows.map(_._4).sum
    val sp = spark
    import sp.implicits._
    val own = sp.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS e")
      .as[(Long, Int, Seq[Double])].collect()
    val means = scala.collection.mutable.Map[(Int, Int, Int), (Double, Long)]()
    own.foreach { case (_, lbl, e) =>
      e.zipWithIndex.foreach { case (x, p) =>
        val k = (lbl, p / 8, p)
        val (s0, c0) = means.getOrElse(k, (0.0, 0L))
        means(k) = (s0 + x, c0 + 1)
      }
    }
    val ownDist = own.map { case (_, lbl, e) =>
      e.zipWithIndex.map { case (x, p) =>
        val (s0, c0) = means((lbl, p / 8, p)); val cx = s0 / c0
        (x - cx) * (x - cx)
      }.sum
    }.sum
    assert(chosen <= ownDist + 1e-6,
      f"argmin distortion $chosen%.4f exceeds own-label baseline $ownDist%.4f")
  }

  test("q66 ADC top-5 beats chance and scores candidates from codes alone") {
    val rows = SimilarityOps.queries("q66_pq_adc_topk")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._1).distinct.sorted.toSeq === Seq(0L, 1L, 2L))
    assert(rows.forall(_._3 >= 0.0), "approximate distance negative")
    // per query: 5 rows ranked 1..5 with non-decreasing adist
    for ((qid, qr) <- rows.groupBy(_._1)) {
      val byRn = qr.sortBy(_._4)
      assert(byRn.map(_._4).toSeq === (1L to 5L).toSeq, s"q$qid ranks")
      assert(byRn.map(_._3).sliding(2).forall(p => p.head <= p.last),
        s"q$qid adist not sorted")
    }
    // ADC sees only 8 codes per candidate (10 codewords per subspace), so
    // recall vs exact brute force is the coarse-quantization trade —
    // must beat the ~0.0025 chance rate of picking 5 of 2000 by a wide
    // margin; floor just under measured (suite convention)
    val brute = topSets(SimilarityOps.queries("q37_sim_topk")(spark, d))
    val adc = topSets(SimilarityOps.queries("q66_pq_adc_topk")(spark, d))
    val recall = meanRecall(brute, adc)
    assert(recall >= 0.1, f"ADC recall@5 = $recall%.2f at chance level")
  }

  test("q70 IVF-PQ: candidate set is probe-bounded; full probing IS exhaustive ADC") {
    val n = spark.read.parquet(s"$d/embeddings.parquet").count()
    // k=MaxValue returns every scored candidate: at the default 2-of-10
    // probes that must be a strict subset of exhaustive ADC's 3·(n−1)
    // scored pairs — the whole point of composing IVF with PQ
    val cand2 = SimilarityOps.ivfPqSearch(spark, d, nProbes = 2, k = Int.MaxValue)
    val c2 = cand2.count()
    cand2.unpersist(blocking = true)
    assert(c2 > 0, "IVF-PQ scored no candidates")
    assert(c2 < 3 * (n - 1),
      s"p=2 scored $c2 candidates — not bounded below exhaustive ${3 * (n - 1)}")
    // probing ALL 10 cells scores every inverted list — the candidate set
    // is the corpus, so IVF-PQ must reproduce q66's exhaustive ADC top-5
    // EXACTLY (same scoring, same rounding, same tiebreaks)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val full = SimilarityOps.ivfPqSearch(spark, d, nProbes = 10)
    val exh = SimilarityOps.queries("q66_pq_adc_topk")(spark, d)
    assert(rows(full) === rows(exh), "full probing diverged from exhaustive ADC")
    full.unpersist(blocking = true)
    exh.unpersist(blocking = true)
  }

  test("q70 IVF-PQ recall vs exhaustive ADC: floor at p=2, monotone in probes") {
    // recall measured against q66 (the exhaustive scorer with the SAME
    // quantization) isolates the probing loss from the PQ loss
    val adc = topSets(SimilarityOps.queries("q66_pq_adc_topk")(spark, d))
    val p2df = SimilarityOps.ivfPqSearch(spark, d, nProbes = 2)
    val p4df = SimilarityOps.ivfPqSearch(spark, d, nProbes = 4)
    val r2 = meanRecall(adc, topSets(p2df))
    val r4 = meanRecall(adc, topSets(p4df))
    p2df.unpersist(blocking = true)
    p4df.unpersist(blocking = true)
    info(f"IVF-PQ recall@5 vs exhaustive ADC: p=2 $r2%.2f, p=4 $r4%.2f")
    // measured 0.13 at p=2 / 0.33 at p=4 on the weakly-clustered fixture
    // (2-of-10 probes on diffuse data — the same modest-recall regime as
    // q43's curve); chance is 5/199 ≈ 0.025, so the floor sits 4× above
    // chance and just under measured, per the suite's convention
    assert(r2 >= 0.1, f"IVF-PQ recall@5 at p=2 = $r2%.2f")
    // superset candidates + identical deterministic scoring → monotone
    assert(r4 >= r2, f"recall dropped with more probes: p=4 $r4%.2f < p=2 $r2%.2f")
  }

  test("q72 Lloyd step: refined centroids strictly reduce total distortion") {
    val base = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS e")
    val refined = SimilarityOps.kmeansRefined(base).collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getSeq[Double](1).toArray).toMap
    assert(refined.nonEmpty && refined.size <= 10, s"${refined.size} centroids")
    assert(refined.values.forall(_.length == 64), "refined centroid dim != 64")
    // driver-side ground truth: seed = label means; distortion of a
    // centroid SET is sum over vectors of the min squared L2 to any
    // centroid. Lloyd's step guarantees D(refined) <= D(seed) — a refined
    // set computed wrongly (bad means, dropped members, mixed-up labels)
    // has no reason to satisfy it.
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS e")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val dim = vecs.head._3.length
    val seed = vecs.groupBy(_._2).map { case (lbl, vs) =>
      val m = new Array[Double](dim)
      vs.foreach(v => (0 until dim).foreach(i => m(i) += v._3(i)))
      (0 until dim).foreach(i => m(i) /= vs.length)
      lbl.toLong -> m
    }
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    def distortion(cs: Iterable[Array[Double]]): Double =
      vecs.map(v => cs.map(c => sq(v._3, c)).min).sum
    val d0 = distortion(seed.values)
    val d1 = distortion(refined.values)
    info(f"distortion: seed $d0%.3f -> refined $d1%.3f")
    assert(d1 <= d0 + 1e-6, f"Lloyd step increased distortion: $d0%.4f -> $d1%.4f")
    // the fixture is weakly clustered, so the step must actually MOVE
    // something (a no-op "refinement" returning the seed would also pass
    // the inequality)
    assert(d1 < d0 - 1e-6, "refinement changed nothing on a non-degenerate fixture")
  }

  test("q84 SQ8: codes span [0,255], extremes hit the end bins, midpoint decode within half a bin") {
    val codes = SimilarityOps.queries("q84_sq8_codes")(spark, d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS e")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val dims = emb.head._2.length
    assert(codes.size === emb.length * dims)
    (0 until dims).foreach { dim =>
      val xs = emb.map(_._2(dim))
      val (mn, mx) = (xs.min, xs.max)
      assert(mx > mn, s"degenerate fixture dim $dim")
      val w = (mx - mn) / 255.0
      emb.foreach { case (id, vec) =>
        val c = codes((id, dim.toLong))
        assert(c >= 0L && c <= 255L, s"code out of range: vec $id dim $dim -> $c")
        // midpoint decode lands within half a bin width (+1 ulp slack)
        val recon = mn + (c + 0.5) * w
        assert(math.abs(vec(dim) - recon) <= w / 2 * (1 + 1e-9),
          s"vec $id dim $dim: |${vec(dim)} - $recon| > ${w / 2}")
      }
      // the range endpoints occupy the end bins
      assert(codes((emb.minBy(_._2(dim))._1, dim.toLong)) === 0L)
      assert(codes((emb.maxBy(_._2(dim))._1, dim.toLong)) === 255L)
    }
  }

  test("q86 SemDeDup: kept set has no within-cell pair above theta; drops only have a lower-id witness") {
    // caller-owns-cache contract: semDedup returns a persisted frame
    val outDf = SimilarityOps.queries("q86_semdedup")(spark, d)
    val out = outDf.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    outDf.unpersist(blocking = true)
    val total = spark.read.parquet(s"$d/embeddings.parquet").count()
    assert(out.length === total, "audit shape: one row per vector")
    assert(out.exists(_._3 == 0L), "fixture has cosine pairs >= 0.45 (q39) — something must drop")
    // exact cosine over the same cells, recomputed independently
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS e")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      var i = 0; var d0 = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) { d0 += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d0 / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCell = out.groupBy(_._2)
    byCell.foreach { case (cell, vs) =>
      val kept = vs.filter(_._3 == 1L).map(_._1).sorted
      // no surviving within-cell pair above theta
      for (i <- kept.indices; j <- (i + 1) until kept.length)
        assert(cos(emb(kept(i)), emb(kept(j))) < 0.45,
          s"cell $cell kept a duplicate pair (${kept(i)}, ${kept(j)})")
      // every drop has a lower-id witness in its cell
      vs.filter(_._3 == 0L).foreach { case (id, _, _) =>
        val witnesses = vs.map(_._1).filter(u => u < id && cos(emb(u), emb(id)) >= 0.45)
        assert(witnesses.nonEmpty, s"vec $id dropped without a lower-id witness in cell $cell")
      }
    }
  }

  test("q41 coarse quantizer separates labels far better than chance") {
    val rows = SimilarityOps.queries("q41_ivf_assign")(spark, d).collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue(),
        r.getLong(2)))
    val total = rows.map(_._3).sum
    val diagonal = rows.collect { case (l, a, n) if l == a => n }.sum
    assert(total > 0)
    val purity = diagonal.toDouble / total
    // measured 0.41; random assignment over 10 labels gives 0.10
    assert(purity >= 0.35, f"assignment purity $purity%.2f")
  }

  test("q122 saved-index search round-trips q70 exactly and prunes at the scan") {
    val sf = "/root/testdata/sf0.001"
    val inline = SimilarityOps.queries("q70_ivfpq_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_q122").toFile
    try {
      val dir = tmp.getAbsolutePath
      SimilarityOps.saveIvfPqIndex(spark, sf, dir)
      val savedDf = SimilarityOps.searchSavedIvfPq(spark, sf, dir)
      val saved = savedDf.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      // the persisted path IS q70: identical rows in identical order
      assert(saved === inline)
      // the partitioned layout prunes unprobed cells AT the codes scan:
      // the broadcast probe join plants a dynamic partition-pruning
      // subquery on c_label (file-level prune, not a post-read filter)
      val ex = savedDf.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(ex.contains("IN dynamicpruning#"),
        "codes scan carries no dynamic partition-pruning filter")
      // and the layout really is one directory per coarse cell
      val cellDirs = new java.io.File(dir, "codes").listFiles()
        .count(_.getName.startsWith("c_label="))
      assert(cellDirs === 10, s"$cellDirs cell directories")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("q123 prototype ranks: planted centroids, distances, tie-break, keep flag") {
    val sp = spark
    import sp.implicits._
    graft.functions.VectorFunctions.register(sp)
    // label 0: (0,0) and (0,8) -> centroid (0,4), BOTH at dist 16 (a true
    // tie -> vec_id breaks it); label 1: (10,0)/(10,1)/(10,5) -> centroid
    // (10,2) with dists 4/1/9 -> rank v3,v2,v4
    val base = Seq(
      (0L, 0, Seq(0.0, 0.0)), (1L, 0, Seq(0.0, 8.0)),
      (2L, 1, Seq(10.0, 0.0)), (3L, 1, Seq(10.0, 1.0)), (4L, 1, Seq(10.0, 5.0)))
      .toDF("vec_id", "label", "e")
    val out = SimilarityOps.prototypeSelect(base, kKeep = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (0L, 0L, 16.0, 1L, 1L), (1L, 0L, 16.0, 2L, 1L),
      (3L, 1L, 1.0, 1L, 1L), (2L, 1L, 4.0, 2L, 1L), (4L, 1L, 9.0, 3L, 0L)))
  }

  test("q124 selection is exactly q123's keepers and plans a WindowGroupLimit") {
    val sf = "/root/testdata/sf0.001"
    val audit = SimilarityOps.queries("q123_prototype_select")(spark, sf)
      .filter(col("keep") === 1L)
      .select("vec_id", "c_label", "dist", "proto_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val topDf = SimilarityOps.queries("q124_prototype_topk")(spark, sf)
    val top = topDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(top === audit, "q124 must be q123 ∩ keep=1, ranks included")
    // the scale claim: the in-query rank filter lets InferWindowGroupLimit
    // plant the map-side group top-k the all-rows audit shape cannot have
    val ex = topDf.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(ex.contains("WindowGroupLimit"),
      "q124's rank filter planted no WindowGroupLimit")
  }

  test("q126 appended index equals a rebuild at the frozen codebook; search identical") {
    // the incremental contract: save(base) + append(batch) must yield the
    // SAME inverted file as coding the union in one shot against the same
    // frozen centroids/codebook — and the saved search must not be able
    // to tell the difference. Because dirRef codes EVERY vector through
    // the append path (models read back from parquet) while dirInc coded
    // the base at build time (in-memory models), equality also pins that
    // the parquet round trip changes nothing (doubles are bit-exact).
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.register(spark)
    val sf = "/root/testdata/sf0.001"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("e", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("nrm", sqrt(expr("graft_dot(e, e)")))
    val base = all.filter(!expr(SimilarityOps.q126BatchFilter))
    val batch = all.filter(expr(SimilarityOps.q126BatchFilter))
    assert(batch.count() > 0 && base.count() > 0)
    val tmpInc = java.nio.file.Files.createTempDirectory("graft_q126_inc").toFile
    val tmpRef = java.nio.file.Files.createTempDirectory("graft_q126_ref").toFile
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    try {
      SimilarityOps.saveIvfPqIndexFrom(base, tmpInc.getAbsolutePath)
      SimilarityOps.appendToIvfPqIndex(spark, batch, tmpInc.getAbsolutePath)
      // reference: same saved models, codes dir rebuilt in ONE pass over
      // the union through the frozen-model append path
      SimilarityOps.saveIvfPqIndexFrom(base, tmpRef.getAbsolutePath)
      rm(new java.io.File(tmpRef, "codes"))
      SimilarityOps.appendToIvfPqIndex(spark, all, tmpRef.getAbsolutePath)
      def codesOf(dir: java.io.File) =
        spark.read.parquet(new java.io.File(dir, "codes").getAbsolutePath)
          .select("c_label", "cid", "subspace", "code").collect()
          .map(_.toSeq).toSet
      val inc = codesOf(tmpInc)
      val ref = codesOf(tmpRef)
      assert(inc === ref, "appended inverted file diverged from the frozen-codebook rebuild")
      // the appended vectors are really in the index
      val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
      val indexedIds = inc.map(_(1).asInstanceOf[Long])
      assert(batchIds.subsetOf(indexedIds), "append lost batch vectors")
      val s1 = SimilarityOps.searchSavedIvfPq(spark, sf, tmpInc.getAbsolutePath)
        .collect().map(_.toSeq).toSeq
      val s2 = SimilarityOps.searchSavedIvfPq(spark, sf, tmpRef.getAbsolutePath)
        .collect().map(_.toSeq).toSeq
      assert(s1 === s2, "search distinguishes appended from rebuilt index")
    } finally { rm(tmpInc); rm(tmpRef) }
  }
}
