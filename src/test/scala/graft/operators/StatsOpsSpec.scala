package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q46 grouped percentiles, q47 deterministic stratified sampling, q48
  * TF-IDF: properties beyond the hash oracle — monotone quantiles, rates
  * that concentrate at the configured strata quotas, run-to-run
  * determinism (the whole point of hash-threshold sampling vs rand()).
  */
class StatsOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  test("q46 percentiles are monotone and group counts cover the table") {
    val rows = StatsOps.queries("q46_group_percentiles")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(p25, p50, p90, p99) = Seq(2, 3, 4, 5).map(r.getDouble)
      assert(p25 <= p50 && p50 <= p90 && p90 <= p99, s"non-monotone: $r")
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total === spark.read.parquet(s"$d/lineitem.parquet").count())
  }

  test("approx_percentile (the 100 TB path) tracks q46's exact percentiles") {
    // q46 is exact so the DuckDB oracle can hash-match; at scale the
    // operator of choice is approx_percentile (mergeable sketch, map-side
    // partials). Pin the substitution's error the same way q26 pins HLL:
    // within 1% of the exact value at the default accuracy.
    val exact = StatsOps.queries("q46_group_percentiles")(spark, d)
      .collect().map(r => r.getString(0) -> Seq(2, 3, 4, 5).map(r.getDouble)).toMap
    val approx = spark.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.9D, 0.99D))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(exact.keySet === approx.keySet)
    for ((flag, ps) <- exact; (e, a) <- ps.zip(approx(flag)))
      assert(math.abs(a - e) / e < 0.01, s"$flag: approx $a vs exact $e")
  }

  test("q47 strata rates concentrate at 25% (even sources) and 75% (odd)") {
    val sample = StatsOps.queries("q47_stratified_sample")(spark, d)
      .withColumn("srcnum", substring(col("source"), 4, 10).cast("int"))
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .withColumn("srcnum", substring(col("source"), 4, 10).cast("int"))
    val perStratum = docs.groupBy(col("srcnum") % 2).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val kept = sample.groupBy(col("srcnum") % 2).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val evenRate = kept(0).toDouble / perStratum(0)
    val oddRate = kept(1).toDouble / perStratum(1)
    // 250 docs per parity at sf0.01: ±3σ of Binomial(250, p)
    assert(math.abs(evenRate - 0.25) < 0.09, s"even rate $evenRate")
    assert(math.abs(oddRate - 0.75) < 0.09, s"odd rate $oddRate")
  }

  test("q47 is bit-identical across runs (no rand() anywhere)") {
    def run() = StatsOps.queries("q47_stratified_sample")(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(run() === run())
  }

  test("q58 split proportions concentrate at 90/5/5 and cover every doc exactly once") {
    val rows = StatsOps.queries("q58_split_assign")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(2))
    val total = spark.read.parquet(s"$d/documents.parquet").count()
    assert(rows.length === total, "every doc gets exactly one split row")
    assert(rows.map(_._2).toSet === Set("train", "val", "test"))
    val byFrac = rows.groupBy(_._2).view.mapValues(_.length.toDouble / total)
    // 500 docs: ±3σ of Binomial(500, p)
    assert(math.abs(byFrac("train") - 0.90) < 0.05, s"train ${byFrac("train")}")
    assert(math.abs(byFrac("val") - 0.05) < 0.04, s"val ${byFrac("val")}")
    assert(math.abs(byFrac("test") - 0.05) < 0.04, s"test ${byFrac("test")}")
  }

  test("q58 split assignment is stable under corpus growth") {
    // the split is a function of doc_id alone: a doc keeps its split when
    // the corpus around it grows 10× — the property that makes hash-splits
    // safe to recompute over an ever-growing corpus (rand() splits are not)
    val small = StatsOps.queries("q58_split_assign")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val large = StatsOps.queries("q58_split_assign")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(small.nonEmpty)
    small.foreach { case (id, s) =>
      assert(large(id) === s, s"doc $id reassigned from $s to ${large(id)}")
    }
  }

  test("q63 mix: min source kept whole, over-represented sources sqrt-shrink") {
    val sp = spark
    import sp.implicits._
    // the sf fixtures have uniform sources (all rates 1.0 — the oracle
    // pins that degenerate identity), so the shrink path needs a skewed
    // synthetic corpus: 700 / 200 / 100
    val docs = ((0L until 700L).map(i => (i, "big")) ++
        (700L until 900L).map(i => (i, "mid")) ++
        (900L until 1000L).map(i => (i, "small"))).toDF("doc_id", "source")
    val kept = StatsOps.sourceMix(docs).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") === 100L, "min source must keep everything")
    for ((src, cnt) <- Seq("big" -> 700L, "mid" -> 200L)) {
      val rate = math.sqrt(100.0 / cnt)
      val sigma = math.sqrt(cnt * rate * (1 - rate))
      assert(math.abs(kept(src) - cnt * rate) <= 3 * sigma + 1,
        s"$src kept ${kept(src)} of $cnt at rate $rate")
    }
    // fixture path: uniform sources → rates 1.0 → identity
    val fixture = StatsOps.queries("q63_source_mix")(spark, d)
    assert(fixture.count() ===
      spark.read.parquet(s"$d/documents.parquet").count())
    // determinism: same rows on a second run of the skewed mix
    def ids() = StatsOps.sourceMix(docs).collect().map(_.getLong(0)).toSet
    assert(ids() === ids())
  }

  test("q57 packing invariants: contiguous bins, no bin starts past capacity, order preserved") {
    val rows = StatsOps.queries("q57_pack_sequences")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((src, docs) <- rows.groupBy(_._2)) {
      val inOrder = docs.sortBy(_._1)
      // bin ids start at 0, never decrease, and never skip HERE because
      // every fixture doc is shorter than the 512-token capacity — a doc
      // crossing multiple boundaries legitimately skips the bins it
      // spills through (see packCapacity's boundary-binning contract)
      val bins = inOrder.map(_._4)
      assert(bins.head === 0L, s"$src first bin")
      bins.zip(bins.tail).foreach { case (a, b) =>
        assert(b === a || b === a + 1, s"$src bins skipped: $a -> $b")
      }
      // independent recomputation of the greedy-fill rule: a doc's bin is
      // the capacity-quotient of the tokens packed before it
      var before = 0L
      inOrder.foreach { case (id, _, n, b) =>
        assert(b === before / StatsOps.packCapacity, s"$src doc $id bin")
        before += n
      }
    }
  }

  test("q57 sharded packing: same greedy math per (source, shard), distinct global bins") {
    // the hot-source escape composes the window key; each shard must run
    // the SAME cumulative-boundary binning over its own doc_id-ordered
    // slice, with local bins mapped to bin * shards + shard
    val shards = 4
    val docs = graft.util.Tables.documents(spark, d)
    val rows = StatsOps.packSequences(docs, shards = shards).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val base = StatsOps.packSequences(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // same universe and token counts, packing key aside
    assert(rows.map(r => (r._1, r._2, r._3)).sortBy(_._1).toSeq ===
      base.map(r => (r._1, r._2, r._3)).sortBy(_._1).toSeq)
    // independent recompute: shard = xxhash64(doc_id) % shards (Spark's
    // pmod — recomputed via the engine to avoid reimplementing xxhash)
    val shardOf = docs
      .select(col("doc_id"), pmod(xxhash64(col("doc_id")), lit(shards.toLong)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byId = rows.map(r => r._1 -> r._4).toMap
    for (((_, sh), docsIn) <- rows.groupBy(r => (r._2, shardOf(r._1)))) {
      var before = 0L
      docsIn.sortBy(_._1).foreach { case (id, _, n, _) =>
        val expected = (before / StatsOps.packCapacity) * shards + sh
        assert(byId(id) === expected, s"doc $id shard $sh bin")
        before += n
      }
    }
    // shards = 1 must be bit-identical to the oracle-pinned q57 entry
    val q57 = StatsOps.queries("q57_pack_sequences")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(q57.sortBy(_._1).toSeq === base.sortBy(_._1).toSeq)
  }

  test("q59 coverage curve: ranks contiguous, freqs non-increasing, cum_share monotone to <= 1") {
    val rows = TextOps.queries("q59_vocab_coverage")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq === (1L to rows.length).toSeq, "ranks not contiguous")
    val freqs = rows.map(_._3)
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b }, "freqs not sorted")
    val shares = rows.map(_._4)
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b }, "cum_share not monotone")
    assert(shares.last <= 1.0 + 1e-9)
    // independent recompute of the top token's frequency and share
    val tok = spark.read.parquet(s"$d/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
    val nTok = tok.count()
    val topCnt = tok.filter(col("w") === rows.head._2).count()
    assert(topCnt === rows.head._3)
    assert(math.abs(rows.head._4 - topCnt.toDouble / nTok) < 1e-6)
    // the fixture vocab is fully enumerated (< 100 tokens), so the curve
    // must end at exactly 1.0
    if (rows.length < 100) assert(math.abs(shares.last - 1.0) < 1e-9)
  }

  test("q60 repetition stats match a driver-side recompute on every doc") {
    val rows = TextOps.queries("q60_repetition_stats")(spark, d).collect()
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length === texts.size)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ", -1)
      val n = toks.length
      assert(r.getLong(1) === n.toLong)
      assert(r.getDouble(2) === r6(toks.distinct.length.toDouble / n))
      val topCnt = toks.groupBy(identity).values.map(_.length).max
      assert(r.getDouble(3) === r6(topCnt.toDouble / n))
      val bigrams = if (n >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
      val expected = if (bigrams.isEmpty) 0.0
        else r6(1.0 - bigrams.distinct.length.toDouble / bigrams.length)
      assert(r.getDouble(4) === expected, s"doc ${r.getLong(0)} dup_bigram_ratio")
    }
  }

  test("q64 chunk windows match a driver-side recompute: offsets, sizes, text") {
    val rows = TextOps.queries("q64_chunk_windows")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    assert(rows.nonEmpty)
    // per-doc: ceil(n/64) chunks with contiguous ids, exact slices
    for ((docId, chunks) <- rows.groupBy(_._1)) {
      val toks = texts(docId)
      val expected = (toks.length + 63) / 64
      assert(chunks.length === expected, s"doc $docId chunk count")
      assert(chunks.map(_._2).sorted.toSeq === (0L until expected).toSeq,
        s"doc $docId chunk ids not contiguous")
      chunks.foreach { case (_, cid, start, nTok, text) =>
        assert(start === cid * 64)
        assert(nTok === math.min(128, toks.length - start))
        assert(text === toks.slice(start.toInt, start.toInt + 128).mkString(" "),
          s"doc $docId chunk $cid text mismatch")
      }
    }
  }

  test("q69 unigram surprisal matches a driver-side recompute on every doc") {
    val rows = TextOps.queries("q69_unigram_surprisal")(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    assert(rows.length === texts.size)
    def rd(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val freq = texts.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = freq.values.sum.toDouble
    // micro-bit integerization mirrors the operator: round to 6 decimals,
    // then to integer micro-bits; the mean is exact integer arithmetic with
    // half-up rounding via (2a+b) div (2b)
    val su = freq.map { case (w, f) =>
      w -> math.round(rd(-(math.log(f / total) / math.log(2.0)), 6) * 1e6)
    }
    rows.foreach { case (id, avg, n) =>
      val toks = texts(id)
      assert(n === toks.length.toLong)
      val a = toks.map(su).sum
      val b = toks.length.toLong * 100L
      assert(avg === ((2 * a + b) / (2 * b)).toDouble / 10000.0,
        s"doc $id surprisal mismatch")
    }
  }

  test("q83: admitted set is a priority prefix and stops at the budget in every source") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val admitted = StatsOps.queries("q83_token_budget")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(admitted.nonEmpty)
    // the admit rule itself: budget not exhausted BEFORE the doc
    admitted.foreach { case (id, _, nTok, _, cum) =>
      assert(cum - nTok < StatsOps.selectBudget, s"doc $id over budget")
    }
    val bynAlpha = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_alpha",
        expr("size(filter(toks, t -> t rlike '^[a-z]+$'))").cast("long"))
      .select("doc_id", "source", "n_alpha")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val admittedIds = admitted.map(_._1).toSet
    bynAlpha.groupBy(_._2).foreach { case (src, all) =>
      val adm = all.filter(t => admittedIds(t._1))
      val rej = all.filterNot(t => admittedIds(t._1))
      assert(adm.nonEmpty, s"$src admitted nothing")
      // prefix property: no rejected doc outranks an admitted one
      if (rej.nonEmpty)
        assert(rej.map(_._3).max <= adm.map(_._3).min,
          s"$src rejected a doc with higher priority than an admitted one")
      // the budget genuinely bound (every source has >800 tokens at sf0.01)
      assert(rej.nonEmpty, s"$src budget did not bind")
    }
  }

  test("q85: every doc gets full epochs 0..n-1, multiplicities differ by at most one per source") {
    val rows = StatsOps.queries("q85_epoch_assign")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val docCount = spark.read.parquet(s"$d/documents.parquet").count()
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.size === docCount, "every document must appear")
    byDoc.foreach { case (id, rs) =>
      val epochs = rs.map(_._3).sorted.toSeq
      assert(epochs === (0L until epochs.length.toLong).toSeq,
        s"doc $id epochs not contiguous from 0: ${epochs.mkString(",")}")
    }
    // within a source the repeat factor is full or full+1 (partial epoch)
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val counts = rs.groupBy(_._1).values.map(_.size).toSet
      assert(counts.size <= 2, s"$src has >2 distinct repeat factors: $counts")
      if (counts.size == 2)
        assert(counts.max - counts.min === 1, s"$src repeat factors not adjacent")
    }
    // upsampling really happened: at least one doc drew the partial epoch
    assert(rows.length > docCount, "no partial-epoch rows drawn")
  }

  test("q48 returns exactly 20 rows with non-increasing scores and the smoothed formula") {
    val rows = TextOps.queries("q48_tfidf")(spark, d).collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "scores not sorted")
    // recompute the winner's score independently from raw counts
    val top = rows.head
    val (docId, w, tf) = (top.getLong(0), top.getString(1), top.getLong(2))
    val tok = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val n = spark.read.parquet(s"$d/documents.parquet").count()
    val tfChk = tok.filter(col("doc_id") === docId && col("w") === w).count()
    val dfChk = tok.filter(col("w") === w).select("doc_id").distinct().count()
    assert(tfChk === tf)
    val expected = BigDecimal(tf * (math.log((n + 1.0) / (dfChk + 1.0)) + 1.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getDouble(3) === expected)
  }

  test("q100 mix weights: integer plan math on a planted corpus") {
    val sp = spark
    import sp.implicits._
    // token counts 100 / 400 / 2500 -> isqrt weights 10 / 20 / 50, tot 80
    val docs = Seq(
      ("a", ("t " * 100).trim),
      ("b", ("t " * 400).trim),
      ("c", ("t " * 2500).trim)
    ).zipWithIndex.map { case ((src, text), i) => (i.toLong, src, text) }
      .toDF("doc_id", "source", "text")
    val plan = StatsOps.mixWeights(docs, budgetTokens = 1000L).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(plan("a") === ((10L, 125000L, 125L)))
    assert(plan("b") === ((20L, 250000L, 250L)))
    assert(plan("c") === ((50L, 625000L, 625L)))
    // the floor-div split never overshoots the budget
    assert(plan.values.map(_._3).sum <= 1000L)
  }

  test("q103: exactly k per stratum, deterministic, stable under growth") {
    val sp = spark
    import sp.implicits._
    val docs = (0 until 3000).map(i =>
      (i.toLong, s"src${i % 3}", s"text $i")).toDF("doc_id", "source", "text")
    val out = StatsOps.topKPerStratum(docs, 10).collect()
    assert(out.length === 30)
    assert(out.groupBy(_.getString(1)).forall(_._2.length == 10))
    // rank sequence 1..k within each stratum
    assert(out.groupBy(_.getString(1)).values.forall(
      _.map(_.getLong(2)).sorted.toSeq == (1L to 10L)))
    // growth stability: adding docs can only DISPLACE members (smaller
    // hashes arriving), never reshuffle survivors' relative order
    val grown = (0 until 6000).map(i =>
      (i.toLong, s"src${i % 3}", s"text $i")).toDF("doc_id", "source", "text")
    val small = StatsOps.topKPerStratum(docs, 10)
      .collect().map(r => ((r.getString(1), r.getLong(0)), r.getLong(2))).toMap
    val big = StatsOps.topKPerStratum(grown, 10)
      .collect().map(r => ((r.getString(1), r.getLong(0)), r.getLong(2))).toMap
    val surviving = small.keySet.intersect(big.keySet)
    assert(surviving.nonEmpty)
    // survivors keep their relative order (ranks may shift down only)
    for (k1 <- surviving; k2 <- surviving if k1._1 == k2._1) {
      assert((small(k1) < small(k2)) == (big(k1) < big(k2)) || k1 == k2)
    }
  }

  test("q103 prefiltered scale path: identical output, windowed input shrinks") {
    val sp = spark
    import sp.implicits._
    // skewed strata: one hot source with 20k rows, two cold with 200
    val docs = ((0 until 20000).map(i => (i.toLong, "hot", s"t $i")) ++
      (20000 until 20200).map(i => (i.toLong, "coldA", s"t $i")) ++
      (20200 until 20400).map(i => (i.toLong, "coldB", s"t $i")))
      .toDF("doc_id", "source", "text")
    val plain = StatsOps.topKPerStratum(docs, 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val pre = StatsOps.topKPerStratumPrefiltered(docs, 16)
    val preSet = pre.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(preSet === plain)
    pre.unpersist(blocking = true)
    // the hot stratum's prefilter keeps ~4k/n of the rows: recompute the
    // survivor bound directly (the window then sorts ~64 rows, not 20k)
    val surv = docs.withColumn("hv", expr(
      """cast(conv(substring(md5(concat('ksample:', source, ':',
           cast(doc_id as string))), 1, 8), 16, 10) as bigint)"""))
      .filter(col("source") === "hot")
      .filter(col("hv") <= lit(4L * 16 * 4294967296L / 20000L)).count()
    assert(surv < 200, s"prefilter must shrink the hot stratum (kept $surv)")
    assert(surv >= 16, "and still retain at least k rows")
  }

  test("q103 prefilter under-shoot falls back to the full stratum (exactness unconditional)") {
    val sp = spark
    import sp.implicits._
    // strata SMALLER than k: the prefilter threshold clamps at the full
    // hash space yet the survivor count still lands under k, so every
    // stratum takes the fallback union — output must equal the plain
    // path with all rows retained.
    val docs = (0 until 30).map(i =>
      (i.toLong, s"s${i % 10}", s"t $i")).toDF("doc_id", "source", "text")
    val plain = StatsOps.topKPerStratum(docs, 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val pre = StatsOps.topKPerStratumPrefiltered(docs, 5)
    val preSet = pre.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(preSet === plain)
    assert(preSet.size === 30, "strata smaller than k keep every row")
    pre.unpersist(blocking = true)
  }

  test("q114 train order is a valid permutation, balanced, and epoch-independent") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val e0 = StatsOps.trainOrder(docs, 32, 0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every doc exactly once; within each shard positions are 1..count
    assert(e0.size == docs.count())
    e0.values.groupBy(_._1).foreach { case (shard, rows) =>
      val ps = rows.map(_._2).toSeq.sorted
      assert(ps == (1L to ps.size).toSeq, s"shard $shard positions not contiguous")
    }
    // hash-uniform shards are balanced: no shard more than 3x the mean
    val sizes = e0.values.groupBy(_._1).values.map(_.size).toSeq
    assert(sizes.max <= 3 * (e0.size / 32 max 1), s"skewed shards: $sizes")
    // a different epoch salt yields a genuinely different permutation
    val e1 = StatsOps.trainOrder(docs, 32, 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(e0 != e1)
    // determinism: recompute equals (no rand(), no zipWithIndex)
    val again = StatsOps.trainOrder(docs, 32, 0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == e0)
  }
}
