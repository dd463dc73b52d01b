package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected-components clustering (q45): the alternating star algorithm
  * must agree exactly with a driver-side union-find on arbitrary graphs,
  * converge logarithmically on the adversarial chain (where min-label
  * propagation would need O(n) rounds), and stay row-shaped on a hot hub.
  */
class GraphOpsSpec extends SparkSpec {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root every node at its component minimum
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min
      ns.map(_ -> m)
    }
  }

  /** localThreshold = 0 forces the distributed star path; the default
    * exercises the adaptive local union-find path.
    */
  private def ccOf(edges: Seq[(Long, Long)], localThreshold: Long): Map[Long, Long] = {
    import spark.implicits._
    val res = GraphOps.connectedComponents(edges.toDF("u", "v"), localThreshold)
    val out = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    res.unpersist(blocking = true)
    out
  }

  test("both paths match driver-side union-find on seeded random graphs across densities") {
    val rnd = new scala.util.Random(42)
    // (nodes, edges): forest-sparse, sub-critical, near the giant-component
    // threshold (m ≈ n/2), super-critical, dense
    val shapes = Seq((400, 80), (300, 140), (300, 160), (300, 450), (120, 900))
    for (((n, m), trial) <- shapes.zipWithIndex) {
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(edges)
      assert(ccOf(edges, localThreshold = 0) === expected,
        s"distributed star path, trial $trial (n=$n m=$m)")
      assert(ccOf(edges, GraphOps.localCcMaxEdges) === expected,
        s"local path, trial $trial (n=$n m=$m)")
    }
  }

  test("adversarial chain (diameter n) collapses to one cluster in log rounds") {
    // 0-1-2-...-999: min-label propagation needs ~1000 rounds; the star
    // algorithm must finish well inside the 50-round guard (it throws on
    // non-convergence, so passing IS the round-count assertion); threshold
    // 0 forces the distributed path — the whole point of this test
    val edges = (0L until 999L).map(i => (i, i + 1))
    val got = ccOf(edges, localThreshold = 0)
    assert(got.size === 1000)
    assert(got.values.forall(_ == 0L))
  }

  test("hot hub stays row-shaped: no neighbor arrays, exact star output") {
    val leaves = 20000L
    val edges = spark.range(1, leaves + 1)
      .select(lit(0L).as("u"), col("id").as("v"))
    // plan-shape assertion on the LAZY per-round frames — the returned
    // labels frame collapses to LogicalRDD scans, which would make this
    // assertion vacuous (it could never contain the round's joins)
    for (roundPlan <- Seq(GraphOps.largeStar(edges),
        GraphOps.smallStar(edges))) {
      val p = roundPlan.queryExecution.executedPlan.toString
      assert(!p.contains("collect_list") && !p.contains("collect_set"),
        "a star round rebuilt a neighbor array")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    }
    val res = GraphOps.connectedComponents(edges, localThreshold = 0)
    assert(res.count() === leaves + 1)
    assert(res.filter(col("cluster_id") =!= 0L).count() === 0)
    res.unpersist(blocking = true)
  }

  test("local union-find survives a 150k-edge descending path (iterative find, no stack overflow)") {
    // a path graph fed root-last builds an O(n) parent chain that nothing
    // compresses until the labeling pass — the recursive find blew the
    // driver stack exactly here; the iterative one must label the whole
    // chain to its minimum
    val n = 150000L
    val edges = (n to 1L by -1L).map(i => (i - 1, i)).toArray
    val labels = GraphOps.localUnionFind(edges)
    assert(labels.size === n + 1)
    assert(labels.values.forall(_ == 0L), "chain not labeled to its minimum")
  }

  test("duplicate, reversed and self-loop edges are tolerated on both paths") {
    val edges = Seq((5L, 3L), (3L, 5L), (5L, 5L), (3L, 5L), (7L, 9L))
    val expected = Map(3L -> 3L, 5L -> 3L, 7L -> 7L, 9L -> 7L)
    assert(ccOf(edges, localThreshold = 0) === expected)
    assert(ccOf(edges, GraphOps.localCcMaxEdges) === expected)
  }

  test("integer-typed edges are accepted and labeled as BIGINT") {
    import spark.implicits._
    val res = GraphOps.connectedComponents(
      Seq((1, 2), (2, 3), (9, 8)).toDF("u", "v"))
    assert(res.schema.fields.forall(_.dataType ===
      org.apache.spark.sql.types.LongType))
    val got = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 8L, 9L -> 8L))
    res.unpersist(blocking = true)
  }

  test("q45 assigns singletons their own cluster and near-dups a shared one") {
    val d = "/root/testdata/sf0.001"
    val res = SparkEntry_q45(d)
    val docs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(res.count() === docs, "one row per document")
    // the planted near-dup pairs (q35's candidates) must share clusters:
    // every candidate pair's two docs map to the same cluster_id
    val cand = DedupOps.queries("q35_minhash_lsh")(spark, d)
    val byDoc = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cand.collect().foreach { r =>
      assert(byDoc(r.getLong(0)) === byDoc(r.getLong(1)),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) split across clusters")
    }
    cand.unpersist(blocking = true)
    res.unpersist(blocking = true)
    spark.catalog.clearCache()
  }

  test("q62 assigns embedding singletons their own cluster and q44 pairs a shared one") {
    val d = "/root/testdata/sf0.001"
    val res = GraphOps.queries("q62_embedding_clusters")(spark, d)
    val vecs = spark.read.parquet(s"$d/embeddings.parquet").count()
    assert(res.count() === vecs, "one row per embedding")
    val byVec = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SimilarityOps.queries("q44_rp_lsh_neardup")(spark, d).collect()
    pairs.foreach { r =>
      assert(byVec(r.getLong(0)) === byVec(r.getLong(1)),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) split across clusters")
    }
    // vectors in no pair label themselves
    val paired = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    byVec.foreach { case (v, c) =>
      if (!paired.contains(v)) assert(c === v, s"singleton $v mislabeled $c")
    }
    res.unpersist(blocking = true)
    spark.catalog.clearCache()
  }

  test("q65 picks each cluster's highest-quality member and counts cover the corpus") {
    val d = "/root/testdata/sf0.001"
    val reps = GraphOps.queries("q65_cluster_reps")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val clusters = GraphOps.queries("q45_dedup_clusters")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val scores = TextOps.queries("q38_quality_score")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val members = clusters.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(reps.length === members.size, "one rep per cluster")
    assert(reps.map(_._4).sum === clusters.length, "member counts cover the corpus")
    reps.foreach { case (cid, repId, repScore, n) =>
      val ms = members(cid)
      assert(n === ms.length, s"cluster $cid member count")
      assert(ms.contains(repId), s"rep $repId not in cluster $cid")
      val best = ms.map(m => (-scores(m), m)).min
      assert(repId === best._2, s"cluster $cid rep should be ${best._2}, got $repId")
      assert(repScore === scores(repId), s"cluster $cid rep score")
    }
    spark.catalog.clearCache()
  }

  test("q73 disposition: kept set is exactly the q65 reps, statuses justified") {
    val d = "/root/testdata/sf0.01"
    val disp = GraphOps.queries("q73_dedup_disposition")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val clusters = SparkEntry_q45(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reps = GraphOps.queries("q65_cluster_reps")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // cluster_id -> rep_id
    assert(disp.length === clusters.size, "one disposition row per document")
    // kept == the q65 representative set, and kept_id is always the
    // document's own cluster's representative
    val kept = disp.collect { case (id, "kept", _) => id }.toSet
    assert(kept === reps.values.toSet, "kept set != q65 reps")
    disp.foreach { case (id, status, keptId) =>
      assert(keptId === reps(clusters(id)), s"doc $id kept_id")
      assert((status == "kept") === (id == keptId), s"doc $id status/kept_id")
    }
    // every exact_dup has a normalized-identical twin with a smaller id;
    // no near_dup or kept doc does
    val norm = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.replaceAll("[^a-z0-9 ]", ""))
    val minByNorm = norm.groupBy(_._2).map { case (t, ds) => t -> ds.map(_._1).min }
    val normOf = norm.toMap
    disp.foreach { case (id, status, _) =>
      val isExact = minByNorm(normOf(id)) != id
      assert((status == "exact_dup") === isExact, s"doc $id: $status vs exact=$isExact")
    }
    // the fixture has no normalized-identical twins (probed), so the two
    // statuses it CAN produce must both occur; exact_dup is exercised by
    // the planted test below
    val byStatus = disp.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStatus.keySet === Set("kept", "near_dup"),
      s"statuses seen: $byStatus")
    spark.catalog.clearCache()
  }

  test("q73 planted exact duplicates: twin with larger id is exact_dup, rep is never one") {
    val sp = spark
    import sp.implicits._
    // docs 1 and 3 are byte-identical; 2 differs only in punctuation (same
    // normalized form — still an exact dup); 4 is a near-dup cluster-mate
    // with a longer (higher-quality) text; 5 is a singleton
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      1L -> s"alpha beta gamma $long",
      2L -> s"alpha, beta. gamma! $long",
      3L -> s"alpha beta gamma $long",
      4L -> s"alpha beta gamma delta epsilon zeta $long $long",
      5L -> "solo doc nothing shared").toDF("doc_id", "text")
    val clusters = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L)
      .toDF("doc_id", "cluster_id")
    val out = GraphOps.dedupDisposition(docs, clusters).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // doc 4 has the most tokens -> highest quality score -> cluster rep
    assert(out(4L) === (("kept", 4L)))
    assert(out(5L) === (("kept", 5L)))
    // doc 1 is the fingerprint keeper of the {1,2,3} twin group but loses
    // the cluster to doc 4 -> near_dup; 2 and 3 are exact_dups of doc 1
    assert(out(1L) === (("near_dup", 4L)))
    assert(out(2L) === (("exact_dup", 4L)))
    assert(out(3L) === (("exact_dup", 4L)))
  }

  test("q117 leak-free split: clusters never straddle a split, assignment is the pinned hash") {
    val d = "/root/testdata/sf0.001"
    val split = GraphOps.queries("q117_leakfree_split")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val docs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(split.length === docs, "one row per document")
    // the leak-free property: every cluster is entirely on one side —
    // in particular every q35 near-dup candidate pair shares a split
    split.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"cluster $cid straddles splits: ${members.map(_._3).distinct}")
    }
    val byDoc = split.map(t => t._1 -> t._3).toMap
    val cand = DedupOps.queries("q35_minhash_lsh")(spark, d)
    cand.collect().foreach { r =>
      assert(byDoc(r.getLong(0)) === byDoc(r.getLong(1)),
        s"near-dup pair (${r.getLong(0)}, ${r.getLong(1)}) leaked across splits")
    }
    cand.unpersist(blocking = true)
    // assignment is exactly the salted md5 threshold (engine-pinned), and
    // the 90/5/5 geometry shows up at fixture scale (every split non-empty)
    def expected(cid: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"leaksplit:$cid".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      if (h < "e6666666") "train" else if (h < "f3333333") "val" else "test"
    }
    split.foreach { case (id, cid, sp) =>
      assert(sp === expected(cid), s"doc $id cluster $cid")
    }
    val frac = split.groupBy(_._3).view.mapValues(_.length.toDouble / split.length).toMap
    assert(frac("train") > 0.8 && frac("train") < 0.97, s"train fraction $frac")
    assert(frac.getOrElse("val", 0.0) > 0 && frac.getOrElse("test", 0.0) > 0, s"fractions $frac")
    spark.catalog.clearCache()
  }

  private def SparkEntry_q45(d: String) =
    GraphOps.queries("q45_dedup_clusters")(spark, d)

  test("q130 cluster weights: unit cluster mass, singleton weight 1.0, reconciles with q45") {
    val sp = spark
    val d = "/root/testdata/sf0.001"
    val clusters = graft.SparkEntry.queries("q45_dedup_clusters")(sp, d)
    val byDoc = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    clusters.unpersist(blocking = true)
    val out = graft.SparkEntry.queries("q130_cluster_weights")(sp, d)
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSet === byDoc.keySet)
    val sizes = byDoc.values.groupBy(identity).view.mapValues(_.size).toMap
    for (r <- rows) {
      assert(r.getLong(1) === byDoc(r.getLong(0)), "cluster label drifted from q45")
      assert(r.getLong(2) === sizes(r.getLong(1)).toLong)
      assert(math.abs(r.getDouble(3) - 1.0 / r.getLong(2)) < 1e-6)
    }
    // every cluster contributes unit total mass (to rounding)
    rows.groupBy(_.getLong(1)).foreach { case (c, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-4, s"cluster $c mass")
    }
    assert(rows.exists(_.getLong(2) > 1L), "fixture must have a real dup cluster")
    out.unpersist(blocking = true)
    sp.catalog.clearCache()
  }

  test("q132 dedup impact: reconciles with q130 weights and raw token counts") {
    val sp = spark
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val w = graft.SparkEntry.queries("q130_cluster_weights")(sp, d)
    val weights = w.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    w.unpersist(blocking = true)
    val toks = sp.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val out = graft.SparkEntry.queries("q132_dedup_impact")(sp, d)
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val bySrc = toks.groupBy(_._2)
    assert(rows.keySet === bySrc.keySet)
    for ((src, ds) <- bySrc) {
      val (nDocs, nToks, effDocs, effToks, frac) = rows(src)
      assert(nDocs === ds.size.toLong)
      assert(nToks === ds.map(_._3).sum)
      assert(math.abs(effDocs - ds.map(t => weights(t._1)).sum) < 1e-4)
      assert(math.abs(effToks - ds.map(t => weights(t._1) * t._3).sum) < 1e-2)
      assert(math.abs(frac - (1.0 - effToks / nToks)) < 1e-6)
      assert(effDocs <= nDocs + 1e-6 && effToks <= nToks + 1e-6,
        "effective counts can never exceed raw")
    }
    out.unpersist(blocking = true)
    sp.catalog.clearCache()
  }

  test("q136 soft-dedup sample: singletons always admitted, sample is the pinned hash") {
    val sp = spark
    val d = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q136_soft_dedup_sample")(sp, d)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.forall(r => r._4 == 0L || r._4 == 1L))
    // singletons (weight 1.0) bypass the hash — always admitted
    val singletons = rows.filter(_._3 == 1.0)
    assert(singletons.nonEmpty && singletons.forall(_._4 == 1L))
    // multi-doc clusters exist and reject someone (the fixture plants
    // near-dups; a sampler admitting everyone is not sampling)
    val multi = rows.filter(_._3 < 1.0)
    assert(multi.nonEmpty && multi.exists(_._4 == 0L))
    // the admit decision IS the pinned device: recompute one hash bound
    // independently for every multi-cluster row
    multi.foreach { case (docId, _, weight, admit) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"soft:$docId".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val bound = f"${math.floor(weight * 4294967296.0).toLong}%08x"
      assert(admit === (if (h < bound) 1L else 0L),
        s"doc $docId: admit=$admit but h=$h bound=$bound")
    }
    out.unpersist(blocking = true)
    sp.catalog.clearCache()
  }
}
