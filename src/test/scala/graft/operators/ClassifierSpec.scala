package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** In-engine quality-classifier training (r10 verdict #5): epoch-1
  * closed-form determinism, multi-epoch separation on a planted good/bad
  * corpus with held-out docs, and the q81 serving plumbing consuming the
  * trained weight table.
  */
class ClassifierSpec extends SparkSpec {

  // planted corpus: "good" docs draw from one vocabulary, "bad" from
  // another, with a shared neutral filler — hash buckets of the class
  // vocabularies carry the signal
  private def planted(n: Int): Seq[(Long, String, Long)] = {
    val good = Vector("insight", "method", "result", "evidence", "analysis")
    val bad = Vector("spamspam", "clickbait", "lorem", "zzzz", "buynow")
    val fill = Vector("the", "a", "of", "and")
    (0 until n).map { i =>
      val y = i % 2
      val vocab = if (y == 1) good else bad
      // deterministic word choice — no RNG, the same corpus every run
      val words = (0 until 30).map(j =>
        if (j % 3 == 0) fill((i + j) % fill.length)
        else vocab((i * 7 + j) % vocab.length))
      (i.toLong, words.mkString(" "), y.toLong)
    }
  }

  test("epoch-1 weights equal the closed-form integer device (determinism pin)") {
    val sp = spark
    import sp.implicits._
    val docs = planted(40).map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    // labels via the gopher gate, exactly as q97 derives them
    val labels = docs.select(col("doc_id"),
      when(TextOps.gopherKeepCol(col("text")), 1L).otherwise(0L).as("y"))
    val feats = ClassifierOps.hashedFeatures(docs)
    // independent recompute: w1[b] = occurrences in keep docs − in drop docs
    val yMap = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = feats.collect()
      .groupBy(_.getLong(1))
      .map { case (b, rows) =>
        b -> rows.map(r => (yMap(r.getLong(0)) * 2 - 1) * r.getLong(2)).sum
      }
    val w1 = feats.join(labels, "doc_id")
      .groupBy("bucket").agg(sum((col("y") * 2 - 1) * col("c")).as("w1"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1 === expected)
  }

  test("multi-epoch logistic training separates held-out planted docs; q81 plumbing serves the weights") {
    val sp = spark
    import sp.implicits._
    val all = planted(60)
    val train = all.filter(_._1 < 48)
    val holdout = all.filter(_._1 >= 48)
    val trainDocs = train.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val trainLabels = train.map { case (id, _, y) => (id, y) }.toDF("doc_id", "y")
    val weights = ClassifierOps.trainLogistic(
      ClassifierOps.hashedFeatures(trainDocs), trainLabels, epochs = 5, lr = 0.1)
    val holdDocs = holdout.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
    val scored = ClassifierOps.scoreWithWeights(holdDocs, weights)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val yOf = holdout.map { case (id, _, y) => id -> y }.toMap
    // full separation: every held-out good doc scores above every bad one
    val goodScores = scored.collect { case (id, (s, _)) if yOf(id) == 1 => s }
    val badScores = scored.collect { case (id, (s, _)) if yOf(id) == 0 => s }
    assert(goodScores.nonEmpty && badScores.nonEmpty)
    assert(goodScores.min > badScores.max,
      s"held-out classes must separate: good min ${goodScores.min} vs bad max ${badScores.max}")
    // and the keep decision follows the label on every held-out doc
    assert(scored.forall { case (id, (_, keep)) => keep == yOf(id) })
  }

  test("q97 output shape: every document reported, scores integer-exact vs a recompute") {
    val sp = spark
    import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_q97")
    planted(30).map { case (id, t, _) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp.resolve("documents.parquet").toString)
    val out = ClassifierOps.queries("q97_train_quality")(sp, tmp.toString)
    val rows = out.collect()
    assert(rows.length === 30, "every doc must appear, scored or not")
    // pred_keep is exactly (score1 > 0)
    assert(rows.forall(r => r.getLong(3) == (if (r.getLong(2) > 0) 1L else 0L)))
    out.unpersist(blocking = true)
    sp.catalog.clearCache()
  }

  test("q102 histogram AUC equals the brute-force tied-pair count") {
    val sp = spark
    import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_q102")
    // planted() docs are all 30 tokens — the Gopher length gate (>=50)
    // would label every one 0 and AUC would be undefined. Build a corpus
    // where the gate VARIES: even ids are 60-token gate-passing docs from
    // one vocabulary, odd ids 30-token gate-failing docs from another, so
    // the labels split and the hashed features carry the signal.
    val good = Vector("insight", "method", "result", "evidence", "analysis")
    val bad = Vector("spamspam", "clickbait", "lorem", "zzzz", "buynow")
    val fill = Vector("the", "a", "of", "and")
    val docs102 = (0 until 120).map { i =>
      val keepClass = i % 2 == 0
      val vocab = if (keepClass) good else bad
      val len = if (keepClass) 60 else 30
      val words = (0 until len).map(j =>
        if (j % 3 == 0) fill((i + j) % fill.length)
        else vocab((i * 7 + j) % vocab.length))
      (i.toLong, words.mkString(" "))
    }
    docs102.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp.resolve("documents.parquet").toString)
    val out = ClassifierOps.queries("q102_auc_eval")(sp, tmp.toString)
    val row = out.collect().head
    val (nEval, nPos, nNeg, u2) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(nEval === nPos + nNeg)
    assert(nPos > 0 && nNeg > 0, "fixture must land both classes in eval")
    // brute-force recompute on the SAME held-out frame: U2 counts each
    // (pos, neg) pair twice for a win, once for a tie
    val docs = sp.read.parquet(tmp.resolve("documents.parquet").toString)
    val split = docs.select(col("doc_id"),
      when(TextOps.gopherKeepCol(col("text")), 1L).otherwise(0L).as("y"),
      (substring(md5(concat(lit("auc:"), col("doc_id").cast("string"))), 1, 8)
        < "cccccccc").as("is_train"))
    val feats = ClassifierOps.hashedFeatures(docs)
    val w1 = feats.join(split.filter(col("is_train")).select("doc_id", "y"), "doc_id")
      .groupBy("bucket").agg(sum((col("y") * 2 - 1) * col("c")).as("w1"))
    val sMap = feats.join(broadcast(w1), "bucket")
      .groupBy("doc_id").agg(sum(col("c") * col("w1")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = split.filter(!col("is_train")).collect()
      .map(r => (r.getLong(1), sMap.getOrElse(r.getLong(0), 0L)))
    val pos = ev.collect { case (1L, s) => s }
    val neg = ev.collect { case (0L, s) => s }
    val u2Brute = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(nPos === pos.length.toLong && nNeg === neg.length.toLong)
    assert(u2 === u2Brute, s"histogram U2 $u2 vs brute-force $u2Brute")
    // the planted corpus separates, so AUC must be high but is NOT
    // degenerate-by-construction — pin the exact integer-device rendering
    val auc = row.getDouble(4)
    assert(auc === ((2 * u2 * 1000000L + 2 * nPos * nNeg) / (2 * 2 * nPos * nNeg))
      / 1000000.0)
    out.unpersist(blocking = true)
    sp.catalog.clearCache()
  }

  test("q102 prefix-sum windows are range-partitioned (no single-task histogram sort)") {
    // r11 watch item closed in r12: distinct integer scores grow with the
    // eval split (up to n_eval values), so the histogram cumsum must never
    // plan WindowExec over Exchange SinglePartition. aucEval materializes
    // internally — capture every executed plan during the call and assert
    // each Window sits on hash-partitioned input (the partitionBy(r)
    // within-range pass); the cross-range carry is a driver-side prefix of
    // <=1,024 per-range totals broadcast back, so no unpartitioned ordered
    // window exists anywhere in the operator.
    val captured = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        captured.synchronized { captured += qe.executedPlan.toString }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = ClassifierOps.queries("q102_auc_eval")(spark, "/root/testdata/sf0.001")
      out.unpersist(blocking = true)
      org.apache.spark.GraftListenerDrain.drain(spark.sparkContext)
      val plans = captured.synchronized(captured.toSeq)
      // a Window prints above its input chain (Sort → Exchange/…); the
      // FIRST exchange line below it is the window's input distribution —
      // walk the string because AQE wraps the tree in stage nodes that
      // generic node-collect does not descend through
      var nWindows = 0
      for (p <- plans; lines = p.linesIterator.toVector;
           i <- lines.indices if lines(i).contains("Window ")) {
        nWindows += 1
        val ex = lines.drop(i + 1).find(_.contains("Exchange"))
        ex.foreach { l =>
          assert(!l.contains("SinglePartition"),
            s"q102 window fed by $l — the single-task histogram sort is back")
          assert(l.contains("hashpartitioning"),
            s"q102 window fed by $l — expected hashpartitioning(r, …)")
        }
      }
      assert(nWindows > 0, "q102's materialization shows no Window operator")
    } finally {
      spark.listenerManager.unregister(listener)
      spark.catalog.clearCache()
    }
  }

  test("q131 calibration bins: partition the held-out set, ordered scores, sane rates") {
    val sp = spark
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val docs = sp.read.parquet(s"$d/documents.parquet")
    val nEval = docs.filter(
      substring(md5(concat(lit("auc:"), col("doc_id").cast("string"))), 1, 8)
        >= "cccccccc").count()
    val rows = ClassifierOps.calibrationBins(docs).collect()
    assert(rows.map(_.getLong(1)).sum === nEval, "bins must partition the eval split")
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 9))
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // fixed-width bins are order-preserving: mean scores ascend with bin id
    val means = rows.sortBy(_.getLong(0)).map(_.getDouble(4))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b },
      s"bin mean scores not monotone: ${means.mkString(", ")}")
    sp.catalog.clearCache()
  }
}
