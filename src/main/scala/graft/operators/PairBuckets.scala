package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared bucket-pair candidate stage for the LSH family (q44/q62's
  * sign-LSH buckets, q105/q106's perceptual-hash bands): distinct
  * `(ia < ib)` id pairs co-bucketed on the key columns.
  *
  * SIZE-ADAPTIVE hot-bucket split (r13, the r12 verdict's #4): the r12
  * shape block-split EVERY bucket into B(B+1)/2 chunks — correct, but it
  * taxed the common case with ~(B+1)/2× row replication (≈4.5× at 32
  * cores) whether or not any bucket was hot, purely to survive the
  * degenerate corpus where one bucket holds everything. Now a window
  * count sizes every bucket first and the block count is chosen PER ROW:
  * buckets at or under [[hotBucketBar]] get block count 1 — for them the
  * machinery algebraically degenerates to the plain (keys) equi-join
  * (blk = 0, both explodes emit the single chunk (0, 0), the same-block
  * `ia < ib` filter keeps one orientation) — while buckets past the bar
  * get the full 1-Bucket-Theta treatment: block ids in [0, B), each side
  * replicated over its block-pair range, cross-block pairs once with
  * roles fixed by block order, same-block pairs deduped by id order,
  * least/greatest restoring canonical orientation. ONE join, no
  * cold/hot branch union — the adaptivity is a column expression, so the
  * plan is identical on every corpus (the plan-shape pins hold
  * unconditionally) and only the DATA decides who pays replication.
  * Candidate-set equality with the plain self-join is pinned by
  * PairPlanSpec on mixed and degenerate corpora; the trailing distinct
  * collapses pairs co-bucketed under several keys.
  *
  * Both join sides carry an explicit `repartition(nPar, keys, ba, bb)` —
  * the stage is COMPUTE-bound on byte-tiny rows, which defeats size-based
  * scheduling: AQE's advisory-size coalescing would fuse it into a few
  * tasks (measured at 20×: 8 tasks of ~34 s on a 32-core box). An
  * explicit numbered repartition is exempt from AQE re-coalescing.
  *
  * Scale shape at 100 TB: the sizing is one window count over a (keys)
  * exchange of the tiny signature rows — linear, no extra corpus pass, no
  * driver-side collection — so an adversarial corpus with millions of hot
  * buckets costs exactly one shuffle of the signature rows, never a
  * broadcast overflow. The expensive signature lineage sits under ONE
  * canonical exchange that both join sides reuse.
  */
private[operators] object PairBuckets {

  /** Bucket size above which the bucket's pair space is block-split. A
    * bucket of exactly this size generates bar·(bar−1)/2 ≈ 0.1M
    * comparisons in one task — well inside one task's second-scale
    * budget — while the split's replication only engages where a bucket
    * alone would wall the stage (the degenerate one-hash corpus: all
    * bands collide, n(n−1)/2 pairs in ONE task without the split).
    *
    * Lowered 1024 → 448 with the size-PROPORTIONAL block count (r16):
    * at 1024 with an all-or-nothing split, a clustered corpus whose
    * buckets land just UNDER the bar (the auto band knob actively
    * steers occupancy toward a constant, so "many near-bar buckets" is
    * the steady state it converges to) stacked several unsplit ~0.5M-
    * comparison blocks into single hash partitions — a reproducing
    * in-stage straggler of 13–15× the median on the 10× embeddings
    * smoke that no retry can launder. Proportional bn keeps the
    * replication tax ∝ bucket_n/target (buckets at 2× the bar pay ~2
    * chunks, not B), so lowering the bar no longer costs the
    * just-over-bar buckets the full B(B+1)/2 fan-out the r13 comment
    * priced.
    */
  val hotBucketBar = 448L

  /** Target same-block chunk edge for split buckets: bn ≈ bucket_n /
    * this, so any single chunk's comparison count is bounded by
    * ~target² (≈0.1M at 320) however large the bucket — the knob that
    * makes task time uniform across the whole bucket-size distribution
    * instead of bimodal at the bar.
    */
  val hotBucketTargetBlock = 320L

  /** Distinct co-bucketed (ia < ib) pairs over a `(keys…, idCol, carry…)`
    * signature frame. Each `carry` column (functionally dependent on
    * `idCol`, byte-small — a 64-bit hash, never a vector) is emitted
    * twice as `<c>_a`/`<c>_b` alongside `ia`/`ib`: carrying the verify
    * key through the pipeline makes the downstream exact check ROW-LOCAL
    * and removes the two join-backs (and their exchanges, and their
    * re-execution of the possibly expensive id→payload lineage) that a
    * bare (ia, ib) candidate set forces.
    */
  def candidatePairs(sigs: DataFrame, keys: Seq[String], idCol: String,
      carry: Seq[String] = Nil, bar: Long = hotBucketBar): DataFrame = {
    val s = sigs.sparkSession
    // Stage width = the session's reducer config (r16, second cut): the
    // first cut hard-coded 4 waves per core for the smoke's multi-wave
    // schedule (max_task ≈ wall at one wave — the dominance-gate shape),
    // but that taxed the sf-scale bench ~1–2 s per pair stage in pure
    // task scheduling (three 128-partition exchanges of kilobyte rows).
    // The smoke session sets shuffle.partitions = 4 × cores, so its
    // multi-wave width is preserved; the bench (= cores) and a production
    // deployment each get their own configured width. The block count B
    // scales with it, so a hot bucket's B(B+1)/2 chunks still cover the
    // partition count.
    val nPar = graft.util.Tables.fanWidth(s)
    val kc = keys.map(col)
    val aCols = (idCol +: carry).map(c => col(c).as(if (c == idCol) "ia" else s"${c}_a"))
    val bCols = (idCol +: carry).map(c => col(c).as(if (c == idCol) "ib" else s"${c}_b"))
    // bucket sizing via a WINDOW count, not a groupBy + join-back: the
    // join-back shape puts the signature lineage under TWO distinct
    // exchange subtrees (the join's and the aggregation's), so an
    // expensive sig computation executes twice; the window keeps ONE
    // canonical `Exchange(keys)` leaf that both join sides reuse — the
    // heavy lineage runs once. The per-partition count is linear even on
    // a degenerate one-bucket corpus.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(kc: _*)
    val B = math.max(1, math.ceil(math.sqrt(2.0 * nPar)).toInt)
    // block count PER ROW, proportional to bucket size (r16): bn ≈
    // bucket_n / targetBlock bounds any one chunk's comparisons at
    // ~target² while keeping replication ∝ bn (a bucket pays for its own
    // size, never the degenerate-case B). The cap at B preserves the
    // worst-case chunk count ≤ B(B+1)/2 ≈ the partition count.
    val blocked = sigs
      .withColumn("bucket_n", count(lit(1)).over(w))
      .withColumn("bn", when(col("bucket_n") > bar,
          least(lit(B.toLong),
            ceil(col("bucket_n") / lit(hotBucketTargetBlock.toDouble)).cast("long")))
        .otherwise(lit(1L)))
      .withColumn("blk", pmod(hash(col(idCol)), col("bn")))
    val splitKeys = kc :+ col("ba") :+ col("bb")
    val aSide = blocked
      .withColumn("bb", explode(expr("sequence(blk, bn - 1)")))
      .select(kc ++ Seq(col("blk").as("ba"), col("bb")) ++ aCols: _*)
      .repartition(nPar, splitKeys: _*)
    val bSide = blocked
      .withColumn("ba", explode(expr("sequence(0, blk)")))
      .select(kc ++ Seq(col("ba"), col("blk").as("bb")) ++ bCols: _*)
      .repartition(nPar, splitKeys: _*)
    // canonical (ia < ib) orientation must swap the carried payload WITH
    // its id: struct comparison orders by the leading id field (ids are
    // distinct after the self-pair filter), so least/greatest over the
    // (id, payload…) structs swaps atomically
    val pa = struct(col("ia").as("id") +: carry.map(c => col(s"${c}_a").as(c)): _*)
    val pb = struct(col("ib").as("id") +: carry.map(c => col(s"${c}_b").as(c)): _*)
    aSide.join(bSide, keys ++ Seq("ba", "bb"))
      .filter(col("ba") =!= col("bb") || col("ia") < col("ib"))
      .select(least(pa, pb).as("lo"), greatest(pa, pb).as("hi"))
      .select(Seq(col("lo.id").as("ia"), col("hi.id").as("ib")) ++
        carry.flatMap(c => Seq(col(s"lo.$c").as(s"${c}_a"),
          col(s"hi.$c").as(s"${c}_b"))): _*)
      .distinct()
  }
}
