package graft.operators

import graft.SparkSpec

/** Pair-generation operators must never plan an all-pairs
  * BroadcastNestedLoopJoin / CartesianProduct (the r1 plan audit's 100 TB
  * veto): q36 uses Hamming-LSH band equi-joins, q39 the 1-Bucket-Theta
  * blocked pair equi-join, q40 LSH-candidate equi-joins. Also locks the
  * equivalence proofs: banding must reproduce the all-pairs result set.
  */
class PairPlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def executedPlan(q: String): String =
    graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("q36/q39/q40/q44 plans contain no BNLJ or CartesianProduct") {
    for (q <- Seq("q36_simhash", "q39_embedding_neardup", "q40_lsh_jaccard_verified",
        "q44_rp_lsh_neardup")) {
      val p = executedPlan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BroadcastNestedLoopJoin")
      assert(!p.contains("CartesianProduct"), s"$q plans a CartesianProduct")
    }
  }

  test("q44 RP-LSH pairs are an exactly-verified subset of q39's pairs") {
    val lsh = graft.operators.SimilarityOps.queries("q44_rp_lsh_neardup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = graft.operators.SimilarityOps.queries("q39_embedding_neardup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh.nonEmpty, "LSH found no pairs — bands are misconfigured")
    assert(lsh.subsetOf(exact),
      s"LSH emitted non-verified pairs: ${lsh.diff(exact)}")
  }

  test("q39 blocked pair join equals brute-force all-pairs") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val base = spark.read.parquet(s"$d/embeddings.parquet")
      .withColumn("e", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("nrm", sqrt(expr("graft_dot(e, e)")))
    val a = base.select(col("vec_id").as("ia"), col("e").as("ea"), col("nrm").as("na"))
    val b = base.select(col("vec_id").as("ib"), col("e").as("eb"), col("nrm").as("nb"))
    val brute = a.join(b, col("ia") < col("ib"))
      .withColumn("cos", expr("graft_dot(ea, eb)") / (col("na") * col("nb")))
      .filter(col("cos") >= 0.45)
      .select(col("ia"), col("ib"), round(col("cos"), 6).as("cos"))
      .collect().map(_.toSeq).toSet
    val blocked = SimilarityOps.queries("q39_embedding_neardup")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(blocked == brute)
  }

  test("q36 Hamming-LSH banding equals brute-force all-pairs simhash") {
    // dist ≤ 2 over 4 bands of 4 bits ⇒ ≥ 2 clean bands ⇒ candidate —
    // the result sets must be identical, not merely similar
    import org.apache.spark.sql.functions._
    val banded = DedupOps.queries("q36_simhash")(spark, d).collect().map(_.toSeq).toSet
    // brute force re-derivation from the same signature definition
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h16", expr(
        """(instr('0123456789abcdef', substr(md5(w),1,1))-1)*4096 +
           (instr('0123456789abcdef', substr(md5(w),2,1))-1)*256 +
           (instr('0123456789abcdef', substr(md5(w),3,1))-1)*16 +
           (instr('0123456789abcdef', substr(md5(w),4,1))-1)"""))
    val voteAggs = (0 until 16).map(b =>
      sum(expr(s"CASE WHEN (h16 DIV ${1 << b}) % 2 = 1 THEN 1 ELSE -1 END")).as(s"v$b"))
    val votes = tok.groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
    val sim = votes.select(col("doc_id") +:
      Seq(expr((0 until 16).map(b => s"(CASE WHEN v$b > 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")).cast("long").as("simhash")): _*)
    val brute = sim.as("a").join(sim.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("dist", expr("bit_count(CAST(a.simhash AS INT) ^ CAST(b.simhash AS INT))").cast("long"))
      .filter(col("dist") <= 2)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"), col("dist"))
      .collect().map(_.toSeq).toSet
    assert(banded == brute)
  }
}
