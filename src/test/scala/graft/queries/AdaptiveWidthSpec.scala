package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** The staged-ANN pair past the 8-plane floor regime (r8's "what's
  * missing"): a 20k-vector corpus resolves `planesFor` ABOVE the floor,
  * the staged probe must still equal the unstaged Hamming-≤1 formulation
  * at the RESOLVED width, and the rendered oracle must carry that width —
  * the contract that lets the pair rehearse at any scale factor instead of
  * refusing past the floor.
  */
class AdaptiveWidthSpec extends SparkSpec {

  private lazy val bigDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_adaptive_emb").toString
    spark.range(20000).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "cast(pmod(id * 31 + d * 7 + id * d, 97) / 97.0 - 0.5 AS float))")
        .as("embedding"),
      (col("id") % 8).cast("int").as("label"))
      .coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planesFor leaves the floor past the target-occupancy regime") {
    // buckets = n div 64; widen once ceil(log2(buckets)) exceeds the floor
    assert(Similarity.planesFor(16447, 8) == 8)   // 256 buckets: still floor
    assert(Similarity.planesFor(16448, 8) == 9)   // 257 buckets: widen
    assert(Similarity.planesFor(20000, 8) == 9)   // the sf1 embeddings size
  }

  test("staged LSH probe at an above-floor corpus equals the unstaged formulation at the resolved width") {
    val planes = Similarity.planesFor(20000, 8)
    assert(planes == 9)
    val staged = SimilarityQueries.lshStagedTopK(spark, bigDir).collect().toSeq
    val coded = Similarity.withLshCode(
      graft.Tables.embeddings(spark, bigDir), "embedding", planes)
    val unstaged = coded.crossJoin(broadcast(coded.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("lsh_code").as("qcode"))))
      .filter(expr("bit_count(lsh_code ^ qcode)") <= 1)
      .select(col("vec_id"),
        round(graft.functions.VectorOps.cosine(col("embedding"), col("qe")), 6)
          .as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id")).limit(10).collect().toSeq
    assert(staged.nonEmpty && staged == unstaged)
    // the dumped oracle renders the SAME width the query resolved — this is
    // what Verify writes to oracle_sql.json after running the suite
    val sql = SimilarityQueries.oracle(bigDir)("sim_lsh_staged")
    assert(sql.contains(Similarity.lshCodeSql("embedding", planes)),
      s"oracle must render at the resolved $planes-plane width:\n$sql")
  }

  test("oracle width is keyed per dir: a floor-scale dir renders the floor even after a wider dir resolved") {
    val staged = SimilarityQueries.lshStagedTopK(spark, sf0001).collect().toSeq
    assert(staged.nonEmpty)
    val sql = SimilarityQueries.oracle(sf0001)("sim_lsh_staged")
    assert(sql.contains(Similarity.lshCodeSql("embedding", 8)),
      s"oracle must render the 8-plane floor for the floor-regime dir:\n$sql")
    // and the wide dir's render is NOT clobbered by the sf0001 run (the r9
    // last-write-wins defect this round fixed)
    val wide = SimilarityQueries.oracle(bigDir)("sim_lsh_staged")
    assert(wide.contains(Similarity.lshCodeSql("embedding", 9)),
      s"the wider dir must keep its 9-plane render:\n$wide")
  }
}
