package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** The staged-IVF pair past the 16-list floor regime (r14's one measured
  * scale deviation): a corpus past 65,536 vectors resolves `centroidsFor`
  * ABOVE the floor, the staged adaptive probe must equal the unstaged IVF
  * formulation at the RESOLVED list count, and the rendered oracle must
  * carry that count — the same contract [[AdaptiveWidthSpec]] pins for the
  * LSH arm's code width, now on the arm whose probe I/O previously grew
  * ∝ n (SCALE_r14 §1).
  */
class AdaptiveIvfSpec extends SparkSpec {

  // past the floor: centroidsFor(80000) = ceil(sqrt(312.5)) = 18 lists
  private lazy val bigDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_adaptive_ivf").toString
    spark.range(80000).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 63), d -> " +
        "cast(pmod(id * 31 + d * 7 + id * d, 97) / 97.0 - 0.5 AS float))")
        .as("embedding"),
      (col("id") % 8).cast("int").as("label"))
      .coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("centroidsFor leaves the floor past the 256-per-list regime") {
    assert(Similarity.centroidsFor(65536) == 16)  // 16 lists of 4096: floor
    assert(Similarity.centroidsFor(65537) == 17)  // past it: widen
    assert(Similarity.centroidsFor(80000) == 18)
    assert(Similarity.centroidsFor(2000000) == 89) // the sf10dc decade point
  }

  test("staged adaptive probe at an above-floor corpus equals the unstaged IVF at the resolved list count") {
    val kc = Similarity.centroidsFor(80000)
    assert(kc == 18)
    val staged = SimilarityQueries.ivfStagedAdaptiveTopK(spark, bigDir)
      .collect().toSeq
    val unstaged = Similarity.ivfTopK(graft.Tables.embeddings(spark, bigDir),
      queryId = 0L, k = 10, centroidsNOpt = Some(kc)).collect().toSeq
    assert(staged.nonEmpty && staged == unstaged)
    // the dumped oracle renders the SAME list count the query resolved
    val sql = SimilarityQueries.oracle(bigDir)("sim_ivf_staged_adaptive")
    assert(sql.contains(s"WHERE vec_id < $kc"),
      s"oracle must render at the resolved $kc-list count:\n$sql")
  }

  test("oracle list count is keyed per dir: a floor-scale dir renders 16 even after a wider dir resolved") {
    val staged = SimilarityQueries.ivfStagedAdaptiveTopK(spark, sf0001)
      .collect().toSeq
    assert(staged.nonEmpty)
    val sql = SimilarityQueries.oracle(sf0001)("sim_ivf_staged_adaptive")
    assert(sql.contains(s"WHERE vec_id < ${Similarity.ivfCentroids}"),
      s"oracle must render the 16-list floor for the floor-regime dir:\n$sql")
    val wide = SimilarityQueries.oracle(bigDir)("sim_ivf_staged_adaptive")
    assert(wide.contains("WHERE vec_id < 18"),
      s"the wider dir must keep its 18-list render:\n$wide")
  }

  test("oracle render is order-independent: an unresolved above-floor dir " +
    "resolves from the corpus, not the floor (r16 ADVICE)") {
    // a COPY of the wide corpus under a path no query has touched in this
    // JVM: rendering its oracle FIRST must compute 18 from the corpus
    // itself instead of defaulting to the 16 floor
    val fresh = java.nio.file.Files.createTempDirectory("graft_adaptive_fresh").toString
    spark.read.parquet(s"$bigDir/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$fresh/embeddings.parquet")
    val sql = SimilarityQueries.oracle(fresh)("sim_ivf_staged_adaptive")
    assert(sql.contains("WHERE vec_id < 18"),
      s"pre-run oracle render must resolve the corpus's 18 lists:\n$sql")
  }

  test("above the floor the staged IVF-PQ arm equals the unstaged composition (routed on both sides)") {
    val staged = SimilarityQueries.ivfPqStagedTopK(spark, bigDir).collect().toSeq
    val emb = graft.Tables.embeddings(spark, bigDir)
    val unstaged = Similarity.ivfPqTopK(emb, queryId = 0L, k = 10,
      nOpt = Some(80000L)).collect().toSeq
    assert(staged.nonEmpty && staged == unstaged)
  }

  test("at the floor the adaptive arm and the fixed staged arm answer identically") {
    val adaptive = SimilarityQueries.ivfStagedAdaptiveTopK(spark, sf0001)
      .collect().toSeq
    val fixed = SimilarityQueries.ivfStagedTopK(spark, sf0001).collect().toSeq
    assert(adaptive == fixed)
  }
}
