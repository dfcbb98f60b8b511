package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorOps

/** Tie-margin measurement for the trajectory oracles (r11 verdict item 3).
  *
  * A trajectory oracle (greedy MMR, k-center, the GD classifier) amplifies a
  * single divergent rounding into a full-hash mismatch, and `round(double, n)`
  * is only engine-portable while the value sits measurably far from a scale-n
  * half boundary (Spark rounds the exact decimal expansion of the double;
  * DuckDB multiplies by 10^n first — they can disagree within ~1 ulp of the
  * boundary; the r11 driver red row on `curate_classifier` was this class).
  * The r12 fix is two-pronged:
  *
  *  - the classifier and the MMR/k-center GREEDY arithmetic are now pure
  *    scaled-integer chains (no double is ever rounded), which this spec
  *    pins with a magnitude-budget check instead of a margin; and
  *  - the one remaining rounded-double step — `round(cosine, 6)` feeding
  *    the greedy comparisons — gets its minimum tie margin MEASURED here,
  *    at the fixture SF and at the driver-gate SF.
  *
  * The failure bar: engines can only disagree on round(x, 6) when x·1e6
  * sits within ~1 ulp of a half boundary — ulp(x·1e6) ≈ 1e6·2⁻⁵² ≈ 2.2e-10
  * for |cos| ≤ 1 (Spark rounds the exact decimal expansion; DuckDB's
  * multiply-first path perturbs by at most that ulp). The spec fails below
  * 1e-7 in fractional units — ~500× that window. A fixed bar MUST sit near
  * the hazard window, not at a round number: minimum margin over N
  * uniform-ish cosines concentrates at ~0.5/N, so the measured minimum
  * legitimately shrinks with corpus size (2.4e-5 over the 4k sf0.001
  * k-center comparisons) and a 1e-3-style bar would false-positive long
  * before any real cross-engine risk appears (~5e6 comparisons before the
  * EXPECTED minimum reaches 1e-7; the k-center compare set grows as 8·N).
  */
class TieMarginSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  /** ≈500× ulp(cos·1e6): below this, a rounding flip is conceivable;
    * above it, impossible.
    */
  private val minFrac = 1e-7

  /** Distance of |v|·1e6 from its nearest scale-6 half-up boundary (.5 in
    * fractional units); a round-6 of `v` is engine-stable iff this is not
    * ~ulp-small.
    */
  private def margin6(c: Column): Column =
    abs((abs(c) * 1e6) % 1.0 - 0.5)

  private def minMargin(df: DataFrame, c: Column): Double =
    df.agg(min(margin6(c))).first().getDouble(0)

  private def emb(dir: String): DataFrame =
    graft.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))

  test("search_mmr: rounded-cosine tie margins at fixture and driver SFs clear the flip window") {
    for (dir <- Seq(sf0001, sf001)) {
      val e = emb(dir)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val rel = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(VectorOps.cosine(col("embedding"), col("qe")).as("c"),
          round(VectorOps.cosine(col("embedding"), col("qe")), 6).as("r"),
          col("vec_id"))
      val mRel = minMargin(rel, col("c"))
      // the pool the greedy actually compares: top-N by rounded rel
      val pool = rel.orderBy(desc("r"), asc("vec_id")).limit(RetrievalQueries.mmrPool)
        .join(e, Seq("vec_id")).select(col("vec_id"), col("embedding"))
        .localCheckpoint(true)
      val sims = pool.as("a")
        .crossJoin(broadcast(pool.select(col("vec_id").as("j"), col("embedding").as("ej"))))
        .filter(col("vec_id") =!= col("j"))
        .select(VectorOps.cosine(col("embedding"), col("ej")).as("c"))
      val mSim = minMargin(sims, col("c"))
      info(f"$dir mmr: min rel margin $mRel%.3e, min pool-sim margin $mSim%.3e")
      assert(mRel > minFrac, s"rel cosine within the round-6 flip window at $dir")
      assert(mSim > minFrac, s"pool sim within the round-6 flip window at $dir")
    }
  }

  test("mix_kcenter: corpus×selected rounded-cosine tie margins clear the flip window") {
    for (dir <- Seq(sf0001, sf001)) {
      val picks = CurationQueries.kcenter(spark, dir).collect().map(_.getLong(1))
      val e = emb(dir)
      val sel = e.filter(col("vec_id").isin(picks: _*))
        .select(col("vec_id").as("sid"), col("embedding").as("sv"))
      assert(sel.count() == CurationQueries.kCenterK.toLong)
      // superset of every cosine any round compared (round k uses selected ⊆ picks)
      val cos = e.crossJoin(broadcast(sel)).filter(col("vec_id") =!= col("sid"))
        .select(VectorOps.cosine(col("embedding"), col("sv")).as("c"))
      val m = minMargin(cos, col("c"))
      info(f"$dir kcenter: min margin $m%.3e over ${cos.count()} cosines")
      assert(m > minFrac, s"kcenter cosine within the round-6 flip window at $dir")
    }
  }

  test("curate_classifier: integer-chain magnitude budget holds at the driver SF") {
    for (dir <- Seq(sf0001, sf001)) {
      val f = CurationQueries.clfFeatures(spark, dir)
      val b = f.agg(
        max(abs(col("x1"))).as("x1"), max(abs(col("x2"))).as("x2"),
        max(abs(col("x3"))).as("x3"), max(abs(col("x4"))).as("x4"),
        count(lit(1)).as("n")).first()
      // features at scale 9: x2 (mwl/10) may exceed 1e9 but must stay ≤ 5e9
      // for |z15| ≤ 5·|w6|·x9 + 1e17 < 2^63 under the |w6| ≤ 1e8 weight cap
      assert(b.getLong(0) <= 1000000000L && b.getLong(2) <= 1000000000L &&
        b.getLong(3) <= 1000000000L, s"unit features out of scale-9 range: $b")
      assert(b.getLong(1) <= 5000000000L, s"x2 beyond the 5e9 budget: ${b.getLong(1)}")
      // gradient-sum window: per-row |g9| ≤ cw9·1 ≤ n·1e9/2 never binds at
      // the declared cap; the binding bound is n ≤ 1e6 per the docstring
      assert(b.getLong(4) <= 1000000L, "corpus beyond the documented sum window")
      val w = CurationQueries.classifier(spark, dir).collect()
      val wMax = w.flatMap(r => Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)).map(math.abs)).max
      info(f"$dir classifier: max |w| $wMax%.3f (cap 100), n ${b.getLong(4)}")
      assert(wMax <= 100.0, s"weights beyond the |w6| ≤ 1e8 budget: $wMax")
    }
  }
}
