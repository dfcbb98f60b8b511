package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed spectral analytics over an embedding corpus: PCA's top
  * component via the Gram-matrix + power-iteration decomposition — the
  * "what direction carries this corpus's variance" audit run before
  * whitening, dimension pruning, or anisotropy diagnosis of a vector store.
  *
  * Scale shape (the reason this exists instead of a library call): the
  * corpus is touched by exactly ONE scan, reduced to d² partial-aggregable
  * Gram cells (d = 64 → 4,096 rows, mergeable decimal sums — the same
  * fixed-size-state shuffle story as the HLL/heavy-hitter sketches); every
  * subsequent step is driver math on a d×d matrix, bounded by the embedding
  * WIDTH, never the corpus. At 100 TB the Gram pass is embarrassingly
  * map-side-combinable and nothing downstream re-reads a vector.
  *
  * Determinism contract (why this matches a SQL oracle bit-for-bit): each
  * per-row product x_i·x_j is one exact double multiply (float24 × float24
  * ≤ 53 mantissa bits), rounded to 9 decimals and summed as DECIMAL(38,9) —
  * exact and order-free in both engines. The power iteration runs in BigInt
  * scaled integers (vector components at scale 1e9, Gram cells at their
  * decimal unscaled 1e9), normalizing by the max-|component| each round with
  * truncating division — BigInt `/` and DuckDB `//` both truncate toward
  * zero, so every round is engine-exact including negative components. The
  * Rayleigh quotient and explained-variance ratio are single truncating
  * divisions at scale 1e6. Floats appear only in display columns.
  */
object Spectral {

  /** Decimal places each x_i·x_j product keeps before the exact sum. */
  val prodScale = 9

  /** Eigenvector component scale: v ∈ [−1e9, 1e9] after each round. */
  val vecScale: Long = 1000000000L

  /** Exact Gram matrix of `vec` rows as (i, j, g DECIMAL(38,9)) cells,
    * 1-based dims, all d² cells (the full matrix keeps the driver-side and
    * SQL matvecs join-shaped instead of triangular-cased).
    *
    * Shape (r13 verdict item 5): chained posexplode generators — each row
    * fans out to its own d² products IN THE SCAN, so the only keyed
    * exchange in the plan is the d²-row partial-aggregate shuffle. The
    * previous id-keyed self-join of the exploded corpus bought two
    * corpus×d hash exchanges for bit-identical cells; the streaming twin
    * ([[graft.streaming.StreamOps.gramCells]], proven cell-equal by the
    * `stream_gram` gate) always used this form, and both now share THIS
    * implementation. Any `id` column is ignored.
    *
    * Parallelism guard (r14, from the sf1 rehearsal): a fan-out operator's
    * work is set by its OUTPUT volume (n·d² product rows), but Spark sizes
    * scan tasks by INPUT bytes — a single-row-group parquet file planned
    * the whole expansion onto ONE task (142 s for 20k vectors that takes
    * ~4 s spread across cores). When the batch input arrives in fewer
    * partitions than the cluster has slots, a narrow ROUND-ROBIN
    * repartition of the raw vector rows (n rows × ~4·d bytes — ≤ 1/d² of
    * the downstream generate work) restores parallelism; inputs that
    * already carry enough splits (any real multi-file corpus) skip it, and
    * streaming inputs always skip it (micro-batch partitioning is the
    * stream's own contract, and `.rdd` is not stream-legal).
    */
  def gram(vecs: DataFrame): DataFrame = {
    val src =
      if (vecs.isStreaming) vecs
      else {
        val slots = vecs.sparkSession.sparkContext.defaultParallelism
        if (vecs.rdd.getNumPartitions < slots) vecs.repartition(slots) else vecs
      }
    src
      .select(col("vec"), posexplode(col("vec")))
      .toDF("vec", "i0", "x")
      .select(col("i0"), col("x"), posexplode(col("vec")))
      .toDF("i0", "x", "j0", "y")
      .select((col("i0") + 1).as("i"), (col("j0") + 1).as("j"),
        col("x").cast("double").as("x"), col("y").cast("double").as("y"))
      .groupBy("i", "j")
      .agg(sum(round(col("x") * col("y"), prodScale)
        .cast(s"decimal(38,$prodScale)")).as("g"))
  }

  /** Power iteration on a collected Gram matrix (unscaled 1e9 integer
    * cells): `rounds` matvec+normalize steps from the all-ones vector, then
    * the Rayleigh quotient λ and explained-variance ratio λ/trace(G), both
    * as scale-1e6 integers. Pure BigInt — the ENGINE has no overflow
    * ceiling at any corpus size. The SQL oracle's HUGEINT (~1.7e38) bounds
    * only oracle VERIFIABILITY, and more tightly than the cells alone
    * suggest: inside the iteration chain the intermediate `w·1e9` rescale
    * products reach ~d·g·1e18 with g ~ n·1e9 for unit-bounded embeddings,
    * so the unrolled CTE overflows around n ≈ 1e9–1e10 vectors (normalize
    * w before the rescale to recover headroom if a bigger corpus ever
    * needs oracle checking).
    */
  def powerIteration(gU: Map[(Int, Int), BigInt], dims: Int, rounds: Int)
      : (Array[BigInt], Long, Long) = {
    require(rounds >= 1 && rounds <= 30, s"rounds must be in [1,30], got $rounds")
    val S = BigInt(vecScale)
    def matvec(v: Array[BigInt]): Array[BigInt] =
      Array.tabulate(dims) { i =>
        (1 to dims).map(j => gU.getOrElse((i + 1, j), BigInt(0)) * v(j - 1)).sum
      }
    var v = Array.fill(dims)(S)
    for (_ <- 1 to rounds) {
      val w = matvec(v)
      val m = w.map(_.abs).max
      require(m > 0, "power iteration collapsed: zero Gram matvec")
      v = w.map(x => x * S / m) // BigInt / truncates toward zero == DuckDB //
    }
    val w = matvec(v)
    val num = (0 until dims).map(i => v(i) * w(i)).sum // = vᵀGv ≥ 0 (PSD)
    val den = v.map(x => x * x).sum
    val trace = (1 to dims).map(i => gU.getOrElse((i, i), BigInt(0))).sum
    require(trace >= BigInt(1000000), "corpus too small for scale-6 ratios")
    val lam6 = num / (den * 1000L)                 // λ at scale 1e6
    val evr6 = num / (den * (trace / 1000000L))    // λ/trace at scale 1e6
    (v, lam6.toLong, evr6.toLong)
  }

  /** Hotelling deflation in the same scaled-integer regime: given the
    * trained top component `v` of `gU`, returns the residual matrix
    * `G − (vᵀGv)/(vᵀv)² · v vᵀ` cell-for-cell at the Gram scale, so a
    * second [[powerIteration]] finds the SECOND component. The rank-one
    * term is computed as `(λ9 · v_i · v_j) / den` with `λ9 = num / den`
    * (two truncating divisions in that fixed order — the single-division
    * form overflows 128-bit integers at corpus scale, and the oracle must
    * divide in the same order to stay bit-exact).
    */
  def deflate(gU: Map[(Int, Int), BigInt], v: Array[BigInt], dims: Int)
      : Map[(Int, Int), BigInt] = {
    val w = Array.tabulate(dims) { i =>
      (1 to dims).map(j => gU.getOrElse((i + 1, j), BigInt(0)) * v(j - 1)).sum
    }
    val num = (0 until dims).map(i => v(i) * w(i)).sum
    val den = v.map(x => x * x).sum
    require(den > 0, "deflation against a zero vector")
    val lam9 = num / den
    (for (i <- 1 to dims; j <- 1 to dims) yield {
      (i, j) -> (gU.getOrElse((i, j), BigInt(0)) - lam9 * v(i - 1) * v(j - 1) / den)
    }).toMap
  }

  /** [[powerIteration]] over the collected Gram of `vecs` — the trained
    * model artifact (eigenvector at scale 1e9 + scale-1e6 λ and λ/trace)
    * consumers cache per (session, dir) and apply without re-scanning.
    */
  def topVector(vecs: DataFrame, dims: Int, rounds: Int)
      : (Array[BigInt], Long, Long) = {
    val cells = gram(vecs).collect().map { r =>
      (r.getInt(0), r.getInt(1)) -> BigInt(r.getDecimal(2).unscaledValue())
    }.toMap
    powerIteration(cells, dims, rounds)
  }

  /** Top principal direction of the corpus: one Gram scan + `rounds` of
    * integer power iteration. Returns one row per dimension: (dim, v
    * BIGINT exact scale-1e9 loading, loading DOUBLE display, eigenvalue,
    * explained_ratio). The only driver traffic is the d² Gram cells.
    */
  def topComponent(vecs: DataFrame, dims: Int, rounds: Int): DataFrame = {
    val (v, lam6, evr6) = topVector(vecs, dims, rounds)
    renderComponent(vecs.sparkSession, v, lam6, evr6)
  }

  /** The (dim, v, loading, eigenvalue, explained_ratio) frame for a trained
    * [[topVector]] artifact.
    */
  def renderComponent(s: SparkSession, v: Array[BigInt], lam6: Long,
      evr6: Long): DataFrame = {
    val lam = lam6 / 1.0e6
    val evr = evr6 / 1.0e6
    val rows = v.indices.map { i0 =>
      Row(i0 + 1, v(i0).toLong, v(i0).toLong / 1.0e9, lam, evr)
    }
    s.createDataFrame(
      s.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("dim", IntegerType, nullable = false),
        StructField("v", LongType, nullable = false),
        StructField("loading", DoubleType, nullable = false),
        StructField("eigenvalue", DoubleType, nullable = false),
        StructField("explained_ratio", DoubleType, nullable = false))))
  }
}
