package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the scale path for
  * similarity search: vectors are partitioned into k coarse cells
  * (k-means), a query probes only its `nprobe` closest cells, and exact
  * scoring runs on that sliver of the data.
  *
  * Shapes chosen for 100 TB:
  *  - cell ASSIGNMENT is [[graft.functions.expressions.NearestCentroid]] —
  *    one codegen'd per-row loop, no join, no shuffle, no row multiplication;
  *  - training iterates on the full table but each iteration is one
  *    assignment pass + one groupBy(cell, dim) mean — the only driver-side
  *    data is the k×d centroid matrix itself (a few KB);
  *  - probing broadcasts (query, cell) pairs into the vector scan, so the
  *    big side is read once and only matching cells are scored.
  */
object Ivf {

  final case class IvfModel(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
    private[vector] def lit_ : Column =
      typedlit(centroids.map(_.toSeq).toSeq)
  }

  private def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Cell id column for a vector column under a model. */
  def cellOf(v: Column, model: IvfModel): Column =
    call_function("graft_nearest_centroid", v, model.lit_)

  /** Deterministic k-means: init from the first k vectors by id, fixed
    * iteration count. `vectors` must have columns (vec_id, v: array<double>). */
  def train(vectors: DataFrame, k: Int, iterations: Int = 3): IvfModel = {
    val spark = vectors.sparkSession
    var model = IvfModel(
      vectors.orderBy("vec_id").limit(k).collect()
        .map(_.getSeq[Double](1).toArray))
    for (_ <- 0 until iterations) {
      val means = vectors
        .select(cellOf(col("v"), model).as("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg("x").as("m"))
        .collect() // k×d rows — bounded by the model size, not the data
      val next = model.centroids.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      model = IvfModel(next) // cells with no members keep their centroid
    }
    model
  }

  /** Exact cosine top-k over only the probed cells.
    * `vectors`/`queries`: (vec_id, v). Output: (q_id, rank, neighbor_id, cos). */
  def topK(vectors: DataFrame, queries: DataFrame, model: IvfModel,
           nprobe: Int, k: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._

    // centroid table is k rows — crossJoin against the (small) query set,
    // rank, keep nprobe cells per query. Both sides tiny; stays distributed.
    val centroidsDf = model.centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "c")
    val byDist = Window.partitionBy($"q_id").orderBy($"sqdist", $"cell")
    val probes = queries
      .select($"vec_id".as("q_id"), $"v".as("qv"))
      .crossJoin(broadcast(centroidsDf))
      .withColumn("sqdist",
        dot($"qv", $"qv") - lit(2.0) * dot($"qv", $"c") + dot($"c", $"c"))
      .withColumn("r", row_number().over(byDist))
      .filter($"r" <= nprobe)
      .select($"q_id", $"qv", $"cell")

    // norms once per ROW on each side, BEFORE the join — inside the per-pair
    // projection they would be recomputed O(pairs·d) times (the q25 shape)
    val assigned = vectors.select($"vec_id", $"v", cellOf($"v", model).as("cell"),
      sqrt(dot($"v", $"v")).as("nrm"))
    val probesN = probes.withColumn("qnrm", sqrt(dot($"qv", $"qv")))
    // rank on the ROUNDED cosine (with the id tie-break): ranking and output
    // then use the same grid-snapped value, so a last-ulp summation-order
    // difference between engines cannot flip a rank — the q25 convention
    val byCos = Window.partitionBy($"q_id").orderBy($"cos_r".desc, $"neighbor_id")
    assigned.join(broadcast(probesN), "cell")
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("neighbor_id"),
        round(dot($"qv", $"v") / ($"qnrm" * $"nrm"), 4).as("cos_r"))
      .withColumn("rank", row_number().over(byCos).cast("long"))
      .filter($"rank" <= k)
      .select($"q_id", $"rank", $"neighbor_id", $"cos_r")
  }
}
