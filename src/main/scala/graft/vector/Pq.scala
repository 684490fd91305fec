package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-compression path for vector
  * search at 100 TB, complementing the family: q25 exact, q30 IVF (probe
  * fewer vectors), q54 LSH (probe fewer buckets), q67 SQ8 (4× smaller
  * vectors), q92 PQ (this: 32× smaller vectors).
  *
  * A d-dim vector is split into `m` contiguous subspaces of d/m dims; each
  * subspace is vector-quantized against its OWN codebook of `k` centroids
  * (Jégou et al. 2011, "Product Quantization for Nearest Neighbor Search").
  * A vector is stored as m small codes — here m=8 subspaces × 4-bit codes
  * (k=16, FAISS's "PQ4 fast-scan" geometry) = 4 bytes instead of 256, so a
  * 1000-executor cluster holds a 10⁹-vector corpus fully in memory.
  *
  * Search is ASYMMETRIC (ADC): the query stays exact; each database vector
  * is scored against its RECONSTRUCTION (concatenated per-subspace
  * centroids). The textbook serving optimization — a per-query m×k lookup
  * table of subspace distances, summed per candidate in O(m) — computes
  * THE SAME number this module's reconstruct-then-score does
  * (Σ_sub ‖q_sub − c_code‖² ≡ ‖q − recon‖²), because subspaces partition
  * the dims; reconstruction keeps the whole path inside the codegen'd
  * `graft_dot`/`graft_nearest_centroid` expressions and makes the DuckDB
  * oracle replay bit-identical (centroid literals + the shared sequential
  * Σ(v_i−c_i)² / argmin / lowest-cell tie-break conventions of q30).
  *
  * Scale shape: encoding is m codegen'd per-row argmins over the scan — no
  * join, no shuffle, no row multiplication; the codebooks are m·k·(d/m)
  * doubles (k=256 at production bit-width ≈ 128 KB), a broadcast constant
  * trained once on a sample by [[graft.tools.FreezePq]], never re-fit per
  * query (the q30/q64 freeze rationale).
  */
object Pq {

  final case class PqModel(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def subDim: Int = codebooks.head.head.length
    def dim: Int = m * subDim
  }

  /** The `sub`-th subspace slice of a full vector column (1-based slice). */
  def subVec(v: Column, model: PqModel, sub: Int): Column =
    slice(v, sub * model.subDim + 1, model.subDim)

  /** The PQ code of subspace `sub` — the codegen'd nearest-centroid argmin
    * against that subspace's codebook (lowest-cell tie-break, the q30
    * convention). */
  def codeOf(v: Column, model: PqModel, sub: Int): Column =
    call_function("graft_nearest_centroid",
      subVec(v, model, sub), typedlit(model.codebooks(sub).map(_.toSeq).toSeq))

  /** All m codes as an array column (what a PQ index stores per vector). */
  def codesOf(v: Column, model: PqModel): Column =
    array((0 until model.m).map(sub => codeOf(v, model, sub)): _*)

  /** The reconstruction (decode) of a vector: per subspace, the centroid
    * its code names, concatenated back to d dims. ADC distances computed
    * against this reconstruction equal the lookup-table formulation exactly
    * (see the scaladoc above). */
  def reconstruct(v: Column, model: PqModel): Column =
    concat((0 until model.m).map { sub =>
      element_at(typedlit(model.codebooks(sub).map(_.toSeq).toSeq),
        codeOf(v, model, sub) + 1)
    }: _*)
}
