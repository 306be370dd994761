package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN probe — the QUERY side of the maintained vector
  * index. [[IvfStream]]/[[IvfChangelog]] keep the at-rest IVF layout
  * current under append/changelog ingest; this operator serves top-k
  * lookups continuously: each micro-batch of query vectors is probed
  * through [[IvfChangelog.topK]] — the same cell-pruned candidate
  * join, per-candidate changelog resolution, and exact cosine re-rank
  * the batch path uses — against the index AS OF that batch. Pruning
  * is STATIC here (`staticCellPushdown`): a micro-batch probe side is
  * a local relation with no selective predicate, which Catalyst's DPP
  * rule declines, so the probed cell set (≤ |batch| · nprobe ints) is
  * pushed as a literal partition filter — deterministic file pruning
  * where the batch path's is heuristic.
  *
  * Composition contracts:
  *  - the centroid model is re-read every batch (inside `topK`), so a
  *    concurrent [[IvfChangelog.sink]] ROTATION (retrain + rewrite at
  *    a compact point) swaps in atomically between probe batches —
  *    a probe never mixes old-model routing with a new-model layout
  *    (the model persists BEFORE the rewrite commits, and the rewrite
  *    is replay-refireable: IvfDriftSpec's crash window, which now
  *    drives its post-replay probe through this operator);
  *  - probe cost per batch is O(|batch| · nprobe · avg-cell), never
  *    O(index): the candidate join is file-pruned to the probed
  *    cells by the static pushdown, asserted by scan-row evidence
  *    in AnnProbeSpec;
  *  - recall is the INDEX's property, not the transport's: streamed
  *    results are row-identical to a batch `topK` at the same index
  *    state, and the recall floor is gated like RecallSpec's.
  *
  * `sink` receives the resolved per-batch top-k DataFrame (query_id,
  * neighbor_id, cos_sim, rnk) and the batch id — write it to a store,
  * a changelog, or a response queue; the checkpoint makes redelivery
  * at-least-once with deterministic content (same index state → same
  * rows), so an idempotent sink yields exactly-once results.
  */
object AnnProbeStream {

  /** Start the probe loop over a streaming `queries` relation with
    * columns `query_id` (long) and `qv` (array&lt;double&gt;). */
  def start(queries: DataFrame, root: String, modelDir: String,
      nprobe: Int, k: Int, checkpointDir: String,
      queryName: String = "ann_probe")
      (sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(IvfChangelog.topK(batch.sparkSession, root, batch, modelDir, nprobe, k,
          staticCellPushdown = true), id)
      }
      .start()
}
