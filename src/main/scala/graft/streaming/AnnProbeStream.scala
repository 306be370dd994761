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

  /** Per-batch recall telemetry: batch id, the recall estimate
    * against the brute-forced sample, and the nprobe the batch's
    * SINKED results were produced at. */
  type Telemetry = (Long, Double, Int) => Unit

  /** Start the probe loop over a streaming `queries` relation with
    * columns `query_id` (long) and `qv` (array&lt;double&gt;).
    *
    * `shortlistR > 0` switches the per-batch probe into the streamed
    * IVF-quantized composition ([[IvfChangelog.topK]]'s coded
    * shortlist): candidates are approx-scored on the stored int8
    * codes with the full-vector column pruned out of the candidate
    * scan, and only the per-query top-R pay the exact re-rank — the
    * q59/q70 two-phase shape against the MAINTAINED index. The recall
    * telemetry below guards the shortlist depth exactly as it guards
    * nprobe (too-small R dips the estimate; escalation widens nprobe
    * before sinking).
    *
    * RECALL TELEMETRY + ADAPTIVE NPROBE (opt-in via
    * `recallSample > 0`): the spec-gated recall floor is invisible in
    * production — an index drifting away from its trained centroids
    * (ingest distribution shift between rotations) degrades recall
    * silently, because the cell-pruned probe has no ground truth to
    * compare against. With telemetry on, every batch brute-forces the
    * EXACT top-k for a bounded sample of its queries (first
    * `recallSample` by query id — deterministic under replay;
    * cost O(sample · index) via [[IvfChangelog.bruteTopK]]) and
    * estimates recall = |ANN ∩ exact| / |exact| over the sample. The
    * estimate goes to `telemetry` alongside the batch id and the
    * nprobe actually used. If the estimate dips below `recallFloor`,
    * nprobe DOUBLES (capped at `maxNprobe`) and the batch re-probes
    * before sinking — results never ship below the floor while
    * headroom remains — and subsequent batches start at the escalated
    * width. The escalation is driver-local, not checkpointed: a
    * restart re-learns it within one batch (the estimate dips again,
    * the probe re-escalates), which is self-correcting by
    * construction. Escalation never de-escalates on its own — a
    * ROTATION (retrain at a compact point) is the structural fix
    * that restores the trained-cell geometry; reset `nprobe` by
    * restarting the probe after one. */
  def start(queries: DataFrame, root: String, modelDir: String,
      nprobe: Int, k: Int, checkpointDir: String,
      queryName: String = "ann_probe",
      recallSample: Int = 0, recallFloor: Double = 0.0,
      maxNprobe: Int = 0, shortlistR: Int = 0,
      telemetry: Telemetry = (_, _, _) => ())
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(recallSample >= 0, s"recallSample must be >= 0: $recallSample")
    val npCap = if (maxNprobe <= 0) nprobe else maxNprobe
    require(npCap >= nprobe, s"maxNprobe ($maxNprobe) must be >= nprobe ($nprobe)")
    val npCur = new java.util.concurrent.atomic.AtomicInteger(nprobe)
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        if (recallSample == 0) {
          sink(IvfChangelog.topK(spark, root, batch, modelDir, npCur.get(), k,
            staticCellPushdown = true, shortlistR = shortlistR), id)
        } else {
          // the batch feeds the probe AND the sampled ground truth —
          // materialize once
          val b = batch.localCheckpoint(true)
          val sample = b.orderBy("query_id").limit(recallSample).localCheckpoint(true)
          val exact = IvfChangelog.bruteTopK(spark, root, sample, k)
            .select("query_id", "neighbor_id").localCheckpoint(true)
          val exactCnt = exact.count()
          def estimate(res: DataFrame): Double =
            if (exactCnt == 0L) 1.0
            else res.join(sample.select("query_id"), "query_id")
              .select("query_id", "neighbor_id")
              .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
              .count().toDouble / exactCnt
          var np = npCur.get()
          var res = IvfChangelog.topK(spark, root, b, modelDir, np, k,
            staticCellPushdown = true, shortlistR = shortlistR)
          var est = estimate(res)
          while (est < recallFloor && np < npCap) {
            np = math.min(npCap, np * 2)
            res = IvfChangelog.topK(spark, root, b, modelDir, np, k,
              staticCellPushdown = true, shortlistR = shortlistR)
            est = estimate(res)
          }
          npCur.set(np)
          telemetry(id, est, np)
          sink(res, id)
        }
      }
      .start()
  }
}
