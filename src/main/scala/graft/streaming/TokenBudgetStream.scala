package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming token-budget admission — q117's micro-batch twin: the
  * ingest-time enforcement of a training-mixture quota ("this source
  * contributes N tokens"), admitting documents until the source's
  * budget is spent and counting — not admitting — everything after.
  *
  * Semantics match q117 exactly: the per-source cumulative advances
  * over EVERY seen document, and a document is admitted iff its FIRST
  * token lands below the budget (`src_cum − n_tokens < budget`, the
  * q77 boundary rule) — so one straddling document is admitted per
  * source and the cut is exact thereafter. Within a micro-batch the
  * rows fold in (md5(doc_id), doc_id) order — a DEFINED intra-batch
  * order, so any re-batching of the same dealt sequence folds
  * identically, and a dealt replay of the corpus in hash order
  * reproduces batch q117 row-for-row including `src_cum`
  * (TokenBudgetStreamSpec). Under live arrival order the operator is
  * the deterministic arrival-order quota — the operationally real
  * shape; the batch twin is its hash-order replay.
  *
  * State per source is ONE counter (the cumulative token count):
  * mixture-cardinality entries total, trivially bounded at 100 TB —
  * no TTL, no tombstones, no per-doc state. A batch's emission is at
  * most its own admitted rows; a source past its budget emits
  * nothing forever at zero marginal state.
  */
object TokenBudgetStream {

  case class DocTok(source: String, doc_id: Long, n_tokens: Long, h: String)
  case class SrcCum(cum: Long)
  case class Admit(source: String, doc_id: Long, n_tokens: Long, src_cum: Long)

  /** `docs` must carry (source, doc_id, n_tokens); `budget` is the
    * per-source token quota (q117 derives it as the min-source total;
    * a production mixture pins it per spec — the admission rule only
    * needs the number). */
  def admit(docs: DataFrame, budget: Long): Dataset[Admit] = {
    require(budget > 0, "TokenBudgetStream: budget must be positive")
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("source").cast("string").as("source"),
        col("doc_id").cast("long").as("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        md5(col("doc_id").cast("string")).as("h"))
      .as[DocTok]
      .groupByKey(_.source)
      .flatMapGroupsWithState[SrcCum, Admit](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[DocTok], state: GroupState[SrcCum]) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = Vector.newBuilder[Admit]
          // batch-bounded sort: the processor's defined intra-batch
          // order (micro-batch rows per source, never corpus-scale)
          rows.toVector.sortBy(r => (r.h, r.doc_id)).foreach { r =>
            val before = cum
            cum += r.n_tokens
            if (before < budget) out += Admit(source, r.doc_id, r.n_tokens, cum)
          }
          state.update(SrcCum(cum))
          out.result().iterator
      }
  }
}
