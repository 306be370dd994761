package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{StatefulProcessorHandle, TTLConfig, ValueState}

/** Schema-version tag for checkpointed processor state — the
  * migrate-or-reject contract for production restarts.
  *
  * Two failure classes exist when a query restarts from an older
  * checkpoint:
  *
  *  1. **Shape changes** (a state case class gained/lost fields —
  *     e.g. round 14 grew `OrdSummary` 5→7 fields and `RunAcc` 2→3):
  *     Spark's own state-schema compatibility check loud-rejects
  *     these under the default UnsafeRow state encoding before any
  *     processor code runs (pinned by StateSchemaSpec). Nothing to
  *     add — the reject is already loud.
  *  2. **Semantic changes under an UNCHANGED shape** (a field's
  *     meaning, unit, or encoding changes — ver domain, cents vs
  *     micros, a packed flag reinterpreted): Spark's check passes and
  *     the processor silently misreads old state. THIS is the gap the
  *     tag closes.
  *
  * Each stateful processor declares a schema version constant and
  * bumps it on any semantic change to its state encoding. The tag is
  * a per-key `ValueState[Int]` (state in transformWithState is always
  * per grouping key): on every `handleInputRows` the processor checks
  * the key's tag — an existing tag from another version loud-rejects
  * with an actionable message; an absent tag (fresh key, or a
  * pre-tag checkpoint whose shapes Spark already validated) is
  * stamped with the current version so every FUTURE restart can
  * check it. Misreads can only happen on old-key state access, which
  * is exactly when the check fires — a restart that only ever touches
  * new keys never reads old state, so the late detection is still
  * before any misread.
  *
  * Cost: one point lookup per key per batch plus one write per fresh
  * key — one small state op next to the several every checkpointed
  * processor already pays.
  *
  * Ref: Flink requires the same discipline via serializer
  * compatibility checks on restore (TypeSerializerSnapshot);
  * the version tag is the lightweight Spark-side analog.
  */
private[streaming] object StateSchemaVer {

  /** Register the tag state var — call from `init`. */
  def state(handle: StatefulProcessorHandle): ValueState[Int] =
    handle.getValueState[Int]("_schemaVer", Encoders.scalaInt, TTLConfig.NONE)

  /** Per-key check-or-stamp — call at the top of `handleInputRows`. */
  def check(tag: ValueState[Int], current: Int, proc: String): Unit = {
    if (tag.exists()) {
      val v = tag.get()
      if (v != current) throw new IllegalStateException(
        s"$proc: checkpointed state carries schema v$v but this build writes v$current — " +
          "a restart must migrate or reject, never silently misread: rerun on the " +
          "matching build, migrate the checkpoint offline, or start from a fresh checkpoint")
    } else tag.update(current)
  }
}
