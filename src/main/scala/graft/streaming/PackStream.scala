package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One chunk of the continuous token stream entering the packer: `grp` is
  * the pack group (source/shard), `seq` the within-group layout position
  * (the [[graft.ops.Chunking.packOrdered]] order column — unique and
  * monotone per group), `n_tok` the chunk's token count. */
case class PackIn(grp: String, doc: Long, seq: Long, n_tok: Long)

/** [[PackIn]] plus its assigned context window (`bin` — the window the
  * chunk STARTS in, [[graft.ops.Chunking.packOrdered]]'s exact rule). */
case class PackOut(grp: String, doc: Long, seq: Long, n_tok: Long, bin: Long)

/** Per-group packer cursor: tokens laid out so far and the last seq seen
  * (the monotonicity guard's memory across triggers). */
case class PackCursor(cum: Long, lastSeq: Long)

/** STREAMING concat-and-cut packing — [[graft.ops.Chunking.pack]] on a
  * live feed. Batch packing is a window cumsum; the streaming equivalent
  * is a per-group RUNNING token cursor carried in the state store, so a
  * curation stream's output chunks get their context-window assignment
  * (`bin = tokens-before DIV ctx`) the moment they arrive — no
  * end-of-corpus barrier. [[graft.ops.Curation.curateStream]]'s scaladoc
  * documents packing as the one stage an append stream "cannot express
  * incrementally" and points at per-microbatch repacking; this operator
  * retires that caveat for ORDERED feeds: the window the batch cumsum
  * would assign is a pure function of the running prefix, which is
  * exactly one (cum, lastSeq) pair of state per pack group.
  *
  * Contract: within each group, chunks arrive in `seq` order ACROSS
  * triggers (a partitioned log with per-key ordering — the Kafka
  * contract; within one trigger any order is fine, the packer sorts its
  * per-group slice). A regression — `seq` at or below the cursor's last —
  * RAISES loudly: a silently mispacked window is training-data corruption,
  * and reordering cannot be reconciled after earlier windows shipped.
  * `n_tok >= 1` is enforced the same way (the sftMaskWindows guard).
  *
  * One code path, two modes: on a STATIC frame
  * `flatMapGroupsWithState` runs each group once with empty state, so the
  * same function is the batch packer — StreamStaticSpec pins it
  * bit-equal to [[graft.ops.Chunking.packOrdered]] AND to itself run over
  * microbatch splits of the same feed.
  *
  * Scale shape: state is ONE (long, long) pair per pack group — bytes,
  * not data; each trigger shuffles only its own chunks (hash by group);
  * the per-group in-memory sort is bounded by the trigger's slice of that
  * group, never the corpus. */
object PackStream {

  def packStream(chunks: Dataset[PackIn], ctx: Int): Dataset[PackOut] = {
    require(ctx >= 1, s"context length must be >= 1, got $ctx")
    import chunks.sparkSession.implicits._
    chunks.groupByKey(_.grp)
      .flatMapGroupsWithState[PackCursor, PackOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (grp: String, it: Iterator[PackIn], state: GroupState[PackCursor]) =>
          val rows = it.toVector.sortBy(_.seq)
          var st = state.getOption.getOrElse(PackCursor(0L, Long.MinValue))
          val out = Vector.newBuilder[PackOut]
          rows.foreach { r =>
            if (r.n_tok < 1) throw new IllegalArgumentException(
              s"packStream: n_tok must be >= 1, got ${r.n_tok} " +
                s"(group $grp, seq ${r.seq}) — empty chunks corrupt the cut")
            if (r.seq <= st.lastSeq) throw new IllegalStateException(
              s"packStream: out-of-order arrival in group $grp — seq " +
                s"${r.seq} at or below the shipped cursor ${st.lastSeq}; " +
                "the stream order IS the pack order and earlier windows " +
                "already shipped")
            out += PackOut(grp, r.doc, r.seq, r.n_tok, st.cum / ctx)
            st = PackCursor(st.cum + r.n_tok, r.seq)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
