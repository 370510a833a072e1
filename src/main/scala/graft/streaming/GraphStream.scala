package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rung for the graph family (q37–q40 / d27): INCREMENTAL
  * CONNECTED COMPONENTS over micro-batched edge arrivals — the
  * labeling a live dedup deployment maintains as near-dup pairs
  * stream out of [[graft.operators.Dedup.streamingNearDupCandidates]].
  *
  * Semantics are [[graft.operators.Dedup.incrementalComponents]]
  * applied per micro-batch (the d27 contraction discipline): each
  * batch's edges CONTRACT through the current labeling (an already
  * seen endpoint stands in as its component rep, a new one as
  * itself), a min-root union-find merges the contracted graph, and
  * only the ids whose label CHANGED (plus newly seen ids) emit as a
  * delta frame tagged `as_of` = the batch sequence — Append-safe, no
  * retraction: a min-label can only merge downward, so every change
  * is a fresh (as_of, id, component) row and folding deltas by max
  * as_of reconstructs the full labeling at any prefix.
  *
  * Exactness (the d27 argument verbatim): reps are the MIN of their
  * cluster and the union-find roots at the smaller rep, so after any
  * batch the folded labeling equals one-shot batch
  * [[graft.operators.Dedup.connectedComponents]] over every edge seen
  * so far — GraphStreamSpec pins both the prefix and the final frame
  * against the batch operator on a split edge stream.
  *
  * State bound: ONE (id → component) map over the ids that appeared
  * in any edge — the component STORE, not the edge set (edges are
  * consumed by contraction and never kept). This is the same
  * bounded-store contract as d25/d27's batch stores; a corpus whose
  * near-dup graph has more nodes than executor state should shard by
  * a partition key upstream, exactly as the batch store does.
  */
object GraphStream {

  /** One undirected edge arrival. */
  final case class EdgeArrival(id1: Long, id2: Long)

  /** batch: frames emitted so far; comp: id → component (min of its
    * cluster). */
  final case class CcState(batch: Long, comp: Map[Long, Long])

  /** Delta row: `id`'s label became `component` as of batch `as_of`.
    * Fold by max as_of per id for the full labeling. */
  final case class CcDelta(as_of: Long, id: Long, component: Long)

  implicit val edgeEnc: Encoder[EdgeArrival] = Encoders.product[EdgeArrival]
  implicit val ccStEnc: Encoder[CcState] = Encoders.product[CcState]
  implicit val ccDeltaEnc: Encoder[CcDelta] = Encoders.product[CcDelta]
  implicit val keyEnc: Encoder[String] = Encoders.STRING

  /** Transition, exposed for unit tests. */
  def ccUpdate(key: String, edges: Iterator[EdgeArrival],
               state: GroupState[CcState]): Iterator[CcDelta] = {
    val st0 = state.getOption.getOrElse(CcState(0L, Map.empty))
    val comp = st0.comp
    // min-root union-find over the CONTRACTED batch graph: an endpoint
    // enters as its current component rep (itself when new)
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val newIds = scala.collection.mutable.LinkedHashSet.empty[Long]
    var sawEdge = false
    edges.foreach { e =>
      sawEdge = true
      if (!comp.contains(e.id1)) newIds += e.id1
      if (!comp.contains(e.id2)) newIds += e.id2
      val a = comp.getOrElse(e.id1, e.id1)
      val b = comp.getOrElse(e.id2, e.id2)
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    if (!sawEdge) Iterator.empty
    else {
      val asOf = st0.batch + 1
      val out = Vector.newBuilder[CcDelta]
      var next = comp
      // store ids whose component's rep merged downward re-point
      comp.foreach { case (id, c) =>
        val m = find(c)
        if (m != c) { next = next.updated(id, m); out += CcDelta(asOf, id, m) }
      }
      // newly seen ids enter the store (and the delta stream) labeled
      // with their merged rep — themselves when unpaired with history
      newIds.foreach { id =>
        val m = find(id)
        next = next.updated(id, m)
        out += CcDelta(asOf, id, m)
      }
      state.update(CcState(asOf, next))
      out.result().iterator
    }
  }

  /** Streaming entry: `edges` is a streaming Dataset of undirected
    * edge arrivals; emits delta frames per micro-batch. Append mode,
    * no watermark (the labeling is monotone — nothing ever closes).
    */
  def ccDeltas(edges: Dataset[EdgeArrival]): Dataset[CcDelta] =
    edges
      .groupByKey(_ => "all")
      .flatMapGroupsWithState[CcState, CcDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(ccUpdate _)
}
