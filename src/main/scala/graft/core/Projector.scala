package graft.core

/** Cardinality of the static→dynamic key projection.
  *
  * The reference engine declares, per job, how keys of the immutable
  * ("static") relation map onto keys of the per-iteration mutable
  * ("dynamic") relation, and picks a physical join strategy from it
  * (reference: incr-hadoop-0.1 `Projector.java:5-17`; join drivers in
  * `MapTask.java:783-815`). In this Spark build the projection is just a
  * join-key expression; the cardinality only selects the join strategy:
  *
  *  - [[ProjectKind.One2One]] — shuffle-free co-partitioned equi-join
  *    (both sides hash-partitioned on the same key).
  *  - [[ProjectKind.One2All]] — the dynamic side is a single global value
  *    (e.g. the KMeans center set): broadcast, never shuffled.
  *  - [[ProjectKind.One2Mul]] — each dynamic key owns many static keys
  *    (e.g. blocked mat-vec: one vector block joins a whole matrix
  *    column-block): equi-join on the projected key, static side
  *    pre-partitioned by it.
  */
sealed trait ProjectKind
object ProjectKind {
  /** Each static key maps to exactly one dynamic key (PageRank: node→node).
    * Reference `MapTask.java:783-793` (zip merge-join). */
  case object One2One extends ProjectKind

  /** Every static key joins the single global dynamic value (KMeans
    * centers). Reference `MapTask.java:794-799` (broadcast path) +
    * JobTracker global aggregation `JobTracker.java:5604-5656`. */
  case object One2All extends ProjectKind

  /** One dynamic key ↔ many static keys (GIM-V block column ↔ vector
    * block). Reference `MapTask.java:800-815` (grouped merge-join). */
  case object One2Mul extends ProjectKind
}
