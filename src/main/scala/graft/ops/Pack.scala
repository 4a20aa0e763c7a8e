package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — the "pack" step of a training-data pipeline
  * (tokenize → encode → PACK): greedily concatenate documents into
  * fixed-capacity context windows without splitting documents, so each
  * training sequence carries as many whole documents as fit.
  *
  * Semantics (deterministic, SQL-replayable): within each group, scan
  * documents in ascending `order` and keep a running token fill; a
  * document that would overflow `capacity` closes the current pack and
  * starts the next one. A single document larger than `capacity` occupies
  * a pack of its own (overflowing it — the caller's tokenizer decides
  * whether to truncate; packing never drops data silently). Packs are
  * numbered 1.. per group, positions 1.. per pack.
  *
  * Scale shape: greedy packing is inherently ORDER-SEQUENTIAL, so the
  * unit of sequence is the GROUP — one shuffle partitions by group key,
  * then each group streams once through a sorted iterator
  * (`flatMapSortedGroups`: Spark sorts within partitions, no per-group
  * materialization of the whole group in memory beyond the iterator).
  * Parallelism comes from group count; a 100 TB pipeline packs per
  * (source, shard) — shard = hash(doc_id) % N for load balance — because
  * pack membership across shard boundaries is not a quality constraint
  * (any whole-doc grouping is a valid packing; determinism within the
  * chosen sharding is what replay needs). The per-group state is three
  * longs — no growth with group size.
  */
object Pack {

  // public: the Dataset encoder's generated projection code instantiates
  // these reflectively and cannot see private members
  final case class In(grp: String, ord: Long, toks: Long)
  final case class Out(grp: String, ord: Long, toks: Long,
                       pack_no: Long, pack_pos: Long)

  /** Per-document pack assignment `(group, order, n_tokens, pack_no,
    * pack_pos)` under first-fit greedy packing in `order` within `group`.
    */
  def packGreedy(docs: DataFrame, group: Column, order: Column,
                 nTokens: Column, capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(group.cast("string").as("grp"), order.cast("long").as("ord"),
        nTokens.cast("long").as("toks"))
      .as[In]
      .groupByKey(_.grp)
      .flatMapSortedGroups($"ord") { (key: String, it: Iterator[In]) =>
        var pack = 1L; var fill = 0L; var pos = 0L
        it.map { r =>
          if (fill > 0 && fill + r.toks > capacity) { pack += 1; fill = 0; pos = 0 }
          fill += r.toks; pos += 1
          Out(key, r.ord, r.toks, pack, pos)
        }
      }
      .toDF("grp", "ord", "toks", "pack_no", "pack_pos")
  }

  /** Whitespace token count matching the oracle's
    * `len(list_filter(string_split(text, ' '), w -> len(w) > 0))`. */
  def wsTokens(text: Column): Column =
    size(filter(split(text, " "), w => length(w) > 0)).cast("long")
}
