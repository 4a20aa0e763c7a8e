package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chat/SFT template rendering — the assembly step between raw
  * conversational rows and a supervised-finetuning corpus: turns are
  * ordered within each conversation, serialized through a fixed template,
  * and the character spans of the ASSISTANT contents are emitted as the
  * loss mask (the trainer computes loss only inside those spans; the
  * prompt/user text is context). Keeping the span arithmetic exact at
  * the character level here means the downstream tokenizer only has to
  * map char offsets to token offsets — the standard two-phase recipe.
  *
  * Template (ChatML-shaped, fixed):
  *   piece(turn)  = "<|" + role + "|>" + content + "<|end|>"
  *   rendered     = concat of pieces in turn order
  *   loss span    = [offset(piece) + len("<|"+role+"|>"),
  *                   … + len(content))   for every assistant turn
  *
  * Scale shape: ONE hash shuffle on the conversation key serves both the
  * turn-offset window and the final per-conversation aggregate (same
  * partitioning, the exchange is reused); all span arithmetic is narrow
  * exact-Long math. Conversations are the unit of parallelism — at
  * 100 TB the corpus has billions of them, and no state exceeds one
  * conversation's turns.
  */
object Chat {

  /** Render per-conversation: (conv_id, n_turns, n_chars, rendered,
    * loss_starts, loss_ends, n_loss_chars) with 0-based char offsets,
    * spans in turn order, end exclusive.
    */
  def renderConversations(turns: DataFrame, convId: Column, order: Column,
                          role: Column, content: Column): DataFrame = {
    val base = turns.select(convId.cast("long").as("conv_id"),
      order.cast("long").as("ord"), role.cast("string").as("role"),
      content.cast("string").as("content"))
    val piece = concat(lit("<|"), col("role"), lit("|>"), col("content"),
      lit("<|end|>"))
    val w = Window.partitionBy(col("conv_id")).orderBy(col("ord"))
    val withOff = base
      .withColumn("piece", piece)
      .withColumn("piece_off",
        coalesce(sum(length(col("piece")).cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("loss_start",
        col("piece_off") + length(concat(lit("<|"), col("role"), lit("|>")))
          .cast("long"))
      .withColumn("loss_end",
        col("loss_start") + length(col("content")).cast("long"))
    withOff.groupBy(col("conv_id")).agg(
      count(lit(1)).as("n_turns"),
      sum(length(col("piece")).cast("long")).as("n_chars"),
      // ord-sorted struct lists make the concat/arrays deterministic
      // under any partitioning (collect_list order is not)
      array_join(transform(
        array_sort(collect_list(struct(col("ord"), col("piece")))),
        x => x.getField("piece")), "").as("rendered"),
      transform(array_sort(collect_list(
          when(col("role") === "assistant",
            struct(col("ord"), col("loss_start"))))),
        x => x.getField("loss_start")).as("loss_starts"),
      transform(array_sort(collect_list(
          when(col("role") === "assistant",
            struct(col("ord"), col("loss_end"))))),
        x => x.getField("loss_end")).as("loss_ends"),
      sum(when(col("role") === "assistant",
        length(col("content")).cast("long")).otherwise(lit(0L)))
        .as("n_loss_chars"))
  }

  /** CHAT/SFT CURATION STATS — the quality gate BEFORE
    * [[renderConversations]]: per conversation, role composition,
    * alternation violations (consecutive same-role turns in `order`
    * order — template renderers and most trainers assume strict
    * alternation), empty-content turns, the opening role, and the
    * assistant share of content chars; `keep` = starts with a user turn,
    * has ≥ 1 assistant turn, alternates cleanly, no empty turns. All
    * counts exact; the share is one IEEE division.
    *
    * Scale shape: one hash shuffle on the conversation key serves both
    * the lag window and the aggregate (same partitioning, exchange
    * reused — the renderConversations plan); state never exceeds one
    * conversation.
    */
  def chatStats(turns: DataFrame, convId: Column, order: Column,
                role: Column, content: Column): DataFrame = {
    val base = turns.select(convId.cast("long").as("conv_id"),
      order.cast("long").as("ord"), role.cast("string").as("role"),
      content.cast("string").as("content"))
    val w = Window.partitionBy(col("conv_id")).orderBy(col("ord"))
    base
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("alt_violation",
        (col("prev_role").isNotNull && col("prev_role") === col("role"))
          .cast("long"))
      .withColumn("is_empty",
        (length(trim(col("content"))) === 0).cast("long"))
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum((col("role") === "user").cast("long")).as("n_user"),
        sum((col("role") === "assistant").cast("long")).as("n_assistant"),
        sum(col("alt_violation")).as("n_alt_violations"),
        sum(col("is_empty")).as("n_empty"),
        min(struct(col("ord"), col("role"))).getField("role")
          .as("first_role"),
        sum(when(col("role") === "assistant",
          length(col("content")).cast("long")).otherwise(lit(0L)))
          .as("assistant_chars"),
        sum(length(col("content")).cast("long")).as("content_chars"))
      .withColumn("assistant_char_share",
        when(col("content_chars") > 0,
          col("assistant_chars").cast("double")
            / col("content_chars").cast("double")).otherwise(lit(0.0)))
      .withColumn("keep",
        (col("first_role") === "user" && col("n_assistant") >= 1 &&
          col("n_alt_violations") === 0 && col("n_empty") === 0)
          .cast("int"))
  }
}
