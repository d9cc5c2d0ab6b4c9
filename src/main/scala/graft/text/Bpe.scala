package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary training (Sennrich et al.,
  * ACL'16) — the tokenizer-building stage of a training-data pipeline.
  *
  * Scale shape — the classic BPE trick: the corpus collapses ONCE to the
  * distinct-word frequency table (Zipf: ~10⁵–10⁷ rows at any corpus size),
  * and every merge round runs over THAT table, never the corpus. A round
  * is: adjacent-symbol pair counts (explode + partial-agg sum), a 1-row
  * `orderBy.limit(1).collect()` for the winning pair (bounded driver
  * traffic by construction), and a narrow per-row fold applying the merge.
  * Lineage is cut with `localCheckpoint` every few rounds so round N's
  * plan doesn't replay rounds 1..N-1.
  *
  * Determinism: counts are exact integers; the winning pair tie-breaks
  * `(count desc, left asc, right asc)` — training is bit-reproducible on
  * any engine, so the merge table (not the iteration) is the contract.
  */
object Bpe {

  /** Distinct normalized words with occurrence counts — the one corpus
    * pass everything else derives from. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol)))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Adjacent-pair counts over a (word, n, syms) state: Σ n per (left,
    * right) symbol pair. Partial-agg friendly; rows bounded by the
    * distinct-pair vocabulary. */
  private[graft] def pairCounts(state: DataFrame): DataFrame =
    state
      .select(col("n"), explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1), i =>
            struct(element_at(col("syms"), i).as("left"),
              element_at(col("syms"), i + 1).as("right"))))
        .otherwise(array().cast("array<struct<left:string,right:string>>")))
        .as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("n")).as("pair_count"))

  /** Character-level round-1 pair counts straight from a corpus — the
    * SQL-oracle surface for the counting machinery ([[train]] iterates on
    * exactly this shape). */
  def charPairCounts(df: DataFrame, textCol: String): DataFrame =
    pairCounts(wordCounts(df, textCol)
      .withColumn("syms", split(col("word"), "")))

  /** One leftmost-greedy merge pass over a symbol array: every
    * non-overlapping (left, right) occurrence becomes the concatenated
    * token, scanning left to right — the standard BPE apply step as a
    * fold, no UDF. */
  private[graft] def applyMerge(syms: Column, left: String, right: String)
      : Column = {
    val merged = left + right
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === left && x === right,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))
  }

  /** A learned merge: rank is 1-based application order. */
  case class Merge(rank: Int, left: String, right: String, merged: String,
      pairCount: Long)

  /** Train `nMerges` BPE merges on the corpus. Stops early when no pair
    * reaches `minPairCount`. Returns the merge table in application
    * order. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      minPairCount: Long = 2L): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var state = wordCounts(df, textCol)
      .withColumn("syms", split(col("word"), ""))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val top = pairCounts(state)
        .filter(col("pair_count") >= minPairCount)
        .orderBy(col("pair_count").desc, col("left").asc, col("right").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, l + r, c)
        state = state.withColumn("syms", applyMerge(col("syms"), l, r))
        // cut lineage every few rounds; the state is vocabulary-sized
        if (rank % 4 == 0) state = state.localCheckpoint()
        rank += 1
      }
    }
    merges.result()
  }

  /** The merge table as a DataFrame (rank, left, right, merged,
    * pair_count) — the persistable training artifact. */
  def trainTable(s: SparkSession, df: DataFrame, textCol: String,
      nMerges: Int, minPairCount: Long = 2L): DataFrame = {
    import s.implicits._
    train(df, textCol, nMerges, minPairCount)
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Tokenize a text column with a learned merge list: per normalized
    * word, chars then each merge applied in rank order, flattened — the
    * inference-side counterpart proving the merge table is
    * self-contained. Narrow (no shuffle, no UDF): nested HOFs only. */
  def tokenize(df: DataFrame, textCol: String, merges: Seq[Merge],
      outCol: String = "tokens"): DataFrame = {
    val ws = filter(TextOps.tokens(col(textCol)),
      w => w =!= "")
    val ordered = merges.sortBy(_.rank)
    val perWord = transform(ws, w =>
      ordered.foldLeft(split(w, ""))((c, m) =>
        applyMerge(c, m.left, m.right)))
    df.withColumn(outCol, flatten(perWord))
  }

  /** [[tokenize]] re-expressed as chained LITERAL string replaces — the
    * corpus-tokenization hot path. Each word becomes a double-separator
    * representation (`␟␟a␟␟b␟␟…`, U+001F — outside any alphanumeric
    * vocabulary) and each merge is ONE non-overlapping left-to-right
    * `replace` of `␟l␟␟r␟` with `␟lr␟`: the double boundary means a
    * replacement consumes only the INNER separator pair, so the shared
    * boundary with an adjacent candidate survives and `l r l r`
    * collapses to `lr lr` exactly as the leftmost-greedy fold does
    * (BpeSpec pins `tokenizeFast == tokenize` on the corpus plus the
    * adversarial overlap fixtures, and q163's DuckDB oracle runs the
    * SAME replace chain). Unlike the [[applyMerge]] fold — nested
    * interpreted higher-order aggregates, one lambda frame per symbol —
    * the replace chain is a plain codegen'd string pipeline: at corpus
    * scale this is the difference between an interpreted and a compiled
    * tokenizer, same bits.
    *
    * PRECONDITION (structurally enforced): no word may contain the
    * U+001F separator, or the seeded representation is ambiguous and the
    * chain can diverge from [[tokenize]]. Words here always come from
    * [[TextOps.tokens]] ([[graft.functions.FastTokens.compute]]), which
    * emits only `[a-z0-9]` bytes — U+001F cannot survive tokenization.
    * BpeSpec pins the stripping invariant so a tokenizer change that
    * starts passing control bytes through fails loudly. */
  def tokenizeFast(df: DataFrame, textCol: String, merges: Seq[Merge],
      outCol: String = "tokens"): DataFrame = {
    val sep = "\u001f"
    val sep2 = sep + sep
    val ordered = merges.sortBy(_.rank)
    val ws = filter(TextOps.tokens(col(textCol)), w => w =!= "")
    val perWord = transform(ws, w => {
      val seeded = concat(lit(sep2), regexp_replace(w, "(.)", "$1" + sep2))
      val folded = ordered.foldLeft(seeded)((c, m) =>
        replace(c, lit(sep + m.left + sep2 + m.right + sep),
          lit(sep + m.merged + sep)))
      val arr = split(folded, java.util.regex.Pattern.quote(sep2))
      slice(arr, lit(2), size(arr) - 2)
    })
    df.withColumn(outCol, flatten(perWord))
  }
}
