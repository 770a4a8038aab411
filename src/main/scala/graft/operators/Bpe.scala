package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer TRAINING and ENCODING as corpus
  * operators (Sennrich et al. 2016 — the subword scheme behind
  * GPT-2/RoBERTa-era vocabularies). A training-data engine that
  * counts tokens needs the tokenizer itself to be derivable from the
  * corpus it curates.
  *
  * Scale design — the corpus is touched ONCE per call:
  *
  *  - [[learn]] first reduces the corpus to its word VOCABULARY
  *    (one map-side-combinable groupBy; the vocab is bounded by
  *    distinct-word count, not corpus bytes — the same reduction
  *    sentencepiece/HF trainers perform). All `rounds` merge
  *    iterations then run on the vocab alone: pair counting is a
  *    vocab-scale aggregate weighted by word frequency, and the
  *    per-round driver state is exactly ONE winner row.
  *  - [[encode]] applies the learned merges to the VOCAB (bounded),
  *    then broadcast-joins the encoded vocab back to the corpus token
  *    stream — per-document piece counts cost one scan + one
  *    broadcast join + one aggregate, with no per-round corpus work.
  *
  * Merge application is the declarative gaps-and-islands form, not a
  * per-row loop: adjacent (sym, next) matches of the winning pair
  * form runs; within a run only even offsets merge (greedy
  * left-to-right non-overlap — `[a,a,a]` under merge `a a` yields
  * `[aa, a]`); the right half of every applied merge is dropped via
  * lag. Window partitions are vocab words — bounded and parallel.
  * Every step (including the `cnt DESC, lhs, rhs` winner tie-break)
  * is deterministic and replays in DuckDB SQL, so both operators are
  * oracle-checkable despite being iterative.
  */
object Bpe {

  /** Character symbols of a word — regexp form shared verbatim with
    * the SQL oracle (`regexp_extract_all(word, '.')`).
    */
  private def chars(c: org.apache.spark.sql.Column) =
    regexp_extract_all(c, lit("."), lit(0))

  /** (word, weight, syms) — the frequency-weighted word vocabulary
    * with initial character symbols. Lowercased whitespace tokens,
    * matching [[TextFunctions.tokens]] everywhere else.
    */
  def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("weight"))
      .withColumn("syms", chars(col("word")))

  /** Frequency of every adjacent symbol pair (overlapping occurrences
    * counted, classic get_stats), weighted by word frequency.
    */
  private def pairCounts(v: DataFrame): DataFrame = {
    val w = Window.partitionBy("word").orderBy("pos")
    v.select(col("word"), col("weight"), posexplode(col("syms")))
      .withColumnRenamed("col", "sym")
      .withColumn("nxt", lead("sym", 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("sym").as("lhs"), col("nxt").as("rhs"))
      .agg(sum("weight").as("cnt"))
  }

  /** One merge round: replace every greedy-left-to-right occurrence
    * of (lhs, rhs) in each word's symbol array with the concatenated
    * symbol.
    */
  def applyMerge(v: DataFrame, lhs: String, rhs: String): DataFrame = {
    val byPos = Window.partitionBy("word").orderBy("pos")
    val ex = v.select(col("word"), col("weight"), posexplode(col("syms")))
      .withColumnRenamed("col", "sym")
      .withColumn("nxt", lead("sym", 1).over(byPos))
      .withColumn("raw",
        (col("sym") === lit(lhs) && col("nxt") === lit(rhs)).cast("int"))
      // consecutive raw matches (only possible when rhs == lhs) form an
      // island: pos - cumulative-match-count is constant inside it
      .withColumn("cum", sum("raw").over(byPos))
      .withColumn("island", when(col("raw") === 1, col("pos") - col("cum")))
    val islandStart = Window.partitionBy("word", "island")
    val marked = ex
      .withColumn("keep", col("raw") === 1 &&
        (col("pos") - min("pos").over(islandStart)) % 2 === 0)
      .withColumn("dropRight",
        coalesce(lag("keep", 1).over(byPos), lit(false)))
    marked.filter(!col("dropRight"))
      .withColumn("outSym",
        when(col("keep"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")))
      .groupBy("word", "weight")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("outSym")))),
        x => x.getField("outSym")).as("syms"))
  }

  /** The first `rounds` BPE merges learned from the corpus:
    * (merge_rank, lhs, rhs, merged, weight). Stops early if the vocab
    * runs out of adjacent pairs. Driver state: one winner row per
    * round.
    */
  def learn(df: DataFrame, textCol: String, rounds: Int): DataFrame =
    learnState(df, textCol, rounds)._1

  /** The merge loop, also returning the post-merge vocabulary (each
    * round's checkpoint makes it free) so [[encode]] does not replay
    * every merge over a fresh vocab — the replay doubled encode's
    * job count for an artifact `learn` had already materialized.
    */
  private def learnState(df: DataFrame, textCol: String,
      rounds: Int): (DataFrame, DataFrame) = {
    require(rounds > 0, s"rounds must be positive: $rounds")
    val spark = df.sparkSession
    var v = vocab(df, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val winner = pairCounts(v)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs")).limit(1)
        .collect()
      winner.headOption match {
        case Some(row) =>
          val (l, rr, c) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += Row(r.toLong, l, rr, l + rr, c)
          v = applyMerge(v, l, rr).localCheckpoint(true)
          r += 1
        case None => exhausted = true
      }
    }
    val mergeDf = spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1),
      StructType(Seq(
        StructField("merge_rank", LongType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("weight", LongType, nullable = false))))
    (mergeDf, v)
  }

  /** Per-document token and BPE-piece counts under the first `rounds`
    * learned merges: (id, n_tokens, n_pieces). The merges and the
    * encoded vocab are computed once (vocab-scale); the corpus pays
    * one scan, one broadcast join, one aggregate.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    val (_, v) = learnState(df, textCol, rounds)
    val pieces = v.select(col("word"), size(col("syms")).as("n_pieces"))
    df.select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .join(broadcast(pieces), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum("n_pieces").as("n_pieces"))
  }
}
