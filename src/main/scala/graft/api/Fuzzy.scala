package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string-similarity JOIN builders over two arbitrary
  * (id, text) frames — the generic "fuzzy join" primitive (entity
  * resolution, dirty→clean reconciliation) composed from the same
  * block-then-verify discipline as the Dedup LSH stack: cheap equi-join
  * candidate blocking first, the expensive verifier only inside blocks.
  */
object Fuzzy {

  /** Edit-distance join: all (a_id, b_id, dist) pairs with
    * `levenshtein(a_text, b_text) <= maxDist`, candidates blocked by
    * (prefix equality, length band).
    *
    * Blocking semantics — the recall contract a caller must know:
    *  - the LENGTH BAND (`|len(a) − len(b)| <= maxDist`) is exact: edit
    *    distance can never beat it, so it loses nothing;
    *  - the PREFIX BLOCK (`first blockLen chars equal`) is a heuristic:
    *    a pair whose edits touch the first `blockLen` characters is
    *    MISSED (ApiSpec pins this on a planted in-prefix typo). That is
    *    the standard trade for linear candidate volume; callers needing
    *    exact recall at maxDist=k can union `k+1` passes blocked on
    *    pigeonhole segments instead — each pass is this same builder
    *    shape.
    *
    * Scale shape: ONE equi-join keyed on the block prefix (the band rides
    * along as a post-join predicate on the same hash exchange — no
    * theta-join, no cartesian), then the verifier runs per candidate.
    * The verifier is Spark's THRESHOLDED `levenshtein(a, b, maxDist)` —
    * the banded O(maxDist·min(m,n)) algorithm that abandons a row the
    * moment the running distance exceeds the bound, not the full O(m·n)
    * matrix; it returns −1 above the bound, which doubles as the filter.
    * Block sizes follow the text's prefix distribution: a skewed prefix
    * (one hot block) is the caller's salting seam, same as a skewed join
    * key anywhere else.
    */
  def levenshteinJoin(left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      maxDist: Int = 1, blockLen: Int = 4): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockLen >= 1, s"blockLen must be >= 1, got $blockLen")
    val l = left.select(col(leftId).as("a_id"), col(leftText).as("a_txt"),
      substring(col(leftText), 1, blockLen).as("a_blk"),
      length(col(leftText)).as("a_len"))
    val r = right.select(col(rightId).as("b_id"), col(rightText).as("b_txt"),
      substring(col(rightText), 1, blockLen).as("b_blk"),
      length(col(rightText)).as("b_len"))
    l.join(r, col("a_blk") === col("b_blk") &&
        abs(col("a_len") - col("b_len")) <= maxDist)
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_txt"), col("b_txt"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** Token-set Jaccard join: all (a_id, b_id, jaccard) pairs with
    * whitespace-token Jaccard similarity `>= minSim`, candidates blocked
    * by shared tokens under a document-frequency cap.
    *
    * Composition, not new machinery: candidates come from
    * [[Dedup.crossNgramCandidates]]-style inverted-index blocking — here
    * a token-keyed self-of-two-sides index where tokens above `maxDf`
    * total occurrences are dropped from BLOCKING (never from the verify
    * measure), the df-cap discipline that keeps stop-word tokens from
    * emitting df² candidate pairs at corpus scale. Verification recomputes
    * exact Jaccard over the full token sets of each candidate pair.
    */
  def jaccardJoin(left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      minSim: Double = 0.5, maxDf: Int = 1000): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0, s"minSim in (0,1], got $minSim")
    val lt = left.select(col(leftId).as("a_id"),
      array_distinct(split(col(leftText), "\\s+")).as("a_toks"))
    val rt = right.select(col(rightId).as("b_id"),
      array_distinct(split(col(rightText), "\\s+")).as("b_toks"))
    val li = lt.select(col("a_id"), explode(col("a_toks")).as("tok"))
    val ri = rt.select(col("b_id"), explode(col("b_toks")).as("tok"))
    // df cap over BOTH sides' postings: a token seen more than maxDf times
    // total is blocked from candidate generation (cost bound); pairs it
    // alone would have surfaced are the documented recall trade
    val df = li.select(col("tok")).unionAll(ri.select(col("tok")))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("tok")
    val cand = li.join(df, "tok").join(ri.join(df, "tok"), "tok")
      .select("a_id", "b_id").distinct()
    cand.join(lt, "a_id").join(rt, "b_id")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_toks"), col("b_toks"))).cast("double") /
          size(array_union(col("a_toks"), col("b_toks")))).as("jaccard"))
      .filter(col("jaccard") >= minSim)
  }
}
