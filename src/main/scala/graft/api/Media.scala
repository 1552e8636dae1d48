package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parameterized builders over opaque BINARY media payload columns — the
  * dedup half of the multimodal surface (SURVEY §2.9/§2.11): exact payload
  * dedup is a plain hash aggregate any caller composes (`md5`/`sha2` at
  * payload grain, the `llm_exact_dedup` discipline); the perceptual-style
  * near-dup path needs a SIGNATURE a banding join can bucket on, which is
  * what this module provides. No codec libraries exist in-container, so the
  * signature is pure byte arithmetic over the payload region — the exact
  * plumbing a real perceptual hash (pHash/dHash over decoded pixels) would
  * slot into, with the decode stage swapped for direct byte reads.
  */
object Media {

  /** k-window BYTE-PROFILE SIGNATURE of a binary payload region — the
    * simhash-style bit vector behind [[graft.ops.Udfs]]'
    * `llm_multimodal_neardup`: the region (payload bytes after `skip` — a
    * parsed header length) splits into `windows` equal slices, and bit `w`
    * is set iff slice `w`'s mean byte value is at least the whole region's
    * mean (cross-multiplied exact integers — `ws·tn ≥ ts·wn` — so no
    * division, no float ties). Returns (id, sig). Two payloads whose
    * coarse byte-energy profiles match (identical media, re-encoded
    * copies, single-byte perturbations) collide; structurally different
    * content splits. An empty region (payload no longer than its header)
    * signs as all-ones — every `0 ≥ 0` comparison true, deterministic.
    *
    * Scale shape: ONE explode at region-byte grain (bounded by payload
    * size; byte reads are binary-safe `conv(hex(substring))` — no string
    * cast of non-ASCII bytes, the llm_multimodal_audio discipline), two
    * map-side-combinable hash aggregates ((id, window) sums, then the
    * per-id fold), and one id-keyed join of the region totals — which
    * derive from the window sums, so the payload is read exactly once. No
    * UDF, no driver hop, no pairwise work: pairing is the caller's banded
    * join ([[graft.api.Dedup.saltedBandPairs]] on the signature).
    */
  def windowProfileSignature(df: DataFrame, idCol: String, payloadCol: String,
      skip: Column, windows: Int = 16): DataFrame = {
    require(windows >= 1 && windows <= 30,
      s"windows must be in 1..30 (bits of an int shift), got $windows")
    val base = df.select(col(idCol).as("id"), col(payloadCol).as("pl"),
        skip.cast("int").as("skip"))
      .withColumn("plen", length(col("pl")) - col("skip"))
    // sequence(1, plen) runs DESCENDING for plen < 1 (the shingleHashes
    // landmine) — empty regions route around the explode entirely.
    // (r17 note: "hex the payload once per row, slice 2-char substrings
    // per byte" MEASURED 2.5× SLOWER — STRING substring walks the string
    // per call where BINARY substring is a direct O(1) byte slice, so the
    // per-byte loop went quadratic in payload length. The per-byte
    // hex(substring(binary)) form stands.)
    val exploded = base.filter(col("plen") > 0)
      .select(col("id"), col("pl"), col("skip"), col("plen"),
        explode(sequence(lit(1), col("plen"))).as("i"))
      .select(col("id"),
        expr(s"((i - 1) * $windows) div plen").as("w"),
        expr("cast(conv(hex(substring(pl, skip + i, 1)), 16, 10) as bigint)")
          .as("b"))
    val wsums = exploded.groupBy("id", "w")
      .agg(sum(col("b")).as("ws"), count(lit(1)).as("wn"))
    val totals = wsums.groupBy("id")
      .agg(sum(col("ws")).as("ts"), sum(col("wn")).as("tn"))
    // the mean comparison cross-multiplies in DECIMAL(19,0) factors
    // (DECIMAL(38,0) products — the assortativity overflow rule): ws·tn
    // ~ 16·plen² wraps a BIGINT past ~760 MB payload regions, and a
    // perceptual signature over multi-GB media must not flip bits on
    // silent overflow
    val sig = wsums.join(totals, "id")
      .groupBy("id")
      .agg(sum(expr("CASE WHEN CAST(ws AS DECIMAL(19,0)) * CAST(tn AS DECIMAL(19,0)) " +
        ">= CAST(ts AS DECIMAL(19,0)) * CAST(wn AS DECIMAL(19,0)) THEN " +
        "CAST(shiftleft(1, w) AS BIGINT) ELSE 0L END")).as("sig"))
    sig.unionByName(base.filter(col("plen") <= 0)
      .select(col("id"), lit((1L << windows) - 1).as("sig")))
  }
}
