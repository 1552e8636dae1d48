package graft

import org.apache.spark.sql.functions._

/** §2.9: property tests for the LLM-pipeline operators (SURVEY.md §5.2). */
class LlmSpec extends SparkSpec {

  test("exact dedup: survivors == distinct normalized texts per corpus") {
    import spark.implicits._
    val df = q("llm_exact_dedup")
    val survivors = df.agg(sum("n_survivors")).head().getLong(0)
    val distinct = graft.ops.T.documents(spark, sf)
      .select(lower(trim(col("text")))).distinct().count()
    assert(survivors == distinct)
    // idempotence: fixtures have no exact dups → survivors == docs
    val docs = df.agg(sum("n_docs")).head().getLong(0)
    assert(survivors == docs)
  }

  test("minhash near-dup finds the planted near-identical pairs, all >= 0.8") {
    import spark.implicits._
    val pairs = q("llm_minhash_neardup")
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty, "LSH found no candidate pairs on planted near-dups")
    assert(pairs.forall(_._3 >= 0.8))
    assert(pairs.forall(p => p._1 < p._2))
    // soundness vs brute force: every reported pair really has J >= 0.8
    // (fixtures plant ~23 near-identical pairs with J >= 0.96; 4x8 banding
    // at J≈0.97 has >99% per-pair recall, so we also expect most found)
    assert(pairs.length >= 15, s"expected most planted pairs, got ${pairs.length}")
  }

  test("identical texts always collide in minhash LSH") {
    import spark.implicits._
    graft.functions.SketchFunctions.register(spark)
    // planted exact duplicates in a literal corpus through the production
    // signature pipeline (shingle hash rows -> MinHashAgg)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content that shares nothing with the others here"))
      .toDF("doc_id", "text")
    val hs = docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 4)).as("i"))
      .select(col("doc_id"), xxhash64(expr("substring(text, i, 5)")).as("h"))
    val sigs = hs.groupBy("doc_id").agg(expr("minhash_agg(h)").as("mh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L), "identical docs must have identical minhash")
    assert(sigs(1L) != sigs(3L), "different docs should differ")
  }

  test("cosine top-k: self excluded, cos in [-1,1], ranks dense 1..5") {
    import spark.implicits._
    val rows = q("llm_cosine_topk")
      .select("q_id", "neighbor_id", "cos", "rn").as[(Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, n, c, r) => q != n && c >= -1.0001 && c <= 1.0001 && r >= 1 && r <= 5 })
    val perQ = rows.groupBy(_._1).values
    assert(perQ.forall(_.map(_._4).sorted.sameElements(1 to 5)))
    // neighbors are ordered by descending cosine within each query
    assert(perQ.forall { g => val s = g.sortBy(_._4).map(_._3); s.zip(s.tail).forall { case (a, b) => a >= b - 1e-9 } })
  }

  test("knn accuracy is sane and covers all labels") {
    import spark.implicits._
    val acc = q("llm_knn_label").select("label", "accuracy").as[(Int, Double)].collect()
    assert(acc.nonEmpty)
    assert(acc.forall { case (_, a) => a >= 0.0 && a <= 1.0 })
  }

  test("ngram jaccard pairs are within (0,1] and symmetric-free (a<b)") {
    import spark.implicits._
    val rows = q("llm_ngram_jaccard").select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(rows.forall { case (a, b, j) => a < b && j > 0.0 && j <= 1.0 })
  }

  test("tfidf: top tokens have positive score, rank 1..3 per doc") {
    val df = q("llm_tfidf")
    assert(df.filter(col("rn") > 3).count() == 0)
    assert(df.filter(col("tfidf") < 0).count() == 0)
  }

  test("quality filter keeps a subset") {
    import spark.implicits._
    val r = q("llm_quality_filter").select("n_docs", "n_kept").as[(Long, Long)].collect()
    assert(r.forall { case (n, k) => k >= 0 && k <= n })
  }

  test("lang id beats random guessing on the corpus it trained on") {
    import spark.implicits._
    val acc = q("llm_lang_id").select("accuracy").as[Double].collect()
    assert(acc.nonEmpty && acc.max > 0.2, s"lang-id accuracy suspiciously low: ${acc.toSeq}")
  }

  test("fingerprints are unique for the (dup-free) fixture corpus") {
    val df = q("llm_fingerprint")
    assert(df.select("fp_md5").distinct().count() == df.count())
  }

  test("hot LSH bucket (1000 identical docs) distributes: all candidate pairs emitted") {
    import spark.implicits._
    // mass-duplicated boilerplate is the NORM in web corpora: 1000 identical
    // docs land in ONE (band, bsig) bucket in every band. The salted
    // pair-join must emit all k(k-1)/2 candidate pairs spread over the salt
    // fan-out — not one task holding a 1000-element collect_list row.
    val hot = (1L to 1000L).map(i =>
      (i, "mass duplicated boilerplate body that appears verbatim across the whole web corpus again and again"))
    val cold = Seq(
      (2001L, "one unrelated document with entirely distinct vocabulary and no shared phrasing at all"),
      (2002L, "another standalone body of text sharing nothing with the boilerplate or with the first"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    val n = graft.api.Dedup.minhashCandidates(docs, "doc_id", "text").count()
    assert(n == 1000L * 999 / 2, s"expected all hot-bucket pairs, got $n")
  }

  test("minhashPairs fully verifies a hot bucket: every pair at jaccard 1.0") {
    import spark.implicits._
    val hot = (1L to 60L).map(i =>
      (i, "the very same boilerplate paragraph repeated verbatim in every single one of these documents"))
    val docs = (hot :+ (999L, "a lone unrelated document that matches none of the duplicated boilerplate above"))
      .toDF("doc_id", "text")
    val pairs = graft.api.Dedup.minhashPairs(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(pairs.length == 60 * 59 / 2)
    assert(pairs.forall(_._3 == 1.0))
    assert(pairs.forall(p => p._1 < p._2 && p._2 <= 60L))
  }

  test("embed near-dup recovers exactly the 20 planted perturbed vectors, cos >= 0.95") {
    import spark.implicits._
    val rows = q("llm_embed_neardup").select("a_id", "b_id", "cos")
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.length == 20, s"expected the 20 planted pairs, got ${rows.length}")
    assert(rows.forall(r => r._2 == r._1 + 10000000L),
      "every pair must link an original to its planted perturbation")
    assert(rows.forall(_._3 >= 0.95))
  }

  test("semdedup partitions the corpus and drops only cosine-dups of lower ids") {
    import spark.implicits._
    val rows = q("llm_semdedup")
      .select("cell", "n_docs", "n_pairs", "n_dropped", "n_kept")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val corpus = graft.ops.T.embeddings(spark, sf).count()
    // cells partition the corpus exactly; greedy keep-lowest invariants hold
    assert(rows.map(_._2).sum == corpus, "cells must partition the corpus")
    assert(rows.forall(r => r._5 == r._2 - r._4))
    assert(rows.forall(r => r._4 <= r._3), "can't drop more docs than pairs")
    assert(rows.forall(r => r._4 < r._2), "the lowest id of a cell always survives")
    // threshold 0.4 sits inside the fixture's organic cosine range, so the
    // fixture must actually exercise the drop path
    assert(rows.map(_._3).sum > 0, "fixture should produce in-cell dup pairs")
  }

  test("weighted percentile equals a driver-side weighted-rank fold") {
    import spark.implicits._
    val got = q("agg_weighted_percentile")
      .select("l_returnflag", "wp50", "wp90")
      .as[(String, Double, Double)].collect()
      .map { case (f, a, b) => f -> (a, b) }.toMap
    val rows = graft.ops.T.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_quantity")
      .as[(String, Double, Double)].collect().toSeq
    rows.groupBy(_._1).foreach { case (flag, es) =>
      val sorted = es.sortBy(_._2)
      val total = es.map(_._3).sum
      // same exact integer arithmetic as the operator (cw·q ≥ tw·p): a
      // float p*total can sit one ulp off an exact integer boundary
      def wp(num: Int, den: Int): Double = {
        var cum = 0.0
        sorted.find { e => cum += e._3; cum * den >= total * num }.get._2
      }
      assert(got(flag)._1 == wp(1, 2), s"$flag wp50")
      assert(got(flag)._2 == wp(9, 10), s"$flag wp90")
    }
  }

  test("multimodal decode preserves row count and computes deterministic checksums") {
    val df = q("llm_multimodal_decode")
    val docs = graft.ops.T.documents(spark, sf).count()
    assert(df.count() == docs)
    val a = df.agg(sum("payload_checksum")).head().getLong(0)
    val b = q("llm_multimodal_decode").agg(sum("payload_checksum")).head().getLong(0)
    assert(a == b)
  }

  test("multimodal audio parses real RIFF/WAVE headers: LE fields and " +
      "window energies reconstruct from payload bytes alone") {
    val df = q("llm_multimodal_audio")
    val docs = graft.ops.T.documents(spark, sf).count()
    assert(df.count() == docs)
    val row = df.agg(sum(when(col("riff_ok"), 0).otherwise(1)),
      min("audio_fmt"), max("audio_fmt"), min("n_channels"), max("bits"),
      min("sample_rate"), max("sample_rate")).head()
    assert(row.getLong(0) == 0L, "every payload's three chunk magics parse")
    assert(row.getInt(1) == 1 && row.getInt(2) == 1, "PCM format tag")
    assert(row.getInt(3) == 1 && row.getInt(4) == 8, "mono 8-bit")
    // sample rate is a little-endian u32 DERIVED field: parsing it back in
    // range proves the byte re-assembly (a swapped byte order would land
    // far outside 8000..11500)
    assert(row.getInt(5) >= 8000 && row.getInt(6) <= 11500)
    // energy windows tile the PCM region exactly: their sum equals the
    // whole-region byte sum, which for ASCII text is between 32·L and 127·L
    val e = df.selectExpr("data_len",
      "e0+e1+e2+e3+e4+e5+e6+e7 AS esum").filter(col("data_len") > 0)
    assert(e.filter(col("esum") < col("data_len") * 32 ||
      col("esum") > col("data_len") * 127).count() == 0L)
  }

  test("multimodal decode parses real P6 headers: every payload's pixel " +
      "region matches its parsed dimensions") {
    val df = q("llm_multimodal_decode")
    // size_ok is computed from PARSED width/height vs the byte count after
    // the PARSED header length — a mis-parse (wrong offset, wrong digits)
    // cannot produce 3·w·h pixel bytes by accident across the corpus
    val row = df.agg(sum(lit(1) - col("size_ok")), min("width"), min("height"),
      max("maxval"), min("maxval")).head()
    assert(row.getLong(0) == 0L, "every row must have size_ok = 1")
    assert(row.getInt(1) >= 4 && row.getInt(2) >= 3, "parsed dims in range")
    assert(row.getInt(3) == 255 && row.getInt(4) == 255, "P6 maxval parsed")
  }

  test("llm_zipf_slope matches an exact driver-side least-squares recompute") {
    import spark.implicits._
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect()
    // rank by (freq desc, word asc), exactly like the op
    val ranked = counts.sortBy { case (w, c) => (-c, w) }.zipWithIndex
      .map { case ((_, c), i) => (i + 1L, c) }.take(200)
    val xs = ranked.map { case (rk, _) => q6(math.log10(rk.toDouble)) }
    val ys = ranked.map { case (_, c) => q6(math.log10(c.toDouble)) }
    def dsum(v: Seq[Double]): Double =
      v.map(x => BigDecimal(q6(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val n = xs.length.toDouble
    val (sx, sy) = (dsum(xs.toSeq), dsum(ys.toSeq))
    val sxy = dsum(xs.zip(ys).map { case (a, b) => q6(a * b) }.toSeq)
    val sxx = dsum(xs.map(a => q6(a * a)).toSeq)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r = q("llm_zipf_slope").collect()(0)
    assert(r.getAs[Long]("n_types") === counts.length.toLong)
    assert(r.getAs[Long]("n_top") === ranked.length.toLong)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-9)
    assert(slope < 0.0, "frequency must decay with rank")
  }

  test("llm_source_overlap equals exact per-source trigram set intersections") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text")).as[(String, String)].collect()
    val sets = docs.groupBy(_._1).view.mapValues { ds =>
      ds.flatMap { case (_, t) =>
        val w = t.split(" ")
        w.indices.dropRight(2).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
      }.toSet
    }.toMap
    val expect = (for {
      s1 <- sets.keys; s2 <- sets.keys if s1 < s2
      c = (sets(s1) & sets(s2)).size if c > 0
    } yield (s1, s2) ->
      (c.toLong, c.toDouble / math.min(sets(s1).size, sets(s2).size))).toMap
    val got = q("llm_source_overlap").collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2")) ->
        (r.getAs[Long]("common"), r.getAs[Double]("overlap"))).toMap
    assert(got === expect)
    assert(got.nonEmpty)
    got.values.foreach { case (_, o) => assert(o > 0.0 && o <= 1.0) }
  }

  test("llm_ngram_novelty equals exact first-occurrence set arithmetic") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val grams = docs.map { case (id, t) =>
      val w = t.split(" ")
      id -> w.indices.dropRight(2).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }.toMap
    val firstSeen = grams.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val got = q("llm_ngram_novelty").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty"))).toMap
    assert(got.keySet === grams.keySet.filter(grams(_).nonEmpty))
    got.foreach { case (id, (ng, nn, nov)) =>
      val gs = grams(id)
      val novel = gs.count(g => firstSeen(g) == id).toLong
      assert(ng === gs.size.toLong, s"doc $id gram count")
      assert(nn === novel, s"doc $id novel count")
      assert(nov === novel.toDouble / gs.size)
    }
    // the minimum doc id is all-novel by construction
    val minId = grams.keys.min
    assert(got(minId)._3 === 1.0)
  }

  test("llm_minhash_est_err: exact pair Jaccards, est on the 1/16 grid, " +
      "and a planted identical pair estimates 1.0 with zero error") {
    import spark.implicits._
    val rows = q("llm_minhash_est_err").collect()
    assert(rows.nonEmpty)
    // exact side recomputed driver-side from distinct word-3-gram sets
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val grams = docs.map { case (id, t) =>
      val w = t.split(" ")
      id -> w.indices.dropRight(2).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }.toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      val (ga, gb) = (grams(a), grams(b))
      val common = (ga & gb).size.toLong
      assert(r.getAs[Long]("common") === common, s"($a,$b) common")
      assert(r.getAs[Long]("a_n") === ga.size.toLong)
      assert(r.getAs[Long]("b_n") === gb.size.toLong)
      val nm = r.getAs[Long]("n_match")
      assert(nm >= 0L && nm <= 16L)
      assert(r.getAs[Double]("est_j") === nm.toDouble / 16)
      assert(r.getAs[Double]("err") ===
        r.getAs[Double]("est_j") - r.getAs[Double]("exact_j"))
    }
    // planted identical pair: all 16 signature minima must collide
    val lit2 = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val sig = graft.api.Dedup.md5MinhashSignatures(lit2, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (0 until 16).map(j => r.getAs[String](s"m$j"))).toMap
    assert(sig(1L) === sig(2L), "identical docs must share every minimum")
    assert(sig(1L) !== sig(3L), "distinct docs must differ somewhere")
  }

  test("llm_pmi_bigrams: counts consistent and pmi matches the ln formula") {
    import spark.implicits._
    val rows = q("llm_pmi_bigrams")
      .select(col("u"), col("v"), col("c_uv"), col("c_u"), col("c_v"),
        col("pmi"))
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val toks = ops.T.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t")).as[String].collect()
    val n1 = toks.length.toDouble
    val uni = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n2 = ops.T.documents(spark, sf).select(col("text")).as[String]
      .collect().map(t => math.max(0, t.split(" ", -1).length - 1)).sum.toDouble
    rows.foreach { case (u, v, cuv, cu, cv, pmi) =>
      assert(cuv <= math.min(cu, cv), s"pair count exceeds unigram: $u $v")
      assert(cu == uni(u) && cv == uni(v), s"unigram drift for $u/$v")
      val want = math.log((cuv * n1 * n1) / (cu.toDouble * cv * n2))
      assert(math.abs(pmi - want) < 1e-4 + 1e-9,
        s"pmi drift for ($u,$v): got $pmi want $want")
    }
  }

  test("llm_score_linear: keep iff z >= 0, score is the sigmoid of z") {
    import spark.implicits._
    val rows = q("llm_score_linear")
      .select(col("n_toks"), col("stop_ratio"), col("avg_len"), col("z_q"),
        col("score"), col("keep"))
      .as[(Long, Double, Double, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    val kept = rows.count(_._6)
    assert(kept > 0 && kept < rows.length, "model must split the corpus")
    rows.foreach { case (n, sr, al, zq, score, keep) =>
      val z = sr * 6.0 + al - n.toDouble * 0.05 - 3.0
      assert(math.abs(zq - z) <= 5e-7 + 1e-12, s"z_q drift: $zq vs $z")
      assert(keep == (z >= 0.0), "keep must threshold the exact z")
      val sig = 1.0 / (1.0 + math.exp(-z))
      assert(math.abs(score - sig) < 1e-4 + 1e-9, s"score $score vs $sig")
      assert(score > 0.0 && score < 1.0)
    }
  }

  test("llm_hash_split partitions the corpus and follows the md5 nibble rule") {
    import spark.implicits._
    val splits = q("llm_hash_split")
      .select(col("split"), col("n_docs"), col("doc_share"))
      .as[(String, Long, Double)].collect().toSeq
    val total = ops.T.documents(spark, sf).count()
    assert(splits.map(_._2).sum == total, "splits must partition the corpus")
    assert(math.abs(splits.map(_._3).sum - 1.0) < 1e-12)
    assert(splits.map(_._1).toSet == Set("train", "val", "test"))
    val train = splits.find(_._1 == "train").get._2
    assert(train > total / 2, s"train split implausibly small: $train/$total")
    // spot-check membership is the documented pure function of doc_id
    val md = java.security.MessageDigest.getInstance("MD5")
    val wantTrain = ops.T.documents(spark, sf).select("doc_id").as[Long]
      .collect().count { id =>
        val nib = Integer.parseInt(
          md.digest(id.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.substring(0, 1), 16)
        md.reset(); nib < 12
      }
    assert(wantTrain.toLong == train,
      s"train membership drifted from the md5-nibble rule: $wantTrain vs $train")
  }

  test("llm_readability equals the per-row formula recount") {
    import spark.implicits._
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val rows = q("llm_readability").collect()
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val nw = t.split(" ", -1).length.toLong
      val nv = "[aeiou]+".r.findAllIn(t).length.toLong
      assert(r.getAs[Long]("n_words") === nw)
      assert(r.getAs[Long]("n_vgroups") === nv)
      val spw = nv.toDouble / nw
      assert(r.getAs[Double]("spw") === spw)
      assert(r.getAs[Double]("flesch") === 206.835 - 1.015 * nw - 84.6 * spw,
        "flesch must be the exact IEEE chain")
    }
  }

  test("llm_vocab_growth prefix sums close over a sequential scan") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val rows = q("llm_vocab_growth").collect()
    assert(rows.length === docs.length)
    assert(rows.last.getAs[Long]("cum_toks") ===
      docs.map(_._2.split(" ", -1).length.toLong).sum)
    assert(rows.last.getAs[Long]("cum_vocab") ===
      docs.flatMap(_._2.split(" ", -1)).distinct.length.toLong)
    val seen = scala.collection.mutable.Set[String]()
    var (ct, cv) = (0L, 0L)
    docs.zip(rows).foreach { case ((id, text), r) =>
      val toks = text.split(" ", -1)
      val nn = toks.distinct.count(!seen.contains(_)).toLong
      seen ++= toks
      ct += toks.length; cv += nn
      assert(r.getAs[Long]("doc_id") === id)
      assert(r.getAs[Long]("n_new_toks") === nn)
      assert(r.getAs[Long]("cum_toks") === ct)
      assert(r.getAs[Long]("cum_vocab") === cv)
    }
  }

  test("llm_auc_roc equals a brute-force pairwise AUC") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    def nib(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "0123456789abcdef".indexOf(f"${md(0) & 0xff}%02x".charAt(0)).toLong
    }
    val scored = docs.map { case (id, nc) => (nc, nc + 25L * nib(id) >= 480L) }
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filter(!_._2).map(_._1)
    // pairwise definition: P(s_pos > s_neg) + 0.5 P(tie)
    var num = 0.0
    for (p <- pos; n <- neg)
      num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val want = num / (pos.length.toDouble * neg.length)
    val r = q("llm_auc_roc").collect()(0)
    assert(r.getAs[Long]("n_pos") === pos.length.toLong)
    assert(r.getAs[Long]("n_neg") === neg.length.toLong)
    assert(math.abs(r.getAs[Double]("auc") - want) < 1e-12,
      s"rank-sum AUC ${r.getAs[Double]("auc")} vs pairwise $want")
  }

  test("llm_lift_gains identities: deciles partition, gains close at 1") {
    val rows = q("llm_lift_gains").collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.map(_.getAs[Int]("decile")).toSeq === (1 to 10))
    val n = rows.map(_.getAs[Long]("n")).sum
    val tp = rows.map(_.getAs[Long]("n_pos")).sum
    assert(n === 500L)
    rows.foreach { r =>
      assert(r.getAs[Double]("resp_rate") ===
        r.getAs[Long]("n_pos").toDouble / r.getAs[Long]("n"))
      assert(r.getAs[Double]("lift") ===
        r.getAs[Double]("resp_rate") / (tp.toDouble / n))
    }
    assert(rows.last.getAs[Double]("cum_gain") === 1.0)
    // the planted label is genuinely score-correlated: the top decile must
    // out-lift the bottom one decisively
    assert(rows.head.getAs[Double]("lift") > rows.last.getAs[Double]("lift"))
  }

  test("llm_ann_pq_recall emits one exact-ratio row per query") {
    val rows = q("llm_ann_pq_recall").collect()
    assert(rows.length === 10) // 500 vectors / 50
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0L && h <= 5L)
      assert(r.getAs[Double]("recall_at_5") === h / 5.0)
    }
    graft.api.Caches.sweep(spark)
  }

  test("llm_ann_ivfpq emits one exact-ratio row per query") {
    val rows = q("llm_ann_ivfpq").collect()
    assert(rows.length === 10) // 500 vectors / 50
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0L && h <= 5L)
      assert(r.getAs[Double]("recall_at_5") === h / 5.0)
    }
    graft.api.Caches.sweep(spark)
  }

  test("llm_doc_outlier cosines are bounded and label-coherent") {
    val rows = q("llm_doc_outlier").collect()
    assert(rows.length === 500)
    assert(rows.forall { r =>
      val c = r.getAs[Double]("cos_c"); c >= -1.0000001 && c <= 1.0000001
    })
    // every vector contributes 1/n of its own centroid, so the label-mean
    // cosine must be positive even on isotropic random embeddings
    q("llm_doc_outlier").collect().groupBy(_.getAs[Int]("label"))
      .values.foreach { g =>
        assert(g.map(_.getAs[Double]("cos_c")).sum / g.size > 0.0)
      }
  }

  test("llm_sentence_chunk packs 3 sentences per chunk, boundaries intact") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val re = java.util.regex.Pattern.compile("[^.!?]+[.!?]?")
    val rows = q("llm_sentence_chunk").collect()
      .groupBy(_.getAs[Long]("doc_id"))
    docs.foreach { case (id, text) =>
      val m = re.matcher(text)
      val sents = Iterator.continually(m).takeWhile(_.find())
        .map(_.group()).toArray
      if (sents.nonEmpty) {
        val chunks = rows(id).sortBy(_.getAs[Long]("chunk_id"))
        // chunk ids are contiguous from 0; all full except possibly the last
        assert(chunks.map(_.getAs[Long]("chunk_id")).toSeq ===
          (0L until chunks.length))
        chunks.init.foreach(c => assert(c.getAs[Long]("n_sents") === 3L))
        assert(chunks.last.getAs[Long]("n_sents") <= 3L)
        assert(chunks.map(_.getAs[Long]("n_sents")).sum === sents.length)
        assert(chunks.map(_.getAs[Long]("n_chars")).sum ===
          sents.map(_.length.toLong).sum)
      } else assert(!rows.contains(id))
    }
  }

  test("llm_embed_kmeans cells partition the corpus; stats are bounded") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val total = emb.count()
    val labels = emb.select($"label".cast("long")).as[Long].collect().toSet
    val rows = q("llm_embed_kmeans").collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === total)
    assert(rows.map(_.getAs[Int]("cell")).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_cos") <= 1.0 + 1e-9)
      val p = r.getAs[Double]("purity")
      assert(p > 0.0 && p <= 1.0)
      assert(labels.contains(r.getAs[Long]("dom_label")))
      // purity of the dominant label can never fall below uniform share
      assert(p >= 1.0 / labels.size - 1e-12)
    }
  }

  test("llm_tfidf_cosine_pairs cosines are bounded, sorted, id-ordered") {
    val rows = q("llm_tfidf_cosine_pairs").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val cosines = rows.map(_.getAs[Double]("cos"))
    // cosine of nonnegative-weight vectors: [0, 1] up to the q6 term
    // quantization (dot and norms quantize independently, so an identical
    // pair can exceed 1 by ~n_terms x 1e-6 relative)
    cosines.foreach(c => assert(c >= 0.0 && c <= 1.0 + 1e-4))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    rows.foreach(r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
    // the count column covers at least the emitted >= 0.3 rows
    val n = rows.head.getAs[Long]("n_sim_pairs")
    assert(n >= cosines.count(_ >= 0.3).toLong)
  }

  test("llm_lsh_band_tuning: more bands => higher recall AND higher fp rate") {
    val rows = q("llm_lsh_band_tuning").collect()
      .sortBy(_.getAs[Int]("bands"))
    assert(rows.map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band")))
      .toSeq === Seq((2, 8), (4, 4), (8, 2), (16, 1)))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup") > 0L && r.getAs[Long]("n_non") > 0L)
      val rec = r.getAs[Double]("exp_recall")
      val fp = r.getAs[Double]("exp_fp_rate")
      assert(rec >= 0.0 && rec <= 1.0 && fp >= 0.0 && fp <= 1.0)
      // at a fixed permutation budget the dup side must be caught more
      // readily than the non-dup side
      assert(rec > fp)
    }
    // capture probability 1-(1-s^r)^b is monotone in b along this ladder
    // (b up, r down) for every s in (0,1): both recall and fp rise
    val recs = rows.map(_.getAs[Double]("exp_recall"))
    val fps = rows.map(_.getAs[Double]("exp_fp_rate"))
    assert(recs.zip(recs.tail).forall { case (a, b) => a <= b }, recs.toSeq)
    assert(fps.zip(fps.tail).forall { case (a, b) => a <= b }, fps.toSeq)
  }

  test("band tuning's histogram-weighted DECIMAL sum is bit-identical to " +
      "the pairwise form (r15)") {
    // the r15 rewrite's load-bearing equality: Σ_pairs q6(pcap(s)) as
    // DECIMAL(28,6)  ==  Σ_(s,cnt) cnt · q6(pcap(s)) as DECIMAL(20,6) —
    // exact because every pair in a group shares the rounded s (hence the
    // q6 term) and DECIMAL arithmetic is exact at these widths. Pinned
    // over the REAL fixture pair frame for all 8 (bands, rows) terms.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val pairs = graft.api.Dedup.ngramJaccardPairs(
      graft.ops.T.documents(spark, sf), "doc_id", "text", threshold = 0.0)
    val hist = pairs.groupBy("jaccard").agg(count(lit(1)).as("cnt"))
    def pcap(b: Int, r: Int) = {
      val sr = (1 to r).map(_ => col("jaccard")).reduce(_ * _)
      val q = lit(1.0) - sr
      lit(1.0) - (1 to b).map(_ => q).reduce(_ * _)
    }
    val q6 = graft.ops.H.q6 _
    for ((b, r) <- Seq((16, 1), (8, 2), (4, 4), (2, 8))) {
      val pairwise = pairs.agg(
          graft.ops.H.dec6Sum(q6(when(col("jaccard") >= 0.6, pcap(b, r))))
            .as("d"),
          graft.ops.H.dec6Sum(q6(when(col("jaccard") < 0.6, pcap(b, r))))
            .as("n"))
        .collect().head
      val grouped = hist.agg(
          sum(when(col("jaccard") >= 0.6, q6(pcap(b, r))
              .cast(DecimalType(7, 6)) * col("cnt").cast(DecimalType(12, 0))))
            .cast("double").as("d"),
          sum(when(col("jaccard") < 0.6, q6(pcap(b, r))
              .cast(DecimalType(7, 6)) * col("cnt").cast(DecimalType(12, 0))))
            .cast("double").as("n"))
        .collect().head
      assert(pairwise.getDouble(0) === grouped.getDouble(0), s"dup b=$b r=$r")
      assert(pairwise.getDouble(1) === grouped.getDouble(1), s"non b=$b r=$r")
    }
    graft.api.Caches.sweep(spark)
  }

  test("ngram-pairs artifact read-back equals the direct derivation (r12)") {
    import org.apache.spark.sql.functions.col
    val direct = graft.api.Dedup.ngramJaccardPairs(
        graft.ops.T.documents(spark, sf), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    graft.api.Caches.sweep(spark)
    val viaArtifact = graft.api.Tables.tableOrDerive(spark,
        s"graft_ngrampairs_${graft.api.Tables.dirTag(sf)}") {
      graft.api.Dedup.ngramJaccardPairs(
        graft.ops.T.documents(spark, sf), "doc_id", "text")
    }.select(col("a_id"), col("b_id"), col("common"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    graft.api.Caches.sweep(spark)
    assert(viaArtifact === direct)
    assert(direct.nonEmpty)
  }

  test("minhash/uncapped pair + t0-histogram artifacts read back the direct derivations (r13/r15)") {
    import org.apache.spark.sql.functions.col
    val tag = graft.api.Tables.dirTag(sf)
    def docs = graft.ops.T.documents(spark, sf)
    // (table name, direct builder, projected columns) per r13 artifact —
    // the names must match the private Llm accessors byte-for-byte, or the
    // pin would gate a different table than the keys read
    val cases = Seq(
      (s"graft_minhashpairs_p32b4r8t080_$tag",
        () => graft.api.Dedup.minhashPairs(docs, "doc_id", "text"),
        Seq("a_id", "b_id", "jaccard")),
      (s"graft_ngrampairs_nodfcap_$tag",
        () => graft.api.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          maxDf = Long.MaxValue),
        Seq("a_id", "b_id", "common", "jaccard")),
      (s"graft_ngramjacchist_t00_$tag",
        () => graft.api.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
            threshold = 0.0)
          .groupBy("jaccard")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("cnt")),
        Seq("jaccard", "cnt")))
    for ((tbl, direct, cols) <- cases) {
      val want = direct().select(cols.map(col): _*)
        .collect().map(_.toSeq.mkString("|")).toSet
      graft.api.Caches.sweep(spark)
      val got = graft.api.Tables.tableOrDerive(spark, tbl)(direct())
        .select(cols.map(col): _*)
        .collect().map(_.toSeq.mkString("|")).toSet
      graft.api.Caches.sweep(spark)
      assert(got === want, tbl)
      assert(want.nonEmpty, tbl)
      // second touch READS (catalog knows it) and returns the same rows
      assert(spark.catalog.tableExists(tbl))
      val again = spark.table(tbl).select(cols.map(col): _*)
        .collect().map(_.toSeq.mkString("|")).toSet
      assert(again === want, tbl)
    }
  }

  test("llm_dedup_survivorship keeps exactly one longest doc per cluster (r12)") {
    val rows = q("llm_dedup_survivorship").collect()
    val clusters = q("llm_dedup_clusters_ngram").collect()
      .map(r => r.getAs[Long]("component") -> r.getAs[Long]("n_members")).toMap
    graft.api.Caches.sweep(spark)
    assert(rows.nonEmpty)
    // member-grain record covers every cluster member exactly once
    assert(rows.length.toLong === clusters.values.sum)
    val byComp = rows.groupBy(_.getAs[Long]("component"))
    assert(byComp.keySet === clusters.keySet)
    val lens = graft.ops.T.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byComp.foreach { case (c, ms) =>
      assert(ms.length.toLong === clusters(c))
      val kept = ms.filter(_.getAs[Boolean]("kept"))
      assert(kept.length === 1, s"cluster $c must keep exactly one")
      val sid = kept.head.getAs[Long]("survivor_id")
      // the survivor is the (longest, lowest-id) member
      val best = ms.map(_.getAs[Long]("doc_id"))
        .maxBy(id => (lens(id), -id))
      assert(sid === best)
      assert(ms.forall(_.getAs[Long]("survivor_id") === sid))
    }
  }

  test("llm_quality_sweep curves are monotone and close against text_stats totals (r12)") {
    val rows = q("llm_quality_sweep").collect()
    graft.api.Caches.sweep(spark)
    assert(rows.map(_.getAs[Int]("token_floor")).toSeq == Seq(5, 20, 50, 100))
    // raising the floor can only drop docs and tokens
    val dk = rows.map(_.getAs[Long]("docs_kept")).toSeq
    val tk = rows.map(_.getAs[Long]("tokens_kept")).toSeq
    assert(dk == dk.sorted.reverse && tk == tk.sorted.reverse)
    // rates close exactly against the emitted exact counts
    rows.foreach { r =>
      assert(r.getAs[Double]("doc_keep_rate") ===
        r.getAs[Long]("docs_kept").toDouble / r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("token_keep_rate") ===
        r.getAs[Long]("tokens_kept").toDouble / r.getAs[Long]("n_toks_total"))
    }
    // the floor-5 arm on this corpus keeps nearly everything; floor-100 cuts
    assert(dk.head > dk.last)
  }

  test("ngramContainmentPairs flags a strict subset doc that Jaccard misses (r13)") {
    import spark.implicits._
    // doc 2 is a verbatim prefix excerpt of doc 1: all 8 of its trigrams
    // are inside doc 1's 38 -> containment 1.0, while J = 8/38 = 0.21
    // sits far below the Jaccard builder's 0.6 threshold
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short), (3L, other))
      .toDF("doc_id", "text")
    val cont = graft.api.Dedup.ngramContainmentPairs(docs, "doc_id", "text")
      .collect()
    assert(cont.length === 1)
    val r = cont.head
    assert(r.getAs[Long]("a_id") === 1L && r.getAs[Long]("b_id") === 2L)
    assert(r.getAs[Long]("a_n") === 38L && r.getAs[Long]("b_n") === 8L)
    assert(r.getAs[Long]("common") === 8L)
    assert(r.getAs[Double]("containment") === 1.0)
    assert(graft.api.Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .collect().isEmpty)
    graft.api.Caches.sweep(spark)
  }

  test("llm_ngram_containment pairs respect the metric's bounds on the fixture (r13)") {
    val rows = q("llm_ngram_containment").collect()
    graft.api.Caches.sweep(spark)
    rows.foreach { r =>
      val cn = r.getAs[Long]("common")
      val mn = math.min(r.getAs[Long]("a_n"), r.getAs[Long]("b_n"))
      assert(cn <= mn, "a pair can never share more grams than its smaller set")
      val c = r.getAs[Double]("containment")
      assert(c >= 0.8 && c <= 1.0)
      assert(c === math.rint(cn.toDouble / mn * 1e4) / 1e4 ||
        math.abs(c - cn.toDouble / mn) < 1e-4)
    }
  }

  test("llm_dedup_clusters_containment clusters close over the pair set (r13)") {
    val pairs = q("llm_ngram_containment").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val rows = q("llm_dedup_clusters_containment").collect()
    graft.api.Caches.sweep(spark)
    // every cluster holds >= 2 members, its label is the min member id
    // (so the min-id survivor label coincides with it), and membership
    // count closes over the pair set's node count
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2L)
      assert(r.getAs[Long]("survivor_id") === r.getAs[Long]("component"))
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(rows.map(_.getAs[Long]("n_members")).sum === nodes.size.toLong)
    // transitive closure can only merge pairs, never split: cluster count
    // is at most the pair count and at most half the node count
    assert(rows.length <= pairs.length && rows.length * 2 <= nodes.size)
  }

  test("llm_distinct_ngrams totals equal an independent token recount (r13)") {
    import org.apache.spark.sql.functions._
    val rows = q("llm_distinct_ngrams").collect()
    graft.api.Caches.sweep(spark)
    assert(rows.nonEmpty)
    // independent totals: per-doc token counts aggregated WITHOUT the
    // explode the key pays — a different plan for the same numbers
    val totals = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source")
      .agg(sum(size(split(col("text"), " "))).as("t1"),
        sum(greatest(size(split(col("text"), " ")) - 1, lit(0))).as("t2"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    rows.foreach { r =>
      val (t1, t2) = totals(r.getAs[String]("source"))
      assert(r.getAs[Long]("total_1") === t1)
      assert(r.getAs[Long]("total_2") === t2)
      assert(r.getAs[Long]("uniq_1") <= t1 && r.getAs[Long]("uniq_2") <= t2)
      assert(r.getAs[Double]("distinct_1") > 0.0 &&
        r.getAs[Double]("distinct_1") <= 1.0)
      assert(r.getAs[Double]("distinct_2") > 0.0 &&
        r.getAs[Double]("distinct_2") <= 1.0)
    }
  }

  test("multimodal near-dup pairs exact copies AND a 1-byte perturbation; splits different content") {
    import spark.implicits._
    // planted payload corpus: A/B identical, C = A with one 'a'->'c' (the
    // margins are engineered: the A profile's weakest window sits >3 mean
    // units from the region mean, a single +2 byte cannot flip any bit),
    // D structurally different content at the SAME (w, h) so only the
    // SIGNATURE can split it from A/B/C
    val tA = "a" * 100 + "z" * 100
    val tC = "c" + "a" * 99 + "z" * 100
    val tD = "z" * 200
    val docs = Seq((1L, tA), (2L, tA), (3L, tC), (4L, tD))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    // the SAME parse/signature/band composition the registered keys use —
    // one definition, so the pin and the keys cannot drift
    val banded = graft.ops.Udfs.p6BandedSignatures(
      graft.ops.Udfs.p6MediaOf(docs))
    val pairs = graft.api.Dedup.saltedBandPairs(banded)
      .orderBy("a_id", "b_id")
      .as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L)),
      s"expected the A/B/C clique and no D pair, got $pairs")
    // the clusters stage closes the clique into ONE component labeled by
    // its min member, D excluded (no pair ever reached the solver)
    val clusters = graft.api.Dedup.connectedComponents(
        graft.api.Dedup.saltedBandPairs(banded))
      .groupBy("component")
      .agg(count(lit(1)).as("n"), min(col("id")).as("surv"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(clusters == Seq((1L, 3L, 1L)),
      s"expected one 3-member cluster labeled 1, got $clusters")
    graft.api.Caches.sweep(spark)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  test("audio near-dup pairs exact copies AND a 1-byte perturbation; splits different content (r15)") {
    import spark.implicits._
    // the multimodal planted-corpus recipe on the WAV family: A/B
    // identical, C = A with one 'a'->'c' (+2 on one PCM byte — the A
    // profile's weakest window sits far from the region mean, no bit
    // flips), D structurally different content of the SAME length (same
    // rate, same data_len band) so only the SIGNATURE can split it
    val tA = "a" * 100 + "z" * 100
    val tC = "c" + "a" * 99 + "z" * 100
    val tD = "z" * 200
    val docs = Seq((1L, tA), (2L, tA), (3L, tC), (4L, tD))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    // the SAME encode/parse/signature/band composition the registered
    // keys use — one definition, so the pin and the keys cannot drift
    val banded = graft.ops.Udfs.wavBandedSignatures(
      graft.ops.Udfs.wavMediaOf(docs))
    val pairs = graft.api.Dedup.saltedBandPairs(banded)
      .orderBy("a_id", "b_id")
      .as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L)),
      s"expected the A/B/C clique and no D pair, got $pairs")
    // the clusters stage closes the clique into ONE component labeled by
    // its min member, D excluded (no pair ever reached the solver)
    val clusters = graft.api.Dedup.connectedComponents(
        graft.api.Dedup.saltedBandPairs(banded))
      .groupBy("component")
      .agg(count(lit(1)).as("n"), min(col("id")).as("surv"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(clusters == Seq((1L, 3L, 1L)),
      s"expected one 3-member audio cluster labeled 1, got $clusters")
    graft.api.Caches.sweep(spark)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  test("llm_audio_recall: the planted ±1-byte perturbations clear a 0.9 recall floor (r16)") {
    // the oracled recall twin of llm_audio_neardup (the minhash_recall
    // contract): 50 planted single-unit PCM perturbations, the production
    // signature+band chain must recover nearly all (a miss needs a window
    // bit sitting within one count of its cross-multiplied mean boundary)
    val r = q("llm_audio_recall").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_truth") == 50, s"expected 50 planted pairs: $row")
    val recall = row.getAs[Double]("sig_recall")
    assert(recall >= 0.9, s"planted-perturbation recall $recall below floor: $row")
    // hits are a subset of both sets by construction
    assert(row.getAs[Long]("n_hit") <= row.getAs[Long]("n_cand"))
    graft.api.Caches.sweep(spark)
  }

  test("audio dedup survivors cover every exact-dup member exactly once (r15)") {
    val rows = q("llm_audio_dedup_survivors").collect()
    val groups = q("llm_audio_exact_dedup").collect()
      .map(r => r.getAs[Long]("rep_doc") -> r.getAs[Long]("n_copies")).toMap
    graft.api.Caches.sweep(spark)
    assert(rows.nonEmpty)
    assert(rows.length.toLong === groups.values.sum,
      "member-grain record must cover every group member exactly once")
    val bySurv = rows.groupBy(_.getAs[Long]("survivor_id"))
    assert(bySurv.keySet === groups.keySet)
    bySurv.foreach { case (sid, ms) =>
      assert(ms.length.toLong === groups(sid))
      assert(ms.count(_.getAs[Boolean]("is_survivor")) === 1)
      assert(ms.map(_.getAs[Long]("doc_id")).min === sid)
    }
  }

  test("audio exact dedup finds exactly the planted re-ingested batch (r15)") {
    val rows = q("llm_audio_exact_dedup").collect()
    assert(rows.nonEmpty)
    // every group: the planted +1000000 copy of a doc_id < 50 original,
    // so the representative is always the original
    rows.foreach { r =>
      assert(r.getAs[Long]("n_copies") >= 2L)
      assert(r.getAs[Long]("rep_doc") < 1000000L)
    }
    // the re-ingested batch is 50 payloads; distinct texts may collide,
    // so group count is <= 50 but every original < 50 is in some group
    assert(rows.map(_.getAs[Long]("n_copies")).sum >= 100L)
  }

  test("windowProfileSignature: exact bits on a ramp payload; all-ones on an empty region") {
    import spark.implicits._
    // 'a'*64 + 'z'*64 at 16 windows of 8 bytes: windows 0-7 mean 97 below
    // the region mean 109.5, windows 8-15 mean 122 above -> sig 0xFF00;
    // a payload no longer than its header signs all-ones
    val rows = Seq(
      (1L, ("a" * 64 + "z" * 64).getBytes("UTF-8"), 0),
      (2L, "hdr".getBytes("UTF-8"), 3))
      .toDF("doc_id", "payload", "skip")
    val got = graft.api.Media.windowProfileSignature(
        rows, "doc_id", "payload", col("skip"), windows = 16)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0xFF00L), (2L, 0xFFFFL)))
  }
}
