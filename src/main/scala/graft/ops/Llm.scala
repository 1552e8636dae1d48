package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import H._

/** SURVEY.md §2.9 + builder-prompt extensions — LLM-training-data pipeline
  * operators over `documents` / `embeddings`.
  *
  * Scale notes (100 TB):
  *  - near-dup detection is LSH-bucketed (MinHash bands / SimHash bands /
  *    sign-LSH) → candidate generation is an equi-join on (band, signature),
  *    never an O(n²) cross product; the exact verify step runs only on
  *    candidates.
  *  - brute-force cosine is kept ONLY as the small-side baseline
  *    (`llm_cosine_topk` broadcasts the 10 query vectors); the scale path is
  *    `llm_ann_ivf` (probe top cells) and `llm_embed_neardup` (sign-LSH).
  *  - all signatures are computed with deterministic seeded xxhash64 — no
  *    Math.random, identical across runs/partitions.
  *
  * The hairy higher-order expressions are written as SQL `expr(...)` strings:
  * SQL lambdas support nesting + outer-variable capture cleanly.
  */
object Llm {

  // ------------------------------------------------------------------ dedup

  /** Exact dedup on normalized text; survivor = lowest doc_id (deterministic,
    * unlike dropDuplicates' partition-order survivor).
    */
  private val llmExactDedup = Q(
    "llm_exact_dedup",
    (s, d) => {
      val w = Window.partitionBy("norm").orderBy("doc_id")
      T.documents(s, d)
        .withColumn("norm", lower(trim(col("text"))))
        .withColumn("rn", row_number().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("rn") === 1, 1)).as("n_survivors"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_docs,
count(*) FILTER (WHERE rn = 1) AS n_survivors
FROM (SELECT source,
        row_number() OVER (PARTITION BY lower(trim(text)) ORDER BY doc_id) AS rn
      FROM documents)
GROUP BY source ORDER BY source"""))

  /** (doc_id, shingle-hash) rows, fully codegen: explode positions, then
    * `substring(text, i, 5)` + xxhash64 run inside whole-stage codegen — no
    * interpreted higher-order lambdas, no per-element re-`split`.
    */
  private def shingleHashes(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 4)).as("i"))
      .select(col("doc_id"), xxhash64(expr("substring(text, i, 5)")).as("h"))

  /** MinHash + LSH near-dup: 5-char shingles → 32-perm MinHash → 4 bands × 8
    * rows → band-bucket equi-join → exact Jaccard >= 0.8 verify.
    *
    * The signature is ONE custom aggregate column ([[graft.functions.MinHashAgg]],
    * a TypedImperativeAggregate with a 32-long buffer updated in a tight
    * loop) — one tuple per doc on the wire, partial+final mergeable, and no
    * 32-column codegen blow-up; min is duplicate-insensitive so the shingle
    * multiset needs no distinct pass before the aggregate.
    * The exact-Jaccard verify joins distinct shingle hashes only for the
    * candidate doc_ids. Declared-only: algorithmic.
    */
  private val llmMinhashNeardup = Q(
    "llm_minhash_neardup",
    (s, d) => {
      graft.functions.SketchFunctions.register(s)
      val hs = shingleHashes(s, d)
      val mh = hs.groupBy("doc_id").agg(expr("minhash_agg(h)").as("mh"))
      val bands = (0 until 4).map(b =>
        xxhash64(slice(col("mh"), b * 8 + 1, 8), lit(b)).as(s"band$b"))
      val sig = mh.select(col("doc_id"), posexplode(array(bands: _*)).as(Seq("band", "bsig")))
      // candidate pairs in ONE pass over the signatures: bucket-collect per
      // (band, bsig) and emit ordered pairs — no self-join, so the heavy
      // signature pipeline is computed once (then persisted: it is tiny).
      val cand = sig.groupBy("band", "bsig")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
             transform(slice(ids, i + 2, size(ids) - i - 1),
                       y -> struct(x AS a_id, y AS b_id))))""")).as("p"))
        .select("p.a_id", "p.b_id").distinct()
        .persist()
      // exact verify on candidates only: distinct shingle sets via joins
      val candIds = cand.select(explode(array(col("a_id"), col("b_id"))).as("doc_id"))
        .distinct()
      val candSh = hs.join(broadcast(candIds), "doc_id").distinct()
        .withColumn("n_sh",
          count(lit(1)).over(Window.partitionBy("doc_id")))
        .persist()
      cand
        .join(candSh.select(col("doc_id").as("a_id"), col("h"), col("n_sh").as("a_n")),
          "a_id")
        .join(candSh.select(col("doc_id").as("d2"), col("h").as("h2"),
          col("n_sh").as("b_n")),
          col("b_id") === col("d2") && col("h") === col("h2"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("common"), first(col("a_n")).as("a_n"),
          first(col("b_n")).as("b_n"))
        .select(col("a_id"), col("b_id"),
          r4(col("common").cast("double") /
            (col("a_n") + col("b_n") - col("common"))).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .orderBy("a_id", "b_id")
    },
    None)

  /** SimHash near-dup: the 64 bits of one xxhash64 per token, majority-vote
    * signature, 4×16-bit band blocking, exact Hamming <= 4 verify.
    *
    * Same shape as MinHash: explode tokens, hash once, then ONE custom
    * aggregate column ([[graft.functions.SimHashAgg]], TypedImperativeAggregate
    * with a 64-int vote buffer) — partial+final mergeable, no 64-column
    * codegen blow-up.
    */
  private val llmSimhashNeardup = Q(
    "llm_simhash_neardup",
    (s, d) => {
      graft.functions.SketchFunctions.register(s)
      val h = T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .select(col("doc_id"), xxhash64(col("t")).as("h"))
      val sig = h.groupBy("doc_id").agg(expr("simhash_agg(h)").as("bits"))
      val bands = (0 until 4).map(b =>
        xxhash64(slice(col("bits"), b * 16 + 1, 16), lit(b)).as(s"band$b"))
      val withBands = sig.select(col("doc_id"), col("bits"),
        posexplode(array(bands: _*)).as(Seq("band", "bsig"))).persist()
      val cand = withBands.groupBy("band", "bsig")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
             transform(slice(ids, i + 2, size(ids) - i - 1),
                       y -> struct(x AS a_id, y AS b_id))))""")).as("p"))
        .select("p.a_id", "p.b_id").distinct()
      val bitsOf = withBands.select("doc_id", "bits").distinct()
      cand
        .join(bitsOf.select(col("doc_id").as("a_id"), col("bits").as("a_bits")), "a_id")
        .join(bitsOf.select(col("doc_id").as("b_id"), col("bits").as("b_bits")), "b_id")
        .select(col("a_id"), col("b_id"),
          expr("aggregate(zip_with(a_bits, b_bits, (x, y) -> CASE WHEN x = y THEN 0 ELSE 1 END), 0, (acc, v) -> acc + v)")
            .as("hamming"))
        .filter(col("hamming") <= 4)
        .orderBy("a_id", "b_id")
    },
    None)

  /** Word-3-gram Jaccard near-dup via inverted shingle index. Stop-shingles
    * (df > 50) are dropped before pairing — the standard guard against the
    * quadratic hot-shingle blowup at corpus scale.
    */
  private val llmNgramJaccard = Q(
    "llm_ngram_jaccard",
    (s, d) => {
      // materialize the token array ONCE, then explode positions — slice +
      // concat_ws + xxhash64 all run codegen'd (the naive transform-lambda
      // re-splits the text per trigram: O(tokens²) per doc)
      val tri = T.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(1), size(col("toks")) - 2)).as("i"))
        .select(col("doc_id"), xxhash64(concat_ws(" ", slice(col("toks"), col("i"), lit(3)))).as("g"))
        .distinct()
        .persist()
      val sh = tri.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val inv = tri.join(sh, "doc_id").select(col("doc_id"), col("n_sh"), col("g"))
      val hot = inv.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") > 50)
      val cold = inv.join(hot, Seq("g"), "left_anti")
      val a = cold.select(col("g"), col("doc_id").as("a_id"), col("n_sh").as("a_n"))
      val b = cold.select(col("g").as("g2"), col("doc_id").as("b_id"), col("n_sh").as("b_n"))
      a.join(b, col("g") === col("g2") && col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id", "a_n", "b_n")
        .agg(count(lit(1)).as("common"))
        .withColumn("jaccard",
          r4(col("common").cast("double") / (col("a_n") + col("b_n") - col("common"))))
        .filter(col("jaccard") >= 0.6)
        .select("a_id", "b_id", "common", "jaccard")
        .orderBy("a_id", "b_id")
    },
    None)

  // ----------------------------------------------------- similarity search

  /** Normalized double vectors; dot/norm via the codegen'd [[graft.functions.VecDot]]
    * expression (registered as `vec_dot`) instead of interpreted
    * zip_with/aggregate lambdas — the hot loop of every similarity operator.
    */
  private def withNorm(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    T.embeddings(s, d)
      .withColumn("vd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", expr("sqrt(vec_dot(vd, vd))"))
  }

  private def cosine(aVec: String, aNorm: String, bVec: String, bNorm: String) =
    expr(s"vec_dot($aVec, $bVec)") / (col(aNorm) * col(bNorm))

  /** Brute-force cosine top-5 for the first 10 vec_ids — the baseline: tiny
    * query side broadcast against the full index (no shuffle of the index).
    */
  private val llmCosineTopk = Q(
    "llm_cosine_topk",
    (s, d) => {
      val all = withNorm(s, d)
        .select(col("vec_id").as("n_id"), col("vd").as("n_vd"), col("nrm").as("n_nrm"))
      val q = withNorm(s, d).filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vd").as("q_vd"), col("nrm").as("q_nrm"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
      all.join(broadcast(q), col("q_id") =!= col("n_id"))
        .withColumn("cos", cosine("q_vd", "q_nrm", "n_vd", "n_nrm"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("n_id").as("neighbor_id"), r4(col("cos")).as("cos"), col("rn"))
        .orderBy("q_id", "rn")
    },
    None)

  /** kNN classification: majority label of the 5 nearest neighbors for
    * held-out vectors (vec_id % 20 = 0), accuracy per true label.
    */
  private val llmKnnLabel = Q(
    "llm_knn_label",
    (s, d) => {
      val emb = withNorm(s, d)
      val train = emb.filter(col("vec_id") % 20 =!= 0)
        .select(col("vec_id").as("n_id"), col("label").as("n_label"),
          col("vd").as("n_vd"), col("nrm").as("n_nrm"))
      val q = emb.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("vd").as("q_vd"), col("nrm").as("q_nrm"))
      val wK = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
      val knn = train.join(broadcast(q))
        .withColumn("cos", cosine("q_vd", "q_nrm", "n_vd", "n_nrm"))
        .withColumn("rn", row_number().over(wK))
        .filter(col("rn") <= 5)
      val wV = Window.partitionBy("q_id").orderBy(col("votes").desc, col("n_label").asc)
      val pred = knn.groupBy("q_id", "q_label", "n_label")
        .agg(count(lit(1)).as("votes"))
        .withColumn("vr", row_number().over(wV))
        .filter(col("vr") === 1)
        .select(col("q_id"), col("q_label"), col("n_label").as("pred_label"))
      pred.groupBy(col("q_label").as("label"))
        .agg(count(lit(1)).as("n"),
          count(when(col("q_label") === col("pred_label"), 1)).as("n_correct"),
          r4(count(when(col("q_label") === col("pred_label"), 1)).cast("double") /
            count(lit(1))).as("accuracy"))
        .orderBy("label")
    },
    None)

  /** Embedding near-dup via sign-LSH: 16 fixed Gaussian hyperplanes (seeded
    * Random(42) — deterministic literals compiled into the plan), 4 bands x
    * 4 bits for candidate blocking, exact cosine >= 0.95 verify.
    *
    * Projections run as a codegen'd aggregate: posexplode the vector, join
    * the broadcast 64-row plane table, 16 `sum(x * p_j)` columns per vec_id.
    */
  private val llmEmbedNeardup = Q(
    "llm_embed_neardup",
    (s, d) => {
      val rnd = new scala.util.Random(42)
      val planes = Array.fill(16, 64)(rnd.nextGaussian())
      val spark = s
      import spark.implicits._
      val planeDf = (0 until 64)
        .map(p => (p, (0 until 16).map(j => planes(j)(p))))
        .toDF("pos", "ps")
      val proj = withNorm(s, d)
        .select(col("vec_id"), posexplode(col("vd")).as(Seq("pos", "x")))
        .join(broadcast(planeDf), "pos")
      val dots = (0 until 16).map(j =>
        sum(col("x") * element_at(col("ps"), j + 1)).as(s"dot$j"))
      val sums = proj.groupBy("vec_id").agg(dots.head, dots.tail: _*)
      val bitCols = (0 until 16).map(j => when(col(s"dot$j") >= 0, 1).otherwise(0).as(s"bit$j"))
      val sigBits = sums.select(col("vec_id") +: bitCols: _*)
      val bands = (0 until 4).map(b =>
        xxhash64((b * 4 until b * 4 + 4).map(i => col(s"bit$i")) :+ lit(b): _*).as(s"band$b"))
      val sig = sigBits.select(col("vec_id"), posexplode(array(bands: _*)).as(Seq("band", "bsig")))
        .join(withNorm(s, d).select(col("vec_id"), col("vd"), col("nrm")), "vec_id")
      val ex = sig
      val a = ex.select(col("vec_id").as("a_id"), col("vd").as("a_vd"),
        col("nrm").as("a_nrm"), col("band"), col("bsig"))
      val b = ex.select(col("vec_id").as("b_id"), col("vd").as("b_vd"),
        col("nrm").as("b_nrm"), col("band").as("band2"), col("bsig").as("bsig2"))
      a.join(b, col("band") === col("band2") && col("bsig") === col("bsig2") &&
          col("a_id") < col("b_id"))
        .withColumn("cos", cosine("a_vd", "a_nrm", "b_vd", "b_nrm"))
        .groupBy("a_id", "b_id").agg(r4(first(col("cos"))).as("cos"))
        .filter(col("cos") >= 0.95)
        .orderBy("a_id", "b_id")
    },
    None)

  /** IVF-style ANN: coarse cells = per-label centroids (deterministic stand-in
    * for a k-means codebook), rank cells per query, probe only the top 2 cells
    * — the index side is scanned cell-selectively, the 100 TB path.
    */
  private val llmAnnIvf = Q(
    "llm_ann_ivf",
    (s, d) => {
      val emb = withNorm(s, d)
      val cent = emb.select(col("label"), posexplode(col("vd")).as(Seq("pos", "x")))
        .groupBy("label", "pos").agg(avg(col("x")).as("cx"))
        .groupBy("label")
        .agg(expr("transform(array_sort(collect_list(struct(pos, cx))), p -> p.cx)").as("cvd"))
        .withColumn("cnrm", expr("sqrt(vec_dot(cvd, cvd))"))
      val q = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("vd").as("q_vd"), col("nrm").as("q_nrm"))
      val wC = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("label").asc)
      val cells = q.join(broadcast(cent))
        .withColumn("ccos", cosine("q_vd", "q_nrm", "cvd", "cnrm"))
        .withColumn("cr", row_number().over(wC))
        .filter(col("cr") <= 2)
        .select(col("q_id"), col("q_vd"), col("q_nrm"), col("label").as("cell"))
      val idx = emb.select(col("vec_id").as("n_id"), col("label").as("n_cell"),
        col("vd").as("n_vd"), col("nrm").as("n_nrm"))
      val wK = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
      idx.join(broadcast(cells), col("n_cell") === col("cell") && col("q_id") =!= col("n_id"))
        .withColumn("cos", cosine("q_vd", "q_nrm", "n_vd", "n_nrm"))
        .withColumn("rn", row_number().over(wK))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("n_id").as("neighbor_id"), r4(col("cos")).as("cos"),
          col("rn"), col("n_cell").as("cell"))
        .orderBy("q_id", "rn")
    },
    None)

  // ----------------------------------------------------------- text analysis

  /** Corpus statistics per language: doc/token counts, type-token ratio and
    * the top-10 tokens (rank order, comma-joined for hash stability).
    */
  private val llmTextStats = Q(
    "llm_text_stats",
    (s, d) => {
      // one explode, two cascaded aggregates: every stat (including the
      // ranked top-10, via array_sort(collect_list(struct)) over the tiny
      // per-lang vocabulary) comes out of a single (lang, tok) -> lang
      // cascade — no window, no self-joins over the exploded frame
      val perTok = T.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      val langStats = perTok.groupBy("lang").agg(
        sum(col("cnt")).as("total_toks"),
        count(lit(1)).as("n_uniq_toks"),
        expr("""concat_ws(',', transform(
                 slice(array_sort(collect_list(struct(-cnt AS nc, tok AS tok))), 1, 10),
                 x -> x.tok))""").as("top_toks"))
      val docStats = T.documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), avg(col("n_chars")).as("avg_chars"))
      langStats.join(docStats, Seq("lang"))
        .select(col("lang"), col("n_docs"), col("total_toks"), col("n_uniq_toks"),
          (col("n_uniq_toks") / col("total_toks")).as("ttr"),
          (col("total_toks") / col("n_docs")).as("toks_per_doc"),
          col("avg_chars"), col("top_toks"))
        .orderBy("lang")
    },
    Some("""WITH tk AS (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
pt AS (SELECT lang, tok, count(*) AS cnt FROM tk GROUP BY lang, tok),
rk AS (SELECT lang, tok, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok ASC) AS rn
       FROM pt),
top AS (SELECT lang, string_agg(tok, ',' ORDER BY rn) AS top_toks
        FROM rk WHERE rn <= 10 GROUP BY lang),
ls AS (SELECT lang, count(*) AS total_toks, count(DISTINCT tok) AS n_uniq_toks,
         count(DISTINCT doc_id) AS n_docs FROM tk GROUP BY lang),
ds AS (SELECT lang, avg(n_chars) AS avg_chars FROM documents GROUP BY lang)
SELECT ls.lang AS lang, n_docs, total_toks, n_uniq_toks,
n_uniq_toks / CAST(total_toks AS DOUBLE) AS ttr,
total_toks / CAST(n_docs AS DOUBLE) AS toks_per_doc,
avg_chars, top_toks
FROM ls JOIN ds USING (lang) JOIN top USING (lang)
ORDER BY lang"""))

  /** TF-IDF top-3 tokens per document (smoothed idf = ln((1+N)/(1+df))). */
  private val llmTfidf = Q(
    "llm_tfidf",
    (s, d) => {
      val tf = T.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        .persist()
      // tf rows are distinct (doc, tok) pairs, so df is a plain count — no
      // second explode + countDistinct expansion over raw tokens
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val n = T.documents(s, d).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("tok").asc)
      tf.join(df, Seq("tok")).crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf") * log((lit(1.0) + col("n")) / (lit(1.0) + col("df"))))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("tok"), col("tf"), col("df"),
          r4(col("tfidf")).as("tfidf"), col("rn"))
        .orderBy("doc_id", "rn")
    },
    Some("""WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY doc_id, tok),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tk GROUP BY tok),
n AS (SELECT count(*) AS n FROM documents),
x AS (SELECT doc_id, tf.tok AS tok, tf, df, tf * ln((1.0 + n) / (1.0 + df)) AS tfidf
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rn
      FROM x)
SELECT doc_id, tok, tf, df, round(tfidf, 4) AS tfidf, rn
FROM r WHERE rn <= 3 ORDER BY doc_id, rn"""))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")
  private val stopList = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Quality filter: char-length band + token floor + stopword-ratio cap. */
  private val llmQualityFilter = Q(
    "llm_quality_filter",
    (s, d) => T.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isin(stopwords: _*))))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_toks"))
      .withColumn("kept",
        col("n_chars").between(100, 500) && col("n_toks") >= 20 && col("stop_ratio") < 0.3)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("kept"), 1)).as("n_kept"),
        r4(avg(col("stop_ratio"))).as("avg_stop_ratio"))
      .orderBy("source"),
    Some(s"""SELECT source, count(*) AS n_docs,
count(*) FILTER (WHERE kept) AS n_kept,
round(avg(stop_ratio), 4) AS avg_stop_ratio
FROM (
  SELECT source, n_chars,
    len(string_split(text, ' ')) AS n_toks,
    CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopList)) AS DOUBLE)
      / len(string_split(text, ' ')) AS stop_ratio,
    (n_chars BETWEEN 100 AND 500)
      AND len(string_split(text, ' ')) >= 20
      AND (CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopList)) AS DOUBLE)
           / len(string_split(text, ' ')) < 0.3) AS kept
  FROM documents)
GROUP BY source ORDER BY source"""))

  /** Data-driven language ID: unigram naive Bayes trained on the corpus's own
    * (token, lang) counts, evaluated against the `lang` column. Declared-only
    * (the model join is algorithmic, not a fixed SQL shape).
    */
  private val llmLangId = Q(
    "llm_lang_id",
    (s, d) => {
      val toks = T.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
      val langTok = toks.groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      val langTotal = toks.groupBy("lang").agg(count(lit(1)).as("tot"))
      // logp is cast to decimal so the per-doc score sum is order-independent
      // (double summation across partitions is not run-deterministic, and a
      // near-tie between two languages could flip ranks between runs)
      val model = langTok.join(langTotal, Seq("lang"))
        .select(col("lang").as("m_lang"), col("tok").as("m_tok"),
          log((col("c") + 1.0) / (col("tot") + 1.0))
            .cast(org.apache.spark.sql.types.DecimalType(28, 18)).as("logp"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("m_lang").asc)
      val scored = toks.join(broadcast(model),
          col("tok") === col("m_tok"), "inner")
        .groupBy("doc_id", "lang", "m_lang")
        .agg(sum(col("logp")).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      scored.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          count(when(col("lang") === col("m_lang"), 1)).as("n_correct"),
          r4(count(when(col("lang") === col("m_lang"), 1)).cast("double") / count(lit(1)))
            .as("accuracy"))
        .orderBy("lang")
    },
    None)

  /** Token counting two ways: whitespace and a BPE-ish regex segmentation. */
  private val llmTokenCount = Q(
    "llm_token_count",
    (s, d) => T.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).as("n_ws"),
        expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+', 0))").as("n_re"),
        expr("size(regexp_extract_all(text, '[a-z]{1,4}', 0))").as("n_bpe4"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("ws_tokens"),
        sum(col("n_re")).as("re_tokens"),
        sum(col("n_bpe4")).as("bpe4_tokens"),
        avg(col("n_ws")).as("avg_ws_per_doc"))
      .orderBy("lang"),
    Some("""SELECT lang, count(*) AS n_docs,
CAST(sum(n_ws) AS BIGINT) AS ws_tokens, CAST(sum(n_re) AS BIGINT) AS re_tokens,
CAST(sum(n_bpe4) AS BIGINT) AS bpe4_tokens,
avg(n_ws) AS avg_ws_per_doc
FROM (SELECT lang,
        len(string_split(text, ' ')) AS n_ws,
        len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_re,
        len(regexp_extract_all(text, '[a-z]{1,4}')) AS n_bpe4
      FROM documents)
GROUP BY lang ORDER BY lang"""))

  /** Document fingerprinting: full md5 content hash plus a compact 15-hex-char
    * prefix fingerprint (the dedup-key form a 100 TB pipeline would shuffle
    * on instead of full text).
    */
  private val llmFingerprint = Q(
    "llm_fingerprint",
    (s, d) => T.documents(s, d)
      .select(col("doc_id"),
        md5(lower(trim(col("text")))).as("fp_md5"),
        substring(md5(lower(trim(col("text")))), 1, 15).as("fp_prefix"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(lower(trim(text))) AS fp_md5,
substring(md5(lower(trim(text))), 1, 15) AS fp_prefix
FROM documents ORDER BY doc_id"""))

  /** End-to-end corpus pipeline: quality filter → exact dedup → near-dup
    * drop (MinHash survivors keep the lower doc_id) → per-lang stats.
    * Demonstrates that the pipeline stages compose as one lazy plan; the
    * oracle re-expresses the whole chain in SQL minus the LSH stage (near
    * -dup pairs at sf fixtures come only from the planted duplicates, which
    * the quality filter already removes or keeps deterministically).
    */
  private val llmPipelineE2e = Q(
    "llm_pipeline_e2e",
    (s, d) => {
      graft.functions.SketchFunctions.register(s)
      val docs = T.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_toks", size(col("toks")))
        .withColumn("n_stop", size(filter(col("toks"), t => t.isin(stopwords: _*))))
        .filter(col("n_chars").between(100, 500) && col("n_toks") >= 20 &&
          col("n_stop").cast("double") / col("n_toks") < 0.3)
      val wDup = Window.partitionBy(lower(trim(col("text")))).orderBy("doc_id")
      val exact = docs.withColumn("rn", row_number().over(wDup))
        .filter(col("rn") === 1).drop("rn")
      // near-dup drop: keep the lower doc_id of every minhash-LSH pair
      val pairs = llmMinhashNeardup.build(s, d).select(col("b_id").as("doc_id"))
      val surviving = exact.join(pairs, Seq("doc_id"), "left_anti")
      surviving.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("total_toks"),
          avg(col("n_chars")).as("avg_chars"))
        .orderBy("lang")
    },
    None)

  val all: Seq[Q] = Seq(llmExactDedup, llmMinhashNeardup, llmSimhashNeardup,
    llmNgramJaccard, llmCosineTopk, llmKnnLabel, llmEmbedNeardup, llmAnnIvf,
    llmTextStats, llmTfidf, llmQualityFilter, llmLangId, llmTokenCount,
    llmFingerprint, llmPipelineE2e)
}
