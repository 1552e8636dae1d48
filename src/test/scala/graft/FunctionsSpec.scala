package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, SketchFunctions, VectorFunctions}

/** Custom Catalyst expression/aggregate surface (§2.11). */
class FunctionsSpec extends SparkSpec {

  test("vec_dot matches a hand-computed dot product (codegen + interpreted)") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(expr("vec_dot(a, b)")).as[Double].head()
    assert(got == 32.0)
    // whole-stage codegen path over many rows
    val n = 1000
    val big = spark.range(n).select(
      expr("transform(sequence(0, 9), i -> CAST(i + id AS DOUBLE))").as("a"),
      expr("transform(sequence(0, 9), i -> CAST(2 AS DOUBLE))").as("b"))
    val sums = big.select(expr("vec_dot(a, b)").as("d")).agg(sum("d")).as[Double].head()
    // sum_id sum_i 2*(i+id) = sum_id (2*45 + 20*id) = n*90 + 20*n*(n-1)/2
    assert(sums == n * 90.0 + 20.0 * n * (n - 1) / 2)
  }

  test("vec_dot rejects non-double-array inputs") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[Exception](df.select(expr("vec_dot(a, b)")).collect())
    assert(e.getMessage.contains("ARRAY<DOUBLE>") || e.getMessage.contains("vec_dot"))
  }

  test("permute_hash is deterministic, seed-sensitive, and identity at seed 0") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val df = Seq(42L, -7L, 0L).toDF("h")
    val r = df.select(col("h"), expr("permute_hash(h, 0)").as("p0"),
      expr("permute_hash(h, 1)").as("p1"), expr("permute_hash(h, 1)").as("p1b"))
      .collect()
    r.foreach { row =>
      assert(row.getLong(1) == row.getLong(0))      // seed 0 = identity
      assert(row.getLong(2) == row.getLong(3))      // deterministic
      assert(row.getLong(2) != row.getLong(0) || row.getLong(0) == 0)
    }
  }

  test("bits_hamming matches the interpreted zip_with fold (codegen + random bits)") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // deterministic pseudo-random bit vectors; compare against the
    // interpreted higher-order-function formulation it replaced
    val df = spark.range(500).select(
      expr("transform(sequence(0, 63), i -> CAST(pmod(xxhash64(id, i), 2) AS INT))").as("a"),
      expr("transform(sequence(0, 63), i -> CAST(pmod(xxhash64(id + 7, i), 2) AS INT))").as("b"))
    val mism = df.select(
        expr("bits_hamming(a, b)").as("fast"),
        expr("aggregate(zip_with(a, b, (x, y) -> CASE WHEN x = y THEN 0 ELSE 1 END), 0, (acc, v) -> acc + v)")
          .as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mism == 0)
    // identical arrays → 0; truncates to the shorter prefix like vec_dot
    val edge = Seq((Seq(1, 0, 1), Seq(1, 0, 1), Seq(0, 0)), (Seq(1, 1, 1), Seq(0, 1, 0), Seq(0, 0)))
      .toDF("x", "y", "z")
    assert(edge.select(expr("bits_hamming(x, x)")).as[Int].collect().forall(_ == 0))
    assert(edge.select(expr("bits_hamming(x, y)")).as[Int].collect().toSeq == Seq(0, 2))
    assert(edge.select(expr("bits_hamming(x, z)")).as[Int].collect().toSeq == Seq(1, 2))
  }

  test("minhash_agg: identical inputs give identical signatures; distinct differ") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val df = Seq((1L, "aa"), (1L, "bb"), (2L, "aa"), (2L, "bb"), (3L, "zz"))
      .toDF("id", "s").select(col("id"), xxhash64(col("s")).as("h"))
    val sigs = df.groupBy("id").agg(expr("minhash_agg(h)").as("mh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 32)
  }

  test("simhash_agg: bit votes follow the input hash bits") {
    import spark.implicits._
    SketchFunctions.register(spark)
    // single row: bits of the signature == bits of the hash itself
    val df = Seq((1L, 0xF0F0L)).toDF("id", "h")
    val bits = df.groupBy("id").agg(expr("simhash_agg(h)").as("b"))
      .as[(Long, Seq[Int])].collect().head._2
    (0 until 16).foreach { b =>
      val expected = if (((0xF0F0L >> b) & 1) == 1) 1 else 0
      assert(bits(b) == expected, s"bit $b")
    }
    assert(bits.length == 64)
  }

  test("bloom_probe: no false negatives, few false positives, null-safe (codegen + interpreted)") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // build a filter over 0..999 exactly as contaminationBloom does
    val keys = spark.range(1000).select(col("id").as("g"))
    val bf = keys.stat.bloomFilter("g", 1000, 0.01)
    val bytes = new java.io.ByteArrayOutputStream()
    bf.writeTo(bytes)
    val lit = org.apache.spark.sql.functions.lit(bytes.toByteArray)
    // codegen path: probe 0..9999 in a projection over many rows
    val probed = spark.range(10000)
      .select(col("id"), call_function("bloom_probe", lit, col("id")).as("hit"))
      .as[(Long, Boolean)].collect()
    val inMiss = probed.filter(p => p._1 < 1000 && !p._2)
    assert(inMiss.isEmpty, s"Bloom false NEGATIVES are impossible: $inMiss")
    val fpRate = probed.count(p => p._1 >= 1000 && p._2) / 9000.0
    assert(fpRate < 0.05, s"fp rate $fpRate far above the 0.01 target")
    // interpreted eval path (no codegen in a driver-side Literal-only plan)
    val one = Seq(5L, 5000L).toDF("g")
      .select(call_function("bloom_probe", lit, col("g")).as("hit"))
      .as[Boolean].collect()
    assert(one(0), "key 5 is in the filter")
    // null key → null result, not a crash
    val n = Seq[Option[Long]](None).toDF("g")
      .select(call_function("bloom_probe", lit, col("g")).as("hit"))
      .collect()
    assert(n(0).isNullAt(0))
  }

  test("H.r4z collapses the signed zero to +0.0 bits (r7 llm_random_projection regression)") {
    import spark.implicits._
    // −3.006e-5 is the judge-reproduced sf0.01 cell (vec_id=146, p7) that
    // rounded to −0.0 in DuckDB and +0.0 in Spark; r4z + r4zSql pin both
    // engines to the +0.0 bit pattern.
    val df = Seq(-3.006e-5, -0.0, 0.0, -4.9e-5, 1.23456, -1.23456).toDF("x")
    val out = df.select(graft.ops.H.r4z(col("x")).as("r")).as[Double].collect()
    out.filter(_ == 0.0).foreach { v =>
      assert(java.lang.Double.doubleToRawLongBits(v) == 0L,
        s"rounded zero must be +0.0, got bits ${java.lang.Double.doubleToRawLongBits(v)}")
    }
    assert(out.count(_ == 0.0) == 4)
    assert(out.toSet == Set(0.0, 1.2346, -1.2346))
    // nulls pass through untouched
    val n = Seq[Option[Double]](None).toDF("x")
      .select(graft.ops.H.r4z(col("x"))).collect()
    assert(n(0).isNullAt(0))
    // the paired DuckDB fragment is the documented `round(e,4) + 0.0`
    assert(graft.ops.H.r4zSql("p7") == "(round((p7), 4) + 0.0)")
  }

  test("GraftExtensions installs the custom functions on a fresh session") {
    val ext = spark.newSession()
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // builder-level injection can't be tested against the shared test
    // session; the runtime registry path is the production path:
    VectorFunctions.register(ext)
    SketchFunctions.register(ext)
    import ext.implicits._
    assert(ext.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .as[Double].head() == 11.0)
    assert(ext.sql("SELECT bits_hamming(array(1, 0, 1), array(1, 1, 1))")
      .as[Int].head() == 1)
  }

  test("fn_try_arith NULLs every error path instead of failing") {
    val rows = SparkEntry.queries("fn_try_arith")(spark, sf).collect()
    assert(rows.nonEmpty)
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture
    // (1161 tie groups at sf0.001), so assert the NULL-path populations,
    // not per-row lookups: the cast is dirty exactly on line-7 rows (the
    // flag letter); division NULLs exactly the zero-tax lines; element
    // reads NULL exactly past the 3-array; overflow hits exactly the
    // positive multiples of 1000
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_tax").collect()
    assert(rows.count(_.isNullAt(rows.head.fieldIndex("bad_cast"))) ===
      li.count(_.getInt(1) == 7))
    assert(rows.count(_.isNullAt(rows.head.fieldIndex("q_div"))) ===
      li.count(_.getDouble(2) == 0.0))
    assert(rows.count(_.isNullAt(rows.head.fieldIndex("elem"))) ===
      li.count(_.getInt(1) > 3))
    assert(rows.count(_.isNullAt(rows.head.fieldIndex("ovf"))) ===
      li.count(r => r.getLong(0) % 1000 == 0 && r.getLong(0) > 0))
    // each population is genuinely exercised in both directions
    assert(rows.exists(!_.isNullAt(rows.head.fieldIndex("q_div"))))
    assert(rows.exists(!_.isNullAt(rows.head.fieldIndex("elem"))))
  }

  test("fn_variant typed reads agree with a from_json re-parse") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("fn_variant")(spark, sf)
    val alt = graft.ops.T.events(spark, sf)
      .select(col("event_id"),
        expr("from_json(props, 'k INT').k").as("k_alt"))
    val joined = rows.join(alt, "event_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Int]("k_int") === r.getAs[Int]("k_alt"))
      assert(r.getAs[String]("k_str") === r.getAs[Int]("k_alt").toString)
      assert(r.isNullAt(r.fieldIndex("miss")),
        "a missing variant path must read as NULL, not error")
    }
  }

  test("fn_collation merges case variants through UTF8_LCASE grouping (r12)") {
    val rows = q("fn_collation").collect()
    graft.api.Caches.sweep(spark)
    assert(rows.nonEmpty)
    // every brand has parts of both parities at this scale, so the
    // collation must have merged exactly two binary variants per group -
    // proof the COLLATION did the merging, not a normalizing projection
    assert(rows.forall(_.getAs[Long]("n_case_variants") === 2L))
    // keys are emitted normalized
    assert(rows.forall(r => r.getAs[String]("brand_lc") ==
      r.getAs[String]("brand_lc").toLowerCase))
    // group count equals the distinct lower-cased brand count
    val nBrands = spark.read.parquet(s"$sf/part.parquet")
      .select(org.apache.spark.sql.functions.lower(
        org.apache.spark.sql.functions.col("p_brand"))).distinct().count()
    assert(rows.length.toLong === nBrands)
  }
}
