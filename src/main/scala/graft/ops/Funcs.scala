package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import H._

/** SURVEY.md §2.8 — scalar function families, one composite query per family.
  *
  * Dialect-divergence notes baked in (SURVEY §5.4):
  *  - day-of-week numbering differs (Spark 1=Sun..7 vs DuckDB isodow 1=Mon..7)
  *    → both sides normalized to ISO 1=Mon..7.
  *  - `get_json_object` returns string, DuckDB json_extract returns JSON →
  *    both cast to INT.
  *  - pmod has no DuckDB equivalent → ((a % b) + b) % b on the oracle side.
  *  - libm transcendental (ln/exp/pow) last-ulp divergence → round(4).
  */
object Funcs {

  private val fnString = Q(
    "fn_string",
    (s, d) => T.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("up_name"),
      lower(col("p_brand")).as("lo_brand"),
      trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
      substring(col("p_name"), 1, 5).as("pre5"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      length(col("p_name")).as("name_len"),
      regexp_replace(col("p_name"), lit(" "), lit("_")).as("snake"),
      lpad(col("p_size").cast("string"), 4, "0").as("size4"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
upper(p_name) AS up_name, lower(p_brand) AS lo_brand,
trim('  ' || p_name || '  ') AS trimmed,
substring(p_name, 1, 5) AS pre5,
concat_ws('|', p_brand, p_type) AS brand_type,
length(p_name) AS name_len,
replace(p_name, ' ', '_') AS snake,
lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4
FROM part ORDER BY p_partkey"""))

  /** Regex extraction/replacement/filter — the FTS error-string parsing shape. */
  private val fnRegex = Q(
    "fn_regex",
    (s, d) => T.customer(s, d)
      .filter(col("c_name").rlike("[02468]$"))
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("name_num"),
        regexp_replace(col("c_name"), "^Customer#0*", "C-").as("short_name"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
regexp_replace(c_name, '^Customer#0*', 'C-') AS short_name
FROM customer WHERE regexp_matches(c_name, '[02468]$')
ORDER BY c_custkey"""))

  /** Fuzzy string match: nearest same-nation supplier name per customer.
    * Equi-join on nationkey bounds the pair count (no cross product at scale).
    *
    * The per-customer argmin is `min(struct(dist, s_name))` — a pure hash
    * aggregate with map-side partial combine (struct ordering is
    * field-by-field, so the min IS the (dist ASC, s_name ASC) head) —
    * instead of the r1–r16 row_number window, which shuffled AND sorted
    * every scored pair by customer (guide §2.3 "aggregate before you
    * shuffle": the aggregate ships one row per customer per map task where
    * the window shipped every pair, and drops the per-partition sort).
    * Result-identical: both pick the unique (dist, s_name) minimum per
    * customer.
    */
  private val fnLevenshtein = Q(
    "fn_levenshtein",
    (s, d) => {
      val pairs = T.customer(s, d)
        .join(broadcast(T.supplier(s, d)), col("c_nationkey") === col("s_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("s_name"),
          levenshtein(col("c_name"), col("s_name")).as("dist"))
      pairs.groupBy("c_custkey", "c_name")
        .agg(min(struct(col("dist"), col("s_name"))).as("m"))
        .select(col("c_custkey"), col("c_name"),
          col("m.s_name").as("s_name"), col("m.dist").as("dist"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, s_name, dist
FROM (SELECT c_custkey, c_name, s_name,
        levenshtein(c_name, s_name) AS dist,
        row_number() OVER (PARTITION BY c_custkey
                           ORDER BY levenshtein(c_name, s_name) ASC, s_name ASC) AS rn
      FROM customer JOIN supplier ON c_nationkey = s_nationkey)
WHERE rn = 1 ORDER BY c_custkey"""))

  private val fnDatetime = Q(
    "fn_datetime",
    (s, d) => T.events(s, d).select(
      col("event_id"),
      to_date(date_trunc("day", col("ts"))).as("day"),
      year(col("ts")).as("y"),
      month(col("ts")).as("m"),
      hour(col("ts")).as("h"),
      (expr("weekday(ts)") + 1).as("isodow"),
      datediff(lit("2024-02-01").cast("date"), col("ts")).as("days_to_feb"),
      unix_timestamp(col("ts")).as("epoch_s"),
      (em(col("ts")) + 3600000000L).as("plus1h_us"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
CAST(date_trunc('day', ts) AS DATE) AS day,
year(ts) AS y, month(ts) AS m, hour(ts) AS h,
isodow(ts) AS isodow,
datediff('day', CAST(ts AS DATE), DATE '2024-02-01') AS days_to_feb,
epoch_us(ts) // 1000000 AS epoch_s,
epoch_us(ts) + 3600000000 AS plus1h_us
FROM events ORDER BY event_id"""))

  private val fnMath = Q(
    "fn_math",
    (s, d) => T.lineitem(s, d)
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        round(col("l_extendedprice"), 2).as("price_r2"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        ceil(col("l_quantity") / 7).cast("long").as("q_ceil"),
        floor(col("l_quantity") / 7).cast("long").as("q_floor"),
        r4(log(col("l_extendedprice"))).as("ln_price"),
        r4(exp(col("l_discount"))).as("exp_disc"),
        r4(pow(col("l_quantity"), 1.5)).as("q_pow"),
        signum(col("l_discount") - 0.05).cast("int").as("disc_sign"),
        pmod(col("l_orderkey") - 5, lit(7L)).as("pm7"))
      .orderBy("l_orderkey"),
    Some("""SELECT l_orderkey,
round(l_extendedprice, 2) AS price_r2,
abs(l_discount - 0.05) AS disc_dev,
CAST(ceil(l_quantity / 7) AS BIGINT) AS q_ceil,
CAST(floor(l_quantity / 7) AS BIGINT) AS q_floor,
round(ln(l_extendedprice), 4) AS ln_price,
round(exp(l_discount), 4) AS exp_disc,
round(pow(l_quantity, 1.5), 4) AS q_pow,
CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign,
(((l_orderkey - 5) % 7) + 7) % 7 AS pm7
FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey"""))

  private val fnConditional = Q(
    "fn_conditional",
    (s, d) => T.customer(s, d).select(
      col("c_custkey"),
      when(col("c_acctbal") < 0, "negative")
        .when(col("c_acctbal") < 3000, "low")
        .when(col("c_acctbal") < 7000, "mid")
        .otherwise("high").as("tier"),
      coalesce(expr("nullif(c_mktsegment, 'BUILDING')"), lit("OTHER")).as("seg_or_other"),
      greatest(col("c_acctbal"), lit(0.0)).as("bal_floor0"),
      least(col("c_acctbal"), lit(5000.0)).as("bal_cap5k"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
CASE WHEN c_acctbal < 0 THEN 'negative'
     WHEN c_acctbal < 3000 THEN 'low'
     WHEN c_acctbal < 7000 THEN 'mid'
     ELSE 'high' END AS tier,
coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
greatest(c_acctbal, 0.0) AS bal_floor0,
least(c_acctbal, 5000.0) AS bal_cap5k
FROM customer ORDER BY c_custkey"""))

  /** Exact money arithmetic via DECIMAL(12,2) + cast round-trips. */
  private val fnCastDecimal = Q(
    "fn_cast_decimal",
    (s, d) => T.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("sum_exact"),
        sum(col("o_orderkey").cast("string").cast("long")).as("sum_key_roundtrip"),
        min(col("o_orderdate").cast("date")).as("first_date"),
        max(col("o_orderdate").cast("date")).as("last_date"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus"),
    Some("""SELECT o_orderstatus,
CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_exact,
CAST(sum(CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT)) AS BIGINT) AS sum_key_roundtrip,
min(CAST(o_orderdate AS DATE)) AS first_date,
max(CAST(o_orderdate AS DATE)) AS last_date,
count(*) AS n
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Array + higher-order functions over tokenized document text. */
  private val fnArray = Q(
    "fn_array",
    (s, d) => T.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_toks"),
        array_contains(col("toks"), "join").as("has_join"),
        concat_ws(" ", slice(col("toks"), 1, 5)).as("first5"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        aggregate(col("toks"), lit(0), (acc, x) => acc + length(x)).as("total_len"),
        size(filter(col("toks"), x => length(x) > 4)).as("n_long"),
        element_at(sort_array(col("toks")), 1).as("first_sorted"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
len(t) AS n_toks,
list_contains(t, 'join') AS has_join,
array_to_string(t[1:5], ' ') AS first5,
len(list_distinct(t)) AS n_uniq,
CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS INTEGER) AS total_len,
len(list_filter(t, x -> length(x) > 4)) AS n_long,
list_sort(t)[1] AS first_sorted
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
ORDER BY doc_id"""))

  /** Generator / UDTF shape: explode to token rows, word-count. */
  private val fnExplode = Q(
    "fn_explode",
    (s, d) => T.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("tok"),
    Some("""SELECT tok, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 100)
GROUP BY tok ORDER BY tok"""))

  /** JSON payload parsing + map construction (FTS props payloads). */
  private val fnMapJson = Q(
    "fn_map_json",
    (s, d) => T.events(s, d)
      .withColumn("parsed",
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .withColumn("m", map(lit("v"), col("value"), lit("k"),
        col("parsed.k").cast("double")))
      .select(
        col("event_id"),
        col("parsed.k").as("k_struct"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"),
        (col("parsed.k") === get_json_object(col("props"), "$.k").cast("int")).as("k_match"),
        concat_ws(",", map_keys(col("m"))).as("m_keys"),
        element_at(col("m"), "k").as("m_k"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct,
CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
TRUE AS k_match,
'v,k' AS m_keys,
CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS DOUBLE) AS m_k
FROM events ORDER BY event_id"""))

  /** Bitwise family — exact integer ops, identical in both engines. */
  private val fnBitwise = Q(
    "fn_bitwise",
    (s, d) => T.part(s, d).select(
      col("p_partkey"),
      expr("shiftleft(p_size, 3)").as("sl3"),
      expr("shiftright(p_partkey, 2)").as("sr2"),
      (col("p_partkey").bitwiseAND(255L)).as("and255"),
      (col("p_partkey").bitwiseOR(16L)).as("or16"),
      (col("p_partkey").bitwiseXOR(col("p_size").cast("long"))).as("xor_size"),
      expr("bit_count(p_partkey)").as("popcount"),
      expr("~p_size").as("negated"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
p_size << 3 AS sl3, p_partkey >> 2 AS sr2,
p_partkey & 255 AS and255, p_partkey | 16 AS or16,
xor(p_partkey, CAST(p_size AS BIGINT)) AS xor_size,
CAST(bit_count(p_partkey) AS INTEGER) AS popcount,
~p_size AS negated
FROM part ORDER BY p_partkey"""))

  /** Second string family: structural string surgery. */
  private val fnString2 = Q(
    "fn_string2",
    (s, d) => T.part(s, d).select(
      col("p_partkey"),
      translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
      reverse(col("p_name")).as("rev"),
      expr("repeat(p_brand, 2)").as("brand2"),
      substring_index(col("p_name"), " ", 1).as("first_word"),
      substring_index(col("p_name"), " ", -1).as("last_word"),
      instr(col("p_name"), "i").as("pos_i"),
      expr("left(p_name, 3)").as("l3"),
      expr("right(p_name, 3)").as("r3"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
reverse(p_name) AS rev,
repeat(p_brand, 2) AS brand2,
split_part(p_name, ' ', 1) AS first_word,
split_part(p_name, ' ', -1) AS last_word,
CAST(strpos(p_name, 'i') AS INTEGER) AS pos_i,
p_name[1:3] AS l3,
p_name[-3:] AS r3
FROM part ORDER BY p_partkey"""))

  /** URL parsing — the transfer-log staple (every FTS record carries
    * source/destination endpoints). URLs are CONSTRUCTED from fixture
    * columns so both engines parse the identical strings; Spark's
    * `parse_url` (java.net.URI-backed) is then cross-checked against an
    * independent regex decomposition in DuckDB — component-level parity,
    * not string-equality theater. Pure per-row codegen'd work.
    */
  private val fnUrl = Q(
    "fn_url",
    (s, d) => T.supplier(s, d)
      .select(col("s_suppkey"),
        concat(lit("https://sup-"), col("s_suppkey"),
          lit(".example.org:8443/n/"), col("s_nationkey"),
          lit("/items?k="), col("s_suppkey") % 7, lit("&v=2#frag")).as("url"))
      .select(col("s_suppkey"), col("url"),
        expr("parse_url(url, 'PROTOCOL')").as("proto"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("query"),
        expr("parse_url(url, 'REF')").as("frag"),
        expr("parse_url(url, 'QUERY', 'k')").cast("int").as("k"))
      .orderBy("s_suppkey"),
    Some("""SELECT s_suppkey, url,
regexp_extract(url, '^([a-z]+)://', 1) AS proto,
regexp_extract(url, '://([^/:]+)', 1) AS host,
regexp_extract(url, '://[^/]+(/[^?#]*)', 1) AS path,
regexp_extract(url, '\?([^#]*)', 1) AS query,
regexp_extract(url, '#(.*)$', 1) AS frag,
CAST(regexp_extract(url, '[?&]k=([^&#]*)', 1) AS INTEGER) AS k
FROM (SELECT s_suppkey,
  'https://sup-' || s_suppkey || '.example.org:8443/n/' || s_nationkey ||
  '/items?k=' || (s_suppkey % 7) || '&v=2#frag' AS url
  FROM supplier)
ORDER BY s_suppkey"""))

  /** Spark 4 VARIANT ingestion (§2.8 ext) — semi-structured JSON parsed
    * ONCE into the binary VARIANT encoding and then field-extracted with
    * type coercion (`variant_get`), the modern replacement for
    * per-access `get_json_object` string re-parsing on wide event
    * payloads. Extracts the typed field, its string form, a missing-path
    * probe (NULL, not an error), and the inferred schema — over the
    * events `props` column. The oracle reproduces the same reads with
    * DuckDB's JSON extraction (VARIANT itself is engine-specific; its
    * OBSERVABLE reads are not).
    *
    * Scale note: `parse_json` is evaluated once per row under a common
    * subexpression; on a real pipeline the VARIANT column would be
    * materialized at ingest so every downstream read is binary-offset
    * access, never a re-parse — that is the feature's point.
    *
    * ORACLE FIXTURE ASSUMPTION: the oracle hardcodes `sch` as the constant
    * `'OBJECT<k: BIGINT>'` — valid because every fixture `props` value is
    * uniformly `{"k": <int>}` (verified across all SFs). If a future
    * fixture regeneration varies the props shape, this key's hash compare
    * fails HERE first: update the constant (or compute the schema per row
    * in the oracle) rather than hunting the Spark side.
    */
  private val fnVariant = Q(
    "fn_variant",
    (s, d) => T.events(s, d)
      .selectExpr("event_id",
        "variant_get(parse_json(props), '$.k', 'int') AS k_int",
        "variant_get(parse_json(props), '$.k', 'string') AS k_str",
        "variant_get(parse_json(props), '$.missing', 'int') AS miss",
        "schema_of_variant(parse_json(props)) AS sch")
      .orderBy("event_id"),
    Some("""SELECT event_id,
CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
json_extract_string(props, '$.k') AS k_str,
CAST(json_extract(props, '$.missing') AS INTEGER) AS miss,
'OBJECT<k: BIGINT>' AS sch
FROM events ORDER BY event_id"""))

  /** Error-safe TRY arithmetic (§2.8 ext) — the ANSI-mode escape hatches
    * a production pipeline leans on so one dirty row NULLs instead of
    * killing the job: `try_divide` (÷0 → NULL, not Inf/error),
    * `try_cast` (unparseable → NULL), `try_element_at` (out-of-range
    * index → NULL), `try_multiply` (64-bit overflow → NULL). The fixture
    * exercises every NULL path on real rows (zero tax lines, a
    * non-numeric flag, line numbers past the array end, an
    * overflow-forcing literal). The oracle spells each TRY as its exact
    * DuckDB equivalent: NULLIF-guarded division (DuckDB's float ÷0 is
    * Inf, not an error — the guard IS the semantics), TRY_CAST, native
    * out-of-range list indexing, and a HUGEINT-checked product.
    */
  private val fnTryArith = Q(
    "fn_try_arith",
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture, so
    // the ORDER BY extends over every input the emitted values derive from
    // — any rows still tied are value-IDENTICAL, so cross-engine tie order
    // cannot flip the produced-order compare (SURVEY §5.4 total-order rule)
    (s, d) => T.lineitem(s, d)
      .selectExpr("l_orderkey", "l_linenumber",
        "l_extendedprice AS ep", "l_tax AS tx", "l_quantity AS qt",
        "l_discount AS dc",
        "try_divide(l_extendedprice, l_tax) AS q_div",
        // the dirty cast is RARE (line 7 rows carry the letter flag, the
        // rest a numeric string) for the same reason as the overflow
        // below: Spark's try_cast string→int failure is an ANSI exception
        // caught per row — every-row failure benched 4.5 s alone at sf0.1
        """try_cast(CASE WHEN l_linenumber = 7 THEN l_returnflag
                         ELSE CAST(l_orderkey AS STRING) END AS BIGINT)
           AS bad_cast""",
        "try_element_at(array(l_quantity, l_discount, l_tax), l_linenumber) AS elem",
        // overflow on the RARE subset only (every 1000th order): Spark's
        // try_multiply handles the overflow by catching the ANSI
        // ArithmeticException PER ROW — an every-row overflow paid 600k
        // exception unwinds and benched 30.8 s at sf0.1 vs ~0.6 s with the
        // rare-path shape, which is also the honest production profile
        // (dirty rows are the exception, not the rule)
        """try_multiply(9223372036854775807L,
           CASE WHEN l_orderkey % 1000 = 0 AND l_orderkey > 0
                THEN l_orderkey ELSE 1L END) AS ovf""")
      .orderBy("l_orderkey", "l_linenumber", "ep", "tx", "qt", "dc")
      .drop("ep", "tx", "qt", "dc"),
    Some("""SELECT l_orderkey, l_linenumber,
l_extendedprice / NULLIF(l_tax, 0) AS q_div,
TRY_CAST(CASE WHEN l_linenumber = 7 THEN l_returnflag
               ELSE CAST(l_orderkey AS VARCHAR) END AS BIGINT) AS bad_cast,
([l_quantity, l_discount, l_tax])[l_linenumber] AS elem,
CASE WHEN l_orderkey % 1000 = 0 AND l_orderkey > 0 THEN NULL
     ELSE CAST(9223372036854775807 AS BIGINT) END AS ovf
FROM lineitem
ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_tax, l_quantity, l_discount"""))

  /** Cryptographic digest functions (§2.8 ext) — the content-addressing
    * surface every dedup/partition-routing pipeline leans on: md5 and
    * sha-256 hex digests per row (over a composite of name and segment so
    * multi-column keying is exercised), plus digest length invariants and
    * the first md5 nibble (the repo's standard hash-bucketing device,
    * here surfaced as an explicit column). Engine-portable by
    * construction — both engines implement the identical RFC digests, so
    * every output byte matches with NO float discipline at all.
    *
    * Scale shape: pure map work before the output sort; digests are
    * codegen'd built-ins, not UDFs.
    */
  private val fnHash = Q(
    "fn_hash",
    (s, d) => T.customer(s, d)
      .filter(col("c_custkey") <= 200)
      .select(col("c_custkey"),
        concat(col("c_name"), lit("|"), col("c_mktsegment")).as("key"))
      .select(col("c_custkey"),
        md5(col("key")).as("md5_hex"),
        sha2(col("key"), 256).as("sha256_hex"),
        length(md5(col("key"))).as("md5_len"),
        length(sha2(col("key"), 256)).as("sha256_len"),
        expr("instr('0123456789abcdef', substring(md5(key), 1, 1)) - 1")
          .cast("int").as("bucket16"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
md5(key) AS md5_hex, sha256(key) AS sha256_hex,
CAST(length(md5(key)) AS INTEGER) AS md5_len,
CAST(length(sha256(key)) AS INTEGER) AS sha256_len,
CAST(strpos('0123456789abcdef', substring(md5(key), 1, 1)) - 1 AS INTEGER)
  AS bucket16
FROM (SELECT c_custkey, c_name || '|' || c_mktsegment AS key FROM customer
      WHERE c_custkey <= 200)
ORDER BY c_custkey"""))

  /** COLLATION-aware string semantics (§2.8 ext, r12) — Spark 4's
    * first-class collations: a deterministically case-MIXED brand column
    * (even part keys upper-cased, odd lower-cased — the dirty-ingest
    * shape) grouped under `UTF8_LCASE`, so 'BRAND#13' and 'brand#13' land
    * in ONE group with no normalizing projection in the plan; the group
    * emits its case-variant count as evidence the collation (not a
    * pre-lower) did the merging. The collated group KEY's surfaced binary
    * form is whichever variant the engine met first — nondeterministic by
    * the collation contract — so the emitted key is `lower(...)` cast
    * back to a plain (binary-collation) string, and the DuckDB oracle
    * reproduces the identical relation with an explicit lower() grouping
    * (ASCII fixture strings: UTF8_LCASE equality == lower() equality).
    *
    * Scale shape: one map-side-combinable hash aggregate; collation-aware
    * grouping hashes the collation key codegen-side — no UDF, no extra
    * pass.
    */
  private val fnCollation = Q(
    "fn_collation",
    (s, d) => T.part(s, d)
      .withColumn("bm",
        when(col("p_partkey") % 2 === 0, upper(col("p_brand")))
          .otherwise(lower(col("p_brand"))))
      .groupBy(collate(col("bm"), "UTF8_LCASE").as("b"))
      .agg(count(lit(1)).as("n_parts"),
        countDistinct(col("bm")).as("n_case_variants"),
        min(col("p_partkey")).as("min_partkey"))
      .select(lower(col("b")).cast("string").as("brand_lc"),
        col("n_parts"), col("n_case_variants"), col("min_partkey"))
      .orderBy("brand_lc"),
    Some("""WITH m AS (SELECT p_partkey,
    CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand) ELSE lower(p_brand) END AS bm
  FROM part)
SELECT lower(bm) AS brand_lc, count(*) AS n_parts,
  count(DISTINCT bm) AS n_case_variants,
  min(p_partkey) AS min_partkey
FROM m GROUP BY lower(bm) ORDER BY brand_lc"""))

  val all: Seq[Q] = Seq(fnString, fnRegex, fnLevenshtein, fnDatetime, fnMath,
    fnHash, fnCollation,
    fnConditional, fnCastDecimal, fnArray, fnExplode, fnMapJson, fnBitwise,
    fnString2, fnUrl, fnVariant, fnTryArith)
}
