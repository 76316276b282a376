package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §C — scalar function surface (SURVEY.md §2.1.C).
  *
  * All built-in codegen'd expressions (no UDFs) so every query stays
  * inside whole-stage codegen. Engine-parity notes per key:
  *  - dayofweek: Spark is 1=Sunday, DuckDB 0=Sunday → oracle adds 1.
  *  - ceil/floor on double: Spark returns LONG, DuckDB DOUBLE → cast
  *    both sides to a common type.
  *  - pow() is libm-dependent → squared terms are written as exact
  *    decimal multiplication instead.
  *  - regexp_extract: Spark needs the explicit group-0 index.
  */
object Scalar {

  def fnString(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "part")
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lc"),
        substring(col("p_brand"), 7, 2).as("brand_sfx"),
        regexp_extract(lower(col("p_type")), "^[a-z]+", 0).as("type_head"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  def fnDatetime(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate")).cast("long").as("days_to_98"))
      .orderBy("o_orderkey")

  def fnMath(s: SparkSession, dir: String): DataFrame = {
    val taxD = col("l_tax").cast("decimal(18,2)")
    Tables.load(s, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity")).as("qty_r"),
        abs(col("l_discount") - 0.04).as("disc_dev"),
        ceil(col("l_extendedprice")).cast("double").as("price_ceil"),
        floor(col("l_extendedprice")).cast("double").as("price_floor"),
        ((lit(1) + taxD) * (lit(1) + taxD)).cast("double").as("tax_sq"),
        greatest(col("l_quantity"), col("l_extendedprice") / 1000).as("hi"),
        least(col("l_quantity"), col("l_extendedprice") / 1000).as("lo"))
      // rule-1 totality: (orderkey, linenumber) is non-unique in the
      // synthetic lineitem — order by every output column (see
      // Relational.relScanProject note)
      .orderBy("l_orderkey", "l_linenumber", "qty_r", "disc_dev",
        "price_ceil", "price_floor", "tax_sq", "hi", "lo")
  }

  /** Array functions over the mining baskets. */
  def fnArray(s: SparkSession, dir: String): DataFrame =
    graft.operators.Mining.baskets(s, dir)
      .select(
        col("tid").as("l_orderkey"),
        size(col("items")).cast("long").as("basket_size"),
        array_contains(col("items"), "Brand#13").as("has_13"),
        concat_ws(",", slice(col("items"), 1, 2)).as("first2"),
        array_position(col("items"), "Brand#13").as("pos_13"))
      .orderBy("l_orderkey")

  def fnJson(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 2).cast("long").as("parity"))
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"))
      .orderBy("parity")

  def fnConditional(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("low").as("tier"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("was_p")).as("status2"))
      .orderBy("o_orderkey")

  /** Cryptographic hash surface (content addressing / dedup keys /
    * deterministic sampling all hang off these): md5 and sha256 of
    * UTF-8 text, plus a composite-key hash — all codegen'd built-ins,
    * lowercase hex in both engines. */
  def fnHash(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(
        col("c_custkey"),
        md5(col("c_name")).as("h_md5"),
        sha2(col("c_name"), 256).as("h_sha256"),
        md5(concat_ws("|", col("c_name"), col("c_mktsegment"))).as("h_combo"))
      .orderBy("c_custkey")

  /** TYPED JSON parsing — `from_json` with an explicit schema (the
    * structured complement of `fn_json`'s path-string extraction):
    * parse once into a struct, read fields as columns. At scale this
    * is the semi-structured ingestion shape — one parse per row,
    * schema enforced at the scan, not per-path re-parsing. */
  def fnJsonTyped(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("p"))
      .select(col("event_id"),
        col("p.k").cast("long").as("k"),
        (col("p.k") % 7 === 0).as("k_div7"))
      .orderBy("event_id")

  /** VARIANT surface — Spark 4's semi-structured type: `parse_json`
    * turns the props text into a VariantType column (binary-encoded,
    * shreddable), `variant_get` extracts a TYPED path in one step, and
    * `try_variant_get` on an absent path yields NULL instead of
    * throwing — the open-schema ingestion shape (event payloads whose
    * fields drift) that VARIANT exists for. Output is plain typed
    * scalars, so the DuckDB oracle extracts the same values from the
    * raw JSON text.
    *
    * Scale posture: per-row projections, fully codegen-compatible; the
    * variant binary is built once per row and both extractions read it
    * without re-parsing the text (vs get_json_object re-parsing per
    * call — the reason VARIANT replaces JSON strings at volume). */
  def fnVariant(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(
        col("event_id"),
        expr("variant_get(v, '$.k', 'int')").as("k"),
        expr("try_variant_get(v, '$.absent', 'int')").as("absent_k"),
        expr("is_variant_null(v)").as("v_is_null"))
      .orderBy("event_id")

  /** COLLATION surface — Spark 4's collated-string type: each customer
    * name is doubled into (original, UPPERCASE) variants, and grouping
    * the `UTF8_LCASE`-collated column merges the case variants (cnt=2
    * per name) where binary grouping would keep them apart — the
    * case-insensitive key semantics (dedup keys, joins on user-entered
    * text) that previously forced `lower()` rewrites at every use site.
    * The collation is declared ON THE TYPE, so every comparison —
    * GROUP BY hashing here — honors it without per-expression wrapping.
    * Output lower-cases and casts back to binary strings, keeping the
    * result engine-portable (the oracle states the same query in the
    * `lower()`-rewrite form).
    *
    * Scale posture: collation changes hashing/equality only — the plan
    * is the same single explode + hash aggregate any groupBy gets. */
  def fnCollation(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(explode(array(col("c_name"), upper(col("c_name")))).as("name_v"))
      .select(expr("collate(name_v, 'UTF8_LCASE')").as("name_c"))
      .groupBy("name_c").agg(count(lit(1)).as("cnt"))
      .select(lower(col("name_c")).cast("string").as("name_lc"), col("cnt"))
      .orderBy("name_lc")

  /** VARIANT_EXPLODE — the Spark 4 table-valued generator over VARIANT:
    * each event's payload is lifted into a variant ARRAY (the original
    * k and its square) and laterally exploded to (pos, value) rows —
    * the open-schema fan-out shape (one row per array element / object
    * field, position and key surfaced) that replaces brittle
    * get_json_object index loops. Values come back as VARIANT and cast
    * to their target type per row.
    *
    * Scale posture: a lateral generator is embarrassingly parallel —
    * no shuffle, output bounded at arity × input rows. */
  def fnVariantExplode(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "events").createOrReplaceTempView("events_ve")
    s.sql(
      """SELECT event_id, CAST(p.pos AS BIGINT) AS pos, CAST(p.value AS BIGINT) AS val
        |FROM (SELECT event_id,
        |             concat('[', CAST(k AS STRING), ',', CAST(k * k AS STRING), ']') AS arr
        |      FROM (SELECT event_id,
        |                   CAST(get_json_object(props, '$.k') AS INT) AS k
        |            FROM events_ve)),
        |     LATERAL variant_explode(parse_json(arr)) AS p
        |ORDER BY event_id, pos""".stripMargin)
  }

  /** Regex surface — extract / replace-all / match / extract-all-count,
    * all codegen'd built-ins. Patterns stay inside the Java-regex ∩
    * RE2 common subset (character classes, quantifiers, anchors — no
    * lookaround/backrefs) so Spark and DuckDB agree; DuckDB's
    * regexp_replace needs the explicit 'g' flag to match Spark's
    * replace-ALL default (stated in the oracle text). */
  def fnRegexp(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("c_name"), "[aeiou]", "_").as("devoweled"),
        col("c_name").rlike("^Customer#[0-9]+$").as("canonical"),
        size(regexp_extract_all(col("c_mktsegment"), lit("[A-Z]+"), lit(0)))
          .cast("long").as("n_segs"))
      .orderBy("c_custkey")

  /** Higher-order-function surface over array columns — transform /
    * filter / aggregate as first-class codegen'd lambdas (the API tier
    * every vector op in LlmOps builds on, declared here in isolation):
    * positive-component count, L1 norm, and sum of squares per
    * embedding. Folds are LEFT folds from an explicit 0.0 seed in both
    * engines (DuckDB list_prepend + list_reduce), so the float results
    * are bit-identical — the SURVEY §2.0 fixed-operation-order rule. */
  def fnHof(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(
        col("vec_id"),
        size(filter(col("embedding"), x => x.cast("double") > 0))
          .cast("long").as("n_pos"),
        aggregate(transform(col("embedding"), x => abs(x.cast("double"))),
          lit(0.0), (acc, v) => acc + v).as("l1"),
        aggregate(transform(col("embedding"),
            x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("sumsq"))
      .orderBy("vec_id")

  /** Bitwise operator surface over the integer keys (hash partitioners,
    * bloom/bitset code, flag fields all live here): and/or/xor, shifts,
    * popcount — two's-complement on 64-bit in both engines. */
  def fnBitwise(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey").bitwiseAND(col("l_partkey"))).as("b_and"),
        (col("l_orderkey").bitwiseOR(col("l_partkey"))).as("b_or"),
        (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("b_xor"),
        shiftleft(col("l_linenumber"), 3).cast("long").as("b_shl"),
        shiftright(col("l_orderkey"), 2).as("b_shr"),
        bit_count(col("l_orderkey")).cast("long").as("b_pop"))
      .orderBy("l_orderkey", "l_linenumber", "b_and", "b_or", "b_xor",
        "b_shl", "b_shr", "b_pop")

  /** MAP-typed column surface — build a map from parallel arrays,
    * extract by key, cardinality, key membership (config blobs, feature
    * bags, per-row dimension dictionaries all ride this type). Outputs
    * project to SCALARS for the oracle: DuckDB's map extraction yields a
    * one-element list, so the comparison surface is the extracted values
    * and sizes, not the map value itself. Pure per-row projection. */
  def fnMap(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        map_from_arrays(
          array(lit("qty"), lit("price"), lit("disc")),
          array(col("l_quantity"), col("l_extendedprice"), col("l_discount")))
          .as("m"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        element_at(col("m"), "qty").as("m_qty"),
        element_at(col("m"), "price").as("m_price"),
        size(col("m")).cast("long").as("m_size"),
        array_contains(map_keys(col("m")), "disc").as("has_disc"))
      .orderBy("l_orderkey", "l_linenumber", "m_qty", "m_price",
        "m_size", "has_disc")

  /** Interval / calendar arithmetic surface: month addition (end-of-
    * month clamping identical in both engines), day addition, month-end,
    * quarter and day-of-year parts, and an all-integer month distance
    * (year·12+month arithmetic — `months_between`'s fractional 31-day
    * convention is engine-specific, the integer form is not). Date casts
    * on both sides keep timestamp-vs-date types aligned. */
  def fnInterval(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"),
        add_months(col("o_orderdate"), 3).as("plus3m"),
        date_add(col("o_orderdate"), 7).as("plus7d"),
        last_day(col("o_orderdate")).as("month_end"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        (lit(1998 * 12 + 1) - (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))))
          .cast("long").as("months_to_98"))
      .orderBy("o_orderkey")

  /** LISTAGG surface — Spark 4's ordered string aggregation
    * (`listagg(expr, delim) WITHIN GROUP (ORDER BY ...)`): nation names
    * rolled up per region as one delimited string, plus the DISTINCT
    * form over the single-letter name heads. WITHIN GROUP ordering is
    * what makes the aggregate deterministic — an unordered listagg is
    * partitioning-dependent and could never hash-match an oracle.
    *
    * Scale posture: listagg concatenates its whole group on one
    * reducer, so the group key must bound the group (25 nations per
    * region here). For unbounded groups the right shape is topk-prefix
    * + listagg (cap first), never raw listagg over a fact column. */
  def fnListagg(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(s, dir, "nation")
    n.groupBy(col("n_regionkey"))
      .agg(
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("members"),
        expr("listagg(DISTINCT substring(n_name, 1, 1), '') WITHIN GROUP (ORDER BY substring(n_name, 1, 1))")
          .as("initials"),
        count(lit(1)).as("n_members"))
      .orderBy("n_regionkey")
  }

  /** TRY_* error-safe arithmetic surface — the ANSI-mode companion
    * family (Spark 4 defaults to ANSI, where silent overflow/bad-cast
    * become runtime errors; `try_*` restores NULL-on-error semantics
    * per expression, not per session): division with a data-dependent
    * zero divisor, multiplication that overflows BIGINT for every key
    * but 1, and to_number over both a numeric and a non-numeric string.
    * The oracle states each column's defined result directly (DuckDB
    * yields NULL for float/0 and TRY_CAST failures natively).
    *
    * Scale posture: pure per-row codegen'd projections; `try_*` is the
    * 100 TB ingestion idiom — one malformed row NULLs out instead of
    * failing a 6-hour job. */
  def fnTryArith(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(
        col("o_orderkey"),
        expr("try_divide(o_totalprice, o_custkey % 3)").as("safe_div"),
        expr("try_multiply(o_orderkey, 9223372036854775807L)").as("safe_mul"),
        expr("CAST(try_to_number(CAST(o_orderkey AS STRING), '999999999999') AS BIGINT)")
          .as("num_ok"),
        expr("CAST(try_to_number(o_orderstatus, '999') AS BIGINT)").as("num_bad"))
      .orderBy("o_orderkey")

  /** XML surface — Spark 4's native XML functions: each order row is
    * serialized with `to_xml`, parsed back with `from_xml` under an
    * explicit schema (typed struct out, no text re-parsing per field),
    * and one field is additionally extracted by `xpath_long` straight
    * off the XML text. Round-trip identity is the correctness claim, so
    * the oracle is the identity projection of the source columns —
    * the same content-identity pattern as `rel_format_roundtrip`.
    * (Java's shortest-roundtrip double formatting keeps `tp_rt` exact:
    * to_xml prints the minimal decimal string, from_xml re-parses it to
    * the identical IEEE value — probed, including ≥ 1e7 values.)
    *
    * Scale posture: per-row projections, embarrassingly parallel; the
    * from_xml-with-schema form is the semi-structured scan shape (parse
    * once to a struct), xpath the ad-hoc exploration shape. */
  def fnXml(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"),
        to_xml(struct(
          col("o_orderkey").as("k"),
          col("o_orderstatus").as("st"),
          col("o_totalprice").as("tp"))).as("x"))
      .select(
        col("o_orderkey"),
        from_xml(col("x"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "k BIGINT, st STRING, tp DOUBLE")).as("r"),
        expr("xpath_long(x, '/ROW/k')").as("xp_k"))
      .select(
        col("o_orderkey"),
        col("r.st").as("st_rt"),
        col("r.tp").as("tp_rt"),
        col("xp_k"))
      .orderBy("o_orderkey")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_interval"    -> (fnInterval _),
    "fn_map"         -> (fnMap _),
    "fn_string"      -> (fnString _),
    "fn_datetime"    -> (fnDatetime _),
    "fn_math"        -> (fnMath _),
    "fn_array"       -> (fnArray _),
    "fn_json"        -> (fnJson _),
    "fn_conditional" -> (fnConditional _),
    "fn_hash"        -> (fnHash _),
    "fn_bitwise"     -> (fnBitwise _),
    "fn_regexp"      -> (fnRegexp _),
    "fn_hof"         -> (fnHof _),
    "fn_json_typed"  -> (fnJsonTyped _),
    "fn_variant"     -> (fnVariant _),
    "fn_collation"   -> (fnCollation _),
    "fn_listagg"     -> (fnListagg _),
    "fn_try_arith"   -> (fnTryArith _),
    "fn_xml"         -> (fnXml _),
    "fn_variant_explode" -> (fnVariantExplode _),
  )

  val oracle: Map[String, String] = Map(
    "fn_interval" ->
      """SELECT o_orderkey,
        |       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |       CAST(o_orderdate + INTERVAL 7 DAY AS DATE) AS plus7d,
        |       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
        |       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |       CAST(23977 - (year(o_orderdate) * 12 + month(o_orderdate)) AS BIGINT)
        |         AS months_to_98
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_map" ->
      """WITH m AS (
        |  SELECT l_orderkey, l_linenumber,
        |         map(['qty', 'price', 'disc'],
        |             [l_quantity, l_extendedprice, l_discount]) AS m
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |       m['qty'][1] AS m_qty,
        |       m['price'][1] AS m_price,
        |       CAST(cardinality(m) AS BIGINT) AS m_size,
        |       list_contains(map_keys(m), 'disc') AS has_disc
        |FROM m
        |ORDER BY l_orderkey, l_linenumber, m_qty, m_price, m_size,
        |         has_disc""".stripMargin,

    "fn_string" ->
      """SELECT p_partkey, lower(p_name) AS name_lc,
        |       substring(p_brand, 7, 2) AS brand_sfx,
        |       regexp_extract(lower(p_type), '^[a-z]+') AS type_head,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_datetime" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(l_quantity) AS qty_r,
        |       abs(l_discount - 0.04) AS disc_dev,
        |       ceil(l_extendedprice) AS price_ceil,
        |       floor(l_extendedprice) AS price_floor,
        |       CAST((1 + CAST(l_tax AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS tax_sq,
        |       greatest(l_quantity, l_extendedprice / 1000) AS hi,
        |       least(l_quantity, l_extendedprice / 1000) AS lo
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, qty_r, disc_dev, price_ceil,
        |         price_floor, tax_sq, hi, lo""".stripMargin,

    "fn_array" ->
      """WITH b AS (
        |  SELECT l_orderkey, list_sort(list(DISTINCT p_brand)) AS items
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |       CAST(length(items) AS BIGINT) AS basket_size,
        |       list_contains(items, 'Brand#13') AS has_13,
        |       array_to_string(items[1:2], ',') AS first2,
        |       CAST(list_position(items, 'Brand#13') AS BIGINT) AS pos_13
        |FROM b ORDER BY l_orderkey""".stripMargin,

    "fn_json" ->
      """SELECT CAST(k % 2 AS BIGINT) AS parity,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events)
        |GROUP BY k % 2 ORDER BY parity""".stripMargin,

    "fn_conditional" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 300000 THEN 'high'
        |            WHEN o_totalprice > 150000 THEN 'mid'
        |            ELSE 'low' END AS tier,
        |       coalesce(nullif(o_orderstatus, 'P'), 'was_p') AS status2
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_json_typed" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) % 7 = 0 AS k_div7
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_variant" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |       CAST(NULL AS INTEGER) AS absent_k,
        |       FALSE AS v_is_null
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_collation" ->
      """SELECT lower(name_v) AS name_lc, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest([c_name, upper(c_name)]) AS name_v FROM customer)
        |GROUP BY lower(name_v)
        |ORDER BY name_lc""".stripMargin,

    "fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_orderkey & l_partkey AS b_and,
        |       l_orderkey | l_partkey AS b_or,
        |       xor(l_orderkey, l_partkey) AS b_xor,
        |       CAST(l_linenumber << 3 AS BIGINT) AS b_shl,
        |       l_orderkey >> 2 AS b_shr,
        |       CAST(bit_count(l_orderkey) AS BIGINT) AS b_pop
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, b_and, b_or, b_xor, b_shl,
        |         b_shr, b_pop""".stripMargin,

    "fn_hash" ->
      """SELECT c_custkey,
        |       md5(c_name) AS h_md5,
        |       sha256(c_name) AS h_sha256,
        |       md5(c_name || '|' || c_mktsegment) AS h_combo
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_hof" ->
      """SELECT vec_id,
        |       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0))
        |            AS BIGINT) AS n_pos,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |         list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
        |         (acc, v) -> acc + v) AS l1,
        |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |         list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |         (acc, v) -> acc + v) AS sumsq
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "fn_variant_explode" ->
      """WITH e AS (SELECT event_id,
        |                  CAST(json_extract_string(props, '$.k') AS INT) AS k
        |           FROM events)
        |SELECT event_id, CAST(0 AS BIGINT) AS pos, CAST(k AS BIGINT) AS val FROM e
        |UNION ALL
        |SELECT event_id, CAST(1 AS BIGINT), CAST(k * k AS BIGINT) FROM e
        |ORDER BY event_id, pos""".stripMargin,

    "fn_listagg" ->
      """SELECT n_regionkey,
        |       string_agg(n_name, ',' ORDER BY n_name) AS members,
        |       string_agg(DISTINCT substring(n_name, 1, 1), ''
        |                  ORDER BY substring(n_name, 1, 1)) AS initials,
        |       CAST(count(*) AS BIGINT) AS n_members
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "fn_try_arith" ->
      """SELECT o_orderkey,
        |       o_totalprice / (o_custkey % 3) AS safe_div,
        |       CASE WHEN o_orderkey = 1 THEN 9223372036854775807
        |            WHEN o_orderkey = 0 THEN 0 ELSE NULL END AS safe_mul,
        |       CAST(o_orderkey AS BIGINT) AS num_ok,
        |       CAST(NULL AS BIGINT) AS num_bad
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_xml" ->
      """SELECT o_orderkey,
        |       o_orderstatus AS st_rt,
        |       o_totalprice AS tp_rt,
        |       o_orderkey AS xp_k
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_regexp" ->
      """SELECT c_custkey,
        |       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |       regexp_replace(c_name, '[aeiou]', '_', 'g') AS devoweled,
        |       regexp_matches(c_name, '^Customer#[0-9]+$') AS canonical,
        |       CAST(len(regexp_extract_all(c_mktsegment, '[A-Z]+')) AS BIGINT) AS n_segs
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
