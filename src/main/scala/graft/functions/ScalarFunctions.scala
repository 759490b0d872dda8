package graft.functions

import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables
import graft.operators.RelationalCore.{money, stat}

/** SURVEY.md §2.7 — scalar function families (string / date / math / array /
  * map / JSON / hash), each exercised over the corpus column it exists for.
  *
  * All functions here are Catalyst built-ins (codegen'd, pushdown-friendly) —
  * no UDFs in any hot path (SURVEY.md §2.11). Oracle dialect notes are
  * inline where Spark and DuckDB names differ (e.g. Spark `log` is natural
  * log ↔ DuckDB `ln`; DuckDB `log` is log10). */
object ScalarFunctions {

  /** String family over `part`/`documents`: case, trim, length, slicing,
    * split-indexing, regexp extraction/replacement, padding, edit distance. */
  val q37StringFuncs: GraftQuery = GraftQuery.oracled(
    "q37_string_funcs",
    """SELECT p_partkey,
      |       upper(p_name)                               AS name_uc,
      |       length(p_name)                              AS name_len,
      |       substr(p_name, 1, 4)                        AS name_head,
      |       string_split(p_name, ' ')[1]                AS first_word,
      |       regexp_extract(p_brand, '([0-9]+)', 1)      AS brand_num,
      |       regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_devoweled,
      |       concat_ws('-', p_brand, p_type)             AS brand_type,
      |       lpad(p_brand, 10, '*')                      AS brand_padded,
      |       levenshtein(p_name, 'small ring')           AS edit_dist
      |FROM part
      |WHERE p_partkey < 100
      |ORDER BY p_partkey""") { (spark, dir) =>
    import spark.implicits._
    Tables.part(spark, dir)
      .filter($"p_partkey" < 100)
      .select($"p_partkey",
        upper($"p_name").as("name_uc"),
        length($"p_name").as("name_len"),
        substring($"p_name", 1, 4).as("name_head"),
        element_at(split($"p_name", " "), 1).as("first_word"),
        regexp_extract($"p_brand", "([0-9]+)", 1).as("brand_num"),
        regexp_replace($"p_type", "[AEIOU]", "_").as("type_devoweled"),
        concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
        lpad($"p_brand", 10, "*").as("brand_padded"),
        levenshtein($"p_name", lit("small ring")).as("edit_dist"))
      .orderBy($"p_partkey")
  }

  /** Date/time family over `orders`: component extraction, truncation,
    * day arithmetic, epoch seconds. (Day-of-week is deliberately absent —
    * Spark counts 1=Sunday, DuckDB 0=Sunday.) */
  val q38DateFuncs: GraftQuery = GraftQuery.oracled(
    "q38_date_funcs",
    """SELECT o_orderkey,
      |       year(o_orderdate)                       AS yr,
      |       month(o_orderdate)                      AS mo,
      |       day(o_orderdate)                        AS dom,
      |       quarter(o_orderdate)                    AS qtr,
      |       date_trunc('month', o_orderdate)        AS month_start,
      |       date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
      |       CAST(epoch(o_orderdate) AS BIGINT)      AS epoch_s
      |FROM orders
      |WHERE o_orderkey < 300
      |ORDER BY o_orderkey""") { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" < 300)
      .select($"o_orderkey",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        quarter($"o_orderdate").as("qtr"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        datediff(to_date(lit("2002-01-01")), $"o_orderdate".cast("date")).as("days_to_2002"),
        unix_timestamp($"o_orderdate").as("epoch_s"))
      .orderBy($"o_orderkey")
  }

  /** Math family over `lineitem`. Spark `log` = natural log ↔ DuckDB `ln`. */
  val q39MathFuncs: GraftQuery = GraftQuery.oracled(
    "q39_math_funcs",
    """SELECT l_orderkey, l_linenumber,
      |       round(abs(l_extendedprice - 1000), 4)  AS abs_delta,
      |       CAST(ceil(l_extendedprice) AS BIGINT)                         AS price_ceil,
      |       CAST(floor(l_extendedprice) AS BIGINT)                        AS price_floor,
      |       round(pow(l_quantity, 2), 4)           AS qty_sq,
      |       round(sqrt(l_extendedprice), 4)        AS price_sqrt,
      |       round(ln(l_extendedprice), 4)          AS price_ln,
      |       round(log10(l_extendedprice), 4)       AS price_log10,
      |       l_quantity % 7                                                AS qty_mod
      |FROM lineitem
      |WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber""") { (spark, dir) =>
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_orderkey" < 100)
      .select($"l_orderkey", $"l_linenumber",
        stat(abs($"l_extendedprice" - 1000)).as("abs_delta"),
        ceil($"l_extendedprice").cast("long").as("price_ceil"),
        floor($"l_extendedprice").cast("long").as("price_floor"),
        stat(pow($"l_quantity", 2)).as("qty_sq"),
        stat(sqrt($"l_extendedprice")).as("price_sqrt"),
        stat(log($"l_extendedprice")).as("price_ln"),
        stat(log10($"l_extendedprice")).as("price_log10"),
        ($"l_quantity" % 7).as("qty_mod"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** JSON family over `events.props` (a JSON object string, FIXTURES.md):
    * path extraction as string and typed int. Stays StringType at rest,
    * parsed at query time (SURVEY.md §1.1). */
  val q40JsonFuncs: GraftQuery = GraftQuery.oracled(
    "q40_json_funcs",
    """SELECT event_id,
      |       json_extract_string(props, '$.k')          AS k_str,
      |       CAST(json_extract(props, '$.k') AS INT)    AS k_int,
      |       len(json_keys(props))                      AS n_keys
      |FROM events
      |WHERE event_id < 500
      |ORDER BY event_id""") { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_id" < 500)
      .select($"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        get_json_object($"props", "$.k").cast("int").as("k_int"),
        size(map_keys(expr("from_json(props, 'map<string,int>')"))).as("n_keys"))
      .orderBy($"event_id")
  }

  /** Array family over tokenized `documents.text`: size, distinct, contains,
    * first/last indexing — the text-side array toolkit (SURVEY.md §2.7). */
  val q41ArrayText: GraftQuery = GraftQuery.oracled(
    "q41_array_text",
    """SELECT doc_id,
      |       len(string_split(text, ' '))                     AS n_tokens,
      |       len(list_distinct(string_split(text, ' ')))      AS n_distinct,
      |       list_contains(string_split(text, ' '), 'spark')  AS has_spark,
      |       string_split(text, ' ')[1]                       AS first_tok,
      |       string_split(text, ' ')[-1]                      AS last_tok
      |FROM documents
      |WHERE doc_id < 200
      |ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 200)
      .withColumn("toks", split($"text", " "))
      .select($"doc_id",
        size($"toks").as("n_tokens"),
        size(array_distinct($"toks")).as("n_distinct"),
        array_contains($"toks", "spark").as("has_spark"),
        element_at($"toks", 1).as("first_tok"),
        element_at($"toks", -1).as("last_tok"))
      .orderBy($"doc_id")
  }

  /** Higher-order functions over the 64-dim embedding vectors: L2 norm,
    * mean, dot-with-self via transform/aggregate — the same kernels the
    * similarity-search ops build on (SURVEY.md §2.10). Floats are cast to
    * double BEFORE arithmetic on both sides; both engines fold the 64
    * elements left-to-right. */
  val q42ArrayEmbeddings: GraftQuery = GraftQuery.oracled(
    "q42_array_embeddings",
    """SELECT vec_id, label,
      |       len(embedding) AS dim,
      |       round(sqrt(list_sum(list_transform(embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
      |       round(list_sum(list_transform(embedding,
      |         x -> CAST(x AS DOUBLE))) / len(embedding), 4)     AS mean_val
      |FROM embeddings
      |WHERE vec_id < 200
      |ORDER BY vec_id""") { (spark, dir) =>
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .filter($"vec_id" < 200)
      .select($"vec_id", $"label",
        size($"embedding").as("dim"),
        stat(sqrt(aggregate(transform($"embedding", x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x))).as("l2_norm"),
        stat(aggregate(transform($"embedding", x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x) / size($"embedding")).as("mean_val"))
      .orderBy($"vec_id")
  }

  /** Hash family: portable content-hash dedup keys (md5 + sha2-256 over
    * normalized text — the exact-dedup keys of SURVEY.md §2.10). Spark's
    * xxhash64/murmur hash are engine-specific and excluded from the oracle. */
  val q43HashFuncs: GraftQuery = GraftQuery.oracled(
    "q43_hash_funcs",
    """SELECT doc_id,
      |       md5(lower(trim(text)))    AS md5_key,
      |       sha256(lower(trim(text))) AS sha_key
      |FROM documents
      |WHERE doc_id < 200
      |ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 200)
      .select($"doc_id",
        md5(lower(trim($"text"))).as("md5_key"),
        sha2(lower(trim($"text")), 256).as("sha_key"))
      .orderBy($"doc_id")
  }

  /** Semi-structured props through Spark 4's VariantType (`parse_json` →
    * `variant_get`/`try_variant_get`) — the modern shredded-binary encoding
    * of q40's string-path extraction. At rest a variant column beats JSON
    * strings at scale (typed access without re-parsing per query, columnar
    * shredding of common paths); DuckDB has no variant, so the oracle states
    * the same paths via plain JSON extraction — the VALUES must agree even
    * though the encodings differ. */
  val q118VariantJson: GraftQuery = GraftQuery.oracled(
    "q118_variant_json",
    """SELECT event_id,
      |       CAST(json_extract(props, '$.k') AS INT)    AS k_int,
      |       CAST(json_extract(props, '$.k') AS DOUBLE) AS k_dbl,
      |       json_extract_string(props, '$.missing')    AS missing_str
      |FROM events
      |WHERE event_id < 500
      |ORDER BY event_id""") { (spark, dir) =>
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_id" < 500)
      .withColumn("v", parse_json($"props"))
      .select($"event_id",
        variant_get($"v", "$.k", "int").as("k_int"),
        variant_get($"v", "$.k", "double").as("k_dbl"),
        try_variant_get($"v", "$.missing", "string").as("missing_str"))
      .orderBy($"event_id")
  }

  /** XML functions (§2.7, native in Spark 4 after the spark-xml merge,
    * SPARK-44265): `to_xml` renders each order struct to an XML payload,
    * `from_xml` parses it back against an explicit DDL schema, and the
    * recovered fields must equal the source columns — the oracle reads them
    * straight off the raw table, so any serialization loss (type mangling,
    * double formatting, escaping) breaks the hash. Doubles survive because
    * to_xml renders Java's shortest-round-trip decimal form.
    *
    * Scale note: both functions are per-row codegen-adjacent expressions in
    * one projection — no shuffle, no UDF; the XML column is the same opaque
    * payload shape a feed-ingest pipeline would carry. */
  val q204XmlRoundtrip: GraftQuery = GraftQuery.oracled(
    "q204_xml_roundtrip",
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_orderkey < 500
      |ORDER BY o_orderkey""") { (spark, dir) =>
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" < 500)
      .select($"o_orderkey", to_xml(struct($"o_orderkey".as("k"),
        $"o_orderstatus".as("st"), $"o_totalprice".as("tp"))).as("x"))
      .select($"o_orderkey", from_xml($"x",
        org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, st STRING, tp DOUBLE")).as("r"))
      .select($"o_orderkey", $"r.st".as("o_orderstatus"),
        $"r.tp".as("o_totalprice"))
      .orderBy($"o_orderkey")
  }

  /** Collation-aware grouping (Spark 4 collations, SPARK-46830): a
    * deterministically case-mangled segment column grouped under
    * UTF8_LCASE collation — 'building' and 'BUILDING' are ONE group under
    * the collated comparison without rewriting the data. The emitted
    * representative is the BINARY min of the raw strings (collated group
    * keys surface an arbitrary member's case, so the key itself is never
    * output); the oracle groups by lower() — the two must agree exactly.
    *
    * Scale note: the collated group-by hashes the collation key — same
    * single-shuffle plan as any hash aggregate; collation changes the
    * comparator, not the plan shape. */
  val q205CollatedGroup: GraftQuery = GraftQuery.oracled(
    "q205_collated_group",
    """WITH m AS (SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
      |                       ELSE c_mktsegment END AS seg
      |           FROM customer)
      |SELECT min(seg) AS segment, CAST(count(*) AS BIGINT) AS n
      |FROM m GROUP BY lower(seg)
      |ORDER BY segment""") { (spark, dir) =>
    import spark.implicits._
    Tables.customer(spark, dir)
      .select(when($"c_custkey" % 2 === 0, lower($"c_mktsegment"))
        .otherwise($"c_mktsegment").as("seg"))
      .groupBy(collate($"seg", "UTF8_LCASE").as("k"))
      .agg(min($"seg").as("segment"), count(lit(1)).as("n"))
      .select($"segment", $"n")
      .orderBy($"segment")
  }

  /** URL decomposition with `parse_url` — host / path / query-parameter
    * extraction, the web-corpus metadata step (domain-level dedup,
    * per-site quality weighting). URLs are synthesized deterministically
    * from document columns; Spark uses the dedicated `parse_url`
    * HOST/PATH/QUERY:key forms while the DuckDB oracle derives the same
    * fields with regexes — two independent parsers agreeing on the
    * decomposition. Domain census output (docs + langs per host).
    *
    * Scale note: pure codegen'd projection + one hash agg; parse_url is a
    * Catalyst expression, not a UDF. */
  val q247UrlParse: GraftQuery = GraftQuery.oracled(
    "q247_url_parse",
    """WITH u AS (
      |  SELECT 'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
      |           || '?lang=' || lang AS url
      |  FROM documents),
      |f AS (SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
      |             regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
      |             regexp_extract(url, 'lang=(\w+)', 1) AS lang_param
      |      FROM u)
      |SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(count(DISTINCT lang_param) AS BIGINT) AS n_langs,
      |       min(path) AS first_path
      |FROM f GROUP BY host
      |ORDER BY host""") { (spark, dir) =>
    import spark.implicits._
    val u = Tables.documents(spark, dir).select(
      concat(lit("https://"), $"source", lit(".example.com/docs/"),
        $"doc_id".cast("string"), lit("?lang="), $"lang").as("url"))
    u.select(
        parse_url($"url", lit("HOST")).as("host"),
        parse_url($"url", lit("PATH")).as("path"),
        parse_url($"url", lit("QUERY"), lit("lang")).as("lang_param"))
      .groupBy($"host")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"lang_param").as("n_langs"),
        min($"path").as("first_path"))
      .orderBy($"host")
  }

  /** Scalar-level CSV codec round-trip: `to_csv(struct(...))` serializes
    * each order to one CSV line IN the engine (no file I/O — q67 covers
    * the file path), `from_csv` parses it back with an explicit schema,
    * and the aggregate over the PARSED columns must equal the oracle's
    * aggregate over the raw columns — the loss-free codec law, including
    * round-trippable doubles. The per-record string codec is how rows
    * enter/leave message queues at ingest boundaries.
    *
    * Scale note: both directions are codegen'd Catalyst expressions in
    * one projection; nothing leaves the task. */
  val q250CsvRoundtrip: GraftQuery = GraftQuery.oracled(
    "q250_csv_scalar_roundtrip",
    """SELECT o_orderstatus AS s, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
      |       CAST(max(o_orderkey) AS BIGINT) AS max_k
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY s""") { (spark, dir) =>
    import spark.implicits._
    val lines = Tables.orders(spark, dir)
      .select(to_csv(struct($"o_orderkey", $"o_orderstatus", $"o_totalprice")).as("line"))
    lines
      .select(from_csv($"line", org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, s STRING, p DOUBLE"), Map.empty[String, String]).as("r"))
      .select($"r.k".as("k"), $"r.s".as("s"), $"r.p".as("p"))
      .groupBy($"s")
      .agg(count(lit(1)).as("n"),
        sum(floor($"p" * 100 + 0.5).cast("long")).cast("long").as("cents"),
        max($"k").cast("long").as("max_k"))
      .orderBy($"s")
  }

  /** `array_sort` with a CUSTOM COMPARATOR lambda — tokens ordered by
    * (length, lexicographic), the canonical-ordering primitive built-in
    * ascending sort can't express. The DuckDB oracle reaches the same
    * order through its own mechanism (sort a (len, tok) struct list and
    * project the token back), so the comparator semantics — not the
    * syntax — are what's pinned.
    *
    * Scale note: per-row lambda over bounded arrays inside codegen; no
    * shuffle beyond the final ORDER BY. */
  val q251ArraySortComparator: GraftQuery = GraftQuery.oracled(
    "q251_array_sort_comparator",
    """SELECT doc_id,
      |       array_to_string(
      |         list_transform(
      |           list_sort(list_transform(string_split(lower(text), ' '),
      |                                    t -> {'l': length(t), 't': t}))[1:5],
      |           s -> s.t), ' ') AS first5
      |FROM documents
      |WHERE doc_id <= 20
      |ORDER BY doc_id""") { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" <= 20)
      .select($"doc_id",
        array_join(slice(expr(
          """array_sort(split(lower(text), ' '),
            |  (l, r) -> CASE WHEN length(l) < length(r) THEN -1
            |                 WHEN length(l) > length(r) THEN 1
            |                 WHEN l < r THEN -1 WHEN l > r THEN 1
            |                 ELSE 0 END)""".stripMargin), 1, 5), " ")
          .as("first5"))
      .orderBy($"doc_id")
  }

  def all: Seq[GraftQuery] = Seq(
    q37StringFuncs, q38DateFuncs, q39MathFuncs, q40JsonFuncs,
    q41ArrayText, q42ArrayEmbeddings, q43HashFuncs, q118VariantJson,
    q204XmlRoundtrip, q205CollatedGroup, q247UrlParse, q250CsvRoundtrip,
    q251ArraySortComparator)
}
