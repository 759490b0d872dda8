package graft.llm

import org.apache.spark.sql.functions._
import graft.engine.GraftQuery
import graft.sources.Tables

/** String-similarity self-join: all pairs within edit distance 1, found via
  * the deletion-neighborhood blocking scheme (FastSS; Bocek et al. 2007,
  * "Fast Similarity Search in Large Dictionaries") instead of the O(n²)
  * all-pairs `levenshtein` scan.
  *
  * Losslessness of the blocking (why no true pair is missed): for strings
  * s ≠ t with edit distance ≤ 1, either (a) t substitutes one character of
  * s at position p — then deleting position p from each yields the SAME
  * string, so both emit that variant; or (b) t inserts one character into
  * s — then deleting the inserted character from t yields s itself, which s
  * emits as its identity variant. Every true pair therefore collides on at
  * least one variant key; the exact `levenshtein ≤ 1` re-check removes the
  * false candidates, so the result equals the all-pairs formulation — which
  * is exactly what the DuckDB oracle computes.
  *
  * Scale shape: each string of length L emits L+1 variant keys, so the
  * candidate join is over ~(L+1)·n rows hashed on the variant — linear
  * fan-out, equi-join, no cross product. Hot variant keys (many strings one
  * deletion apart from the same core) behave like q45's hot shingles; at
  * corpus scale the same maxDf-style bucket cap applies before pairing
  * (here buckets are ≤ alphabet-size and need no cap). */
object FuzzyJoin {

  /** The capped name vocabulary shared by q160/q177: first 2000 distinct
    * customer names in lexical order (deterministic at every SF). */
  def nameVocab(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select($"c_name").distinct()
      .orderBy($"c_name").limit(2000)
  }

  /** Edit-distance-≤1 pairs among the first 2000 customer names (the
    * deterministic cap keeps the oracle's all-pairs check tractable at
    * every SF; the Spark side never goes quadratic regardless). */
  val q160EditDistanceJoin: GraftQuery = GraftQuery.oracled(
    "q160_edit_distance_join",
    """WITH v AS (SELECT DISTINCT c_name FROM customer ORDER BY c_name LIMIT 2000)
      |SELECT a.c_name AS name_a, b.c_name AS name_b
      |FROM v a, v b
      |WHERE a.c_name < b.c_name
      |  AND abs(length(a.c_name) - length(b.c_name)) <= 1
      |  AND levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY name_a, name_b""") { (spark, dir) =>
    import spark.implicits._
    val vocab = nameVocab(spark, dir)
    // i = -1 marks the identity variant; i in [0, len) deletes char i+1.
    val variants = vocab
      .select($"c_name",
        explode(concat(array(lit(-1)),
          sequence(lit(0), length($"c_name") - 1))).as("i"))
      .select($"c_name",
        when($"i" === -1, $"c_name")
          .otherwise(concat(
            expr("substring(c_name, 1, i)"),
            expr("substring(c_name, i + 2)"))).as("v"))
    variants.as("a")
      .join(variants.as("b"),
        $"a.v" === $"b.v" && $"a.c_name" < $"b.c_name")
      .select($"a.c_name".as("name_a"), $"b.c_name".as("name_b"))
      .distinct()
      .filter(levenshtein($"name_a", $"name_b") <= 1)
      .orderBy($"name_a", $"name_b")
  }

  /** Directed edge list (both orientations) of the ED-≤1 name graph —
    * q160's pair set symmetrized, for graph algorithms over the similarity
    * graph (q177 BFS). */
  def ed1Edges(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val pairs = q160EditDistanceJoin.fn(spark, dir)
    pairs.select($"name_a".as("s"), $"name_b".as("t"))
      .unionByName(pairs.select($"name_b".as("s"), $"name_a".as("t")))
  }

  /** ENTITY RESOLUTION capstone: lossless ED-1 blocking (q160's deletion
    * neighborhoods — never a name×name cross join) generates candidate
    * record pairs, names map back to customer KEYS, and transitive closure
    * via large-star/small-star (q109's O(log n) machinery — ED-1 digit
    * chains make components with diameter in the HUNDREDS, exactly the
    * adversarial case plain label propagation's round cap rejects) merges
    * records into entities. Output: every multi-record entity with its
    * canonical (min) key and size — the dedup-before-join step of every
    * MDM / customer-360 pipeline. The DuckDB oracle re-derives the same
    * clusters with a recursive CTE over the identical pair rule.
    *
    * 100 TB plan: blocking emits O(Σ name-length) variants, the pair join
    * is keyed on the variant, and the closure rounds are edge-join +
    * groupBy-min — no stage is quadratic in records. */
  val q270EntityResolution: GraftQuery = GraftQuery.oracled(
    "q270_entity_resolution",
    """WITH RECURSIVE
      |v AS (SELECT DISTINCT c_name FROM customer ORDER BY c_name LIMIT 2000),
      |vk AS (SELECT c.c_custkey AS k, c.c_name FROM customer c JOIN v ON c.c_name = v.c_name),
      |p AS (SELECT a.k AS ka, b.k AS kb
      |      FROM vk a, vk b
      |      WHERE a.c_name < b.c_name
      |        AND abs(length(a.c_name) - length(b.c_name)) <= 1
      |        AND levenshtein(a.c_name, b.c_name) <= 1),
      |edges AS (SELECT ka AS src, kb AS dst FROM p UNION ALL SELECT kb, ka FROM p),
      |reach AS (
      |  SELECT k AS id, k AS lbl FROM vk
      |  UNION
      |  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
      |lab AS (SELECT id, min(lbl) AS entity_id FROM reach GROUP BY id)
      |SELECT entity_id, CAST(count(*) AS BIGINT) AS n_records
      |FROM lab GROUP BY entity_id HAVING count(*) >= 2
      |ORDER BY entity_id""") { (spark, dir) =>
    import spark.implicits._
    val vk = Tables.customer(spark, dir)
      .join(nameVocab(spark, dir), Seq("c_name"))
      .select($"c_name", $"c_custkey".as("k"))
    val namePairs = q160EditDistanceJoin.fn(spark, dir)
    val keyPairs = namePairs
      .join(vk.toDF("c_name", "ka"), $"name_a" === $"c_name").drop("c_name")
      .join(vk.toDF("c_name", "kb"), $"name_b" === $"c_name").drop("c_name")
      .select($"ka", $"kb")
    Dedup.starComponents(vk.select($"k"), keyPairs)._1
      .groupBy($"lbl".as("entity_id"))
      .agg(count(lit(1)).cast("long").as("n_records"))
      .filter($"n_records" >= 2)
      .orderBy($"entity_id")
  }

  /** GOLDEN-RECORD survivorship — MDM step two after q270's closure:
    * within each resolved entity, one surviving record is assembled by
    * per-attribute rules (canonical key = min; balance = max — "most
    * complete wins"; nation = the min-key record's — "master source
    * wins"). Every rule is an argmin/argmax with a deterministic
    * tie-break, so the merged master table is exactly oracle-able.
    *
    * 100 TB plan: the closure labels join the records once (key-keyed),
    * then one hash-agg with min/max/min_by — no per-entity iteration. */
  val q275GoldenRecord: GraftQuery = GraftQuery.oracled(
    "q275_golden_record",
    """WITH RECURSIVE
      |v AS (SELECT DISTINCT c_name FROM customer ORDER BY c_name LIMIT 2000),
      |vk AS (SELECT c.c_custkey AS k, c.c_name, c.c_acctbal, c.c_nationkey
      |       FROM customer c JOIN v ON c.c_name = v.c_name),
      |p AS (SELECT a.k AS ka, b.k AS kb
      |      FROM vk a, vk b
      |      WHERE a.c_name < b.c_name
      |        AND abs(length(a.c_name) - length(b.c_name)) <= 1
      |        AND levenshtein(a.c_name, b.c_name) <= 1),
      |edges AS (SELECT ka AS src, kb AS dst FROM p UNION ALL SELECT kb, ka FROM p),
      |reach AS (
      |  SELECT k AS id, k AS lbl FROM vk
      |  UNION
      |  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
      |lab AS (SELECT id, min(lbl) AS entity_id FROM reach GROUP BY id),
      |m AS (SELECT l.entity_id, vk.k, vk.c_acctbal, vk.c_nationkey
      |      FROM lab l JOIN vk ON l.id = vk.k)
      |SELECT entity_id, CAST(count(*) AS BIGINT) AS n_records,
      |       round(max(c_acctbal), 2) AS best_balance,
      |       CAST(min(c_nationkey) FILTER (WHERE k = entity_id) AS INT) AS master_nation
      |FROM m GROUP BY entity_id HAVING count(*) >= 2
      |ORDER BY entity_id""") { (spark, dir) =>
    import spark.implicits._
    val vk = Tables.customer(spark, dir)
      .join(nameVocab(spark, dir), Seq("c_name"))
      .select($"c_name", $"c_custkey".as("k"), $"c_acctbal", $"c_nationkey")
    val namePairs = q160EditDistanceJoin.fn(spark, dir)
    val keyPairs = namePairs
      .join(vk.select($"c_name", $"k".as("ka")), $"name_a" === $"c_name").drop("c_name")
      .join(vk.select($"c_name", $"k".as("kb")), $"name_b" === $"c_name").drop("c_name")
      .select($"ka", $"kb")
    val labels = Dedup.starComponents(vk.select($"k"), keyPairs)._1
    labels.join(vk, labels("id") === vk("k"))
      .groupBy($"lbl".as("entity_id"))
      .agg(count(lit(1)).cast("long").as("n_records"),
        graft.operators.RelationalCore.money(max($"c_acctbal")).as("best_balance"),
        min(when($"k" === $"lbl", $"c_nationkey")).cast("int").as("master_nation"))
      .filter($"n_records" >= 2)
      .orderBy($"entity_id")
  }

  def all: Seq[GraftQuery] = Seq(q160EditDistanceJoin, q270EntityResolution,
    q275GoldenRecord)
}
