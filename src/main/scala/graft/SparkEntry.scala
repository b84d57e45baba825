package graft

import graft.functions.{Preds, RowFunctions}
import graft.operators.{Index, Pipe}
import graft.sources.CsvSource

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql`) per
  * operator in SURVEY.md §2, each expressed through the graft library
  * over the /root/testdata parquet tables.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query (reference README.md:53-65 shape — stream joined
    * through two indices, filtered, derived column, top-k) on sf=0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val cust = Index.uniqueIndexOn(t(spark, dir, "customer"), "c_custkey")
    val li = Index.build(t(spark, dir, "lineitem"), Seq("l_orderkey"),
      unique = false, broadcastHint = false)
    Pipe(t(spark, dir, "orders"))
      .join(cust, "o_custkey")
      .join(li, "o_orderkey")
      .filter(col("l_quantity") > 30)
      .mapColumns("amount" -> col("l_extendedprice") * (lit(1) - col("l_discount")))
      .selectColumns("o_orderkey", "c_name", "l_linenumber", "amount")
      .orderBy(col("o_orderkey"), col("l_linenumber"))
      .top(100)
      .df
  }

  // ────────────────────────────────────────────────────────────────
  // Reference-surface queries (SURVEY.md §2)
  // ────────────────────────────────────────────────────────────────

  type Q = (SparkSession, String) => DataFrame

  private val referenceQueries: Map[String, Q] = Map(
    // §2.1 scans: CSV sink → CsvSource round-trip (all-string schema)
    "q_csv_roundtrip" -> { (s, dir) =>
      val out = s"/tmp/graft_csv_${math.abs(dir.hashCode)}"
      Pipe(t(s, dir, "region"))
        .toCsv(out, Seq("r_regionkey", "r_name"), singleFile = true)
      Pipe(CsvSource.fromFile(out).selectColumns("r_regionkey", "r_name").read(s))
        .df
    },

    // §2.1 TakeRows: in-memory rows as a source
    "q_take_rows" -> { (s, _) =>
      val schema = StructType(Seq(
        StructField("k", StringType), StructField("v", StringType)))
      Pipe.takeRows(s,
        Seq(Row("a", "1"), Row("b", "2"), Row("c", "3")), schema).df
    },

    // §2.3 SelectColumns
    "q_select_columns" -> { (s, dir) =>
      Pipe(t(s, dir, "customer"))
        .selectColumns("c_custkey", "c_name", "c_mktsegment").df
    },

    // §2.3 DropColumns (dropping an absent column is not an error)
    "q_drop_columns" -> { (s, dir) =>
      Pipe(t(s, dir, "part"))
        .dropColumns("p_retailprice", "p_size", "not_a_column").df
    },

    // §2.3 Filter + Like predicate
    "q_filter_like" -> { (s, dir) =>
      Pipe(t(s, dir, "lineitem"))
        .filter(Preds.like(Map[String, Any](
          "l_returnflag" -> "R", "l_linestatus" -> "F")))
        .selectColumns("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
        .df
    },

    // §2.3 All/Any/Not combinators
    "q_filter_combinators" -> { (s, dir) =>
      Pipe(t(s, dir, "customer"))
        .filter(Preds.any(
          Preds.like(Map[String, Any]("c_mktsegment" -> "BUILDING")),
          Preds.all(col("c_acctbal") > 9000d,
            Preds.not(col("c_nationkey") === 3))))
        .selectColumns("c_custkey", "c_mktsegment", "c_acctbal")
        .df
    },

    // §2.3 Map (declarative derived column)
    "q_map_amount" -> { (s, dir) =>
      Pipe(t(s, dir, "lineitem"))
        .mapColumns("amount" ->
          col("l_extendedprice") * (lit(1) - col("l_discount")))
        .selectColumns("l_orderkey", "l_linenumber", "amount").df
    },

    // §2.11 Transform: arbitrary-Scala filter+map fused (0/1 fan-out)
    "q_transform" -> { (s, dir) =>
      val outSchema = StructType(Seq(
        StructField("l_orderkey", LongType),
        StructField("l_linenumber", IntegerType),
        StructField("qty", DoubleType),
        StructField("amount", DoubleType)))
      Pipe(t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax"))
        .transformRows(outSchema) { r =>
          val qty = r.getAs[Double]("l_quantity")
          if (qty > 45d) {
            val amount = r.getAs[Double]("l_extendedprice") *
              (1d - r.getAs[Double]("l_discount")) * (1d + r.getAs[Double]("l_tax"))
            Some(Row(r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"),
              qty, amount))
          } else None
        }.df
    },

    // §2.3 Validate (all rows pass → identity; failure path unit-tested)
    "q_validate" -> { (s, dir) =>
      Pipe(t(s, dir, "orders"))
        .validate(col("o_totalprice") > 0d,
          format_string("order %s: non-positive total", col("o_orderkey")))
        .selectColumns("o_orderkey", "o_totalprice").df
    },

    // §2.5 Top(n) over declared order
    "q_top" -> { (s, dir) =>
      Pipe(t(s, dir, "orders"))
        .orderBy(col("o_orderkey"))
        .top(10)
        .selectColumns("o_orderkey", "o_custkey", "o_totalprice").df
    },

    // §2.5 Drop(n) then Top(n) — sorted pagination (csvplus_test.go:500-513)
    "q_drop_top" -> { (s, dir) =>
      Pipe(t(s, dir, "orders"))
        .orderBy(col("o_orderkey"))
        .drop(10)
        .top(5)
        .selectColumns("o_orderkey", "o_custkey").df
    },

    // §2.5 TakeWhile: prefix until first MACHINERY customer
    "q_take_while" -> { (s, dir) =>
      Pipe(t(s, dir, "customer"))
        .orderBy(col("c_custkey"))
        .takeWhile(col("c_mktsegment") =!= "MACHINERY")
        .selectColumns("c_custkey", "c_name", "c_mktsegment").df
    },

    // §2.5 DropWhile: complement of the prefix
    "q_drop_while" -> { (s, dir) =>
      Pipe(t(s, dir, "customer"))
        .orderBy(col("c_custkey"))
        .dropWhile(col("c_mktsegment") =!= "MACHINERY")
        .selectColumns("c_custkey", "c_name", "c_mktsegment").df
    },

    // §2.4 IndexOn → sorted iteration
    "q_index_iterate" -> { (s, dir) =>
      Index.indexOn(t(s, dir, "customer"), "c_nationkey", "c_custkey")
        .iterate.select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    },

    // §2.4 UniqueIndexOn (uniqueness verified eagerly)
    "q_unique_index" -> { (s, dir) =>
      Index.uniqueIndexOn(t(s, dir, "customer"), "c_custkey")
        .iterate.select("c_custkey", "c_name")
    },

    // §2.4 Index.Find — point lookup on leading key
    "q_index_find" -> { (s, dir) =>
      Index.indexOn(t(s, dir, "orders"), "o_custkey", "o_orderkey")
        .find(37L)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // §2.4 Index.SubIndex — narrow, remaining cols become the key
    "q_sub_index" -> { (s, dir) =>
      Index.indexOn(t(s, dir, "customer"),
        "c_mktsegment", "c_nationkey", "c_custkey")
        .subIndex("BUILDING")
        .iterate.select("c_custkey", "c_mktsegment", "c_nationkey")
    },

    // §2.4 ResolveDuplicates — arbitrary-Scala resolver over full group
    "q_resolve_dups" -> { (s, dir) =>
      Index.indexOn(t(s, dir, "customer"), "c_nationkey")
        .resolveDuplicates { rows =>
          Some(rows.maxBy(r =>
            (r.getAs[Double]("c_acctbal"), -r.getAs[Long]("c_custkey"))))
        }
        .iterate.select("c_custkey", "c_nationkey", "c_acctbal")
    },

    // §2.4 ResolveDuplicates — declarative (codegen) variant
    "q_resolve_dups_decl" -> { (s, dir) =>
      Index.indexOn(t(s, dir, "customer"), "c_nationkey")
        .resolveDuplicatesBy(col("c_acctbal").desc, col("c_custkey").asc)
        .iterate.select("c_custkey", "c_nationkey", "c_acctbal")
    },

    // §2.6 Join against a unique index (broadcast hash join)
    "q_join_unique" -> { (s, dir) =>
      val cust = Index.uniqueIndexOn(t(s, dir, "customer"), "c_custkey")
      Pipe(t(s, dir, "orders"))
        .join(cust, "o_custkey")
        .selectColumns("o_orderkey", "o_custkey", "c_name", "c_mktsegment",
          "o_totalprice").df
    },

    // §2.6 natural join (empty probe columns → index key names)
    "q_join_natural" -> { (s, dir) =>
      val cust = Index.uniqueIndexOn(
        t(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey")
      Pipe(t(s, dir, "orders"))
        .join(cust)
        .selectColumns("o_orderkey", "o_custkey", "c_name").df
    },

    // §2.6 prefix join: 1 probe column vs 2-column index key (1:N),
    // non-broadcast index → shuffle join (the 100 TB-safe path)
    "q_join_prefix" -> { (s, dir) =>
      val li = Index.build(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber"), unique = false, broadcastHint = false)
      Pipe(t(s, dir, "orders"))
        .join(li, "o_orderkey")
        .selectColumns("o_orderkey", "l_linenumber", "l_quantity",
          "o_totalprice").df
    },

    // §2.6 mergeRows collision rule: probe (source) value wins
    "q_join_collision" -> { (s, dir) =>
      val cust = Index.uniqueIndexOn(t(s, dir, "customer"), "c_custkey")
      Pipe(t(s, dir, "orders"))
        .mapColumns("c_name" -> concat(lit("ORD-"), col("o_orderstatus")))
        .join(cust, "o_custkey")
        .selectColumns("o_orderkey", "c_name", "c_acctbal").df
    },

    // §2.6 Except — anti-join
    "q_except" -> { (s, dir) =>
      val auto = Index.indexOn(
        t(s, dir, "customer").filter(col("c_mktsegment") === "AUTOMOBILE"),
        "c_custkey")
      Pipe(t(s, dir, "orders"))
        .except(auto, "o_custkey")
        .selectColumns("o_orderkey", "o_custkey").df
    },

    // §2.6 union (capability parity)
    "q_union" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      Pipe(li).filter(col("l_returnflag") === "R")
        .union(Pipe(li).filter(col("l_returnflag") === "A"))
        .selectColumns("l_orderkey", "l_linenumber", "l_returnflag").df
    },

    // §2.9 Row helpers: SafeGetValue (coalesce) + ValueAsInt cast
    "q_row_helpers" -> { (s, dir) =>
      val nation = t(s, dir, "nation").filter(col("n_nationkey") < 10)
        .select("n_nationkey", "n_name")
      t(s, dir, "customer")
        .join(nation, col("c_nationkey") === col("n_nationkey"), "left")
        .select(
          col("c_custkey"),
          RowFunctions.safeGet(col("n_name"), "UNKNOWN").as("nation_name"),
          RowFunctions.valueAsInt(col("c_custkey").cast(StringType), "c_custkey")
            .as("c_key_int"))
    }
  )

  private val referenceOracles: Map[String, String] = Map(
    "q_csv_roundtrip" ->
      "SELECT cast(r_regionkey AS varchar) AS r_regionkey, r_name FROM region",
    "q_take_rows" ->
      "SELECT * FROM (VALUES ('a','1'),('b','2'),('c','3')) AS t(k, v)",
    "q_select_columns" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "q_drop_columns" ->
      "SELECT p_partkey, p_name, p_brand, p_type FROM part",
    "q_filter_like" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'",
    "q_filter_combinators" ->
      "SELECT c_custkey, c_mktsegment, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING' OR (c_acctbal > 9000 AND NOT c_nationkey = 3)",
    "q_map_amount" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice * (1 - l_discount) AS amount FROM lineitem",
    "q_transform" ->
      "SELECT l_orderkey, l_linenumber, l_quantity AS qty, l_extendedprice * (1 - l_discount) * (1 + l_tax) AS amount FROM lineitem WHERE l_quantity > 45",
    "q_validate" ->
      "SELECT o_orderkey, o_totalprice FROM orders",
    "q_top" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10",
    "q_drop_top" ->
      "SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 5 OFFSET 10",
    "q_take_while" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey < COALESCE((SELECT min(c_custkey) FROM customer WHERE c_mktsegment = 'MACHINERY'), 9223372036854775807)",
    "q_drop_while" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey >= (SELECT min(c_custkey) FROM customer WHERE c_mktsegment = 'MACHINERY')",
    "q_index_iterate" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer",
    "q_unique_index" ->
      "SELECT c_custkey, c_name FROM customer",
    "q_index_find" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_custkey = 37",
    "q_sub_index" ->
      "SELECT c_custkey, c_mktsegment, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'",
    "q_resolve_dups" ->
      "SELECT c_custkey, c_nationkey, c_acctbal FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn FROM customer) WHERE rn = 1",
    "q_resolve_dups_decl" ->
      "SELECT c_custkey, c_nationkey, c_acctbal FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn FROM customer) WHERE rn = 1",
    "q_join_unique" ->
      "SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey",
    "q_join_natural" ->
      "SELECT o_orderkey, o_custkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey",
    "q_join_prefix" ->
      "SELECT o_orderkey, l_linenumber, l_quantity, o_totalprice FROM orders JOIN lineitem ON o_orderkey = l_orderkey",
    "q_join_collision" ->
      "SELECT o_orderkey, 'ORD-' || o_orderstatus AS c_name, c_acctbal FROM orders JOIN customer ON o_custkey = c_custkey",
    "q_except" ->
      "SELECT o_orderkey, o_custkey FROM orders ANTI JOIN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE') ON o_custkey = c_custkey",
    "q_union" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag = 'R' UNION ALL SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag = 'A'",
    "q_row_helpers" ->
      "SELECT c_custkey, COALESCE(n_name, 'UNKNOWN') AS nation_name, cast(cast(c_custkey AS varchar) AS bigint) AS c_key_int FROM customer LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10) n ON c_nationkey = n_nationkey"
  )

  /** One per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, Q] = referenceQueries

  /** DuckDB-runnable equivalents; queries absent here get the driver's
    * weaker rows-only check. */
  def oracleSql: Map[String, String] = referenceOracles
}
