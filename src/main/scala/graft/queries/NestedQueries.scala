package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.NestedOps
import graft.operators.NestedOps.AttrRule
import graft.sources.Tables

/** Nested-data transform inventory (SURVEY.md §2.7, N1-N6). Each query
  * constructs nested ArrayType(StructType)/StructType data from the flat
  * testdata tables, applies the REAL nested operator from [[NestedOps]],
  * then flattens back to a relational shape so DuckDB can recompute the
  * expected post-state directly with CASE/UNION logic.
  */
object NestedQueries extends graft.QueryPack {

  private def attr(name: String, value: Column, dt: String = "string"): Column =
    struct(lit(name).as("name"), value.as("value"), lit(dt).as("dt"))

  override def queries: Seq[Q] = Seq(

    // ---- N1: keyed nested-field conditional rewrite (when-chain) --------
    Q("q_n1_attr_rewrite",
      (s, d) => {
        val c = Tables.customer(s, d)
        val attrs = array(
          attr("MEK_Company",
            when(col("c_custkey") % 2 === 0, lit("Mekonomen")).otherwise(lit("Other"))),
          attr("MEK_Store_Id", col("c_mktsegment")),
          attr("MEK_SystemID", lit("5")))
        val rules = Seq(
          AttrRule("MEK_Company", lit("Meca"), onlyIfValue = Some("Mekonomen")),
          AttrRule("MEK_Store_Id", concat(lit("S"), (col("c_custkey") % 100).cast("string"))),
          AttrRule("MEK_SystemID", lit("6")))
        c.select(col("c_custkey").as("cust_id"),
            explode(NestedOps.rewriteAttrs(attrs, rules)).as("a"))
          .select(col("cust_id"), col("a.name").as("attr_name"), col("a.value").as("attr_value"))
      },
      Some("""SELECT c_custkey AS cust_id, 'MEK_Company' AS attr_name,
             |  CASE WHEN c_custkey % 2 = 0 THEN 'Meca' ELSE 'Other' END AS attr_value
             |FROM customer
             |UNION ALL
             |SELECT c_custkey, 'MEK_Store_Id', 'S' || CAST(c_custkey % 100 AS VARCHAR) FROM customer
             |UNION ALL
             |SELECT c_custkey, 'MEK_SystemID', '6' FROM customer""".stripMargin)),

    // ---- N2: nested upsert with container creation + dt annotation ------
    Q("q_n2_attr_upsert",
      (s, d) => {
        val c = Tables.customer(s, d)
        val company = attr("MEK_Company", lit("Mekonomen"))
        val oldDd = attr("MEK_DefaultDeliveryday", lit("-9D"), dt = "old")
        val attrs =
          when(col("c_custkey") % 10 === 7, lit(null))           // missing container
            .when(col("c_custkey") % 4 === 0, array(company, oldDd)) // attr present → update
            .otherwise(array(company))                            // attr absent → insert
        val dd = concat(lit("-"), (lit(1) + col("c_custkey") % 9).cast("string"), lit("D"))
        c.select(col("c_custkey").as("cust_id"),
            explode(NestedOps.upsertAttr(attrs, "MEK_DefaultDeliveryday", dd, "string")).as("a"))
          .select(col("cust_id"), col("a.name").as("attr_name"),
            col("a.value").as("attr_value"), col("a.dt").as("attr_dt"))
      },
      Some("""SELECT c_custkey AS cust_id, 'MEK_Company' AS attr_name,
             |  'Mekonomen' AS attr_value, 'string' AS attr_dt
             |FROM customer WHERE c_custkey % 10 <> 7
             |UNION ALL
             |SELECT c_custkey, 'MEK_DefaultDeliveryday',
             |  '-' || CAST(1 + c_custkey % 9 AS VARCHAR) || 'D', 'string'
             |FROM customer""".stripMargin)),

    // ---- N3: nested deletion (array filter + struct dropFields) ---------
    Q("q_n3_nested_delete",
      (s, d) => {
        val c = Tables.customer(s, d)
        val attrs = array(
          attr("LastOrderDate", lit("2024-01-01")),
          attr("Keep", col("c_mktsegment")))
        val creds = struct(
          lit("2024-06-01").as("last_logged_in"),
          concat(lit("host-"), (col("c_custkey") % 3).cast("string")).as("login_host"))
        c.select(col("c_custkey").as("cust_id"),
            explode(NestedOps.deleteAttr(attrs, "LastOrderDate")).as("a"),
            creds.dropFields("last_logged_in").as("creds"))
          .select(col("cust_id"), col("a.name").as("attr_name"),
            col("a.value").as("attr_value"), col("creds.login_host").as("login_host"))
      },
      Some("""SELECT c_custkey AS cust_id, 'Keep' AS attr_name,
             |  c_mktsegment AS attr_value,
             |  'host-' || CAST(c_custkey % 3 AS VARCHAR) AS login_host
             |FROM customer""".stripMargin)),

    // ---- N4/U1: idempotent nested set-insert one level down -------------
    Q("q_n4_group_insert",
      (s, d) => {
        val o = Tables.orders(s, d)
        val groups = when(col("o_orderstatus") === "F",
            array(lit("CG_Mekonomen"), lit("CG_F")))
          .otherwise(array(concat(lit("CG_"), col("o_orderstatus"))))
        val users = o.groupBy(col("o_custkey"))
          .agg(collect_list(struct(col("o_orderkey").as("user_id"), groups.as("groups"))).as("users"))
        users.select(col("o_custkey").as("cust_id"),
            explode(transform(col("users"), u =>
              u.withField("groups", NestedOps.insertIfAbsent(u.getField("groups"), lit("CG_Mekonomen"))))).as("u"))
          .select(col("cust_id"), col("u.user_id").as("user_id"),
            explode(col("u.groups")).as("group_id"))
      },
      Some("""SELECT o_custkey AS cust_id, o_orderkey AS user_id,
             |  'CG_' || o_orderstatus AS group_id FROM orders
             |UNION ALL
             |SELECT o_custkey, o_orderkey, 'CG_Mekonomen' FROM orders""".stripMargin)),

    // ---- N5: recursive schema-agnostic descendant text replace ----------
    Q("q_n5_recursive_replace",
      (s, d) => {
        val o = Tables.orders(s, d)
        val oldId = col("o_custkey").cast("string")
        val tree = struct(
          when(col("o_orderkey") % 2 === 0, oldId)
            .otherwise(concat(lit("BP-"), col("o_orderkey").cast("string"))).as("bpno"),
          array(oldId, col("o_orderstatus"), lit("X")).as("elements"),
          struct(
            when(col("o_orderkey") % 3 === 0, oldId).otherwise(lit("note")).as("note"),
            lit("h").as("host")).as("profile"))
        val staged = o.select(
          col("o_orderkey"),
          oldId.as("old_id"),
          concat(lit("NEW_"), col("o_custkey").cast("string")).as("new_id"),
          tree.as("tree"))
        NestedOps.replaceNestedText(staged, "tree", "old_id", "new_id")
          .select(col("o_orderkey").as("user_id"),
            col("tree.bpno").as("bpno"),
            array_join(col("tree.elements"), ",").as("elements"),
            col("tree.profile.note").as("note"))
      },
      Some("""SELECT o_orderkey AS user_id,
             |  CASE WHEN o_orderkey % 2 = 0 THEN 'NEW_' || CAST(o_custkey AS VARCHAR)
             |       ELSE 'BP-' || CAST(o_orderkey AS VARCHAR) END AS bpno,
             |  'NEW_' || CAST(o_custkey AS VARCHAR) || ',' || o_orderstatus || ',X' AS elements,
             |  CASE WHEN o_orderkey % 3 = 0 THEN 'NEW_' || CAST(o_custkey AS VARCHAR)
             |       ELSE 'note' END AS note
             |FROM orders""".stripMargin)),

    // ---- N6: nested timestamp overwrite (injected clock) ----------------
    Q("q_n6_creation_date",
      (s, d) => {
        val c = Tables.customer(s, d)
        val profile = struct(
          lit("2020-01-01T00:00:00+00:00").as("creation_date"),
          concat(lit("s"), (col("c_custkey") % 4).cast("string")).as("site"))
        c.select(col("c_custkey").as("cust_id"),
            NestedOps.overwriteField(profile, "creation_date",
              lit("2026-08-12T00:00:00+00:00")).as("p"))
          .select(col("cust_id"), col("p.creation_date").as("creation_date"),
            col("p.site").as("site"))
      },
      Some("""SELECT c_custkey AS cust_id,
             |  '2026-08-12T00:00:00+00:00' AS creation_date,
             |  's' || CAST(c_custkey % 4 AS VARCHAR) AS site
             |FROM customer""".stripMargin))
  )
}
