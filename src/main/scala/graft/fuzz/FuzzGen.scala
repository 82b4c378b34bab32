package graft.fuzz

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded generative differential fuzzer: random
  * filter / aggregate / join / window plans over the fixture tables,
  * rendered TWICE from one AST — once as DataFrame API calls, once as
  * SQL constrained to the dialect subset Spark SQL and DuckDB share.
  * FuzzSpec compares the two Catalyst entry paths for many seeds in
  * `sbt test`; a fixed pick of seeds is registered as driver queries
  * (ExtE) whose oracle is the SAME SQL text run by DuckDB — a true
  * cross-engine differential that sweeps conventions (grouping, ties,
  * integer arithmetic, HAVING, distinct counts, window frames) nobody
  * thought to hand-trap.
  *
  * Determinism rules baked into the grammar: integer-only arithmetic
  * (no floats anywhere), non-negative operands for %, group keys from
  * bounded domains (string columns or mod-buckets), row_number windows
  * totally tie-broken by unique id columns, and a final ORDER BY over
  * every output column.
  */
object FuzzGen {

  final case class TableMeta(name: String, intCols: Seq[String],
      strCols: Seq[String], idCols: Seq[String])

  val tables: Seq[TableMeta] = Seq(
    TableMeta("region", Seq("r_regionkey"), Seq("r_name"),
      Seq("r_regionkey")),
    TableMeta("nation", Seq("n_nationkey", "n_regionkey"), Seq("n_name"),
      Seq("n_nationkey")),
    TableMeta("customer", Seq("c_custkey", "c_nationkey"),
      Seq("c_mktsegment"), Seq("c_custkey")),
    TableMeta("supplier", Seq("s_suppkey", "s_nationkey"), Seq(),
      Seq("s_suppkey")),
    TableMeta("part", Seq("p_partkey", "p_size"), Seq("p_brand", "p_type"),
      Seq("p_partkey")),
    TableMeta("orders", Seq("o_orderkey", "o_custkey"),
      Seq("o_orderstatus", "o_orderpriority"), Seq("o_orderkey")),
    TableMeta("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
      Seq("l_returnflag", "l_linestatus"),
      Seq("l_orderkey", "l_linenumber")))

  private val byName = tables.map(t => t.name -> t).toMap

  /** FK equi-join pairs: (left table, right table, left col, right col). */
  val fkJoins: Seq[(String, String, String, String)] = Seq(
    ("nation", "region", "n_regionkey", "r_regionkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("lineitem", "supplier", "l_suppkey", "s_suppkey"))

  // ---- AST ----

  /** (column, modulus, rhs, op) — op ∈ =, <>, <= over `col % modulus`. */
  final case class Pred(colName: String, k: Int, r: Int, op: String) {
    def sql: String = s"($colName % $k) $op $r"
    def df: Column = {
      val m = col(colName) % k
      op match {
        case "=" => m === r
        case "<>" => m =!= r
        case "<=" => m <= r
      }
    }
  }

  /** A group key: raw string column, or `CAST(col % m AS BIGINT)`. */
  final case class Key(alias: String, colName: String, mod: Option[Int]) {
    def sqlExpr: String =
      mod.fold(colName)(m => s"CAST($colName % $m AS BIGINT)")
    def sqlAliased: String = s"$sqlExpr AS $alias"
    /** Bare expression (no alias) — groupingSets' set lists must match
      * the grouping columns STRUCTURALLY, and an Alias wrapper defeats
      * the match (every key came back NULL).
      */
    def dfExpr: Column =
      mod.fold(col(colName))(m => (col(colName) % m).cast("bigint"))
    def df: Column = dfExpr.as(alias)
  }

  /** One aggregate: kind ∈ count, sum, min, max, cntd, minstr, plus
    * "csum" — a conditional CASE aggregate
    * `SUM(CASE WHEN (col % k) = r THEN col % k2 ELSE -1 END)` (ck
    * carries (k, r, k2)): CASE inside an aggregate exercises the
    * expression-under-agg path both planners constant-fold and
    * null-propagate differently than bare columns — and "sumd"
    * (round 9): `SUM(DISTINCT col)`, which over an FK join measures
    * whether dedup-under-aggregate survives join fan-out identically
    * in both planners (Spark expands it to a two-phase
    * distinct-then-sum; DuckDB hashes inline).
    */
  final case class Agg(alias: String, kind: String, colName: String,
      ck: Option[(Int, Int, Int)] = None) {
    def sql: String = kind match {
      case "count" => s"CAST(COUNT(*) AS BIGINT) AS $alias"
      case "sum" => s"CAST(SUM($colName) AS BIGINT) AS $alias"
      case "sumd" => s"CAST(SUM(DISTINCT $colName) AS BIGINT) AS $alias"
      case "min" => s"MIN($colName) AS $alias"
      case "max" => s"MAX($colName) AS $alias"
      case "cntd" => s"CAST(COUNT(DISTINCT $colName) AS BIGINT) AS $alias"
      case "minstr" => s"MIN($colName) AS $alias"
      case "csum" =>
        val (k, r, k2) = ck.get
        s"CAST(SUM(CASE WHEN ($colName % $k) = $r THEN $colName % $k2 " +
          s"ELSE -1 END) AS BIGINT) AS $alias"
    }
    def df: Column = (kind match {
      case "count" => count(lit(1)).cast("bigint")
      case "sum" => sum(col(colName)).cast("bigint")
      case "sumd" => sum_distinct(col(colName)).cast("bigint")
      case "min" => min(col(colName))
      case "max" => max(col(colName))
      case "cntd" => countDistinct(col(colName)).cast("bigint")
      case "minstr" => min(col(colName))
      case "csum" =>
        val (k, r, k2) = ck.get
        sum(when(col(colName) % k === r, col(colName) % k2)
          .otherwise(lit(-1))).cast("bigint")
    }).as(alias)
  }

  sealed trait Shape
  /** gmode ∈ plain | rollup | cube | gsets — ROLLUP/CUBE subtotal rows
    * carry NULL keys in both engines (SQL-standard grouping sets); the
    * NULLS FIRST total order makes them adjudicable. "gsets"
    * (round 10) is an EXPLICIT GROUPING SETS list derived
    * deterministically from the keys — ((k0,k1),(k0),()) for two keys,
    * ((k0),()) for one — the partial-subtotal shape ROLLUP/CUBE never
    * emit (a set list that skips levels), exercising the expand-node
    * planning path with a hand-picked set lattice.
    */
  final case class AggShape(keys: Seq[Key], aggs: Seq[Agg],
      having: Option[Int], gmode: String) extends Shape
  /** fn ∈ row_number | rank | dense_rank. row_number orders by
    * (ordCol, ids) — it NEEDS the total order to be deterministic.
    * rank/dense_rank order by ordCol ALONE: with ties the row SET kept
    * by `fn <= topK` is deterministic (all peers share a rank) even
    * though a row_number there would not be — precisely the tie
    * semantics under test, including rank's gaps vs dense_rank's
    * none.
    */
  final case class WinShape(pk: Key, ordCol: String, desc: Boolean,
      ids: Seq[String], topK: Int, fn: String = "row_number")
    extends Shape
  /** Windowed running SUM under an explicit frame + LAG with an explicit
    * default — the frame-semantics minefield: ROWS frames are tie-broken
    * by the unique id columns; RANGE frames order by the value column
    * ALONE (the single-expression restriction both engines share) and
    * include peers, which keeps the peer-group sum deterministic.
    */
  final case class FrameShape(pk: Key, ordCol: String, desc: Boolean,
      ids: Seq[String], frame: String, prec: Int,
      sym: Boolean = false) extends Shape
  /** Set operation between two mod-projections of the SAME table under
    * different predicates: UNION ALL keeps bag semantics, INTERSECT /
    * EXCEPT are set-distinct in BOTH engines — the convention under
    * test. `withRn` (round 9) layers a global ROW_NUMBER window OVER
    * the set-op result — the window-over-set-op composition: tied `v`
    * values receive consecutive rns in some order, but the (v, rn)
    * pair MULTISET is deterministic (equal rows are interchangeable),
    * which is exactly the property the differential checks. `withAgg`
    * (round 10) instead collapses the set-op result under DISTINCT
    * aggregates — COUNT(DISTINCT v) + SUM(DISTINCT v) — the
    * dedup-under-aggregate path fed by a set operation whose own
    * distinctness convention (bag UNION ALL vs set INTERSECT/EXCEPT)
    * must NOT leak into the aggregate's dedup.
    */
  final case class SetShape(colName: String, mod: Int, op: String,
      predA: Pred, predB: Pred, withRn: Boolean = false,
      withAgg: Boolean = false) extends Shape

  /** Uncorrelated scalar subquery in the WHERE clause:
    * `parentCol op (SELECT MAX(childCol) FROM tbl WHERE pred)` —
    * DataFrame rendering decorrelates to a broadcast 1-row aggregate +
    * filter. MAX over an empty child is NULL, which nulls the
    * comparison and filters every row — a convention both engines must
    * share for the differential to stay green.
    */
  final case class ScalarSub(parentCol: String, tbl: String,
      childCol: String, op: String, pred: Pred) {
    def sql: String =
      s"$parentCol $op (SELECT MAX($childCol) FROM $tbl WHERE ${pred.sql})"
  }

  /** CORRELATED scalar subquery in the WHERE clause:
    * `parentCol op (SELECT MAX(childCol) FROM tbl
    *                WHERE tbl.fk = parent.pk AND pred)` —
    * the classic decorrelation minefield. The DataFrame rendering
    * decorrelates by hand the way Catalyst does: group the child by its
    * FK, aggregate, LEFT join back on the parent key, filter. Parents
    * with no qualifying child rows see a NULL aggregate, which nulls
    * the comparison and drops the row — the convention under test.
    */
  final case class CorrSub(parentCol: String, tbl: String, childCol: String,
      op: String, fkChild: String, fkParent: String, pred: Pred) {
    def sql: String = s"$parentCol $op (SELECT MAX($childCol) FROM $tbl " +
      s"WHERE $fkChild = $fkParent AND ${pred.sql})"
  }

  /** Round-19 wave 14: correlated [NOT] EXISTS inside a CASE-WHEN
    * SELECT expression —
    * `CASE WHEN [NOT] EXISTS (SELECT 1 FROM tbl WHERE fk = pk AND
    *  pred) THEN parentCol % m ELSE -1 END AS cex` — the EXISTS
    * predicate in a PROJECTION (not WHERE/HAVING): neither a semi nor
    * an anti join can express it (both CASE branches must survive), so
    * Catalyst plans an ExistenceJoin witness consumed by the CASE —
    * the select-list sibling of wave 8's disjunctive OrExists. NULL
    * conventions: a NULL correlation key never matches (EXISTS false
    * → the ELSE branch; NOT EXISTS true → the THEN branch), and a
    * NULL `parentCol` surfaces a NULL THEN value — identical in both
    * engines. The DataFrame rendering builds the witness by hand:
    * distinct child keys LEFT-joined, `coalesce(flag, false)`, CASE
    * via when/otherwise.
    */
  final case class CaseExists(parentCol: String, m: Int, tbl: String,
      fkChild: String, fkParent: String, neg: Boolean, pred: Pred) {
    def sql: String =
      s"CAST(CASE WHEN ${if (neg) "NOT " else ""}EXISTS " +
        s"(SELECT 1 FROM $tbl WHERE $fkChild = $fkParent AND " +
        s"${pred.sql}) THEN $parentCol % $m ELSE -1 END AS BIGINT) AS cex"
  }

  /** [NOT] IN subquery in the WHERE clause:
    * `(parentCol % m) [NOT] IN (SELECT maybe-NULLIF(childCol % m, r)
    *  FROM tbl WHERE pred)` — the three-valued-logic minefield. With
    * `nullR` set, NULLIF poisons the subquery with NULLs whenever the
    * child value hits r: `IN` simply never matches on them, but a
    * single NULL in a NOT IN list makes EVERY non-matching comparison
    * UNKNOWN, i.e. the query goes empty — the convention both engines
    * must share. The DataFrame rendering decorrelates by hand to the
    * null-aware anti join Catalyst builds for NOT IN: a broadcast
    * has-null flag gates the left_anti equi-join (empty list ⇒ all
    * rows pass; any NULL ⇒ none do).
    */
  final case class InSub(parentCol: String, m: Int, tbl: String,
      childCol: String, nullR: Option[Int], neg: Boolean, pred: Pred) {
    private def inner: String =
      nullR.fold(s"$childCol % $m")(r => s"NULLIF($childCol % $m, $r)")
    def sql: String =
      s"($parentCol % $m) ${if (neg) "NOT " else ""}IN " +
        s"(SELECT $inner FROM $tbl WHERE ${pred.sql})"
  }

  /** Round-11 wave 7: [NOT] IN whose list is a SET OPERATION —
    * `(parentCol % m) [NOT] IN (SELECT a % m FROM t WHERE pA
    *  UNION ALL|INTERSECT|EXCEPT SELECT b % m FROM t WHERE pB)`.
    * IN only tests MEMBERSHIP, so UNION ALL's bag vs INTERSECT/
    * EXCEPT's set-distinct must NOT change the decision — but the
    * set-op's NULL convention (set ops group NULLs as equal in both
    * engines, so INTERSECT can emit a NULL that poisons a NOT IN,
    * and EXCEPT can REMOVE the NULL that would have) flows straight
    * into the three-valued IN logic. nullR's NULLIF rides the FIRST
    * branch only, so EXCEPT's right side can cancel poison and
    * INTERSECT can require it on both. DataFrame rendering: the same
    * hand-built null-aware semi/anti as [[InSub]] over the composed
    * set-op child (both branches cast to BIGINT — the set-op's own
    * type unification — before composition).
    */
  final case class InSetSub(parentCol: String, m: Int, tbl: String,
      colA: String, colB: String, setOp: String, nullR: Option[Int],
      neg: Boolean, predA: Pred, predB: Pred) {
    private def innerA: String =
      nullR.fold(s"CAST($colA % $m AS BIGINT)")(r =>
        s"CAST(NULLIF($colA % $m, $r) AS BIGINT)")
    def sql: String =
      s"($parentCol % $m) ${if (neg) "NOT " else ""}IN " +
        s"(SELECT $innerA FROM $tbl WHERE ${predA.sql} $setOp " +
        s"SELECT CAST($colB % $m AS BIGINT) FROM $tbl WHERE ${predB.sql})"
  }

  /** Round-12 wave 8: correlated [NOT] EXISTS under OR with another
    * predicate — DISJUNCTIVE decorrelation. Conjunctive EXISTS (the
    * joinKind semi/anti path) decorrelates to a semi/anti join; under
    * OR neither join kind can express the row-keeping disjunction, so
    * Catalyst plans an ExistenceJoin (a LEFT join producing a boolean
    * witness column the OR then consumes) — a planner path none of the
    * earlier EXISTS shapes reach. The DataFrame rendering builds that
    * witness by hand: distinct child keys LEFT-joined, `coalesce(flag,
    * false)`, OR'd with the plain predicate. NULL-key convention: a
    * NULL parent key never matches, so EXISTS contributes false (row
    * lives or dies on the other disjunct) and NOT EXISTS contributes
    * true (row always kept) — identical in both engines.
    */
  final case class OrExists(orPred: Pred, tbl: String, fkChild: String,
      fkParent: String, neg: Boolean, pred: Pred) {
    def sql: String =
      s"(${orPred.sql} OR ${if (neg) "NOT " else ""}EXISTS " +
        s"(SELECT 1 FROM $tbl WHERE $fkChild = $fkParent AND ${pred.sql}))"
  }

  /** joinKind: "inner" renders a JOIN; "semi"/"anti" render
    * EXISTS / NOT EXISTS against the right table (decorrelated to
    * left_semi / left_anti in the DataFrame rendering) — only the left
    * table's columns are visible downstream. `subPred` scopes the
    * EXISTS subquery (the generated data is FK-complete, so an
    * unscoped parent-side NOT EXISTS is vacuously empty — the
    * child-side predicate makes both directions substantive).
    */
  /** `havingSub` (round 9): an uncorrelated scalar subquery as the
    * HAVING threshold — `HAVING COUNT(*) > (SELECT MIN(col % 4)
    * FROM tbl WHERE pred)` — usually threshold 0 (every non-empty
    * group passes), which is the point: the construct tests the
    * filter-after-aggregate DECORRELATION PATH, not row attrition. The subquery lives in the
    * filter-after-aggregate position, a decorrelation path distinct
    * from the WHERE-clause [[ScalarSub]]; an empty child makes the
    * threshold NULL and drops EVERY group (the convention under test).
    */
  /** `havingExists` (round 10): a CORRELATED [NOT] EXISTS filtering
    * the AGGREGATE's output — the HAVING-EXISTS semantics, correlated
    * on the FIRST grouping key (an int-modulo key, so both sides share
    * the modulus domain). The literal `HAVING EXISTS` spelling is not
    * dual-dialect (Spark resolves only the select-list alias there,
    * which DuckDB rejects inside a correlated HAVING subquery), so the
    * SQL wraps the grouped query and applies the EXISTS in the outer
    * WHERE — same plan: the filter-after-aggregate SEMI/ANTI
    * decorrelation path, distinct from the scalar `havingSub`. The
    * DataFrame rendering mirrors Catalyst: a distinct child key set
    * left_semi/left_anti-joined onto the aggregated result.
    * Grouping-set NULL keys ride the standard convention: a NULL key
    * never equals anything, so EXISTS drops the subtotal row and NOT
    * EXISTS keeps it.
    */
  /** Round-11 wave 7 fields (rnd7 stream):
    *  - `selectSub` — a CORRELATED scalar subquery in the SELECT list
    *    of a window shape: unlike the WHERE-clause [[CorrSub]] (whose
    *    NULL comparison DROPS childless parents), the select-list
    *    position NULL-EXTENDS — the row survives with sq = NULL. The
    *    DataFrame rendering decorrelates to the per-FK aggregate LEFT
    *    join with NO filter, exactly Catalyst's select-list path. The
    *    CorrSub `op` field is unused here.
    *  - `inSetSub` — [[InSetSub]], [NOT] IN over a set-op child.
    *  - `winOverAgg` — a running windowed aggregate OVER the GROUPED
    *    result: `SUM(n) OVER (ORDER BY keys ROWS UNBOUNDED
    *    PRECEDING..CURRENT ROW)` wrapped around a plain GROUP BY —
    *    window-above-Aggregate, a planner path none of the earlier
    *    window shapes reach (they window over base rows). Group keys
    *    are unique per row, so the ROWS running sum is a deterministic
    *    function of the key order; plain gmode only (grouping-set
    *    subtotals could collide with genuine NULL keys in the total
    *    order).
    */
  final case class FuzzCase(seed: Int, fromTables: Seq[TableMeta],
      join: Option[(String, String, String, String)], joinKind: String,
      join2: Option[(String, String, String, String)],
      subPred: Option[Pred], preds: Seq[Pred], shape: Shape,
      scalarSub: Option[ScalarSub] = None,
      corrSub: Option[CorrSub] = None,
      inSub: Option[InSub] = None,
      havingSub: Option[(String, String, Pred)] = None,
      lateralAgg: Option[CorrSub] = None,
      havingExists: Option[(String, String, Boolean, Pred)] = None,
      selectSub: Option[CorrSub] = None,
      inSetSub: Option[InSetSub] = None,
      winOverAgg: Boolean = false,
      orExists: Option[OrExists] = None,
      aggOverWin: Boolean = false,
      filterAgg: Option[(Pred, String, Int)] = None,
      orderedAgg: Option[String] = None,
      groupingSel: Boolean = false,
      qualifyExt: Boolean = false,
      winNulls: Option[(Int, Int)] = None,
      multiWin: Boolean = false,
      lagNulls: Option[(Int, Int)] = None,
      argExt: Option[(String, Int, Boolean)] = None,
      nthVal: Boolean = false,
      fvNulls: Option[(Int, Int)] = None,
      nullSideSum: Option[String] = None,
      groupByAll: Boolean = false,
      lateralCnt: Option[CorrSub] = None,
      distinctRanks: Boolean = false,
      caseExists: Option[CaseExists] = None,
      latWin: Boolean = false,
      frameExprOrd: Option[Int] = None) {

    def name: String = s"x_fuzz_$seed"

    /** Wave-9/-11 select-list extras on agg shapes, in output order:
      * FILTER (WHERE) sum, ordered string aggregation, GROUPING /
      * GROUPING_ID over grouping-set shapes, and the wave-11
      * MAX_BY/MIN_BY arg-extreme. All are additions to the select
      * list — they can never change the row SET, so every fixed
      * seed's documented non-emptiness is preserved by construction.
      */
    private def extraAliases(keys: Seq[Key]): Seq[String] =
      filterAgg.map(_ => "fsum").toSeq ++
        orderedAgg.map(_ => "oagg").toSeq ++
        (if (groupingSel && keys.nonEmpty)
           Seq("g0") ++ (if (keys.length > 1) Seq("gid") else Nil)
         else Nil) ++
        argExt.map(_ => "aext").toSeq

    private def fromSql: String = {
      val base = join match {
        case None => fromTables.head.name
        case Some((lt, rt, lc, rc)) if joinKind == "inner" =>
          s"$lt JOIN $rt ON $lc = $rc"
        case Some((lt, rt, lc, rc)) if joinKind == "left" =>
          s"$lt LEFT JOIN $rt ON $lc = $rc"
        case Some((lt, rt, lc, rc)) if joinKind == "full" =>
          s"$lt FULL JOIN $rt ON $lc = $rc"
        case Some((lt, _, _, _)) => lt
      }
      val base2 = join2.fold(base) { case (_, rt2, lc2, rc2) =>
        s"$base JOIN $rt2 ON $lc2 = $rc2"
      }
      // round-9 wave 5: a correlated AGGREGATE subquery in the FROM
      // clause — comma-LATERAL. Planner-wise this is a LateralJoin in
      // Spark (a different decorrelation entry than the WHERE-clause
      // CorrSub); semantically the aggregate subquery always yields
      // exactly one row (MAX over empty = NULL), so childless parents
      // survive the lateral and die on the NULL comparison in WHERE.
      val base3 = lateralAgg.fold(base2) { la =>
        s"$base2, LATERAL (SELECT MAX(${la.childCol}) AS mx " +
          s"FROM ${la.tbl} WHERE ${la.fkChild} = ${la.fkParent} " +
          s"AND ${la.pred.sql}) lsub"
      }
      // wave 13: a MULTI-COLUMN correlated table subquery in FROM —
      // the lateral aggregate row carries (MAX, COUNT(*)) together,
      // and the WHERE consumes BOTH: COUNT over an empty correlated
      // group is 0 (one row always exists), unlike MAX's NULL — so
      // `... OR lsub2.lc = 0` KEEPS childless parents, the exact
      // asymmetry wave 5's scalar lateral drops them on
      lateralCnt.fold(base3) { lc =>
        s"$base3, LATERAL (SELECT MAX(${lc.childCol}) AS mx2, " +
          s"CAST(COUNT(*) AS BIGINT) AS lc FROM ${lc.tbl} " +
          s"WHERE ${lc.fkChild} = ${lc.fkParent} " +
          s"AND ${lc.pred.sql}) lsub2"
      }
    }

    private def whereSql: String = {
      val sub = subPred.fold("")(p => s" AND ${p.sql}")
      val existsCond = join match {
        case Some((_, rt, lc, rc)) if joinKind == "semi" =>
          Seq(s"EXISTS (SELECT 1 FROM $rt WHERE $rc = $lc$sub)")
        case Some((_, rt, lc, rc)) if joinKind == "anti" =>
          Seq(s"NOT EXISTS (SELECT 1 FROM $rt WHERE $rc = $lc$sub)")
        case _ => Seq()
      }
      val conds = existsCond ++ preds.map(_.sql) ++ scalarSub.map(_.sql) ++
        corrSub.map(_.sql) ++ inSub.map(_.sql) ++ inSetSub.map(_.sql) ++
        orExists.map(_.sql) ++
        lateralAgg.map(la => s"${la.parentCol} ${la.op} lsub.mx") ++
        lateralCnt.map(lc =>
          s"(${lc.parentCol} ${lc.op} lsub2.mx2 OR lsub2.lc = 0)")
      if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
    }

    /** The Spark-SQL text (FuzzSpec's DF-vs-SQL differential). */
    def sql: String = sqlText(duck = false)

    /** The DuckDB text (the driver oracle). IDENTICAL to [[sql]] except
      * the one construct with NO shared spelling: the ordered string
      * aggregate (probed: Spark accepts only `listagg(e, ',') WITHIN
      * GROUP (ORDER BY e)`, DuckDB only `string_agg(e, ',' ORDER BY
      * e)`). Both spellings pin the same SQL-standard semantics —
      * sorted-multiset concatenation — so the cross-engine
      * differential still adjudicates the clause; every other
      * character of the two texts is shared (the havingExists
      * wrapper precedent).
      */
    def duckSql: String = sqlText(duck = true)

    private def sqlText(duck: Boolean): String = shape match {
      case AggShape(keys, aggs, having, gmode) =>
        val oaExpr = orderedAgg.map(c => s"COALESCE($c, '~')")
        val extraSql =
          filterAgg.map { case (p, c, k2) =>
            s"CAST(SUM($c % $k2) FILTER (WHERE ${p.sql}) AS BIGINT) AS fsum"
          }.toSeq ++
          oaExpr.map { e =>
            if (duck) s"string_agg($e, ',' ORDER BY $e) AS oagg"
            else s"listagg($e, ',') WITHIN GROUP (ORDER BY $e) AS oagg"
          }.toSeq ++
          (if (groupingSel && keys.nonEmpty)
             Seq(s"CAST(GROUPING(${keys.head.sqlExpr}) AS INTEGER) AS g0") ++
               (if (keys.length > 1)
                  Seq("CAST(GROUPING_ID(" +
                    keys.map(_.sqlExpr).mkString(", ") +
                    ") AS INTEGER) AS gid")
                else Nil)
           else Nil) ++
          // wave 11: MAX_BY/MIN_BY — tie-safe by construction: the
          // VALUE is a function of the ORDERING KEY, so however the
          // engine breaks a key tie the surfaced value is identical;
          // COALESCE(-1) keeps outer-join NULL keys deterministic too
          argExt.map { case (c, m, isMax) =>
            val fn = if (isMax) "MAX_BY" else "MIN_BY"
            s"CAST($fn(COALESCE($c, -1) % $m, COALESCE($c, -1)) " +
              s"AS BIGINT) AS aext"
          }.toSeq
        val sel = (keys.map(_.sqlAliased) ++ aggs.map(_.sql) ++ extraSql)
          .mkString(", ")
        val grpList = keys.map(_.sqlExpr).mkString(", ")
        // wave 13: GROUP BY ALL — the resolver sugar both engines
        // accept (Spark 3.4+/DuckDB): group by every non-aggregate
        // select item. Plain gmode only; the DataFrame rendering keeps
        // the explicit groupBy, so the differential adjudicates the
        // SQL-side resolution of ALL against the hand-listed keys
        val grp = if (groupByAll && gmode == "plain") "ALL"
        else gmode match {
          case "rollup" => s"ROLLUP ($grpList)"
          case "cube" => s"CUBE ($grpList)"
          case "gsets" =>
            val sets = (Seq(keys.map(_.sqlExpr)) ++
              (if (keys.length > 1) Seq(keys.take(1).map(_.sqlExpr))
               else Seq()) :+ Seq.empty[String])
              .map(_.mkString("(", ", ", ")"))
            s"GROUPING SETS (${sets.mkString(", ")})"
          case _ => grpList
        }
        val havConds = having.map(c => s"COUNT(*) > $c").toSeq ++
          havingSub.map { case (t, hc, p) =>
            s"COUNT(*) > (SELECT MIN($hc % 4) FROM $t WHERE ${p.sql})"
          }
        val hav = if (havConds.isEmpty) ""
          else havConds.mkString(" HAVING ", " AND ", "")
        val ord = (keys.map(_.alias) ++ aggs.map(_.alias) ++
            extraAliases(keys))
          .map(a => s"$a ASC NULLS FIRST").mkString(", ")
        val core = s"SELECT $sel FROM $fromSql$whereSql GROUP BY $grp$hav"
        // correlated [NOT] EXISTS over the aggregate's output: neither
        // engine accepts the other's literal HAVING-EXISTS spelling
        // (Spark demands the select-list alias, which DuckDB forbids in
        // a correlated HAVING subquery), so the generator emits the
        // equivalent filter-over-aggregate wrapper BOTH accept — the
        // plan is the same semi/anti decorrelation above the Aggregate
        val he = havingExists.collect {
          case (t, hc, neg, p) if keys.nonEmpty && keys.head.mod.isDefined =>
            val m = keys.head.mod.get
            s"${if (neg) "NOT " else ""}EXISTS (SELECT 1 FROM $t " +
              s"WHERE CAST($hc % $m AS BIGINT) = ${keys.head.alias} " +
              s"AND ${p.sql})"
        }
        val withHe = he.fold(core)(cond =>
          s"SELECT * FROM ($core) gouter WHERE $cond")
        // wave 7: running SUM(n) over the grouped (and HAVING/EXISTS-
        // filtered) result — keys are unique per row, so the ROWS
        // running sum under the key order is deterministic
        if (winOverAgg && keys.nonEmpty && gmode == "plain") {
          val cols = keys.map(_.alias) ++ aggs.map(_.alias) ++
            extraAliases(keys)
          val keyOrd = keys.map(k => s"${k.alias} ASC NULLS FIRST")
            .mkString(", ")
          val ordR = (cols :+ "rsum")
            .map(a => s"$a ASC NULLS FIRST").mkString(", ")
          s"SELECT ${cols.mkString(", ")}, CAST(SUM(n) OVER (" +
            s"ORDER BY $keyOrd ROWS BETWEEN UNBOUNDED PRECEDING AND " +
            s"CURRENT ROW) AS BIGINT) AS rsum FROM ($withHe) wagg " +
            s"ORDER BY $ordR"
        } else s"$withHe ORDER BY $ord"
      case WinShape(pk, ordCol, desc, ids, topK, fn) =>
        // wave 10: a NULLIF-poisoned window ordering expression with
        // the NON-default null placement spelled explicitly (ASC NULLS
        // LAST / DESC NULLS FIRST — both engines default to the
        // opposite pairing, so the explicit clause is load-bearing)
        val ordExpr = winNulls
          .fold(ordCol) { case (k, r) => s"NULLIF($ordCol % $k, $r)" }
        val dir =
          if (winNulls.isDefined)
            (if (desc) " DESC NULLS FIRST" else " ASC NULLS LAST")
          else if (desc) " DESC NULLS LAST" else " ASC NULLS FIRST"
        val tie = ids.map(i => s"$i ASC NULLS FIRST").mkString(", ")
        // rank/dense_rank deliberately order by ordCol ALONE — ties
        // keep the output a deterministic SET (peers share the rank)
        val winOrd = fn match {
          case "row_number" => s"$ordExpr$dir, $tie"
          case _ => s"$ordExpr$dir"
        }
        // wave 7: a correlated scalar subquery in the SELECT list —
        // NULL-extends (childless parents keep the row, sq = NULL),
        // unlike the WHERE-clause CorrSub which drops them
        val sqSel = selectSub.fold("") { ss =>
          s",\n    (SELECT MAX(${ss.childCol}) FROM ${ss.tbl} " +
            s"WHERE ${ss.fkChild} = ${ss.fkParent} AND ${ss.pred.sql}) AS sq"
        }
        val sqCol = selectSub.map(_ => "sq").toSeq
        // wave 10: a SECOND window function in the same SELECT — the
        // partition extreme (MIN under ASC / MAX under DESC, so the
        // rn=1 row always achieves it) for the QUALIFY-style filter,
        // and/or a fully-tie-broken running sum (row_number cases
        // only: its winOrd is the total order the ROWS frame needs)
        val ext = if (desc) "MAX" else "MIN"
        val qSel = if (qualifyExt)
          s",\n    CAST($ordCol AS BIGINT) AS ov, " +
            s"CAST($ext($ordCol) OVER (PARTITION BY ${pk.sqlExpr}) " +
            "AS BIGINT) AS ext"
          else ""
        val mwSel = if (multiWin)
          s",\n    CAST(SUM($ordCol) OVER (PARTITION BY ${pk.sqlExpr} " +
            s"ORDER BY $winOrd ROWS BETWEEN UNBOUNDED PRECEDING AND " +
            "CURRENT ROW) AS BIGINT) AS rsum2"
          else ""
        // wave 11: NTH_VALUE over the running ROWS frame — the frame-
        // navigation function class (row_number cases only: winOrd is
        // the total order that makes "the 2nd row so far" well-defined)
        val nvSel = if (nthVal)
          s",\n    CAST(NTH_VALUE($ordCol, 2) OVER (PARTITION BY " +
            s"${pk.sqlExpr} ORDER BY $winOrd ROWS BETWEEN UNBOUNDED " +
            "PRECEDING AND CURRENT ROW) AS BIGINT) AS nv2"
          else ""
        // wave 12: a running SUM whose ARGUMENT comes from the
        // null-extended side of a LEFT/FULL join (row_number cases
        // only: winOrd is the total order the ROWS frame needs) —
        // SUM skips the null-extended rows' NULLs identically in both
        // engines, and an all-NULL prefix yields NULL, not 0
        val nsSel = nullSideSum.fold("") { c =>
          s",\n    CAST(SUM($c) OVER (PARTITION BY ${pk.sqlExpr} " +
            s"ORDER BY $winOrd ROWS BETWEEN UNBOUNDED PRECEDING AND " +
            "CURRENT ROW) AS BIGINT) AS nssum"
        }
        // wave 14: EXISTS inside a CASE-WHEN select expression (the
        // projection-position ExistenceJoin — see [[CaseExists]])
        val ceSel = caseExists.fold("")(ce => s",\n    ${ce.sql}")
        // wave 14: a window function over the LATERAL's result — the
        // lateral subquery's output column feeds a running SUM under
        // the row_number total order (window-over-lateral: the frame
        // argument comes from a LateralJoin output, a source no
        // earlier window shape reads)
        val lwSel = if (latWin) {
          val src = if (lateralCnt.isDefined) "lsub2.lc" else "lsub.mx"
          s",\n    CAST(SUM($src) OVER (PARTITION BY ${pk.sqlExpr} " +
            s"ORDER BY $winOrd ROWS BETWEEN UNBOUNDED PRECEDING AND " +
            "CURRENT ROW) AS BIGINT) AS lwsum"
        } else ""
        val qCols = (if (qualifyExt) Seq("ov", "ext") else Nil) ++
          (if (multiWin) Seq("rsum2") else Nil) ++
          (if (nthVal) Seq("nv2") else Nil) ++
          nullSideSum.map(_ => "nssum").toSeq ++
          caseExists.map(_ => "cex").toSeq ++
          (if (latWin) Seq("lwsum") else Nil)
        // QUALIFY-style filter on the second window's result, rendered
        // as the subquery both engines accept; `OR rn = 1` keeps the
        // case structurally non-empty (the rank-1 peers achieve the
        // partition extreme under the UNPOISONED order, but not
        // necessarily under a wave-10 poisoned one)
        val qWhere = if (qualifyExt) " AND (ov = ext OR rn = 1)" else ""
        val outer = (Seq("pk") ++ ids ++ Seq("rn") ++ sqCol ++ qCols)
          .mkString(", ")
        val outerOrd = (Seq("pk") ++ ids ++ Seq("rn") ++ sqCol ++ qCols)
          .map(c => s"$c ASC NULLS FIRST").mkString(", ")
        // wave 8: GROUP BY over the window-function result — the
        // inverse composition of wave 7's window-above-Aggregate.
        // Deterministic because each base row's rn is (row_number:
        // fully tie-broken; rank/dense_rank: peers share), so the row
        // set behind each rn group is a function of the data alone
        if (aggOverWin)
          s"""SELECT rn, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(${ids.head}) AS BIGINT) AS sid FROM (
             |  SELECT ${pk.sqlExpr} AS pk, ${ids.mkString(", ")},
             |    CAST(${fn.toUpperCase}() OVER (PARTITION BY ${pk.sqlExpr}
             |      ORDER BY $winOrd) AS INTEGER) AS rn
             |  FROM $fromSql$whereSql) t
             |WHERE rn <= $topK GROUP BY rn
             |ORDER BY rn ASC NULLS FIRST""".stripMargin
        // wave 13: SELECT DISTINCT over the window result — rank /
        // dense_rank peers share a rank, so projecting (pk, rn) under
        // DISTINCT must COLLAPSE the peer rows identically in both
        // engines (the dedup-over-window-result composition; the row
        // SET is deterministic because peers are interchangeable)
        else if (distinctRanks)
          s"""SELECT DISTINCT pk, rn FROM (
             |  SELECT ${pk.sqlExpr} AS pk, ${ids.mkString(", ")},
             |    CAST(${fn.toUpperCase}() OVER (PARTITION BY ${pk.sqlExpr}
             |      ORDER BY $winOrd) AS INTEGER) AS rn
             |  FROM $fromSql$whereSql) t
             |WHERE rn <= $topK
             |ORDER BY pk ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin
        else s"""SELECT $outer FROM (
           |  SELECT ${pk.sqlExpr} AS pk, ${ids.mkString(", ")},
           |    CAST(${fn.toUpperCase}() OVER (PARTITION BY ${pk.sqlExpr}
           |      ORDER BY $winOrd) AS INTEGER) AS rn$sqSel$qSel$mwSel$nvSel$nsSel$ceSel$lwSel
           |  FROM $fromSql$whereSql) t
           |WHERE rn <= $topK$qWhere ORDER BY $outerOrd""".stripMargin
      case FrameShape(pk, ordCol, desc, ids, frame, prec, sym) =>
        val dir = if (desc) " DESC NULLS LAST" else " ASC NULLS FIRST"
        val tie = ids.map(i => s"$i ASC NULLS FIRST").mkString(", ")
        // wave 14: the ROWS frame ORDERS BY an EXPRESSION, not a bare
        // column — `(ordCol % k + 1)` collapses the order into k
        // buckets (genuine expression evaluation inside the window
        // ORDER BY, plus real ties for the id tiebreak to break), so
        // the running sum walks a genuinely computed order in both
        // engines. ROWS only: a RANGE frame's value-window over a
        // rewritten expression would change peer semantics, not just
        // the ordering.
        // the bare ordCol stays as a tiebreak AFTER the expression:
        // the fixture ids alone are NOT unique (the driver data carries
        // duplicate (l_orderkey, l_linenumber) pairs), so the pre-wave
        // (ordCol, ids) order was total only because ordCol itself
        // broke those ties — dropping it would make the frame contents
        // engine-dependent (caught: 12 wsum mismatches at sf0.01)
        val frameOrd = (frame, frameExprOrd) match {
          case ("rows", Some(k)) =>
            s"($ordCol % $k + 1)$dir, $ordCol$dir, $tie"
          case ("rows", None) => s"$ordCol$dir, $tie"
          case _ => s"$ordCol$dir" // RANGE: single ordering expression
        }
        val frameKw = if (frame == "rows") "ROWS" else "RANGE"
        val frameEnd = if (sym) s"$prec FOLLOWING" else "CURRENT ROW"
        // wave 11: LAG … IGNORE NULLS over a NULLIF-poisoned argument
        // (the poison guarantees nulls genuinely flow through the
        // skip) — the SECOND dual-spelled construct (probed: Spark
        // accepts only `LAG(e, 1, -1) IGNORE NULLS OVER`, DuckDB only
        // `LAG(e, 1, -1 IGNORE NULLS) OVER`; both pin the same
        // SQL-standard null-skipping semantics). Total order via the
        // id tiebreak, so the skipped-to row is deterministic.
        val lnSel = lagNulls.fold("") { case (k, r) =>
          val arg = s"NULLIF($ordCol % $k, $r)"
          val fnTxt = if (duck) s"LAG($arg, 1, -1 IGNORE NULLS)"
            else s"LAG($arg, 1, -1) IGNORE NULLS"
          s",\n    CAST($fnTxt OVER (PARTITION BY ${pk.sqlExpr} " +
            s"ORDER BY $ordCol$dir, $tie) AS BIGINT) AS prevnn"
        }
        val lnCols = lagNulls.map(_ => "prevnn").toSeq
        // wave 12: FIRST_VALUE / LAST_VALUE over EXPLICIT asymmetric
        // ROWS frames with a NULLIF-poisoned ARGUMENT — the default
        // RESPECT NULLS must surface the poison identically in both
        // engines (a NULL first/last value stays NULL, never skipped);
        // the frames ride the fully tie-broken order, so the selected
        // row is deterministic even though the argument varies per row
        val fvSel = fvNulls.fold("") { case (k, r) =>
          val arg = s"NULLIF($ordCol % $k, $r)"
          s",\n    CAST(FIRST_VALUE($arg) OVER (PARTITION BY ${pk.sqlExpr} " +
            s"ORDER BY $ordCol$dir, $tie ROWS BETWEEN 1 PRECEDING AND " +
            "CURRENT ROW) AS BIGINT) AS fval" +
            s",\n    CAST(LAST_VALUE($arg) OVER (PARTITION BY ${pk.sqlExpr} " +
            s"ORDER BY $ordCol$dir, $tie ROWS BETWEEN CURRENT ROW AND " +
            "2 FOLLOWING) AS BIGINT) AS lval"
        }
        val fvCols = fvNulls.map(_ => Seq("fval", "lval")).toSeq.flatten
        val outer = (Seq("pk") ++ ids ++ Seq("wsum", "prev") ++ lnCols ++
          fvCols).mkString(", ")
        val outerOrd = (Seq("pk") ++ ids ++ Seq("wsum", "prev") ++ lnCols ++
          fvCols).map(c => s"$c ASC NULLS FIRST").mkString(", ")
        s"""SELECT $outer FROM (
           |  SELECT ${pk.sqlExpr} AS pk, ${ids.mkString(", ")},
           |    CAST(SUM($ordCol) OVER (PARTITION BY ${pk.sqlExpr}
           |      ORDER BY $frameOrd
           |      $frameKw BETWEEN $prec PRECEDING AND $frameEnd) AS BIGINT) AS wsum,
           |    CAST(LAG($ordCol, 1, -1) OVER (PARTITION BY ${pk.sqlExpr}
           |      ORDER BY $ordCol$dir, $tie) AS BIGINT) AS prev$lnSel$fvSel
           |  FROM $fromSql$whereSql) t
           |ORDER BY $outerOrd""".stripMargin
      case SetShape(c, m, op, pa, pb, withRn, withAgg) =>
        val t = fromSql
        val side = (p: Pred) =>
          s"SELECT CAST($c % $m AS BIGINT) AS v FROM $t$whereSql" +
            (if (whereSql.isEmpty) " WHERE " else " AND ") + p.sql
        if (withAgg)
          s"SELECT CAST(COUNT(DISTINCT v) AS BIGINT) AS cd, " +
            s"CAST(SUM(DISTINCT v) AS BIGINT) AS sd " +
            s"FROM (${side(pa)} $op ${side(pb)}) u"
        else if (!withRn)
          s"SELECT v FROM (${side(pa)} $op ${side(pb)}) u ORDER BY v ASC NULLS FIRST"
        else
          s"""SELECT v, rn FROM (
             |  SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v ASC NULLS FIRST)
             |    AS INTEGER) AS rn
             |  FROM (${side(pa)} $op ${side(pb)}) u) w
             |ORDER BY v ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin
    }

    def run(s: SparkSession, dir: String): DataFrame = {
      import graft.queries.H
      val base0 = join match {
        case None => H.t(s, dir, fromTables.head.name)
        case Some((lt, rt, lc, rc)) =>
          val kind = joinKind match {
            case "inner" => "inner"
            case "left" => "left"
            case "full" => "full_outer"
            case "semi" => "left_semi"
            case "anti" => "left_anti"
          }
          val rdf = subPred.foldLeft(H.t(s, dir, rt))((df, p) => df.filter(p.df))
          H.t(s, dir, lt).join(rdf, col(lc) === col(rc), kind)
      }
      val base1 = join2.foldLeft(base0) { case (df, (_, rt2, lc2, rc2)) =>
        df.join(H.t(s, dir, rt2), col(lc2) === col(rc2))
      }
      val base2 = preds.foldLeft(base1)((df, p) => df.filter(p.df))
      val base3 = scalarSub.foldLeft(base2) { (df, ss) =>
        val sc = H.t(s, dir, ss.tbl).filter(ss.pred.df)
          .agg(max(col(ss.childCol)).as("_scalar"))
        val cond = ss.op match {
          case "<=" => col(ss.parentCol) <= col("_scalar")
          case _ => col(ss.parentCol) >= col("_scalar")
        }
        df.crossJoin(broadcast(sc)).filter(cond).drop("_scalar")
      }
      val base4 = corrSub.foldLeft(base3) { (df, cs) =>
        val agg = H.t(s, dir, cs.tbl).filter(cs.pred.df)
          .groupBy(col(cs.fkChild).as("_ck"))
          .agg(max(col(cs.childCol)).as("_cmax"))
        val cond = cs.op match {
          case "<=" => col(cs.parentCol) <= col("_cmax")
          case _ => col(cs.parentCol) >= col("_cmax")
        }
        df.join(agg, col(cs.fkParent) === col("_ck"), "left")
          .filter(cond).drop("_ck", "_cmax")
      }
      val base5 = lateralAgg.foldLeft(base4) { (df, la) =>
        // identical hand-decorrelation to corrSub: the lateral's
        // one-row aggregate is a per-fk MAX left-joined back; the WHERE
        // on a NULL mx drops childless parents
        val agg = H.t(s, dir, la.tbl).filter(la.pred.df)
          .groupBy(col(la.fkChild).as("_lk"))
          .agg(max(col(la.childCol)).as("_lmx"))
        val cond = la.op match {
          case "<=" => col(la.parentCol) <= col("_lmx")
          case _ => col(la.parentCol) >= col("_lmx")
        }
        val joined = df.join(agg, col(la.fkParent) === col("_lk"), "left")
          .filter(cond)
        // wave 14: the window-over-lateral reads the lateral's output
        // column — carry it as lmxv instead of dropping it
        if (latWin && lateralCnt.isEmpty)
          joined.withColumnRenamed("_lmx", "lmxv").drop("_lk")
        else joined.drop("_lk", "_lmx")
      }
      // wave 13: the multi-column lateral — per-FK (MAX, COUNT) LEFT-
      // joined; COUNT of a missing group is 0 (the lateral aggregate
      // always yields one row), so `OR coalesce(cnt, 0) = 0` KEEPS
      // childless parents, unlike the scalar lateral's NULL-drop
      val base5b = lateralCnt.foldLeft(base5) { (df, lc) =>
        val agg = H.t(s, dir, lc.tbl).filter(lc.pred.df)
          .groupBy(col(lc.fkChild).as("_l2k"))
          .agg(max(col(lc.childCol)).as("_l2mx"),
            count(lit(1)).as("_l2c"))
        val cond0 = lc.op match {
          case "<=" => col(lc.parentCol) <= col("_l2mx")
          case _ => col(lc.parentCol) >= col("_l2mx")
        }
        val joined = df.join(agg, col(lc.fkParent) === col("_l2k"), "left")
          .filter(cond0 || coalesce(col("_l2c"), lit(0L)) === 0)
        // wave 14: carry the lateral count for the window-over-lateral
        // (coalesced to 0 — SQL's LATERAL COUNT row is 0 for childless
        // parents where the hand-built left join reads NULL; SUM skips
        // NULL and adding 0 is identity, but the carried column should
        // hold the SQL value)
        (if (latWin) joined.withColumn("lcv",
            coalesce(col("_l2c"), lit(0L)))
         else joined)
          .drop("_l2k", "_l2mx", "_l2c")
      }
      val base6 = inSub.foldLeft(base5b) { (df, is) =>
        val raw = (col(is.childCol) % is.m)
        val iv = is.nullR
          .fold(raw)(r => when(raw === r, lit(null)).otherwise(raw))
        val sub = H.t(s, dir, is.tbl).filter(is.pred.df)
          .select(iv.as("_iv"))
        val pv = col(is.parentCol) % is.m
        if (!is.neg) df.join(sub, pv === col("_iv"), "left_semi")
        else {
          // null-aware anti, all three NULL conventions by hand:
          //  - any NULL in the list ⇒ every row UNKNOWN/FALSE ⇒ empty
          //  - a NULL parent key vs a NON-empty list ⇒ UNKNOWN ⇒ drop
          //    (a plain left_anti would KEEP it — the condition never
          //    evaluates true — which is exactly the Spark null-aware
          //    anti-join special case being mirrored)
          //  - NOT IN (empty list) ⇒ TRUE for every row, null keys too
          val flag = sub.agg(max(col("_iv").isNull).as("_hasnull"),
            count(lit(1)).as("_cnt"))
          df.crossJoin(broadcast(flag))
            .filter(!coalesce(col("_hasnull"), lit(false)) &&
              (pv.isNotNull || col("_cnt") === 0))
            .drop("_hasnull", "_cnt")
            .join(sub, pv === col("_iv"), "left_anti")
        }
      }
      // wave 7: [NOT] IN over a set-op child — compose the list from
      // the two branches (both cast BIGINT, the set-op's own type
      // unification), then the identical null-aware semi/anti as inSub
      val base7 = inSetSub.foldLeft(base6) { (df, is) =>
        val t = H.t(s, dir, is.tbl)
        val rawA = (col(is.colA) % is.m).cast("bigint")
        val ivA = is.nullR
          .fold(rawA)(r => when(rawA === r, lit(null)).otherwise(rawA))
        val sideA = t.filter(is.predA.df).select(ivA.as("_iv"))
        val sideB = t.filter(is.predB.df)
          .select((col(is.colB) % is.m).cast("bigint").as("_iv"))
        val sub = is.setOp match {
          case "UNION ALL" => sideA.union(sideB)
          case "INTERSECT" => sideA.intersect(sideB)
          case "EXCEPT" => sideA.except(sideB)
        }
        val pv = col(is.parentCol) % is.m
        if (!is.neg) df.join(sub, pv === col("_iv"), "left_semi")
        else {
          val flag = sub.agg(max(col("_iv").isNull).as("_hasnull"),
            count(lit(1)).as("_cnt"))
          df.crossJoin(broadcast(flag))
            .filter(!coalesce(col("_hasnull"), lit(false)) &&
              (pv.isNotNull || col("_cnt") === 0))
            .drop("_hasnull", "_cnt")
            .join(sub, pv === col("_iv"), "left_anti")
        }
      }
      // wave 8: disjunctive [NOT] EXISTS — the hand-built ExistenceJoin:
      // distinct child keys LEFT-joined as a boolean witness, the OR
      // evaluated over (predicate, witness). A semi/anti join could not
      // express this (the other disjunct must be able to keep the row)
      val base7b = orExists.foldLeft(base7) { (df, oe) =>
        val sub = H.t(s, dir, oe.tbl).filter(oe.pred.df)
          .select(col(oe.fkChild).as("_ek")).distinct()
          .withColumn("_ex", lit(true))
        val witness = coalesce(col("_ex"), lit(false))
        val cond =
          if (oe.neg) oe.orPred.df || !witness else oe.orPred.df || witness
        df.join(sub, col(oe.fkParent) === col("_ek"), "left")
          .filter(cond).drop("_ek", "_ex")
      }
      // wave 7: select-list correlated scalar — per-FK MAX aggregate
      // LEFT-joined with NO filter (NULL-extension, not row attrition)
      val base8 = selectSub.foldLeft(base7b) { (df, ss) =>
        val agg = H.t(s, dir, ss.tbl).filter(ss.pred.df)
          .groupBy(col(ss.fkChild).as("_sk"))
          .agg(max(col(ss.childCol)).as("sq"))
        df.join(agg, col(ss.fkParent) === col("_sk"), "left").drop("_sk")
      }
      // wave 14: CASE-WHEN [NOT] EXISTS in the select list — the
      // hand-built ExistenceJoin witness (the OrExists machinery) with
      // the CASE consuming it: distinct child keys LEFT-joined, the
      // witness coalesced, when/otherwise for the two branches. A NULL
      // correlation key never matches (witness false); a NULL
      // parentCol surfaces a NULL THEN value — both conventions shared
      val base = caseExists.foldLeft(base8) { (df, ce) =>
        val sub = H.t(s, dir, ce.tbl).filter(ce.pred.df)
          .select(col(ce.fkChild).as("_cek")).distinct()
          .withColumn("_cew", lit(true))
        val witness = coalesce(col("_cew"), lit(false))
        val cond = if (ce.neg) !witness else witness
        df.join(sub, col(ce.fkParent) === col("_cek"), "left")
          .withColumn("cex", when(cond, col(ce.parentCol) % ce.m)
            .otherwise(lit(-1)).cast("bigint"))
          .drop("_cek", "_cew")
      }
      shape match {
        case AggShape(keys, aggs, having, gmode) =>
          // wave 9 select-list extras: FILTER (WHERE) sum rendered as
          // the equivalent conditional aggregate (SUM over the matching
          // subset; no matches ⇒ NULL — both engines' FILTER
          // convention), ordered string agg as sorted-concat (COALESCE
          // removed the NULLs, so collect_list can't diverge from
          // listagg's null-skipping), GROUPING/GROUPING_ID over the
          // BARE grouping expressions (the analyzer matches grouping
          // columns structurally — an Alias defeats it, the
          // gsets/GsetProbe lesson)
          val extraDf: Seq[Column] =
            filterAgg.map { case (p, c, k2) =>
              sum(when(p.df, col(c) % k2)).cast("bigint").as("fsum")
            }.toSeq ++
            orderedAgg.map { c =>
              array_join(array_sort(collect_list(
                coalesce(col(c), lit("~")))), ",").as("oagg")
            }.toSeq ++
            (if (groupingSel && keys.nonEmpty)
               Seq(grouping(keys.head.dfExpr).cast("int").as("g0")) ++
                 (if (keys.length > 1)
                    Seq(grouping_id(keys.map(_.dfExpr): _*).cast("int")
                      .as("gid"))
                  else Nil)
             else Nil) ++
            // wave 11: arg-extreme (value = f(key) ⇒ key ties can't
            // surface different values)
            argExt.map { case (c, m, isMax) =>
              val key = coalesce(col(c), lit(-1))
              val fn = if (isMax) max_by(key % m, key) else min_by(key % m, key)
              fn.cast("bigint").as("aext")
            }.toSeq
          val aggList = aggs.map(_.df) ++ extraDf
          val g = gmode match {
            case "gsets" =>
              // groupingSets matches set entries to grouping columns
              // STRUCTURALLY — an Alias wrapper on either side defeats
              // the match and nulls every key (GsetProbe-verified), so
              // group on bare expressions and re-alias after the agg
              val sets: Seq[Seq[Column]] = Seq(keys.map(_.dfExpr)) ++
                (if (keys.length > 1) Seq(Seq(keys.head.dfExpr)) else Nil) :+
                Seq.empty[Column]
              base.groupingSets(sets, keys.map(_.dfExpr): _*)
                .agg(aggList.head, aggList.tail: _*)
                .toDF((keys.map(_.alias) ++ aggs.map(_.alias) ++
                  extraAliases(keys)): _*)
            case ("rollup" | "cube") if groupingSel =>
              // grouping()/grouping_id() need the grouping columns
              // BARE too — same structural-match rule — so this path
              // groups on dfExpr and re-aliases after the agg
              val grouped =
                if (gmode == "rollup") base.rollup(keys.map(_.dfExpr): _*)
                else base.cube(keys.map(_.dfExpr): _*)
              grouped.agg(aggList.head, aggList.tail: _*)
                .toDF((keys.map(_.alias) ++ aggs.map(_.alias) ++
                  extraAliases(keys)): _*)
            case _ =>
              val grouped = gmode match {
                case "rollup" => base.rollup(keys.map(_.df): _*)
                case "cube" => base.cube(keys.map(_.df): _*)
                case _ => base.groupBy(keys.map(_.df): _*)
              }
              grouped.agg(aggList.head, aggList.tail: _*)
          }
          val cntAlias = aggs.find(_.kind == "count").get.alias
          val h = having.fold(g)(c => g.filter(col(cntAlias) > c))
          // scalar-subquery HAVING threshold: decorrelated by hand the
          // way Catalyst does — 1-row aggregate, broadcast, filter
          // after the aggregation (NULL threshold drops every group)
          val h2 = havingSub.fold(h) { case (t, hc, p) =>
            val sc = H.t(s, dir, t).filter(p.df)
              .agg(min(col(hc) % 4).as("_hs"))
            h.crossJoin(broadcast(sc))
              .filter(col(cntAlias) > col("_hs"))
              .drop("_hs")
          }
          // correlated HAVING [NOT] EXISTS: semi/anti against the
          // DISTINCT child key set, joined on the first group key —
          // the filter-after-aggregate semi-join decorrelation. A NULL
          // group key (grouping-set subtotal) never matches: semi
          // drops it, anti keeps it — the convention under test.
          val h3 = (havingExists, keys.headOption.flatMap(k =>
            k.mod.map((k, _)))) match {
            case (Some((t, hc, neg, p)), Some((k0, m))) =>
              val sub = H.t(s, dir, t).filter(p.df)
                .select((col(hc) % m).cast("bigint").as("_he")).distinct()
              h2.join(sub, col(k0.alias) === col("_he"),
                if (neg) "left_anti" else "left_semi")
            case _ => h2
          }
          if (winOverAgg && keys.nonEmpty && gmode == "plain") {
            // running SUM(n) above the Aggregate: a global ROWS window
            // in key order (keys are unique per grouped row, so the
            // running sum is deterministic; single-partition is fine —
            // the grouped result is #groups rows, not data-sized)
            val w = Window.orderBy(keys.map(k => col(k.alias).asc): _*)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            h3.withColumn("rsum", sum(col("n")).over(w).cast("bigint"))
              .orderBy((keys.map(k => col(k.alias)) ++
                aggs.map(a => col(a.alias)) ++
                extraAliases(keys).map(col) :+ col("rsum")): _*)
          } else h3.orderBy((keys.map(k => col(k.alias)) ++
            aggs.map(a => col(a.alias)) ++
            extraAliases(keys).map(col)): _*)
        case WinShape(pk, ordCol, desc, ids, topK, fn) =>
          // wave 10: NULLIF-poisoned ordering expression + the
          // explicit NON-default null placement (mirrors the SQL text)
          val ordColExpr = winNulls.fold(col(ordCol)) { case (k, r) =>
            when((col(ordCol) % k) === r, lit(null))
              .otherwise(col(ordCol) % k)
          }
          val ordBase =
            if (winNulls.isDefined)
              (if (desc) ordColExpr.desc_nulls_first
               else ordColExpr.asc_nulls_last)
            else if (desc) ordColExpr.desc
            else ordColExpr.asc
          val ordSorts = fn match {
            case "row_number" => ordBase +: ids.map(col(_).asc)
            case _ => Seq(ordBase)
          }
          val rankFn = fn match {
            case "row_number" => row_number()
            case "rank" => rank()
            case "dense_rank" => dense_rank()
          }
          val qCols = (if (qualifyExt) Seq("ov", "ext") else Nil) ++
            (if (multiWin) Seq("rsum2") else Nil) ++
            (if (nthVal) Seq("nv2") else Nil) ++
            nullSideSum.map(_ => "nssum").toSeq ++
            caseExists.map(_ => "cex").toSeq ++
            (if (latWin) Seq("lwsum") else Nil)
          val outCols = (Seq("pk") ++ ids ++ Seq("rn") ++
            selectSub.map(_ => "sq").toSeq ++ qCols).map(col)
          val winSpec = Window.partitionBy(col("pk")).orderBy(ordSorts: _*)
          val withPk = base.withColumn("pk", pk.df)
            .withColumn("rn", rankFn.over(winSpec))
          // wave 10: second window functions in the same select —
          // partition extreme (whole-partition default frame) and the
          // tie-broken running sum (row_number cases only)
          val withQ = if (qualifyExt) {
            val extFn = if (desc) max(col(ordCol)) else min(col(ordCol))
            withPk.withColumn("ov", col(ordCol).cast("bigint"))
              .withColumn("ext", extFn.over(
                Window.partitionBy(col("pk"))).cast("bigint"))
          } else withPk
          val withMw = if (multiWin)
            withQ.withColumn("rsum2", sum(col(ordCol)).over(
              winSpec.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)).cast("bigint"))
          else withQ
          // wave 11: NTH_VALUE over the running total-order ROWS frame
          val withNv = if (nthVal)
            withMw.withColumn("nv2", nth_value(col(ordCol), 2).over(
              winSpec.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)).cast("bigint"))
          else withMw
          // wave 12: running SUM over a null-extended-side argument
          val withNs = nullSideSum.fold(withNv)(c =>
            withNv.withColumn("nssum", sum(col(c)).over(
              winSpec.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)).cast("bigint")))
          // wave 14: running SUM over the LATERAL's output column
          val withLw = if (latWin)
            withNs.withColumn("lwsum",
              sum(col(if (lateralCnt.isDefined) "lcv" else "lmxv")).over(
                winSpec.rowsBetween(Window.unboundedPreceding,
                  Window.currentRow)).cast("bigint"))
          else withNs
          val ranked = withLw.filter(col("rn") <= topK &&
            (if (qualifyExt) col("ov") === col("ext") || col("rn") === 1
             else lit(true)))
          // wave 8: aggregate ABOVE the window — group the top-k rows
          // by their rank value
          if (aggOverWin)
            ranked.groupBy(col("rn"))
              .agg(count(lit(1)).cast("bigint").as("n"),
                sum(col(ids.head)).cast("bigint").as("sid"))
              .orderBy(col("rn"))
          // wave 13: DISTINCT over the (pk, rn) window projection —
          // rank peers collapse to one row
          else if (distinctRanks)
            ranked.select(col("pk"), col("rn")).distinct()
              .orderBy(col("pk"), col("rn"))
          else ranked.select(outCols: _*).orderBy(outCols: _*)
        case FrameShape(pk, ordCol, desc, ids, frame, prec, sym) =>
          val ordSort = if (desc) col(ordCol).desc else col(ordCol).asc
          val tieSorts = ids.map(col(_).asc)
          val lagWin = Window.partitionBy(col("pk"))
            .orderBy(ordSort +: tieSorts: _*)
          val frameEnd = if (sym) prec.toLong else 0L
          // wave 14: the ROWS frame orders by the EXPRESSION
          // (ordCol % k + 1) + the id tiebreak — mirrors the SQL text
          val sumWin = (frame, frameExprOrd) match {
            case ("rows", Some(k)) =>
              val e = col(ordCol) % k + 1
              Window.partitionBy(col("pk"))
                .orderBy(Seq(if (desc) e.desc else e.asc, ordSort) ++
                  tieSorts: _*)
                .rowsBetween(-prec, frameEnd)
            case ("rows", None) => lagWin.rowsBetween(-prec, frameEnd)
            case _ => Window.partitionBy(col("pk")).orderBy(ordSort)
              .rangeBetween(-prec, frameEnd)
          }
          val outCols = (Seq("pk") ++ ids ++ Seq("wsum", "prev") ++
            lagNulls.map(_ => "prevnn").toSeq ++
            fvNulls.map(_ => Seq("fval", "lval")).toSeq.flatten).map(col)
          val withLag = base.withColumn("pk", pk.df)
            .withColumn("wsum", sum(col(ordCol)).over(sumWin).cast("bigint"))
            .withColumn("prev", lag(col(ordCol), 1, -1).over(lagWin).cast("bigint"))
          // wave 11: LAG … IGNORE NULLS over the poisoned argument
          val withLn = lagNulls.fold(withLag) { case (k, r) =>
            val arg = when((col(ordCol) % k) === r, lit(null))
              .otherwise(col(ordCol) % k)
            withLag.withColumn("prevnn",
              lag(arg, 1, -1, ignoreNulls = true).over(lagWin).cast("bigint"))
          }
          // wave 12: FIRST/LAST_VALUE over explicit asymmetric ROWS
          // frames with the poisoned argument (RESPECT NULLS default)
          val withFv = fvNulls.fold(withLn) { case (k, r) =>
            val arg = when((col(ordCol) % k) === r, lit(null))
              .otherwise(col(ordCol) % k)
            withLn
              .withColumn("fval", first(arg).over(
                lagWin.rowsBetween(-1, Window.currentRow)).cast("bigint"))
              .withColumn("lval", last(arg).over(
                lagWin.rowsBetween(Window.currentRow, 2)).cast("bigint"))
          }
          withFv.select(outCols: _*)
            .orderBy(outCols: _*)
        case SetShape(c, m, op, pa, pb, withRn, withAgg) =>
          val side = (p: Pred) => base.filter(p.df)
            .select((col(c) % m).cast("bigint").as("v"))
          val combined = op match {
            case "UNION ALL" => side(pa).union(side(pb))
            case "INTERSECT" => side(pa).intersect(side(pb))
            case "EXCEPT" => side(pa).except(side(pb))
            // wave 8: multiset semantics — duplicates survive by
            // min(countA, countB) / countA − countB in both engines
            case "INTERSECT ALL" => side(pa).intersectAll(side(pb))
            case "EXCEPT ALL" => side(pa).exceptAll(side(pb))
          }
          if (withAgg) combined
            .agg(countDistinct(col("v")).cast("bigint").as("cd"),
              sum_distinct(col("v")).cast("bigint").as("sd"))
          else if (!withRn) combined.orderBy(col("v"))
          else combined
            .withColumn("rn", row_number()
              .over(Window.orderBy(col("v").asc)).cast("int"))
            .orderBy(col("v"), col("rn"))
      }
    }
  }

  // ---- generator ----

  private def pick[A](rnd: Random, xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

  def gen(seed: Int): FuzzCase = {
    val rnd = new Random(seed * 2654435761L + 1)
    val join0 =
      if (rnd.nextInt(2) == 0) Some(pick(rnd, fkJoins)) else None
    val joinKind =
      if (join0.isEmpty) "inner"
      else pick(rnd, Seq("inner", "inner", "semi", "anti", "left", "full"))
    // semi/anti run PARENT-side (orders EXISTS lineitem, customer NOT
    // EXISTS orders, ...): child-side EXISTS is the identity and
    // child-side NOT EXISTS is vacuously empty on FK-complete data
    val join = join0.map { case (lt, rt, lc, rc) =>
      if (joinKind == "semi" || joinKind == "anti") (rt, lt, rc, lc)
      else (lt, rt, lc, rc)
    }
    // scope semi/anti subqueries on a child-side mod predicate (ONLY
    // those kinds — the sweep caught subPred leaking into the LEFT
    // JOIN's DataFrame rendering with no SQL counterpart)
    val subPred = join
      .filter(_ => joinKind == "semi" || joinKind == "anti").map {
      case (_, child, _, _) =>
        val k = pick(rnd, Seq(2, 3, 5))
        Pred(pick(rnd, byName(child).intCols), k, rnd.nextInt(k),
          pick(rnd, Seq("=", "<>")))
    }
    val fromTables = join match {
      case Some((lt, rt, _, _)) => Seq(byName(lt), byName(rt))
      case None =>
        // single-table: skip region (5 rows — everything degenerates)
        Seq(pick(rnd, tables.filterNot(_.name == "region")))
    }
    // chain a third table onto an INNER join: a second FK hop whose
    // left side is already in scope (join-reorder fodder for Catalyst
    // and the cross-engine differential alike)
    val join2 = join.filter(_ => joinKind == "inner").flatMap {
      case (lt, rt, _, _) =>
        val inScope = Set(lt, rt)
        val ext = fkJoins.filter(j =>
          inScope(j._1) && !inScope(j._2))
        if (ext.nonEmpty && rnd.nextInt(2) == 0) Some(pick(rnd, ext))
        else None
    }
    val fromTables2 = fromTables ++ join2.map(j => byName(j._2)).toSeq
    // semi/anti: only the left table's columns survive the join
    val visible = join match {
      case Some((lt, _, _, _))
          if joinKind == "semi" || joinKind == "anti" => Seq(byName(lt))
      case _ => fromTables2
    }
    val intCols = visible.flatMap(_.intCols)
    val strCols = visible.flatMap(_.strCols)
    val idCols = visible.flatMap(_.idCols)

    val preds = (0 until rnd.nextInt(3)).map { _ =>
      val k = pick(rnd, Seq(2, 3, 5, 7, 11))
      Pred(pick(rnd, intCols), k, rnd.nextInt(k),
        pick(rnd, Seq("=", "<>", "<=")))
    }

    def genKey(alias: String): Key =
      if (strCols.nonEmpty && rnd.nextInt(2) == 0)
        Key(alias, pick(rnd, strCols), None)
      else Key(alias, pick(rnd, intCols), Some(pick(rnd, Seq(4, 8, 13, 16))))

    // frames need non-null ordering/partition values: under LEFT/FULL
    // joins the null-extended side makes RANGE-frame NULL-peer and
    // NULL-default-lag conventions engine-specific — keep frames to the
    // FK-complete (non-null) join kinds and let WinShape's row_number
    // (tie-broken, null-direction-pinned) cover the outer joins
    val framesOk = joinKind != "left" && joinKind != "full"
    val shape =
      if (rnd.nextInt(10) >= 8) {
        val k = pick(rnd, Seq(2, 3, 5, 7, 11))
        val mkPred = () => Pred(pick(rnd, intCols), k, rnd.nextInt(k),
          pick(rnd, Seq("=", "<>", "<=")))
        SetShape(pick(rnd, intCols), pick(rnd, Seq(5, 9, 13)),
          pick(rnd, Seq("UNION ALL", "INTERSECT", "EXCEPT")),
          mkPred(), mkPred())
      } else if (rnd.nextInt(10) < 6) {
        val keys = (0 to rnd.nextInt(2)).map(i => genKey(s"k$i"))
          .distinctBy(_.sqlExpr).zipWithIndex
          .map { case (k, i) => k.copy(alias = s"k$i") }
        val extra = (1 to 1 + rnd.nextInt(2)).map { i =>
          val kind = pick(rnd, Seq("sum", "min", "max", "cntd") ++
            (if (strCols.nonEmpty) Seq("minstr") else Seq()))
          Agg(s"a$i", kind,
            if (kind == "minstr") pick(rnd, strCols) else pick(rnd, intCols))
        }.distinctBy(a => (a.kind, a.colName)).zipWithIndex
          .map { case (a, i) => a.copy(alias = s"a${i + 1}") }
        val having = if (rnd.nextInt(3) == 0) Some(1 + rnd.nextInt(3)) else None
        val gmode = pick(rnd, Seq("plain", "plain", "plain", "rollup", "cube"))
        AggShape(keys, Agg("n", "count", "") +: extra, having, gmode)
      } else if (rnd.nextInt(2) == 0 && framesOk) {
        FrameShape(genKey("pk"), pick(rnd, intCols), rnd.nextInt(2) == 1,
          idCols, pick(rnd, Seq("rows", "range")), 1 + rnd.nextInt(3))
      } else {
        WinShape(genKey("pk"), pick(rnd, intCols), rnd.nextInt(2) == 1,
          idCols, pick(rnd, Seq(2, 3, 5)))
      }
    // scalar subquery drawn from an INDEPENDENT stream: layering a new
    // grammar feature must not shift the primary stream's draws, which
    // would regenerate every existing fixed seed's structure
    val rnd2 = new Random(seed * 0x9E3779B1L + 13)
    val scalarSub =
      if (rnd2.nextInt(3) == 0) {
        val tbl = pick(rnd2, tables)
        val k = pick(rnd2, Seq(2, 3, 5))
        Some(ScalarSub(pick(rnd2, intCols), tbl.name,
          pick(rnd2, tbl.intCols), pick(rnd2, Seq("<=", ">=")),
          Pred(pick(rnd2, tbl.intCols), k, rnd2.nextInt(k),
            pick(rnd2, Seq("=", "<>")))))
      } else None
    // correlated scalar subquery: needs a visible table that is the
    // PARENT of some FK edge (the child aggregates per parent key);
    // >= keeps rows (child keys are usually smaller than parent ids),
    // <= exercises the NULL-drop on childless parents
    val visNames = visible.map(_.name).toSet
    val corrEdges = fkJoins.filter(j => visNames(j._2))
    val corrSub =
      if (corrEdges.nonEmpty && rnd2.nextInt(3) == 0) {
        val (ct, _, cfk, pk) = pick(rnd2, corrEdges)
        val child = byName(ct)
        val k = pick(rnd2, Seq(2, 3, 5))
        Some(CorrSub(pick(rnd2, intCols), ct,
          pick(rnd2, child.intCols), pick(rnd2, Seq("<=", ">=", ">=")),
          cfk, pk,
          Pred(pick(rnd2, child.intCols), k, rnd2.nextInt(k),
            pick(rnd2, Seq("=", "<>")))))
      } else None
    // round-8 features ride their own stream (same rule as rnd2: new
    // grammar must not shift the primary stream's draws)
    val rnd3 = new Random(seed * 0x85EBCA77L + 29)
    val inSub =
      if (rnd3.nextInt(3) == 0) {
        val tbl = pick(rnd3, tables)
        val m = pick(rnd3, Seq(4, 7, 9))
        val k = pick(rnd3, Seq(2, 3, 5))
        val nullR = if (rnd3.nextInt(3) == 0) Some(rnd3.nextInt(m)) else None
        Some(InSub(pick(rnd3, intCols), m, tbl.name,
          pick(rnd3, tbl.intCols), nullR, neg = rnd3.nextInt(2) == 1,
          Pred(pick(rnd3, tbl.intCols), k, rnd3.nextInt(k),
            pick(rnd3, Seq("=", "<>")))))
      } else None
    // conditional CASE aggregate appended to agg shapes (an extra
    // column never changes the row set, so fixed seeds keep their
    // documented non-emptiness)
    val shape2 = shape match {
      case a: AggShape if rnd3.nextInt(2) == 0 =>
        val k = pick(rnd3, Seq(2, 3, 5))
        a.copy(aggs = a.aggs :+ Agg("ca", "csum", pick(rnd3, intCols),
          ck = Some((k, rnd3.nextInt(k), pick(rnd3, Seq(4, 9, 13))))))
      case other => other
    }
    // rank/dense_rank variants order by the value alone — tie
    // semantics (rank gaps vs dense_rank none) under test; appending
    // draws to rnd3 never shifts the earlier rnd3 features
    val shape3 = shape2 match {
      case w: WinShape if rnd3.nextInt(3) == 0 =>
        w.copy(fn = pick(rnd3, Seq("rank", "dense_rank")))
      case other => other
    }
    // round-9 wave rides its own stream (the rnd2/rnd3 rule):
    // SUM(DISTINCT) under join fan-out, ROW_NUMBER over set-ops, and
    // scalar-subquery HAVING thresholds
    val rnd4 = new Random(seed * 0xC2B2AE3DL + 41)
    val shape4 = shape3 match {
      case a: AggShape if join.isDefined && rnd4.nextInt(2) == 0 =>
        a.copy(aggs = a.aggs :+ Agg("sd", "sumd", pick(rnd4, intCols)))
      case st: SetShape if rnd4.nextInt(2) == 0 => st.copy(withRn = true)
      case other => other
    }
    val havingSub = shape4 match {
      case _: AggShape if rnd4.nextInt(3) == 0 =>
        val tbl = pick(rnd4, tables)
        val k = pick(rnd4, Seq(2, 3, 5))
        Some((tbl.name, pick(rnd4, tbl.intCols),
          Pred(pick(rnd4, tbl.intCols), k, rnd4.nextInt(k),
            pick(rnd4, Seq("=", "<>")))))
      case _ => None
    }
    // round-9 wave 5 rides a fifth independent stream: symmetric
    // (PRECEDING..FOLLOWING) ROWS frames and LATERAL aggregate
    // subqueries in FROM
    val rnd5 = new Random(seed * 0x27220A95L + 57)
    val shape5 = shape4 match {
      case f: FrameShape if f.frame == "rows" && rnd5.nextInt(3) == 0 =>
        f.copy(sym = true)
      case other => other
    }
    val lateralAgg =
      // 1/6: LATERAL's NULL-drop on childless parents legitimately
      // empties cases, and the sweep's >=50/80 non-emptiness floor is
      // a hard teeth-guard (measured 48/80 at 1/4)
      if (corrEdges.nonEmpty && rnd5.nextInt(6) == 0) {
        val (ct, _, cfk, pk2) = pick(rnd5, corrEdges)
        val child = byName(ct)
        val k = pick(rnd5, Seq(2, 3, 5))
        Some(CorrSub(pick(rnd5, intCols), ct,
          pick(rnd5, child.intCols), pick(rnd5, Seq("<=", ">=", ">=")),
          cfk, pk2,
          Pred(pick(rnd5, child.intCols), k, rnd5.nextInt(k),
            pick(rnd5, Seq("=", "<>")))))
      } else None
    // round-10 wave 6 rides a sixth independent stream (the rnd2..rnd5
    // rule: layering new grammar must not shift earlier streams):
    // explicit GROUPING SETS lists, DISTINCT aggregates over set-ops,
    // and correlated [NOT] EXISTS in HAVING
    val rnd6 = new Random(seed * 0x165667B1L + 71)
    val shape6 = shape5 match {
      case a: AggShape if a.gmode == "plain" && a.keys.nonEmpty &&
          rnd6.nextInt(3) == 0 =>
        a.copy(gmode = "gsets")
      case st: SetShape if !st.withRn && rnd6.nextInt(3) == 0 =>
        st.copy(withAgg = true)
      case other => other
    }
    val havingExists = shape6 match {
      case a: AggShape if a.keys.headOption.exists(_.mod.isDefined) &&
          rnd6.nextInt(3) == 0 =>
        val tbl = pick(rnd6, tables)
        val k = pick(rnd6, Seq(2, 3, 5))
        Some((tbl.name, pick(rnd6, tbl.intCols),
          rnd6.nextInt(2) == 1,
          Pred(pick(rnd6, tbl.intCols), k, rnd6.nextInt(k),
            pick(rnd6, Seq("=", "<>")))))
      case _ => None
    }
    // round-11 wave 7 rides a seventh independent stream (the
    // rnd2..rnd6 rule): select-list correlated scalars on window
    // shapes, [NOT] IN over set-op children, and running windowed
    // aggregates over grouped results
    val rnd7 = new Random(seed * 0x94D049BBL + 83)
    val selectSub = shape6 match {
      case _: WinShape if corrEdges.nonEmpty && rnd7.nextInt(3) == 0 =>
        val (ct, _, cfk, pk2) = pick(rnd7, corrEdges)
        val child = byName(ct)
        val k = pick(rnd7, Seq(2, 3, 5))
        // op is unused in the select-list position (NULL-extension,
        // no comparison) — carried as "sel" for the spec's coverage
        // accounting
        Some(CorrSub("", ct, pick(rnd7, child.intCols), "sel",
          cfk, pk2,
          Pred(pick(rnd7, child.intCols), k, rnd7.nextInt(k),
            pick(rnd7, Seq("=", "<>")))))
      case _ => None
    }
    val inSetSub =
      // 1/6 like lateralAgg: NOT IN over EXCEPT/poisoned children
      // legitimately empties cases, and the sweep's >=50/80
      // non-emptiness floor is a hard teeth-guard (measured 47/80
      // at 1/4)
      if (rnd7.nextInt(6) == 0) {
        val tbl = pick(rnd7, tables)
        val m = pick(rnd7, Seq(4, 7, 9))
        val kA = pick(rnd7, Seq(2, 3, 5))
        val kB = pick(rnd7, Seq(2, 3, 5))
        val nullR = if (rnd7.nextInt(3) == 0) Some(rnd7.nextInt(m)) else None
        // UNION ALL weighted 2×: an IN over an INTERSECT/EXCEPT of two
        // DIFFERENT mod-projections is often an IN over the empty set
        // (sweep-measured), and the >=50/80 non-emptiness floor is a
        // hard teeth-guard — the set-distinct ops stay reachable, just
        // rarer
        Some(InSetSub(pick(rnd7, intCols), m, tbl.name,
          pick(rnd7, tbl.intCols), pick(rnd7, tbl.intCols),
          pick(rnd7, Seq("UNION ALL", "UNION ALL", "INTERSECT", "EXCEPT")),
          nullR, neg = rnd7.nextInt(2) == 1,
          Pred(pick(rnd7, tbl.intCols), kA, rnd7.nextInt(kA),
            pick(rnd7, Seq("=", "<>"))),
          Pred(pick(rnd7, tbl.intCols), kB, rnd7.nextInt(kB),
            pick(rnd7, Seq("=", "<>")))))
      } else None
    val winOverAgg = shape6 match {
      case a: AggShape if a.gmode == "plain" && a.keys.nonEmpty &&
          rnd7.nextInt(3) == 0 => true
      case _ => false
    }
    // round-12 wave 8 rides an eighth independent stream (the
    // rnd2..rnd7 rule): INTERSECT ALL / EXCEPT ALL multiset set-ops,
    // GROUP BY over a window-function result, and correlated [NOT]
    // EXISTS under OR. None of the three can EMPTY a case (OR widens,
    // ALL keeps at least the distinct rows, grouping a non-empty
    // result is non-empty), so the sweep's non-emptiness floor is
    // structurally safe from this wave.
    val rnd8 = new Random(seed * 0xFF51AFD7L + 97)
    val shape7 = shape6 match {
      case st: SetShape if (st.op == "INTERSECT" || st.op == "EXCEPT") &&
          rnd8.nextInt(2) == 0 =>
        st.copy(op = st.op + " ALL")
      case other => other
    }
    val orExists =
      if (corrEdges.nonEmpty && rnd8.nextInt(4) == 0) {
        val (ct, _, cfk, pk2) = pick(rnd8, corrEdges)
        val child = byName(ct)
        val kO = pick(rnd8, Seq(2, 3, 5))
        val kS = pick(rnd8, Seq(2, 3, 5))
        Some(OrExists(
          Pred(pick(rnd8, intCols), kO, rnd8.nextInt(kO),
            pick(rnd8, Seq("=", "<>"))),
          ct, cfk, pk2, neg = rnd8.nextInt(2) == 1,
          Pred(pick(rnd8, child.intCols), kS, rnd8.nextInt(kS),
            pick(rnd8, Seq("=", "<>")))))
      } else None
    val aggOverWin = shape7 match {
      case w: WinShape if selectSub.isEmpty && w.ids.nonEmpty &&
          rnd8.nextInt(3) == 0 => true
      case _ => false
    }
    // round-15 wave 9 rides a ninth independent stream (the rnd2..rnd8
    // rule): FILTER (WHERE) aggregates, ordered string aggregation
    // (listagg WITHIN GROUP / string_agg ORDER BY — the one dual-
    // spelled construct, see FuzzCase.duckSql), and GROUPING() /
    // GROUPING_ID() over ROLLUP/CUBE/GROUPING SETS. All three are
    // select-list additions — none can EMPTY a case, so the sweep's
    // non-emptiness floor is structurally safe from this wave.
    val rnd9 = new Random(seed * 0x6C62272EL + 109)
    val (filterAgg, orderedAgg, groupingSel) = shape7 match {
      case a: AggShape =>
        val fa = if (rnd9.nextInt(3) == 0) {
          val k = pick(rnd9, Seq(2, 3, 5))
          Some((Pred(pick(rnd9, intCols), k, rnd9.nextInt(k),
            pick(rnd9, Seq("=", "<>"))), pick(rnd9, intCols),
            pick(rnd9, Seq(4, 9, 13))))
        } else None
        // listagg is barred next to TWO+ distinct-aggregate groups:
        // Spark 4.1's RewriteDistinctAggregates Expand path rebuilds
        // ListAgg children positionally and dies on the SortOrder slot
        // (probed: ClassCastException AttributeReference→SortOrder in
        // ListAgg.withNewChildrenInternal; one distinct group is fine)
        val nDistinctGroups = a.aggs
          .filter(ag => ag.kind == "cntd" || ag.kind == "sumd")
          .map(_.colName).distinct.size
        val oa = if (strCols.nonEmpty && nDistinctGroups < 2 &&
            rnd9.nextInt(3) == 0)
          Some(pick(rnd9, strCols)) else None
        val gs = a.keys.nonEmpty && a.gmode != "plain" &&
          rnd9.nextInt(2) == 0
        (fa, oa, gs)
      case _ => (None, None, false)
    }
    // round-16 wave 10 rides a tenth independent stream (the
    // rnd2..rnd9 rule): QUALIFY-style filtered windows (a partition-
    // extreme second window function qualifying the kept rows,
    // rendered as the subquery both engines accept), NULLIF-poisoned
    // window ORDER BY with the explicit NON-default null placement
    // (ASC NULLS LAST / DESC NULLS FIRST), and multi-window-function
    // single-SELECT shapes (the tie-broken running sum beside the
    // rank). None can EMPTY a case: the qualify filter keeps rn = 1
    // structurally, the other two are ordering/select-list additions.
    val rnd10 = new Random(seed * 0x9E3779B1L + 127)
    val (qualifyExt, winNulls, multiWin) = shape7 match {
      case w: WinShape if !aggOverWin =>
        val q = rnd10.nextInt(3) == 0
        val nf = if (rnd10.nextInt(3) == 0) {
          val k = pick(rnd10, Seq(2, 3, 5))
          Some((k, rnd10.nextInt(k))) // r < k: the poison genuinely fires
        } else None
        val mw = w.fn == "row_number" && rnd10.nextInt(3) == 0
        (q, nf, mw)
      case _ => (false, None, false)
    }
    // round-16 wave 11 rides an eleventh independent stream (the
    // rnd2..rnd10 rule): LAG … IGNORE NULLS over a NULLIF-poisoned
    // argument (frame shapes — the second dual-spelled construct, see
    // the FrameShape renderer), MAX_BY/MIN_BY arg-extremes whose value
    // is a function of the ordering key (tie-safe by construction),
    // and NTH_VALUE over the running total-order ROWS frame
    // (row_number window cases). All three are select-list additions —
    // none can EMPTY a case.
    val rnd11 = new Random(seed * 0xC2B2AE35L + 131)
    val (lagNulls, argExt, nthVal) = shape7 match {
      case _: FrameShape =>
        val ln = if (rnd11.nextInt(3) == 0) {
          val k = pick(rnd11, Seq(2, 3, 5))
          Some((k, rnd11.nextInt(k))) // r < k: the poison genuinely fires
        } else None
        (ln, None, false)
      case _: AggShape =>
        val ae = if (rnd11.nextInt(3) == 0)
          Some((pick(rnd11, intCols), pick(rnd11, Seq(5, 7, 11)),
            rnd11.nextBoolean()))
        else None
        (None, ae, false)
      case w: WinShape if !aggOverWin =>
        (None, None, w.fn == "row_number" && rnd11.nextInt(3) == 0)
      case _ => (None, None, false)
    }
    // round-17 wave 12 rides a twelfth independent stream (the
    // rnd2..rnd11 rule): symmetric NUMERIC RANGE frames (RANGE BETWEEN
    // n PRECEDING AND n FOLLOWING — a value-window over the ordering
    // expression, peers included on BOTH ends; deterministic because
    // the frame is a function of the VALUE alone), FIRST_VALUE /
    // LAST_VALUE over explicit asymmetric ROWS frames with a
    // NULLIF-poisoned argument (RESPECT NULLS default — the poison
    // must surface, never be skipped), and running sums whose argument
    // comes from the NULL-EXTENDED side of a LEFT/FULL join. None can
    // EMPTY a case: the first is a frame-bound change, the other two
    // are select-list additions.
    val rnd12 = new Random(seed * 0x2545F491L + 149)
    val shape8 = shape7 match {
      case f: FrameShape if f.frame == "range" && !f.sym &&
          rnd12.nextInt(3) == 0 =>
        f.copy(sym = true)
      case other => other
    }
    val fvNulls = shape8 match {
      case _: FrameShape if rnd12.nextInt(3) == 0 =>
        val k = pick(rnd12, Seq(2, 3, 5))
        Some((k, rnd12.nextInt(k))) // r < k: the poison genuinely fires
      case _ => None
    }
    val nullSideSum = shape8 match {
      case w: WinShape if w.fn == "row_number" && !aggOverWin &&
          join.isDefined && (joinKind == "left" || joinKind == "full") &&
          rnd12.nextInt(2) == 0 =>
        Some(pick(rnd12, byName(join.get._2).intCols))
      case _ => None
    }
    // round-18 wave 13 rides a thirteenth independent stream (the
    // rnd2..rnd12 rule): GROUP BY ALL (the resolver sugar — plain agg
    // shapes only; the DF rendering keeps explicit keys so the
    // differential adjudicates ALL's resolution), multi-column
    // correlated LATERAL table subqueries whose (MAX, COUNT(*)) row
    // feeds a disjunctive WHERE (COUNT over an empty correlated group
    // is 0 while MAX is NULL — `OR lc = 0` keeps childless parents,
    // the asymmetry vs wave 5's scalar lateral), and SELECT DISTINCT
    // over rank/dense_rank window results (peers share a rank and
    // must collapse identically — probed: COUNT(DISTINCT) OVER is
    // unsupported by Spark, so the DISTINCT-over-window-result
    // composition is the shared-dialect face of "distinct windowed
    // aggregation"). GROUP BY ALL and the DISTINCT projection cannot
    // EMPTY a case; the lateral's OR-widened predicate can, so it
    // rides 1/8 (measured: 1/6 left the sweep at 49/80 non-empty —
    // one under the hard teeth-guard floor).
    val rnd13 = new Random(seed * 0xB5297A4DL + 167)
    val groupByAll = shape8 match {
      case a: AggShape if a.gmode == "plain" && a.keys.nonEmpty &&
          rnd13.nextInt(3) == 0 => true
      case _ => false
    }
    val lateralCnt =
      if (corrEdges.nonEmpty && rnd13.nextInt(8) == 0) {
        val (ct, _, cfk, pk2) = pick(rnd13, corrEdges)
        val child = byName(ct)
        val k = pick(rnd13, Seq(2, 3, 5))
        Some(CorrSub(pick(rnd13, intCols), ct,
          pick(rnd13, child.intCols), pick(rnd13, Seq("<=", ">=")),
          cfk, pk2,
          Pred(pick(rnd13, child.intCols), k, rnd13.nextInt(k),
            pick(rnd13, Seq("=", "<>")))))
      } else None
    val distinctRanks = shape8 match {
      case w: WinShape if (w.fn == "rank" || w.fn == "dense_rank") &&
          !aggOverWin && selectSub.isEmpty && !qualifyExt && !multiWin &&
          !nthVal && nullSideSum.isEmpty && rnd13.nextInt(3) == 0 => true
      case _ => false
    }
    // round-19 wave 14 rides a fourteenth independent stream (the
    // rnd2..rnd13 rule): window functions over LATERAL results (a
    // running SUM whose argument is the lateral subquery's output
    // column — row_number shapes only, the total order the ROWS frame
    // needs; rides whichever lateral the case already carries),
    // correlated [NOT] EXISTS inside a CASE-WHEN select expression
    // (the projection-position ExistenceJoin — [[CaseExists]]), and
    // ROWS-frame window ORDER BY over an EXPRESSION (ordCol % k + 1 —
    // computed ordering + genuine ties for the id tiebreak) instead
    // of a bare column. None can EMPTY a case: all three are
    // select-list additions or ordering rewrites, never row attrition.
    val rnd14 = new Random(seed * 0x6C62272EL + 181)
    val latWin = shape8 match {
      case w: WinShape if w.fn == "row_number" && !aggOverWin &&
          !distinctRanks && (lateralAgg.isDefined || lateralCnt.isDefined) &&
          rnd14.nextInt(2) == 0 => true
      case _ => false
    }
    val caseExists = shape8 match {
      case _: WinShape if !aggOverWin && !distinctRanks &&
          corrEdges.nonEmpty && rnd14.nextInt(3) == 0 =>
        val (ct, _, cfk, pk2) = pick(rnd14, corrEdges)
        val child = byName(ct)
        val k = pick(rnd14, Seq(2, 3, 5))
        Some(CaseExists(pick(rnd14, intCols), pick(rnd14, Seq(5, 7, 9)),
          ct, cfk, pk2, rnd14.nextInt(3) == 0,
          Pred(pick(rnd14, child.intCols), k, rnd14.nextInt(k),
            pick(rnd14, Seq("=", "<>")))))
      case _ => None
    }
    val frameExprOrd = shape8 match {
      case f: FrameShape if f.frame == "rows" && rnd14.nextInt(3) == 0 =>
        Some(pick(rnd14, Seq(3, 5, 7)))
      case _ => None
    }
    FuzzCase(seed, fromTables2, join, joinKind, join2, subPred, preds, shape8,
      scalarSub, corrSub, inSub, havingSub, lateralAgg, havingExists,
      selectSub, inSetSub, winOverAgg, orExists, aggOverWin,
      filterAgg, orderedAgg, groupingSel, qualifyExt, winNulls, multiWin,
      lagNulls, argExt, nthVal, fvNulls, nullSideSum,
      groupByAll, lateralCnt, distinctRanks,
      caseExists, latWin, frameExprOrd)
  }

  /** The fixed seeds registered as driver queries (cross-engine
    * differential vs DuckDB). Chosen to cover the full grammar —
    * agg/window/set-op shapes, ROLLUP/CUBE grouping sets, ROWS/RANGE
    * window frames with LAG defaults, inner/semi/anti/LEFT/FULL joins,
    * HAVING, scalar + correlated + [NOT] IN subqueries, CASE
    * aggregates — and asserted to stay covering by FuzzSpec; the spec
    * additionally sweeps a much wider seed range DF-vs-SQL.
    * Notables: 22 is a ROWS frame under NOT EXISTS whose NOT IN
    * carries a NULLIF that happens never to fire (the machinery under
    * test, un-poisoned); 90 is a NULLIF-poisoned positive IN that
    * keeps rows (IN skips NULLs — the asymmetry vs NOT IN); 25/118
    * put positive INs under RANGE/ROWS frames; 272 is ROLLUP over a
    * FULL join with scalar + positive-IN subqueries; 173 is CUBE over
    * a FULL join; 81 INTERSECT + scalar; 8/32/48/103/108/146 carry
    * CORRELATED scalar subqueries. The round-8 IN/CASE wave emptied
    * previous picks 1/3/68/124 (an empty fixed differential only
    * adjudicates the schema) — replaced by 272/90/173/81, same
    * coverage, non-empty. Round-9 wave additions: 6 (CUBE over a LEFT
    * join carrying SUM(DISTINCT), a correlated scalar subquery AND a
    * scalar-subquery HAVING threshold), 12 (EXISTS + SUM(DISTINCT) +
    * HAVING subquery), 20 (ROW_NUMBER over a UNION ALL set-op + WHERE
    * scalar subquery) — all verified non-empty at the driver SF
    * (sf0.01). Wave 5 (LATERAL aggregate subqueries in FROM +
    * symmetric PRECEDING..FOLLOWING ROWS frames) is carried by
    * existing picks 105 (chained-join agg + LATERAL) and 118
    * (ROWS-sym frame under a positive IN) — both still non-empty.
    * Round-10 wave 6 additions: 42 (ROLLUP with a correlated EXISTS
    * over the aggregate + scalar WHERE subquery + CASE aggregate + a
    * scalar-subquery HAVING threshold, 13 rows), 49 (COUNT/
    * SUM(DISTINCT) over a UNION ALL whose WHERE carries a
    * NULLIF-poisoned NOT IN, 1 row), 117 (correlated NOT EXISTS over
    * a plain agg with a COUNT(*) threshold, 2 rows) — all non-empty
    * at the driver SF; earlier picks can also gain wave-6 layers on
    * the independent rnd6 stream (105's agg is now an explicit
    * GROUPING SETS list).
    * Round-11 wave 7 additions (rnd7 stream: select-list correlated
    * scalars on window shapes, [NOT] IN over set-op children, running
    * SUM(n) over grouped results): 13 (running SUM over a plain GROUP
    * BY, 25 rows), 15 (select-list correlated scalar NULL-extension on
    * a row_number shape, 50 rows), 17 (NOT IN over an INTERSECT child
    * under CUBE, 7 rows), 62 (IN over a NULLIF-poisoned UNION ALL
    * under ROLLUP, 17 rows) — all non-empty at the driver SF; existing
    * picks also gained wave-7 layers on the independent stream (25 now
    * stacks a poisoned UNION ALL IN on its RANGE-frame positive IN; 8
    * an INTERSECT IN; 90/117 running sums; 102/108/130-style shapes
    * select-list scalars). The set-op pick is UNION-ALL-weighted 2×
    * and NOT IN rides 1/2 — measured to hold the sweep's 50/80
    * non-emptiness floor exactly. Former pick 118 (the symmetric-frame
    * + positive-IN carrier) emptied under its new wave-7 layer and is
    * replaced by 349 — the same sym-ROWS-frame-over-positive-IN
    * construct, 8674 rows.
    * Round-12 wave 8 additions (rnd8 stream: INTERSECT ALL / EXCEPT
    * ALL, GROUP BY over a window result, [NOT] EXISTS under OR): 18
    * (GROUP BY over row_number on a LEFT join carrying scalar +
    * correlated + LATERAL subqueries, 5 rows), 101 (INTERSECT ALL
    * under DISTINCT aggregates + a NULLIF-poisoned NOT IN — the
    * multiset's duplicates must be ERASED by the distinct collapse,
    * 1 row), 172 (EXCEPT ALL under ROW_NUMBER — the multiset's
    * duplicates must SURVIVE into the rn wrap, 181 rows), 357
    * (INTERSECT ALL + NOT EXISTS under OR on a LEFT join, 114 rows) —
    * all non-empty at the driver SF; existing picks also gained
    * wave-8 layers on the independent stream (6 EXISTS-under-OR;
    * 8/32/48/90/105 NOT-EXISTS-under-OR). Wave 8 cannot EMPTY a case
    * (OR widens, ALL ⊇ distinct, grouping non-empty stays non-empty),
    * so every prior pick's documented non-emptiness is preserved by
    * construction.
    * Round-15 wave 9 additions (rnd9 stream: FILTER (WHERE)
    * aggregates, ordered string aggregation — listagg WITHIN GROUP on
    * Spark / string_agg ORDER BY on DuckDB, the one dual-spelled
    * construct (duckSql) — and GROUPING()/GROUPING_ID() over
    * ROLLUP/CUBE): 30 (FILTER sum + GROUPING + GROUPING_ID over a
    * two-key grouping shape, 16 rows), 67 (FILTER sum + ordered
    * string agg side by side, 2 rows), 116 (ordered string agg +
    * GROUPING over a grouping-set shape, 2 rows) — all non-empty at
    * the driver SF; existing picks also gained wave-9 layers on the
    * independent stream (6/12/13/42/104/105/110 FILTER sums;
    * 55/90/117 ordered aggs; 6/42 GROUPING columns). Wave 9 cannot
    * EMPTY a case (all three are select-list additions), so every
    * prior pick's documented non-emptiness is preserved by
    * construction. listagg is structurally barred next to two+
    * distinct-aggregate groups (Spark 4.1 RewriteDistinctAggregates
    * rebuilds ListAgg children positionally and dies on the SortOrder
    * slot — probed, upstream defect, not a semantics gap).
    * Round-16 wave 10 additions (rnd10 stream: QUALIFY-style filtered
    * windows — a partition-extreme second window function qualifying
    * the kept rows, rendered as the subquery both engines accept;
    * NULLIF-poisoned window ORDER BY with the explicit NON-default
    * null placement, ASC NULLS LAST / DESC NULLS FIRST; and
    * multi-window-function single-SELECT shapes — the tie-broken
    * running sum beside the rank): 38 (qualify + poisoned NULLS on a
    * RANK shape under EXISTS-under-OR, 23 rows), 208 (poisoned NULLS
    * + running sum on a row_number LEFT join, 23 rows), 235 (qualify
    * + running sum on a chained-join row_number, 20 rows) — all
    * non-empty at the driver SF; existing picks also gained wave-10
    * layers on the independent stream (15 running sum; 32 qualify;
    * 48/102 poisoned NULLS). Wave 10 cannot EMPTY a case (the qualify
    * filter structurally keeps rn = 1; the other two are ordering /
    * select-list additions), so every prior pick's documented
    * non-emptiness is preserved by construction.
    * Round-16 wave 11 additions (rnd11 stream: LAG … IGNORE NULLS over
    * a NULLIF-poisoned argument — the SECOND dual-spelled construct,
    * Spark `LAG(e, 1, -1) IGNORE NULLS OVER` vs DuckDB
    * `LAG(e, 1, -1 IGNORE NULLS) OVER`, probed; MAX_BY/MIN_BY
    * arg-extremes whose VALUE is a function of the ordering key so key
    * ties cannot surface different values, COALESCE(-1) for outer-join
    * NULL keys; NTH_VALUE(ord, 2) over the running total-order ROWS
    * frame on row_number shapes): 43 (MAX_BY under ROLLUP + HAVING
    * with a NULLIF-poisoned IN and SUM(DISTINCT), 17 rows), 301
    * (IGNORE-NULLS lag beside a symmetric ROWS frame with a correlated
    * subquery, 89 rows), 340 (poisoned-NULLS window ORDER BY + nth
    * value on a row_number shape, 80 rows) — all non-empty at the
    * driver SF; existing picks also gained wave-11 layers on the
    * independent stream (22/107/109 IGNORE-NULLS lags; 6/12/30/42/90
    * arg-extremes; 15 nth value). Wave 11 cannot EMPTY a case (all
    * three are select-list additions), so every prior pick's
    * documented non-emptiness is preserved by construction.
    * Round-17 wave 12 additions (rnd12 stream: symmetric NUMERIC RANGE
    * frames — RANGE BETWEEN n PRECEDING AND n FOLLOWING, a value-window
    * including peers on both ends; FIRST_VALUE/LAST_VALUE over explicit
    * asymmetric ROWS frames with a NULLIF-poisoned argument — RESPECT
    * NULLS default, the poison must SURFACE, never be skipped; and
    * running sums whose argument comes from the NULL-EXTENDED side of
    * a LEFT/FULL join — SUM skips the extension NULLs, an all-NULL
    * prefix is NULL not 0): 51 (poisoned FIRST/LAST_VALUE frames
    * beside a LAG default on a chained-join ROWS shape, 23 rows), 228
    * (null-side running sum over a FULL join, 6 rows), 282 (symmetric
    * numeric RANGE frame, 14 rows) — all non-empty at the driver SF
    * (candidates 344/385 generated the constructs but emptied under
    * their carried predicates and were not registered); existing
    * picks also gained wave-12 layers on the independent stream
    * (25/109 symmetric RANGE; 107/301 FIRST/LAST_VALUE; 32 full-join
    * and 102/208 left-join null-side sums). Wave 12 cannot EMPTY a
    * case (a frame-bound change plus select-list additions), so every
    * prior pick's documented non-emptiness is preserved by
    * construction.
    * Round-18 wave 13 additions (rnd13 stream: GROUP BY ALL — the
    * resolver sugar, SQL-side only so the differential adjudicates
    * ALL's resolution against the DataFrame's explicit keys;
    * multi-column correlated LATERAL table subqueries whose
    * (MAX, COUNT(*)) row feeds a disjunctive WHERE — COUNT over an
    * empty correlated group is 0 while MAX is NULL, so `OR lc = 0`
    * keeps childless parents, the asymmetry vs wave 5's scalar
    * lateral; and SELECT DISTINCT over rank/dense_rank window results
    * — peers share a rank and must collapse identically; probed:
    * `COUNT(DISTINCT) OVER` is unsupported by Spark, so this
    * composition is the shared-dialect face of distinct windowed
    * aggregation): 369 (GROUP BY ALL + multi-column LATERAL + MIN_BY
    * + running SUM over the grouped result + scalar-subquery HAVING,
    * 66 rows), 455 (DISTINCT over RANK with a poisoned NULLS-FIRST
    * order on a LEFT join + correlated scalar, 4 rows), 459 (DISTINCT
    * over DENSE_RANK, 6 rows) — all non-empty at the driver SF;
    * existing picks also gained wave-13 layers on the independent
    * stream (48 DISTINCT-over-rank; 55/104 GROUP BY ALL; 103 GROUP BY
    * ALL + the multi-column lateral on a semi join; 173/272 the
    * lateral). The lateral rides 1/8 (measured: 1/6 put the sweep at
    * 49/80 non-empty, one under the hard floor); the other two
    * constructs cannot EMPTY a case, so every prior pick's documented
    * non-emptiness is preserved (re-probed: all 47 non-empty at
    * sf0.01).
    * Round-19 wave 14 additions (rnd14 stream: window functions over
    * LATERAL results — a running SUM whose argument is the lateral
    * subquery's output column, the LateralJoin-feeds-Window
    * composition; correlated [NOT] EXISTS inside a CASE-WHEN select
    * expression — the projection-position ExistenceJoin, probed
    * dual-dialect; and ROWS-frame window ORDER BY over an EXPRESSION
    * `(ordCol % k + 1)` instead of a bare column — computed ordering
    * plus genuine ties for the id tiebreak): 136 (expression-ordered
    * ROWS frame, 55 rows), 378 (CASE-WHEN EXISTS on a row_number
    * shape, 91 rows), 392 (running SUM over the scalar lateral's MAX
    * on a row_number shape, 39 rows) — all non-empty at the driver
    * SF; existing picks also gained wave-14 layers on the independent
    * stream (228 CASE-WHEN NOT EXISTS; 349 the expression-ordered
    * frame). None of the three can EMPTY a case (select-list
    * additions / an ordering rewrite), so every prior pick's
    * documented non-emptiness is preserved by construction; 1–1200
    * sweep re-run clean with the wave live.
    */
  val driverSeeds: Seq[Int] = Seq(6, 8, 12, 13, 15, 17, 18, 20, 22, 25,
    30, 32, 34, 38, 42, 43, 48, 49, 51, 55, 62, 67, 81, 90, 101, 102,
    103, 104, 105, 107, 108, 109, 110, 116, 117, 136, 146, 172, 173,
    208, 228, 235, 272, 282, 301, 340, 349, 357, 369, 378, 392, 455,
    459)
}
