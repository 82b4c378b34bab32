package graft.fuzz

import graft.SparkSuite
import graft.queries.H

/** Generative differential suite: for a wide seed sweep, the DataFrame
  * rendering and the SQL rendering of the SAME random AST must return
  * identical rows through Spark's two Catalyst entry paths. The
  * cross-ENGINE half of the differential — the same SQL run by DuckDB —
  * happens at the driver gate via the registered x_fuzz_* queries
  * (FuzzGen.driverSeeds).
  */
class FuzzSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("seeded random plans: DataFrame and SQL renderings agree (80 seeds)") {
    FuzzGen.tables.foreach(t =>
      H.t(spark, dir, t.name).createOrReplaceTempView(t.name))
    var nonEmpty = 0
    for (seed <- 1 to 80) {
      val fc = FuzzGen.gen(seed)
      val viaDf = fc.run(spark, dir).collect().toSeq
      val viaSql = spark.sql(fc.sql).collect().toSeq
      assert(viaDf == viaSql,
        s"seed $seed diverged (${viaDf.size} vs ${viaSql.size} rows):\n${fc.sql}")
      if (viaDf.nonEmpty) nonEmpty += 1
    }
    // the sweep must exercise real rows, not agree about nothing: if a
    // grammar change ever collapses most cases to empty results the
    // differential silently loses its teeth
    assert(nonEmpty >= 50, s"only $nonEmpty/80 cases returned rows")
  }

  test("generated cases are deterministic across re-runs") {
    for (seed <- FuzzGen.driverSeeds) {
      val a = FuzzGen.gen(seed)
      val b = FuzzGen.gen(seed)
      assert(a.sql == b.sql, s"seed $seed generator not deterministic")
      val r1 = a.run(spark, dir).collect().toSeq
      val r2 = b.run(spark, dir).collect().toSeq
      assert(r1 == r2, s"seed $seed result not deterministic")
    }
  }

  test("driver seeds cover the full grammar") {
    val cases = FuzzGen.driverSeeds.map(FuzzGen.gen)
    assert(cases.exists(_.shape.isInstanceOf[FuzzGen.AggShape]))
    assert(cases.exists(_.shape.isInstanceOf[FuzzGen.WinShape]))
    assert(cases.exists(_.shape.isInstanceOf[FuzzGen.SetShape]))
    assert(cases.exists(_.shape.isInstanceOf[FuzzGen.FrameShape]),
      "no window-frame case")
    assert(cases.exists {
      case c => c.shape match {
        case FuzzGen.FrameShape(_, _, _, _, "rows", _, _) => true; case _ => false
      }
    }, "no ROWS frame case")
    assert(cases.exists {
      case c => c.shape match {
        case FuzzGen.FrameShape(_, _, _, _, "range", _, _) => true; case _ => false
      }
    }, "no RANGE frame case")
    assert(cases.exists {
      case c => c.shape match {
        case FuzzGen.AggShape(_, _, _, "rollup") => true; case _ => false
      }
    }, "no ROLLUP case")
    assert(cases.exists {
      case c => c.shape match {
        case FuzzGen.AggShape(_, _, _, "cube") => true; case _ => false
      }
    }, "no CUBE case")
    assert(cases.exists(_.join.isDefined))
    assert(cases.exists(_.join.isEmpty))
    assert(cases.exists(_.joinKind == "semi"), "no EXISTS case")
    assert(cases.exists(_.joinKind == "anti"), "no NOT EXISTS case")
    assert(cases.exists(_.joinKind == "left"), "no LEFT JOIN case")
    assert(cases.exists(_.joinKind == "full"), "no FULL JOIN case")
    assert(cases.exists(_.scalarSub.isDefined), "no scalar-subquery case")
    assert(cases.exists(_.corrSub.isDefined),
      "no correlated-scalar-subquery case")
    assert(cases.exists(c => c.inSub.exists(!_.neg)), "no IN case")
    assert(cases.exists(c => c.inSub.exists(_.neg)), "no NOT IN case")
    assert(cases.exists(c => c.inSub.exists(_.nullR.isDefined)),
      "no NULLIF-poisoned IN case")
    assert(cases.exists(c => c.shape match {
      case FuzzGen.AggShape(_, aggs, _, _) => aggs.exists(_.kind == "csum")
      case _ => false
    }), "no CASE-aggregate case")
    for (fn <- Seq("row_number", "rank", "dense_rank"))
      assert(cases.exists(c => c.shape match {
        case FuzzGen.WinShape(_, _, _, _, _, f) => f == fn
        case _ => false
      }), s"no $fn window case")
    // round-9 wave
    assert(cases.exists(c => c.shape match {
      case FuzzGen.AggShape(_, aggs, _, _) => aggs.exists(_.kind == "sumd")
      case _ => false
    }), "no SUM(DISTINCT) case")
    assert(cases.exists(c => c.shape match {
      case s: FuzzGen.SetShape => s.withRn
      case _ => false
    }), "no window-over-set-op case")
    assert(cases.exists(_.havingSub.isDefined),
      "no scalar-subquery-HAVING case")
    // round-9 wave 5
    assert(cases.exists(_.lateralAgg.isDefined),
      "no LATERAL-aggregate case")
    assert(cases.exists(c => c.shape match {
      case f: FuzzGen.FrameShape => f.sym
      case _ => false
    }), "no symmetric (PRECEDING..FOLLOWING) frame case")
    // round-10 wave 6
    assert(cases.exists(c => c.shape match {
      case FuzzGen.AggShape(_, _, _, "gsets") => true
      case _ => false
    }), "no explicit GROUPING SETS case")
    assert(cases.exists(c => c.shape match {
      case s: FuzzGen.SetShape => s.withAgg
      case _ => false
    }), "no DISTINCT-aggregate-over-set-op case")
    // havingExists only renders when the first key is an int-modulo
    // key — the coverage claim must be about RENDERED SQL, not the
    // latent field
    assert(cases.exists(c => c.havingExists.exists(_._3 == false) &&
      (c.shape match {
        case FuzzGen.AggShape(keys, _, _, _) =>
          keys.headOption.exists(_.mod.isDefined)
        case _ => false
      })), "no correlated EXISTS-in-HAVING case")
    assert(cases.exists(c => c.havingExists.exists(_._3 == true) &&
      (c.shape match {
        case FuzzGen.AggShape(keys, _, _, _) =>
          keys.headOption.exists(_.mod.isDefined)
        case _ => false
      })), "no correlated NOT-EXISTS-in-HAVING case")
    // round-11 wave 7
    assert(cases.exists(_.selectSub.isDefined),
      "no select-list correlated-scalar case")
    assert(cases.exists(c => c.inSetSub.exists(!_.neg)),
      "no IN-over-set-op case")
    assert(cases.exists(c => c.inSetSub.exists(_.neg)),
      "no NOT-IN-over-set-op case")
    assert(cases.exists(c => c.inSetSub.exists(_.nullR.isDefined)),
      "no NULLIF-poisoned set-op IN case")
    assert(cases.exists(c => c.winOverAgg && (c.shape match {
      case FuzzGen.AggShape(keys, _, _, "plain") => keys.nonEmpty
      case _ => false
    })), "no window-over-grouped-result case")
    // round-12 wave 8
    assert(cases.exists(c => c.shape match {
      case s: FuzzGen.SetShape => s.op.endsWith(" ALL") && s.op != "UNION ALL"
      case _ => false
    }), "no INTERSECT ALL / EXCEPT ALL case")
    assert(cases.exists(c => c.orExists.exists(!_.neg)),
      "no EXISTS-under-OR case")
    assert(cases.exists(c => c.orExists.exists(_.neg)),
      "no NOT-EXISTS-under-OR case")
    assert(cases.exists(c => c.aggOverWin &&
      c.shape.isInstanceOf[FuzzGen.WinShape]),
      "no GROUP-BY-over-window case")
    // round-15 wave 9
    assert(cases.exists(_.filterAgg.isDefined),
      "no FILTER (WHERE) aggregate case")
    assert(cases.exists(_.orderedAgg.isDefined),
      "no ordered string-aggregation case")
    assert(cases.exists(c => c.groupingSel && (c.shape match {
      case FuzzGen.AggShape(keys, _, _, g) => keys.nonEmpty && g != "plain"
      case _ => false
    })), "no GROUPING()-over-grouping-sets case")
    assert(cases.exists(c => c.groupingSel && (c.shape match {
      case FuzzGen.AggShape(keys, _, _, g) => keys.length > 1 && g != "plain"
      case _ => false
    })), "no GROUPING_ID case (needs a two-key grouping shape)")
    // round-16 wave 10
    assert(cases.exists(_.qualifyExt),
      "no QUALIFY-style filtered-window case")
    assert(cases.exists(_.winNulls.isDefined),
      "no poisoned NULLS FIRST/LAST window-order case")
    assert(cases.exists(_.multiWin),
      "no multi-window-function single-SELECT case")
    assert(cases.exists(c => c.qualifyExt && (c.shape match {
      case FuzzGen.WinShape(_, _, _, _, _, fn) => fn != "row_number"
      case _ => false
    })), "no qualify-over-RANK/DENSE_RANK case (tie semantics)")
    // round-16 wave 11
    assert(cases.exists(_.lagNulls.isDefined),
      "no LAG … IGNORE NULLS case")
    assert(cases.exists(c => c.argExt.exists(_._3)), "no MAX_BY case")
    assert(cases.exists(c => c.argExt.exists(!_._3)), "no MIN_BY case")
    assert(cases.exists(_.nthVal), "no NTH_VALUE case")
    assert(cases.exists(c => c.lagNulls.isDefined && (c.shape match {
      case FuzzGen.FrameShape(_, _, _, _, _, _, sym) => sym
      case _ => false
    })), "no IGNORE-NULLS-beside-symmetric-frame case")
    // round-17 wave 12
    assert(cases.exists(c => c.shape match {
      case FuzzGen.FrameShape(_, _, _, _, "range", _, sym) => sym
      case _ => false
    }), "no symmetric numeric RANGE frame case")
    assert(cases.exists(_.fvNulls.isDefined),
      "no FIRST/LAST_VALUE explicit-frame poisoned-argument case")
    assert(cases.exists(c => c.nullSideSum.isDefined && c.joinKind == "left"),
      "no null-extended-side windowed sum over a LEFT join")
    assert(cases.exists(c => c.nullSideSum.isDefined && c.joinKind == "full"),
      "no null-extended-side windowed sum over a FULL join")
    // round-18 wave 13
    assert(cases.exists(c => c.groupByAll && (c.shape match {
      case FuzzGen.AggShape(keys, _, _, "plain") => keys.nonEmpty
      case _ => false
    })), "no GROUP BY ALL case")
    assert(cases.exists(_.lateralCnt.isDefined),
      "no multi-column-LATERAL case")
    assert(cases.exists(c => c.distinctRanks && (c.shape match {
      case FuzzGen.WinShape(_, _, _, _, _, fn) => fn == "rank"
      case _ => false
    })), "no DISTINCT-over-RANK case")
    assert(cases.exists(c => c.distinctRanks && (c.shape match {
      case FuzzGen.WinShape(_, _, _, _, _, fn) => fn == "dense_rank"
      case _ => false
    })), "no DISTINCT-over-DENSE_RANK case")
    // round-19 wave 14
    assert(cases.exists(c => c.latWin &&
      (c.lateralAgg.isDefined || c.lateralCnt.isDefined)),
      "no window-over-LATERAL case")
    assert(cases.exists(c => c.caseExists.exists(!_.neg)),
      "no CASE-WHEN-EXISTS select case")
    assert(cases.exists(c => c.caseExists.exists(_.neg)),
      "no CASE-WHEN-NOT-EXISTS select case")
    assert(cases.exists(c => c.frameExprOrd.isDefined && (c.shape match {
      case f: FuzzGen.FrameShape => f.frame == "rows"
      case _ => false
    })), "no expression-ordered ROWS frame case")
    // dual spellings exist ONLY for the ordered aggregate and the
    // IGNORE-NULLS lag — every other byte of the two dialect texts
    // must stay identical
    for (c <- cases) {
      if (c.orderedAgg.isEmpty && c.lagNulls.isEmpty)
        assert(c.sql == c.duckSql, s"seed ${c.seed}: dialect texts differ " +
          "without a dual-spelled construct")
      else {
        assert(c.sql != c.duckSql, s"seed ${c.seed}: dual-spelled " +
          "construct present but texts identical")
        if (c.orderedAgg.isDefined)
          assert(c.sql.contains("WITHIN GROUP") &&
            c.duckSql.contains("string_agg"),
            s"seed ${c.seed}: wrong per-engine ordered-agg spelling")
        if (c.lagNulls.isDefined)
          assert(c.sql.contains(") IGNORE NULLS OVER") &&
            c.duckSql.contains(" IGNORE NULLS) OVER"),
            s"seed ${c.seed}: wrong per-engine IGNORE NULLS spelling")
      }
    }
  }
}
